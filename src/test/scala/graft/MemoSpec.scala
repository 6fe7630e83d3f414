package graft

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Pins the [[Memo]] seam's lifecycle contract (r11 advice: the old
  * per-file memo had no invalidation and pinned entries for the JVM
  * lifetime): corpus-fingerprint staleness detection, explicit
  * invalidation, and the compute counter Bench uses to label cold
  * runs. */
class MemoSpec extends AnyFunSuite {
  private lazy val spark = SparkSession.builder()
    .master("local[2]")
    .config("spark.sql.shuffle.partitions", "2")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  test("same (session, dir, tag) computes once; counter tracks cold derivations") {
    val dir = Files.createTempDirectory("memo").toString
    Files.writeString(java.nio.file.Paths.get(dir, "t.txt"), "v1")
    var computed = 0
    def get() = Memo.cached(spark, dir, "probe") {
      computed += 1
      spark.range(3).toDF("id").localCheckpoint(true)
    }
    val c0 = Memo.computeCount
    assert(get().count() == 3)
    assert(get().count() == 3)
    assert(computed == 1)
    assert(Memo.computeCount == c0 + 1)
  }

  test("rewriting a file under the corpus dir changes the key (stale entry unreachable)") {
    val dir = Files.createTempDirectory("memo").toString
    val f = java.nio.file.Paths.get(dir, "t.txt")
    Files.writeString(f, "v1")
    var computed = 0
    def get() = Memo.cached(spark, dir, "probe") {
      computed += 1
      spark.range(3).toDF("id").localCheckpoint(true)
    }
    get(); get()
    assert(computed == 1)
    // rewrite with different content length => size component changes
    // even when the filesystem's mtime granularity is coarse
    Files.writeString(f, "v2-different-length")
    get()
    assert(computed == 2, "rewrite must miss the stale entry")
  }

  test("invalidate(dir) forces recompute; other dirs unaffected") {
    val dirA = Files.createTempDirectory("memoA").toString
    val dirB = Files.createTempDirectory("memoB").toString
    var a = 0; var b = 0
    def getA() = Memo.cached(spark, dirA, "probe") {
      a += 1; spark.range(1).toDF("id").localCheckpoint(true)
    }
    def getB() = Memo.cached(spark, dirB, "probe") {
      b += 1; spark.range(1).toDF("id").localCheckpoint(true)
    }
    getA(); getB()
    Memo.invalidate(dirA)
    getA(); getB()
    assert(a == 2 && b == 1)
  }

  test("distinct tags under one dir are independent entries") {
    val dir = Files.createTempDirectory("memo").toString
    val x = Memo.cached(spark, dir, "t1") {
      spark.range(1).toDF("id").localCheckpoint(true)
    }
    val y = Memo.cached(spark, dir, "t2") {
      spark.range(2).toDF("id").localCheckpoint(true)
    }
    assert(x.count() == 1 && y.count() == 2)
  }
}
