package graft.cdc

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.SparkSpec

/** Property-based CDC semantics (SURVEY.md §5): random mixed-op event
  * logs, checked against an in-memory reference model —
  *  - unwrap(log) ≡ the non-delete events' after-images (multiset);
  *  - latestState(log) ≡ per-key max-lsn fold with delete semantics;
  *  - latestState is invariant under at-least-once replay (log ⧺ log)
  *    and arbitrary event order (shuffle).
  * Sampling is deterministic (fixed ScalaCheck seeds), so failures
  * reproduce.
  */
class CdcPropertySpec extends SparkSpec {
  import spark.implicits._

  private case class Evt(op: String, orderid: Int, custid: Int,
                         amount: Int, city: String, lsn: Long)

  private val cities = Seq("New Delhi", "Seattle", "New York", "Austin")

  /** One random log: ~n events over a small key space, lsn = position
    * (so "latest" is well-defined), ops weighted like a real stream. */
  private def logGen(n: Int): Gen[List[Evt]] =
    Gen.listOfN(n, for {
      op <- Gen.frequency(6 -> "c", 2 -> "u", 1 -> "d", 1 -> "r")
      oid <- Gen.choose(1, 8)
      cust <- Gen.choose(1, 1000)
      amt <- Gen.choose(100, 199)
      city <- Gen.oneOf(cities)
    } yield Evt(op, oid, cust, amt, city, 0L))
      .map(_.zipWithIndex.map { case (e, i) => e.copy(lsn = i.toLong + 1) })

  private def sample(i: Int): List[Evt] =
    logGen(30).pureApply(Gen.Parameters.default, Seed(42L + i))

  private def toJson(e: Evt): String = {
    val row = s"""{"orderid":${e.orderid},"custid":${e.custid},"amount":${e.amount},"city":"${e.city}"}"""
    val (before, after) = e.op match {
      case "c" | "r" => ("null", row)
      case "u" => (row, row)
      case "d" => (row, "null")
    }
    s"""{"schema":null,"payload":{"before":$before,"after":$after,"source":{"version":"1.9.5","connector":"postgresql","name":"myserver","ts_ms":${e.lsn},"snapshot":"false","db":"inventory","schema":"inventory","table":"orders_info","txId":${e.lsn},"lsn":${e.lsn},"xmin":null},"op":"${e.op}","ts_ms":${e.lsn},"transaction":null}}"""
  }

  /** Reference model: per key, the max-lsn event decides; deletes drop. */
  private def model(log: Seq[Evt]): Set[(Int, Int, Int, String)] =
    log.groupBy(_.orderid).values.flatMap { evs =>
      val last = evs.maxBy(_.lsn)
      if (last.op == "d") None
      else Some((last.orderid, last.custid, last.amount, last.city))
    }.toSet

  private def sparkLatest(log: Seq[Evt]): Set[(Int, Int, Int, String)] =
    Cdc.latestState(Cdc.decode(log.map(toJson).toDF("value")),
        keyCol = coalesce(col("payload.after.orderid"), col("payload.before.orderid")),
        orderCol = col("payload.source.lsn"))
      .as[(Int, Int, Int, String)].collect().toSet

  test("unwrap equals the non-delete after-images for random logs") {
    (0 until 5).foreach { i =>
      val log = sample(i)
      val got = Cdc.unwrap(Cdc.decode(log.map(toJson).toDF("value")))
        .as[(Int, Int, Int, String)].collect().toSeq.sorted
      val want = log.filter(_.op != "d")
        .map(e => (e.orderid, e.custid, e.amount, e.city)).sorted
      assert(got == want, s"sample $i")
    }
  }

  test("latest-state matches the reference fold for random logs") {
    (0 until 5).foreach { i =>
      val log = sample(i)
      assert(sparkLatest(log) == model(log), s"sample $i")
    }
  }

  test("latest-state is invariant under replay and reordering") {
    (0 until 3).foreach { i =>
      val log = sample(i)
      val rnd = new scala.util.Random(7 + i)
      val replayedShuffled = rnd.shuffle(log ++ log)
      assert(sparkLatest(replayedShuffled) == model(log), s"sample $i")
    }
  }
}
