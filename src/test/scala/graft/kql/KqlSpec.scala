package graft.kql

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.kql.Kql._

/** KQL dialect defaults (SURVEY.md §2.E): `sort by` with no direction is
  * DESCENDING (README.md:376), `top` likewise, `summarize` groups. */
class KqlSpec extends SparkSpec {
  import spark.implicits._

  private def df = Seq(("a", 1), ("b", 3), ("c", 2)).toDF("k", "v")

  test("kqlSort defaults to descending (README.md:376)") {
    assert(df.kqlSort(col("v")).select("k").as[String].collect().toSeq == Seq("b", "c", "a"))
  }

  test("top n by c takes the n largest") {
    assert(df.top(2, col("v")).select("k").as[String].collect().toSeq == Seq("b", "c"))
  }

  test("summarize groups and names aggregates") {
    val out = Seq(("x", 1), ("x", 2), ("y", 5)).toDF("k", "v")
      .summarize(Seq("total" -> sum(col("v")), "n" -> count(lit(1))), col("k"))
    assert(out.columns.toSeq == Seq("k", "total", "n"))
    assert(out.filter(col("k") === "x").head().getLong(1) == 3L)
  }

  test("summarize with no keys is a global aggregate") {
    val out = df.summarize(Seq("mx" -> max(col("v"))))
    assert(out.head().getInt(0) == 3)
  }

  test("kqlCount counts rows into `Count`") {
    assert(df.kqlCount.columns.toSeq == Seq("Count"))
    assert(df.kqlCount.head().getLong(0) == 3L)
  }

  test("project + where + extend compose") {
    val out = df.kqlWhere(col("v") > 1).extend("v2", col("v") * 2).project(col("k"), col("v2"))
    assert(out.columns.toSeq == Seq("k", "v2"))
    assert(out.count() == 2)
  }
}
