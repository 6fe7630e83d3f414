package graft.kql

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.SparkSpec
import graft.kql.Kql.KqlOps

/** Property pin for the text front-end: randomly composed KQL pipelines
  * must produce the exact rows the equivalent builder calls produce —
  * the parser owns only surface syntax, so ANY divergence is a parser
  * bug. Generates where/extend/summarize/sort+take combinations over a
  * fixed in-memory table and compares collected results row-for-row.
  * Sampling is deterministic (fixed ScalaCheck seeds), so failures
  * reproduce. */
class KqlPropertySpec extends SparkSpec {
  import spark.implicits._

  private lazy val base = (1 to 60).map { i =>
    (i.toLong, s"k${i % 7}", (i * 37) % 100, if (i % 3 == 0) "red" else "blue")
  }.toDF("id", "k", "v", "color").cache()

  private case class Stage(text: String, apply: DataFrame => DataFrame)

  private val genWhere: Gen[Stage] = for {
    cut <- Gen.choose(0, 99)
    opTxt <- Gen.oneOf(">", "<=")
  } yield Stage(s"where v $opTxt $cut", df => df.kqlWhere(expr(s"v $opTxt $cut")))

  private val genExtend: Gen[Stage] = for {
    m <- Gen.choose(2, 9)
  } yield Stage(s"extend v2 = v * $m", df => df.extend("v2", col("v") * m))

  // take without a preceding deterministic sort is row-order dependent;
  // always sort first so both paths take the same prefix
  private val genSortTake: Gen[Stage] = for {
    n <- Gen.choose(1, 40)
  } yield Stage(s"sort by id asc | take $n",
    df => df.orderBy(col("id").asc).limit(n))

  private val genSummarize: Gen[Stage] = Gen.oneOf(
    Stage("summarize total = sum(v), n = count() by k",
      df => df.summarize(Seq("total" -> sum(col("v")), "n" -> count(lit(1))), col("k"))),
    Stage("summarize mx = max(v) by color",
      df => df.summarize(Seq("mx" -> max(col("v"))), col("color"))))

  private val genPipeline: Gen[List[Stage]] = for {
    pre <- Gen.listOfN(2, Gen.oneOf(genWhere, genExtend))
    mid <- Gen.option(genSummarize)
    post <- Gen.option(genSortTake)
  } yield pre ++ mid.toList ++ (if (mid.isEmpty) post.toList else Nil)

  test("random text pipelines match the builder exactly (30 deterministic samples)") {
    (0 until 30).foreach { i =>
      val stages = genPipeline.pureApply(Gen.Parameters.default, Seed(1000L + i))
      val text = ("T" +: stages.map(_.text)).mkString(" | ")
      val viaParser = KqlParser.run(text, Map("T" -> base))
      val viaBuilder = stages.foldLeft(base: DataFrame)((df, s) => s.apply(df))
      val a = viaParser.collect().map(_.toString).sorted.toSeq
      val b = viaBuilder.collect().map(_.toString).sorted.toSeq
      assert(a == b, s"parser diverged from builder on: $text")
    }
  }
}
