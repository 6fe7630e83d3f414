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

  test("series analysis tier matches a Scala reference model on random series (25 samples)") {
    // The r10 builders emit multi-KB SQL whose formulas must track the
    // documented semantics exactly; this model re-implements them in
    // plain Scala (same fold orders) and pins fit/outliers/anomalies on
    // random integer series end-to-end through the parser.
    // force the suite session: the pipeline below is datatable-only, so
    // nothing else would register a default session first
    spark.sparkContext
    val genSeries: Gen[List[Int]] = for {
      n <- Gen.choose(5, 40)
      ys <- Gen.listOfN(n, Gen.choose(0, 50))
    } yield ys
    (0 until 25).foreach { i =>
      val ys = genSeries.pureApply(Gen.Parameters.default, Seed(7000L + i))
      val y = ys.map(_.toDouble)
      val n = y.length.toDouble
      // model: least-squares over the index axis (closed-form Σx, Σx²)
      val sy = y.sum
      val sxy = y.zipWithIndex.map { case (v, j) => j * v }.sum
      val sx = (n - 1) * n / 2
      val sxx = (n - 1) * n * (2 * n - 1) / 6
      val slope = (n * sxy - sx * sy) / (n * sxx - sx * sx)
      val icept = (sy - slope * sx) / n
      // model: 7-point clamped moving-average trend + k-sigma flags
      val trend = y.indices.map { j =>
        val lo = math.max(0, j - 3); val hi = math.min(y.length - 1, j + 3)
        y.slice(lo, hi + 1).sum / (hi - lo + 1)
      }
      val resid = y.zip(trend).map { case (v, t) => v - t }
      val sd = math.sqrt(math.max(
        resid.map(r => r * r).sum / n - math.pow(resid.sum / n, 2), 0.0))
      val flags = resid.map { r =>
        if (sd == 0) 0 else if (r > 1.5 * sd) 1 else if (r < -1.5 * sd) -1 else 0
      }
      // model: z-scores
      val mean = sy / n
      val sdz = math.sqrt(y.map(v => (v - mean) * (v - mean)).sum / n)
      val peakZ = if (sdz == 0) 0.0 else y.map(v => (v - mean) / sdz).max
      val q =
        s"datatable(b:long)[1] | extend y = ${ys.mkString("array(", ", ", ")")}" +
          " | extend f = series_fit_line_dynamic(y), a = series_decompose_anomalies(y, 1.5)" +
          " | project sl = f.slope, ic = f.interception, fl = a.ad_flag," +
          " pz = array_max(series_outliers(y))"
      val r = KqlParser.run(q, Map.empty).collect().head
      assert(math.abs(r.getDouble(0) - slope) < 1e-9, s"slope sample $i")
      assert(math.abs(r.getDouble(1) - icept) < 1e-9, s"intercept sample $i")
      assert(r.getSeq[Int](2) == flags, s"flags sample $i: $ys")
      assert(math.abs(r.getDouble(3) - peakZ) < 1e-9, s"peak z sample $i")
    }
  }
}
