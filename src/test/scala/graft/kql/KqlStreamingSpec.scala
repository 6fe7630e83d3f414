package graft.kql

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.cdc.Cdc

/** The reference's whole point, end to end: its KQL dashboard query
  * TEXT (README.md:373-377, verbatim) running over the LIVE change
  * stream. The parser builds ordinary DataFrame ops, and every verb it
  * emits is streaming-compatible, so the same text drives a batch table
  * or a Structured Streaming view unchanged — decode → unwrap is the
  * streaming `Orders` view, `summarize ... by city | sort by total` is
  * an incrementally-maintained aggregate in complete mode. */
class KqlStreamingSpec extends SparkSpec {
  import spark.implicits._

  private def env(orderid: Int, amount: Int, city: String, lsn: Long): String =
    s"""{"schema":null,"payload":{"before":null,
       |"after":{"orderid":$orderid,"custid":${orderid * 10},"amount":$amount,"city":"$city"},
       |"source":{"version":"1.9.5","connector":"postgresql","name":"myserver",
       |"ts_ms":${lsn * 1000},"snapshot":"false","db":"inventory","schema":"inventory",
       |"table":"orders_info","txId":$lsn,"lsn":$lsn,"xmin":null},
       |"op":"c","ts_ms":${lsn * 1000},"transaction":null}}""".stripMargin.replace("\n", "")

  test("README total-by-city KQL text runs verbatim over the live change stream") {
    implicit val sql = spark.sqlContext
    val source = MemoryStream[String]
    // streaming `Orders` view: the materializer's decode → unwrap path
    val orders = Cdc.unwrap(Cdc.decode(source.toDF().select(col("value"))))
    val parsed = KqlParser.parse(
      graft.ops.ReferenceQueries.kqlTotalText, Map("Orders" -> orders))
    assert(parsed.render.contains("piechart")) // chart tag rides along
    val q = parsed.df.writeStream.outputMode("complete")
      .format("memory").queryName("kql_live").start()
    try {
      source.addData(env(1, 100, "Seattle", 1), env(2, 150, "Seattle", 2),
        env(3, 120, "Austin", 3))
      q.processAllAvailable()
      val r1 = spark.table("kql_live").collect()
        .map(r => r.getString(0) -> r.getLong(1)).toMap
      assert(r1 == Map("Seattle" -> 250L, "Austin" -> 120L))
      // the dashboard updates as the stream advances
      source.addData(env(4, 80, "Austin", 4), env(5, 200, "Chicago", 5))
      q.processAllAvailable()
      val r2 = spark.table("kql_live").collect()
        .map(r => r.getString(0) -> r.getLong(1)).toMap
      assert(r2 == Map("Seattle" -> 250L, "Austin" -> 200L, "Chicago" -> 200L))
    } finally q.stop()
  }

  test("KQL lookup enriches the live stream against a static dimension") {
    // Stream-static dimension enrichment — at scale, THE pattern for
    // attaching rollup attributes to a change stream: the dim is a
    // broadcast hash join against each micro-batch, no stream shuffle,
    // no state. The same `lookup` text drives batch and stream.
    implicit val sql = spark.sqlContext
    val source = MemoryStream[String]
    val orders = Cdc.unwrap(Cdc.decode(source.toDF().select(col("value"))))
    val dims = Seq(("Seattle", "WEST"), ("Austin", "SOUTH"), ("Chicago", "MIDWEST"))
      .toDF("city", "region")
    val parsed = KqlParser.parse(
      """Orders
        || lookup (Dims) on city
        || summarize total = sum(amount) by region""".stripMargin,
      Map("Orders" -> orders, "Dims" -> dims))
    val q = parsed.df.writeStream.outputMode("complete")
      .format("memory").queryName("kql_lookup_live").start()
    try {
      source.addData(env(1, 100, "Seattle", 1), env(2, 150, "Austin", 2),
        env(3, 50, "Austin", 3))
      q.processAllAvailable()
      val r = spark.table("kql_lookup_live").collect()
        .map(r => r.getString(0) -> r.getLong(1)).toMap
      assert(r == Map("WEST" -> 100L, "SOUTH" -> 200L))
    } finally q.stop()
  }

  test("todynamic VARIANT decode runs per-row over the live stream") {
    // The r9 dynamic tier is map-side (parse_json → variant_get →
    // cast), so the same KQL text decodes JSON property bags inside a
    // streaming micro-batch with no state and no extra shuffle beyond
    // the aggregate.
    implicit val sql = spark.sqlContext
    val source = MemoryStream[String]
    val events = source.toDF().select(col("value").as("props"))
    val parsed = KqlParser.parse(
      "Events | extend d = todynamic(props) | extend k = tolong(d.k) " +
        "| summarize n = count(), s = sum(k) by parity = k % 2",
      Map("Events" -> events))
    val q = parsed.df.writeStream.outputMode("complete")
      .format("memory").queryName("kql_variant_live").start()
    try {
      source.addData("""{"k": 1}""", """{"k": 2}""", """{"k": 3}""")
      q.processAllAvailable()
      val r = spark.table("kql_variant_live").collect()
        .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
      assert(r == Map(1L -> ((2L, 4L)), 0L -> ((1L, 2L))))
      source.addData("""{"k": 4}""")
      q.processAllAvailable()
      val r2 = spark.table("kql_variant_live").collect()
        .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
      assert(r2 == Map(1L -> ((2L, 4L)), 0L -> ((2L, 6L))))
    } finally q.stop()
  }
}
