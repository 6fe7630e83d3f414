package graft.functions

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Native function coverage: the bounded-heap top-k aggregate (incl.
  * partial/merge paths across partitions) and the extensions injector. */
class FunctionsSpec extends SparkSpec {
  import spark.implicits._

  test("graft_topk keeps the k best pairs with deterministic ties") {
    GraftFunctions.register(spark)
    val df = Seq(
      ("a", 5.0, 1L), ("a", 9.0, 2L), ("a", 9.0, 3L), ("a", 7.0, 4L),
      ("b", 1.0, 9L)).toDF("k", "ord", "id")
    val rows = df.groupBy("k")
      .agg(expr("graft_topk(ord, id, 2)").as("top"))
      .select(col("k"), expr("transform(top, t -> t.id)").as("ids"))
      .as[(String, Seq[Long])].collect().toMap
    assert(rows("a") == Seq(2L, 3L)) // 9.0 twice, lower id first
    assert(rows("b") == Seq(9L))     // fewer than k rows -> all rows
  }

  test("graft_topk merges partial heaps across many partitions correctly") {
    GraftFunctions.register(spark)
    // 1000 rows, 10 keys, spread over 16 partitions so partial buffers
    // must merge; expected top-3 ids per key are the 3 highest ords.
    val df = spark.range(1000).repartition(16)
      .select((col("id") % 10).as("k"), col("id").cast("double").as("ord"),
        col("id").as("rid"))
    val got = df.groupBy("k").agg(expr("graft_topk(ord, rid, 3)").as("top"))
      .select(col("k"), expr("transform(top, t -> t.id)").as("ids"))
      .as[(Long, Seq[Long])].collect().toMap
    (0L until 10L).foreach { k =>
      assert(got(k) == Seq(990 + k, 980 + k, 970 + k))
    }
  }

  test("aggregate answer matches the row_number window phrasing on real data") {
    GraftFunctions.register(spark)
    val orders = spark.read.parquet(s"$sfDir/orders.parquet")
    val viaAgg = orders.groupBy("o_custkey")
      .agg(expr("graft_topk(o_totalprice, o_orderkey, 3)").as("top"))
      .select(col("o_custkey"), explode(expr("transform(top, t -> t.id)")).as("o_orderkey"))
    val viaWindow = orders
      .withColumn("rn", expr(
        "row_number() over (partition by o_custkey order by o_totalprice desc, o_orderkey asc)"))
      .filter(col("rn") <= 3).select("o_custkey", "o_orderkey")
    assert(viaAgg.exceptAll(viaWindow).isEmpty && viaWindow.exceptAll(viaAgg).isEmpty)
  }

  test("typed WeightedMeanCents aggregator matches the exact formula across partitions") {
    val data = spark.range(1000).repartition(8)
      .select((col("id") % 5).as("k"), col("id").as("v"), (col("id") % 7 + 1).as("w"))
      .as[(Long, Long, Long)]
    val got = data.groupByKey(_._1)
      .mapValues(t => (t._2, t._3))
      .agg(TypedAggregators.WeightedMeanCents.toColumn.name("wavg"))
      .collect().toMap
    val expect = (0L until 1000L).groupBy(_ % 5).map { case (k, ids) =>
      val num = ids.map(i => i * (i % 7 + 1)).sum
      val den = ids.map(i => i % 7 + 1).sum
      k -> num.toDouble / den
    }
    got.foreach { case (k, v) => assert(v == expect(k), s"key $k") }
  }

  test("GraftExtensions injects every function without error") {
    val ext = new SparkSessionExtensions
    new GraftExtensions()(ext)
    // injection is validated end-to-end by the registered-path tests
    // above; here we assert the injector covers the full surface
    assert(GraftFunctions.all.map(_._1).toSet == Set("graft_dot", "graft_topk",
      "graft_s2_cell", "graft_s2_center", "graft_s2_cell_polygon",
      "graft_s2_neighbors",
      "graft_s2_polygon_cover", "graft_s2_line_cover", "graft_geo_dist_line",
      "graft_h3_cell", "graft_h3_center", "graft_h3_neighbors", "graft_h3_rings",
      "graft_h3_level", "graft_h3_parent", "graft_h3_children",
      "graft_h3_compact", "graft_h3_uncompact", "graft_build_schema",
      "graft_ipv4_cidrs",
      "graft_geo_point_buffer", "graft_geo_line_buffer",
      "graft_geo_polygon_buffer", "graft_geo_simplify_line",
      "graft_geo_simplify_polygon", "graft_geo_clip_line",
      "graft_geo_poly_bool", "graft_geo_union_polys", "graft_geo_union_lines",
      "graft_h3_polygon_cover", "graft_h3_line_cover",
      "graft_codepoints", "graft_from_codepoints",
      "graft_punycode_encode", "graft_punycode_decode",
      "graft_ipv6_canon", "graft_ipv6_mask", "graft_ipv6_cmp",
      "graft_make_bag",
      "graft_gzip_compress", "graft_gzip_decompress",
      "graft_zlib_compress", "graft_zlib_decompress",
      "graft_parse_csv", "graft_h3_boundary", "graft_parse_cmdline",
      "graft_geo_closest_line",
      "graft_ibeta", "graft_erf", "graft_beta_inv", "graft_might_contain"))
  }
}
