package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
object ProfLine {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.extensions", classOf[graft.functions.GraftExtensions].getName)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val sf = "/root/testdata/sf0.1"
    def time[A](tag: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[prof] $tag%-28s ${(System.nanoTime()-t0)/1e9}%6.2f s"); r
    }
    val oi = graft.ops.Tables.ordersInfo(spark, sf)
    val pts = oi.withColumn("lon", expr("cast(orderid % 6000 as double) / 100.0 - 30.0"))
      .withColumn("lat", expr("5.0 + cast(custid % 1400 as double) / 50.0"))
      .withColumn("cell", expr("graft_s2_cell(lon, lat, 7)"))
    for (i <- 1 to 3) time(s"A scan+cell count $i") { pts.agg(count(lit(1))).collect() }
    // dim: cover cells precomputed driver-side
    import org.apache.spark.sql.catalyst.util.GenericArrayData
    val ring = Array(Array(-15.0,10.0), Array(-5.0,14.0), Array(5.0,12.0), Array(15.0,20.0), Array(25.0,26.0))
    val ad = new GenericArrayData(ring.map(p => new GenericArrayData(p.map(_.asInstanceOf[Any])): Any))
    val cov = graft.functions.S2.lineCover(ad, 7)
    val toks = (0 until cov.numElements()).map(i => cov.getUTF8String(i).toString)
    import spark.implicits._
    val dimBase = toks.toDF("c0")
      .withColumn("cell", explode(expr("concat(array(c0), graft_s2_neighbors(c0))")))
      .select("cell").distinct()
    val dim = broadcast(dimBase)
    for (i <- 1 to 3) time(s"B join count $i") { pts.join(dim, "cell").agg(count(lit(1))).collect() }
    for (i <- 1 to 3) time(s"C full $i") {
      graft.ops.ReferenceQueries.queries("kql_geo_line_join")(spark, sf).collect() }
    spark.stop()
  }
}
