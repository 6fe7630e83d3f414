package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Benchmark main (driver contract): times every SparkEntry query on
  * SPARK_GRAFT_SF_DIR and prints ONE JSON line.
  *
  * Each query is forced with a full-width checksum aggregate
  * (bit_xor(xxhash64(all columns))) rather than count(): count() lets
  * Catalyst prune map-side projections to a bare row count, which would
  * measure nothing for scan+transform queries. The checksum computes
  * every output column of every row, adds one cheap hash per row, and
  * stays order-independent (XOR) so it is deterministic under any
  * partitioning.
  *
  * A short untimed warmup (shuffle agg, broadcast join, window, parquet
  * scan) runs first so the first timed query doesn't absorb JVM/codegen/
  * parquet-reader initialization.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    warmup(spark, sfDir)

    val results = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      val t0 = System.nanoTime()
      try { force(fn(spark, sfDir)) } catch { case _: Throwable => () }
      name -> (System.nanoTime() - t0) / 1e9
    }
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = results.map(_._2).sum
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir"}""")
    spark.stop()
  }

  /** Execute df fully: hash every column of every row, XOR-fold. */
  private def force(df: org.apache.spark.sql.DataFrame): Unit =
    df.agg(bit_xor(xxhash64(df.columns.map(col): _*))).collect()

  /** Untimed first-touch of the operators the timed queries use. */
  private def warmup(spark: SparkSession, sfDir: String): Unit = {
    import org.apache.spark.sql.expressions.Window
    val t = spark.range(1000000L)
      .select((col("id") % 97).as("k"), col("id").as("v"))
    t.groupBy("k").agg(sum("v")).collect()
    t.join(broadcast(spark.range(97).select(col("id").as("k"))), "k")
      .select(sum(col("v")).as("s")).collect()
    t.limit(10000)
      .withColumn("rn", row_number().over(Window.partitionBy("k").orderBy("v")))
      .agg(bit_xor(xxhash64(col("k"), col("v"), col("rn")))).collect()
    spark.read.parquet(s"$sfDir/nation.parquet").collect()
  }
}
