package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Transient dev scratch (not committed): phase timing for one query. */
object Scratch {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.extensions", classOf[functions.GraftExtensions].getName)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def force(df: org.apache.spark.sql.DataFrame): Unit =
      df.agg(bit_xor(xxhash64(df.columns.toIndexedSeq.map(col): _*))).collect()
    force(spark.read.parquet(s"$sfDir/orders.parquet"))
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    force(spark.read.parquet(s"$sfDir/events.parquet"))
    args.foreach { name =>
      (1 to 6).foreach { i =>
        val t0 = System.nanoTime()
        val df = SparkEntry.queries(name)(spark, sfDir)
        val t1 = System.nanoTime()
        force(df)
        val t2 = System.nanoTime()
        println(f"[scratch] $name run $i: translate=${(t1 - t0) / 1e9}%.3f s action=${(t2 - t1) / 1e9}%.3f s")
      }
    }
    spark.stop()
  }
}
