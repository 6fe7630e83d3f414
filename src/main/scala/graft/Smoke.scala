package graft

import org.apache.spark.sql.SparkSession

/** Dev smoke main mirroring the driver's flagship check: run
  * SparkEntry.entry on sf0.001 and print the row count (driver requires
  * rows > 0) plus the rows themselves. */
object Smoke {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.extensions", classOf[functions.GraftExtensions].getName)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val df = SparkEntry.entry(spark)
    val rows = df.collect()
    println(s"entry rows=${rows.length}")
    rows.foreach(r => println(s"  $r"))
    spark.stop()
  }
}
