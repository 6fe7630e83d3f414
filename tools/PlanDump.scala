package graft
import org.apache.spark.sql.SparkSession

/** Dev tool (builder-side): dump the formatted physical plan of named
  * SparkEntry queries for cross-commit plan diffing. Not part of the
  * library; lives in tools/ and is compiled only when copied into
  * src/ by the plan-diff workflow.
  *
  * Usage: runMain graft.PlanDump <sfDir> <outDir> <q1,q2,...>
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val Array(sfDir, outDir, names) = args.take(3)
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.extensions", classOf[functions.GraftExtensions].getName)
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(outDir))
    names.split(",").foreach { n =>
      val df = SparkEntry.queries(n)(spark, sfDir)
      val plan = df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
      java.nio.file.Files.writeString(
        java.nio.file.Paths.get(s"$outDir/$n.plan"), plan)
      println(s"[plandump] wrote $outDir/$n.plan")
    }
    spark.stop()
  }
}
