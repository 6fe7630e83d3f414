package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev tool (builder-side): break a named SparkEntry query's wall time
  * into parse/analyze, optimize, physical-plan, and execute phases —
  * for queries whose cost is suspected to be driver-side (Catalyst /
  * codegen) rather than data-path. Lives in tools/; compiled only when
  * copied into src/ for a profiling session.
  *
  * Usage: runMain graft.PhaseProf <sfDir> <q1,q2,...> [reps]
  */
object PhaseProf {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val names = args(1).split(",")
    val reps = if (args.length > 2) args(2).toInt else 3
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.extensions", classOf[functions.GraftExtensions].getName)
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def t[A](f: => A): (A, Double) = {
      val t0 = System.nanoTime(); val r = f; (r, (System.nanoTime() - t0) / 1e9)
    }
    for (_ <- 1 to reps; n <- names) {
      val (df, tBuild) = t(SparkEntry.queries(n)(spark, sfDir))
      val qe = df.queryExecution
      val (_, tAna) = t(qe.analyzed)
      val (_, tOpt) = t(qe.optimizedPlan)
      val (ep, tPhys) = t(qe.executedPlan)
      val (_, tExec) = t(
        df.agg(bit_xor(xxhash64(df.columns.toIndexedSeq.map(col): _*))).collect())
      println(f"[phase] $n%-22s build=$tBuild%6.2f analyze=$tAna%6.2f " +
        f"optimize=$tOpt%6.2f physical=$tPhys%6.2f exec=$tExec%6.2f " +
        f"treeNodes=${ep.map(_ => 1).sum}%d")
    }
    spark.stop()
  }
}
