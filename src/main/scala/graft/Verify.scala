package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths, StandardCopyOption}

/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare.
  *
  * Un-losable-artifact contract (r12 post-mortem: the driver's
  * CORRECTNESS_r12.json came back `{}` — the plausible cause is a
  * driver-side wall cap killing Verify mid-loop, and the old Verify
  * wrote `oracle_sql.json` LAST, so a mid-loop kill left the output
  * directory without the one file the comparator needs and zeroed the
  * whole round's correctness signal. Bench learned these lessons at r5
  * and r9; this is the same set applied to Verify):
  *
  *   1. `oracle_sql.json` is written FIRST, before any query runs — a
  *      kill at any later instant still leaves a comparable artifact
  *      for every query dumped so far.
  *   2. Queries run cheapest-first, ordered by the committed bench
  *      baseline's per-query times (BENCH_LOCAL.json; relative order at
  *      sf0.1 transfers to sf0.01) — a wall-clock kill at minute N
  *      loses the expensive tail, not a uniform random half.
  *   3. Each query's dump is hard-cancelled (Spark job-group cancel) at
  *      a per-query cap (SPARK_GRAFT_VERIFY_QUERY_BUDGET, default
  *      180 s) so one host-paging stall cannot eat the whole run.
  *   4. A global wall budget (SPARK_GRAFT_VERIFY_TOTAL_BUDGET, default
  *      1200 s) degrades gracefully: past it, remaining queries still
  *      run but with a 20 s cap; past budget + 600 s they are skipped
  *      loudly (stderr + progress file) — Verify always terminates well
  *      inside any sane driver cap with every completed dump intact.
  *   5. `verify_progress.json` in the output dir is atomically rewritten
  *      after every query (done/failed/skipped + per-query seconds) and
  *      a JVM shutdown hook writes it one final time — a SIGTERM leaves
  *      a self-describing partial artifact, never silence.
  *   6. Dumps run on a small worker pool (SPARK_GRAFT_VERIFY_PAR,
  *      default 4; temp-view registrations race benignly — every worker
  *      registers identical definitions for a given sfDir, and Memo
  *      serializes cold derivations under its own lock) and each dump
  *      funnels through repartition(1) rather than coalesce(1), which
  *      would collapse map-only plans to a single thread. Both cut the
  *      wall time that made the driver cap reachable (~13 min serial →
  *      MEASURED 55-70 s pooled for the full 282-query surface at
  *      sf0.01/local[32]).
  */
object Verify {

  /** Cheapest-first order from a prior bench artifact's per-query
    * times. Queries without a prior (new this round) slot at 5 s —
    * after the sub-second bulk, before the heavy serving tail — so a
    * mid-run kill still loses only expensive/unknown work. Ties break
    * by name for determinism. */
  private[graft] def orderByPrior(names: Seq[String],
                                  prior: Map[String, Double]): Seq[String] =
    names.sortBy(n => (prior.getOrElse(n, 5.0), n))

  private def jsonEsc(s: String): String = "\"" + s.flatMap {
    case '"'  => "\\\""
    case '\\' => "\\\\"
    case '\n' => "\\n"
    case '\r' => "\\r"
    case '\t' => "\\t"
    case c if c < ' ' => f"\\u${c.toInt}%04x"
    case c => c.toString
  } + "\""

  /** Serialize progress and atomically replace outDir/verify_progress.json
    * (temp + move, so a reader never sees a torn file). Safe from the
    * shutdown hook at any instant. Synchronized: pool workers call it
    * concurrently and share the temp-file name — unsynchronized, one
    * worker's move can steal another's temp file mid-write. */
  private def writeProgress(acc: java.util.LinkedHashMap[String, (String, Double)],
                            outDir: String, total: Int): Unit = synchronized {
    val entries = acc.synchronized {
      import scala.jdk.CollectionConverters._
      acc.entrySet().asScala.toVector.map(e => e.getKey -> e.getValue)
    }
    val byStatus = entries.groupBy(_._2._1).view.mapValues(_.size).toMap
    val counts = Seq("ok", "failed", "skipped")
      .map(s => s""""$s":${byStatus.getOrElse(s, 0)}""").mkString(",")
    val body = entries.map { case (n, (st, sec)) =>
      s"""${jsonEsc(n)}:{"status":${jsonEsc(st)},"sec":$sec}"""
    }.mkString("{", ",", "}")
    val json =
      s"""{"total":$total,"recorded":${entries.size},$counts,"queries":$body}"""
    // verify_summary.json: the self-describing header a partial driver
    // handoff still carries (r16 verdict #1 — CORRECTNESS_r16.json came
    // back {} twice now; a comparator that finds this file next to
    // oracle_sql.json can at least report what Verify itself recorded).
    val summary =
      s"""{"total":$total,"recorded":${entries.size},$counts,""" +
        s""""oracle":"oracle_sql.json","sec":${entries.map(_._2._2).sum}}"""
    try {
      def atomicWrite(name: String, content: String): Unit = {
        val tmp = Paths.get(s"$outDir/.$name.tmp")
        Files.writeString(tmp, content + "\n")
        Files.move(tmp, Paths.get(s"$outDir/$name"),
          StandardCopyOption.REPLACE_EXISTING, StandardCopyOption.ATOMIC_MOVE)
      }
      atomicWrite("verify_progress.json", json)
      atomicWrite("verify_summary.json", summary)
    } catch { case e: Throwable =>
      System.err.println(s"[verify] progress write failed: $e")
    }
  }

  /** Write oracle_sql.json (the comparator's prerequisite — FIRST). */
  private def writeOracle(outDir: String): Unit = {
    val json = SparkEntry.oracleSql
      .map { case (k, v) => s"${jsonEsc(k)}: ${jsonEsc(v)}" }
      .mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
  }

  /** The full dump pass, factored out of main so VerifySpec can drive
    * it against the shared test session with a query filter. Budgets
    * and pool size are PARAMETERS (env-defaulted in main) so the spec
    * can execute the degradation ladder — cancel cap, degraded cap,
    * loud skip — rather than trusting the scaladoc. */
  private[graft] def run(spark: SparkSession, sfDir: String, outDir: String,
                         only: Option[Set[String]],
                         queryBudget: Double = 180.0,
                         totalBudget: Double = 1200.0,
                         skipAfter: Double = 600.0,
                         par: Int = 4): Unit = {
    new java.io.File(outDir).mkdirs()
    // name -> (status, seconds). Insertion-ordered; synchronized on
    // itself (mutated by pool workers, read by the progress writer +
    // hook). LOCAL to this run (r13 advice: object-level state made
    // run() non-reentrant — two concurrent runs, e.g. parallel spec
    // execution, would interleave and clobber each other's accounting).
    val acc = new java.util.LinkedHashMap[String, (String, Double)]()
    // (1) the comparator's prerequisite goes down before any query runs
    writeOracle(outDir)

    val priorFile = sys.env.getOrElse("SPARK_GRAFT_VERIFY_PRIOR", "BENCH_LOCAL.json")
    // order by warm time + cold derivation cost: Verify runs each Memo-
    // backed serving query COLD (fresh JVM), so the warm prior alone
    // would sort a 7 s table build among the sub-second bulk
    val prior: Map[String, Double] =
      try {
        val txt = Files.readString(Paths.get(priorFile))
        val warm = Bench.parsePriorTimes(txt)
        val cold = Bench.parsePriorTimes(txt, section = "cold")
        warm.map { case (k, v) => k -> (v + cold.getOrElse(k, 0.0)) }
      } catch { case _: Throwable => Map.empty }
    val selected = SparkEntry.queries
      .filter { case (name, _) => only.forall(_.contains(name)) }
    val ordered = orderByPrior(selected.keys.toSeq, prior)
    val total = ordered.size

    val hook = new Thread(() => {
      writeProgress(acc, outDir, total)
      val n = acc.synchronized(acc.size())
      System.err.println(s"[verify] shutdown with $n/$total recorded — progress file written")
    })
    Runtime.getRuntime.addShutdownHook(hook)
    val t0 = System.nanoTime()
    def elapsed: Double = (System.nanoTime() - t0) / 1e9

    val watchdog = new java.util.Timer("verify-watchdog", true)
    val queue = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    ordered.foreach(queue.add)

    def dumpOne(name: String): Unit = {
      // Degrade, never die: inside budget → full cap; past budget →
      // a tight degraded cap; past budget + skipAfter → skip (loudly).
      val cap =
        if (elapsed <= totalBudget) queryBudget
        else if (elapsed <= totalBudget + skipAfter) math.min(20.0, queryBudget)
        else {
          System.err.println(s"[verify] $name SKIPPED: wall budget exhausted (${elapsed.toInt} s)")
          acc.synchronized { acc.put(name, ("skipped", 0.0)): Unit }
          return
        }
      val group = s"verify-$name-${System.nanoTime()}"
      spark.sparkContext.setJobGroup(group, name, interruptOnCancel = true)
      val cancel = new java.util.TimerTask {
        override def run(): Unit = {
          System.err.println(f"[verify] $name cancelled at $cap%.0f s cap")
          spark.sparkContext.cancelJobGroupAndFutureJobs(group)
        }
      }
      watchdog.schedule(cancel, (cap * 1000).toLong)
      val qt0 = System.nanoTime()
      val status =
        try {
          selected(name)(spark, sfDir).repartition(1).write.mode("overwrite")
            .parquet(s"$outDir/$name")
          "ok"
        } catch { case e: Throwable =>
          System.err.println(s"[verify] $name failed: ${e.getMessage}")
          "failed"
        } finally { cancel.cancel(); spark.sparkContext.clearJobGroup() }
      val sec = (System.nanoTime() - qt0) / 1e9
      acc.synchronized { acc.put(name, (status, math.rint(sec * 1000) / 1000)): Unit }
      writeProgress(acc, outDir, total)
    }

    val workers = (1 to math.max(1, par)).map { i =>
      val th = new Thread(() => {
        var n = queue.poll()
        while (n != null) {
          // dumpOne catches query failures itself; this belt catches a
          // failure OUTSIDE that try (scheduling, bookkeeping) so one
          // surprise cannot kill the worker and strand the queue tail
          try dumpOne(n) catch { case e: Throwable =>
            System.err.println(s"[verify] $n worker-level failure: $e")
            acc.synchronized { acc.put(n, ("failed", 0.0)): Unit }
          }
          n = queue.poll()
        }
      }, s"verify-worker-$i")
      th.start(); th
    }
    workers.foreach(_.join())
    watchdog.cancel()
    writeProgress(acc, outDir, total)
    try Runtime.getRuntime.removeShutdownHook(hook) catch { case _: Throwable => () }
    val failed = acc.synchronized {
      import scala.jdk.CollectionConverters._
      acc.entrySet().asScala.count(_.getValue._1 != "ok")
    }
    System.err.println(f"[verify] done: $total queries, $failed not-ok, ${elapsed}%.0f s wall")
  }

  def main(args: Array[String]): Unit = {
    val (sfDir, outDir) = (args(0), args(1))
    // Optional third arg: comma-separated query-name filter (local
    // iteration aid; the driver always runs the full surface).
    val only: Option[Set[String]] =
      if (args.length > 2) Some(args(2).split(",").toSet) else None
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.extensions", classOf[functions.GraftExtensions].getName)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    run(spark, sfDir, outDir, only,
      queryBudget = sys.env.getOrElse("SPARK_GRAFT_VERIFY_QUERY_BUDGET", "180").toDouble,
      totalBudget = sys.env.getOrElse("SPARK_GRAFT_VERIFY_TOTAL_BUDGET", "1200").toDouble,
      par = sys.env.getOrElse("SPARK_GRAFT_VERIFY_PAR", "4").toInt)
    spark.stop()
  }
}
