package graft
import java.util.concurrent.atomic.AtomicLong

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession

/** Cumulative job/stage/task counters — snapshotted around each timed
  * query so the bench JSON carries the scheduling cost next to the wall
  * time (a query that is "slow" with 4 jobs and one that is slow with 40
  * are different problems; wall time alone cannot tell them apart).
  * Shared by [[Bench]] and [[graft.tools.ScaleSweep]] — ONE counting
  * discipline, so the scaling curves in BASELINE.md are comparable with
  * the bench's per-query counts. */
private[graft] final class SchedulerCounters extends SparkListener {
  val jobs = new AtomicLong
  val stages = new AtomicLong
  val tasks = new AtomicLong
  override def onJobStart(j: SparkListenerJobStart): Unit = {
    jobs.incrementAndGet(); ()
  }
  override def onStageCompleted(s: SparkListenerStageCompleted): Unit = {
    stages.incrementAndGet()
    tasks.addAndGet(s.stageInfo.numTasks.toLong); ()
  }

  /** Drain the listener bus, then read the three counters. */
  def snapshot(sc: org.apache.spark.SparkContext): (Long, Long, Long) = {
    org.apache.spark.graft.ListenerDrain.drain(sc)
    (jobs.get(), stages.get(), tasks.get())
  }
}

object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // Untimed warmup (documented in BASELINE.md): JIT/codegen for the
    // join+agg shapes via the sf0.001 flagship, plus footer/listing reads
    // of the bench tables — so the first timed query measures the query,
    // not session startup.
    // the two warmup steps fail independently: a missing sf0.001
    // flagship fixture must not cancel the footer/listing warmup of the
    // ACTUAL bench tables (pass-1 timings would absorb listing cost)
    try SparkEntry.entry(spark).count()
    catch { case _: Throwable => () }
    try Seq("lineitem", "orders", "part", "documents", "embeddings", "events")
      .foreach(t => spark.read.parquet(s"$sfDir/$t.parquet").schema)
    catch { case _: Throwable => () }
    val counters = new SchedulerCounters
    spark.sparkContext.addSparkListener(counters)
    def snapshot(): (Long, Long, Long) = counters.snapshot(spark.sparkContext)
    // Dev aids: SPARK_GRAFT_ONLY=q1,q2 restricts the run;
    // SPARK_GRAFT_PASSES (or legacy SPARK_GRAFT_REPEAT) sets the pass
    // count. Default is TWO full passes in one JVM with the per-query MIN
    // as the headline — four rounds of driver benches ran under ~2×
    // co-tenant load and single queries spiked 10× between runs, so one
    // pass measures the load lottery, not the engine; min-of-2 lands in
    // the idle band whenever either pass escapes the noise.
    val only = sys.env.get("SPARK_GRAFT_ONLY")
      .map(_.split(",").map(_.trim).toSet)
    val passes = sys.env.get("SPARK_GRAFT_PASSES")
      .orElse(sys.env.get("SPARK_GRAFT_REPEAT")).map(_.toInt)
      .getOrElse(2).max(1)
    val selected = SparkEntry.queries.toSeq
      .filter { case (n, _) => only.forall(_.contains(n)) }
    val overrides = SparkEntry.benchOverrides
    val phased = SparkEntry.benchPhases

    final case class QRun(sec: Double, jobs: Long, stages: Long,
        tasks: Long, phases: Seq[(String, Double)], failed: Boolean,
        pass: Int)
    def runOne(name: String, fn0: (SparkSession, String) =>
        org.apache.spark.sql.DataFrame, pass: Int): QRun = {
      val fn = overrides.getOrElse(name, fn0)
      var failed = false
      // a crashing query must NEVER pass silently as a near-zero "best"
      // time: the failure is announced on stderr and counted into the
      // metric line's `errors` field (the run still completes — one bad
      // query shouldn't lose the other 107 measurements)
      def guarded[A](zero: A)(op: => A): A =
        try op catch {
          case e: Throwable =>
            failed = true
            System.err.println(
              s"[bench] ERROR $name: ${e.getClass.getSimpleName}: " +
                String.valueOf(e.getMessage).take(200))
            zero
        }
      val (j0, s0, t0c) = snapshot()
      val t0 = System.nanoTime()
      val phaseSecs = phased.get(name) match {
        case Some(mk) =>
          // phased query: the headline time is still first-byte-to-last
          // (phase sum + plan build); each phase timed separately
          guarded(Seq.empty[(String, () => Long)])(mk(spark, sfDir))
            .map { case (label, thunk) =>
              val p0 = System.nanoTime()
              guarded(-1L)(thunk())
              label -> (System.nanoTime() - p0) / 1e9
            }
        case None =>
          guarded(-1L)(fn(spark, sfDir).count())
          Nil
      }
      val dt = (System.nanoTime() - t0) / 1e9
      val (j1, s1, t1c) = snapshot()
      // drop caches OUTSIDE the timed window: operators that cache an
      // intermediate (shingle sets, signatures) must not squat on
      // storage memory while later queries run
      spark.catalog.clearCache()
      QRun(dt, j1 - j0, s1 - s0, t1c - t0c, phaseSecs, failed, pass)
    }
    val baseRuns: Seq[(String, QRun)] =
      for (p <- 1 to passes; (name, fn0) <- selected)
        yield name -> runOne(name, fn0, p)
    // Adaptive extra pass (BENCH_r08 lesson: min-of-2 lost four queries
    // to a busy co-tenant — both passes of s3 drew load and the official
    // artifact overstated 4×). A query earns ONE more pass when its base
    // passes disagree by >2× (at least one was load-noised) or its best
    // time sits >1.5× above the recorded idle band (ALL passes were
    // noised — disagreement alone can't see that). Bands come from
    // tools/idle_bands.json, written from an idle run's bench_detail and
    // kept in-repo per BASELINE.md's protocol note; queries without a
    // band use the disagreement trigger only.
    val idleBands: Map[String, Double] = {
      val p = java.nio.file.Paths.get("tools", "idle_bands.json")
      if (!java.nio.file.Files.exists(p)) Map.empty
      else {
        val s = new String(java.nio.file.Files.readAllBytes(p), "UTF-8")
        """"([^"]+)"\s*:\s*([0-9.]+)""".r.findAllMatchIn(s)
          .map(m => m.group(1) -> m.group(2).toDouble).toMap
      }
    }
    val SpreadTrigger = 2.0
    val BandTrigger = 1.5
    val extraRuns: Seq[(String, QRun)] = if (passes < 2) Nil else
      for {
        (name, fn0) <- selected
        secs = baseRuns.collect { case (`name`, r) if !r.failed => r.sec }
        if secs.size >= 2 && (secs.max > secs.min * SpreadTrigger ||
          idleBands.get(name).exists(b => secs.min > b * BandTrigger))
      } yield name -> runOne(name, fn0, passes + 1)
    val runs: Seq[(String, QRun)] = baseRuns ++ extraRuns
    // headline per query = MIN across passes (its counts/phases ride along
    // so bench_counts stays consistent with the reported seconds)
    val best: Seq[(String, QRun)] = selected.map { case (n, _) =>
      val rs = runs.collect { case (`n`, r) => r }
      // a failed pass (near-zero wall) must not beat a real measurement
      val ok = rs.filterNot(_.failed)
      n -> (if (ok.nonEmpty) ok.minBy(_.sec) else rs.minBy(_.sec))
    }
    // The driver parses the FINAL metric line out of a bounded stdout tail
    // (~2 KB). Rounds 5 AND 6 learned this the hard way: at 96 queries even
    // a compact per-query seconds map is ~3 KB and the tail truncates the
    // line mid-JSON → `parsed: null`. So the final line is CONSTANT-SIZE —
    // total seconds + query count + sf only. Per-query seconds and
    // scheduler counts go on their own earlier lines (informational; may
    // scroll out of the tail) and in target/bench_detail.json.
    def r4(v: Double): String = "%.4f".formatLocal(java.util.Locale.ROOT, v)
    def phasesJson(ph: Seq[(String, Double)]): String =
      ph.map { case (l, v) => s"\"$l\":${r4(v)}" }.mkString(""","phases":{""", ",", "}")
    val qs = best.map { case (k, r) => s"\"" + k + "\":" + r4(r.sec) }
      .mkString("{", ",", "}")
    val counts = best.map { case (k, r) =>
      val ph = if (r.phases.isEmpty) "" else phasesJson(r.phases)
      s"""\"$k\":{"jobs":${r.jobs},"stages":${r.stages},"tasks":${r.tasks}$ph}"""
    }.mkString("{", ",", "}")
    val total = best.map(_._2.sec).sum
    // Reference-surface 13-query subset (the round-1 baseline set in
    // BASELINE.md): summed here so the close and the judge read the
    // subset-vs-baseline number straight off the metric line instead of
    // recomputing it from a detail file that later runs may replace.
    val subsetNames = Set(
      "a1_category_kpi", "a2_order_kpi_complete", "a3_order_kpi_items_only",
      "a4_order_kpi_orders_only", "a6_null_check", "a8_distinct_keys",
      "j3_ri_items_without_order", "j4_ri_items_without_product",
      "m1_merge_category_kpi", "p1_filter_project",
      "p3_anti_orders_without_items", "u1_union_parts_agg",
      "w1_processing_date")
    val subsetRuns = best.filter { case (n, _) => subsetNames.contains(n) }
    val subsetSum = subsetRuns.map(_._2.sec).sum
    // queries whose EVERY pass failed: announced in the metric line so a
    // "fast" total can never quietly mean "measured nothing"
    val nErrors = selected.count { case (n, _) =>
      runs.collect { case (`n`, r) => r }.forall(_.failed) }
    val metricLine =
      s"""{"metric":"total","value":${r4(total)},"unit":"sec","n_queries":${best.size},"passes":$passes,"extra":${extraRuns.size},"errors":$nErrors,"subset":${r4(subsetSum)},"subset_n":${subsetRuns.size},"sf":"$sfDir"}"""
    val detail = {
      val perPass = runs.map { case (k, r) =>
        val ph = if (r.phases.isEmpty) "" else phasesJson(r.phases)
        s"""\"$k#${r.pass}\":{"sec":${r.sec},"jobs":${r.jobs},"stages":${r.stages},"tasks":${r.tasks}$ph}"""
      }
      val mins = best.map { case (k, r) => s"\"$k\":${r4(r.sec)}" }
      // per-query pass spread: every measured wall time in pass order, so
      // load noise is visible per query without reparsing the runs map
      val spread = selected.map { case (n, _) =>
        val ss = runs.collect { case (`n`, r) => r4(r.sec) }
        s"\"$n\":[${ss.mkString(",")}]"
      }
      s"""{"min":${mins.mkString("{", ",", "}")},"spread":${spread.mkString("{", ",", "}")},"runs":${perPass.mkString("{", ",", "}")}}"""
    }
    try {
      val p = java.nio.file.Paths.get("target", "bench_detail.json")
      java.nio.file.Files.createDirectories(p.getParent)
      java.nio.file.Files.write(p, detail.getBytes("UTF-8"))
      // bench_detail.json is overwritten by EVERY run, including
      // SPARK_GRAFT_ONLY mini-runs — two round closes lost their subset
      // detail to a later re-measure. Each run also writes a timestamped
      // copy that nothing ever clobbers; the close cites that file.
      val runDir = java.nio.file.Paths.get("target", "bench_runs")
      java.nio.file.Files.createDirectories(runDir)
      val stamp = new java.text.SimpleDateFormat("yyyyMMdd_HHmmss")
        .format(new java.util.Date())
      java.nio.file.Files.write(
        runDir.resolve(s"detail_$stamp.json"), detail.getBytes("UTF-8"))
    } catch { case _: Throwable => () }
    println(s"""{"bench_counts":$counts}""")
    println(s"""{"bench_seconds":$qs}""")
    println(metricLine)
    spark.stop()
  }
}
