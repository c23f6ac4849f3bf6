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
    try {
      SparkEntry.entry(spark).count()
      Seq("lineitem", "orders", "part", "documents", "embeddings", "events")
        .foreach(t => spark.read.parquet(s"$sfDir/$t.parquet").schema)
    } catch { case _: Throwable => () }
    val counters = new SchedulerCounters
    spark.sparkContext.addSparkListener(counters)
    def snapshot(): (Long, Long, Long) = counters.snapshot(spark.sparkContext)
    // Dev aid: SPARK_GRAFT_ONLY=q1,q2 restricts the run (and
    // SPARK_GRAFT_REPEAT=n repeats it) for variance measurement of a
    // single query; unset in driver runs, where the full suite runs once.
    val only = sys.env.get("SPARK_GRAFT_ONLY")
      .map(_.split(",").map(_.trim).toSet)
    val repeat = sys.env.getOrElse("SPARK_GRAFT_REPEAT", "1").toInt
    val selected = SparkEntry.queries
      .filter { case (n, _) => only.forall(_.contains(n)) }
    val results = (1 to repeat).flatMap(r => selected.map { case (n, f) =>
      (if (repeat > 1) s"$n#$r" else n) -> f
    }).map { case (name, fn) =>
      val (j0, s0, t0c) = snapshot()
      val t0 = System.nanoTime()
      try { fn(spark, sfDir).count() } catch { case _: Throwable => -1L }
      val dt = (System.nanoTime() - t0) / 1e9
      val (j1, s1, t1c) = snapshot()
      // drop caches OUTSIDE the timed window: operators that cache an
      // intermediate (shingle sets, signatures) must not squat on storage
      // memory while later queries run
      spark.catalog.clearCache()
      (name, dt, (j1 - j0, s1 - s0, t1c - t0c))
    }
    // The driver parses the FINAL metric line out of a bounded stdout tail
    // (~2 KB). Rounds 5 AND 6 learned this the hard way: at 96 queries even
    // a compact per-query seconds map is ~3 KB and the tail truncates the
    // line mid-JSON → `parsed: null`. So the final line is CONSTANT-SIZE —
    // total seconds + query count + sf only. Per-query seconds and
    // scheduler counts go on their own earlier lines (informational; may
    // scroll out of the tail) and in target/bench_detail.json.
    def r4(v: Double): String = "%.4f".formatLocal(java.util.Locale.ROOT, v)
    val qs = results.map { case (k, v, _) => s"\"" + k + "\":" + r4(v) }
      .mkString("{", ",", "}")
    val counts = results.map { case (k, _, (j, s, t)) =>
      s"""\"$k\":{"jobs":$j,"stages":$s,"tasks":$t}"""
    }.mkString("{", ",", "}")
    val total = results.map(_._2).sum
    val metricLine =
      s"""{"metric":"total","value":${r4(total)},"unit":"sec","n_queries":${results.size},"sf":"$sfDir"}"""
    val detail = results.map { case (k, v, (j, s, t)) =>
      s"""\"$k\":{"sec":$v,"jobs":$j,"stages":$s,"tasks":$t}"""
    }.mkString("{", ",", "}")
    try {
      val p = java.nio.file.Paths.get("target", "bench_detail.json")
      java.nio.file.Files.createDirectories(p.getParent)
      java.nio.file.Files.write(p, detail.getBytes("UTF-8"))
    } catch { case _: Throwable => () }
    println(s"""{"bench_counts":$counts}""")
    println(s"""{"bench_seconds":$qs}""")
    println(metricLine)
    spark.stop()
  }
}
