package graft.tools

import scala.collection.mutable

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession

/** Dev profiling harness: per-stage task counts, shuffle bytes and wall
  * durations for named queries — the guide §1 stage budget, measured
  * instead of guessed. Not part of the driver contract.
  *
  * Usage: runMain graft.tools.QueryStages <sfDir> <query>[,<query>...]
  */
object QueryStages {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val names = if (args.length > 1) args(1).split(",").toSeq
      else Seq("x9_gap_fill")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val b0 = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
    // A/B knob: SPARK_GRAFT_CONF="k=v;k=v" applies extra confs so a
    // candidate setting can be measured without a code edit.
    val spark = sys.env.get("SPARK_GRAFT_CONF").toSeq
      .flatMap(_.split(";")).map(_.split("=", 2))
      .foldLeft(b0)((b, kv) => b.config(kv(0).trim, kv(1).trim))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    final case class St(id: Int, name: String, tasks: Int, ms: Long,
        sr: Long, sw: Long, in: Long)
    val stages = mutable.ArrayBuffer.empty[St]
    val stageJob = mutable.Map.empty[Int, Int]
    val jobDesc = mutable.Map.empty[Int, String]
    val listener = new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit = {
        j.stageIds.foreach(sid => stageJob(sid) = j.jobId)
        jobDesc(j.jobId) = Option(j.properties)
          .flatMap(p => Option(p.getProperty("spark.job.description")))
          .orElse(Option(j.properties)
            .flatMap(p => Option(p.getProperty("callSite.short"))))
          .getOrElse("")
      }
      override def onStageCompleted(s: SparkListenerStageCompleted): Unit = {
        val i = s.stageInfo
        val ms = (for { a <- i.completionTime; b <- i.submissionTime }
          yield a - b).getOrElse(-1L)
        val m = i.taskMetrics
        stages += St(i.stageId, i.name.takeWhile(_ != '\n').take(60),
          i.numTasks, ms, m.shuffleReadMetrics.totalBytesRead,
          m.shuffleWriteMetrics.bytesWritten, m.inputMetrics.bytesRead)
      }
    }
    spark.sparkContext.addSparkListener(listener)

    names.foreach { n =>
      for (pass <- 1 to 2) {
        stages.clear()
        val t0 = System.nanoTime()
        graft.SparkEntry.queries(n)(spark, sfDir).count()
        val dt = (System.nanoTime() - t0) / 1e9
        org.apache.spark.graft.ListenerDrain.drain(spark.sparkContext)
        spark.catalog.clearCache()
        println(f"\n===== $n pass $pass: $dt%.2f s, ${stages.size} stages, ${stages.map(_.tasks).sum} tasks")
        stages.sortBy(_.id).foreach { s =>
          val j = stageJob.getOrElse(s.id, -1)
          val d = jobDesc.getOrElse(j, "").take(50)
          println(f"  [j$j%3d s${s.id}%3d] ${s.ms}%6d ms ${s.tasks}%4d tasks  in=${s.in / 1024}%8d KB  sr=${s.sr / 1024}%7d KB  sw=${s.sw / 1024}%7d KB  ${s.name}  | $d")
        }
      }
    }
    spark.stop()
  }
}
