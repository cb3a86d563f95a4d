package graft.tools

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession

/** Counts Spark jobs/stages and the driver-side gaps BETWEEN jobs during
  * one pipeline run — the structural serial floor that Amdahl-caps the
  * N-vs-4N scaling pair at small rung sizes (each job pays fixed
  * scheduling latency; gaps between jobs are pure driver time). Wall
  * numbers on this VM swing with host windows; job/stage counts do not. */
object JobCount {
  def main(args: Array[String]): Unit = {
    val cores = if (args.nonEmpty) args(0).toInt else 8
    val e = if (args.length > 1) args(1).toInt else 25000
    val dim = if (args.length > 2) args(2).toInt else 256
    // warm=1: run the pipeline twice and report the SECOND run — the
    // cold run's gaps are dominated by one-time codegen/JIT that the
    // bench's warmup also absorbs, so only warmed gaps reflect the
    // steady-state serial floor the scaling pair pays.
    val warm = if (args.length > 3) args(3).toInt else 0
    val spark = SparkSession.builder().master(s"local[$cores]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.default.parallelism", "8")
      .config("spark.sql.adaptive.enabled",
        sys.env.getOrElse("SPARK_GRAFT_AQE", "true"))
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    @volatile var jobs = 0
    @volatile var stages = 0
    @volatile var gapMs = 0L
    @volatile var inJobMs = 0L
    @volatile var lastEnd = 0L
    @volatile var taskRunMs = 0L
    @volatile var taskCpuNs = 0L
    val listener = new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit = synchronized {
        jobs += 1
        val gap = if (lastEnd > 0) j.time - lastEnd else 0L
        if (lastEnd > 0) gapMs += gap
        val site = j.stageInfos.lastOption.map(s => s.name.take(60)).getOrElse("?")
        val desc = Option(j.properties)
          .flatMap(p => Option(p.getProperty("spark.job.description"))).getOrElse("-")
        val nStages = j.stageInfos.size
        println(f"[job] #${j.jobId}%3d gap=${gap / 1000.0}%6.2f s stages=$nStages%2d  $desc%-40s $site")
      }
      override def onJobEnd(j: SparkListenerJobEnd): Unit = synchronized { lastEnd = j.time }
      override def onStageCompleted(s: SparkListenerStageCompleted): Unit = synchronized {
        stages += 1
        val dur = s.stageInfo.completionTime.getOrElse(0L) - s.stageInfo.submissionTime.getOrElse(0L)
        inJobMs += dur
        if (sys.env.contains("SPARK_GRAFT_STAGELOG")) {
          val rdds = s.stageInfo.rddInfos.map(_.name).distinct.mkString(",").take(110)
          val tm = s.stageInfo.taskMetrics
          val run = if (tm != null) tm.executorRunTime / 1000.0 else -1.0
          val cpu = if (tm != null) tm.executorCpuTime / 1e9 else -1.0
          val sr = if (tm != null) tm.shuffleReadMetrics.totalBytesRead >> 20 else -1L
          val sw = if (tm != null) tm.shuffleWriteMetrics.bytesWritten >> 20 else -1L
          println(f"[stage] ${s.stageInfo.stageId}%4d ${dur / 1000.0}%7.2f s tasks=${s.stageInfo.numTasks}%3d run=$run%.1f cpu=$cpu%.1f sRd=${sr}M sWr=${sw}M ${s.stageInfo.name.take(40)} | $rdds")
        }
      }
      override def onTaskEnd(t: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit =
        synchronized {
          if (t.taskMetrics != null) {
            taskRunMs += t.taskMetrics.executorRunTime
            taskCpuNs += t.taskMetrics.executorCpuTime
          }
        }
    }
    spark.sparkContext.addSparkListener(listener)

    val cfg = graft.PipelineConfig(
      synth = graft.ingest.SynthConfig(entitiesPerKg = e),
      embed = graft.embed.EmbedderConfig(dim = dim), useLsh = Some(true))
    if (warm > 0) {
      graft.Pipeline.runSynthetic(spark, cfg).canonicalTriples.count()
      Thread.sleep(500)
      synchronized { jobs = 0; stages = 0; gapMs = 0L; inJobMs = 0L; lastEnd = 0L
        taskRunMs = 0L; taskCpuNs = 0L }
      println("[jobcount] === warmup done; counting run 2 ===")
    }
    val t0 = System.nanoTime()
    val n = graft.Pipeline.runSynthetic(spark, cfg).canonicalTriples.count()
    val wall = (System.nanoTime() - t0) / 1e9
    Thread.sleep(500) // let the listener bus drain
    println(f"[jobcount] cores=$cores E=$e triples=$n wall=$wall%.1f s jobs=$jobs stages=$stages " +
      f"between_jobs=${gapMs / 1000.0}%.1f s stage_time=${inJobMs / 1000.0}%.1f s " +
      f"task_run=${taskRunMs / 1000.0}%.1f s task_cpu=${taskCpuNs / 1e9}%.1f s")
    spark.stop()
  }
}
