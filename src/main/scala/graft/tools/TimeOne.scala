package graft.tools

import org.apache.spark.sql.SparkSession

/** Time battery queries exactly the way the Bench battery runs them
  * (same session shape, `.count()` materialization) — isolates a
  * per-query optimization from VerifyOne's coalesce(1) write artifact.
  * `names` may be a comma-separated sequence: all run IN ORDER in ONE
  * session, which reproduces battery-context effects (accumulated
  * persisted blocks, shared kg fixture, codegen/JIT state) that a
  * standalone run can't see.
  * args: name[,name...] sfDir [reps]   (reps repeats the whole sequence)
  * env:  SPARK_GRAFT_CPUS (default 32), SPARK_GRAFT_PARTS (default
  *       cpus — Bench's battery uses cpus*2; pass it to match exactly)
  */
object TimeOne {
  def main(args: Array[String]): Unit = {
    val names = args(0).split(',').map(_.trim).filter(_.nonEmpty)
    val sfDir = args(1)
    val reps = if (args.length > 2) args(2).toInt else 1
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val parts = sys.env.getOrElse("SPARK_GRAFT_PARTS", cpus)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.adaptive.enabled", sys.env.getOrElse("SPARK_GRAFT_AQE", "true"))
      .config("spark.sql.shuffle.partitions", parts)
      .config("spark.local.dir", "/dev/shm/spark-graft")
      .config("spark.io.compression.lz4.blockSize", "512k")
      .config("spark.shuffle.file.buffer", "1m")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // SPARK_GRAFT_JOBLOG=1: per-query job/stage counts and between-job
    // gap sums — the structural cost that degraded host windows multiply
    // (each job pays 0.1-5 s of driver latency depending on the window)
    @volatile var jobs = 0
    @volatile var stages = 0
    @volatile var gapMs = 0L
    @volatile var lastEnd = 0L
    val jobLog = sys.env.getOrElse("SPARK_GRAFT_JOBLOG", "0")
    val jobStartAt = new java.util.concurrent.ConcurrentHashMap[Int, (Long, String)]()
    if (jobLog != "0")
      spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
        override def onJobStart(j: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
          synchronized {
            jobs += 1; if (lastEnd > 0) gapMs += math.max(0L, j.time - lastEnd)
            if (jobLog == "2") {
              val site = j.stageInfos.lastOption.map(_.name.take(70)).getOrElse("?")
              val gap = if (lastEnd > 0) math.max(0L, j.time - lastEnd) else 0L
              jobStartAt.put(j.jobId, (j.time, f"gap=${gap / 1000.0}%.1f stages=${j.stageInfos.size}%2d $site"))
            }
          }
        override def onJobEnd(j: org.apache.spark.scheduler.SparkListenerJobEnd): Unit =
          synchronized {
            lastEnd = math.max(lastEnd, j.time)
            if (jobLog == "2") Option(jobStartAt.remove(j.jobId)).foreach { case (t0, info) =>
              println(f"[job] #${j.jobId}%3d dur=${(j.time - t0) / 1000.0}%6.2f $info")
            }
          }
        override def onStageCompleted(s: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit =
          synchronized { stages += 1 }
      })
    // process CPU (user+sys of the whole JVM) — the window-stable cost
    // metric on this host, whose wall clock swings 2-3x with scheduling
    val osBean = java.lang.management.ManagementFactory.getOperatingSystemMXBean
      .asInstanceOf[com.sun.management.OperatingSystemMXBean]
    (1 to reps).foreach { i =>
      names.foreach { name =>
        val fn = graft.SparkEntry.queries(name)
        val (j0, s0, g0) = (jobs, stages, gapMs)
        val c0 = osBean.getProcessCpuTime
        val t0 = System.nanoTime()
        val n = fn(spark, sfDir).count()
        val sec = (System.nanoTime() - t0) / 1e9
        val cpu = (osBean.getProcessCpuTime - c0) / 1e9
        val jInfo = if (sys.env.get("SPARK_GRAFT_JOBLOG").contains("1"))
          f" jobs=${jobs - j0} stages=${stages - s0} gaps=${(gapMs - g0) / 1000.0}%.1f" else ""
        println(f"TIMEONE $name rep=$i rows=$n sec=$sec%.3f cpu=$cpu%.1f$jInfo")
      }
    }
    spark.stop()
  }
}
