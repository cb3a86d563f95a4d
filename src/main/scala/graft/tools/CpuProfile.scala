package graft.tools

import org.apache.spark.sql.SparkSession

/** Whole-JVM CPU attribution while battery queries run: every ~200 ms,
  * reads per-thread CPU time (ThreadMXBean) and charges the delta to
  * the thread's name prefix AND to the top interesting frame of its
  * current stack — answers "which threads, doing what, burn the CPU"
  * when wall-clock profiles are drowned by host scheduling noise.
  * args: name[,name...] sfDir */
object CpuProfile {
  def main(args: Array[String]): Unit = {
    val names = args(0).split(',').map(_.trim).filter(_.nonEmpty)
    val sfDir = args(1)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.shuffle.partitions", (cpus.toInt * 2).toString)
      .config("spark.local.dir", "/dev/shm/spark-graft")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // between-job gaps + per-job walls: the driver-serial floor that
    // Amdahl-caps the N-vs-4N ladder once task compute shrinks
    @volatile var lastEnd = 0L
    val jobLines = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    val jobStartAt = new java.util.concurrent.ConcurrentHashMap[Int, (Long, Long, String)]()
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(j: org.apache.spark.scheduler.SparkListenerJobStart): Unit = {
        val gap = if (lastEnd > 0) math.max(0L, j.time - lastEnd) else 0L
        val site = j.stageInfos.lastOption.map(_.name.take(60)).getOrElse("?")
        jobStartAt.put(j.jobId, (j.time, gap, site))
      }
      override def onJobEnd(j: org.apache.spark.scheduler.SparkListenerJobEnd): Unit = {
        lastEnd = math.max(lastEnd, j.time)
        Option(jobStartAt.remove(j.jobId)).foreach { case (t0, gap, site) =>
          jobLines.add(f"[cpuprof] job#${j.jobId}%3d dur=${(j.time - t0) / 1000.0}%6.2f gap=${gap / 1000.0}%5.2f $site")
        }
      }
    })
    val tmx = java.lang.management.ManagementFactory.getThreadMXBean
    val byName = new java.util.concurrent.ConcurrentHashMap[String, java.util.concurrent.atomic.AtomicLong]()
    val byFrame = new java.util.concurrent.ConcurrentHashMap[String, java.util.concurrent.atomic.AtomicLong]()
    val lastCpu = new java.util.concurrent.ConcurrentHashMap[Long, Long]()
    @volatile var sampling = true
    def prefix(n: String): String = n.replaceAll("[0-9]+$", "#").take(40)
    val sampler = new Thread(() => {
      while (sampling) {
        val infos = tmx.dumpAllThreads(false, false)
        infos.foreach { ti =>
          val id = ti.getThreadId
          val cpu = tmx.getThreadCpuTime(id)
          if (cpu > 0) {
            val prev = lastCpu.getOrDefault(id, 0L)
            lastCpu.put(id, cpu)
            val d = cpu - prev
            if (prev > 0 && d > 0) {
              byName.computeIfAbsent(prefix(ti.getThreadName), _ => new java.util.concurrent.atomic.AtomicLong()).addAndGet(d)
              val st = ti.getStackTrace
              val frame = st.find { f =>
                val c = f.getClassName
                c.startsWith("graft.") || c.contains("janino") || c.contains("codegen") ||
                c.contains("catalyst") || c.contains("spark.sql.execution") ||
                c.contains("scala.collection")
              }.orElse(st.headOption)
                .map(f => f.getClassName.take(60) + "." + f.getMethodName).getOrElse("-")
              byFrame.computeIfAbsent(frame, _ => new java.util.concurrent.atomic.AtomicLong()).addAndGet(d)
            }
          }
        }
        Thread.sleep(200)
      }
    })
    sampler.setDaemon(true)
    sampler.start()
    names.foreach { name =>
      val t0 = System.nanoTime()
      // "pipeline:E:dim" profiles the ladder workload itself
      val n = if (name.startsWith("pipeline:")) {
        val parts = name.split(':')
        val cfg = graft.PipelineConfig(
          synth = graft.ingest.SynthConfig(entitiesPerKg = parts(1).toInt),
          embed = graft.embed.EmbedderConfig(dim = parts(2).toInt),
          useLsh = Some(true))
        graft.Pipeline.runSynthetic(spark, cfg).canonicalTriples.count()
      } else graft.SparkEntry.queries(name)(spark, sfDir).count()
      println(f"[cpuprof] $name rows=$n sec=${(System.nanoTime() - t0) / 1e9}%.1f")
    }
    sampling = false
    Thread.sleep(300)
    import scala.jdk.CollectionConverters._
    jobLines.asScala.foreach(println)
    println("[cpuprof] == CPU by thread prefix (s) ==")
    byName.asScala.toSeq.map { case (k, v) => (k, v.get / 1e9) }.sortBy(-_._2).take(20)
      .foreach { case (k, v) => println(f"[cpuprof] $v%8.1f  $k") }
    println("[cpuprof] == CPU by sampled frame (s) ==")
    byFrame.asScala.toSeq.map { case (k, v) => (k, v.get / 1e9) }.sortBy(-_._2).take(30)
      .foreach { case (k, v) => println(f"[cpuprof] $v%8.1f  $k") }
    spark.stop()
  }
}
