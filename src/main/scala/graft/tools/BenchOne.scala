package graft.tools

import org.apache.spark.sql.SparkSession
import graft.{Pipeline, PipelineConfig}

/** One full pipeline run at one parallelism level in a fresh JVM —
  * isolates the N-vs-4N scaling measurement from same-JVM order effects
  * (JIT state, heap debt) when diagnosing Bench variance.
  * Args: cores [entitiesPerKg] [dim] [warmup(0|1)] */
object BenchOne {

  /** Per-stage accounting row (diagnosis of anti-scaling): records and
    * spill separate "more rows" from "fatter serialization" when shuffle
    * bytes move between configurations. */
  private final case class St(name: String, wall: Long, run: Long, cpu: Long, gc: Long,
                              deser: Long, fetchWait: Long,
                              shufWB: Long, shufWRec: Long,
                              shufRB: Long, shufRRec: Long,
                              spillMem: Long, spillDisk: Long)

  def main(args: Array[String]): Unit = {
    val cores = if (args.nonEmpty) args(0).toInt else 8
    val e = if (args.length > 1) args(1).toInt else 50000
    val dim = if (args.length > 2) args(2).toInt else 256
    val warm = if (args.length > 3) args(3).toInt else 1
    // experiment overrides: decouple plan shape (partition counts) from
    // core count, to isolate partitioning effects from parallelism
    val parts = sys.env.getOrElse("SPARK_GRAFT_SHUFFLE_PARTS", (cores * 4).toString).toInt
    val defPar = sys.env.getOrElse("SPARK_GRAFT_DEFAULT_PAR", cores.toString).toInt
    val spark = SparkSession.builder()
      .master(s"local[$cores]")
      .config("spark.sql.shuffle.partitions", parts.toString)
      .config("spark.default.parallelism", defPar.toString)
      // match graft.Bench's shuffle-write tuning (the measured hot path)
      .config("spark.io.compression.lz4.blockSize", "512k")
      .config("spark.shuffle.file.buffer", "1m")
      // experiment knob: ≤ this many partitions uses the bypass writer
      // (one stream PER PARTITION per map task); above it the sort-based
      // writer (ONE stream per map task)
      .config("spark.shuffle.sort.bypassMergeThreshold",
        sys.env.getOrElse("SPARK_GRAFT_BYPASS", "200"))
      .config("spark.sql.adaptive.enabled",
        sys.env.getOrElse("SPARK_GRAFT_AQE", "true"))
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val stages = new java.util.concurrent.ConcurrentHashMap[Int, St]()
    // stage → owning job's action callsite: SQL-exec stages all report
    // the generic withThreadLocalCaptured frame, but the JOB start event
    // carries the action's user callsite, which names the pipeline stage
    val stageJob = new java.util.concurrent.ConcurrentHashMap[Int, String]()
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(js: org.apache.spark.scheduler.SparkListenerJobStart): Unit = {
        val p = Option(js.properties)
        val site = Seq("callSite.short", "spark.job.description")
          .flatMap(k => p.flatMap(x => Option(x.getProperty(k)))).headOption.getOrElse("")
        js.stageInfos.foreach(si => stageJob.put(si.stageId, s"job${js.jobId} $site".trim))
      }
      override def onStageCompleted(sc: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit = {
        val si = sc.stageInfo
        val wall = si.completionTime.getOrElse(0L) - si.submissionTime.getOrElse(0L)
        val m = si.taskMetrics
        // first graft frame in the stage's callsite stack beats the
        // generic lambda name Spark reports for SQL stages
        val graftFrame = si.details.linesIterator
          .find(l => l.contains("graft.") && !l.contains("BenchOne"))
          .map(_.trim.take(80)).getOrElse(si.name.takeWhile(_ != '\n').take(60))
        val job = stageJob.getOrDefault(si.stageId, "")
        stages.put(si.stageId, St(s"[${si.numTasks}t] $job | $graftFrame", wall,
          m.executorRunTime, m.executorCpuTime / 1000000, m.jvmGCTime, m.executorDeserializeTime,
          m.shuffleReadMetrics.fetchWaitTime,
          m.shuffleWriteMetrics.bytesWritten, m.shuffleWriteMetrics.recordsWritten,
          m.shuffleReadMetrics.totalBytesRead, m.shuffleReadMetrics.recordsRead,
          m.memoryBytesSpilled, m.diskBytesSpilled))
      }
    })
    def run(entities: Int): Double = {
      val cfg = PipelineConfig(
        synth = graft.ingest.SynthConfig(entitiesPerKg = entities),
        embed = graft.embed.EmbedderConfig(dim = dim),
        useLsh = Some(true))
      val t0 = System.nanoTime()
      require(Pipeline.runSynthetic(spark, cfg).canonicalTriples.count() > 0)
      (System.nanoTime() - t0) / 1e9
    }
    if (warm == 1) run(math.max(200, e / 10))
    stages.clear()
    val sec = run(e)
    println(f"[benchone] cores=$cores e=$e dim=$dim sec=$sec%.2f docs_per_sec=${2.0 * e / sec}%.1f")
    import scala.jdk.CollectionConverters._
    val top = stages.asScala.toSeq.sortBy(-_._2.run).take(12)
    top.foreach { case (id, s) =>
      println(f"[benchone] stage=$id%-4d wall=${s.wall / 1000.0}%7.1fs taskSum=${s.run / 1000.0}%8.1fs cpu=${s.cpu / 1000.0}%8.1fs gc=${s.gc / 1000.0}%6.1fs deser=${s.deser / 1000.0}%6.1fs fetchW=${s.fetchWait / 1000.0}%6.1fs shufW=${s.shufWB / 1e9}%6.2fGB/${s.shufWRec / 1e6}%5.1fM shufR=${s.shufRB / 1e9}%6.2fGB/${s.shufRRec / 1e6}%5.1fM spill=${s.spillDisk / 1e9}%5.2fGB  ${s.name}")
    }
    val tot = stages.asScala.values
    println(f"[benchone] TOTAL taskSum=${tot.map(_.run).sum / 1000.0}%.1fs cpu=${tot.map(_.cpu).sum / 1000.0}%.1fs gc=${tot.map(_.gc).sum / 1000.0}%.1fs deser=${tot.map(_.deser).sum / 1000.0}%.1fs shufWrite=${tot.map(_.shufWB).sum / 1e9}%.2fGB spillDisk=${tot.map(_.spillDisk).sum / 1e9}%.2fGB stages=${stages.size}")
    spark.stop()
  }
}
