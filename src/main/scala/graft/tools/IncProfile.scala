package graft.tools

import org.apache.spark.sql.SparkSession
import graft.{IncrementalAlign, IncrementalConfig}
import graft.embed.EmbedderConfig
import graft.ingest.{DocSynthesizer, SynthConfig}

/** Continuous-mode evidence: wall cost of merging one delta batch via
  * IncrementalAlign.delta vs re-running the batch bootstrap over the
  * grown corpus — the measurement behind BENCH.md's incremental section.
  * args: [committedE] [deltaE] [dim] [mode]  (defaults 20000 500 256
  * exact; mode=indexed runs the frozen-bucket-index candidate rule,
  * whose phase-B rescore probes the maintained index instead of
  * scanning the corpus; mode=compare runs BOTH modes on the same
  * fixture in one JVM — interleaved, so host-window drift hits both —
  * and reports each mode's scored-pair mass (deterministic) plus the
  * indexed mode's accepted-edge recall vs exact. Geometry knobs:
  * SPARK_GRAFT_IDX_BANDS / _ROWS / _WSCALE). */
object IncProfile {
  def main(args: Array[String]): Unit = {
    val committedE = args.lift(0).map(_.toInt).getOrElse(20000)
    val deltaE = args.lift(1).map(_.toInt).getOrElse(500)
    val dim = args.lift(2).map(_.toInt).getOrElse(256)
    val mode = args.lift(3).getOrElse("exact")
    val useIndex = mode == "indexed"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", sys.env.getOrElse("SPARK_GRAFT_AQE", "true"))
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    if (sys.env.contains("SPARK_GRAFT_JOBLOG")) {
      import org.apache.spark.scheduler._
      val starts = new java.util.concurrent.ConcurrentHashMap[Int, (Long, String)]()
      spark.sparkContext.addSparkListener(new SparkListener {
        override def onJobStart(j: SparkListenerJobStart): Unit =
          starts.put(j.jobId, (System.nanoTime(),
            j.stageInfos.map(_.name.takeWhile(_ != '+').trim).distinct.mkString(" | ")))
        override def onJobEnd(j: SparkListenerJobEnd): Unit = {
          val (t0, site) = starts.getOrDefault(j.jobId, (0L, "?"))
          System.err.println(f"[job ${j.jobId}%4d] ${(System.nanoTime() - t0) / 1e9}%7.2f s  $site")
        }
      })
    }

    val base = IncrementalConfig(embed = EmbedderConfig(dim = dim), diag = true)
    val idxCfg = base.copy(useIndex = true,
      indexBands = sys.env.getOrElse("SPARK_GRAFT_IDX_BANDS", "16").toInt,
      indexRowsPerBand = sys.env.getOrElse("SPARK_GRAFT_IDX_ROWS", "2").toInt,
      indexWScale = sys.env.getOrElse("SPARK_GRAFT_IDX_WSCALE", "1.0").toDouble)
    val e = committedE + deltaE
    val noise = sys.env.getOrElse("SPARK_GRAFT_SURFACE_NOISE", "0.15").toDouble
    val cfg1 = SynthConfig(entitiesPerKg = committedE, surfaceNoise = noise)
    val cfgU = SynthConfig(entitiesPerKg = e, surfaceNoise = noise)
    def idx(docId: String): Long = docId.substring(docId.lastIndexOf('_') + 1).toLong
    def time[T](f: => T): (T, Double) = {
      val t0 = System.nanoTime(); val r = f; (r, (System.nanoTime() - t0) / 1e9)
    }
    val docs2 = DocSynthesizer.docs(spark, cfgU).filter(d => idx(d.doc_id) >= committedE)
    val ents2 = DocSynthesizer.entities(spark, cfgU)
      .filter(en => (en.id % DocSynthesizer.Kg2Base) >= committedE)

    def bootAndDelta(icfg: IncrementalConfig): graft.AlignState = {
      val tag = if (icfg.useIndex)
        s"indexed(${icfg.indexBands}x${icfg.indexRowsPerBand},w=${icfg.indexWScale})"
      else "exact"
      val (s1, tBoot) = time(IncrementalAlign.initial(spark,
        DocSynthesizer.docs(spark, cfg1), DocSynthesizer.entities(spark, cfg1), icfg))
      println(f"[inc] mode=$tag bootstrap committedE=$committedE dim=$dim: " +
        f"$tBoot%.1f s (accepted=${s1.accepted.count()})")
      val (s2, tDelta) = time(IncrementalAlign.delta(spark, s1, docs2, ents2, icfg))
      println(f"[inc] mode=$tag delta deltaE=$deltaE: $tDelta%.1f s " +
        f"(queries=${s2.topk.count()}, accepted=${s2.accepted.count()})")
      s2
    }

    if (mode == "compare") {
      val sIdx = bootAndDelta(idxCfg)
      val sEx = bootAndDelta(base)
      import spark.implicits._
      val ex = sEx.accepted.as[(Long, Long)].collect().toSet
      val ix = sIdx.accepted.as[(Long, Long)].collect().toSet
      val recall = (ex & ix).size.toDouble / math.max(1, ex.size)
      println(f"[inc] indexed accepted-edge recall vs exact: $recall%.4f " +
        f"(exact=${ex.size}, indexed=${ix.size}, common=${(ex & ix).size})")
    } else {
      val icfg = if (useIndex) idxCfg else base
      val s2 = bootAndDelta(icfg)
      // from-scratch twin under the SAME frozen geometry (indexed mode)
      val (sFull, tFull) = time(IncrementalAlign.initial(spark,
        DocSynthesizer.docs(spark, cfg1).unionByName(docs2),
        DocSynthesizer.entities(spark, cfg1).unionByName(ents2),
        icfg, geometry = s2.geometry))
      println(f"[inc] full re-run E=$e: $tFull%.1f s (accepted=${sFull.accepted.count()})")
    }
    spark.stop()
  }
}
