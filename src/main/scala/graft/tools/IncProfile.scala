package graft.tools

import org.apache.spark.sql.SparkSession
import graft.{IncrementalAlign, IncrementalConfig}
import graft.embed.EmbedderConfig
import graft.ingest.{DocSynthesizer, SynthConfig}

/** Continuous-mode evidence: wall cost of merging one delta batch via
  * IncrementalAlign.delta vs re-running the batch bootstrap over the
  * grown corpus — the measurement behind BENCH.md's incremental section.
  * args: [committedE] [deltaE] [dim]  (defaults 20000 500 256) */
object IncProfile {
  def main(args: Array[String]): Unit = {
    val committedE = args.lift(0).map(_.toInt).getOrElse(20000)
    val deltaE = args.lift(1).map(_.toInt).getOrElse(500)
    val dim = args.lift(2).map(_.toInt).getOrElse(256)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val icfg = IncrementalConfig(embed = EmbedderConfig(dim = dim), diag = true)
    val e = committedE + deltaE
    val cfg1 = SynthConfig(entitiesPerKg = committedE)
    val cfgU = SynthConfig(entitiesPerKg = e)
    def idx(docId: String): Long = docId.substring(docId.lastIndexOf('_') + 1).toLong
    def time[T](f: => T): (T, Double) = {
      val t0 = System.nanoTime(); val r = f; (r, (System.nanoTime() - t0) / 1e9)
    }

    val (s1, tBoot) = time(IncrementalAlign.initial(spark,
      DocSynthesizer.docs(spark, cfg1), DocSynthesizer.entities(spark, cfg1), icfg))
    println(f"[inc] bootstrap committedE=$committedE dim=$dim: $tBoot%.1f s " +
      f"(accepted=${s1.accepted.count()})")

    val docs2 = DocSynthesizer.docs(spark, cfgU).filter(d => idx(d.doc_id) >= committedE)
    val ents2 = DocSynthesizer.entities(spark, cfgU)
      .filter(en => (en.id % DocSynthesizer.Kg2Base) >= committedE)
    val (s2, tDelta) = time(IncrementalAlign.delta(spark, s1, docs2, ents2, icfg))
    println(f"[inc] delta deltaE=$deltaE: $tDelta%.1f s " +
      f"(queries=${s2.topk.count()}, accepted=${s2.accepted.count()})")

    val (sFull, tFull) = time(IncrementalAlign.initial(spark,
      DocSynthesizer.docs(spark, cfg1).unionByName(docs2),
      DocSynthesizer.entities(spark, cfg1).unionByName(ents2), icfg))
    println(f"[inc] full re-run E=$e: $tFull%.1f s (accepted=${sFull.accepted.count()})")
    println(f"[inc] delta/full = ${tDelta / tFull}%.3f (speedup ${tFull / tDelta}%.1f x)")
    spark.stop()
  }
}
