package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.kg._
import graft.candidates.LshTopK

/** Bucket/cell work-distribution + timing diagnostics for LshTopK. */
object LshProfile {
  def main(args: Array[String]): Unit = {
    val cores = if (args.nonEmpty) args(0).toInt else 8
    val e = if (args.length > 1) args(1).toInt else 20000
    val dim = if (args.length > 2) args(2).toInt else 256
    val spark = SparkSession.builder().master(s"local[$cores]")
      .config("spark.sql.shuffle.partitions", (cores * 8).toString)
      .config("spark.sql.adaptive.advisoryPartitionSizeInBytes", "8m")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    val synth = graft.ingest.SynthConfig(entitiesPerKg = e)
    val ents = graft.ingest.DocSynthesizer.entities(spark, synth)
    val cfgE = graft.embed.EmbedderConfig(dim = dim)
    val embs = graft.embed.Embedder.embedEntities(spark, ents, cfgE).cache()
    embs.count()
    val q = embs.filter(_.id < 1000000L).cache(); q.count()
    val c = embs.filter(_.id >= 1000000L).cache(); c.count()

    def time[T](name: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"[lsh] $name%-20s ${(System.nanoTime() - t0) / 1e9}%8.2f s"); r
    }

    // replicate LshTopK's hashing exactly to measure cell work
    val cfg = LshTopK.LshConfig()
    val projs = spark.sparkContext.broadcast(LshTopK.projections(cfg, dim))
    val all = c.collect()
    val (mean, w) = {
      val m = new Array[Float](dim)
      all.foreach(e => (0 until dim).foreach(i => m(i) += e.emb(i) / all.length))
      val meanSq = all.map(e => e.emb.map(x => x.toDouble * x).sum).sum / all.length
      val residVar = math.max(1e-12, meanSq - m.map(x => x.toDouble * x).sum)
      (spark.sparkContext.broadcast(m), cfg.wScale * math.sqrt(residVar / dim))
    }
    println(f"[lsh] auto_w=$w%.5f")
    def keysOf(ds: org.apache.spark.sql.Dataset[Emb]) = ds.mapPartitions { it =>
      val ps = projs.value; val mn = mean.value
      it.flatMap { emb =>
        val cent = Array.tabulate(dim)(i => emb.emb(i) - mn(i))
        val ks = LshTopK.bandKeysOf(cent, ps, w, cfg.bands, cfg.rowsPerBand)
        Iterator.tabulate(cfg.bands)(j => (j, ks(j)))
      }
    }.toDF("band", "key")
    val qk = keysOf(q).groupBy("band", "key").count().withColumnRenamed("count", "qn")
    val ck = keysOf(c).groupBy("band", "key").count().withColumnRenamed("count", "cn")
    val cells = qk.join(ck, Seq("band", "key"))
    val stats = cells.agg(
      count(lit(1)).as("n_buckets"),
      sum(col("qn") * col("cn")).as("pair_work"),
      max(col("cn")).as("max_c"), max(col("qn")).as("max_q")).head()
    println(s"[lsh] buckets=${stats.getLong(0)} pair_work=${stats.getLong(1)} max_c=${stats.getLong(2)} max_q=${stats.getLong(3)}")

    val taskTimes = new java.util.concurrent.ConcurrentLinkedQueue[(Int, Long)]()
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onTaskEnd(te: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit =
        taskTimes.add((te.stageId, te.taskInfo.duration))
    })
    val cands = time("topk total")(LshTopK.topK(spark, q, c, 10))
    time("count")(cands.count())
    import scala.jdk.CollectionConverters._
    taskTimes.asScala.toSeq.groupBy(_._1).toSeq.sortBy(-_._2.map(_._2).sum).take(4).foreach { case (st, ts) =>
      val d = ts.map(_._2)
      println(s"[lsh] stage=$st tasks=${d.length} sum=${d.sum}ms max=${d.max}ms")
    }
    spark.stop()
  }
}
