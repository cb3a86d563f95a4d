package graft.candidates

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import graft.kg._
import graft.embed.Embedder

/** Top-k similarity join — the flagship operator (SURVEY.md §2.3 J4).
  *
  * The reference uses an exact FAISS IndexFlatL2 over all KG2 vectors
  * (model/layers_LaBSE_neighbor.py:313-315). Vectors are L2-normalized,
  * so L2 rank ≡ cosine rank (SURVEY.md §7.5 item 6); we rank by cosine.
  *
  * Two physical paths:
  *  - [[ExactTopK]]: broadcast corpus + per-partition heap. The parity
  *    oracle, and the right plan whenever the corpus fits an executor
  *    (≲10^6 × dim floats). No shuffle at all on the query side.
  *  - [[LshTopK]]: BucketedRandomProjectionLSH blocking + SALTED
  *    within-bucket cosine top-k — the 10^12-scale path (north rule:
  *    skew handled explicitly). Hot buckets are split into
  *    ceil(size/cap) salts: queries hash into one salt, corpus rows
  *    replicate into all salts — identical candidates, bounded partition
  *    size.
  */
object ExactTopK {

  /** For each query vector, the top-k corpus vectors by cosine, plus the
    * RSM calibration moments (mean/std of cosine over a deterministic
    * 1/16 corpus sample — the negative-distribution estimate). */
  def topK(spark: SparkSession, queries: Dataset[Emb], corpus: Dataset[Emb], k: Int): Dataset[Candidate] = {
    import spark.implicits._
    val corpusArr = corpus.collect()
    val bc = spark.sparkContext.broadcast(corpusArr)
    queries.mapPartitions { it =>
      val cs = bc.value
      it.flatMap { q =>
        // bounded min-heap of size k on score
        val heap = new scala.collection.mutable.PriorityQueue[(Double, Long)]()(Ordering.by(x => (-x._1, -x._2)))
        var mu = 0.0; var m2 = 0.0; var nSamp = 0L
        var i = 0
        while (i < cs.length) {
          val s = Embedder.dot(q.emb, cs(i).emb)
          if (heap.size < k) heap.enqueue((s, cs(i).id))
          else if (s > heap.head._1 || (s == heap.head._1 && cs(i).id < heap.head._2)) {
            heap.dequeue(); heap.enqueue((s, cs(i).id))
          }
          if ((i & 15) == 0) { // deterministic negative sample for RSM
            nSamp += 1; val d = s - mu; mu += d / nSamp; m2 += d * (s - mu)
          }
          i += 1
        }
        val sigma = if (nSamp > 1) math.sqrt(m2 / (nSamp - 1)) else 1.0
        val ranked: Seq[(Double, Long)] = heap.dequeueAll.reverse.toSeq
        ranked.zipWithIndex.map { case ((s, id), r) =>
          Candidate(q.id, id, graft.align.MoCoTrainer.rsmScore(s, mu, sigma), r + 1)
        }
      }
    }
  }
}

object LshTopK {
  import org.apache.spark.ml.feature.BucketedRandomProjectionLSH
  import org.apache.spark.ml.linalg.{Vectors, Vector => MlVector}

  final case class LshConfig(
      numHashTables: Int = 4,
      bucketLength: Double = 0.5,
      /** max rows of one (table,bucket) key before salting kicks in */
      bucketCap: Int = 2000,
      seed: Long = Dims.Seed)

  private def toMl(spark: SparkSession, ds: Dataset[Emb], idCol: String): DataFrame = {
    import spark.implicits._
    val toVec = udf((a: Seq[Float]) => Vectors.dense(a.map(_.toDouble).toArray))
    ds.toDF("id", "emb").select(col("id").as(idCol), toVec(col("emb")).as("features"), col("emb").as(s"${idCol}_emb"))
  }

  /** Blocked candidate pairs with explicit skew handling, then exact
    * cosine scoring and per-source top-k (heap per group, no full sort). */
  def topK(spark: SparkSession, queries: Dataset[Emb], corpus: Dataset[Emb], k: Int,
           cfg: LshConfig = LshConfig()): Dataset[Candidate] = {
    import spark.implicits._
    val q = toMl(spark, queries, "srcId")
    val c = toMl(spark, corpus, "dstId")
    val lsh = new BucketedRandomProjectionLSH()
      .setBucketLength(cfg.bucketLength).setNumHashTables(cfg.numHashTables)
      .setSeed(cfg.seed.toInt).setInputCol("features").setOutputCol("hashes")
    val model = lsh.fit(c)

    val bucketOf = udf((v: MlVector) => v(0).toLong)
    def bucketed(df: DataFrame, idCol: String): DataFrame =
      model.transform(df)
        .select(col(idCol), col(s"${idCol}_emb"), posexplode(col("hashes")).as(Seq("table", "h")))
        .select(col(idCol), col(s"${idCol}_emb"), col("table"), bucketOf(col("h")).as("bucket"))

    val qb = bucketed(q, "srcId")
    val cb = bucketed(c, "dstId")

    // --- explicit skew handling: salt hot (table,bucket) keys ---
    val sizes = cb.groupBy("table", "bucket").count()
      .withColumn("salts", greatest(lit(1), ceil(col("count") / cfg.bucketCap)).cast("int"))
      .select("table", "bucket", "salts")
    val qbS = qb.join(broadcast(sizes), Seq("table", "bucket"), "left")
      .withColumn("salts", coalesce(col("salts"), lit(1)))
      .withColumn("salt", pmod(hash(col("srcId")), col("salts")))
    val cbS = cb.join(broadcast(sizes), Seq("table", "bucket"), "left")
      .withColumn("salts", coalesce(col("salts"), lit(1)))
      .withColumn("salt", explode(sequence(lit(0), col("salts") - 1)))

    val pairs = qbS.join(cbS, Seq("table", "bucket", "salt"))
      .select(col("srcId"), col("srcId_emb"), col("dstId"), col("dstId_emb"))
      .distinct() // a pair can collide in several hash tables

    // per-source top-k via bounded heap (flatMapGroups — no full sort)
    pairs.as[(Long, Array[Float], Long, Array[Float])]
      .groupByKey(_._1)
      .flatMapGroups { (src, it) =>
        val heap = new scala.collection.mutable.PriorityQueue[(Double, Long)]()(Ordering.by(x => (-x._1, -x._2)))
        it.foreach { case (_, qe, dst, de) =>
          val s = Embedder.dot(qe, de)
          if (heap.size < k) heap.enqueue((s, dst))
          else if (s > heap.head._1) { heap.dequeue(); heap.enqueue((s, dst)) }
        }
        val ranked: Seq[(Double, Long)] = heap.dequeueAll.reverse.toSeq
        ranked.zipWithIndex.map { case ((s, id), r) => Candidate(src, id, s, r + 1) }
      }
  }
}
