package graft.align

import org.apache.spark.sql.{Dataset, SparkSession}
import graft.kg._
import graft.embed.Embedder

/** SelfKG-style self-supervised training + RSM scoring.
  *
  * Reference machinery reproduced (SURVEY.md §2.9):
  *  - T1 MoCo negative queue: FIFO of the last `queueLen` batches per KG;
  *    negatives never mix KGs (model/layers_LaBSE_neighbor.py:392-420).
  *    Implemented as a PARTITION-LOCAL batched negative cache inside
  *    mapPartitions (north star): rows are processed in deterministic
  *    content-derived batch order, each partition maintains its own queue.
  *  - T2 momentum (key) encoder: EMA-updated copy producing positives and
  *    negatives (:104-108, m = 0.9999).
  *  - F4/F9 NCE: softmax cross-entropy at label 0 with temperature 0.08.
  *
  * Training target: with no pretrained weights in the sandbox the only
  * free parameter is the combine mixing weight `alpha` (GatKernel). Each
  * partition line-searches alpha on its own queue-based NCE loss; the
  * driver averages partition results weighted by row count — one Spark
  * job per epoch, no shuffle inside an epoch (SURVEY.md §3.1 trace).
  *
  * RSM (relative similarity metric): the paper's RSM manifests as
  * ranking by cosine of one shared encoder's L2-normalized outputs with
  * self-negatives (SURVEY.md §2.9 note). `rsmScore` additionally
  * calibrates each source's cosine against the negative-cache
  * distribution (z-score) so canonicalization gets an absolute threshold;
  * per-source ranking is unchanged (monotone in cosine).
  */
final case class MoCoConfig(
    batchSize: Int = 64,           // model/layers_LaBSE_neighbor.py:36
    queueLen: Int = 64,            // :37
    temperature: Double = 0.08,    // :46
    momentum: Double = 0.9999,     // :47
    epochs: Int = 3,
    alphaGrid: Seq[Float] = Seq(0.0f, 0.1f, 0.2f, 0.3f, 0.5f, 0.8f),
    /** refinement step around the current alpha after epoch 0; HALVED
      * every 10 epochs — the analog of the reference's LR schedule (F8,
      * model/layers_LaBSE_neighbor.py:53-57: lr halves every 10 epochs;
      * alpha is this trainer's only free parameter). */
    alphaStep: Float = 0.1f)

object MoCoTrainer {

  /** NCE loss of one positive pair against a negative block.
    * logits = [q·k+, q·n1, ...]/t; CE at label 0 (:60-72,102). */
  def nceLoss(q: Array[Float], kPos: Array[Float], negs: Iterable[Array[Float]], t: Double): Double = {
    val pos = Embedder.dot(q, kPos) / t
    var maxL = pos
    val negL = negs.map { n => val l = Embedder.dot(q, n) / t; if (l > maxL) maxL = l; l }
    var z = math.exp(pos - maxL)
    negL.foreach(l => z += math.exp(l - maxL))
    -(pos - maxL - math.log(z))
  }

  /** One training epoch: partition-local alpha line search under the MoCo
    * queue discipline. Returns (bestAlpha, loss) averaged over partitions.
    * Blocks are batched in content-derived order (id hash) so the result
    * is independent of partitioning — N vs 4N determinism (SURVEY §7.5). */
  def epoch(spark: SparkSession, blocks: Dataset[NeighborBlock], w: GatWeights, cfg: MoCoConfig,
            grid: Seq[Float] = Nil): (Float, Double) = {
    import spark.implicits._
    val alphas = if (grid.nonEmpty) grid else cfg.alphaGrid
    val results = blocks
      .map(b => (graft.util.DetHash.h1(Dims.Seed, b.id), b))(org.apache.spark.sql.Encoders.tuple(
        org.apache.spark.sql.Encoders.scalaLong, org.apache.spark.sql.Encoders.product[NeighborBlock]))
      .repartition(org.apache.spark.sql.functions.col("_1"))
      .mapPartitions { it =>
        val rows = it.toArray.sortBy(_._1).map(_._2) // deterministic batch order
        if (rows.isEmpty) Iterator.empty
        else {
          val out = alphas.map { a =>
            val wq = w.withAlpha(a)            // query encoder
            var wk = wq                        // momentum key encoder (T2)
            var loss = 0.0; var nPairs = 0L
            // per-KG FIFO negative queues (T1) — negatives never mix KGs
            val queues = Map(1 -> new scala.collection.mutable.ArrayDeque[Array[Array[Float]]](),
                             2 -> new scala.collection.mutable.ArrayDeque[Array[Array[Float]]]())
            rows.grouped(cfg.batchSize).foreach { batch =>
              val byKg = batch.groupBy(_.kg)
              byKg.foreach { case (kg, bs) =>
                val q = queues.getOrElse(kg, queues(1))
                val kEmbs = bs.map(b => GatKernel.forward(wk, b)) // key encoder, no grad
                if (q.size >= cfg.queueLen) {
                  // oldest batch = positives, rest of queue = negatives (:392-420)
                  val posBatch = q.removeHead()
                  val negs = q.iterator.flatten.toArray
                  // positive pair: same row encoded by q-enc vs k-enc
                  bs.zipWithIndex.take(posBatch.length).foreach { case (b, i) =>
                    val qEmb = GatKernel.forward(wq, b)
                    loss += nceLoss(qEmb, kEmbs(i), negs, cfg.temperature)
                    nPairs += 1
                  }
                }
                q.append(kEmbs.toArray)
              }
              // EMA update of the key encoder after every step (:497)
              val m = cfg.momentum.toFloat
              wk = wk.withAlpha(m * wk.alpha + (1 - m) * wq.alpha)
            }
            (a, if (nPairs == 0) Double.MaxValue else loss / nPairs, rows.length.toLong)
          }
          Iterator.single(out)
        }
      }
      .collect()
    if (results.isEmpty) (w.alpha, 0.0)
    else {
      // weighted-average per-alpha loss across partitions, pick argmin
      val byAlpha = results.flatten.groupBy(_._1).map { case (a, xs) =>
        val wsum = xs.map(_._3).sum.toDouble
        (a, xs.map(x => x._2 * x._3).sum / math.max(1.0, wsum))
      }
      byAlpha.minBy(_._2)
    }
  }

  /** Training loop. Epoch 0 searches the coarse alphaGrid; later epochs
    * refine around the current alpha with a step that HALVES every 10
    * epochs — the analog of the reference LR schedule (F8,
    * model/layers_LaBSE_neighbor.py:53-57), alpha being the only free
    * parameter of this stand-in trainer.
    *
    * `eval` (optional) is the eval-every-epoch discipline (DWY:
    * layers_DWY_LaBSE_neighbor.py:442): called after each epoch, and the
    * best-scoring weights are returned (A5 best-metric tracking) instead
    * of the last-epoch weights. */
  def train(spark: SparkSession, blocks: Dataset[NeighborBlock], dim: Int,
            cfg: MoCoConfig = MoCoConfig(),
            eval: Option[GatWeights => Double] = None): GatWeights = {
    var w = GatKernel.initWeights(dim)
    var best = w
    var bestScore = Double.NegativeInfinity
    var e = 0
    while (e < cfg.epochs) {
      val grid =
        if (e == 0) cfg.alphaGrid
        else {
          val step = (cfg.alphaStep * math.pow(0.5, e / 10)).toFloat
          (-2 to 2).map(i => math.min(1f, math.max(0f, w.alpha + i * step))).distinct
        }
      val (a, _) = epoch(spark, blocks, w, cfg, grid)
      w = w.withAlpha(a)
      eval.foreach { f =>
        val s = f(w)
        if (s > bestScore) { bestScore = s; best = w }
      }
      e += 1
    }
    if (eval.isDefined) best else w
  }

  /** Encode blocks with trained weights → alignment embeddings. */
  def encode(spark: SparkSession, blocks: Dataset[NeighborBlock], w: GatWeights): Dataset[Emb] = {
    import spark.implicits._
    val bc = spark.sparkContext.broadcast(w)
    blocks.mapPartitions { it =>
      val wv = bc.value
      it.map(b => Emb(b.id, GatKernel.forward(wv, b)))
    }
  }

  /** RSM calibration: mean/std of cosine against a deterministic sample of
    * same-KG negatives (the negative-cache distribution), per source.
    * score = (cos - mu) / sigma. Per-source ranking unchanged. */
  def rsmScore(cos: Double, mu: Double, sigma: Double): Double =
    if (sigma <= 1e-9) cos else (cos - mu) / sigma
}
