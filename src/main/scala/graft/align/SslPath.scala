package graft.align

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.functions.{broadcast, col}
import graft.kg._

/** SSL ablation path — the reference's neighbor-free variant
  * (model/layers_LaBSE_SSL.py; DWY twin layers_LaBSE_SSL_DWY.py): the
  * encoder is fine-tuned online with self-negatives only, no GAT and no
  * neighbor aggregation (encoder :88-106, manual string batching
  * :347-365, queue/EMA/NCE machinery :397-452).
  *
  * Spark-native translation under this sandbox's frozen base embedder
  * (SURVEY.md §3.4): the trainable surface is a linear adapter
  * Linear(dim → dim) applied to the raw pooled entity embedding,
  * trained with the SAME partition-local MoCo queue discipline, EMA key
  * encoder, NCE-at-label-0 loss and halving LR schedule as the neighbor
  * path. Implementation is pure reuse: each entity becomes a SINGLETON
  * NeighborBlock (validLen = 1), for which the attention stage
  * deterministically yields (center = emb, agg = 0) — so
  * MoCoTrainer.trainCombine's Linear(2·dim → dim) receives x = [emb ∥ 0]
  * and its LEFT half is exactly the adapter while its right half gets
  * zero gradient (dL/dW = gu ⊗ x) and stays at its α·I init
  * (SslSpec pins this invariant bit-for-bit). No new kernel code means
  * the SSL path inherits every determinism/parallelism guarantee the
  * neighbor path is gated on.
  *
  * At scale this path is CHEAPER than the flagship: it skips both
  * neighbor-aggregation shuffles entirely — blocks are a narrow
  * broadcast-join over the embedding scan.
  */
object SslPath {

  /** Singleton blocks: one per embedded entity, kg attached via a
    * dictionary join — forced broadcast only while the dict is proved
    * bounded (`boundedDims`); at billions of entities the hint drops
    * and Catalyst/AQE shuffle-joins instead. */
  def singletonBlocks(spark: SparkSession, embs: Dataset[Emb],
                      ents: Dataset[Entity],
                      boundedDims: Boolean = true): Dataset[NeighborBlock] = {
    import spark.implicits._
    embs.toDF()
      .join(graft.util.BoundedProbe.dimHint(
        ents.toDF().select(col("id"), col("kg")), boundedDims), "id")
      .select(col("id"), col("kg"), col("emb"))
      .as[(Long, Int, Array[Float])]
      .map { case (id, kg, emb) => NeighborBlock(id, kg, emb, validLen = 1) }
  }

  /** Train the adapter (no-op pass-through when `moco.epochs` = 0 or the
    * caller skips training): forces the full-combine form — the light
    * scalar-alpha path is a no-op on singleton blocks (forward =
    * l2n(emb + α·0) = emb for unit inputs). */
  def train(spark: SparkSession, blocks: Dataset[NeighborBlock], dim: Int,
            cfg: MoCoConfig, eval: Option[GatWeights => Double] = None): GatWeights =
    MoCoTrainer.train(spark, blocks, dim, cfg.copy(trainCombine = true), eval)
}
