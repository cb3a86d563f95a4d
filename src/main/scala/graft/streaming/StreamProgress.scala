package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.tableio.{StateStore, TableIO}

/** Stream-position bookkeeping for durable foreachBatch writers: the
  * last folded micro-batch id commits as a `progress` component INSIDE
  * the same state epoch (one atomic marker covers data + position), and
  * writers skip every replayed batchId ≤ the committed position. This
  * is what makes durable resume EXACTLY-ONCE at commitEvery=1: Spark
  * commits its own offset log only after foreachBatch returns, so a
  * crash between our epoch commit and the engine's offset write
  * replays a batch we already folded — the id check drops it instead
  * of double-folding. (With commitEvery>1 durability is best-effort
  * every N batches: a crash loses at most N−1 folded-but-uncommitted
  * batches, which the engine's offset log will NOT replay — callers
  * wanting exactly-once resume use commitEvery=1.)
  *
  * CONTRACT: batch ids are only comparable within one engine
  * checkpoint lineage. A restart against the same stateDir MUST reuse
  * the stream's original checkpointLocation — a fresh checkpoint
  * renumbers genuinely new batches from 0 and the skip would silently
  * drop them. When intentionally re-pointing a committed state at a
  * NEW stream (fresh checkpoint, new data), pass the writers'
  * `skipReplayed = false` to disable the id check for that run. */
object StreamProgress {

  val Component = "progress"

  /** 1-row frame recording the just-folded batch id. */
  def of(spark: SparkSession, batchId: Long): DataFrame = {
    import spark.implicits._
    Seq(batchId).toDF("batch_id")
  }

  /** Last batch id recorded in `dir`'s newest state epoch; -1 when the
    * dir has no epoch or the epoch predates progress tracking. */
  def last(spark: SparkSession, dir: String): Long =
    StateStore.epochs(dir).lastOption
      .flatMap(k => StateStore.readEpoch(dir, k).get(Component))
      .map(id => TableIO.readAt(spark, s"$dir/$Component", id)
        .select("batch_id").collect().head.getLong(0))
      .getOrElse(-1L)
}
