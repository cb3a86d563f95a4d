package graft.streaming

import java.util.concurrent.atomic.AtomicReference
import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.streaming.DataStreamWriter
import graft.{AlignState, IncrementalAlign, IncrementalConfig}
import graft.kg.{Doc, Entity}

/** Continuous KG construction as a STRUCTURED STREAM: a stream of
  * interleaved documents drives [[IncrementalAlign.delta]] once per
  * micro-batch via foreachBatch, maintaining the committed alignment
  * state EXACTLY — after any prefix of batches the state is bit-equal
  * to a from-scratch batch run over everything ingested so far (the
  * IncrementalAlign contract, re-gated through the stream in
  * StreamingSpec).
  *
  * `entsFor` supplies the dictionary entries arriving with a batch (the
  * ingest contract: a document's mentions resolve against entities known
  * by the end of its own batch — new names apply prospectively).
  *
  * Durability: with `stateDir` set, the state commits through
  * [[IncrementalAlign.save]] (TableIO snapshot tables) every
  * `commitEvery` batches — a crashed stream resumes from the last
  * committed snapshot via [[IncrementalAlign.load]] plus the source's
  * own checkpointed offsets, the same at-least-once + idempotent-commit
  * discipline as the batch pipeline's TableIO stages. Because a delta
  * is exact, replaying an already-applied batch against a RESUMED
  * snapshot cannot corrupt it: re-running `delta` with already-known
  * entities would violate id uniqueness, so resume logic must skip
  * batches committed at or before the snapshot (offsets handle this).
  *
  * The foreachBatch body runs on the DRIVER between micro-batches (the
  * standard mutable-state-at-the-driver pattern); the heavy work inside
  * `delta` is distributed exactly as in batch mode. */
object StreamingKg {

  /** Live handle on the maintained state (safe to read between batches). */
  final class Handle private[StreamingKg] (ref: AtomicReference[AlignState]) {
    def state: AlignState = ref.get()
    private[StreamingKg] def set(s: AlignState): Unit = ref.set(s)
  }

  /** Wire a doc stream to the state: returns the foreachBatch writer
    * (caller starts it, possibly adding trigger/checkpoint options) and
    * the live state handle. */
  def writer(docs: Dataset[Doc],
             entsFor: Dataset[Doc] => Dataset[Entity],
             state0: AlignState,
             cfg: IncrementalConfig,
             stateDir: Option[String] = None,
             commitEvery: Int = 1): (DataStreamWriter[Doc], Handle) = {
    val handle = new Handle(new AtomicReference[AlignState](state0))
    var batches = 0L
    val w = docs.writeStream.foreachBatch { (batch: Dataset[Doc], _: Long) =>
      if (!batch.isEmpty) {
        val spark: SparkSession = batch.sparkSession
        // the micro-batch Dataset is only valid inside this call — pin
        // its rows so delta's many actions replay a local copy, not the
        // consumed source epoch
        val docsNow = spark.createDataset(batch.collect().toSeq)(batch.encoder)
        val next = IncrementalAlign.delta(spark, handle.state, docsNow,
          entsFor(docsNow), cfg)
        handle.set(next)
        batches += 1
        if (stateDir.isDefined && batches % commitEvery == 0)
          IncrementalAlign.save(spark, next, stateDir.get)
      }
    }
    (w, handle)
  }
}
