package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Streaming exact deduplication — the continuous-ingest twin of the
  * batch hash-groupBy dedup (TextQueries.qDedupExact): documents
  * arriving as parquet files under a directory are emitted once per
  * distinct text, duplicates dropped as they stream in.
  *
  * Bounded state at 100-TB scale: keying the dedup on the 64-bit text
  * hash (not the text itself) keeps each state row at a fixed ~8 bytes
  * of key, and `dropDuplicatesWithinWatermark` + `withWatermark` lets
  * the state store EVICT keys older than the lateness horizon — an
  * unbounded-corpus stream holds only the horizon's worth of keys, the
  * same O(horizon) state discipline as StreamingEvents' windows. A
  * duplicate arriving inside the horizon of its first occurrence is
  * dropped (the exact-dedup contract for continuous ingest, where
  * near-simultaneous re-crawls are the duplicate mode); one arriving
  * after eviction re-emits — the standard watermark trade-off,
  * re-resolved downstream by the batch dedup over the committed table.
  *
  * Hash-key caveat (declared, same as the batch MinHash family): a
  * 64-bit collision conflates two distinct texts; at the reference's
  * corpus sizes the birthday bound keeps that below ~1e-7 per 10^6
  * docs, and the committed batch pass compares full texts.
  */
object StreamingDedup {

  val docSchema: StructType = StructType(Seq(
    StructField("doc_id", StringType),
    StructField("ts", TimestampType),
    StructField("text", StringType)))

  /** Streaming (doc_id, ts, text) rows with duplicate texts dropped
    * within `horizon` of first occurrence. State is keyed on
    * xxhash64(text) and evicted past the watermark. */
  def dedupDocs(spark: SparkSession, inputDir: String,
                horizon: String = "10 minutes",
                maxFilesPerTrigger: Option[Int] = None): DataFrame = {
    val rd = spark.readStream.schema(docSchema)
    maxFilesPerTrigger.fold(rd)(n => rd.option("maxFilesPerTrigger", n))
      .parquet(inputDir)
      .withColumn("text_hash", xxhash64(col("text")))
      .withWatermark("ts", horizon)
      .dropDuplicatesWithinWatermark("text_hash")
      .select(col("doc_id"), col("ts"), col("text"))
  }

  /** Live handle on the maintained LSH dedup state (safe to read
    * between micro-batches). */
  final class LshHandle private[StreamingDedup] (
      ref: java.util.concurrent.atomic.AtomicReference[graft.dedup.IncrementalDedup.DedupState]) {
    def state: graft.dedup.IncrementalDedup.DedupState = ref.get()
    private[StreamingDedup] def set(s: graft.dedup.IncrementalDedup.DedupState): Unit = ref.set(s)
  }

  /** NEAR-dup streaming composition: a stream of banded signature rows
    * (doc_id, band, key) drives [[graft.dedup.IncrementalDedup.delta]]
    * once per micro-batch — the maintained index + accumulated pair set
    * equal the one-shot batch operator after any batch prefix (the
    * IncrementalDedup fold law, re-gated through the stream in
    * StreamingSpec). Start from [[graft.dedup.IncrementalDedup.emptyState]]:
    * a delta over the empty state IS the bootstrap. The foreachBatch
    * body runs on the driver between micro-batches; the work inside
    * `delta` is distributed exactly as in batch mode.
    *
    * With `stateDir` set, the state commits durably every `commitEvery`
    * batches (StateStore epochs; commit doubles as plan compaction via
    * snapshot reload; `retainEpochs` bounds storage) with the folded
    * batch id riding in the same epoch — resume skips replayed
    * batchIds, exactly-once at commitEvery=1 (see [[StreamProgress]]).
    * Pass `checkpointLocation` HERE, not as a raw option on the
    * returned writer: the writer sets the option itself AND binds the
    * committed position to that lineage — setting the option directly
    * (or overriding this one) records no/the wrong identity and
    * re-opens the silent-skip hole the binding closes. */
  def lshWriter(bands: DataFrame,
                state0: graft.dedup.IncrementalDedup.DedupState,
                cap: Int = 4096,
                stateDir: Option[String] = None,
                commitEvery: Int = 1,
                retainEpochs: Option[Int] = None,
                skipReplayed: Boolean = true,
                checkpointLocation: Option[String] = None)
      : (org.apache.spark.sql.streaming.DataStreamWriter[org.apache.spark.sql.Row], LshHandle) = {
    require(commitEvery >= 1, "commitEvery must be >= 1")
    val handle = new LshHandle(
      new java.util.concurrent.atomic.AtomicReference(state0))
    val sid = checkpointLocation.map(StreamProgress.streamId)
    val resumeAfter =
      if (skipReplayed)
        stateDir.map(StreamProgress.resumePosition(bands.sparkSession, _, sid)).getOrElse(-1L)
      else -1L
    val stage = new BatchStage(stateDir, checkpointLocation)
    var batches = 0L
    val w = bands.writeStream.foreachBatch {
      (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], batchId: Long) =>
        if (batchId > resumeAfter && !batch.isEmpty) {
          val spark = batch.sparkSession
          // pin the micro-batch DISTRIBUTED (staging write + read-back,
          // no driver rows) — delta's actions must replay a stable
          // copy, not the consumed source epoch (StreamingKg discipline)
          val rows = stage.pin(batch, batchId)
          val (next, _) = graft.dedup.IncrementalDedup.delta(spark, handle.state, rows, cap)
          batches += 1
          handle.set(stateDir match {
            case Some(dir) if batches % commitEvery == 0 =>
              graft.tableio.StateStore.save(spark, dir, Seq(
                "bands" -> next.bands, "pairs" -> next.pairs,
                StreamProgress.Component -> StreamProgress.of(spark, batchId, sid)))
              val loaded = graft.dedup.IncrementalDedup.load(spark, dir)
              retainEpochs.foreach(graft.tableio.StateStore.expire(dir, _))
              stage.release()
              loaded
            case _ => next
          })
        }
    }
    (checkpointLocation.fold(w)(loc => w.option("checkpointLocation", loc)), handle)
  }

  /** Live handle on the maintained SimHash dedup state. */
  final class SimhashHandle private[StreamingDedup] (
      ref: java.util.concurrent.atomic.AtomicReference[graft.dedup.IncrementalSimhash.SimhashState]) {
    def state: graft.dedup.IncrementalSimhash.SimhashState = ref.get()
    private[StreamingDedup] def set(s: graft.dedup.IncrementalSimhash.SimhashState): Unit = ref.set(s)
  }

  /** SimHash streaming composition: a stream of signature rows
    * (doc_id, simhash) drives [[graft.dedup.IncrementalSimhash.delta]]
    * once per micro-batch. Same contract as [[lshWriter]] — the
    * maintained banded index + accumulated Hamming-≤2 pair set equal
    * the one-shot batch operator after any batch prefix (pigeonhole
    * banding is lossless across micro-batch boundaries too). Durable
    * commits + exactly-once resume as in [[lshWriter]]. */
  def simhashWriter(sigs: DataFrame,
                    state0: graft.dedup.IncrementalSimhash.SimhashState,
                    cap: Int = 4096,
                    stateDir: Option[String] = None,
                    commitEvery: Int = 1,
                    retainEpochs: Option[Int] = None,
                    skipReplayed: Boolean = true,
                    checkpointLocation: Option[String] = None)
      : (org.apache.spark.sql.streaming.DataStreamWriter[org.apache.spark.sql.Row], SimhashHandle) = {
    require(commitEvery >= 1, "commitEvery must be >= 1")
    val handle = new SimhashHandle(
      new java.util.concurrent.atomic.AtomicReference(state0))
    val sid = checkpointLocation.map(StreamProgress.streamId)
    val resumeAfter =
      if (skipReplayed)
        stateDir.map(StreamProgress.resumePosition(sigs.sparkSession, _, sid)).getOrElse(-1L)
      else -1L
    val stage = new BatchStage(stateDir, checkpointLocation)
    var batches = 0L
    val w = sigs.writeStream.foreachBatch {
      (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], batchId: Long) =>
        if (batchId > resumeAfter && !batch.isEmpty) {
          val spark = batch.sparkSession
          val rows = stage.pin(batch, batchId)
          val (next, _) = graft.dedup.IncrementalSimhash.delta(spark, handle.state, rows, cap)
          batches += 1
          handle.set(stateDir match {
            case Some(dir) if batches % commitEvery == 0 =>
              graft.tableio.StateStore.save(spark, dir, Seq(
                "bands" -> next.bands, "pairs" -> next.pairs,
                StreamProgress.Component -> StreamProgress.of(spark, batchId, sid)))
              val loaded = graft.dedup.IncrementalSimhash.load(spark, dir)
              retainEpochs.foreach(graft.tableio.StateStore.expire(dir, _))
              stage.release()
              loaded
            case _ => next
          })
        }
    }
    (checkpointLocation.fold(w)(loc => w.option("checkpointLocation", loc)), handle)
  }

  /** CDC composition for the LSH dedup index: one stream carries adds
    * AND retraction tombstones — rows (op, doc_id, band, key) where
    * op="add" rows are banded index rows and op="retract" rows carry
    * only the doc_id (band/key ignored). Per micro-batch, retractions
    * apply FIRST then additions run as one delta (the StreamingKg
    * writerCdc discipline: a batch may retract and re-add a doc), so a
    * takedown arriving mid-stream drops the doc's index rows and every
    * accumulated pair touching it at delta-sized cost. Tombstones for
    * never-committed docs are no-ops. Durable commits + exactly-once
    * resume as in [[lshWriter]]. */
  def lshWriterCdc(events: DataFrame,
                   state0: graft.dedup.IncrementalDedup.DedupState,
                   cap: Int = 4096,
                   stateDir: Option[String] = None,
                   commitEvery: Int = 1,
                   retainEpochs: Option[Int] = None,
                   skipReplayed: Boolean = true,
                   checkpointLocation: Option[String] = None)
      : (org.apache.spark.sql.streaming.DataStreamWriter[org.apache.spark.sql.Row], LshHandle) = {
    require(commitEvery >= 1, "commitEvery must be >= 1")
    val handle = new LshHandle(
      new java.util.concurrent.atomic.AtomicReference(state0))
    val sid = checkpointLocation.map(StreamProgress.streamId)
    val resumeAfter =
      if (skipReplayed)
        stateDir.map(StreamProgress.resumePosition(events.sparkSession, _, sid)).getOrElse(-1L)
      else -1L
    val stage = new BatchStage(stateDir, checkpointLocation)
    var batches = 0L
    val w = events.writeStream.foreachBatch {
      (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], batchId: Long) =>
        if (batchId > resumeAfter && !batch.isEmpty) {
          val spark = batch.sparkSession
          val evs = stage.pin(batch, batchId)
          // tombstone ids are the one driver-side set (the retract
          // API's own delta-sized contract); add rows stay distributed
          val tombstones = evs.filter(col("op") === "retract")
            .select(col("doc_id")).collect().map(_.getLong(0)).toSet
          val adds = evs.filter(col("op") === "add")
            .select(col("doc_id"), col("band"), col("key"))
          var st = handle.state
          if (tombstones.nonEmpty)
            st = graft.dedup.IncrementalDedup.retract(spark, st, tombstones)
          if (!adds.isEmpty)
            st = graft.dedup.IncrementalDedup.delta(spark, st, adds, cap)._1
          batches += 1
          handle.set(stateDir match {
            case Some(dir) if batches % commitEvery == 0 =>
              graft.tableio.StateStore.save(spark, dir, Seq(
                "bands" -> st.bands, "pairs" -> st.pairs,
                StreamProgress.Component -> StreamProgress.of(spark, batchId, sid)))
              val loaded = graft.dedup.IncrementalDedup.load(spark, dir)
              retainEpochs.foreach(graft.tableio.StateStore.expire(dir, _))
              stage.release()
              loaded
            case _ => st
          })
        }
    }
    (checkpointLocation.fold(w)(loc => w.option("checkpointLocation", loc)), handle)
  }

  /** Batch twin over the same files — one row per distinct text (the
    * first by event time, doc_id tie-break), for parity tests and for
    * re-resolving post-eviction re-emits over the committed table. */
  def dedupDocsBatch(docs: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("text_hash"))
      .orderBy(col("ts").asc, col("doc_id").asc)
    docs.withColumn("text_hash", xxhash64(col("text")))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("doc_id"), col("ts"), col("text"))
  }
}
