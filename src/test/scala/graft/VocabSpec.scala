package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.text.IncrementalVocab

/** Algebraic gates for the continuous vocabulary maintainer: the fold
  * must lose nothing vs the single-batch operator, retraction must
  * invert it, and the result must not depend on how the input was
  * partitioned or split into batches. */
class VocabSpec extends SparkTestBase {

  private val dir = "/root/testdata/sf0.001"

  private def docs(): DataFrame =
    spark.read.parquet(s"$dir/documents.parquet").select(col("doc_id"), col("text"))

  private def rows(df: DataFrame): Set[(String, Long, Long)] =
    df.select("tok", "df", "tf").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet

  test("IncrementalVocab: folding any batch split equals the batch table") {
    val d = docs()
    val whole = rows(IncrementalVocab.ofBatch(d))
    for (nb <- Seq(2, 3, 5)) {
      val batches = (0 until nb).map(i => d.filter(col("doc_id") % nb === i))
      val st = batches.tail.foldLeft(IncrementalVocab.initial(batches.head))(
        IncrementalVocab.delta)
      assert(rows(st.counts) == whole, s"fold over $nb batches diverged")
    }
    // folding onto the empty state is the bootstrap
    val viaEmpty = IncrementalVocab.delta(IncrementalVocab.emptyState(spark), d)
    assert(rows(viaEmpty.counts) == whole)
  }

  test("IncrementalVocab: retract inverts delta, down to the empty state") {
    val d = docs()
    val b1 = d.filter(col("doc_id") % 2 === 0)
    val b2 = d.filter(col("doc_id") % 2 === 1)
    val s1 = IncrementalVocab.initial(b1)
    val s2 = IncrementalVocab.delta(s1, b2)
    assert(rows(IncrementalVocab.retract(s2, b2).counts) == rows(s1.counts))
    // retracting everything leaves no rows (df==0 tokens drop out)
    assert(IncrementalVocab.retract(s1, b1).counts.count() == 0)
  }

  test("IncrementalVocab: a tombstone that never matched an addition raises, not silently skews (ADVICE r3)") {
    import spark.implicits._
    val d = Seq((1L, "alpha beta"), (2L, "beta gamma")).toDF("doc_id", "text")
    val st = IncrementalVocab.initial(d)
    // tombstone for a doc that was never added: "alpha" cancels against
    // the live corpus (undetectable over-subtraction on shared tokens is
    // the documented residual), but the never-added token must drive a
    // NEGATIVE count and fail LOUDLY at the next action — round ≤3's
    // `df > 0` filter silently dropped it
    val bad = Seq((99L, "alpha zzz_never_added")).toDF("doc_id", "text")
    val e = intercept[Throwable] {
      IncrementalVocab.retract(st, bad).counts.collect()
    }
    def msgs(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x => x.toString +: msgs(x.getCause))
    assert(msgs(e).exists(_.contains("zzz_never_added")), msgs(e).mkString(" | "))
    // a MATCHING tombstone still inverts cleanly through the guard
    val good = IncrementalVocab.retract(IncrementalVocab.delta(st, bad), bad)
    assert(rows(good.counts) == rows(st.counts))
  }

  test("IncrementalVocab: df-cancelling tf over-subtraction raises, not silently drops (ADVICE r4)") {
    import spark.implicits._
    val st = IncrementalVocab.initial(Seq((1L, "beta")).toDF("doc_id", "text"))
    // tombstone whose df contribution cancels exactly (df 1−1 = 0) while
    // tf over-subtracts (tf 1−2 = −1): the round-4 column-riding guard
    // never fired here because the df > 0 drop ran first — the combined
    // filter predicate must raise before dropping
    val bad = Seq((1L, "beta beta")).toDF("doc_id", "text")
    val e = intercept[Throwable] {
      IncrementalVocab.retract(st, bad).counts.collect()
    }
    def msgs(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x => x.toString +: msgs(x.getCause))
    assert(msgs(e).exists(_.contains("negative count")), msgs(e).mkString(" | "))
  }

  test("IncrementalVocab: streamed micro-batches equal the batch table") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import spark.implicits._
    val all = docs().collect().map(r => (r.getLong(0), r.getString(1))).sortBy(_._1)
    val whole = rows(IncrementalVocab.ofBatch(docs()))
    val source = MemoryStream[(Long, String)]
    val (writer, handle) = graft.streaming.StreamingVocab.vocabWriter(
      source.toDF().toDF("doc_id", "text"), IncrementalVocab.emptyState(spark))
    val q = writer.start()
    try {
      source.addData(all.take(20): _*); q.processAllAvailable()
      source.addData(all.slice(20, 45): _*); q.processAllAvailable()
      source.addData(all.drop(45): _*); q.processAllAvailable()
    } finally q.stop()
    assert(rows(handle.state.counts) == whole)
  }

  test("IncrementalVocab: a delta over the resumed state equals the live one") {
    val dir = java.nio.file.Files.createTempDirectory("vocab-state").toString
    val d = docs()
    val b1 = d.filter(col("doc_id") % 2 === 0)
    val b2 = d.filter(col("doc_id") % 2 === 1)
    val s1 = IncrementalVocab.initial(b1)
    IncrementalVocab.save(spark, s1, dir)
    val loaded = IncrementalVocab.load(spark, dir)
    assert(rows(loaded.counts) == rows(s1.counts))
    assert(rows(IncrementalVocab.delta(loaded, b2).counts) ==
      rows(IncrementalVocab.delta(s1, b2).counts))
  }

  test("StreamingVocab: per-batch durable commits compact the state and resume bit-equal") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("vocab-stream").toString
    val all = docs().collect().map(r => (r.getLong(0), r.getString(1))).sortBy(_._1)
    val whole = rows(IncrementalVocab.ofBatch(docs()))
    val source = MemoryStream[(Long, String)]
    val (writer, handle) = graft.streaming.StreamingVocab.vocabWriter(
      source.toDF().toDF("doc_id", "text"), IncrementalVocab.emptyState(spark),
      stateDir = Some(dir), commitEvery = 1, retainEpochs = Some(2))
    val q = writer.start()
    try {
      // THREE commits against retainEpochs=2, so retention must expire
      source.addData(all.take(15): _*); q.processAllAvailable()
      source.addData(all.slice(15, 30): _*); q.processAllAvailable()
      source.addData(all.drop(30): _*); q.processAllAvailable()
    } finally q.stop()
    assert(rows(handle.state.counts) == whole)
    // a fresh session-side resume sees exactly the committed fold
    assert(rows(IncrementalVocab.load(spark, dir).counts) == whole)
    // retention actually expired the oldest of the 3 epochs
    assert(graft.tableio.StateStore.epochs(dir).size == 2)
  }

  test("StreamingVocab: resume skips replayed batches, folds only new ones") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("vocab-resume").toString
    val all = docs().collect().map(r => (r.getLong(0), r.getString(1))).sortBy(_._1)
    val s1 = MemoryStream[(Long, String)]
    val (w1, _) = graft.streaming.StreamingVocab.vocabWriter(
      s1.toDF().toDF("doc_id", "text"), IncrementalVocab.emptyState(spark),
      stateDir = Some(dir), commitEvery = 1)
    val q1 = w1.start()
    try {
      s1.addData(all.take(30): _*); q1.processAllAvailable()   // batch 0
      s1.addData(all.drop(30): _*); q1.processAllAvailable()   // batch 1
    } finally q1.stop()
    // crash+restart simulation: the engine replays from offset 0 (a
    // fresh source numbers batches 0,1,... again); the writer must skip
    // the replayed prefix (committed position = batch 1) and fold only
    // the genuinely new batch 2
    val extra = all.map { case (id, t) => (id + 1000000L, t) }.take(10)
    val expected = rows(IncrementalVocab.ofBatch(
      (all ++ extra).toSeq.toDF("doc_id", "text")))
    val s2 = MemoryStream[(Long, String)]
    val (w2, h2) = graft.streaming.StreamingVocab.vocabWriter(
      s2.toDF().toDF("doc_id", "text"), IncrementalVocab.load(spark, dir),
      stateDir = Some(dir), commitEvery = 1)
    val q2 = w2.start()
    try {
      s2.addData(all.take(30): _*); q2.processAllAvailable()   // replay of 0: skipped
      s2.addData(all.drop(30): _*); q2.processAllAvailable()   // replay of 1: skipped
      s2.addData(extra: _*); q2.processAllAvailable()          // batch 2: folds
    } finally q2.stop()
    assert(rows(h2.state.counts) == expected)
    assert(rows(IncrementalVocab.load(spark, dir).counts) == expected)
  }

  test("StreamingVocab: CDC stream with mid-stream takedown equals the surviving-docs table") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import spark.implicits._
    val all = docs().collect().map(r => (r.getLong(0), r.getString(1))).sortBy(_._1)
    val (dropped, kept) = all.splitAt(10)
    val expected = rows(IncrementalVocab.ofBatch(kept.toSeq.toDF("doc_id", "text")))
    val source = MemoryStream[(String, Long, String)]
    val (writer, handle) = graft.streaming.StreamingVocab.vocabWriterCdc(
      source.toDF().toDF("op", "doc_id", "text"), IncrementalVocab.emptyState(spark))
    val q = writer.start()
    try {
      source.addData(all.take(30).map { case (d, t) => ("add", d, t) }: _*)
      q.processAllAvailable()
      // one batch retracts the first 10 docs AND adds the remainder
      source.addData(dropped.map { case (d, t) => ("retract", d, t) } ++
        all.drop(30).map { case (d, t) => ("add", d, t) }: _*)
      q.processAllAvailable()
    } finally q.stop()
    assert(rows(handle.state.counts) == expected)
  }

  test("IncrementalVocab: topK matches the batch query under the same total order") {
    val batch = TextQueries.qVocabTopk(spark, dir)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq
    val st = IncrementalVocab.initial(docs())
    val inc = IncrementalVocab.topK(st, 100)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq
    assert(inc == batch)
  }
}
