package graft

import graft.ingest.{DocSynthesizer, SynthConfig}
import graft.extract.Extraction
import graft.kg.{Doc, Span}
import org.apache.spark.sql.streaming.Trigger
import java.nio.file.Files

/** Streaming ingestion parity: the streaming extraction over a file
  * source must emit exactly the triples the batch path emits. */
class StreamingSpec extends SparkTestBase {
  import spark.implicits._

  test("streaming extraction matches batch extraction") {
    val cfg = SynthConfig(entitiesPerKg = 40)
    val docs = DocSynthesizer.docs(spark, cfg)
    val dir = Files.createTempDirectory("graft_stream_in").toString
    docs.write.mode("overwrite").parquet(dir)

    val q = graft.streaming.StreamingExtraction.rawTriples(spark, dir)
      .writeStream.format("memory").queryName("stream_triples")
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(120000)

    val streamed = spark.sql("SELECT subj, pred, obj FROM stream_triples")
      .collect().map(_.toString).sorted
    val batch = Extraction.rawTriples(spark, docs)
      .select($"subj", $"pred", $"obj").collect().map(_.toString).sorted
    assert(streamed.nonEmpty)
    assert(streamed.sameElements(batch), s"stream=${streamed.length} batch=${batch.length}")
  }

  test("batch/stream parity holds on adjacent rel_ tokens (overlap windows)") {
    // "a rel_1 rel_2 b": both windows match — the batch parse must not
    // consume-after-match (it used to emit 1 triple here, the stream 2)
    val tricky = Seq(
      Doc("kg1_t0", Seq(Span("text", "a rel_1 rel_2 b .", "", 0))),
      Doc("kg1_t1", Seq(Span("text", "x rel_3 y rel_3 z", "", 0)))).toDS()
    val dir = Files.createTempDirectory("graft_stream_tricky").toString
    tricky.write.mode("overwrite").parquet(dir)
    val q = graft.streaming.StreamingExtraction.rawTriples(spark, dir)
      .writeStream.format("memory").queryName("stream_tricky")
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(120000)
    val streamed = spark.sql("SELECT subj, pred, obj FROM stream_tricky")
      .collect().map(_.toString).sorted
    val batch = Extraction.rawTriples(spark, tricky)
      .select($"subj", $"pred", $"obj").collect().map(_.toString).sorted
    assert(batch.length == 4, s"expected all 4 windows, got ${batch.length}")
    assert(streamed.sameElements(batch))
  }
}
