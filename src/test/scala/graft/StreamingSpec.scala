package graft

import graft.ingest.{DocSynthesizer, SynthConfig}
import graft.extract.Extraction
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
}
