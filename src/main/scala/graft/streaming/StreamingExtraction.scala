package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Incremental document ingestion — an engine-side addition (the
  * reference is batch-only, SURVEY.md §2.9): new interleaved-doc parquet
  * files appearing under a directory are incrementally exploded into
  * spans and parsed into raw triples with Structured Streaming. The
  * transform chain is IDENTICAL to the batch path (same explode + parse
  * expressions as extract.Extraction), so batch/stream parity holds by
  * construction.
  *
  * At production scale this is the continuous-ingest front of the
  * pipeline: a file-source (or Kafka-source) stream feeding the same
  * extraction plan, checkpointed by Spark's own streaming checkpoint.
  */
object StreamingExtraction {

  val docSchema: StructType = StructType(Seq(
    StructField("doc_id", StringType),
    StructField("spans", ArrayType(StructType(Seq(
      StructField("kind", StringType),
      StructField("text", StringType),
      StructField("media_ref", StringType),
      StructField("offset", IntegerType)))))))

  /** Streaming DataFrame of (doc_id, span_idx, kind, text) text spans. */
  def textSpans(spark: SparkSession, inputDir: String): DataFrame =
    spark.readStream.schema(docSchema).parquet(inputDir)
      .select(col("doc_id"), posexplode(col("spans")).as(Seq("span_idx", "span")))
      .select(col("doc_id"), col("span_idx"),
        col("span.kind").as("kind"), col("span.text").as("text"))
      .filter(col("kind") === "text")

  /** Streaming triple extraction: same token-window parse as the batch
    * path, expressed with SQL functions so it runs inside the stream. */
  def rawTriples(spark: SparkSession, inputDir: String): DataFrame =
    textSpans(spark, inputDir)
      .select(col("doc_id"), col("span_idx"),
        explode(expr(
          """filter(
               transform(split(text, ' '), (tok, i) ->
                 CASE WHEN tok RLIKE '^rel_[0-9]+$' AND i > 0 AND i < size(split(text, ' ')) - 1
                        AND element_at(split(text, ' '), i) != '.'
                        AND element_at(split(text, ' '), i + 2) != '.'
                      THEN struct(element_at(split(text, ' '), i) AS subj, tok AS pred,
                                  element_at(split(text, ' '), i + 2) AS obj)
                      ELSE NULL END),
               x -> x IS NOT NULL)""")).as("t"))
      .select(col("doc_id"), col("span_idx"),
        col("t.subj").as("subj"), col("t.pred").as("pred"), col("t.obj").as("obj"))
}
