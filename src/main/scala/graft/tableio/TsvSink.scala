package graft.tableio

import org.apache.spark.sql.{DataFrame, SparkSession}

/** TSV dictionary source/sink — the reference's at-rest format
  * (SURVEY.md §2.1 S1-S3, S6; e.g. extract_rel.py:54-58 writes
  * `rel_id \t label` sorted by id). Golden/dictionary files are small:
  * `golden = true` coalesces to one part for a stable single file. */
object TsvSink {

  def write(df: DataFrame, path: String, orderBy: Option[String] = None,
            golden: Boolean = false): Unit = {
    val ordered = orderBy.fold(df)(c => df.orderBy(c))
    val out = if (golden) ordered.coalesce(1) else ordered
    out.write.mode("overwrite")
      .option("sep", "\t").option("header", "false")
      .csv(path)
  }

  def read(spark: SparkSession, path: String, schema: org.apache.spark.sql.types.StructType): DataFrame =
    spark.read.schema(schema).option("sep", "\t").csv(path)
}
