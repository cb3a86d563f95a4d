package graft.tableio

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import java.nio.file.{Files, Path, Paths, StandardCopyOption}
import scala.jdk.CollectionConverters._

/** Thin Iceberg-semantics table layer over partitioned Parquet
  * (SURVEY.md §7.0 — no Iceberg runtime jar ships in this sandbox).
  *
  * Layout:
  *   table/data/snap-<n>/...(parquet, optionally partitioned dirs)
  *   table/_meta/snapshot-<n>.json   — committed LAST; the manifest
  *                                     whose n is max defines the table
  *
  * Gives exactly the properties the north rule exercises: atomic
  * snapshot commit (manifest-last-write of a complete JSON), checkpointed
  * resume (a stage whose snapshot exists is skipped and read back),
  * per-partition lineage + row-count metrics inside the manifest, and
  * partition pruning (partitionBy dirs + parquet filters). The API is a
  * seam — a real Iceberg catalog drops in behind `read`/`commit`.
  */
object TableIO {

  final case class Snapshot(id: Long, dataPath: String, rows: Long,
                            stage: String, inputs: Seq[String],
                            partitionRows: Map[Int, Long])

  private def metaDir(base: String): Path = Paths.get(base, "_meta")

  def latestSnapshotId(base: String): Option[Long] = {
    val md = metaDir(base)
    if (!Files.isDirectory(md)) None
    else {
      val ids = Files.list(md).iterator().asScala
        .map(_.getFileName.toString)
        .collect { case s if s.startsWith("snapshot-") && s.endsWith(".json") =>
          s.stripPrefix("snapshot-").stripSuffix(".json").toLong }
        .toSeq
      ids.maxOption
    }
  }

  def exists(base: String): Boolean = latestSnapshotId(base).isDefined

  /** Commit df as the next snapshot of `base`. Returns the snapshot.
    * Data lands fully before the manifest is moved into place (atomic
    * rename of a complete temp file) — a killed job leaves either the
    * previous snapshot or the new one, never a torn table. */
  def commit(spark: SparkSession, df: DataFrame, base: String, stage: String,
             inputs: Seq[String] = Nil, partitionCols: Seq[String] = Nil): Snapshot = {
    val next = latestSnapshotId(base).getOrElse(-1L) + 1
    val dataPath = s"$base/data/snap-$next"
    // per-partition lineage: rows per physical write partition
    val withPid = df.withColumn("_pid", spark_partition_id())
    val counts = withPid.groupBy("_pid").count().collect()
      .map(r => r.getInt(0) -> r.getLong(1)).toMap
    val rows = counts.values.sum
    val writer = df.write.mode("overwrite")
    (if (partitionCols.nonEmpty) writer.partitionBy(partitionCols: _*) else writer)
      .parquet(dataPath)
    Files.createDirectories(metaDir(base))
    val lineage = counts.toSeq.sortBy(_._1)
      .map { case (p, n) => s"\"$p\":$n" }.mkString("{", ",", "}")
    val json =
      s"""{"snapshot":$next,"stage":"${stage}","data":"${dataPath}","rows":$rows,
         |"inputs":[${inputs.map(i => "\"" + i + "\"").mkString(",")}],
         |"partition_rows":$lineage,
         |"partition_cols":[${partitionCols.map(c => "\"" + c + "\"").mkString(",")}]}""".stripMargin
    val tmp = metaDir(base).resolve(s".snapshot-$next.json.tmp")
    Files.writeString(tmp, json)
    Files.move(tmp, metaDir(base).resolve(s"snapshot-$next.json"),
      StandardCopyOption.ATOMIC_MOVE)
    Snapshot(next, dataPath, rows, stage, inputs, counts)
  }

  /** Read the latest snapshot of `base`. */
  def read(spark: SparkSession, base: String): DataFrame = {
    val id = latestSnapshotId(base).getOrElse(
      throw new IllegalStateException(s"no snapshot at $base"))
    spark.read.parquet(s"$base/data/snap-$id")
  }

  /** Checkpointed resume: if `base` has a snapshot, read it back and skip
    * recompute — otherwise compute, commit, and read back (so downstream
    * always consumes the committed bytes; resume is byte-identical). */
  def computeIfAbsent(spark: SparkSession, base: String, stage: String,
                      inputs: Seq[String] = Nil, partitionCols: Seq[String] = Nil)
                     (compute: => DataFrame): DataFrame = {
    if (!exists(base)) commit(spark, compute, base, stage, inputs, partitionCols)
    read(spark, base)
  }
}
