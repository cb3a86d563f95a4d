package graft.tools

import org.apache.spark.sql.SparkSession

/** Dump ONE battery query to parquet for ad-hoc DuckDB cross-checks
  * while iterating (the driver's Verify dumps all of them).
  * args: queryName sfDir outPath */
object VerifyOne {
  def main(args: Array[String]): Unit = {
    val Array(name, sfDir, outPath) = args
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.SparkEntry.queries(name)(spark, sfDir)
      .coalesce(1).write.mode("overwrite").parquet(outPath)
    spark.stop()
  }
}
