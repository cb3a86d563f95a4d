package graft.tools

import org.apache.spark.sql.SparkSession

/** Drives the driver contract exactly as the harness does:
  * SparkEntry.entry(spark) must return rows > 0 on a tiny fixture.
  * Usage: sbt "runMain graft.tools.EntrySmoke" */
object EntrySmoke {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[8]")
      .appName("entry-smoke")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val df = graft.SparkEntry.entry(spark)
    val n = df.count()
    df.show(10, truncate = false)
    println(s"[entry-smoke] rows=$n")
    require(n > 0, "entry must return rows > 0")
    // probe: canonicalization must have merged most aligned KG2 entities
    // into KG1 ids. Merged rows surface the KG1 canonical name, so the
    // KG2-id-space survivors (subjId >= 1000000) should be well below the
    // full KG2 entity count (unaligned fraction only, ~30%).
    import org.apache.spark.sql.functions._
    val kg2Subj = df.filter(col("subjId") >= 1000000L).select("subjId").distinct().count()
    val kg2Total = df.filter(col("subj").endsWith("_l2") || col("subjId") >= 1000000L)
      .select("subjId").distinct().count()
    println(s"[entry-smoke] kg2_id_space_survivors=$kg2Subj (of ~100 KG2 entities)")
    require(kg2Subj < 60, s"canonicalization merged too few KG2 entities ($kg2Subj survivors)")
    spark.stop()
  }
}
