package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Isolated profile of ConnectedComponents on alignment-shaped edge
  * sets (mostly near-pairs + a planted hub chain) — diagnoses whether
  * CC wall time is round count or per-round overhead. */
object CcProfile {
  def main(args: Array[String]): Unit = {
    val cores = if (args.nonEmpty) args(0).toInt else 8
    val nPairs = if (args.length > 1) args(1).toInt else 50000
    val spark = SparkSession.builder().master(s"local[$cores]")
      .config("spark.sql.shuffle.partitions", (cores * 8).toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    // alignment-shaped: pair edges (i, 1000000+i) + a 1000-node star hub
    val pairs = spark.range(nPairs.toLong).select(col("id").as("a"), (col("id") + 1000000L).as("b"))
    val hub = spark.range(1000).select(lit(5000000L).as("a"), (col("id") + 5000001L).as("b"))
    val edges = pairs.unionByName(hub)

    val t0 = System.nanoTime()
    val comps = graft.canon.ConnectedComponents.run(spark, edges, verbose = true)
    val tRun = (System.nanoTime() - t0) / 1e9
    val t1 = System.nanoTime()
    val n = comps.count()
    val tCount = (System.nanoTime() - t1) / 1e9
    println(f"[cc-profile] run=$tRun%.2f s count=$tCount%.2f s nodes=$n")
    spark.stop()
  }
}
