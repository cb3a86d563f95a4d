package graft.tools

import org.apache.spark.sql.SparkSession

/** Time ONE battery query exactly the way the Bench battery runs it
  * (same session shape, `.count()` materialization) — isolates a
  * per-query optimization from VerifyOne's coalesce(1) write artifact.
  * args: queryName sfDir [reps]
  */
object TimeOne {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val sfDir = args(1)
    val reps = if (args.length > 2) args(2).toInt else 1
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.local.dir", "/dev/shm/spark-graft")
      .config("spark.io.compression.lz4.blockSize", "512k")
      .config("spark.shuffle.file.buffer", "1m")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val fn = graft.SparkEntry.queries(name)
    (1 to reps).foreach { i =>
      val t0 = System.nanoTime()
      val n = fn(spark, sfDir).count()
      val sec = (System.nanoTime() - t0) / 1e9
      println(f"TIMEONE $name rep=$i rows=$n sec=$sec%.3f")
    }
    spark.stop()
  }
}
