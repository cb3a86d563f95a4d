package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Bisects the battery-context q_ngram_jaccard inflation (151 s first
  * materialization vs ~10 s standalone / 3 s cached): runs the battery
  * prefix that reproduces it, then times (a) materializing the shingle
  * cache alone, (b) the full query on the warm cache, (c) the full
  * query UNCACHED, (d) the full query cached MEMORY_ONLY — separating
  * the DiskStore/mmap cache path from the self-join compute.
  * args: sfDir
  */
object NgramProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val parts = sys.env.getOrElse("SPARK_GRAFT_PARTS", "64")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", parts)
      .config("spark.local.dir", "/dev/shm/spark-graft")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def jiffies(): (Long, Long) = {
      val s = scala.io.Source.fromFile("/proc/stat")
      val l = try s.getLines().next() finally s.close()
      val p = l.trim.split("\\s+")
      (p(1).toLong, p(3).toLong) // user, sys
    }
    def time(tag: String)(f: => Long): Unit = {
      val (u0, s0) = jiffies()
      val t0 = System.nanoTime()
      val n = f
      val sec = (System.nanoTime() - t0) / 1e9
      val (u1, s1) = jiffies()
      println(f"PROBE $tag rows=$n sec=$sec%.3f userJ=${u1 - u0} sysJ=${s1 - s0}")
    }

    for (q <- Seq("q_dedup_exact", "q_minhash_pairs", "q_minhash_sig"))
      time(q)(graft.SparkEntry.queries(q)(spark, sfDir).count())

    def shingles: DataFrame =
      spark.read.parquet(s"$sfDir/documents.parquet")
        .filter(col("doc_id") % 10 === 0 && length(col("text")) >= 3)
        .select(col("doc_id"),
          explode(expr("transform(sequence(1, length(text)-2), i -> substring(text, i, 3))")).as("sh"))
        .distinct()

    def full(sh: DataFrame): DataFrame = {
      val sizes = sh.groupBy(col("doc_id")).agg(count(lit(1)).as("s"))
      val a = sh.toDF("d1", "sh")
      val b = sh.toDF("d2", "sh")
      val inter = a.join(b, Seq("sh")).filter(col("d1") < col("d2"))
        .groupBy(col("d1"), col("d2")).agg(count(lit(1)).as("i"))
      inter
        .join(sizes.toDF("d1", "s1"), Seq("d1"))
        .join(sizes.toDF("d2", "s2"), Seq("d2"))
        .select(col("d1"), col("d2"), col("i"),
          round(col("i") / (col("s1") + col("s2") - col("i")), 6).as("jaccard"))
        .filter(col("jaccard") >= 0.5)
    }

    // (a) materialize the cache alone, (b) query on the warm cache
    val shC = shingles.persist()
    time("cache_materialize")(shC.count())
    time("query_on_warm_cache")(full(shC).count())
    shC.unpersist(true)

    // (c) uncached
    time("query_uncached")(full(shingles).count())

    // (d) MEMORY_ONLY cache (no DiskStore involvement)
    val shM = shingles.persist(org.apache.spark.storage.StorageLevel.MEMORY_ONLY)
    time("query_memory_only")(full(shM).count())
    shM.unpersist(true)

    // (e)/(f) interleaved A/B: cold-cache-during-join vs eager
    // materialize-then-join, 3 rounds each so a host-window shift
    // can't masquerade as the variant effect
    for (round <- 1 to 3) {
      val cold = shingles.persist()
      time(s"r$round:cold_cache_join")(full(cold).count())
      cold.unpersist(true)
      val eager = shingles.persist()
      time(s"r$round:eager_then_join") { eager.count(); full(eager).count() }
      eager.unpersist(true)
    }

    spark.stop()
  }
}
