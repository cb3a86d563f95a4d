package graft.util

import org.apache.spark.sql.Dataset

/** `limit(n).collect()` in ONE scheduled job.
  *
  * CollectLimit executes incrementally: round 1 scans 1 partition, then
  * 4, 16, 64 (`spark.sql.limit.scaleUpFactor`) until `n` rows are found.
  * When the frame has FEWER rows than the limit — the normal case for a
  * driver-cap probe, where the limit exists only to bound a pathological
  * input — every round comes up short and the scan costs up to 4
  * scheduled jobs instead of 1. Each job pays driver scheduling latency
  * (0.1 s warm, whole seconds in this VM's degraded windows), which is
  * exactly the serial floor the driver fast paths exist to avoid.
  *
  * Pinning `spark.sql.limit.initialNumPartitions` to cover every
  * partition makes round 1 scan the whole frame: one job, identical
  * result, and the per-task early-exit still bounds work when the limit
  * IS hit. The previous session value is restored on exit.
  */
object BoundedCollect {
  private val Key = "spark.sql.limit.initialNumPartitions"

  def limitCollect[T](ds: Dataset[T], n: Int): Array[T] = {
    val spark = ds.sparkSession
    val prev = spark.conf.getOption(Key)
    spark.conf.set(Key, 10000000)
    try ds.limit(n).collect()
    finally prev match {
      case Some(v) => spark.conf.set(Key, v)
      case None    => spark.conf.unset(Key)
    }
  }
}
