package graft.util

import org.apache.spark.sql.DataFrame
import org.apache.spark.storage.StorageLevel

/** The incremental family's per-generation lineage cut, shared so the
  * discipline can only change in one place: reliable `checkpoint()`
  * whenever the session has a checkpoint dir (the real-cluster
  * configuration — survives executor loss), lazy `localCheckpoint`
  * as the single-box fallback. An unbounded batch chain keeps O(1)
  * plan depth instead of unioning B generations deep. */
object Lineage {
  def cut(df: DataFrame): DataFrame =
    if (df.sparkSession.sparkContext.getCheckpointDir.isDefined) df.checkpoint()
    else df.localCheckpoint(eager = false, StorageLevel.MEMORY_AND_DISK)
}
