package graft.util

import org.apache.spark.sql.Dataset
import org.apache.spark.storage.StorageLevel

/** The incremental family's per-generation lineage cut, shared so the
  * discipline can only change in one place: reliable `checkpoint()`
  * whenever the session has a checkpoint dir (the real-cluster
  * configuration — survives executor loss), lazy `localCheckpoint`
  * as the single-box fallback. An unbounded batch chain keeps O(1)
  * plan depth instead of unioning B generations deep. Generic over the
  * row type, so typed state components and DataFrames share it.
  * (ConnectedComponents keeps its own loop-internal cut: same branch
  * structure but the default localCheckpoint storage level, a measured
  * choice inside the star loop.) */
object Lineage {
  def cut[T](ds: Dataset[T]): Dataset[T] =
    if (ds.sparkSession.sparkContext.getCheckpointDir.isDefined) ds.checkpoint()
    else ds.localCheckpoint(eager = false, StorageLevel.MEMORY_AND_DISK)
}
