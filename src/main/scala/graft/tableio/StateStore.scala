package graft.tableio

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Atomic MULTI-TABLE state commits: the generic core of the durable
  * continuous-state discipline (factored out of
  * [[graft.IncrementalAlign]], which pioneered it for its ~10-table
  * alignment state; the dedup/vocab maintainers reuse it for their
  * 1-2 table states). Each component commits as a [[TableIO]] snapshot
  * table under `dir/<name>`, then an EPOCH MARKER is written LAST
  * (`dir/_state/epoch-<k>.txt`, atomic rename — the same manifest-last
  * discipline as TableIO.commit, one level up) recording every
  * component's snapshot id. [[load]] resolves components through the
  * newest marker, so a save killed between component commits leaves
  * the previous epoch fully intact — no torn state mixing one table's
  * new snapshot with another's old one. Older epochs stay readable
  * (time travel); [[expire]] bounds storage at O(keepEpochs × state)
  * on an unbounded stream and sweeps up orphan snapshots from crashed
  * saves once superseded.
  */
object StateStore {

  /** Commit `components` then the epoch marker; returns the new epoch. */
  def save(spark: SparkSession, dir: String,
           components: Seq[(String, DataFrame)]): Long = {
    val ids = components.map { case (name, df) =>
      name -> TableIO.commit(spark, df, s"$dir/$name", "state").id
    }
    writeMarker(dir, ids)
  }

  /** Write the epoch marker LAST — this call is the commit point of a
    * multi-table save. `ids` are component → committed snapshot id
    * (callers with custom commit options run TableIO.commit themselves
    * and hand the ids here, as IncrementalAlign does). */
  def writeMarker(dir: String, ids: Seq[(String, Long)]): Long = {
    val k = epochs(dir).lastOption.getOrElse(-1L) + 1
    java.nio.file.Files.createDirectories(epochDir(dir))
    val tmp = epochDir(dir).resolve(s".epoch-$k.txt.tmp")
    java.nio.file.Files.writeString(tmp,
      ids.iterator.map { case (n, i) => s"$n $i" }.mkString("\n"))
    java.nio.file.Files.move(tmp, epochDir(dir).resolve(s"epoch-$k.txt"),
      java.nio.file.StandardCopyOption.ATOMIC_MOVE)
    k
  }

  private def epochDir(dir: String): java.nio.file.Path =
    java.nio.file.Paths.get(dir, "_state")

  /** Committed state epochs of `dir`, ascending (one per completed save). */
  def epochs(dir: String): Seq[Long] = {
    import scala.jdk.CollectionConverters._
    val d = epochDir(dir)
    if (!java.nio.file.Files.isDirectory(d)) Nil
    else {
      // Files.list holds a directory fd until closed — per-batch durable
      // commits call this 2-3× per micro-batch, so relying on GC leaks
      val s = java.nio.file.Files.list(d)
      try s.iterator().asScala
        .map(_.getFileName.toString)
        .collect { case n if n.startsWith("epoch-") && n.endsWith(".txt") =>
          n.stripPrefix("epoch-").stripSuffix(".txt").toLong }
        .toSeq.sorted
      finally s.close()
    }
  }

  /** Component → snapshot id map of one committed epoch. */
  def readEpoch(dir: String, k: Long): Map[String, Long] = {
    import scala.jdk.CollectionConverters._
    java.nio.file.Files.readAllLines(epochDir(dir).resolve(s"epoch-$k.txt"))
      .asScala.iterator.filter(_.nonEmpty)
      .map { l => val Array(n, i) = l.split(' '); n -> i.toLong }.toMap
  }

  /** Resolve every component of the newest (or given) epoch; a
    * marker-less legacy dir is not resolvable here — callers with a
    * legacy fallback read each table's latest snapshot themselves. */
  def load(spark: SparkSession, dir: String,
           epoch: Option[Long] = None): Map[String, DataFrame] = {
    val k = epoch.orElse(epochs(dir).lastOption)
      .getOrElse(sys.error(s"no committed state epoch under $dir"))
    readEpoch(dir, k).map { case (name, id) =>
      name -> TableIO.readAt(spark, s"$dir/$name", id)
    }
  }

  /** Keep the newest `keepEpochs` epochs (each fully re-loadable via
    * time travel), reclaim everything older: expired markers plus every
    * component snapshot below the retained epochs' floor — which also
    * sweeps up orphans left by a save that crashed before its marker.
    * A component referenced by NO retained epoch keeps its last
    * snapshots: retention only reclaims what a retained epoch
    * supersedes. */
  def expire(dir: String, keepEpochs: Int): Unit = {
    require(keepEpochs >= 1, "must keep at least the latest epoch")
    val eps = epochs(dir)
    if (eps.nonEmpty) {
      val retained = eps.takeRight(keepEpochs)
      val floor = retained.map(readEpoch(dir, _)).flatMap(_.toSeq)
        .groupMapReduce(_._1)(_._2)(math.min)
      floor.foreach { case (name, id) => TableIO.expireBefore(s"$dir/$name", id) }
      eps.dropRight(keepEpochs).foreach(k =>
        java.nio.file.Files.deleteIfExists(epochDir(dir).resolve(s"epoch-$k.txt")))
    }
  }
}
