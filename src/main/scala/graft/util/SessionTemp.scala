package graft.util

/** Session-lifetime values keyed by a SOURCE DATASET's identity — the
  * one staleness/lifecycle discipline shared by every battery-side
  * compute-once cache (the TableIO demo tables, the staged MinHash/
  * SimHash signature frames). The key folds the source's recursive
  * listing digest ([[LocalFs.listingDigest]]: relative names + sizes +
  * mtimes), so a regenerated dataset — even one rewritten inside nested
  * part paths or within mtime granularity — can never serve a previous
  * generation's value, and a missing source fails fast instead of
  * caching under a sentinel key (ADVICE r4). The builder receives a
  * fresh temp root that a JVM shutdown hook removes, so repeated
  * bench/correctness runs do not accumulate orphan dirs (ADVICE r3). */
object SessionTemp {

  private val cache = scala.collection.concurrent.TrieMap.empty[String, Any]

  def keyed[A](kind: String, source: java.io.File)(make: String => A): A = {
    require(source.exists, s"SessionTemp: missing source $source")
    val digest = LocalFs.listingDigest(source)
    cache.getOrElseUpdate(s"$kind|${source.getPath}|$digest", {
      val root = java.nio.file.Files.createTempDirectory("graft_tmp").toString
      Runtime.getRuntime.addShutdownHook(new Thread(() =>
        LocalFs.deleteRecursively(new java.io.File(root))))
      make(root)
    }).asInstanceOf[A]
  }
}
