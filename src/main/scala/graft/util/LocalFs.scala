package graft.util

/** Local-filesystem helpers shared by the state/staging layers (this
  * engine's single-node stand-in for object storage; see TableIO). */
object LocalFs {

  /** Recursive delete, tolerant of concurrent/missing entries. */
  def deleteRecursively(f: java.io.File): Unit = {
    val kids = f.listFiles()
    if (kids != null) kids.foreach(deleteRecursively)
    f.delete(): Unit
  }
}
