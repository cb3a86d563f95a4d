package graft.tools
object DumpSql {
  def main(args: Array[String]): Unit = {
    val sel = graft.SparkEntry.oracleSql.view.filterKeys(args.drop(1).toSet).toMap
    def q(s: String): String = "\"" + s.flatMap {
      case '"' => "\\\""; case '\\' => "\\\\"; case '\n' => "\\n"
      case c if c < ' ' => " "; case c => c.toString } + "\""
    val json = sel.map { case (k,v) => s"${q(k)}: ${q(v)}" }.mkString("{",",","}")
    java.nio.file.Files.writeString(java.nio.file.Paths.get(args(0)), json)
  }
}
