package graft.tools
object DumpSql {
  def main(args: Array[String]): Unit = {
    val wanted = args.drop(1).toSet
    val missing = wanted -- graft.SparkEntry.oracleSql.keySet
    require(missing.isEmpty, s"unknown oracle queries: ${missing.mkString(", ")}")
    val sel = graft.SparkEntry.oracleSql.view.filterKeys(wanted).toMap
    def q(s: String): String = "\"" + s.flatMap {
      case '"' => "\\\""; case '\\' => "\\\\"; case '\n' => "\\n"
      case c if c < ' ' => " "; case c => c.toString } + "\""
    val json = sel.map { case (k,v) => s"${q(k)}: ${q(v)}" }.mkString("{",",","}")
    java.nio.file.Files.writeString(java.nio.file.Paths.get(args(0)), json)
  }
}
