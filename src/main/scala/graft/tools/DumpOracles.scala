package graft.tools

import java.nio.file.{Files, Paths}

/** Dumps SparkEntry.oracleSql as JSON without starting Spark — feeds
  * scripts/type_audit.py, which DESCRIBEs every oracle in DuckDB and flags
  * result columns whose type (HUGEINT from sum(BIGINT) promotion, DECIMAL)
  * would materialize through pandas as a different dtype than the Spark
  * side emits, breaking the driver's value hash even when values agree.
  */
object DumpOracles {
  def main(args: Array[String]): Unit = {
    val out = args.headOption.getOrElse("/tmp/oracle_sql.json")
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val json = graft.SparkEntry.oracleSql
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(out), json)
    println(s"wrote ${graft.SparkEntry.oracleSql.size} oracle entries to $out")
  }
}
