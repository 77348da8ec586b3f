package graft.sinks

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** S7: the JSON-embedded standalone report sink
  * (`master_standalone.py:143-197`): project the display columns, render
  * rows to compact JSON, and inject the payload into an HTML template at a
  * placeholder. The projection/JSON-rendering runs distributed
  * (`to_json(struct(...))`); only the final bounded payload is collected
  * for templating, as the reference's ~23k-row map page does. */
object HtmlReport {

  val Placeholder = "/*__DATA__*/"

  def defaultTemplate: String =
    s"""<!doctype html>
       |<html><head><meta charset="utf-8"><title>report</title></head>
       |<body><script>const DATA = [$Placeholder];</script></body></html>
       |""".stripMargin

  /** Render `df`'s rows as a JSON array embedded in `template` at
    * [[Placeholder]] and write the page to `path`. The caller is
    * responsible for bounding `df` (this is a presentation sink, not a
    * data sink). */
  def write(df: DataFrame, path: String,
            template: String = defaultTemplate): Unit = {
    val json = df
      .select(to_json(struct(df.columns.map(col): _*)).as("j"))
      .collect()
      .map(_.getString(0))
      .mkString(",")
    Files.writeString(Paths.get(path), template.replace(Placeholder, json))
    ()
  }
}
