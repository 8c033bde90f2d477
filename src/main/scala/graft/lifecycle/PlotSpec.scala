package graft.lifecycle

import org.apache.spark.sql.DataFrame

/** Plot surface (SURVEY §1.1 "Plots" row): the reference captures rendered
  * matplotlib PNGs / plotly JSON from executed code
  * (bambooai/code_executor.py:143-183). The engine's declarative
  * equivalent: return the aggregated result table plus a plot-spec JSON the
  * UI renders — no figure rendering inside the engine, no exec.
  */
object PlotSpec {

  final case class Spec(kind: String, x: String, ys: Seq[String],
      title: String)

  private def esc(s: String): String = s.flatMap {
    case '"' => "\\\""
    case '\\' => "\\\\"
    case c if c < ' ' => f"\\u${c.toInt}%04x"
    case c => c.toString
  }

  /** Serialize spec + inlined (small, post-aggregation) data rows — the
    * shape the reference ships to its web UI as plotly JSON. Callers are
    * expected to pass an already-aggregated frame (the engine's contract:
    * plots render result tables, never raw scans). */
  def toJson(spec: Spec, df: DataFrame, maxRows: Int = 1000): String = {
    val cols = spec.x +: spec.ys
    val data = df.select(cols.head, cols.tail: _*).limit(maxRows).collect()
      .map { r =>
        cols.indices.map { i =>
          val v = r.get(i)
          if (v == null) "null"
          else v match {
            case n: java.lang.Number => n.toString
            case other => "\"" + esc(other.toString) + "\""
          }
        }.mkString("[", ",", "]")
      }.mkString("[", ",", "]")
    s"""{"kind": "${esc(spec.kind)}", "title": "${esc(spec.title)}",
       | "x": "${esc(spec.x)}", "ys": [${spec.ys.map(y => "\"" + esc(y) + "\"").mkString(",")}],
       | "columns": [${cols.map(c => "\"" + esc(c) + "\"").mkString(",")}],
       | "data": $data}""".stripMargin
  }
}
