package graft.lifecycle

/** I6 ontology ingestion: parse a user-supplied YAML data model into the
  * structures the catalog and diagram surfaces consume — the reference
  * distills user OWL/TTL ontologies into exactly this per-task YAML shape
  * (bambooai/utils.py:323-367; prompt contract default_prompts.yaml:
  * 1020-1110: containers with their columns, merge links, and VERBATIM
  * helper-function references with "NO invented functions").
  *
  * Supported YAML subset (the distillation contract's shape):
  * {{{
  * containers:
  *   - name: activity
  *     columns: [activity_id, user_id, ts, value]
  * links:
  *   - from: events
  *     to: activity
  *     on: user_id
  * functions:
  *   - pace_min_per_km
  * }}}
  *
  * Helper names are validated against [[FunctionCatalog]] at parse time —
  * an unknown function is a rejection, not a silent passthrough, mirroring
  * the reference's no-invented-functions rule. The parsed model feeds
  * [[Agents.mermaid]] (I7) and resolves helpers through the catalog.
  */
object Ontology {

  final case class DataModel(nodes: Seq[Agents.ModelNode],
      edges: Seq[Agents.ModelEdge], helpers: Seq[String])

  private def stripQuotes(s: String): String =
    s.trim.stripPrefix("'").stripSuffix("'").stripPrefix("\"").stripSuffix("\"")

  /** Parse the YAML subset; Left(reason) on structural problems or unknown
    * helper functions. */
  def parseYaml(text: String): Either[String, DataModel] = {
    var section = ""
    val nodes = scala.collection.mutable.ArrayBuffer.empty[Agents.ModelNode]
    val edges = scala.collection.mutable.ArrayBuffer.empty[Agents.ModelEdge]
    val helpers = scala.collection.mutable.ArrayBuffer.empty[String]
    // accumulating state for the current `- ` item in containers/links
    var cur = Map.empty[String, String]
    def flush(): Either[String, Unit] = {
      if (cur.isEmpty) return Right(())
      val item = cur; cur = Map.empty
      section match {
        case "containers" =>
          item.get("name") match {
            case None => Left(s"container item without name: $item")
            case Some(n) =>
              val cols = item.getOrElse("columns", "")
                .stripPrefix("[").stripSuffix("]")
                .split(",").map(stripQuotes).filter(_.nonEmpty).toSeq
              nodes += Agents.ModelNode(n, cols); Right(())
          }
        case "links" =>
          (item.get("from"), item.get("to"), item.get("on")) match {
            case (Some(f), Some(t), Some(o)) =>
              edges += Agents.ModelEdge(f, t, o); Right(())
            case _ => Left(s"link item needs from/to/on: $item")
          }
        case other => Left(s"list item outside a known section: $other")
      }
    }
    for (raw <- text.linesIterator) {
      val line = raw.replaceAll("#.*$", "")
      if (line.trim.nonEmpty) {
        val trimmed = line.trim
        if (!line.startsWith(" ") && trimmed.endsWith(":")) {
          flush() match { case Left(e) => return Left(e); case _ => }
          section = trimmed.dropRight(1)
        } else if (trimmed.startsWith("- ") || trimmed == "-") {
          flush() match { case Left(e) => return Left(e); case _ => }
          val rest = trimmed.stripPrefix("-").trim
          if (section == "functions") { if (rest.nonEmpty) helpers += stripQuotes(rest) }
          else if (rest.contains(":")) {
            val Array(k, v @ _*) = rest.split(":", 2): @unchecked
            cur += (k.trim -> stripQuotes(v.mkString(":")))
          }
        } else if (trimmed.contains(":") && cur.nonEmpty || trimmed.contains(":") && section.nonEmpty) {
          val Array(k, v @ _*) = trimmed.split(":", 2): @unchecked
          cur += (k.trim -> stripQuotes(v.mkString(":")))
        }
      }
    }
    flush() match { case Left(e) => return Left(e); case _ => }
    val unknown = helpers.filter(h =>
      !FunctionCatalog.scalars.contains(h) && !FunctionCatalog.tables.contains(h))
    if (unknown.nonEmpty)
      Left(s"unknown helper functions: ${unknown.mkString(", ")}")
    else if (nodes.isEmpty) Left("no containers defined")
    else Right(DataModel(nodes.toSeq, edges.toSeq, helpers.toSeq))
  }

  /** I6 → I7: render the parsed model as the mermaid diagram the agent
    * prompts embed. */
  def toMermaid(model: DataModel): String =
    Agents.mermaid(model.nodes, model.edges)
}
