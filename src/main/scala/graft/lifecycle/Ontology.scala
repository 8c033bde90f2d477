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
    * helper functions. Constructs outside the flat distillation contract —
    * nested lists, nested mappings (a key with no inline value), flow
    * mappings — are loud "unsupported YAML construct" rejections rather
    * than silent flattening. */
  def parseYaml(text: String): Either[String, DataModel] = {
    var section = ""
    var itemIndent = -1 // leading spaces of the current section's items
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
        val indent = line.takeWhile(_ == ' ').length
        if (!line.startsWith(" ") && trimmed.endsWith(":")) {
          flush() match { case Left(e) => return Left(e); case _ => }
          section = trimmed.dropRight(1)
          itemIndent = -1
        } else if (trimmed.startsWith("- ") || trimmed == "-") {
          if (itemIndent < 0) itemIndent = indent
          else if (indent != itemIndent)
            return Left("unsupported YAML construct: nested list " +
              s"(item at indent $indent under a list at indent $itemIndent)")
          flush() match { case Left(e) => return Left(e); case _ => }
          val rest = trimmed.stripPrefix("-").trim
          if (rest.startsWith("{"))
            return Left(s"unsupported YAML construct: flow mapping: $rest")
          if (section == "functions") { if (rest.nonEmpty) helpers += stripQuotes(rest) }
          else if (rest.contains(":")) {
            if (rest.endsWith(":"))
              return Left("unsupported YAML construct: nested mapping under " +
                s"'${rest.dropRight(1)}' (keys need inline values)")
            val Array(k, v @ _*) = rest.split(":", 2): @unchecked
            cur += (k.trim -> stripQuotes(v.mkString(":")))
          }
        } else if (trimmed.contains(":") && (cur.nonEmpty || section.nonEmpty)) {
          if (trimmed.endsWith(":"))
            return Left("unsupported YAML construct: nested mapping under " +
              s"'${trimmed.dropRight(1)}' (keys need inline values)")
          if (trimmed.split(":", 2)(1).trim.startsWith("{"))
            return Left(s"unsupported YAML construct: flow mapping: $trimmed")
          val Array(k, v @ _*) = trimmed.split(":", 2): @unchecked
          cur += (k.trim -> stripQuotes(v.mkString(":")))
        } else {
          return Left(s"unsupported YAML construct: unrecognized line '$trimmed'")
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

  // ---- OWL/TTL raw-ontology front-end (I6 first half) ----
  //
  // The reference accepts a user's OWL/TTL ontology file, reads it as raw
  // text (bambooai/utils.py:335-343), injects it into the Dataframe
  // Inspector prompt together with the data preview and the task
  // (utils.py:352-356 inject_content), and has the LLM distill it into the
  // per-task YAML data model this file's parseYaml ingests
  // (default_prompts.yaml:1020-1110, "Provide YAML structure between
  // ```yaml ``` tags"). Here the TTL is additionally PARSED — classes,
  // properties, labels, domains/ranges — so the prompt carries a normalized
  // rendering and malformed/unsupported ontologies fail loudly before any
  // model call instead of silently confusing the distiller.

  final case class TtlClass(name: String, label: Option[String])
  final case class TtlProperty(name: String, label: Option[String],
      domain: Option[String], range: Option[String], objectProperty: Boolean)
  final case class TtlOntology(classes: Seq[TtlClass],
      properties: Seq[TtlProperty])

  /** Local name of a Turtle term: IRI → fragment/last path segment,
    * prefixed name → part after the colon. */
  private def local(t: String): String =
    if (t.startsWith("<")) {
      val s = t.stripPrefix("<").stripSuffix(">")
      s.substring(math.max(s.lastIndexOf('#'), s.lastIndexOf('/')) + 1)
    } else if (t.contains(":")) t.substring(t.indexOf(':') + 1)
    else t

  /** Literal text of a quoted object, dropping @lang / ^^datatype tails. */
  private def literal(t: String): Option[String] =
    if (!t.startsWith("\"")) None
    else {
      val end = t.indexOf('"', 1)
      if (end < 0) None else Some(t.substring(1, end))
    }

  /** Parse the minimal Turtle subset the distillation stage consumes:
    * `@prefix` directives, and `subject pred obj (; pred obj)* .`
    * statements declaring owl:Class / owl:DatatypeProperty /
    * owl:ObjectProperty subjects with rdfs:label / rdfs:domain /
    * rdfs:range. Statement terminators are '.' before whitespace/EOF only,
    * so decimal literals and dotted names never split a statement. Anything
    * outside the subset — blank nodes, collections, triple-quoted or
    * multi-line strings, bare numeric literals at a statement boundary — is
    * a loud "unsupported TTL construct" rejection, never a silent mis-parse. */
  def parseTtl(text: String): Either[String, TtlOntology] = {
    // one scan: strip comments, honor quotes/IRIs, split on '.' terminators
    val stmts = scala.collection.mutable.ArrayBuffer.empty[String]
    val cur = new StringBuilder
    var inQ = false; var inIri = false; var i = 0
    while (i < text.length) {
      val c = text(i)
      if (inQ) {
        if (c == '\n') return Left("unsupported TTL construct: multi-line string literal")
        if (c == '"') inQ = false
        cur += c; i += 1
      } else if (inIri) {
        if (c == '>') inIri = false
        cur += c; i += 1
      } else c match {
        case '"' =>
          if (text.startsWith("\"\"\"", i))
            return Left("unsupported TTL construct: triple-quoted string literal")
          inQ = true; cur += c; i += 1
        case '<' => inIri = true; cur += c; i += 1
        case '#' => while (i < text.length && text(i) != '\n') i += 1
        case '[' | ']' | '(' | ')' =>
          return Left(s"unsupported TTL construct: '$c' " +
            "(blank nodes/collections are outside the distillation subset)")
        case '.' if i + 1 >= text.length || text(i + 1).isWhitespace ||
            text(i + 1) == '#' =>
          // a '.' mid-token (decimal literal, dotted prefixed name) is NOT a
          // terminator — only '.' before whitespace/EOF/a comment ends a
          // statement ("ex:a ex:b ex:c.# note" is legal Turtle).
          // `1 .`-style bare integers before the terminator are ambiguous
          // with a decimal literal's longest-match parse; reject loudly
          // rather than guess (the subset's literals are quoted strings).
          val lastTok = cur.toString.split("\\s+").lastOption.getOrElse("")
          if (lastTok.matches("[+-]?[0-9]+"))
            return Left("unsupported TTL construct: bare numeric literal " +
              s"'$lastTok.' at a statement boundary (quote the value)")
          stmts += cur.toString; cur.clear(); i += 1
        case '.' => cur += c; i += 1 // part of the current token
        case ch => cur += ch; i += 1
      }
    }
    if (inQ) return Left("unsupported TTL construct: unterminated string literal")
    if (inIri) return Left("unsupported TTL construct: unterminated IRI")
    if (cur.toString.trim.nonEmpty)
      return Left(s"TTL statement not terminated by '.': ${cur.toString.trim.take(60)}")

    // quote-aware tokenizer; ';' and ',' become standalone tokens
    def tokens(s: String): Seq[String] = {
      val out = scala.collection.mutable.ArrayBuffer.empty[String]
      val b = new StringBuilder; var q = false
      for (c <- s) {
        if (q) { b += c; if (c == '"') q = false }
        else if (c == '"') { b += c; q = true }
        else if (c == ';' || c == ',') {
          if (b.nonEmpty) { out += b.toString; b.clear() }
          out += c.toString
        } else if (c.isWhitespace) {
          if (b.nonEmpty) { out += b.toString; b.clear() }
        } else b += c
      }
      if (b.nonEmpty) out += b.toString
      out.toSeq
    }

    final case class Subject(var kinds: Set[String] = Set.empty,
        var label: Option[String] = None, var domain: Option[String] = None,
        var range: Option[String] = None)
    val subjects = scala.collection.mutable.LinkedHashMap.empty[String, Subject]

    for (stmt <- stmts.map(_.trim) if stmt.nonEmpty) {
      val ts = tokens(stmt)
      // whole-token directive tests (TTL directives are their own tokens;
      // startsWith would misfire on an odd-but-valid local name like
      // `@prefixLike` or a bare object token `prefix`)
      def isAtDirective(t: String): Boolean = t == "@prefix" || t == "@base"
      // SPARQL-form PREFIX/BASE keywords are case-insensitive but also
      // legal local names — only treat one as a directive when the NEXT
      // token actually looks like a directive continuation (a prefix
      // label ending ':' or an IRI opening '<'), so a statement whose
      // object is a bare 'prefix'/'base' is not falsely rejected
      def isKeywordDirectiveAt(i: Int): Boolean =
        (ts(i).equalsIgnoreCase("PREFIX") || ts(i).equalsIgnoreCase("BASE")) &&
          i + 1 < ts.length && (ts(i + 1).endsWith(":") || ts(i + 1).startsWith("<"))
      if (isAtDirective(ts.head) || isKeywordDirectiveAt(0)) {
        // prefix directives carry no shape; local names already drop prefixes
      } else {
        // a directive token mid-statement means the PREVIOUS statement
        // lost its '.' and silently swallowed the directive — the one
        // missing-terminator shape that is detectable without a full
        // grammar (found by the ScalaCheck rejection property)
        if (ts.indices.drop(1).exists(i =>
            isAtDirective(ts(i)) || isKeywordDirectiveAt(i)))
          return Left("unsupported TTL construct: directive inside a " +
            s"statement (missing '.' terminator before it?): ${ts.head}")
        val subj = local(ts.head)
        val s = subjects.getOrElseUpdate(subj, Subject())
        // split the predicate-object list on ';'
        val groups = scala.collection.mutable.ArrayBuffer(
          scala.collection.mutable.ArrayBuffer.empty[String])
        ts.drop(1).foreach {
          case ";" => groups += scala.collection.mutable.ArrayBuffer.empty[String]
          case t => groups.last += t
        }
        for (g <- groups if g.nonEmpty) {
          val pred = if (g.head == "a") "type" else local(g.head)
          val objs = g.drop(1).filterNot(_ == ",")
          if (objs.isEmpty)
            return Left(s"TTL predicate without object: $pred (subject $subj)")
          pred match {
            case "type" => s.kinds ++= objs.map(local)
            case "label" => s.label = s.label.orElse(objs.flatMap(literal).headOption)
            case "domain" => s.domain = Some(local(objs.head))
            case "range" => s.range = Some(local(objs.head))
            case _ => // comments, seeAlso, versionInfo… — not shapes the distiller needs
          }
        }
      }
    }

    val classes = subjects.collect {
      case (name, s) if s.kinds.contains("Class") => TtlClass(name, s.label)
    }.toSeq
    val props = subjects.collect {
      case (name, s) if s.kinds.exists(k =>
          k == "DatatypeProperty" || k == "ObjectProperty" || k == "Property") =>
        TtlProperty(name, s.label, s.domain, s.range,
          s.kinds.contains("ObjectProperty"))
    }.toSeq
    if (classes.isEmpty && props.isEmpty)
      Left("no classes or properties found in TTL")
    else Right(TtlOntology(classes, props))
  }

  /** Render the distillation prompt: normalized ontology + data preview +
    * task, the same three injections the reference's inspector prompt takes
    * (utils.py:352-356: ontology, dataframe_preview, task). */
  def distillPrompt(onto: TtlOntology, profile: String, task: String): String = {
    val cls = onto.classes.map { c =>
      s"  - ${c.name}${c.label.map(l => s" ($l)").getOrElse("")}"
    }.mkString("\n")
    val props = onto.properties.map { p =>
      val kind = if (p.objectProperty) "object" else "datatype"
      val dr = (p.domain, p.range) match {
        case (Some(d), Some(r)) => s": $d -> $r"
        case (Some(d), None) => s": $d ->"
        case (None, Some(r)) => s": -> $r"
        case _ => ""
      }
      s"  - ${p.name}${p.label.map(l => s" ($l)").getOrElse("")}$dr [$kind]"
    }.mkString("\n")
    s"""TASK: $task
       |
       |ONTOLOGY:
       |classes:
       |$cls
       |properties:
       |$props
       |
       |DATAFRAME PREVIEW:
       |$profile
       |
       |Distill the ontology into the per-task YAML data model (containers,
       |links, functions). Only reference functions defined in the ontology —
       |no invented functions. Provide the YAML between ```yaml ``` tags.""".stripMargin
  }

  /** Pull the ```yaml ...``` block out of the distiller response (the prompt
    * contract requires exactly that fencing, default_prompts.yaml:1104). */
  private[lifecycle] def extractYamlBlock(response: String): Either[String, String] = {
    val open = response.indexOf("```yaml")
    if (open < 0) return Left("no ```yaml block in distiller response")
    val start = open + "```yaml".length
    val close = response.indexOf("```", start)
    if (close < 0) Left("unterminated ```yaml block in distiller response")
    else Right(response.substring(start, close).trim)
  }

  /** The full I6 front-end: raw TTL → parsed ontology → distillation prompt
    * → LLM stage → fenced YAML → [[parseYaml]] (which rejects invented
    * helpers against the catalog). Every failure mode is a Left with the
    * stage that rejected it. */
  def distillTtl(llm: Agents.LlmClient, ttl: String, profile: String,
      task: String): Either[String, DataModel] =
    for {
      onto <- parseTtl(ttl)
      yaml <- extractYamlBlock(
        llm.complete("dataframe_inspector", distillPrompt(onto, profile, task)))
      model <- parseYaml(yaml)
    } yield model
}
