package graft.lifecycle

import java.nio.file.{Files, Path}
import java.nio.charset.StandardCharsets

/** The `request_user_context` feedback tool (SURVEY §3.1): when a selector
  * agent finds the question ambiguous it can ask the user a clarifying
  * question and block — bounded — on the answer before routing.
  *
  * Reference semantics:
  *  - tool contract: messages/tools_definition.py:155-178
  *    (`query_clarification` + `context_needed` enum);
  *  - wait loop: context_retrieval.py:11-78 — a synchronous channel
  *    (notebook/CLI) answers immediately; web mode polls
  *    `temp/[user/]feedback_<chain>.json` every 2 s for up to 300 s with a
  *    0.5 s initial delay, matches entries on `query_clarification`, deletes
  *    the file after a hit, and falls back to a fixed timeout message;
  *  - loop shape: models/anthropic_models.py:171-228 — the agent is re-called
  *    with the tool result appended until it stops requesting context.
  *
  * The model signals the tool call in the repo's constrained-YAML artifact
  * (the same convention as [[ReAct]] actions), not raw provider tool-use
  * blocks — the loop semantics are what carries over, not the wire format.
  */
object UserContext {

  /** context_retrieval.py:78 — returned verbatim when no feedback arrives. */
  val TimeoutMessage: String =
    "No user feedback received within timeout period. Proceeding with default assumptions."

  /** tools_definition.py:166-175 enum of context kinds. */
  val ContextKinds: Set[String] = Set("clarify_intent", "missing_details",
    "specific_example", "user_preferences", "other")

  final case class Request(queryClarification: String, contextNeeded: String)

  /** A stage output is a tool call iff it carries
    * `tool: request_user_context` plus the required parameters
    * (tools_definition.py:176 `required`). Unknown `context_needed` values
    * coerce to "other" rather than reject — the enum guards prompts, not
    * the runtime. */
  def parseRequest(text: String): Option[Request] = {
    val m = Agents.parseYamlMap(text)
    if (!m.get("tool").contains("request_user_context")) None
    else m.get("query_clarification").filter(_.nonEmpty).map { q =>
      Request(q, m.get("context_needed").filter(ContextKinds)
        .getOrElse("other"))
    }
  }

  /** Delivery seam (output_manager.request_user_feedback). `None` = no
    * answer available on this channel. */
  trait FeedbackChannel {
    def request(req: Request): Option[String]
  }

  /** Notebook/CLI mode: a synchronous callback supplies the answer
    * (output_manager.py:181). */
  final class DirectChannel(f: Request => Option[String])
      extends FeedbackChannel {
    def request(req: Request): Option[String] = f(req)
  }

  /** Web mode: poll `dir/[userId/]feedback_<chainId>.json` — a JSON list of
    * `{"query_clarification": …, "feedback": …}` entries — matching on the
    * exact clarification question (context_retrieval.py:43-76). The sleeper
    * is injectable so tests run the full loop without wall-clock waits. */
  final class PolledFileChannel(dir: Path, chainId: String,
      userId: Option[String] = None,
      timeoutMs: Long = 300000L, pollMs: Long = 2000L,
      initialDelayMs: Long = 500L,
      sleeper: Long => Unit = Thread.sleep)
      extends FeedbackChannel {

    private def feedbackFile: Path =
      userId.fold(dir)(dir.resolve(_)).resolve(s"feedback_$chainId.json")

    def request(req: Request): Option[String] = {
      val deadline = System.nanoTime() + timeoutMs * 1000000L
      var first = true
      while (System.nanoTime() < deadline) {
        if (first) { sleeper(initialDelayMs); first = false }
        val f = feedbackFile
        // read-or-skip: the file can vanish between exists() and the read
        // (web UI rewrites it); the reference logs and keeps polling on any
        // read error (context_retrieval.py:43-76), so swallow and retry
        val content =
          try {
            if (Files.exists(f))
              Some(new String(Files.readAllBytes(f), StandardCharsets.UTF_8))
            else None
          } catch { case _: java.io.IOException => None }
        content.foreach { text =>
          val hit = readEntries(text)
            .collectFirst { case (q, fb) if q == req.queryClarification => fb }
          if (hit.isDefined) {
            try Files.deleteIfExists(f)
            catch { case _: java.io.IOException => () } // ref warns+continues
            return hit
          }
        }
        sleeper(pollMs)
      }
      None
    }
  }

  private val qcField = """"query_clarification"\s*:\s*"((?:[^"\\]|\\.)*)"""".r
  private val fbField = """"feedback"\s*:\s*"((?:[^"\\]|\\.)*)"""".r

  /** Single left-to-right pass over the full JSON escape set: sequential
    * replace() corrupts input where an escaped backslash precedes an
    * escapable char (e.g. `C:\\new`), and a partial escape table would
    * mangle \r/\b/\f/\uXXXX by dropping the backslash. Escapes outside
    * the JSON set keep their two characters intact. */
  private def unescape(s: String): String = {
    val out = new StringBuilder(s.length)
    var i = 0
    while (i < s.length) {
      if (s(i) == '\\' && i + 1 < s.length) {
        s(i + 1) match {
          case 'n' => out += '\n'; i += 2
          case 't' => out += '\t'; i += 2
          case 'r' => out += '\r'; i += 2
          case 'b' => out += '\b'; i += 2
          case 'f' => out += '\f'; i += 2
          case '"' | '\\' | '/' => out += s(i + 1); i += 2
          case 'u' if i + 5 < s.length &&
              s.substring(i + 2, i + 6).forall(c =>
                // ASCII hex only: Character.digit also accepts fullwidth/
                // Arabic-Indic digits, which are not legal JSON escapes
                ('0' <= c && c <= '9') || ('a' <= c && c <= 'f') ||
                  ('A' <= c && c <= 'F')) =>
            out += Integer.parseInt(s.substring(i + 2, i + 6), 16).toChar
            i += 6
          case c => out += '\\'; out += c; i += 2 // unknown: keep the pair
        }
      } else { out += s(i); i += 1 }
    }
    out.toString
  }

  /** (query_clarification, feedback) pairs from the feedback file's JSON
    * list, via the same balanced-brace scan as [[WebSearch]]. Malformed
    * entries are skipped — the reference logs and keeps polling. */
  private[lifecycle] def readEntries(json: String): Seq[(String, String)] =
    try {
      Iterator.unfold(json.indexOf('{')) { at =>
        if (at < 0) None
        else {
          val obj = WebSearch.balancedSlice(json, at)
          Some((obj, json.indexOf('{', at + obj.length)))
        }
      }.flatMap { obj =>
        for {
          q <- qcField.findFirstMatchIn(obj).map(m => unescape(m.group(1)))
          f <- fbField.findFirstMatchIn(obj).map(m => unescape(m.group(1)))
        } yield (q, f)
      }.toSeq
    } catch { case _: IllegalArgumentException => Seq.empty }

  /** One resolved round: channel answer, or the reference's timeout text. */
  def resolve(channel: FeedbackChannel, req: Request): String =
    channel.request(req).getOrElse(TimeoutMessage)

  /** The tool loop (anthropic_models.py:171-228): call the stage; while the
    * output is a `request_user_context` call, resolve feedback and re-call
    * with the tool result appended as a `USER_CONTEXT (<kind>)` line. The
    * reference's loop is unbounded (the model decides when to stop); here a
    * hard cap keeps a misbehaving model from spinning — after it the last
    * response is returned as-is. */
  def completeWithContext(llm: Agents.LlmClient, stage: String,
      prompt: String, channel: Option[FeedbackChannel],
      maxRounds: Int = 3): String = {
    var p = prompt
    var out = llm.complete(stage, p)
    var rounds = 0
    while (rounds < maxRounds) {
      val req = channel.flatMap(c =>
        parseRequest(out).map(r => (c, r)))
      req match {
        case None => return out
        case Some((c, r)) =>
          p += s"\nUSER_CONTEXT (${r.contextNeeded}): ${resolve(c, r)}"
          out = llm.complete(stage, p)
          rounds += 1
      }
    }
    out
  }
}
