package graft.lifecycle

import java.net.{HttpURLConnection, URI}
import java.nio.charset.StandardCharsets

/** Live LLM provider adapter: an OpenAI-compatible chat-completions client
  * behind [[Agents.LlmClient]] — the reference's provider dispatch surface
  * (bambooai/models/__init__.py:121-164; request/response shape
  * models/openai_models.py:126-152). JDK-only HTTP (no added deps),
  * non-streaming, env-keyed:
  *
  *   GRAFT_LLM_API_KEY   bearer key (adapter is inert without it)
  *   GRAFT_LLM_BASE_URL  default https://api.openai.com/v1
  *   GRAFT_LLM_MODEL     default gpt-4o-mini
  *
  * The `stage` name rides along as the system message so one client serves
  * every agent stage, mirroring how the reference binds a prompt template
  * per stage (default_prompts.yaml). AgentsSpec stays fixture-driven via
  * [[Agents.ScriptedLlm]]; HttpLlmSpec exercises this adapter against a
  * local wire-shape stub, so tests never need egress.
  */
final class HttpLlmClient(private[graft] val baseUrl: String,
    apiKey: String, model: String,
    timeoutMs: Int = 60000) extends Agents.LlmClient {

  private def open(stage: String, prompt: String,
      stream: Boolean): HttpURLConnection = {
    val body =
      s"""{"model":${HttpLlm.jsonStr(model)},${if (stream) "\"stream\":true," else ""}"messages":[
         |{"role":"system","content":${HttpLlm.jsonStr(HttpLlm.stagePrompt(stage))}},
         |{"role":"user","content":${HttpLlm.jsonStr(prompt)}}]}""".stripMargin
    HttpLlm.postJson(s"$baseUrl/chat/completions",
      Seq("Authorization" -> s"Bearer $apiKey"), body, timeoutMs)
  }

  override def complete(stage: String, prompt: String): String = {
    val conn = open(stage, prompt, stream = false)
    try {
      val text = HttpLlm.readBody(conn)
      HttpLlm.extractContent(text).getOrElse(
        throw new RuntimeException(
          s"no message content in response: ${graft.plans.Lifecycle.condense(text)}"))
    } finally conn.disconnect()
  }

  /** Streaming completion over the chat-completions SSE wire shape
    * (`"stream":true` → `data: {"choices":[{"delta":{"content":...}}]}`
    * events terminated by `data: [DONE]`) — the reference streams every
    * completion and reports tokens/sec telemetry
    * (bambooai/models/openai_models.py:126-152 delta loop, :241-244 rate).
    * `onDelta` fires per content chunk as it arrives (the UI seam); the
    * returned [[HttpLlm.StreamResult]] carries the assembled text and the
    * measured rate. */
  def completeStreaming(stage: String, prompt: String,
      onDelta: String => Unit = _ => ()): HttpLlm.StreamResult = {
    val t0 = System.nanoTime()
    val conn = open(stage, prompt, stream = true)
    // error events on this wire carry an "error" KEY and no delta content
    // (gateways differ on surrounding fields/whitespace, so no prefix
    // anchoring); a delta whose content TEXT mentions "error" has
    // extractable content and is never treated as a failure. The key's
    // VALUE must be non-null: some OpenAI-compatible gateways emit
    // "error":null on every healthy chunk
    try HttpLlm.ssePump(conn, t0,
      isStop = _ == "[DONE]",
      failOn = p =>
        if (HttpLlm.extractContent(p).isEmpty &&
            HttpLlm.hasNonNullKey(p, "error"))
          Some(graft.plans.Lifecycle.condense(p))
        else None,
      extractDelta = HttpLlm.extractContent,
      onDelta = onDelta)
    finally conn.disconnect()
  }
}

object HttpLlm {

  /** Assembled streaming completion: full text, delta-event count, wall
    * time, and the chunks/sec rate the reference logs as tokens-per-second
    * (openai_models.py:241-244 — the reference counts completion tokens;
    * without a tokenizer dependency the delta count is the same telemetry
    * at chunk granularity). */
  final case class StreamResult(text: String, chunks: Int,
      elapsedSec: Double, chunksPerSec: Double)

  /** Build the client from the environment; None when no key is present, so
    * callers (Demo) fall back to the scripted fixture client. */
  def fromEnv(env: String => Option[String] = sys.env.get): Option[HttpLlmClient] =
    env("GRAFT_LLM_API_KEY").filter(_.nonEmpty).map { key =>
      new HttpLlmClient(
        env("GRAFT_LLM_BASE_URL").getOrElse("https://api.openai.com/v1"),
        key,
        env("GRAFT_LLM_MODEL").getOrElse("gpt-4o-mini"))
    }

  /** POST a JSON body and return the live connection — the connection
    * setup shared by every provider wire (the adapters differ only in
    * URL, headers, and body shape). */
  private[lifecycle] def postJson(url: String, headers: Seq[(String, String)],
      body: String, timeoutMs: Int): HttpURLConnection = {
    val conn = URI.create(url).toURL
      .openConnection().asInstanceOf[HttpURLConnection]
    conn.setConnectTimeout(timeoutMs)
    conn.setReadTimeout(timeoutMs)
    conn.setRequestMethod("POST")
    conn.setRequestProperty("Content-Type", "application/json")
    headers.foreach { case (k, v) => conn.setRequestProperty(k, v) }
    conn.setDoOutput(true)
    conn.getOutputStream.write(body.getBytes(StandardCharsets.UTF_8))
    conn
  }

  /** Drain an SSE stream into a [[StreamResult]] — the pump shared by the
    * provider wires, parameterized only by the three things that differ:
    * the stop sentinel, the mid-stream error shape, and delta extraction.
    * Mid-stream error events arrive AFTER the HTTP 200 is committed (both
    * public wire contracts document them), so `failOn` must throw rather
    * than let the server's close return a silently truncated completion
    * as success. */
  private[lifecycle] def ssePump(conn: HttpURLConnection, t0: Long,
      isStop: String => Boolean, failOn: String => Option[String],
      extractDelta: String => Option[String],
      onDelta: String => Unit): StreamResult = {
    failIfError(conn)
    val reader = new java.io.BufferedReader(
      new java.io.InputStreamReader(conn.getInputStream, StandardCharsets.UTF_8))
    val text = new StringBuilder
    var chunks = 0
    var stopped = false
    var line = reader.readLine()
    while (line != null && !stopped) {
      if (line.startsWith("data:")) {
        val payload = line.stripPrefix("data:").trim
        if (payload.nonEmpty) {
          failOn(payload) match {
            case Some(msg) => throw new RuntimeException(
              s"LLM stream error after ${text.length} chars: $msg")
            case None =>
              // delta before stop: some wires (Gemini) signal the end
              // INSIDE the final content-bearing chunk (finishReason),
              // so a stop-first order would drop the last delta; the
              // sentinel payloads of the other wires carry no delta
              extractDelta(payload).foreach { d =>
                text.append(d); chunks += 1; onDelta(d)
              }
              if (isStop(payload)) stopped = true
          }
        }
      }
      if (!stopped) line = reader.readLine()
    }
    // EOF before the stop sentinel is a truncated stream (proxy idle
    // timeout, server crash) — same silent-truncation failure as an
    // unrecognized error event; both wires ALWAYS terminate a healthy
    // stream with their sentinel
    if (!stopped)
      throw new RuntimeException(
        s"LLM stream ended without stop sentinel after ${text.length} chars")
    val elapsedSec = (System.nanoTime() - t0) / 1e9
    StreamResult(text.toString, chunks, elapsedSec,
      if (elapsedSec > 0) chunks / elapsedSec else 0.0)
  }

  /** JSON string literal with full escaping. */
  def jsonStr(s: String): String = {
    val b = new StringBuilder("\"")
    s.foreach {
      case '"' => b.append("\\\"")
      case '\\' => b.append("\\\\")
      case '\n' => b.append("\\n")
      case '\r' => b.append("\\r")
      case '\t' => b.append("\\t")
      case c if c < 0x20 => b.append(f"\\u${c.toInt}%04x")
      case c => b.append(c)
    }
    b.append('"').toString
  }

  /** Shared HTTP-error guard for the provider adapters. */
  private[lifecycle] def failIfError(conn: HttpURLConnection): Unit = {
    val code = conn.getResponseCode
    if (code >= 400) {
      // getErrorStream is null when the error response has no body — guard
      // so the status code is reported rather than masked by an NPE
      val text = Option(conn.getErrorStream)
        .map(scala.io.Source.fromInputStream(_, "UTF-8").mkString)
        .getOrElse("(no response body)")
      throw new RuntimeException(
        s"LLM HTTP $code: ${graft.plans.Lifecycle.condense(text)}")
    }
  }

  /** Extract choices[0].message.content from a chat-completions response. */
  def extractContent(json: String): Option[String] = extractField(json, "content")

  /** Whether the payload carries `"name"` as a JSON KEY (a quote-wrapped
    * occurrence followed by ':', not preceded by a backslash — an escaped
    * quote means the match sits INSIDE a string value, e.g. the word
    * appearing in streamed content text). Used to recognize error events
    * whose value is an object, which [[extractField]] (string values
    * only) cannot see. */
  private[lifecycle] def hasKey(json: String, name: String): Boolean = {
    val key = "\"" + name + "\""
    var at = json.indexOf(key)
    while (at >= 0) {
      if (at == 0 || json(at - 1) != '\\') {
        var i = at + key.length
        while (i < json.length && json(i).isWhitespace) i += 1
        if (i < json.length && json(i) == ':') return true
      }
      at = json.indexOf(key, at + 1)
    }
    false
  }

  /** [[hasKey]] restricted to keys whose value is not the literal `null`:
    * some OpenAI-compatible gateways stamp `"error":null` on every healthy
    * chunk, which must not read as a stream failure. */
  private[lifecycle] def hasNonNullKey(json: String, name: String): Boolean = {
    val key = "\"" + name + "\""
    var at = json.indexOf(key)
    while (at >= 0) {
      if (at == 0 || json(at - 1) != '\\') {
        var i = at + key.length
        while (i < json.length && json(i).isWhitespace) i += 1
        if (i < json.length && json(i) == ':') {
          i += 1
          while (i < json.length && json(i).isWhitespace) i += 1
          if (!json.startsWith("null", i)) return true
        }
      }
      at = json.indexOf(key, at + 1)
    }
    false
  }

  /** First `"name": "<string>"` pair decoded from a JSON payload; quoted
    * occurrences of `name` that are VALUES rather than keys (no ':'
    * follows), or keys whose value is not a string (e.g. Anthropic's
    * `"content": [...]` block array), are skipped and the scan continues.
    * A purpose-built scanner instead of a JSON dependency (build rules
    * allow none); the response shapes are fixed by the public API
    * contracts of the two wires this module speaks. */
  def extractField(json: String, name: String): Option[String] =
    extractFields(json, name).headOption

  /** ALL `"name": "<string>"` values in payload order — wires whose
    * completion spans several parts (Gemini splits long outputs across
    * `parts` entries) concatenate these; [[extractField]] is the
    * single-value head. Same key-vs-value discipline as documented above. */
  def extractFields(json: String, name: String): Seq[String] = {
    val out = Seq.newBuilder[String]
    val key = "\"" + name + "\""
    var at = json.indexOf(key)
    while (at >= 0) {
      var i = at + key.length
      while (i < json.length && json(i).isWhitespace) i += 1
      if (i < json.length && json(i) == ':') {
        i += 1
        while (i < json.length && json(i).isWhitespace) i += 1
        if (i < json.length && json(i) == '"') {
          i += 1
          val b = new StringBuilder
          while (i < json.length && json(i) != '"') {
            json(i) match {
              case '\\' if i + 1 < json.length =>
                json(i + 1) match {
                  case 'n' => b.append('\n'); i += 2
                  case 'r' => b.append('\r'); i += 2
                  case 't' => b.append('\t'); i += 2
                  case 'u' if i + 5 < json.length =>
                    b.append(Integer.parseInt(json.substring(i + 2, i + 6), 16).toChar)
                    i += 6
                  case c => b.append(c); i += 2
                }
              case c => b.append(c); i += 1
            }
          }
          if (i < json.length) out += b.toString
        }
      }
      at = json.indexOf(key, at + 1)
    }
    out.result()
  }

  /** The per-stage system prompt shared by every provider wire — one
    * definition so the stage contract cannot drift between adapters. */
  private[lifecycle] def stagePrompt(stage: String): String =
    s"You are the $stage stage of a data-analysis agent. " +
      "Respond with exactly the artifact the stage contract requires."

  /** Read a non-streaming response body (after [[failIfError]]). */
  private[lifecycle] def readBody(conn: HttpURLConnection): String = {
    failIfError(conn)
    scala.io.Source.fromInputStream(conn.getInputStream, "UTF-8").mkString
  }
}
