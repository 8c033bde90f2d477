package graft.lifecycle

import java.net.{HttpURLConnection, URI}
import java.nio.charset.StandardCharsets

/** Anthropic Messages API adapter behind [[Agents.LlmClient]] — the second
  * provider wire the engine speaks natively (the reference ships one module
  * per provider, bambooai/models/__init__.py:30 + anthropic_models.py; here
  * the zoo is two PUBLIC wire shapes: OpenAI-compatible chat completions
  * in [[HttpLlmClient]], and this one). Everything below follows the
  * published API contract only:
  *
  *  - POST `{base}/v1/messages` with `x-api-key` and `anthropic-version`
  *    headers; body carries model, max_tokens (required), a `system`
  *    string, and `messages: [{role, content}]`;
  *  - non-streaming responses carry content BLOCKS
  *    (`"content":[{"type":"text","text":...}]`) — the first text block is
  *    the completion;
  *  - streaming (`"stream":true`) is SSE: `content_block_delta` events
  *    carry `{"delta":{"type":"text_delta","text":...}}` chunks and a
  *    `message_stop` event terminates the stream.
  *
  * Selected per stage via [[LlmConfig]] bindings (`"provider":
  * "anthropic"`); env keys are shared with [[HttpLlm.fromEnv]]. JDK-only
  * HTTP, no added dependencies; HttpAdaptersSpec drives both the
  * non-streaming and SSE paths against a local wire-shape stub.
  */
final class AnthropicLlmClient(baseUrl: String, apiKey: String, model: String,
    maxTokens: Int = 4096, timeoutMs: Int = 60000) extends Agents.LlmClient {

  private def open(stage: String, prompt: String,
      stream: Boolean): HttpURLConnection = {
    val body =
      s"""{"model":${HttpLlm.jsonStr(model)},"max_tokens":$maxTokens,${if (stream) "\"stream\":true," else ""}
         |"system":${HttpLlm.jsonStr(s"You are the $stage stage of a data-analysis agent. Respond with exactly the artifact the stage contract requires.")},
         |"messages":[{"role":"user","content":${HttpLlm.jsonStr(prompt)}}]}""".stripMargin
    val conn = URI.create(s"$baseUrl/v1/messages").toURL
      .openConnection().asInstanceOf[HttpURLConnection]
    conn.setConnectTimeout(timeoutMs)
    conn.setReadTimeout(timeoutMs)
    conn.setRequestMethod("POST")
    conn.setRequestProperty("Content-Type", "application/json")
    conn.setRequestProperty("x-api-key", apiKey)
    conn.setRequestProperty("anthropic-version", "2023-06-01")
    conn.setDoOutput(true)
    conn.getOutputStream.write(body.getBytes(StandardCharsets.UTF_8))
    conn
  }

  override def complete(stage: String, prompt: String): String = {
    val conn = open(stage, prompt, stream = false)
    try {
      HttpLlm.failIfError(conn)
      val text = scala.io.Source
        .fromInputStream(conn.getInputStream, "UTF-8").mkString
      HttpLlm.extractField(text, "text").getOrElse(
        throw new RuntimeException(
          s"no text content block in response: ${graft.plans.Lifecycle.condense(text)}"))
    } finally conn.disconnect()
  }

  /** Streaming completion over the Messages SSE event shape; same
    * [[HttpLlm.StreamResult]] telemetry as the chat-completions adapter. */
  def completeStreaming(stage: String, prompt: String,
      onDelta: String => Unit = _ => ()): HttpLlm.StreamResult = {
    val t0 = System.nanoTime()
    val conn = open(stage, prompt, stream = true)
    try {
      HttpLlm.failIfError(conn)
      val reader = new java.io.BufferedReader(
        new java.io.InputStreamReader(conn.getInputStream, StandardCharsets.UTF_8))
      val text = new StringBuilder
      var chunks = 0
      var line = reader.readLine()
      while (line != null) {
        val payload = line.stripPrefix("data:").trim
        val eventType =
          if (line.startsWith("data:") && payload.nonEmpty)
            HttpLlm.extractField(payload, "type")
          else None
        if (eventType.contains("message_stop")) line = null
        else {
          if (eventType.contains("content_block_delta"))
            HttpLlm.extractField(payload, "text").foreach { d =>
              text.append(d); chunks += 1; onDelta(d)
            }
          line = reader.readLine()
        }
      }
      val elapsedSec = (System.nanoTime() - t0) / 1e9
      HttpLlm.StreamResult(text.toString, chunks, elapsedSec,
        if (elapsedSec > 0) chunks / elapsedSec else 0.0)
    } finally conn.disconnect()
  }
}
