package graft.lifecycle

import java.net.HttpURLConnection

/** Gemini generateContent adapter behind [[Agents.LlmClient]] — the third
  * provider wire the engine speaks natively (the reference ships
  * bambooai/models/gemini_models.py over the google.genai SDK, converting
  * its OpenAI-shaped messages to role/parts Content objects at
  * gemini_models.py:17-63; here the same conversion targets the public
  * REST contract directly, no SDK). Everything below follows the published
  * API shape only:
  *
  *  - POST `{base}/v1beta/models/{model}:generateContent` with an
  *    `x-goog-api-key` header; body carries `system_instruction` (parts),
  *    `contents: [{role:"user", parts:[{text}]}]`, and `generationConfig
  *    .maxOutputTokens`;
  *  - responses carry `candidates[0].content.parts[0].text`;
  *  - streaming swaps the verb for `:streamGenerateContent?alt=sse`: each
  *    SSE data event is a response chunk whose parts carry a text delta,
  *    and the FINAL chunk signals completion inline via `finishReason`
  *    (no separate stop sentinel — the pump extracts that chunk's delta
  *    before stopping on it).
  *
  * Selected per stage via [[LlmConfig]] bindings (`"provider": "gemini"`
  * or `"google"`). JDK-only HTTP through the shared [[HttpLlm.postJson]] /
  * [[HttpLlm.ssePump]] machinery; HttpAdaptersSpec drives both paths
  * against a local wire-shape stub.
  */
final class GeminiLlmClient(baseUrl: String, apiKey: String, model: String,
    maxTokens: Int = 4096, timeoutMs: Int = 60000) extends Agents.LlmClient {

  private def openFor(stage: String, prompt: String,
      stream: Boolean): HttpURLConnection = {
    val body =
      s"""{"system_instruction":{"parts":[{"text":${HttpLlm.jsonStr(HttpLlm.stagePrompt(stage))}}]},
         |"contents":[{"role":"user","parts":[{"text":${HttpLlm.jsonStr(prompt)}}]}],
         |"generationConfig":{"maxOutputTokens":$maxTokens}}""".stripMargin
    val verb =
      if (stream) s"$model:streamGenerateContent?alt=sse"
      else s"$model:generateContent"
    HttpLlm.postJson(s"$baseUrl/v1beta/models/$verb",
      Seq("x-goog-api-key" -> apiKey), body, timeoutMs)
  }

  /** All text parts of a payload, concatenated — long completions span
    * SEVERAL `parts` entries (and streaming chunks may carry more than
    * one), so taking only the first would silently truncate. The request
    * leaves candidateCount at its default of 1, so every text part
    * belongs to the one candidate. */
  private def allText(payload: String): Option[String] = {
    val parts = HttpLlm.extractFields(payload, "text")
    if (parts.isEmpty) None else Some(parts.mkString)
  }

  override def complete(stage: String, prompt: String): String = {
    val conn = openFor(stage, prompt, stream = false)
    try {
      val text = HttpLlm.readBody(conn)
      allText(text).getOrElse(
        throw new RuntimeException(
          s"no text part in response: ${graft.plans.Lifecycle.condense(text)}"))
    } finally conn.disconnect()
  }

  /** Streaming completion; same [[HttpLlm.StreamResult]] telemetry as the
    * other wires. */
  def completeStreaming(stage: String, prompt: String,
      onDelta: String => Unit = _ => ()): HttpLlm.StreamResult = {
    val t0 = System.nanoTime()
    val conn = openFor(stage, prompt, stream = true)
    // the final chunk carries finishReason inline (and often trailing
    // text); error events carry an "error" object and no text part. Only
    // finishReason=STOP is a healthy end: SAFETY / RECITATION /
    // MAX_TOKENS mean the stream was BLOCKED or cut — surfacing the
    // partial text as success would be silent truncation, so those fail
    // like a mid-stream error (failOn runs before the delta extract, so
    // a blocked chunk's trailing text is never appended)
    try HttpLlm.ssePump(conn, t0,
      isStop = p =>
        HttpLlm.extractField(p, "finishReason").contains("STOP"),
      failOn = p => {
        val reason = HttpLlm.extractField(p, "finishReason")
        if (allText(p).isEmpty && HttpLlm.hasKey(p, "error"))
          Some(HttpLlm.extractField(p, "message")
            .getOrElse(graft.plans.Lifecycle.condense(p)))
        else if (reason.exists(_ != "STOP"))
          Some(s"stream blocked: finishReason=${reason.get}")
        else None
      },
      extractDelta = allText,
      onDelta = onDelta)
    finally conn.disconnect()
  }
}
