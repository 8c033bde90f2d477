package graft.lifecycle

/** Per-stage model dispatch — the reference binds each agent stage to its
  * own model/provider via the LLM_CONFIG JSON (`agent_configs`: [{"agent":
  * ..., "details": {"model": ..., "provider": ...}}], LLM_CONFIG_sample.json;
  * resolved per call by models.init(agent) → provider dispatch,
  * bambooai/models/__init__.py:121-164). Here the provider zoo collapses to
  * three PUBLIC wire shapes — the OpenAI-compatible [[HttpLlmClient]]
  * (which reaches most gateways), the Anthropic Messages
  * [[AnthropicLlmClient]], and the Gemini generateContent
  * [[GeminiLlmClient]] — so a binding is (model, provider, base-url,
  * api-key) and dispatch is a stage→client map in front of a default
  * client.
  */
object LlmConfig {

  /** One stage binding. Unset fields inherit the default client's values;
    * `provider` selects the wire shape ("anthropic" → the Messages API,
    * "gemini"/"google" → generateContent, anything else →
    * OpenAI-compatible chat completions, mirroring the reference's
    * per-provider `details.provider` key). */
  final case class Binding(model: String, baseUrl: Option[String] = None,
      apiKey: Option[String] = None, provider: Option[String] = None)

  /** Stage-routing client: stages with a binding go to their own client,
    * everything else to the default — so partial configs behave like the
    * reference, where unconfigured agents fall back to built-in defaults
    * (models/__init__.py:34-60). */
  final class Dispatch(default: Agents.LlmClient,
      bound: Map[String, Agents.LlmClient]) extends Agents.LlmClient {
    def complete(stage: String, prompt: String): String =
      bound.getOrElse(stage, default).complete(stage, prompt)
    def boundStages: Set[String] = bound.keySet
  }

  /** Parse the `agent_configs` JSON shape into stage → Binding. A scanner
    * for the fixed public config contract (same policy as
    * [[HttpLlm.extractContent]]: the build admits no JSON dependency).
    * Key order inside an entry does NOT matter and `details` may contain
    * nested objects — entries are found by balanced-brace scanning, not by
    * a fixed key sequence (JSON key order carries no meaning). Unknown
    * fields are ignored, as the reference ignores fields it doesn't read;
    * an entry naming an agent but no model is skipped (the reference falls
    * back to that provider's default model, models/__init__.py:34-60);
    * structurally broken JSON (unbalanced braces) is rejected loudly. */
  def parse(json: String): Map[String, Binding] = {
    // balanced {...} slice starting at the '{' at `open` (string-aware)
    def slice(open: Int): String = {
      var depth = 0; var i = open; var inStr = false
      while (i < json.length) {
        json(i) match {
          case '\\' if inStr => i += 1
          case '"' => inStr = !inStr
          case '{' if !inStr => depth += 1
          case '}' if !inStr =>
            depth -= 1
            if (depth == 0) return json.substring(open, i + 1)
          case _ =>
        }
        i += 1
      }
      throw new IllegalArgumentException(
        "agent_configs: unbalanced braces from offset " + open)
    }
    def strField(obj: String, name: String): Option[String] =
      ("\"" + name + """"\s*:\s*"([^"]*)"""").r
        .findFirstMatchIn(obj).map(_.group(1))
    // string-aware anchor for an offset: scan up to `pos` tracking the
    // stack of open-'{' offsets and in-string state. A bare lastIndexOf
    // would mis-anchor on a '{' inside a string value that precedes the
    // key (e.g. {"comment":"use {x}","agent":...}); and a match found
    // while inside a string is value text, not a key. Configs are tiny,
    // so the per-match rescan is irrelevant.
    def anchor(pos: Int): (Boolean, Option[Int]) = {
      var i = 0; var inStr = false; var stack = List.empty[Int]
      while (i < pos) {
        json(i) match {
          case '\\' if inStr => i += 1
          case '"' => inStr = !inStr
          case '{' if !inStr => stack ::= i
          case '}' if !inStr => if (stack.nonEmpty) stack = stack.tail
          case _ =>
        }
        i += 1
      }
      (inStr, stack.headOption)
    }
    // every "agent" key marks one entry; its enclosing object is the
    // innermost open '{' at the key's offset
    val agentKey = """"agent"\s*:""".r
    agentKey.findAllMatchIn(json).flatMap { m =>
      val (inStr, top) = anchor(m.start)
      if (inStr) None // "agent" text inside a string value, not a key
      else {
        val open = top.getOrElse(throw new IllegalArgumentException(
          "agent_configs: \"agent\" key outside any object at offset " + m.start))
        val entry = slice(open)
        // same in-string guard for the details key: a value like
        // "note": "\"details\": {" must not anchor the nested slice
        val details = ("""(?s)"details"\s*:\s*\{""").r.findAllMatchIn(entry)
          .find(d => !anchor(open + d.start)._1)
          .map(d => slice(open + d.end - 1)).getOrElse("")
        for {
          agent <- strField(entry, "agent")
          model <- strField(details, "model")
        } yield agent -> Binding(model,
          baseUrl = strField(details, "base_url"),
          apiKey = strField(details, "api_key"),
          provider = strField(details, "provider"))
      }
    }.toMap
  }

  /** Assemble a dispatching client from a parsed config. `mkClient` is the
    * seam tests script; production passes a HttpLlmClient factory. */
  def dispatch(default: Agents.LlmClient, bindings: Map[String, Binding],
      mkClient: Binding => Agents.LlmClient): Dispatch =
    new Dispatch(default, bindings.map { case (stage, b) => stage -> mkClient(b) })

  /** Public default base URL per OpenAI-COMPATIBLE provider name — the
    * reference's full provider-module roster beyond the three distinct
    * wire shapes (models/: deepseek_models.py:19, openrouter_models.py:18,
    * vllm_models.py:17, gemini_models_openai.py:18, ollama_models.py:9;
    * groq/mistral ship the same chat-completions contract on their
    * published endpoints). All of these speak the one chat-completions
    * wire [[HttpLlmClient]] implements — the provider name picks the
    * endpoint, not a new adapter. */
  private[graft] val OpenAiCompatibleBases: Map[String, String] = Map(
    "openai" -> "https://api.openai.com/v1",
    "deepseek" -> "https://api.deepseek.com",
    "groq" -> "https://api.groq.com/openai/v1",
    "mistral" -> "https://api.mistral.ai/v1",
    "openrouter" -> "https://openrouter.ai/api/v1",
    "gemini-openai" -> "https://generativelanguage.googleapis.com/v1beta/openai",
    "ollama" -> "http://localhost:11434/v1",
    "vllm" -> "http://localhost:8000/v1",
    "local" -> "http://localhost:8000/v1")

  /** Environment wiring: GRAFT_LLM_CONFIG holds the agent_configs JSON;
    * per-stage clients inherit the default's base-url/key unless the
    * binding overrides them. Provider routing covers the reference's
    * whole models/ roster: "anthropic" and "gemini"/"google" get their
    * distinct wire adapters (whose endpoints are not the chat-completions
    * base — the /v1 path component belongs to a different contract), and
    * every other known name resolves its PUBLIC default endpoint from
    * [[OpenAiCompatibleBases]] over the shared chat-completions client.
    * None when no default client can be built (no GRAFT_LLM_API_KEY),
    * same inert contract as [[HttpLlm.fromEnv]]. */
  def fromEnv(env: String => Option[String] = sys.env.get): Option[Dispatch] =
    HttpLlm.fromEnv(env).map { default =>
      val base = env("GRAFT_LLM_BASE_URL").getOrElse("https://api.openai.com/v1")
      val key = env("GRAFT_LLM_API_KEY").getOrElse("")
      val bindings = env("GRAFT_LLM_CONFIG").map(parse).getOrElse(Map.empty)
      dispatch(default, bindings, b => mkDefaultClient(b, base, key))
    }

  /** The provider → client routing shared by [[fromEnv]] and tests. */
  private[graft] def mkDefaultClient(b: Binding, base: String,
      key: String): Agents.LlmClient =
    if (b.provider.contains("anthropic"))
      new AnthropicLlmClient(
        b.baseUrl.getOrElse("https://api.anthropic.com"),
        b.apiKey.getOrElse(key), b.model)
    else if (b.provider.exists(p => p == "gemini" || p == "google"))
      new GeminiLlmClient(
        b.baseUrl.getOrElse("https://generativelanguage.googleapis.com"),
        b.apiKey.getOrElse(key), b.model)
    else new HttpLlmClient(
      b.baseUrl.orElse(b.provider.flatMap(OpenAiCompatibleBases.get))
        .getOrElse(base),
      b.apiKey.getOrElse(key), b.model)
}
