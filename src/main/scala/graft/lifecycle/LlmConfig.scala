package graft.lifecycle

/** Per-stage model dispatch — the reference binds each agent stage to its
  * own model/provider via the LLM_CONFIG JSON (`agent_configs`: [{"agent":
  * ..., "details": {"model": ..., "provider": ...}}], LLM_CONFIG_sample.json;
  * resolved per call by models.init(agent) → provider dispatch,
  * bambooai/models/__init__.py:121-164). Here the provider zoo collapses to
  * the OpenAI-compatible [[HttpLlmClient]] — one wire shape reaches most
  * public endpoints — so a binding is (model, base-url, api-key) and
  * dispatch is a stage→client map in front of a default client.
  */
object LlmConfig {

  /** One stage binding. Unset fields inherit the default client's values. */
  final case class Binding(model: String, baseUrl: Option[String] = None,
      apiKey: Option[String] = None)

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
    * [[HttpLlm.extractContent]]: the build admits no JSON dependency, and
    * the shape is flat objects with string/number fields). Unknown fields
    * are ignored, as the reference ignores fields it doesn't read; an
    * object without "agent" and "model" is skipped. */
  def parse(json: String): Map[String, Binding] = {
    val entry = """(?s)\{\s*"agent"\s*:\s*"([^"]+)"\s*,\s*"details"\s*:\s*\{(.*?)\}""".r
    def field(details: String, name: String): Option[String] =
      ("\"" + name + """"\s*:\s*"([^"]*)"""").r
        .findFirstMatchIn(details).map(_.group(1))
    entry.findAllMatchIn(json).flatMap { m =>
      val details = m.group(2)
      field(details, "model").map { model =>
        m.group(1) -> Binding(model,
          baseUrl = field(details, "base_url"),
          apiKey = field(details, "api_key"))
      }
    }.toMap
  }

  /** Assemble a dispatching client from a parsed config. `mkClient` is the
    * seam tests script; production passes a HttpLlmClient factory. */
  def dispatch(default: Agents.LlmClient, bindings: Map[String, Binding],
      mkClient: Binding => Agents.LlmClient): Dispatch =
    new Dispatch(default, bindings.map { case (stage, b) => stage -> mkClient(b) })

  /** Environment wiring: GRAFT_LLM_CONFIG holds the agent_configs JSON;
    * per-stage clients inherit the default's base-url/key unless the
    * binding overrides them. None when no default client can be built
    * (no GRAFT_LLM_API_KEY), same inert contract as [[HttpLlm.fromEnv]]. */
  def fromEnv(env: String => Option[String] = sys.env.get): Option[Dispatch] =
    HttpLlm.fromEnv(env).map { default =>
      val base = env("GRAFT_LLM_BASE_URL").getOrElse("https://api.openai.com/v1")
      val key = env("GRAFT_LLM_API_KEY").getOrElse("")
      val bindings = env("GRAFT_LLM_CONFIG").map(parse).getOrElse(Map.empty)
      dispatch(default, bindings, b => new HttpLlmClient(
        b.baseUrl.getOrElse(base), b.apiKey.getOrElse(key), b.model))
    }
}
