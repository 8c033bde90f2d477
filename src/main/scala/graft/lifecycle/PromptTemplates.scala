package graft.lifecycle

/** The code-generator prompt assembly layer (SURVEY §3.1): 4 user templates
  * × 2 formatting styles (xml/text) selected per model — re-expressing
  * bambooai/template_formatting.py:3-172 verbatim mechanics:
  *
  *  - style lookup per model with "text" default (:19-23);
  *  - section formatting (:25-51): empty content → empty string; plan/model/
  *    context sections wrap in ```yaml fences; xml style tags the section
  *    `<section_name>`, text style headers it `SECTION NAME:`;
  *  - template selection (:53-63): plan templates only when planning is on
  *    AND the model is not a reasoning model (those plan internally);
  *    analyst "Data Analyst DF" → df templates, anything else → gen;
  *  - positional `{}` fill with a hard argument-count check (:160-170) —
  *    11/11/8/7 args in the reference's documented orders (:101-155).
  *
  * The default template bodies are Spark-first (the generator emits Spark
  * SQL against registered views, not a pandas script) but keep the
  * reference's placeholder counts and section order, so reference-shaped
  * template files drop in unchanged (templates are data, not code —
  * PROMPT_TEMPLATES_sample.yaml / default_prompts.yaml:1925-2097). The
  * "Python/Pandas/Plotly Version" section labels are the reference's wire
  * contract; the engine passes its Scala/Spark/plot-spec versions through
  * the same three slots.
  */
object PromptTemplates {

  val DfPlan = "code_generator_user_df_plan"
  val DfNoPlan = "code_generator_user_df_no_plan"
  val GenPlan = "code_generator_user_gen_plan"
  val GenNoPlan = "code_generator_user_gen_no_plan"

  /** generate_prompt's parameter list (template_formatting.py:65-68). */
  final case class Params(
      analyst: String,
      planning: Boolean,
      model: String,
      reasoningModels: Seq[String] = Nil,
      generatedDatasetsPath: String = "",
      planOrContext: String = "",
      dataframeHead: String = "",
      auxiliaryDatasets: String = "",
      dataModel: String = "",
      task: String = "",
      pythonVersion: String = "",
      pandasVersion: String = "",
      plotlyVersion: String = "",
      previousResults: String = "",
      exampleCode: String = "")

  final class CodeGenPromptGenerator(templates: Map[String, String],
      modelFormatting: Map[String, String] = Map.empty) {

    /** get_formatting_style (:19-23): per-model, "text" when unbound. */
    def formattingStyle(model: String): String =
      modelFormatting.getOrElse(model, "text")

    /** format_section (:25-51). */
    def formatSection(content: String, style: String,
        sectionName: String): String = {
      if (content == null || content.isEmpty) ""
      else {
        val lower = sectionName.toLowerCase
        val needsYaml = Seq("plan", "model", "context").exists(lower.contains)
        val fenced =
          if (needsYaml && content.trim.nonEmpty)
            s"```yaml\n$content\n```"
          else content
        if (style == "xml") {
          val tag = lower.replace(' ', '_')
          s"<$tag>\n$fenced\n</$tag>"
        } else s"${sectionName.toUpperCase}:\n$fenced"
      }
    }

    /** select_template (:53-63). */
    def selectTemplate(analyst: String, planning: Boolean, model: String,
        reasoningModels: Seq[String]): String = {
      val usePlan = planning && !reasoningModels.contains(model)
      if (analyst == "Data Analyst DF") { if (usePlan) DfPlan else DfNoPlan }
      else { if (usePlan) GenPlan else GenNoPlan }
    }

    /** Positional `{}` fill with the reference's count guard (:160-170).
      * Split-then-interleave, like str.format: substituted arguments are
      * never re-scanned for placeholders. */
    private[lifecycle] def fill(templateName: String, template: String,
        args: Seq[String]): String = {
      val parts = template.split(java.util.regex.Pattern.quote("{}"), -1)
      val placeholders = parts.length - 1
      require(placeholders == args.length,
        s"Argument count mismatch for template '$templateName'. " +
          s"Expected $placeholders placeholders, but got ${args.length} arguments.")
      parts.head + args.zip(parts.tail).map { case (a, p) => a + p }.mkString
    }

    /** generate_prompt (:65-172): style → template → section formatting →
      * positional assembly in the per-template argument order. */
    def generatePrompt(p: Params): String = {
      val style = formattingStyle(p.model)
      val name = selectTemplate(p.analyst, p.planning, p.model,
        p.reasoningModels)
      val usePlan = p.planning && !p.reasoningModels.contains(p.model)

      val pathInstruction =
        if (p.generatedDatasetsPath.nonEmpty)
          s"${p.generatedDatasetsPath}/<descriptive_name>.csv"
        else ""

      val planOrContext = formatSection(p.planOrContext, style,
        if (usePlan) "Plan" else "Context")
      val dataframe = formatSection(p.dataframeHead, style, "DataFrame")
      val aux = formatSection(p.auxiliaryDatasets, style, "Auxiliary Datasets")
      val pathSec = formatSection(pathInstruction, style,
        "Generated Datasets Path Instruction")
      val dataModel = formatSection(p.dataModel, style,
        "Data Model and Helper Functions")
      val task = formatSection(p.task, style, "Task")
      val pyV = formatSection(p.pythonVersion, style, "Python Version")
      val pdV = formatSection(p.pandasVersion, style, "Pandas Version")
      val plV = formatSection(p.plotlyVersion, style, "Plotly Version")
      val prev = formatSection(p.previousResults, style, "Previous Results")
      val example = formatSection(p.exampleCode, style, "Example Code")

      val args: Seq[String] = name match {
        case DfPlan | DfNoPlan => // 11 args (:101-131)
          Seq(planOrContext, dataframe, aux, pathSec, dataModel, task,
            pyV, pdV, plV, prev, example)
        case GenPlan => // 8 args (:132-143)
          Seq(pyV, pdV, plV, planOrContext, task, prev, example, pathSec)
        case GenNoPlan => // 7 args (:144-155)
          Seq(pyV, pdV, plV, task, prev, example, pathSec)
        case other =>
          throw new IllegalArgumentException(s"unhandled template: $other")
      }
      fill(name, templates.getOrElse(name,
        throw new NoSuchElementException(s"no template named $name")), args)
    }
  }

  /** Spark-first default bodies: same slot counts and order as the
    * reference's yaml (11/11/8/7), instructing Spark SQL over registered
    * views instead of a pandas script. */
  val SparkDefaults: Map[String, String] = Map(
    DfPlan ->
      """Your objective is to implement the provided analysis plan against the registered Spark view `df`.
        |
        |Here is the structured analysis plan, or extra context if no plan is provided:
        |
        |{}
        |
        |A preview of the primary table:
        |
        |{}
        |
        |Auxiliary datasets available as additional registered views:
        |
        |{}
        |
        |If the result should be persisted, write it with this exact path format:
        |
        |{}
        |
        |Incorporate this data model and these helper functions fully:
        |
        |{}
        |
        |The specific task to accomplish:
        |
        |{}
        |
        |Version specifications to adhere to:
        |
        |{}
        |
        |{}
        |
        |{}
        |
        |Results from previous tasks for additional context:
        |
        |{}
        |
        |Respond with a single complete Spark SQL statement inside ```sql ``` tags. Query only the registered views; do not load data.
        |
        |{}
        |
        |Remember: do not omit any part of the query for brevity.""".stripMargin,
    DfNoPlan ->
      """Your objective is to solve the user's task against the registered Spark view `df`.
        |
        |Extra context for the task:
        |
        |{}
        |
        |A preview of the primary table:
        |
        |{}
        |
        |Auxiliary datasets available as additional registered views:
        |
        |{}
        |
        |If the result should be persisted, write it with this exact path format:
        |
        |{}
        |
        |Incorporate this data model and these helper functions fully:
        |
        |{}
        |
        |The specific task to accomplish:
        |
        |{}
        |
        |Version specifications to adhere to:
        |
        |{}
        |
        |{}
        |
        |{}
        |
        |Results from previous tasks for additional context:
        |
        |{}
        |
        |Respond with a single complete Spark SQL statement inside ```sql ``` tags. Query only the registered views; do not load data.
        |
        |{}
        |
        |Remember: do not omit any part of the query for brevity.""".stripMargin,
    GenPlan ->
      """You are solving a general analysis task with Spark SQL.
        |
        |Version specifications to adhere to:
        |
        |{}
        |
        |{}
        |
        |{}
        |
        |The analysis plan to implement:
        |
        |{}
        |
        |The specific task to accomplish:
        |
        |{}
        |
        |Results from previous tasks for additional context:
        |
        |{}
        |
        |{}
        |
        |If the result should be persisted, write it with this exact path format:
        |
        |{}""".stripMargin,
    GenNoPlan ->
      """You are solving a general analysis task with Spark SQL.
        |
        |Version specifications to adhere to:
        |
        |{}
        |
        |{}
        |
        |{}
        |
        |The specific task to accomplish:
        |
        |{}
        |
        |Results from previous tasks for additional context:
        |
        |{}
        |
        |{}
        |
        |If the result should be persisted, write it with this exact path format:
        |
        |{}""".stripMargin)
}
