package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.lifecycle.PromptTemplates
import graft.lifecycle.PromptTemplates.{CodeGenPromptGenerator, Params}

/** Golden tests for the prompt assembly layer against the reference's
  * documented mechanics (template_formatting.py:3-172). */
class PromptTemplatesSpec extends AnyFunSuite {

  private val gen = new CodeGenPromptGenerator(PromptTemplates.SparkDefaults,
    modelFormatting = Map("xml-model" -> "xml"))

  test("formatting style: per-model lookup, text default (:19-23)") {
    assert(gen.formattingStyle("xml-model") == "xml")
    assert(gen.formattingStyle("anything-else") == "text")
  }

  test("section formatting goldens (:25-51)") {
    // empty content vanishes entirely
    assert(gen.formatSection("", "xml", "Plan") == "")
    assert(gen.formatSection(null, "text", "Plan") == "")
    // plan/model/context sections get a yaml fence; others do not
    assert(gen.formatSection("- step one", "xml", "Plan") ==
      "<plan>\n```yaml\n- step one\n```\n</plan>")
    assert(gen.formatSection("- step one", "text", "Plan") ==
      "PLAN:\n```yaml\n- step one\n```")
    assert(gen.formatSection("x: 1", "xml", "Data Model and Helper Functions") ==
      "<data_model_and_helper_functions>\n```yaml\nx: 1\n```\n</data_model_and_helper_functions>")
    assert(gen.formatSection("col: int", "xml", "DataFrame") ==
      "<dataframe>\ncol: int\n</dataframe>")
    assert(gen.formatSection("col: int", "text", "Auxiliary Datasets") ==
      "AUXILIARY DATASETS:\ncol: int")
  }

  test("template selection matrix (:53-63)") {
    val reasoning = Seq("deep-thinker")
    def sel(analyst: String, planning: Boolean, model: String) =
      gen.selectTemplate(analyst, planning, model, reasoning)
    assert(sel("Data Analyst DF", true, "m") == PromptTemplates.DfPlan)
    assert(sel("Data Analyst DF", false, "m") == PromptTemplates.DfNoPlan)
    // reasoning models never take the plan template even when planning
    assert(sel("Data Analyst DF", true, "deep-thinker") ==
      PromptTemplates.DfNoPlan)
    assert(sel("Data Analyst Generic", true, "m") == PromptTemplates.GenPlan)
    assert(sel("Data Analyst Generic", false, "m") == PromptTemplates.GenNoPlan)
    assert(sel("Data Analyst Generic", true, "deep-thinker") ==
      PromptTemplates.GenNoPlan)
  }

  test("default bodies keep the reference placeholder counts 11/11/8/7") {
    def n(t: String) = PromptTemplates.SparkDefaults(t)
      .split(java.util.regex.Pattern.quote("{}"), -1).length - 1
    assert(n(PromptTemplates.DfPlan) == 11)
    assert(n(PromptTemplates.DfNoPlan) == 11)
    assert(n(PromptTemplates.GenPlan) == 8)
    assert(n(PromptTemplates.GenNoPlan) == 7)
  }

  test("assembly golden: reference-shaped df_plan fixture, xml style (:101-115)") {
    // a miniature template with the df argument ORDER of the reference
    val tiny = Map(PromptTemplates.DfPlan ->
      "P={}\nD={}\nA={}\nG={}\nM={}\nT={}\nV1={}\nV2={}\nV3={}\nR={}\nE={}")
    val g = new CodeGenPromptGenerator(tiny, Map("xm" -> "xml"))
    val out = g.generatePrompt(Params(
      analyst = "Data Analyst DF", planning = true, model = "xm",
      reasoningModels = Seq("other"),
      generatedDatasetsPath = "out/results",
      planOrContext = "- filter year\n- aggregate",
      dataframeHead = "o_orderdate: date",
      auxiliaryDatasets = "aux1",
      dataModel = "orders: [o_orderkey]",
      task = "count orders per month",
      pythonVersion = "Scala 2.13", pandasVersion = "Spark 4.1",
      plotlyVersion = "plot-spec 1",
      previousResults = "12 rows", exampleCode = "SELECT 1"))
    assert(out ==
      "P=<plan>\n```yaml\n- filter year\n- aggregate\n```\n</plan>\n" +
        "D=<dataframe>\no_orderdate: date\n</dataframe>\n" +
        "A=<auxiliary_datasets>\naux1\n</auxiliary_datasets>\n" +
        "G=<generated_datasets_path_instruction>\nout/results/<descriptive_name>.csv\n</generated_datasets_path_instruction>\n" +
        "M=<data_model_and_helper_functions>\n```yaml\norders: [o_orderkey]\n```\n</data_model_and_helper_functions>\n" +
        "T=<task>\ncount orders per month\n</task>\n" +
        "V1=<python_version>\nScala 2.13\n</python_version>\n" +
        "V2=<pandas_version>\nSpark 4.1\n</pandas_version>\n" +
        "V3=<plotly_version>\nplot-spec 1\n</plotly_version>\n" +
        "R=<previous_results>\n12 rows\n</previous_results>\n" +
        "E=<example_code>\nSELECT 1\n</example_code>")
  }

  test("assembly golden: gen_plan argument order starts with versions (:132-143)") {
    val tiny = Map(PromptTemplates.GenPlan ->
      "1={}|2={}|3={}|4={}|5={}|6={}|7={}|8={}")
    val g = new CodeGenPromptGenerator(tiny)
    val out = g.generatePrompt(Params(
      analyst = "Data Analyst Generic", planning = true, model = "m",
      planOrContext = "the plan", task = "the task",
      pythonVersion = "v1", pandasVersion = "v2", plotlyVersion = "v3",
      previousResults = "prev", exampleCode = "ex",
      generatedDatasetsPath = "p"))
    assert(out ==
      "1=PYTHON VERSION:\nv1|2=PANDAS VERSION:\nv2|3=PLOTLY VERSION:\nv3" +
        "|4=PLAN:\n```yaml\nthe plan\n```|5=TASK:\nthe task" +
        "|6=PREVIOUS RESULTS:\nprev|7=EXAMPLE CODE:\nex" +
        "|8=GENERATED DATASETS PATH INSTRUCTION:\np/<descriptive_name>.csv")
  }

  test("empty sections leave empty slots, and no-path means no instruction (:77)") {
    val tiny = Map(PromptTemplates.GenNoPlan -> "[{}][{}][{}][{}][{}][{}][{}]")
    val g = new CodeGenPromptGenerator(tiny)
    val out = g.generatePrompt(Params(
      analyst = "Data Analyst Generic", planning = false, model = "m",
      task = "t"))
    assert(out == "[][][][TASK:\nt][][][]")
  }

  test("argument-count mismatch raises the reference's guard (:160-170)") {
    val bad = Map(PromptTemplates.DfNoPlan -> "only {} two {}")
    val g = new CodeGenPromptGenerator(bad)
    val e = intercept[IllegalArgumentException] {
      g.generatePrompt(Params(analyst = "Data Analyst DF", planning = false,
        model = "m", task = "t"))
    }
    assert(e.getMessage.contains("Argument count mismatch"))
    intercept[NoSuchElementException] {
      g.generatePrompt(Params(analyst = "Data Analyst Generic",
        planning = false, model = "m"))
    }
  }

  test("regex-hostile content survives the positional fill") {
    val tiny = Map(PromptTemplates.GenNoPlan -> "[{}][{}][{}][{}][{}][{}][{}]")
    val g = new CodeGenPromptGenerator(tiny)
    val out = g.generatePrompt(Params(
      analyst = "Data Analyst Generic", planning = false, model = "m",
      task = """price > $100 \ {braces} ${var}"""))
    assert(out.contains("""price > $100 \ {braces} ${var}"""))
  }
}
