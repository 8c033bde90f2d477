package graft

import org.apache.spark.sql.SparkSession
import graft.lifecycle.{Agents, EngineSession, SessionStore}
import graft.operators.Profile

/** Runnable end-to-end conversational chain (SURVEY §3.1 in Spark shape):
  * register the corpus → profile → route → plan → validated SQL → bounded
  * repair → summarize → persist the thread. The LLM is the scripted fixture
  * client (deterministic); swap in a live [[Agents.LlmClient]] to deploy.
  * Usage: runMain graft.Demo [sfDir]
  */
object Demo {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val es = new EngineSession(spark)
    Tables.all.foreach(n => es.bind(n, Tables.load(spark, sfDir, n)))

    // scripted agent transcript: first SQL is wrong on purpose to show the
    // bounded repair loop (bambooai.py:760-816) doing its job. With
    // GRAFT_LLM_API_KEY set, the live OpenAI-compatible adapter replaces it
    // and the chain runs against the real provider.
    val scripted = new Agents.ScriptedLlm(Map(
      "expert_selector" -> Seq(
        "requires_dataset: true\nexpert: Data Analyst\nconfidence: 9"),
      "analyst_selector" -> Seq(
        "analyst: Data Analyst DF\nintent: orders per month of 1995 with busiest month"),
      "planner" -> Seq(
        "plan:\n- filter year 1995\n- bucket by month\n- count\nsql: |\n" +
          "SELECT month_of(o_orderdate) AS month, count(*) AS n FROM orders GROUP BY 1"),
      "error_corrector" -> Seq(
        "SELECT date_trunc('month', o_orderdate) AS month, count(*) AS n " +
          "FROM orders WHERE year(o_orderdate) = 1995 GROUP BY 1 ORDER BY 1"),
      "summarizer" -> Seq(
        "1995 orders are spread across all 12 months; the busiest month tops ~120 orders.")))
    val llm = graft.lifecycle.HttpLlm.fromEnv() match {
      case Some(live) => println("llm      : live (OpenAI-compatible)"); live
      case None => scripted
    }

    val question = "How many orders per month were placed in 1995?"
    val r = Agents.converse(es, llm, question, "orders")

    println(s"question : $question")
    println(s"expert   : ${r.expert.expert} (confidence ${r.expert.confidence})")
    println(s"intent   : ${r.analyst.intent}")
    println(s"plan     : ${r.plan.steps.mkString(" -> ")}")
    println(s"repairs  : ${r.repair.attempts} (errors seen: ${r.repair.errors.size})")
    r.repair.df.foreach { df =>
      println("result   :")
      println(Profile.renderTable(df.limit(12)))
    }
    println(s"summary  : ${r.summary.getOrElse("<none>")}")

    val store = new SessionStore(java.nio.file.Paths.get("target/demo_sessions"))
    store.append("demo", "user", question)
    r.summary.foreach(s => store.append("demo", "assistant", s))
    println(s"persisted: ${store.save("demo")}")
    spark.stop()
  }
}
