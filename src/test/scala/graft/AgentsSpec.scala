package graft

import graft.lifecycle.{Agents, EngineSession, SessionStore}
import graft.functions.ScalarExtras

class AgentsSpec extends SparkSpec {

  private def fixtures(badFirst: Boolean) = Map(
    "expert_selector" -> Seq(
      "requires_dataset: true\nexpert: Data Analyst\nconfidence: 9"),
    "analyst_selector" -> Seq(
      "analyst: Data Analyst DF\nintent: count orders per month of 1995"),
    "planner" -> Seq(
      (if (badFirst)
        "plan:\n- bucket by month\nsql: SELECT month_of(o_orderdate) FROM orders"
      else
        "plan:\n- filter 1995\n- bucket by month\nsql: |\n" +
          "SELECT date_trunc('month', o_orderdate) AS month, count(*) AS n " +
          "FROM orders WHERE year(o_orderdate) = 1995 GROUP BY 1 ORDER BY 1")),
    "error_corrector" -> Seq(
      "SELECT date_trunc('month', o_orderdate) AS month, count(*) AS n " +
        "FROM orders WHERE year(o_orderdate) = 1995 GROUP BY 1 ORDER BY 1"),
    "summarizer" -> Seq("Orders peaked mid-1995."))

  private def session(): EngineSession = {
    val es = new EngineSession(spark)
    es.bind("orders", Tables.load(spark, sf, "orders"))
    es
  }

  test("e2e chain: route -> plan -> SQL -> result -> summary (no repair)") {
    val r = Agents.converse(session(), new Agents.ScriptedLlm(fixtures(false)),
      "How many orders per month in 1995?", "orders")
    assert(r.expert.requiresDataset && r.expert.confidence == 9)
    assert(r.analyst.intent.nonEmpty && r.plan.steps.length == 2)
    assert(r.repair.df.nonEmpty && r.repair.attempts == 0)
    assert(r.repair.df.get.count() == 12)
    assert(r.summary.contains("Orders peaked mid-1995."))
  }

  test("e2e chain: invalid SQL goes through the repair loop once") {
    val r = Agents.converse(session(), new Agents.ScriptedLlm(fixtures(true)),
      "How many orders per month in 1995?", "orders")
    assert(r.repair.attempts == 1 && r.repair.df.nonEmpty)
    assert(r.repair.errors.head.toLowerCase.contains("month_of"))
    assert(r.repair.df.get.count() == 12)
  }

  test("yaml plan parsing: steps list + block sql") {
    val p = Agents.parsePlan("plan:\n- a\n- b\nsql: |\nSELECT 1")
    assert(p.steps == Seq("a", "b") && p.sql == "SELECT 1")
  }

  test("mermaid data-model rendering (I7 shape)") {
    val m = Agents.mermaid(
      Seq(Agents.ModelNode("orders", Seq("o_orderkey", "o_custkey")),
        Agents.ModelNode("customer", Seq("c_custkey"))),
      Seq(Agents.ModelEdge("orders", "customer", "o_custkey=c_custkey")))
    assert(m.startsWith("graph TD") &&
      m.contains("orders -->|o_custkey=c_custkey| customer"))
  }

  test("session store: window eviction + save/restore roundtrip") {
    val store = new SessionStore(java.nio.file.Paths.get("target/test_sessions"))
    store.append("t1", "system", "sys prompt")
    (1 to 12).foreach { i =>
      store.append("t1", "user", s"q$i\nwith \"quotes\"")
      store.append("t1", "assistant", s"a$i")
    }
    val msgs = store.messages("t1")
    assert(msgs.count(_.role == "system") == 1)
    assert(msgs.count(_.role != "system") == 2 * store.MaxConversations - 1)
    store.save("t1")
    val store2 = new SessionStore(java.nio.file.Paths.get("target/test_sessions"))
    assert(store2.restore("t1") == msgs.length)
    assert(store2.messages("t1") == msgs)
  }

  test("session store roundtrip: backslash-adjacent escapes and controls") {
    val store = new SessionStore(java.nio.file.Paths.get("target/test_sessions"))
    // literal backslash followed by 'n' — the case sequential replace corrupts
    val tricky = Seq(
      "path C:\\new\\table", "ends with backslash \\", "\\n literal",
      "tab\there\u0001ctl", "quote \" and \\\" pair", "\\\\double\\\\")
    tricky.zipWithIndex.foreach { case (s, i) =>
      store.append("esc", s"role$i", s)
    }
    store.save("esc")
    val store2 = new SessionStore(java.nio.file.Paths.get("target/test_sessions"))
    assert(store2.restore("esc") == tricky.length)
    assert(store2.messages("esc").map(_.content) == tricky)
  }

  test("F14 calculator evaluates through Catalyst, no code path") {
    assert(ScalarExtras.calculate(spark, "2 * (3 + 4)") == Right(14.0))
    assert(ScalarExtras.calculate(spark, "pow(2, 10)") == Right(1024.0))
    assert(ScalarExtras.calculate(spark, "drop table x").isLeft)
  }

  test("F7/F8 normalize + wrap + truncate") {
    assert(ScalarExtras.asciiNormalize("café déjà") == "cafe deja")
    assert(ScalarExtras.wrap("a bb ccc dddd", 5) == Seq("a bb", "ccc", "dddd"))
    assert(ScalarExtras.truncateLabel("x" * 50).length == 40)
  }
}
