package graft

import graft.lifecycle.{Agents, EngineSession, EpisodicMemory}

class EpisodicSpec extends SparkSpec {
  import EpisodicMemory._

  private def mem() = new EpisodicMemory(spark)

  test("retrieve: below 0.80 similarity returns nothing") {
    val m = mem()
    m.add(Record("r1", "count orders per month in 1995", "orders table",
      "- bucket", "SELECT 1", 8))
    assert(m.retrieve("embedding cosine nearest neighbours").isEmpty)
    assert(m.retrieve("count orders per month in 1995").nonEmpty)
  }

  test("retrieve: rerank by data description among qualifiers") {
    val m = mem()
    m.add(Record("a", "monthly order counts analysis", "wellness daily data",
      "- p", "SELECT 'a'", 8))
    // dissimilar vector space entry that still shares the intent words
    m.add(Record("b", "monthly order counts analysis detail", "orders lineitem revenue",
      "- p", "SELECT 'b'", 8))
    val hit = m.retrieve("monthly order counts analysis", "orders lineitem revenue")
    assert(hit.nonEmpty && hit.get.record.sql == "SELECT 'b'")
  }

  test("store: rank below 6 is dropped; equal-rank duplicate discarded; higher rank replaces") {
    val m = mem()
    m.add(Record("low", "intent x", "", "- p", "SELECT 1", 5))
    assert(m.size == 0)
    m.add(Record("first", "count orders per month", "", "- p", "SELECT 1", 7))
    assert(m.size == 1)
    m.add(Record("dup", "count orders per month", "", "- p", "SELECT 2", 7))
    assert(m.size == 1) // same intent, same rank → discarded
    m.add(Record("better", "count orders per month", "", "- p", "SELECT 3", 9))
    assert(m.size == 1) // replaced, not appended
    assert(m.retrieve("count orders per month").get.record.rank == 9)
  }

  test("fast path parity: local and Spark decisions agree on every branch") {
    val m = mem()
    // seed a store exercising near-dup and distinct regions
    Seq("count orders per month", "revenue by brand per quarter",
      "top suppliers by volume", "average discount per segment",
      "customer churn by nation").zipWithIndex.foreach { case (t, i) =>
      m.add(Record(s"s$i", t, "", "- p", s"SELECT $i", 7))
    }
    assert(m.size == 5)
    val emb = new HashEmbedder()
    // candidates covering: exact dup lower rank (discard), exact dup higher
    // rank (replace), and an unmatched intent (insert)
    val cases = Seq(
      ("count orders per month", 6L),   // sim 1.0, rank 6 < 7 → discard
      ("count orders per month", 9L),   // sim 1.0, rank 9 > 7 → replace
      ("lineitem shipping delays", 8L)) // no ≥0.94 match → insert
    cases.foreach { case (intent, rank) =>
      val v = emb.embed(intent)
      assert(m.decideLocal(rank, v) == m.decideSpark(rank, v),
        s"paths diverge for ($intent, $rank)")
    }
    // and the public API (driver path at this size) lands the same state
    m.add(Record("c1", "count orders per month", "", "- p", "SELECT 'hi'", 9))
    assert(m.size == 5 && m.retrieve("count orders per month").get.record.rank == 9)
    m.add(Record("c2", "lineitem shipping delays", "", "- p", "SELECT 'n'", 8))
    assert(m.size == 6)
  }

  test("fast path parity: borderline non-identical near-dup (LSH recall caveat)") {
    // the r6 parity matrix only covered sim 1.0 and no-match, where banding
    // cannot miss; this pins a genuinely borderline 0.94 < sim < 1.0 pair,
    // where a band miss WOULD diverge the paths (insert vs replace/discard)
    val m = mem()
    val emb = new HashEmbedder()
    val base = "alpha bravo charlie delta echo foxtrot golf hotel india " +
      "juliet kilo lima mike november oscar papa"
    val variant = base + " quebec"
    def cosine(a: Seq[Double], b: Seq[Double]): Double =
      a.zip(b).map { case (x, y) => x * y }.sum /
        (math.sqrt(a.map(x => x * x).sum) * math.sqrt(b.map(x => x * x).sum))
    val sim = cosine(emb.embed(base), emb.embed(variant))
    assert(sim > 0.94 && sim < 0.9999, s"fixture pair not borderline: $sim")
    m.add(Record("s0", base, "", "- p", "SELECT 0", 7))
    val v = emb.embed(variant)
    // replace direction (rank 9 > 7) and discard direction (rank 6 < 7):
    // if the banded join missed the pair, the Spark path would insert
    assert(m.decideLocal(9, v) == m.decideSpark(9, v), "replace direction diverged")
    assert(m.decideLocal(6, v) == m.decideSpark(6, v), "discard direction diverged")
  }

  test("chain integration: memory hit skips the planner entirely") {
    val es = new EngineSession(spark)
    es.bind("orders", Tables.load(spark, sf, "orders"))
    val m = mem()
    val goodSql = "SELECT date_trunc('month', o_orderdate) AS month, " +
      "count(*) AS n FROM orders WHERE year(o_orderdate) = 1995 GROUP BY 1"
    val fixtures = Map(
      "expert_selector" -> Seq("requires_dataset: true\nexpert: Data Analyst\nconfidence: 9"),
      "analyst_selector" -> Seq("analyst: Data Analyst DF\nintent: orders per month of 1995"),
      "planner" -> Seq(s"plan:\n- bucket by month\nsql: |\n$goodSql"),
      "summarizer" -> Seq("12 months of orders."))
    // first run: planner consulted, result stored at rank 8
    val r1 = Agents.converse(es, new Agents.ScriptedLlm(fixtures), "orders per month 1995?",
      "orders", Some(m), storeRank = 8)
    assert(!r1.fromMemory && r1.repair.df.nonEmpty && m.size == 1)
    // second run: NO planner fixture — a planner call would throw
    val noPlanner = new Agents.ScriptedLlm(fixtures - "planner")
    val r2 = Agents.converse(es, noPlanner, "orders per month 1995?",
      "orders", Some(m), storeRank = 8)
    assert(r2.fromMemory && r2.repair.df.nonEmpty)
    assert(r2.repair.df.get.count() == 12)
    assert(m.size == 1) // equal rank resubmission discarded by the dedup gate
  }
}
