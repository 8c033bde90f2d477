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

  test("retrieve with a REAL word-vector model behind the Embedder seam") {
    // the full retrieval path on WordVecEmbedder instead of the hash
    // stand-in: a model whose vector space encodes actual synonymy, so
    // retrieval succeeds on paraphrase where the bag-of-hashes cannot
    val dir = new java.io.File("target/wordvec"); dir.mkdirs()
    val path = s"$dir/episodic.vec"
    java.nio.file.Files.writeString(java.nio.file.Paths.get(path),
      """orders 1.0 0.0 0.0 0.1
        |purchases 0.9 0.1 0.0 0.1
        |monthly 0.0 1.0 0.0 0.1
        |count 0.0 0.0 1.0 0.1
        |tally 0.0 0.1 0.9 0.1
        |vectors 0.0 0.0 0.0 1.0
        |""".stripMargin)
    val m = new EpisodicMemory(spark,
      embedder = new EpisodicMemory.WordVecEmbedder(path))
    m.add(Record("w1", "monthly count of orders", "orders table",
      "- plan", "SELECT 'w'", 8))
    // paraphrase via the model's synonym geometry: tally≈count,
    // purchases≈orders — the hash embedder shares NO buckets here
    val para = m.retrieve("monthly tally of purchases")
    assert(para.nonEmpty && para.get.record.sql == "SELECT 'w'")
    val hashMem = new EpisodicMemory(spark)
    hashMem.add(Record("w1", "monthly count of orders", "orders table",
      "- plan", "SELECT 'w'", 8))
    assert(hashMem.retrieve("monthly tally of purchases").isEmpty)
    // an unrelated query still misses under the real model
    assert(m.retrieve("nearest neighbour vectors").isEmpty)
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

  test("persistence roundtrip: save/load preserves retrieval and upsert decisions") {
    val path = "target/episodic_store"
    val m1 = mem()
    Seq("count orders per month", "revenue by brand per quarter",
      "top suppliers by volume", "average discount per segment")
      .zipWithIndex.foreach { case (t, i) =>
        m1.add(Record(s"s$i", t, s"dataset $i", "- p", s"SELECT $i", 7))
      }
    m1.save(path)
    val m2 = mem()
    m2.load(path)
    assert(m2.size == m1.size)
    // identical retrieval, including the data-description rerank path
    Seq("count orders per month", "top suppliers by volume").foreach { q =>
      val (a, b) = (m1.retrieve(q, "dataset 2"), m2.retrieve(q, "dataset 2"))
      assert(a.map(x => (x.record.id, x.record.sql, x.similarity)) ==
        b.map(x => (x.record.id, x.record.sql, x.similarity)), q)
    }
    // identical upsert decisions after the roundtrip (store ORDER is part
    // of the semantics — tie-breaks use the store index)
    val emb = new HashEmbedder()
    Seq(("count orders per month", 9L), ("count orders per month", 6L),
        ("lineitem shipping delays", 8L)).foreach { case (intent, rank) =>
      val v = emb.embed(intent)
      assert(m1.decideLocal(rank, v) == m2.decideLocal(rank, v),
        s"loaded store decides ($intent, $rank) differently")
    }
    m1.add(Record("c1", "count orders per month", "", "- p", "SELECT 'r'", 9))
    m2.add(Record("c1", "count orders per month", "", "- p", "SELECT 'r'", 9))
    assert(m1.size == m2.size)
    assert(m1.retrieve("count orders per month").get.record.rank == 9)
    assert(m2.retrieve("count orders per month").get.record.rank == 9)
  }

  test("persistence above the cutoff: loaded store routes adds through Spark, decisions unchanged") {
    import spark.implicits._
    val path = "target/episodic_store_big"
    val emb = new HashEmbedder()
    val n = EpisodicMemory.SparkPathCutoff + 5
    // build the persisted form directly — the load contract accepts any
    // saved store, and 10k+ add() calls would test nothing extra
    val rows = (0 until n).map { i =>
      val intent = s"intent token$i k${i * 7 % 997} q${i * 13 % 997}"
      (i, s"r$i", intent, "", "- p", s"SELECT $i", 7L, emb.embed(intent))
    }
    rows.toDF("pos", "id", "intent", "data_descr", "plan", "sql", "rank", "v")
      .write.mode("overwrite").parquet(path)
    val m = new EpisodicMemory(spark)
    m.load(path)
    assert(m.size == n && m.size >= EpisodicMemory.SparkPathCutoff)
    // the distributed decision equals the exact driver scan on the loaded
    // store, and the public add() (which routes via Spark at this size)
    // replaces rather than appends
    val v = emb.embed("intent token3 k21 q39")
    assert(m.decideSpark(9, v) == m.decideLocal(9, v))
    m.add(Record("dup", "intent token3 k21 q39", "", "- p", "SELECT 'x'", 9))
    assert(m.size == n, "higher-rank duplicate must replace, not append")
    assert(m.retrieve("intent token3 k21 q39").get.record.rank == 9)
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
