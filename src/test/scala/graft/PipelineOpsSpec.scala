package graft

import org.apache.spark.sql.functions._
import graft.multimodal.Multimodal
import graft.operators.{DedupOps, Relational, TextOps, VectorOps}

/** Invariants for the round-2 pipeline operators (beyond the DuckDB
  * hash-match): structural properties that must hold at any scale. */
class PipelineOpsSpec extends SparkSpec {

  test("sliding windows cover each event exactly 4 times (1h/15min)") {
    val nEvents = Tables.load(spark, sf, "events").count()
    val total = Relational.slidingEvents(spark, sf)
      .agg(sum("n")).collect()(0).getLong(0)
    assert(total == 4 * nEvents)
  }

  test("token counts are positive and bounded by character count") {
    val r = TextOps.tokenCount(spark, sf).cache()
    assert(r.filter(col("n_bpe_tokens") <= 0 || col("n_ws_tokens") <= 0)
      .count() == 0)
    // every token consumes at least one char, so counts can't exceed chars
    assert(r.filter(col("n_bpe_tokens") > col("n_chars")).count() == 0)
    assert(r.filter(col("n_ws_tokens") > col("n_chars")).count() == 0)
    assert(r.filter(col("chars_per_token") <= 0).count() == 0)
  }

  test("decontamination: benchmark docs self-flag; plan broadcasts the eval grams") {
    val out = TextOps.decontamination(spark, sf)
    val plan = out.queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"), plan)
    assert(plan.contains("BroadcastHashJoin"), plan) // eval grams broadcast
    val rows = out.collect()
    // every benchmark doc contains its own n-grams → contaminated
    val bench = rows.filter(_.getBoolean(1))
    assert(bench.nonEmpty && bench.forall(_.getBoolean(3)))
    // hit counts never exceed a doc's own distinct gram count
    assert(rows.forall(r => r.getLong(2) >= 0))
    // contamination is exactly n_hits > 0
    assert(rows.forall(r => r.getBoolean(3) == (r.getLong(2) > 0)))
  }

  test("decontamination hashed-gram switch: long-key broadcast, parity with strings") {
    val docs = Tables.load(spark, sf, "documents").select(col("doc_id"), col("text"))
    val hashed = TextOps.decontaminationOver(docs, hashGrams = true)
    // the broadcast probe joins on a BIGINT gram (g#NL), not a string —
    // the 100 TB form where the eval table broadcasts 8 bytes per gram
    val plan = hashed.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), plan)
    assert("\\[g#\\d+L\\]".r.findFirstIn(plan).nonEmpty,
      s"hashed variant must join on a long gram column: $plan")
    val strPlan = TextOps.decontaminationOver(docs, hashGrams = false)
      .queryExecution.executedPlan.toString
    assert("\\[g#\\d+L\\]".r.findFirstIn(strPlan).isEmpty,
      "string variant unexpectedly joins on a long column")
    // identical verdicts on the fixture (the 48-bit fold is
    // collision-free at this gram count)
    def rows(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getLong(0), r.getBoolean(1), r.getLong(2), r.getBoolean(3)))
      .toSet
    assert(rows(hashed) == rows(TextOps.decontaminationOver(docs, hashGrams = false)))
    // the AUTO entrypoint picks strings at fixture size and longs at 10x —
    // derivation checked directly against the documented cutoff
    import graft.operators.OperatingPoint
    assert(!OperatingPoint.hashDecontaminationGrams(5300L))
    assert(OperatingPoint.hashDecontaminationGrams(53000L))
  }

  test("frame sampling yields fixed 32-byte frames incl. frame 0 per media") {
    val frames = Multimodal.sampleFrames(Multimodal.mediaTable(spark, sf))
    assert(frames.filter(_.frame.length != 32).count() == 0)
    val nMedia = Multimodal.mediaTable(spark, sf)
      .filter(_.payload.length >= 32).count()
    assert(frames.filter(_.frame_idx == 0).count() == nMedia)
  }

  test("rp-lsh near-dup: non-empty, unique pairs, all sims >= threshold") {
    val rows = VectorOps.rpLshNearDup(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(rows.nonEmpty)
    assert(rows.forall { case (a, b, s2) => a < b && s2 >= 0.30 })
    assert(rows.map(p => (p._1, p._2)).distinct.length == rows.length)
  }

  test("w4 two-pass rank: no SinglePartition exchange, equals global dense_rank") {
    val df = Relational.denseRerank(spark, sf)
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange SinglePartition"), plan)
    // the distributed two-pass result must equal the naive global window
    val got = df.collect().map(r => (r.getLong(0), r.getInt(2))).toMap
    val firsts = Tables.load(spark, sf, "events")
      .groupBy("user_id").agg(min("ts").as("first_ts"))
    val want = firsts.select(col("user_id"),
        dense_rank().over(org.apache.spark.sql.expressions.Window
          .orderBy("first_ts", "user_id")).as("new_id"))
      .collect().map(r => (r.getLong(0), r.getInt(1))).toMap
    assert(got == want)
  }

  test("v4 knn join: top-3 per query crosses shuffle via WindowGroupLimit") {
    val df = VectorOps.knnJoin(spark, sf)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("WindowGroupLimit"), plan)
    val rows = df.collect()
    // every query vector has <= 3 neighbors, ranks contiguous from 1
    val byA = rows.groupBy(_.getLong(0))
    assert(byA.values.forall(g => g.length <= 3 &&
      g.map(_.getInt(3)).sorted.sameElements(1 to g.length)))
    // neighbors never include the query itself
    assert(rows.forall(r => r.getLong(0) != r.getLong(1)))
  }

  test("kmeans ivf: top-10 from at most 2 probed cells, sims in [-1,1]") {
    val rows = VectorOps.kmeansIvf(spark, sf).collect()
    assert(rows.length == 10)
    assert(rows.forall(r => math.abs(r.getDouble(2)) <= 1.0 + 1e-9))
    assert(rows.map(_.getInt(1)).distinct.length <= 2)
    assert(!rows.map(_.getLong(0)).contains(1L)) // probe excluded
  }

  test("t10 domain caps: map-side WindowGroupLimit bounds the shuffle") {
    val df = TextOps.domainCaps(spark, sf)
    // the rank<=cap filter must rewrite to a group limit BOTH sides of the
    // exchange — the partial (map-side) one is what bounds shuffle volume
    // to partitions x domains x cap when a mega-domain shows up
    // tree prints root-first, so the map-side (partial) group limit is the
    // one BELOW the last Exchange in the string
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.split("WindowGroupLimit").length >= 3,
      "expected partial + final WindowGroupLimit:\n" + plan)
    assert(plan.split("Exchange").last.contains("WindowGroupLimit"),
      "expected the partial WindowGroupLimit below the exchange:\n" + plan)
    // each domain is actually capped, with contiguous ranks from 1
    val bySrc = df.collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getInt(3)))
      .groupBy(_._2)
    assert(bySrc.values.forall(g => g.length <= TextOps.DomainCap &&
      g.map(_._4).sorted.sameElements(1 to g.length)))
  }

  test("c2 mixture weights: shares sum to 1, weights rebalance to target") {
    val rows = TextOps.mixtureWeights(spark, sf).collect()
    val actual = rows.map(_.getDouble(3)).sum
    assert(math.abs(actual - 1.0) < 1e-4)
    // resampling each lang by its weight recovers the target share:
    // weight * actual_share == target_share (up to the 6-dec rounding)
    rows.foreach { r =>
      assert(math.abs(r.getDouble(5) * r.getDouble(3) - r.getDouble(4)) < 1e-5)
    }
    // oversample flag is exactly weight > 1
    rows.foreach(r => assert(r.getBoolean(6) == (r.getDouble(5) > 1.0)))
  }

  test("t11 sequence pack: shard-local offsets are exact prefix sums, no single-partition window") {
    val df = TextOps.sequencePack(spark, sf)
    // the packing cumsum must partition by shard — a global concatenation
    // order would plan a SinglePartition exchange, the anti-pattern the
    // operator exists to avoid
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("SinglePartition"), plan)
    val rows = df.collect().map(r => (r.getLong(0), r.getInt(1),
      r.getInt(2), r.getLong(3), r.getLong(4), r.getLong(5)))
    // within each shard, offsets in doc_id order are the exclusive prefix
    // sum of token counts: contiguous, gapless packing
    rows.groupBy(_._2).values.foreach { g =>
      val inOrder = g.sortBy(_._1)
      var off = 0L
      inOrder.foreach { case (_, _, n, start, seqId, nSeqs) =>
        assert(start == off, s"offset gap at $start vs $off")
        assert(seqId == start / TextOps.PackSeqLen)
        val lastTok = if (n == 0) start else start + n - 1
        assert(nSeqs == math.max(1L,
          lastTok / TextOps.PackSeqLen - seqId + 1))
        off += n
      }
    }
    // straddling documents exist at this sf (the manifest's reason to
    // carry n_seqs at all) and every count is positive
    assert(rows.exists(_._6 > 1))
    assert(rows.forall(_._6 >= 1))
  }

  test("dd9 span grams: planted boilerplate detected alignment-free across docs") {
    val rows = DedupOps.spanGrams(spark, sf).collect().map(r =>
      (r.getLong(0), r.getInt(1), r.getString(2), r.getLong(3),
        r.getLong(4), r.getBoolean(5)))
    assert(rows.nonEmpty, "no shared span grams found — planted boilerplate missed")
    // per gram: n_docs counts distinct carriers, first_doc is the min
    // carrier, is_foreign flags exactly the non-first carriers
    rows.groupBy(_._3).values.foreach { g =>
      val docs = g.map(_._1).distinct.sorted
      assert(docs.length >= 2)
      g.foreach { case (doc, _, _, n, fd, foreign) =>
        assert(n == docs.length && fd == docs.head && foreign == (doc != fd))
      }
    }
    // alignment robustness — the reason selection is content-defined: the
    // SAME gram is found at DIFFERENT offsets in different docs (the
    // planted boilerplate starts wherever each host doc happens to end)
    assert(rows.groupBy(_._3).values.exists(g => g.map(_._2).distinct.length >= 2))
  }

  test("span gram expression matches the SQL lambda form, incl. non-ASCII and short docs") {
    import spark.implicits._
    val boiler = "x" * 60
    val docs = Seq(
      (1L, "short"),                              // shorter than one gram
      (2L, ("the quick brown fox " * 20) + boiler),
      (3L, ("lorem ipsum dolor sit amet " * 15) + boiler),
      (4L, "héllo wörld ünïcode çhars — " * 12)   // multi-byte fallback path
    ).toDF("doc_id", "text")
    graft.functions.SpanGramHits.register(spark, 50)
    val viaExpr = docs.select(col("doc_id"),
        explode(expr("span_gram_hits(text)")).as("x"))
      .select(col("doc_id"), col("x.off"), col("x.gh"))
    val viaSql = docs.select(col("doc_id"),
        explode(expr(
          """filter(transform(sequence(1, greatest(length(text) - 49, 1)),
            | i -> struct(i AS off, md5(substring(text, i, 50)) AS gh)),
            | x -> substring(x.gh, 1, 1) = '0')""".stripMargin)).as("x"))
      .select(col("doc_id"), col("x.off"), col("x.gh"))
    assert(viaExpr.exceptAll(viaSql).isEmpty && viaSql.exceptAll(viaExpr).isEmpty)
    assert(viaExpr.count() > 0) // the fixture actually exercises selection
  }

  test("s3 session windows agree with w8 sessionize on session count per user") {
    val s3 = Relational.sessionWindowAgg(spark, sf)
      .groupBy("user_id").count().collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    val w8 = Relational.sessionize(spark, sf)
      .groupBy("user_id").count().collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(s3 == w8)
  }
}
