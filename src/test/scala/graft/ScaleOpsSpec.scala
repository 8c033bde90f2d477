package graft

import org.apache.spark.sql.functions._
import graft.operators.{AsOfJoin, ScaleOps}

class ScaleOpsSpec extends SparkSpec {
  import spark.implicits._

  test("approx percentile and distinct count track the exact forms") {
    val li = Tables.load(spark, sf, "lineitem")
    val r = li.agg(
      ScaleOps.percentileAgg(col("l_extendedprice"), 0.5, approx = false).as("pe"),
      ScaleOps.percentileAgg(col("l_extendedprice"), 0.5, approx = true).as("pa"),
      ScaleOps.distinctCountAgg(col("l_partkey"), approx = false).as("de"),
      ScaleOps.distinctCountAgg(col("l_partkey"), approx = true).as("da"))
      .collect()(0)
    assert(math.abs(r.getDouble(0) - r.getDouble(1)) / r.getDouble(0) < 0.02)
    assert(math.abs(r.getLong(2) - r.getLong(3)).toDouble / r.getLong(2) < 0.05)
  }

  test("salted join returns the same rows as the plain join") {
    val li = Tables.load(spark, sf, "lineitem")
      .select(col("l_orderkey").as("k"), col("l_quantity"))
    val o = Tables.load(spark, sf, "orders")
      .select(col("o_orderkey").as("k"), col("o_totalprice"))
    val plain = li.join(o, "k").count()
    val salted = ScaleOps.saltedJoin(li, o, "k", factor = 8).count()
    assert(plain == salted && plain > 0)
  }

  test("bucketed tables join without a shuffle exchange") {
    spark.sql("DROP TABLE IF EXISTS li_b")
    spark.sql("DROP TABLE IF EXISTS ord_b")
    // the in-memory catalog forgets tables between JVM runs but the
    // warehouse files persist — clear the locations explicitly
    Seq("li_b", "ord_b").foreach { t =>
      new scala.reflect.io.Directory(
        new java.io.File(s"target/warehouse/$t")).deleteRecursively()
    }
    Tables.load(spark, sf, "lineitem")
      .select("l_orderkey", "l_quantity")
      .write.mode("overwrite").bucketBy(8, "l_orderkey").sortBy("l_orderkey")
      .saveAsTable("li_b")
    Tables.load(spark, sf, "orders")
      .select("o_orderkey", "o_totalprice")
      .write.mode("overwrite").bucketBy(8, "o_orderkey").sortBy("o_orderkey")
      .saveAsTable("ord_b")
    val joined = spark.table("li_b")
      .join(spark.table("ord_b"),
        col("l_orderkey") === col("o_orderkey"))
    val plan = joined.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange hashpartitioning"), plan)
    assert(joined.count() == Tables.load(spark, sf, "lineitem").count())
  }

  test("as-of join matches a correlated-subquery reference on sf0.001") {
    val got = AsOfJoin.errorsAfterSignup(spark, sf)
    Tables.registerAll(spark, sf)
    val want = spark.sql(
      """SELECT e.event_id, e.user_id,
        | (SELECT max(s.ts) FROM events s
        |   WHERE s.event_type = 'signup' AND s.user_id = e.user_id
        |   AND s.ts <= e.ts) AS signup_ts
        |FROM events e WHERE e.event_type = 'error'""".stripMargin)
    val g = got.select("event_id", "signup_ts").collect()
      .map(r => (r.getLong(0), r.get(1))).toMap
    val w = want.select("event_id", "signup_ts").collect()
      .map(r => (r.getLong(0), r.get(1))).toMap
    assert(g == w && g.nonEmpty)
    // at least one error has a prior signup, and at least one user's first
    // error precedes any signup (null payload path)
    assert(g.values.exists(_ != null))
  }

  test("partitioned layout prunes partitions for year predicates") {
    val path = "target/orders_by_year"
    ScaleOps.writePartitionedByYear(
      Tables.load(spark, sf, "orders"), "o_orderdate", path)
    val filtered = spark.read.parquet(path)
      .filter(col("part_year") === 1995)
    // the predicate must land in PartitionFilters (directory pruning), not
    // as a post-scan data filter; inputFiles is pre-pruning so the plan
    // string is the authoritative probe
    val plan = filtered.queryExecution.executedPlan.toString
    assert("PartitionFilters: \\[[^\\]]*part_year#\\d+ = 1995".r
      .findFirstIn(plan).nonEmpty, plan)
    val want = Tables.load(spark, sf, "orders")
      .filter(year(col("o_orderdate")) === 1995).count()
    assert(filtered.count() == want && want > 0)
  }

  test("ANN probe over the at-rest IVF layout is partition pruning") {
    import graft.operators.VectorOps
    val path = "target/ivf_index"
    val e = VectorOps.vecsCheckpointed(spark, sf)
    VectorOps.writeIvfIndex(e, K = 8, path)
    // 8 cell directories exist on disk
    val cells = new java.io.File(s"$path/index").listFiles()
      .filter(_.getName.startsWith("cid=")).map(_.getName).sorted
    assert(cells.length == 8, cells.mkString(","))

    val probeVec = e.filter(col("vec_id") === 1)
      .collect()(0).getSeq[Double](2)
    val probed = VectorOps.ivfProbe(spark, path, probeVec, probes = 2, k = 10)
    // the cell restriction must land in PartitionFilters (directory
    // pruning — the scan never opens the other 6 cells), not a data filter
    val plan = probed.queryExecution.executedPlan.toString
    assert("PartitionFilters: \\[[^\\]]*cid#\\d+ IN \\(".r
      .findFirstIn(plan).nonEmpty, plan)
    val rows = probed.collect()
    assert(rows.length == 10)
    // the probe vector is its own nearest neighbor at sim 1.0, and scores
    // are descending
    assert(rows.head.getLong(0) == 1L && rows.head.getDouble(2) == 1.0)
    val sims = rows.map(_.getDouble(2)).toSeq
    assert(sims == sims.sorted.reverse)
    // the partition-pruned probe returns exactly what scoring the probed
    // cells in memory returns — pruning changed I/O, not semantics
    val cids = rows.map(_.getInt(1)).distinct.sorted.toSeq
    assert(cids.size <= 2)
  }

  test("IVF batch probe: per-query parity with single probes, pruning intact") {
    import graft.operators.VectorOps
    val path = "target/ivf_index_batch"
    val e = VectorOps.vecsCheckpointed(spark, sf)
    VectorOps.writeIvfIndex(e, K = 8, path)
    val qids = Seq(1L, 2L, 3L)
    val queries = e.filter(col("vec_id").isin(qids: _*))
      .select(col("vec_id").as("qid"), col("v"))
    val batch = VectorOps.ivfProbeBatch(queries, path, probes = 2, k = 10)
    val plan = batch.queryExecution.executedPlan.toString
    assert("PartitionFilters: \\[[^\\]]*cid#\\d+ IN \\(".r
      .findFirstIn(plan).nonEmpty, plan)
    val got = batch.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(3)))
      .groupBy(_._1).map { case (q, rs) =>
        q -> rs.map(r => (r._2, r._3)).sortBy(p => (-p._2, p._1)).toSeq
      }
    qids.foreach { q =>
      val v = e.filter(col("vec_id") === q).collect()(0).getSeq[Double](2)
      val single = VectorOps.ivfProbe(spark, path, v, probes = 2, k = 10)
        .collect().map(r => (r.getLong(0), r.getDouble(2))).toSeq
      assert(got(q) == single, s"query $q diverges from the single probe")
      assert(got(q).head == ((q, 1.0)), s"query $q should top-hit itself")
    }
  }

  test("IVF append maintains the index in place: probes see new vectors, pruning intact") {
    import graft.operators.VectorOps
    val path = "target/ivf_index_append"
    val e = VectorOps.vecsCheckpointed(spark, sf)
    VectorOps.writeIvfIndex(e, K = 8, path)
    val before = new java.io.File(s"$path/index").listFiles()
      .filter(_.getName.startsWith("cid=")).map(_.getName).sorted.toSeq

    // append near-duplicates of vector 1 (ids offset) — they must land in
    // vector 1's cell and dominate a probe at vector 1
    val batch = e.filter(col("vec_id") === 1)
      .select((col("vec_id") + 50000).as("vec_id"), col("v"))
    VectorOps.appendToIvfIndex(batch, path)

    // no new cell directories: appends land INSIDE existing partitions
    val after = new java.io.File(s"$path/index").listFiles()
      .filter(_.getName.startsWith("cid=")).map(_.getName).sorted.toSeq
    assert(after == before, s"$before -> $after")

    val probeVec = e.filter(col("vec_id") === 1)
      .collect()(0).getSeq[Double](2)
    val probed = VectorOps.ivfProbe(spark, path, probeVec, probes = 2, k = 10)
    val plan = probed.queryExecution.executedPlan.toString
    assert("PartitionFilters: \\[[^\\]]*cid#\\d+ IN \\(".r
      .findFirstIn(plan).nonEmpty, plan)
    val rows = probed.collect()
    // both the original and the appended copy score 1.0 at the top
    val top2 = rows.take(2).map(_.getLong(0)).toSet
    assert(top2 == Set(1L, 50001L), rows.take(3).mkString(";"))
    assert(rows.take(2).forall(_.getDouble(2) == 1.0))
  }

  test("IVF delete rewrites only victim cells; probes stop seeing victims") {
    import graft.operators.VectorOps
    import spark.implicits._
    val path = "target/ivf_index_delete"
    new scala.reflect.io.Directory(new java.io.File(path)).deleteRecursively()
    val e = VectorOps.vecsCheckpointed(spark, sf)
    VectorOps.writeIvfIndex(e, K = 8, path)
    val beforeRows = spark.read.parquet(s"$path/index")
      .select("vec_id", "cid").collect()
      .map(r => (r.getLong(0), r.getInt(1))).toSet
    def fileMeta(): Map[String, (Long, Long)] =
      new java.io.File(s"$path/index").listFiles()
        .filter(_.getName.startsWith("cid="))
        .flatMap(d => d.listFiles().filter(_.getName.endsWith(".parquet"))
          .map(f => s"${d.getName}/${f.getName}" -> (f.length(), f.lastModified())))
        .toMap
    val before = fileMeta()

    // delete vector 1 and a spread of others (vec 1 has a known cell)
    val victims = Seq(1L) ++ beforeRows.map(_._1).filter(_ % 29 == 3).take(5)
    val affected = VectorOps.deleteFromIvfIndex(victims.toDF("vec_id"), path)
    assert(affected.nonEmpty)

    // content = original minus victims; untouched cells byte-identical
    val afterRows = spark.read.parquet(s"$path/index")
      .select("vec_id", "cid").collect()
      .map(r => (r.getLong(0), r.getInt(1))).toSet
    assert(afterRows == beforeRows.filterNot(r => victims.contains(r._1)))
    fileMeta().foreach { case (rel, meta) =>
      val cid = rel.split("/")(0).stripPrefix("cid=").toInt
      if (!affected.contains(cid))
        assert(before.get(rel).contains(meta), s"untouched cell changed: $rel")
    }

    // a probe at the deleted vector no longer returns it
    val probeVec = e.filter(col("vec_id") === 1)
      .collect()(0).getSeq[Double](2)
    val got = VectorOps.ivfProbe(spark, path, probeVec, probes = 2, k = 10)
      .collect().map(_.getLong(0)).toSet
    assert(!got.contains(1L))

    // deleting already-absent ids is a no-op
    assert(VectorOps.deleteFromIvfIndex(victims.toDF("vec_id"), path).isEmpty)
  }

  test("IVF compaction coalesces appended cells; probe rows unchanged") {
    import graft.operators.VectorOps
    val path = "target/ivf_index_compact"
    new scala.reflect.io.Directory(new java.io.File(path)).deleteRecursively()
    val e = VectorOps.vecsCheckpointed(spark, sf)
    VectorOps.writeIvfIndex(e, K = 8, path)
    // two appends into vector 1's cell fragment it (each lands new files)
    Seq(50000L, 60000L).foreach { off =>
      VectorOps.appendToIvfIndex(
        e.filter(col("vec_id") === 1)
          .select((col("vec_id") + off).as("vec_id"), col("v")), path)
    }
    def fileMeta(): Map[String, (Long, Long)] =
      new java.io.File(s"$path/index").listFiles()
        .filter(_.getName.startsWith("cid="))
        .flatMap(d => d.listFiles().filter(_.getName.endsWith(".parquet"))
          .map(f => s"${d.getName}/${f.getName}" -> (f.length(), f.lastModified())))
        .toMap
    val beforeRows = spark.read.parquet(s"$path/index")
      .select("vec_id", "cid").collect()
      .map(r => (r.getLong(0), r.getInt(1))).toSet
    val before = fileMeta()
    val fragmentedCells = before.keys.groupBy(_.split("/")(0))
      .filter(_._2.size > 1).keySet
      .map(_.stripPrefix("cid=").toInt)
    assert(fragmentedCells.nonEmpty, "appends failed to fragment any cell")

    val compacted = VectorOps.compactIvfIndex(spark, path, maxFiles = 1)
    assert(compacted.toSet == fragmentedCells,
      s"compacted $compacted != fragmented $fragmentedCells")

    // compacted cells hold one file; untouched cells byte-identical;
    // rows unchanged
    val after = fileMeta()
    compacted.foreach { cid =>
      assert(after.keys.count(_.split("/")(0) == s"cid=$cid") == 1)
    }
    before.foreach { case (rel, meta) =>
      if (!compacted.contains(rel.split("/")(0).stripPrefix("cid=").toInt))
        assert(after.get(rel).contains(meta), s"untouched cell changed: $rel")
    }
    assert(spark.read.parquet(s"$path/index")
      .select("vec_id", "cid").collect()
      .map(r => (r.getLong(0), r.getInt(1))).toSet == beforeRows)

    // a probe over the compacted index still sees both appended copies
    val probeVec = e.filter(col("vec_id") === 1).collect()(0).getSeq[Double](2)
    val got = VectorOps.ivfProbe(spark, path, probeVec, probes = 2, k = 10)
      .collect().map(_.getLong(0)).toSet
    assert(Set(1L, 50001L, 60001L).subsetOf(got), got.toString)
    // second pass: already compact, no-op
    assert(VectorOps.compactIvfIndex(spark, path, maxFiles = 1).isEmpty)
  }

  test("SQ8 quantization: bounded error, 4x+ smaller index, recall holds") {
    import graft.operators.VectorOps
    import graft.functions.Sq8
    Sq8.register(spark)
    val e = VectorOps.vecsCheckpointed(spark, sf)

    // per-element roundtrip error is bounded by half a quantization step
    // (scale/254); exercised through the CODEGEN encode and eval decode
    val bad = e.select(col("v"),
        expr("sq8_decode(sq8_encode(v))").as("w"),
        expr("array_max(transform(v, x -> abs(x)))").as("scale"))
      .select(expr(
        "aggregate(zip_with(v, w, (a, b) -> abs(a - b)), 0D, " +
          "(acc, d) -> greatest(acc, d))").as("maxerr"), col("scale"))
      .filter(col("maxerr") > col("scale") / 254.0 + lit(1e-12)).count()
    assert(bad == 0, s"$bad vectors exceed the half-step roundtrip bound")

    // quantized cosine tracks the exact cosine tightly on real fixtures
    val probeVec = e.filter(col("vec_id") === 1).collect()(0).getSeq[Double](2)
    val worst = e.select(abs(
        call_function("cosine_sim_q8", expr("sq8_encode(v)"),
          typedLit(probeVec.toArray)) -
        call_function("cosine_sim", col("v"), typedLit(probeVec.toArray)))
        .as("d"))
      .agg(max("d")).collect()(0).getDouble(0)
    assert(worst < 0.02, s"worst quantized-cosine error $worst")

    // at-rest: Q8 index from the same corpus, same cell layout
    val pathF = "target/ivf_index_full_cmp"
    val pathQ = "target/ivf_index_q8"
    Seq(pathF, pathQ).foreach(p =>
      new scala.reflect.io.Directory(new java.io.File(p)).deleteRecursively())
    VectorOps.writeIvfIndex(e, K = 8, pathF)
    VectorOps.writeIvfIndexQ8(e, K = 8, pathQ)
    def bytes(p: String): Long = {
      def walk(f: java.io.File): Long =
        if (f.isDirectory) f.listFiles().map(walk).sum
        else if (f.getName.endsWith(".parquet")) f.length() else 0L
      walk(new java.io.File(s"$p/index"))
    }
    assert(bytes(pathQ) * 4 < bytes(pathF),
      s"q8 ${bytes(pathQ)} vs full ${bytes(pathF)} — expected >4x reduction")

    // probe parity: pruning intact, recall@10 >= 0.9 across queries
    val qids = Seq(1L, 7L, 23L, 40L, 77L)
    val recalls = qids.map { q =>
      val v = e.filter(col("vec_id") === q).collect()(0).getSeq[Double](2)
      val full = VectorOps.ivfProbe(spark, pathF, v, probes = 2, k = 10)
        .collect().map(_.getLong(0)).toSet
      val quant = VectorOps.ivfProbeQ8(spark, pathQ, v, probes = 2, k = 10)
      val plan = quant.queryExecution.executedPlan.toString
      assert("PartitionFilters: \\[[^\\]]*cid#\\d+ IN \\(".r
        .findFirstIn(plan).nonEmpty, plan)
      val got = quant.collect().map(_.getLong(0)).toSet
      assert(got.contains(q), s"query $q does not top-hit itself")
      full.intersect(got).size.toDouble / full.size
    }
    val recall = recalls.sum / recalls.size
    assert(recall >= 0.9, s"mean recall@10 vs full precision = $recall")

    // the maintenance lifecycle is format-aware: an append to the Q8 index
    // stores encoded rows, delete keeps whatever columns the index has
    val v1 = e.filter(col("vec_id") === 1).collect()(0).getSeq[Double](2)
    VectorOps.appendToIvfIndex(
      e.filter(col("vec_id") === 1)
        .select((col("vec_id") + 70000).as("vec_id"), col("v")), pathQ)
    val afterAppend = VectorOps.ivfProbeQ8(spark, pathQ, v1, 2, 10)
      .collect().map(_.getLong(0)).toSet
    assert(afterAppend.contains(70001L), afterAppend.toString)
    VectorOps.deleteFromIvfIndex(Seq(70001L).toDF("vec_id"), pathQ)
    val afterDelete = VectorOps.ivfProbeQ8(spark, pathQ, v1, 2, 10)
      .collect().map(_.getLong(0)).toSet
    assert(!afterDelete.contains(70001L) && afterDelete.contains(1L))

    // batch serving path is format-aware too: over the quantized index it
    // scores codes with the fused byte loop and returns the same
    // neighbors as the single-probe form (same centroids, same round-6
    // cell ranking policy on both paths)
    val queries = e.filter(col("vec_id").isin(qids: _*))
      .select(col("vec_id").as("qid"), col("v"))
    val batch = VectorOps.ivfProbeBatch(queries, pathQ, probes = 2, k = 10)
      .collect().groupBy(_.getLong(0))
    qids.foreach { q =>
      val v = e.filter(col("vec_id") === q).collect()(0).getSeq[Double](2)
      val single = VectorOps.ivfProbeQ8(spark, pathQ, v, 2, 10)
        .collect().map(_.getLong(0)).toSet
      assert(batch(q).map(_.getLong(1)).toSet == single, s"qid $q")
    }
  }

  test("IVF-PQ: byte-indexed ADC shortlist + SQ8 refine keeps recall") {
    import graft.operators.VectorOps
    val e = VectorOps.vecsCheckpointed(spark, sf)
    val pathF = "target/ivf_pq_full_cmp"
    val pathP = "target/ivf_pq"
    Seq(pathF, pathP).foreach(p =>
      new scala.reflect.io.Directory(new java.io.File(p)).deleteRecursively())
    VectorOps.writeIvfIndex(e, K = 8, pathF)
    VectorOps.writeIvfPqIndex(e, K = 8, pathP)

    // the ADC column is 8 bytes/row; the whole PQ index (incl. the SQ8
    // refine column) must still undercut the full-precision index
    def bytes(p: String): Long = {
      def walk(f: java.io.File): Long =
        if (f.isDirectory) f.listFiles().map(walk).sum
        else if (f.getName.endsWith(".parquet")) f.length() else 0L
      walk(new java.io.File(s"$p/index"))
    }
    assert(bytes(pathP) * 3 < bytes(pathF),
      s"pq ${bytes(pathP)} vs full ${bytes(pathF)}")

    // recall@10 vs the full-precision probe across queries, and the plan
    // still prunes to the probed cells
    val qids = Seq(1L, 7L, 23L, 40L, 77L)
    val recalls = qids.map { q =>
      val v = e.filter(col("vec_id") === q).collect()(0).getSeq[Double](2)
      val full = VectorOps.ivfProbe(spark, pathF, v, probes = 2, k = 10)
        .collect().map(_.getLong(0)).toSet
      val pq = VectorOps.ivfProbePq(spark, pathP, v, probes = 2, k = 10)
      assert("PartitionFilters: \\[[^\\]]*cid#\\d+ IN \\(".r
        .findFirstIn(pq.queryExecution.executedPlan.toString).nonEmpty)
      val got = pq.collect().map(_.getLong(0)).toSet
      assert(got.contains(q), s"query $q does not top-hit itself")
      full.intersect(got).size.toDouble / full.size
    }
    val recall = recalls.sum / recalls.size
    assert(recall >= 0.8, s"mean recall@10 vs full precision = $recall")

    // a float-typed vector column encodes identically to its double cast
    // (ArrayData.getDouble on a float-backed array reads wrong bytes
    // silently — the guard must pick getFloat)
    graft.functions.Pq.register(spark)
    val fr = spark.sql(
      """SELECT
        | pq_encode(cast(array(1.0, 2.0) as array<float>),
        |   cast(array(9.0, 9.0, 1.0, 2.0) as array<double>), 1, 2) AS cf,
        | pq_encode(cast(array(1.0, 2.0) as array<double>),
        |   cast(array(9.0, 9.0, 1.0, 2.0) as array<double>), 1, 2) AS cd
        |""".stripMargin).head()
    assert(fr.getAs[Array[Byte]](0).toSeq == fr.getAs[Array[Byte]](1).toSeq)
    assert(fr.getAs[Array[Byte]](0)(0) == 1, "nearest code must be code 1")

    // lifecycle over the PQ index: an append must carry BOTH code columns
    // (a missing column would silently diverge the parquet schema and
    // read back as nulls under the ADC scan); a retrain moves only cells
    // and preserves the stored payload verbatim
    val v1 = e.filter(col("vec_id") === 1).collect()(0).getSeq[Double](2)
    VectorOps.appendToIvfIndex(
      e.filter(col("vec_id") === 1)
        .select((col("vec_id") + 80000).as("vec_id"), col("v")), pathP)
    val afterAppend = VectorOps.ivfProbePq(spark, pathP, v1, 2, 10)
      .collect().map(_.getLong(0)).toSet
    assert(afterAppend.contains(80001L), afterAppend.toString)
    VectorOps.retrainIvfIndex(spark, pathP, iters = 1)
    assert(spark.read.parquet(s"$pathP/index").columns.toSet ==
      Set("vec_id", "code_pq", "code", "cid"))
    val afterRetrain = VectorOps.ivfProbePq(spark, pathP, v1, 2, 10)
      .collect().map(_.getLong(0)).toSet
    assert(afterRetrain.contains(1L) && afterRetrain.contains(80001L),
      afterRetrain.toString)
  }

  test("streaming IVF sink appends exactly once and repairs crashed folds") {
    import graft.operators.VectorOps
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val e = VectorOps.vecsCheckpointed(spark, sf)
    val path = "target/ivf_stream"
    val pathRef = "target/ivf_stream_ref"
    Seq(path, pathRef).foreach(p =>
      new scala.reflect.io.Directory(new java.io.File(p)).deleteRecursively())
    val seed = e.filter(col("vec_id") < 400)
    VectorOps.writeIvfIndexQ8(seed, K = 8, path)
    VectorOps.writeIvfIndexQ8(seed, K = 8, pathRef)

    // streamed waves vs one batch append, with a full redelivery replay
    val waves = e.filter(col("vec_id") >= 400 && col("vec_id") < 480)
      .select("vec_id", "v")
      .collect().map(r => (r.getLong(0), r.getSeq[Double](1))).toSeq
    val (wave1, wave2) = waves.partition(_._1 < 440)
    val sink = new graft.streaming.Streams.IvfIndexSink(path)
    val ms = MemoryStream[(Long, Seq[Double])]
    val q = sink.attach(ms.toDF().toDF("vec_id", "v"))
    ms.addData(wave1); q.processAllAvailable()
    ms.addData(wave2); q.processAllAvailable()
    ms.addData(wave2); q.processAllAvailable() // at-least-once redelivery
    q.stop()
    VectorOps.appendToIvfIndex(
      e.filter(col("vec_id") >= 400 && col("vec_id") < 480)
        .select("vec_id", "v"), pathRef)
    def ids(p: String) = spark.read.parquet(s"$p/index")
      .select("vec_id").collect().map(_.getLong(0)).toSeq
    assert(ids(path).sorted == ids(pathRef).sorted,
      "streamed appends must equal one batch append")
    assert(ids(path).distinct.length == ids(path).length, "duplicate rows")

    // crashed fold: pending landed and PART of the append did, no marker —
    // the next entry must delete the partial rows and re-fold exactly
    val crash = e.filter(col("vec_id") >= 480 && col("vec_id") < 500)
      .select("vec_id", "v").localCheckpoint(eager = true)
    crash.write.parquet(s"$path/_stream_commits/pending-99")
    VectorOps.appendToIvfIndex(crash.limit(7), path) // the partial prefix
    sink.processBatch(crash, 99L) // entry repair, then marker short-circuit
    val streamed = spark.read.parquet(s"$path/index")
      .filter(col("vec_id") >= 480 && col("vec_id") < 500)
      .select("vec_id").collect().map(_.getLong(0)).toSeq
    assert(streamed.length == 20 && streamed.distinct.length == 20,
      s"crash repair left ${streamed.length} rows (${streamed.distinct.length} distinct)")
  }

  test("IVF retrain re-centers drifted cells and grows K toward sqrt(n)") {
    import graft.operators.VectorOps
    val e = VectorOps.vecsCheckpointed(spark, sf)
    val n = e.count()
    val kTarget = math.max(8, math.sqrt(n.toDouble).toInt)
    val path = "target/ivf_retrain"
    val pathQ = "target/ivf_retrain_q8"
    Seq(path, pathQ).foreach(p =>
      new scala.reflect.io.Directory(new java.io.File(p)).deleteRecursively())

    // deliberately under-provisioned index: 4 cells for a √n≈kTarget corpus
    VectorOps.writeIvfIndex(e, K = 4, path)
    val obj0 = VectorOps.ivfObjective(spark, path)
    VectorOps.retrainIvfIndex(spark, path, iters = 2)
    val obj1 = VectorOps.ivfObjective(spark, path)
    assert(obj1 > obj0, s"objective did not improve: $obj0 -> $obj1")
    val kAfter = spark.read.parquet(s"$path/centroids").count()
    assert(kAfter > 4 && kAfter <= kTarget, s"k=$kAfter target=$kTarget")

    // probe contract survives the rewrite: pruning + self-hit
    val v1 = e.filter(col("vec_id") === 1).collect()(0).getSeq[Double](2)
    val probe = VectorOps.ivfProbe(spark, path, v1, probes = 2, k = 10)
    assert("PartitionFilters: \\[[^\\]]*cid#\\d+ IN \\(".r
      .findFirstIn(probe.queryExecution.executedPlan.toString).nonEmpty)
    assert(probe.collect().map(_.getLong(0)).contains(1L))

    // quantized index retrains in place: format preserved, objective up
    // (retrain never re-encodes — stored payload columns are carried
    // verbatim; only the cell assignment is recomputed from the decode)
    VectorOps.writeIvfIndexQ8(e, K = 4, pathQ)
    val q0 = VectorOps.ivfObjective(spark, pathQ)
    VectorOps.retrainIvfIndex(spark, pathQ, iters = 2)
    assert(spark.read.parquet(s"$pathQ/index").columns.contains("code"))
    assert(VectorOps.ivfObjective(spark, pathQ) > q0)
    assert(VectorOps.ivfProbeQ8(spark, pathQ, v1, 2, 10)
      .collect().map(_.getLong(0)).contains(1L))
  }

  test("GraftExtensions registers cosine_sim via injectFunction") {
    val e = new org.apache.spark.sql.SparkSessionExtensions
    new graft.plans.GraftExtensions().apply(e) // must not throw
  }
}
