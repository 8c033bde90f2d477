package graft

import java.sql.Timestamp
import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import graft.streaming.Streams

class StreamsSpec extends SparkSpec {
  import spark.implicits._

  private def eventsBatch = Tables.load(spark, sf, "events")
    .select(col("ts").cast("timestamp").as("ts"), col("user_id"),
      col("event_type"), col("value"))

  test("streaming hourly window over memory stream matches batch groupBy") {
    implicit val sqlCtx = spark.sqlContext
    val data = eventsBatch
      .as[(Timestamp, Long, String, Double)].collect().toSeq
    val ms = MemoryStream[(Timestamp, Long, String, Double)]
    ms.addData(data)
    val streamDf = ms.toDF().toDF("ts", "user_id", "event_type", "value")
    Streams.runToMemory(spark, Streams.hourlyCounts(streamDf), "hourly_out")

    val got = spark.sql("SELECT hour, event_type, n FROM hourly_out")
      .collect().map(r => (r.getTimestamp(0), r.getString(1), r.getLong(2))).toSet
    val want = eventsBatch
      .groupBy(date_trunc("hour", col("ts")).as("hour"), col("event_type"))
      .agg(count(lit(1)).as("n"))
      .collect().map(r => (r.getTimestamp(0), r.getString(1), r.getLong(2))).toSet
    assert(got == want)
  }

  test("streaming sliding window matches the s2 batch query") {
    implicit val sqlCtx = spark.sqlContext
    val data = eventsBatch
      .as[(Timestamp, Long, String, Double)].collect().toSeq
    val ms = MemoryStream[(Timestamp, Long, String, Double)]
    ms.addData(data)
    val streamDf = ms.toDF().toDF("ts", "user_id", "event_type", "value")
    Streams.runToMemory(spark, Streams.slidingCounts(streamDf), "slide_out")
    val got = spark.sql(
      "SELECT wstart, CAST(sum(n) AS BIGINT) FROM slide_out GROUP BY wstart")
      .collect().map(r => (r.getTimestamp(0), r.getLong(1))).toSet
    val want = graft.operators.Relational.slidingEvents(spark, sf)
      .select(col("w_start").cast("timestamp"), col("n"))
      .collect().map(r => (r.getTimestamp(0), r.getLong(1))).toSet
    assert(got == want)
  }

  test("streaming dedup keeps one row per key within the watermark horizon") {
    implicit val sqlCtx = spark.sqlContext
    val data = eventsBatch
      .as[(Timestamp, Long, String, Double)].collect().toSeq
    val ms = MemoryStream[(Timestamp, Long, String, Double)]
    ms.addData(data) // one batch: every duplicate arrives inside the horizon
    val streamDf = ms.toDF().toDF("ts", "user_id", "event_type", "value")
    Streams.runToMemory(spark,
      Streams.dedupStream(streamDf, Seq("user_id", "event_type")),
      "dedup_out", org.apache.spark.sql.streaming.OutputMode.Append())
    val got = spark.table("dedup_out")
    // exactly one survivor per (user_id, event_type): matches batch
    // dropDuplicates cardinality because all rows share the single batch
    val want = eventsBatch.dropDuplicates("user_id", "event_type").count()
    assert(got.count() == want && want > 0)
    assert(got.groupBy("user_id", "event_type").count()
      .filter(col("count") > 1).count() == 0)
    // survivors carry the full row (dedup selects rows, not keys)
    assert(got.columns.toSeq == Seq("ts", "user_id", "event_type", "value"))
  }

  test("session_window streaming agg partitions all events") {
    implicit val sqlCtx = spark.sqlContext
    val data = eventsBatch
      .as[(Timestamp, Long, String, Double)].collect().toSeq
    val ms = MemoryStream[(Timestamp, Long, String, Double)]
    ms.addData(data)
    val streamDf = ms.toDF().toDF("ts", "user_id", "event_type", "value")
    Streams.runToMemory(spark, Streams.sessionWindows(streamDf), "sess_out")
    val total = spark.sql("SELECT sum(n_events) FROM sess_out")
      .collect()(0).getLong(0)
    assert(total == eventsBatch.count())
  }

  test("session_window streaming sessions match w8 sessionize per-session") {
    implicit val sqlCtx = spark.sqlContext
    val data = eventsBatch
      .as[(Timestamp, Long, String, Double)].collect().toSeq
    val ms = MemoryStream[(Timestamp, Long, String, Double)]
    ms.addData(data)
    val streamDf = ms.toDF().toDF("ts", "user_id", "event_type", "value")
    Streams.runToMemory(spark, Streams.sessionWindows(streamDf), "sess_parity")
    val got = spark.sql(
      "SELECT user_id, session_start, n_events FROM sess_parity")
      .collect().map(r => (r.getLong(0), r.getTimestamp(1), r.getLong(2))).toSet
    // batch w8 sessions rebuilt with their start timestamp (sessionize emits
    // user_id/session_id/n_events/duration; same gap split, same grain)
    val byUser = org.apache.spark.sql.expressions.Window
      .partitionBy("user_id").orderBy("ts", "event_id")
    val cum = byUser.rowsBetween(Long.MinValue, 0)
    val want = Tables.load(spark, sf, "events")
      .select(col("user_id"), col("event_id"), col("ts").cast("timestamp").as("ts"))
      .withColumn("new_sess",
        when(unix_timestamp(col("ts")) -
          unix_timestamp(lag("ts", 1).over(byUser)) > 1800, 1).otherwise(0))
      .withColumn("session_id", sum("new_sess").over(cum))
      .groupBy("user_id", "session_id")
      .agg(min("ts").as("session_start"), count(lit(1)).as("n_events"))
      .select("user_id", "session_start", "n_events")
      .collect().map(r => (r.getLong(0), r.getTimestamp(1), r.getLong(2))).toSet
    assert(got == want)
  }

  test("stateful sessions = w8 sessions minus each user's open tail session") {
    implicit val sqlCtx = spark.sqlContext
    val ev = eventsBatch.as[Streams.Event]
    val msEv = MemoryStream[Streams.Event]
    msEv.addData(ev.collect().toSeq)
    val q = Streams.statefulSessions(msEv.toDS()).writeStream
      .outputMode("append").format("memory").queryName("stateful_parity").start()
    q.processAllAvailable(); q.stop()
    val closed = spark.sql(
      "SELECT user_id, start_s, n_events FROM stateful_parity")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val byUser = org.apache.spark.sql.expressions.Window
      .partitionBy("user_id").orderBy("ts", "event_id")
    val cum = byUser.rowsBetween(Long.MinValue, 0)
    val batch = Tables.load(spark, sf, "events")
      .select(col("user_id"), col("event_id"), col("ts").cast("timestamp").as("ts"))
      .withColumn("new_sess",
        when(unix_timestamp(col("ts")) -
          unix_timestamp(lag("ts", 1).over(byUser)) > 1800, 1).otherwise(0))
      .withColumn("session_id", sum("new_sess").over(cum))
      .groupBy("user_id", "session_id")
      .agg(min(unix_timestamp(col("ts"))).as("start_s"),
        count(lit(1)).as("n_events"))
      .collect().map(r => (r.getLong(0), r.getLong(2), r.getLong(3),
        r.getLong(1))).toList
    // every user's final (max session_id) session is still open in state;
    // everything else must have been emitted as closed, value-for-value
    val open = batch.groupBy(_._1).view.mapValues(_.maxBy(_._4)).values.toSet
    val wantClosed = batch.map(t => (t._1, t._2, t._3)).toSet --
      open.map(t => (t._1, t._2, t._3))
    assert(closed == wantClosed)
  }

  test("streaming rank-upsert foreachBatch sink matches batch RankDedup.upsert") {
    implicit val sqlCtx = spark.sqlContext
    val e = Tables.load(spark, sf, "embeddings")
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
    val store = e.select(col("vec_id").as("id"), col("v"),
      (col("vec_id") % 11).as("rank"))
    // two candidate waves from disjoint vector classes (%3==0 then %3==1):
    // identical-vector matches hit disjoint store rows, so sequential
    // micro-batches must equal one combined batch application
    def wave(cls: Int, offset: Int, rankShift: Int) =
      e.filter(col("vec_id") % 3 === cls)
        .select((col("vec_id") + offset).as("id"), col("v"),
          ((col("vec_id") + rankShift) % 11).as("rank"))
        .as[(Long, Seq[Double], Long)].collect().toSeq
    val (b1, b2) = (wave(0, 10000, 5), wave(1, 20000, 7))

    val sink = new Streams.RankUpsertSink(store, dim = 64)
    val ms = MemoryStream[(Long, Seq[Double], Long)]
    val q = sink.attach(ms.toDF().toDF("id", "v", "rank"))
    ms.addData(b1); q.processAllAvailable()
    ms.addData(b2); q.processAllAvailable()
    q.stop()

    val got = sink.store.select("id", "rank")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val cand = (b1 ++ b2).toDF("id", "v", "rank")
    val want = graft.operators.RankDedup.upsert(store, cand, 64)
      .select("id", "rank")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == want && got.nonEmpty)
    // the sink's store keeps usable vectors for the next batch
    val vdim = sink.store.select(size(col("v")).as("d")).distinct()
      .collect().map(_.getInt(0)).toSeq
    assert(vdim == Seq(64))
    // at least one replacement and one rank-gated discard actually happened
    val statuses = graft.operators.RankDedup.upsert(store, cand, 64)
      .groupBy("status").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(statuses.getOrElse("inserted", 0L) > 0)
    assert(got.size < store.count() + cand.count(), "some candidates dropped or replaced")
  }

  test("streaming near-dup admission: store/in-batch rejects, batching-invariant") {
    implicit val sqlCtx = spark.sqlContext
    val e = Tables.load(spark, sf, "embeddings")
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
    def vec(id: Long): Seq[Double] = e.filter(col("vec_id") === id)
      .collect()(0).getSeq[Double](1)
    val store = e.filter(col("vec_id") % 7 === 0)
      .select(col("vec_id").as("id"), col("v"))
    // batch 1: copy of a stored vector (reject), a fresh vector (admit),
    // an in-batch copy of the fresh one (reject). batch 2: a copy of the
    // batch-1 admit (reject — it was ACCEPTED earlier), another fresh (admit)
    val b1 = Seq((10001L, vec(0)), (10002L, vec(1)), (10003L, vec(1)))
    val b2 = Seq((20001L, vec(1)), (20002L, vec(2)))

    val sink = new Streams.NearDupAdmitSink(store)
    val ms = MemoryStream[(Long, Seq[Double])]
    val q = sink.attach(ms.toDF().toDF("id", "v"))
    ms.addData(b1); q.processAllAvailable()
    ms.addData(b2); q.processAllAvailable()
    q.stop()
    val seedIds = store.collect().map(_.getLong(0)).toSet
    val got = sink.store.select("id").collect().map(_.getLong(0)).toSet
    assert(got == seedIds ++ Set(10002L, 20002L))

    // batching-invariance: one candidate per microbatch = same accepted set
    val sink2 = new Streams.NearDupAdmitSink(store)
    (b1 ++ b2).zipWithIndex.foreach { case (c, i) =>
      sink2.processBatch(Seq(c).toDF("id", "v"), i.toLong)
    }
    val got2 = sink2.store.select("id").collect().map(_.getLong(0)).toSet
    assert(got2 == got)

    // redelivered-id guard: the same id twice in one microbatch (foreachBatch
    // at-least-once) must land in the accepted store exactly once
    val sink3 = new Streams.NearDupAdmitSink(store)
    sink3.processBatch(Seq((30001L, vec(3)), (30001L, vec(3))).toDF("id", "v"), 0L)
    assert(sink3.store.filter(col("id") === 30001L).count() == 1L)
  }

  test("streaming mixture sample matches the t6 batch query (curation on ingest)") {
    implicit val sqlCtx = spark.sqlContext
    val docs = Tables.load(spark, sf, "documents").select(col("doc_id"), col("lang"))
    val ms = MemoryStream[(Long, String)]
    ms.addData(docs.as[(Long, String)].collect().toSeq)
    Streams.runToMemory(spark,
      graft.operators.TextOps.mixtureFilter(ms.toDF().toDF("doc_id", "lang")),
      "mix_parity", org.apache.spark.sql.streaming.OutputMode.Append())
    val got = spark.sql("SELECT doc_id, lang, bucket FROM mix_parity")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
    val want = graft.operators.TextOps.stratifiedSample(spark, sf)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
    assert(got == want && got.nonEmpty)
  }

  test("streaming surprisal scoring against a static model matches batch t13") {
    implicit val sqlCtx = spark.sqlContext
    // model pre-trained on the batch corpus; documents then ARRIVE as a
    // stream and are scored by the same call — curation on ingest
    val corpus = Tables.load(spark, sf, "documents")
    val (model, oov) = graft.operators.TextOps.unigramModel(corpus)
    val ms = MemoryStream[(Long, String)]
    ms.addData(corpus.select(col("doc_id"), col("text"))
      .as[(Long, String)].collect().toSeq)
    // the fused scoring pass (round 17) is map-only — no stateful
    // aggregation — so the stream runs in Append mode (the old
    // explode+join+groupBy plan needed Complete); curation-on-ingest
    // got strictly MORE streaming-friendly
    Streams.runToMemory(spark,
      graft.operators.TextOps.surprisalScored(
        ms.toDF().toDF("doc_id", "text"), model, oov),
      "surprisal_parity",
      org.apache.spark.sql.streaming.OutputMode.Append())
    val got = spark.sql("SELECT * FROM surprisal_parity")
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getInt(2),
        r.getDouble(3), r.getBoolean(4))).toSet
    val want = graft.operators.TextOps.perplexityFilter(spark, sf)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getInt(2),
        r.getDouble(3), r.getBoolean(4))).toSet
    assert(got == want && got.nonEmpty)
  }

  test("flatMapGroupsWithState sessionization matches window-based batch count") {
    val ev = eventsBatch.as[Streams.Event]
    // closed sessions + one open session per user == batch session count
    implicit val sqlCtx = spark.sqlContext
    val msEv = MemoryStream[Streams.Event]
    msEv.addData(ev.collect().toSeq)
    val q = Streams.statefulSessions(msEv.toDS()).writeStream
      .outputMode("append").format("memory").queryName("stateful_out").start()
    q.processAllAvailable(); q.stop()
    val closed = spark.sql("SELECT count(*) FROM stateful_out")
      .collect()(0).getLong(0)
    val users = eventsBatch.select("user_id").distinct().count()
    val batchSessions = graft.operators.Relational.sessionize(spark, sf).count()
    assert(closed + users == batchSessions)
  }

  test("streaming html extraction: the h1 stage runs unchanged on a stream") {
    // the crawl-ingest front door: extraction is a stateless narrow
    // projection, so the SAME expressions the oracle-gated h1 batch query
    // runs serve a readStream microbatch with no rewrite — streamed
    // output must equal the batch operator row for row
    implicit val sqlCtx = spark.sqlContext
    val batch = graft.operators.TextOps.htmlExtract(spark, sf)
    val htmlRows = Tables.load(spark, sf, "documents")
      .select(col("doc_id"), expr(
        graft.operators.TextOps.htmlFixture("cast(doc_id as string)"))
        .as("html"))
      .as[(Long, String)].collect().toSeq
    val ms = MemoryStream[(Long, String)]
    ms.addData(htmlRows)
    val streamed = graft.operators.TextOps.htmlExtractOver(
      ms.toDF().toDF("doc_id", "html"))
    val q = streamed.writeStream.outputMode("append")
      .format("memory").queryName("h1_stream_out").start()
    q.processAllAvailable(); q.stop()
    def key(r: org.apache.spark.sql.Row) =
      (r.getLong(0), r.getInt(1), r.getInt(2), r.getInt(3), r.getString(4))
    val got = spark.sql("SELECT * FROM h1_stream_out").collect().map(key).toSet
    val want = batch.collect().map(key).toSet
    assert(got == want && got.nonEmpty)
  }

  test("crawl ingest e2e: warc waves through h1+h2 into the scrub sink") {
    import graft.operators.SpanIndex
    val landing = "target/crawl_ingest_landing"
    val idx = "target/crawl_ingest_idx"
    val out = "target/crawl_ingest_out"
    Seq(landing, idx, out).foreach(d =>
      new scala.reflect.io.Directory(new java.io.File(d)).deleteRecursively())
    new java.io.File(landing).mkdirs()

    // corpus-known boilerplate, long enough for the span inventory's gram
    // window, phrased so the h1 block filter keeps it (words >= 5, no
    // links) — the subscription footer every site of one publisher shares
    val boiler = "subscribe to the newsletter for all the latest stories " +
      "and the best reporting delivered to the inbox every single morning " +
      "without fail because the editors of the site curate all the news " +
      "that matters for the readers of the daily edition of the paper " +
      "and the weekend magazine of the publishing group"
    val storyA = "the city council approved the riverside development " +
      "after the planning committee published the revised environmental " +
      "assessment and the residents of the district voted to accept the " +
      "compromise on the height of the towers along the waterfront " +
      "promenade near the historic harbor district of the old town"
    val storyB = "the research station measured the deepest readings of " +
      "the season while the expedition mapped the southern shelf and the " +
      "glaciologists compared the melt rates against the records of the " +
      "previous decade for the annual report of the polar institute and " +
      "the oceanographic survey of the frozen continent"
    def page(body: Seq[String]): String =
      "<html><head><script>track();</script></head><body>" +
        "<div id=\"nav\"><a href=\"/\">Home</a> <a href=\"/a\">About</a> " +
        "<a href=\"/c\">Contact</a></div>" +
        body.map(p => s"<p>$p</p>").mkString + "</body></html>"
    def record(url: String, html: String): String = {
      val payload = "HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n\r\n" + html
      s"WARC/1.0\r\nWARC-Type: response\r\nWARC-Target-URI: $url\r\n" +
        s"Content-Length: ${payload.getBytes("UTF-8").length}\r\n\r\n" + payload
    }
    def archive(name: String, records: Seq[String]): Unit =
      java.nio.file.Files.write(
        java.nio.file.Paths.get(s"$landing/$name"),
        (records.mkString("\r\n\r\n") + "\r\n\r\n").getBytes("UTF-8"))

    // the index must exist before the sink attaches; seed it with the
    // publisher boilerplate so even WAVE 1 pages get it scrubbed
    SpanIndex.write(Seq((1L, "seed page of the publisher " + boiler))
      .toDF("doc_id", "text"), idx)

    val urlA = "http://news.example/story-a"
    val urlB = "http://news.example/story-b"
    // wave 1 lands BEFORE the stream starts (batch 0): a real story
    // carrying the boilerplate, a junk page that h2 must reject, and a
    // warcinfo record the response filter must skip
    archive("wave1.warc", Seq(
      "WARC/1.0\r\nWARC-Type: warcinfo\r\nContent-Length: 17\r\n\r\nsoftware: crawler",
      record(urlA, page(Seq(storyA, boiler))),
      record("http://spam.example/", page(Seq("buy " * 19 + "buy")))))

    val (sink, q) = graft.streaming.Streams.crawlIngest(
      spark, landing, idx, out)
    try {
      q.processAllAvailable()
      val ids = Seq(urlA, urlB).map(u =>
        Seq(u).toDF("u").select(xxhash64(col("u"))).head().getLong(0))
      val w1 = sink.cleaned(spark).collect()
        .map(r => r.getLong(0) -> (r.getInt(1), r.getString(3))).toMap
      // only the quality page landed; its boilerplate paragraph was cut
      // against the seeded index, the story text kept
      assert(w1.keySet == Set(ids(0)), w1.keySet)
      assert(w1(ids(0))._1 >= 1, w1)
      assert(w1(ids(0))._2.contains("riverside development"), w1)
      assert(!w1(ids(0))._2.contains("editors of the site curate"), w1)

      // wave 2: a new archive whose story QUOTES wave 1's story — wave 1
      // folded into the index, so the quoted span is now corpus-known
      archive("wave2.warc", Seq(
        record(urlB, page(Seq(storyB, storyA)))))
      q.processAllAvailable()
      val w2 = sink.cleaned(spark).collect()
        .map(r => r.getLong(0) -> (r.getInt(1), r.getString(3))).toMap
      assert(w2.keySet == Set(ids(0), ids(1)), w2.keySet)
      assert(w2(ids(1))._1 >= 1, w2)
      assert(w2(ids(1))._2.contains("research station"), w2)
      assert(!w2(ids(1))._2.contains("revised environmental assessment"), w2)
      // the consumer contract serves exactly the committed rows
      assert(graft.streaming.Streams.cleanedCorpus(spark, out)
        .collect().map(_.getLong(0)).toSet == Set(ids(0), ids(1)))
    } finally q.stop()
  }

  test("warc batch/stream parity on the adversarial framing edge cases") {
    // the streaming reader splits via the text source's lineSep, the
    // batch reader via Hadoop's TextInputFormat delimiter — two different
    // splitters feeding one shared record iterator. The edge cases that
    // exercised the iterator's framing (bodies beginning with WARC/,
    // ending with the delimiter bytes, adjacent delimiter runs, empty
    // split chunks) must come back identical from both.
    import graft.sources.Sources
    def rec(url: String, payload: String): String =
      s"WARC/1.0\r\nWARC-Type: conversion\r\nWARC-Target-URI: $url\r\n" +
        s"Content-Length: ${payload.getBytes("UTF-8").length}\r\n\r\n" + payload
    val bodies = Seq(
      "http://t1/" -> "quoting a delimiter at the very end:\r\n\r\nWARC/",
      "http://t2/" -> "two in a row:\r\n\r\nWARC/\r\n\r\nWARC/and tail",
      "http://t3/" -> "WARC/ at the very start of a body",
      "http://t4/" -> "\r\nWARC/ leading half-overlap body",
      "http://t5/" -> "an ordinary record between the tricky ones",
      "http://t6/" -> ("unicode é☃中😀 and a quoted record:\r\n\r\n" +
        rec("http://inner/", "inner body")))
    val landing = "target/warc_parity_landing"
    new scala.reflect.io.Directory(new java.io.File(landing)).deleteRecursively()
    new java.io.File(landing).mkdirs()
    bodies.grouped(2).zipWithIndex.foreach { case (g, i) =>
      java.nio.file.Files.write(
        java.nio.file.Paths.get(s"$landing/a$i.warc"),
        (g.map { case (u, b) => rec(u, b) }.mkString("\r\n\r\n") + "\r\n\r\n")
          .getBytes("UTF-8"))
    }
    val batch = Sources.warc(spark, s"$landing/*.warc")
      .collect().map(_.toString).sorted
    assert(batch.length == bodies.length)
    val q = Sources.warcStream(spark, landing).writeStream
      .outputMode("append").format("memory").queryName("warc_parity").start()
    q.processAllAvailable(); q.stop()
    val streamed = spark.table("warc_parity")
      .collect().map(_.toString).sorted
    assert(streamed.sameElements(batch),
      s"stream=${streamed.mkString("|")}\nbatch=${batch.mkString("|")}")
  }

  test("warc batch/stream parity property: generated adversarial archives") {
    // same generator family as SourcesSpec's framing property (bodies
    // built from delimiter fragments, CRLF runs, multi-byte UTF-8) —
    // here the assertion is that the text-source lineSep splitter and
    // Hadoop's TextInputFormat delimiter feed the shared record
    // iterator identically, row for row
    import graft.sources.Sources
    import org.scalacheck.Gen
    def rec(url: String, payload: String): String =
      s"WARC/1.0\r\nWARC-Type: conversion\r\nWARC-Target-URI: $url\r\n" +
        s"Content-Length: ${payload.getBytes("UTF-8").length}\r\n\r\n" + payload
    val piece = Gen.frequency(
      4 -> Gen.alphaNumStr.map(_.take(10)),
      2 -> Gen.const("\r\n\r\nWARC/"),
      1 -> Gen.const("\r\n\r\n"),
      1 -> Gen.const("WARC/"),
      1 -> Gen.const("é☃中😀"))
    val body = for {
      ps <- Gen.listOfN(6, piece)
      tail <- Gen.oneOf("", "\r\n\r\nWARC/", "WARC/")
    } yield ps.mkString + tail
    val archives = Gen.listOfN(8, Gen.choose(1, 4).flatMap(Gen.listOfN(_, body)))
      .apply(Gen.Parameters.default, org.scalacheck.rng.Seed(23L))
      .getOrElse(sys.error("gen failed"))
    val landing = "target/warc_parity_prop"
    new scala.reflect.io.Directory(new java.io.File(landing)).deleteRecursively()
    new java.io.File(landing).mkdirs()
    var total = 0
    archives.zipWithIndex.foreach { case (bodies, a) =>
      val recs = bodies.zipWithIndex.map { case (b, i) =>
        total += 1; rec(s"http://pp/$a/$i", b)
      }
      java.nio.file.Files.write(
        java.nio.file.Paths.get(s"$landing/p$a.warc"),
        (recs.mkString("\r\n\r\n") + "\r\n\r\n").getBytes("UTF-8"))
    }
    val batch = Sources.warc(spark, s"$landing/*.warc")
      .collect().map(_.toString).sorted
    assert(batch.length == total)
    val q = Sources.warcStream(spark, landing).writeStream
      .outputMode("append").format("memory").queryName("warc_parity_prop")
      .start()
    q.processAllAvailable(); q.stop()
    val streamed = spark.table("warc_parity_prop")
      .collect().map(_.toString).sorted
    assert(streamed.sameElements(batch))
  }

  private def ts(h: Int, m: Int): Timestamp =
    Timestamp.valueOf(f"2026-01-01 $h%02d:$m%02d:00")

  test("late data (s1): within-horizon late event updates its open window, " +
      "beyond-horizon late event is dropped") {
    // THE event-time contract a 100 TB pipeline leans on: a late row inside
    // the watermark horizon must still land in its (not-yet-finalized)
    // window; a row older than the horizon must be dropped, not resurrected
    // as a phantom window. Append mode, so emission == finalization.
    implicit val sqlCtx = spark.sqlContext
    val ms = MemoryStream[(Timestamp, Long, String, Double)]
    val streamDf = ms.toDF().toDF("ts", "user_id", "event_type", "value")
    val q = Streams.hourlyCounts(streamDf).writeStream
      .outputMode(org.apache.spark.sql.streaming.OutputMode.Append)
      .format("memory").queryName("late_hourly").start()
    // batch 1: two 10:xx events + a 13:05 mover -> watermark 12:05;
    // window [10:00,11:00) finalizes with n=2
    ms.addData(Seq((ts(10, 0), 1L, "click", 1.0),
      (ts(10, 30), 1L, "click", 1.0), (ts(13, 5), 2L, "click", 1.0)))
    q.processAllAvailable()
    // batch 2, both LATE vs max event time 13:05:
    //  - 12:30 is inside the horizon (window [12:00,13:00) end > watermark
    //    12:05) -> MUST be aggregated;
    //  - 11:30 is beyond it (window end 12:00 <= watermark) -> MUST drop
    ms.addData(Seq((ts(12, 30), 3L, "click", 2.0),
      (ts(11, 30), 4L, "click", 5.0)))
    q.processAllAvailable()
    // batch 3: a 14:30 mover -> watermark 13:30 finalizes [12:00,13:00)
    ms.addData(Seq((ts(14, 30), 5L, "click", 1.0)))
    q.processAllAvailable(); q.stop()
    val rows = spark.sql("SELECT hour, n, total_value FROM late_hourly")
      .collect().map(r => r.getTimestamp(0) ->
        ((r.getLong(1), r.getDouble(2)))).toMap
    assert(rows.get(ts(10, 0)).contains((2L, 2.0)), rows)
    // the within-horizon late event was counted in its window
    assert(rows.get(ts(12, 0)).contains((1L, 2.0)), rows)
    // the beyond-horizon event resurrected no [11:00,12:00) window
    assert(!rows.contains(ts(11, 0)), rows)
  }

  test("late data (s3): session_window merges a within-horizon gap-filler " +
      "into ONE session; a beyond-horizon event creates no session") {
    implicit val sqlCtx = spark.sqlContext
    val ms = MemoryStream[(Timestamp, Long, String, Double)]
    val streamDf = ms.toDF().toDF("ts", "user_id", "event_type", "value")
    val q = Streams.sessionWindows(streamDf).writeStream
      .outputMode(org.apache.spark.sql.streaming.OutputMode.Append)
      .format("memory").queryName("late_sess").start()
    // batch 1: user 1 at 10:00 and 10:20 (one open session, end 10:50);
    // user 2 mover at 11:00 -> watermark 10:00
    ms.addData(Seq((ts(10, 0), 1L, "click", 1.0),
      (ts(10, 20), 1L, "click", 2.0), (ts(11, 0), 2L, "click", 1.0)))
    q.processAllAvailable()
    // batch 2: user 1's 10:45 arrives late but within the horizon — the
    // 30-min gap rule makes it EXTEND the open session (10:20 + 30m);
    // user 1's 08:00 is beyond the horizon (session end 08:30 < watermark
    // 10:00) and must vanish, not become a one-event session
    ms.addData(Seq((ts(10, 45), 1L, "click", 4.0),
      (ts(8, 0), 1L, "click", 100.0)))
    q.processAllAvailable()
    // batch 3: mover at 13:00 -> watermark 12:00 finalizes every session
    ms.addData(Seq((ts(13, 0), 2L, "click", 1.0)))
    q.processAllAvailable(); q.stop()
    val user1 = spark.sql(
      "SELECT session_start, n_events, total_value FROM late_sess WHERE user_id = 1")
      .collect().map(r => (r.getTimestamp(0), r.getLong(1), r.getDouble(2)))
    // exactly ONE merged session: 10:00 .. 10:45+gap, three events — not
    // two split sessions, not a phantom 08:00 session
    assert(user1.toSeq == Seq((ts(10, 0), 3L, 7.0)), user1.mkString(", "))
  }
}
