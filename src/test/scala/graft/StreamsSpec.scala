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
}
