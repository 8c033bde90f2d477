package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.streaming.OutputMode
import graft.streaming.Streams

/** Runnable streaming entry: drives the events fixture through a REAL
  * streaming query (file source → watermarked window agg → memory sink) and
  * prints the hourly counts, demonstrating §2.10 end-to-end outside tests.
  * Usage: runMain graft.StreamDemo [sfDir] */
object StreamDemo {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    // file-source streaming needs a schema up front; reuse the batch one
    val batch = Tables.load(spark, sfDir, "events")
    val dir = s"${sys.props("java.io.tmpdir")}/graft_stream_${System.nanoTime()}"
    batch.write.mode("overwrite").parquet(dir)
    // watermarks require TIMESTAMP (with zone); session TZ is UTC so the
    // NTZ fixture values are preserved by the cast
    val stream = spark.readStream.schema(batch.schema).parquet(dir)
      .withColumn("ts", org.apache.spark.sql.functions.col("ts").cast("timestamp"))

    val q = Streams.hourlyCounts(stream).writeStream
      .outputMode(OutputMode.Complete())
      .format("memory").queryName("hourly")
      .start()
    q.processAllAvailable()
    q.stop()

    val out = spark.sql(
      "SELECT event_type, count(*) AS n_windows, sum(n) AS n_events " +
        "FROM hourly GROUP BY event_type ORDER BY event_type")
    out.show(20, false)
    println(s"rows=${spark.table("hourly").count()}")
    spark.stop()
  }
}
