package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Table layer: loads the driver corpus (TESTDATA.md) and registers temp
  * views, mirroring the reference's df / aux-dataset injection
  * (reference: bambooai/code_executor.py:128-140 binds `df` into the exec
  * scope; web_app/code_executor_api.py:33-65 caches tables by df_id).
  *
  * Spark-first: a "table" is an immutable DataFrame plan registered in the
  * session catalog under a stable name; re-binding a name is the engine's
  * equivalent of the reference's mutable-`df` semantics.
  *
  * Timestamp policy (SURVEY §1.2, §7.5): everything is UTC and
  * timezone-naive (TIMESTAMP_NTZ), matching the reference's tz-strip at load
  * (web_app/app.py:210-224) and keeping parity with the DuckDB oracle, which
  * reads parquet timestamps as naive microsecond values. `events.ts` is
  * nanosecond-precision parquet, which Spark's vectorized reader rejects —
  * we read it as raw nanos (legacy nanosAsLong) and floor-convert to
  * microseconds, the same truncation DuckDB applies.
  */
object Tables {
  val all: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def path(sfDir: String, name: String): String = s"$sfDir/$name.parquet"

  def load(spark: SparkSession, sfDir: String, name: String): DataFrame = {
    spark.conf.set("spark.sql.parquet.inferTimestampNTZ.enabled", "true")
    if (name == "events") {
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      val raw = spark.read.parquet(path(sfDir, name))
      // driver fixtures carry ns timestamps read as raw longs; re-written
      // copies (e.g. ScaleProbe's synthesized dirs) are already NTZ
      raw.schema("ts").dataType match {
        case org.apache.spark.sql.types.LongType => raw.withColumn("ts",
          expr("cast(timestamp_micros(ts div 1000) as timestamp_ntz)"))
        case _ => raw
      }
    } else spark.read.parquet(path(sfDir, name))
  }

  /** Register every corpus table as a temp view for SQL access. */
  def registerAll(spark: SparkSession, sfDir: String): Unit =
    all.foreach(n => load(spark, sfDir, n).createOrReplaceTempView(n))
}
