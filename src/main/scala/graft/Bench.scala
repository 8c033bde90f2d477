package graft

import org.apache.spark.sql.SparkSession

/** Per-round benchmark: runs every declared query on SPARK_GRAFT_SF_DIR and
  * prints ONE JSON line. A warmup pass (flagship query twice) absorbs JVM /
  * codegen / parquet-footer warmup so per-query numbers reflect steady-state
  * execution, which is what the 100 TB projection scales from. */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    (1 to 2).foreach(_ => SparkEntry.queries("a3_orders_per_month")(spark, sfDir).count())

    // A query that throws reports -1 (never a plausible wall-clock) and is
    // listed in "errors", so a broken query cannot hide in a healthy JSON.
    val results = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      val t0 = System.nanoTime()
      val ok = try { fn(spark, sfDir).count(); true }
               catch { case _: Throwable => false }
      (name, if (ok) (System.nanoTime() - t0) / 1e9 else -1.0, ok)
    }
    val qs = results.map { case (k, v, _) => "\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val failed = results.collect { case (k, _, false) => "\"" + k + "\"" }
    val total = results.collect { case (_, v, true) => v }.sum
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"errors":[${failed.mkString(",")}],"sf":"$sfDir"}""")
    spark.stop()
  }
}
