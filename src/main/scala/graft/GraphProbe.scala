package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.operators.GraphOps

/** Connected-components scale probe: times the DISTRIBUTED star loop on
  * synthetic graphs far above the driver-path cutoff, and records round
  * counts so the O(log n)-rounds claim is a measurement, not a citation.
  *
  * Graph shapes (both canonical by construction):
  *  - `chain64`: N nodes in chains of 64 — the worst realistic dedup shape
  *    (long thin components force the most rounds; real near-dup clusters
  *    are shallower, so measured rounds here upper-bound them);
  *  - `star500k`: one hub with 500k spokes — the hot-root skew shape
  *    (one node owns every edge; large-star's groupBy(min) is the
  *    map-side-combinable aggregation that absorbs it).
  *
  * A `local500k` row times the driver union-find on the 500k-edge chain
  * graph for the cutoff comparison. Prints one JSON line.
  *
  * Usage: runMain graft.GraphProbe [nNodes]
  */
object GraphProbe {

  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toLong).getOrElse(2000000L)
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def chainEdges(nn: Long) = spark.range(nn - 1)
      .filter(col("id") % 64 =!= 63)
      .select(col("id").as("a"), (col("id") + 1).as("b"))
    val nodes = spark.range(n).select(col("id"))

    def timeDistributed(label: String, nodesDf: org.apache.spark.sql.DataFrame,
        edgesDf: org.apache.spark.sql.DataFrame,
        expectComponents: Long): (Double, Int) = {
      val e = edgesDf.localCheckpoint()
      e.count() // materialize outside the timed window
      var rounds = 0
      val t0 = System.nanoTime()
      val res = GraphOps.componentsDistributed(nodesDf, e,
        onRound = (r, _) => rounds = r)
      val comps = res.select(countDistinct(col("component"))).head().getLong(0)
      val wall = (System.nanoTime() - t0) / 1e9
      require(comps == expectComponents,
        s"$label: got $comps components, expected $expectComponents")
      (wall, rounds)
    }

    val (chainWall, chainRounds) =
      timeDistributed("chain64", nodes, chainEdges(n), (n + 63) / 64)

    val hubSpokes = 500000L
    val starNodes = spark.range(hubSpokes + 1).select(col("id"))
    val starEdges = spark.range(1, hubSpokes + 1)
      .select(lit(0L).as("a"), col("id").as("b"))
    val (starWall, starRounds) =
      timeDistributed("star500k", starNodes, starEdges, 1L)

    // driver path on a cutoff-sized chain graph (500k edges < 1M cutoff)
    val smallN = 500000L
    val smallNodes = spark.range(smallN).select(col("id"))
    val smallE = chainEdges(smallN).localCheckpoint()
    smallE.count()
    val t0 = System.nanoTime()
    val localComps = GraphOps.componentsLocal(smallNodes,
        smallE.collect().map(r => (r.getLong(0), r.getLong(1))))
      .select(countDistinct(col("component"))).head().getLong(0)
    val localWall = (System.nanoTime() - t0) / 1e9
    require(localComps == (smallN + 63) / 64)

    println(s"""{"probe":"graph_cc","n":$n,""" +
      s""""chain64":{"sec":${f"$chainWall%.2f"},"rounds":$chainRounds},""" +
      s""""star500k":{"sec":${f"$starWall%.2f"},"rounds":$starRounds},""" +
      s""""local500k_chain":{"sec":${f"$localWall%.2f"}}}""")
    spark.stop()
  }
}
