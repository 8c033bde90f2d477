package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.operators.VectorOps

/** Hard gate for the one oracle-less query (v5_kmeans_ivf, float-iterative
  * so no DuckDB hash-match is possible): quality vs the brute-force ground
  * truth plus Lloyd's-iteration invariants. Referenced from
  * SparkEntry.rowsOnlyQueries so the driver's rows-only check is not the
  * only signal on v5.
  *
  * The recall floor is pinned just below the measured value at each sf
  * (measured: sf0.001 → 0.9, sf0.01 → 1.0 for the 2-of-8-cell probe; the
  * fixtures are deterministic so these are stable), so a centroid-update or
  * probing regression that halves recall fails the gate rather than sliding
  * under the former lax 0.5 floor.
  */
class VectorGateSpec extends SparkSpec {

  private lazy val e = VectorOps.vecsCheckpointed(spark, sf)

  private def recallAt10(dir: String): Double = {
    val ds = VectorOps.vecsCheckpointed(spark, dir)
    val probe = ds.filter(col("vec_id") === 1).select(col("v").as("p"))
    val brute = ds.crossJoin(broadcast(probe)).filter(col("vec_id") =!= 1)
      .select(col("vec_id"), expr("cosine_sim(v, p)").as("sim"))
      .orderBy(desc("sim"), col("vec_id")).limit(10)
      .collect().map(_.getLong(0)).toSet
    val ivf = VectorOps.kmeansIvf(spark, dir)
      .collect().map(_.getLong(0)).toSet
    brute.intersect(ivf).size / 10.0
  }

  test("v5 recall@10 vs v1-style brute force meets the pinned floor (sf0.001)") {
    val recall = recallAt10(sf)
    info(s"recall@10 sf0.001 = $recall")
    assert(recall >= 0.85, s"recall@10 $recall below pinned floor 0.85 (measured 0.9)")
  }

  test("v5 recall@10 vs v1-style brute force meets the pinned floor (sf0.01)") {
    val recall = recallAt10("/root/testdata/sf0.01")
    info(s"recall@10 sf0.01 = $recall")
    assert(recall >= 0.95, s"recall@10 $recall below pinned floor 0.95 (measured 1.0)")
  }

  test("Lloyd objective is non-increasing across every iteration") {
    def meanSim(iters: Int): Double =
      VectorOps.kmeansAssign(e, VectorOps.kmeansCentroids(e, iters))
        .agg(avg("sim")).collect()(0).getDouble(0)
    val sims = (0 to 3).map(meanSim)
    info(s"mean assignment sim per iteration: ${sims.mkString(" -> ")}")
    // Lloyd's objective (1 - mean assignment sim) must not increase at ANY
    // step, not just end-to-end — a mid-training divergence is a bug even
    // if iteration 3 lands above the seed. Tiny epsilon absorbs float-sum
    // nondeterminism across shuffle orders.
    val eps = 1e-9
    sims.sliding(2).zipWithIndex.foreach { case (Seq(a, b), i) =>
      assert(b >= a - eps, s"iteration ${i + 1} degraded the objective: $a -> $b")
    }
    // and the first update must strictly improve on the raw-vector seed
    assert(sims(1) > sims(0), s"first iteration did not improve: ${sims(0)} -> ${sims(1)}")
  }

  test("centroid set keeps all K cells alive through training") {
    val cent = VectorOps.kmeansCentroids(e, 3).collect()
    assert(cent.length == 8, s"expected 8 centroids, got ${cent.length}")
    assert(cent.forall(_.getSeq[Double](1).length == 64))
  }
}
