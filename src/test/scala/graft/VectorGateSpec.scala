package graft

import org.apache.spark.sql.functions._
import graft.operators.VectorOps

/** Hard gate for the one oracle-less query (v5_kmeans_ivf, float-iterative
  * so no DuckDB hash-match is possible): quality vs the brute-force ground
  * truth plus Lloyd's-iteration invariants. Referenced from
  * SparkEntry.rowsOnlyQueries so the driver's rows-only check is not the
  * only signal on v5. */
class VectorGateSpec extends SparkSpec {

  private lazy val e = VectorOps.vecsCheckpointed(spark, sf)

  test("v5 recall@10 vs v1-style brute force meets the floor") {
    val probe = e.filter(col("vec_id") === 1).select(col("v").as("p"))
    val brute = e.crossJoin(broadcast(probe)).filter(col("vec_id") =!= 1)
      .select(col("vec_id"), expr("cosine_sim(v, p)").as("sim"))
      .orderBy(desc("sim"), col("vec_id")).limit(10)
      .collect().map(_.getLong(0)).toSet
    val ivf = VectorOps.kmeansIvf(spark, sf)
      .collect().map(_.getLong(0)).toSet
    val recall = brute.intersect(ivf).size / 10.0
    info(s"recall@10 = $recall")
    // 2-of-8 probed cells: the floor is what the fixture sustains with
    // margin; a regression in assignment/probing drops it to ~0.1-0.2.
    assert(recall >= 0.5, s"recall@10 $recall below floor")
  }

  test("Lloyd iterations do not degrade mean assignment similarity") {
    def meanSim(iters: Int): Double =
      VectorOps.kmeansAssign(e, VectorOps.kmeansCentroids(e, iters))
        .agg(avg("sim")).collect()(0).getDouble(0)
    val seed = meanSim(0)
    val it1 = meanSim(1)
    val trained = meanSim(3)
    info(s"mean assignment sim: seed=$seed it1=$it1 it3=$trained")
    // the first Lloyd update must strictly improve on the raw-vector seed,
    // and the trained state must never fall back below the seed
    assert(it1 > seed, s"first iteration did not improve: $seed -> $it1")
    assert(trained >= seed, s"training degraded: $seed -> $trained")
  }

  test("centroid set keeps all K cells alive through training") {
    val cent = VectorOps.kmeansCentroids(e, 3).collect()
    assert(cent.length == 8, s"expected 8 centroids, got ${cent.length}")
    assert(cent.forall(_.getSeq[Double](1).length == 64))
  }
}
