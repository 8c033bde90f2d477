package graft

import org.apache.spark.sql.functions._
import graft.functions.{CosineSimBounded, CosineSimilarity}
import graft.operators.VectorOps

/** Gates for the early-exit candidate verify (round 15): the load-bearing
  * property is that the bounded form is INVISIBLE in output — every
  * surviving pair and every surviving sim bit-identical to the
  * CosineSimilarity plan — while abandoning provably-sub-threshold pairs
  * partway through the dot. */
class CosineSimBoundedSpec extends SparkSpec {
  import spark.implicits._

  private def frame(vs: (Long, Seq[Double])*) = {
    CosineSimilarity.register(spark)
    CosineSimBounded.register(spark)
    vs.toDF("id", "v").withColumn("sfx", expr("vec_sufsq(v)"))
  }

  /** Deterministic pseudo-random unit-ish vector. */
  private def vec(seed: Int, dim: Int): Seq[Double] =
    (0 until dim).map { k =>
      val x = (seed * 1024 + k + 7).toLong * 6364136223846793005L + 11L
      ((x >>> 11).toDouble / (1L << 53).toDouble) - 0.5
    }

  test("vec_sufsq: element 0 is the exact forward norm-square; suffixes cover") {
    val v = vec(1, 384)
    val row = frame((1L, v)).select(col("sfx")).head.getSeq[Double](0)
    assert(row.length == 6)
    // forward order exactly (left-assoc double sum)
    var fwd = 0.0
    v.foreach(x => fwd += x * x)
    assert(row.head == fwd)
    // suffix invariants: nonincreasing in j, and each >= the true suffix
    // computed forward minus float slack
    (1 until 6).foreach { j =>
      var s = 0.0
      (j * 64 until 384).foreach(i => s += v(i) * v(i))
      assert(math.abs(row(j) - s) <= 1e-12 * s, s"j=$j")
      assert(row(j) <= row(j - 1))
    }
    // 64-dim vector: single entry, no checkpoints
    assert(frame((2L, vec(2, 64))).select(col("sfx"))
      .head.getSeq[Double](0).length == 1)
  }

  test("survivors are bit-identical to cosine_sim; sub-threshold pairs prune") {
    val n = 40
    val rows = (0 until n).map(i => (i.toLong, vec(i, 384)))
    // plant a high-sim pair: 40 = tiny perturbation of 0
    val planted = rows :+ (40L -> rows.head._2.zipWithIndex.map {
      case (x, k) => if (k == 0) x + 1e-4 else x
    })
    val df = frame(planted: _*)
    val joined = df.as("a").crossJoin(df.as("x"))
      .filter(col("a.id") < col("x.id"))
    val exact = joined.select(col("a.id"), col("x.id"),
        expr("cosine_sim(a.v, x.v)").as("s"))
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    val bounded = joined.select(col("a.id"), col("x.id"),
        expr("cosine_sim_bounded(a.v, x.v, a.sfx, x.sfx, 0.299999D)").as("s"))
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    assert(exact.keySet == bounded.keySet)
    var prunedCount = 0
    exact.foreach { case (k, e) =>
      val b = bounded(k)
      if (b == -2.0) {
        prunedCount += 1
        assert(e < 0.299999, s"pair $k pruned but exact sim $e >= floor")
      } else assert(b == e, s"pair $k: bounded $b != exact $e (bit-equality)")
    }
    // the planted near-identical pair must survive with its exact sim
    assert(bounded((0L, 40L)) == exact((0L, 40L)) && exact((0L, 40L)) > 0.99)
    // random 384-dim pairs concentrate near 0; at the 0.30 floor the
    // Cauchy-Schwarz bound can only fire once enough energy is consumed
    // (remaining-energy fraction must drop under floor - partial dot), so
    // expect a majority — not all — of the 820 pairs to abandon
    // (measured: 549)
    assert(prunedCount > 400, s"only $prunedCount pairs pruned — bound inert?")
  }

  test("zero norms and nulls behave like cosine_sim") {
    val z = Seq.fill(384)(0.0)
    val df = frame((1L, z), (2L, vec(2, 384)))
    val out = df.as("a").crossJoin(df.as("x")).filter(col("a.id") < col("x.id"))
      .select(expr("cosine_sim_bounded(a.v, x.v, a.sfx, x.sfx, 0.3D)"))
      .head.getDouble(0)
    assert(out == 0.0)
  }

  test("end-to-end: banded near-dup output identical with early exit on/off") {
    // the A/B switch must be invisible in output (what makes the r15
    // wiring digest- and oracle-safe): same pair set, same sims, on the
    // 384-dim planted fixture at both band configs
    val base = (0 until 60).map(i => (i.toLong, vec(i, 384))) ++
      (0 until 6).map(i => (100L + i,
        vec(i, 384).map(x => x * 1.0000001)))
    val e = frame(base: _*).select(col("id").as("vec_id"), col("v"))
    def pairs(): Set[(Long, Long, Double)] =
      VectorOps.rpBandedNearDupOver(e, bands = 4, "rp_gate_ab_7", planes = 7,
          dim = 384)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val withExit = pairs()
    val old = System.getProperty("graft.earlyExit")
    try {
      System.setProperty("graft.earlyExit", "false")
      val withoutExit = pairs()
      assert(withExit == withoutExit)
      assert(withExit.nonEmpty)
    } finally {
      if (old == null) System.clearProperty("graft.earlyExit")
      else System.setProperty("graft.earlyExit", old)
    }
  }
}
