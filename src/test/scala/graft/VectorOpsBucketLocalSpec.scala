package graft

import org.apache.spark.sql.functions._
import graft.functions.{CosineSimBounded, CosineSimilarity}
import graft.operators.VectorOps

/** Gates for the round-16 bucket-local pair enumeration
  * ([[graft.functions.BucketPairs]], the `-Dgraft.bucketLocal=true` A/B
  * arm that tested — and falsified — the r15 candidate-row-payload
  * theory): output identity against the default banded self-join (the
  * contract the ×1000 digests ride on), the primitive-kernel/expression
  * bit-equality the sketch-gated high-sim plan also relies on, and the
  * loud skew cap. */
class VectorOpsBucketLocalSpec extends SparkSpec {

  private def pairsWith(bucketLocal: Boolean, earlyExit: Boolean,
      dir: String = sf): Set[(Long, Long, Double)] = {
    System.setProperty("graft.bucketLocal", bucketLocal.toString)
    System.setProperty("graft.earlyExit", earlyExit.toString)
    try {
      val e = VectorOps.vecsCheckpointed(spark, dir)
      VectorOps.rpBandedNearDupOver(e, bands = 4,
          s"rp_bl_${bucketLocal}_$earlyExit", planes = 4)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
        .toSet
    } finally {
      System.clearProperty("graft.bucketLocal")
      System.clearProperty("graft.earlyExit")
    }
  }

  test("bucket-local output == join-arm output, bit-identical sims " +
      "(both early-exit arms; sf0.01 for a non-trivial pair set)") {
    val dir = "/root/testdata/sf0.01"
    val joinArm = pairsWith(bucketLocal = false, earlyExit = true, dir)
    val blArm = pairsWith(bucketLocal = true, earlyExit = true, dir)
    assert(blArm.nonEmpty, "empty pair set gates nothing")
    assert(blArm == joinArm,
      s"bucket-local diverged: only-bl=${(blArm -- joinArm).take(5)} " +
        s"only-join=${(joinArm -- blArm).take(5)}")
    // and the early-exit-off arm (plain full dot inside the generator)
    val blFull = pairsWith(bucketLocal = true, earlyExit = false, dir)
    assert(blFull == joinArm)
  }

  test("boundedSim kernel is bit-identical to the CosineSimBounded " +
      "expression on a generative sweep (incl. checkpointed 384-dim)") {
    CosineSimilarity.register(spark)
    CosineSimBounded.register(spark)
    def vec(seed: Int, dim: Int): Array[Double] = Array.tabulate(dim) { k =>
      val x = VectorOps.mix64((seed.toLong << 20) | k.toLong)
      (x >>> 11).toDouble / (1L << 53).toDouble * 2.0 - 1.0
    }
    for (dim <- Seq(64, 384); s <- 0 until 40) {
      val a = vec(2 * s, dim); val b = vec(2 * s + 1, dim)
      val rows = Seq((a.toSeq, b.toSeq))
      import spark.implicits._
      val df = rows.toDF("a", "b").selectExpr(
        "cosine_sim_bounded(a, b, vec_sufsq(a), vec_sufsq(b), 0.1D) as s")
      val exprVal = df.head.getDouble(0)
      def suf(v: Array[Double]): Array[Double] = {
        val L = math.max(1, (dim + 63) / 64)
        val out = new Array[Double](L)
        var f = 0.0; var i = 0
        while (i < dim) { f += v(i) * v(i); i += 1 }
        out(0) = f
        var acc = 0.0; i = dim - 1
        while (i >= 64) {
          acc += v(i) * v(i)
          if ((i & 63) == 0) out(i >> 6) = acc
          i -= 1
        }
        out
      }
      val kernelVal = CosineSimBounded.boundedSim(a, b, suf(a), suf(b), 0.1)
      assert(java.lang.Double.doubleToRawLongBits(exprVal) ==
        java.lang.Double.doubleToRawLongBits(kernelVal),
        s"dim=$dim seed=$s: expr=$exprVal kernel=$kernelVal")
    }
  }

  test("skew cap fails loudly on a bucket past the configured maximum") {
    System.setProperty("graft.bucketPairs.maxBucket", "3")
    try {
      val e = VectorOps.vecsCheckpointed(spark, sf)
        .limit(8).localCheckpoint()
      // constant band key => one bucket of 8 members > cap 3
      graft.functions.BucketPairs.register(spark)
      graft.functions.CosineSimBounded.register(spark)
      val ex = intercept[Exception] {
        e.select(col("vec_id"), col("v"), expr("vec_sufsq(v)").as("sfx"),
            lit(0).as("b"), lit(0).as("key"))
          .groupBy(col("b"), col("key"))
          .agg(collect_list(struct(col("vec_id"), col("v"), col("sfx")))
            .as("ms"))
          .select(expr("bucket_pairs(ms, 0.0D)")
            .as(Seq("a_id", "b_id", "sim")))
          .count()
      }
      def chain(t: Throwable): Seq[String] =
        if (t == null) Nil else t.toString +: chain(t.getCause)
      assert(chain(ex).exists(_.contains("skew cap")),
        s"expected the skew-cap message in: ${chain(ex)}")
    } finally System.clearProperty("graft.bucketPairs.maxBucket")
  }
}
