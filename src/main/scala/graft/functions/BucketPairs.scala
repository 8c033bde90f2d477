package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, Generator, Literal, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Bucket-local near-dup pair enumeration — the banded self-join without
  * the join (round 16, the `-Dgraft.bucketLocal=true` A/B arm).
  *
  * Built to test the r15 close-out theory that the ×1000×384 RP-LSH dump
  * was bound by JOIN-ROW MATERIALIZATION (5.6e8 candidate rows × two
  * ~3 KB vectors ≈ 3.5 TB of UnsafeRow copies). The plan here groups the
  * banded table by (band, key) — one shuffle, each vector moving exactly
  * once — and enumerates each bucket's C(m,2) pairs INSIDE the generator,
  * verifying inline with the early-exit kernel and emitting only
  * survivors (a_id, b_id, rawsim).
  *
  * The ×1000 A/B FALSIFIED the theory (BASELINE §5 r16): the self-join
  * arm reuses a single exchange of the banded table, so both plans move
  * the same bytes, and the join's whole-stage-codegen'd verify beats this
  * arm's interpreted per-pair generator once candidates dominate
  * (×1000×64: join 56.1 s vs 69.2 s; ×384 a wash). The join arm is
  * therefore the default; this arm stays as the digest-verified
  * alternative (×1000 digests exact under BOTH plans — a full-scale
  * output-invariance A/B) and as the structural template the sketch-gated
  * high-sim blocker builds on ([[SketchHammingGate]]), where bucket rows
  * are 24-byte sketches and bucket-locality genuinely pays. It also
  * mirrors the plain-JVM verifier's shape (IndependentVerify.checkRpPairs
  * enumerates bucket member lists), so the two engines share candidate-
  * enumeration structure as well as arithmetic.
  *
  * Emission contract: a pair is emitted iff its bounded verify returns a
  * value ≥ `pruneBelow` (abandoned pairs return the -2.0 sentinel, and a
  * completed pair below the floor is provably below every caller's final
  * filter, which sits at or above `pruneBelow` by construction — see
  * [[CosineSimBounded]] for the margin math). Sims are BIT-IDENTICAL to
  * the join plan's (`boundedSim` mirrors the expression kernel op-for-op),
  * pairs are normalized (a_id < b_id), and a pair colliding in several
  * buckets is emitted once per bucket with an identical row — the caller's
  * terminal `.distinct()` collapses them exactly as it collapsed the
  * join's duplicates. Output sets are therefore equal by construction;
  * VectorOpsBucketLocalSpec pins equality end-to-end against the join arm.
  *
  * Skew cap: a bucket's members are decoded once into primitive arrays
  * (that is the speed), so a pathological bucket costs m·dim·8 bytes of
  * task memory and C(m,2) dots of task time. Buckets past
  * `graft.bucketPairs.maxBucket` (default 2^16) fail LOUDLY with the
  * remedy (raise planes — the OperatingPoint contract keeps expected
  * occupancy at the anchor's ~125) instead of grinding or OOMing: the
  * candidates-linear gate (VectorGateSpec) bounds Σ C(occ,2) at 500·n,
  * under which max occupancy sits orders of magnitude below the cap.
  *
  * Child layout: array&lt;struct&lt;id: long, v: array&lt;double&gt;,
  * sfx: array&lt;double&gt;&gt;&gt; — positional, the collect_list(struct(...))
  * the caller builds.
  */
case class BucketPairs(child: Expression, pruneBelow: Double)
  extends UnaryExpression with Generator with CodegenFallback {

  override def elementSchema: StructType = StructType(Seq(
    StructField("a_id", LongType, nullable = false),
    StructField("b_id", LongType, nullable = false),
    StructField("sim", DoubleType, nullable = false)))

  override def prettyName: String = "bucket_pairs"

  private lazy val maxBucket: Int =
    Integer.getInteger("graft.bucketPairs.maxBucket", 1 << 16)

  override def eval(input: InternalRow): IterableOnce[InternalRow] = {
    val arr0 = child.eval(input)
    if (arr0 == null) return Nil
    val arr = arr0.asInstanceOf[ArrayData]
    val m = arr.numElements()
    if (m < 2) return Nil
    if (m > maxBucket)
      throw new IllegalStateException(s"bucket_pairs: bucket occupancy $m " +
        s"exceeds the skew cap $maxBucket — the blocking is not holding " +
        "candidates linear (raise planes per band / re-derive the " +
        "operating point, or override -Dgraft.bucketPairs.maxBucket)")
    // decode every member ONCE — the per-pair loop then runs on primitive
    // arrays (no per-element ArrayData virtual calls in the O(m²) part)
    val ids = new Array[Long](m)
    val vs = new Array[Array[Double]](m)
    val sfx = new Array[Array[Double]](m)
    var i = 0
    while (i < m) {
      val r = arr.getStruct(i, 3)
      ids(i) = r.getLong(0)
      vs(i) = r.getArray(1).toDoubleArray()
      sfx(i) = r.getArray(2).toDoubleArray()
      i += 1
    }
    val prune = pruneBelow
    new scala.collection.AbstractIterator[InternalRow] {
      private var ii = 0
      private var jj = 1
      private var row: InternalRow = _
      private def advance(): Unit = {
        row = null
        while (row == null && ii < m - 1) {
          val s = CosineSimBounded.boundedSim(vs(ii), vs(jj),
            sfx(ii), sfx(jj), prune)
          if (s >= prune) {
            val a = ids(ii); val b = ids(jj)
            row = InternalRow(if (a < b) a else b, if (a < b) b else a, s)
          }
          jj += 1
          if (jj >= m) { ii += 1; jj = ii + 1 }
        }
      }
      advance()
      override def hasNext: Boolean = row != null
      override def next(): InternalRow = {
        val out = row; advance(); out
      }
    }
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object BucketPairs {
  /** Register `bucket_pairs(members, pruneBelowLit)`. */
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "bucket_pairs", exprs => {
        require(exprs.length == 2,
          "usage: bucket_pairs(members, pruneBelow)")
        val p = exprs(1) match {
          case Literal(v: java.lang.Number, _) => v.doubleValue()
          case other => throw new IllegalArgumentException(
            s"bucket_pairs pruneBelow must be a numeric literal, got $other")
        }
        BucketPairs(exprs.head, p)
      }, "scala_udf")
}
