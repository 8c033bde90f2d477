package graft

import org.apache.spark.sql.functions._

/** Regression gate for the round-17 codegen-fallback find: a companion
  * method named `eval` gets NO static forwarder on the expression class
  * (Expression.eval shadows it), so the generated code's static call
  * fails Janino compilation and the whole stage silently falls back out
  * of whole-stage codegen — the bench log showed 78+15 CompileExceptions
  * per run for ShingleHashes.eval / Md5Prefix.eval while every plan
  * LOOKED fused. This suite disables the silent fallback
  * (`spark.sql.codegen.fallback=false`, factoryMode=CODEGEN_ONLY) and
  * drives each custom expression through a real whole-stage-codegen
  * stage, so a forwarder regression fails loudly instead of slowly. */
class CodegenCompileSpec extends SparkSpec {

  import spark.implicits._

  private def withCodegenOnly[A](body: => A): A = {
    val conf = spark.conf
    val prevFallback = conf.get("spark.sql.codegen.fallback", "true")
    val prevMode = conf.get("spark.sql.codegen.factoryMode", "FALLBACK")
    conf.set("spark.sql.codegen.fallback", "false")
    conf.set("spark.sql.codegen.factoryMode", "CODEGEN_ONLY")
    try body finally {
      conf.set("spark.sql.codegen.fallback", prevFallback)
      conf.set("spark.sql.codegen.factoryMode", prevMode)
    }
  }

  test("every registered scalar expression codegen-compiles (no silent fallback)") {
    graft.functions.ShingleHashes.register(spark)
    graft.functions.Md5Prefix.register(spark)
    graft.functions.Round6.register(spark)
    graft.functions.CosineSimilarity.register(spark)
    graft.functions.CosineSimBounded.register(spark)
    graft.functions.MinHashSignatures.register(spark,
      Seq(3L, 5L), Seq(7L, 11L), 4294967311L)
    val df = Seq(
      (1L, "the quick brown fox jumps over the lazy dog",
        Seq(0.1, 0.2, 0.3, 0.4)),
      (2L, "a b  c", Seq(0.5, 0.0, -0.2, 0.9)),
      (3L, "", Seq(0.0, 0.0, 0.0, 0.0))
    ).toDF("doc_id", "text", "v")
      .withColumn("words", split(col("text"), " "))
    val out = withCodegenOnly {
      df.select(col("doc_id"),
          expr("shingle_hashes(words)").as("sh"),
          expr("gram_hashes(words, 2)").as("gh"),
          expr("gram_strings(words, 2)").as("gs"),
          expr("md5_prefix(text, 12)").as("mp"),
          expr("round6(cast(size(words) as double) / 7.0)").as("r6"),
          expr("cosine_sim(v, v)").as("cs"),
          expr("cosine_sim_bounded(v, v, vec_sufsq(v), vec_sufsq(v), 0.5D)")
            .as("csb"),
          expr("minhash_sigs(shingle_hashes(words))").as("mh"),
          element_at(graft.functions.TopCells.top(col("v"), 1,
            Array((0, Array(0.1, 0.2, 0.3, 0.4)),
              (1, Array(-0.5, 0.1, 0.0, 0.2)))), 1).as("tc"),
          graft.functions.HierTopCells.top(col("v"), 2, 2, 3,
            Array((0, Array(0.1, 0.2, 0.3, 0.4)),
              (1, Array(-0.5, 0.1, 0.0, 0.2))),
            Array((Array(0, 1), Array(Array(0.3, 0.1, 0.0, 0.2),
                Array(-0.1, 0.4, 0.2, 0.0))),
              (Array(0), Array(Array(0.2, -0.2, 0.5, 0.1))))).as("htc"),
          graft.operators.TextOps.wordStats(col("text")).as("wst"),
          graft.functions.SimHashText.of(col("text"), 12, 48, null)
            .as("sht"),
          graft.functions.SimHashText.of(col("text"), 12, 48, {
            val m = new java.util.HashMap[
              org.apache.spark.unsafe.types.UTF8String, java.lang.Long]()
            m.put(org.apache.spark.unsafe.types.UTF8String.fromString("the"),
              java.lang.Long.valueOf(4L))
            m
          }).as("shtw"),
          graft.functions.SurprisalSum.score(col("text"), {
            val m = new java.util.HashMap[
              org.apache.spark.unsafe.types.UTF8String, java.lang.Long]()
            m.put(org.apache.spark.unsafe.types.UTF8String.fromString("the"),
              java.lang.Long.valueOf(-100L))
            m
          }, -999L).as("sps"))
        .collect()
    }
    assert(out.length == 3)
    // spot-check one value each so the expressions genuinely ran
    val r1 = out.find(_.getLong(0) == 1L).get
    assert(r1.getAs[scala.collection.Seq[Long]]("sh").nonEmpty)
    assert(r1.getAs[Long]("mp") ==
      graft.functions.Md5Prefix.evalPrefix(
        org.apache.spark.unsafe.types.UTF8String.fromString(
          "the quick brown fox jumps over the lazy dog"), 12))
  }
}
