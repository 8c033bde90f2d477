package graft

import org.apache.spark.sql.DataFrame
import graft.operators.TextOps

/** Equality gate for the driver-hosted BPE trainer against the composed
  * per-round Catalyst loop it replaced — the t16 oracle hash rides on
  * the merge table being identical row for row (rank, pair, merged,
  * cnt), including the argmax tie policy (cnt DESC, left ASC, right ASC
  * under UTF8String byte order) and the left-to-right non-overlapping
  * rewrite that replace() on the sentinel-wrapped form performed. */
class BpeTrainSpec extends SparkSpec {

  import spark.implicits._

  private def rowsOf(df: DataFrame): Seq[(Int, String, String, String, Long)] =
    df.collect().map(r => (r.getInt(0), r.getString(1), r.getString(2),
      r.getString(3), r.getLong(4))).sortBy(_._1).toSeq

  private def assertEqual(docs: DataFrame, rounds: Int,
      gate: Option[String]): Unit = {
    val fused = rowsOf(TextOps.bpeTrainTokens(docs, rounds, gate))
    val composed = rowsOf(TextOps.bpeTrainTokensComposed(docs, rounds, gate))
    assert(fused == composed, s"bpe arms differ (gate=$gate):\n" +
      s"$fused\nvs\n$composed")
  }

  test("fused == composed on the sf0.001 corpus (the t16 gate, 6 rounds)") {
    val docs = Tables.load(spark, sf, "documents").select("text")
    assertEqual(docs, 6, Some("^[a-z]+$"))
  }

  test("fused == composed on adversarial repeats and ties") {
    // 'aaaa' exercises the non-overlapping rewrite; equal-count pairs
    // exercise the (left, right) byte-order tie; single-char words fuse
    // to one symbol within the budget (the phantom-pair regression zone)
    val docs = Seq("aaaa aaaa aa", "ab ab ba", "q q q q", "zz zz",
      "aaaa ab").toDF("text")
    assertEqual(docs, 8, None)
  }

  test("fused == composed on a unicode (CJK + supplementary) corpus, no gate") {
    val docs = Seq("你好 世界 你好", "𝔘𝔫𝔦 𝔘𝔫𝔦 码 码",
      "héllo héllo wörld").toDF("text")
    assertEqual(docs, 5, None)
  }

  test("vocabulary exhaustion stops emission in both arms") {
    val docs = Seq("ab ab", "cd").toDF("text")
    // 'ab' fuses round 1-2 ('a b</w>' -> 'ab</w>'? symbols: a,b,</w>),
    // budget far past exhaustion: both arms must emit the same short table
    assertEqual(docs, 12, None)
  }

  test("generative: random short words over a tiny alphabet") {
    val rnd = new scala.util.Random(1717)
    val texts = Seq.fill(200) {
      Seq.fill(1 + rnd.nextInt(10))(
        Seq.fill(1 + rnd.nextInt(4))("abc".charAt(rnd.nextInt(3))).mkString)
        .mkString(" ")
    }
    assertEqual(texts.toDF("text"), 6, None)
  }
}
