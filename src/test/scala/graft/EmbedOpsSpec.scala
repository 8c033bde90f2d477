package graft

import org.apache.spark.sql.functions._
import graft.lifecycle.EpisodicMemory.{Embedder, HashEmbedder}
import graft.operators.EmbedOps

class EmbedOpsSpec extends SparkSpec {
  import spark.implicits._

  test("embedColumn matches per-row embed and preserves all input columns") {
    val df = Seq((1L, "alpha beta", "x"), (2L, "gamma delta", "y"),
      (3L, null.asInstanceOf[String], "z")).toDF("id", "text", "tag")
    val out = EmbedOps.embedColumn(df, "text", "emb", () => new HashEmbedder(16))
    assert(out.columns.toSeq == Seq("id", "text", "tag", "emb"))
    val got = out.collect().map(r => r.getLong(0) -> r.getSeq[Double](3)).toMap
    val ref = new HashEmbedder(16)
    assert(got(1L) == ref.embed("alpha beta"))
    assert(got(2L) == ref.embed("gamma delta"))
    assert(got(3L) == ref.embed("")) // nulls embed as empty text, not NPE
  }

  test("batching feeds embedBatch in bounded groups via a per-partition model") {
    // embedder that records batch sizes through its output (dim-1 vectors
    // carrying the batch size), proving texts flow through embedBatch in
    // groups bounded by batchSize
    class BatchProbe extends Embedder {
      val dim = 1
      def embed(text: String): Seq[Double] = Seq(1.0)
      override def embedBatch(texts: Seq[String]): Seq[Seq[Double]] =
        texts.map(_ => Seq(texts.size.toDouble))
    }
    val df = (1 to 10).map(i => (i, s"t$i")).toDF("id", "text").repartition(1)
    val out = EmbedOps.embedColumn(df, "text", "emb", () => new BatchProbe, batchSize = 4)
    val sizes = out.collect().map(_.getSeq[Double](2).head).toSeq
    // 10 rows in one partition at batch 4 → batches of 4, 4, 2
    assert(sizes.count(_ == 4.0) == 8 && sizes.count(_ == 2.0) == 2)
    assert(sizes.forall(_ <= 4.0))
  }
}
