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

  test("WordVecEmbedder: real model file drives the seam end-to-end") {
    import graft.lifecycle.EpisodicMemory.WordVecEmbedder
    // a GloVe-format model file with a word2vec-style header — written
    // here because the FORMAT is the contract (any real GloVe/fastText
    // .vec drop-in works); vectors chosen so pooling is hand-checkable
    val dir = new java.io.File("target/wordvec"); dir.mkdirs()
    val path = s"$dir/mini.vec"
    java.nio.file.Files.writeString(java.nio.file.Paths.get(path),
      """4 3
        |hot 1.0 0.0 0.0
        |warm 0.8 0.2 0.0
        |cold 0.0 0.0 1.0
        |ice 0.1 0.0 0.9
        |""".stripMargin)
    val e = new WordVecEmbedder(path)
    assert(e.dim == 3)
    // mean-pool + L2: "hot warm" -> mean(0.9, 0.1, 0) normalized
    val hw = e.embed("hot warm")
    val n = math.sqrt(0.9 * 0.9 + 0.1 * 0.1)
    assert(math.abs(hw(0) - 0.9 / n) < 1e-9 && math.abs(hw(1) - 0.1 / n) < 1e-9)
    // OOV-only text embeds to the zero vector, mixed text ignores OOV
    assert(e.embed("zzz qqq") == Seq(0.0, 0.0, 0.0))
    assert(e.embed("hot zzz") == e.embed("hot"))
    // the real model ranks plausibly where the hash stand-in cannot:
    // "hot warm" is closer to "hot" than to "cold ice"
    def cos(a: Seq[Double], b: Seq[Double]) =
      a.zip(b).map { case (x, y) => x * y }.sum
    assert(cos(hw, e.embed("hot")) > cos(hw, e.embed("cold ice")))
    // e2e through the distributed op: the factory ships the PATH; the
    // matrix loads per JVM (executor), not per row
    val df = Seq((1L, "hot warm"), (2L, "cold ice")).toDF("id", "text")
    val out = EmbedOps.embedColumn(df, "text", "emb",
      () => new WordVecEmbedder(path))
      .collect().map(r => r.getLong(0) -> r.getSeq[Double](2)).toMap
    assert(out(1L) == e.embed("hot warm") && out(2L) == e.embed("cold ice"))
    // the JVM cache shares one parsed model across instances
    assert(WordVecEmbedder.load(path) eq WordVecEmbedder.load(path))
    // malformed model fails loudly at first use, not as zero vectors
    val badPath = s"$dir/bad.vec"
    java.nio.file.Files.writeString(java.nio.file.Paths.get(badPath),
      "hot 1.0 0.0\ncold 1.0\n")
    intercept[IllegalArgumentException] {
      new WordVecEmbedder(badPath).embed("hot")
    }
    // a HEADERLESS 1-d model whose first vocab token is numeric must not
    // lose that entry to the word2vec-header heuristic: the putative
    // header's <dim> (7) disagrees with the next row's width (1), so the
    // first line is data
    val numPath = s"$dir/numeric_first.vec"
    java.nio.file.Files.writeString(java.nio.file.Paths.get(numPath),
      "2020 7\nword 3\n")
    val ne = graft.lifecycle.EpisodicMemory.WordVecEmbedder.load(numPath)
    assert(ne.dim == 1 && ne.vecs.keySet == Set("2020", "word"))
    assert(ne.vecs("2020")(0) == 7.0f)
    // while a REAL header whose dim matches the data width is consumed
    val hdrPath = s"$dir/with_header.vec"
    java.nio.file.Files.writeString(java.nio.file.Paths.get(hdrPath),
      "2 1\nup 1\ndown 2\n")
    val he = graft.lifecycle.EpisodicMemory.WordVecEmbedder.load(hdrPath)
    assert(he.dim == 1 && he.vecs.keySet == Set("up", "down"))
  }
}
