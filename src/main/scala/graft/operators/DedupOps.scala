package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deduplication operators for the training-data pipeline surface:
  * exact (hash group), MinHash+LSH (shingle → minhash → band → bucket join →
  * Jaccard verify), and SimHash fingerprints.
  *
  * The reference's dedup is the episodic-memory replace gate
  * (qa_retrieval.py:146-202: replace iff sim ≥ strong-threshold and new rank
  * higher); these operators generalize it to corpus-scale text dedup.
  *
  * Scale notes (the 100 TB shape):
  * - exact dedup is one hash-shuffle on md5(text) — Spark's groupBy gives
  *   map-side partial aggregation of the min-id;
  * - MinHash signatures/bands are a narrow projection (no shuffle); the only
  *   shuffles are the band-key self-join (bounded by bucket sizes, the whole
  *   point of LSH) and the Jaccard verify on candidate pairs only;
  * - SimHash is a narrow word-explode + one groupBy(doc) — at scale the
  *   explode stays inside the stage, so cost is O(total tokens).
  *
  * MinHash uses md5-string minima as the hash family: min over shingles of
  * md5(seed || '|' || shingle). String minima are engine-portable (the DuckDB
  * oracle computes the identical signature), deterministic, and seed-indexed.
  *
  * The corpus for the dup-finding queries plants perturbed copies
  * (doc_id+100000, text + ' zz qq vv' for doc_id % 17 == 0) so every scale
  * factor contains known near-duplicates; the fixture corpus itself is
  * dup-free below sf0.1.
  */
object DedupOps {
  import graft.Q.{Q, documents}

  private val NumHashes = 12
  private val BandSize = 3
  private val NumBands = NumHashes / BandSize
  private val SimBits = 24

  // ---- exact dedup ----

  /** Exact dedup: canonical = min doc_id per content hash. Plants IDENTICAL
    * copies (doc_id+100000) so exact duplicates exist at every sf. */
  def exactDedup: Q = (s, d) => {
    val docs = documents(s, d).select(col("doc_id"), col("text"))
    val corpus = docs.unionByName(docs.filter(col("doc_id") % 17 === 0)
      .select((col("doc_id") + 100000).as("doc_id"), col("text")))
    val w = Window.partitionBy(md5(col("text")))
    corpus.select(col("doc_id"), min("doc_id").over(w).as("canonical"))
      .withColumn("is_dup", col("doc_id") =!= col("canonical"))
  }

  // ---- MinHash + LSH ----

  /** Spark-side shingle expression (3-word shingles over `words`). */
  private val shinglesExprSpark =
    """transform(sequence(0, greatest(size(words)-3, 0)),
      | i -> array_join(slice(words, i+1, 3), ' '))""".stripMargin
  private val shinglesExprDuck =
    "list_transform(range(0, greatest(len(words)-3, 0) + 1)," +
      " i -> array_to_string(words[(i+1):(i+3)], ' '))"

  private def sigExprDuck(j: Int) =
    s"list_min(list_transform(shingles, x -> md5(concat('$j|', x))))"

  private def bandCols(sig: Int => String): Seq[String] =
    (0 until NumBands).map { b =>
      val parts = (0 until BandSize).map(k => sig(b * BandSize + k))
      s"md5(concat(${parts.mkString(", ")}))"
    }

  private def plantedCorpus(s: SparkSession, d: String): DataFrame = {
    val docs = documents(s, d).select(col("doc_id"), col("text"))
    docs.unionByName(docs.filter(col("doc_id") % 17 === 0)
      .select((col("doc_id") + 100000).as("doc_id"),
        concat(col("text"), lit(" zz qq vv")).as("text")))
  }
  private val corpusSql =
    """SELECT doc_id, text FROM documents UNION ALL
      | SELECT doc_id + 100000 AS doc_id, text || ' zz qq vv' AS text
      | FROM documents WHERE doc_id % 17 = 0""".stripMargin

  val exactDedupOracle: String =
    s"""WITH corpus AS (SELECT doc_id, text FROM documents UNION ALL
       |  SELECT doc_id + 100000 AS doc_id, text FROM documents
       |  WHERE doc_id % 17 = 0)
       |SELECT doc_id, min(doc_id) OVER (PARTITION BY md5(text)) AS canonical,
       | doc_id <> min(doc_id) OVER (PARTITION BY md5(text)) AS is_dup
       |FROM corpus""".stripMargin

  /** MinHash signatures → LSH band bucket keys per document (the index-build
    * side of LSH dedup).
    *
    * Shape: per-document array ops (`array_min(transform(shingles, ...))`)
    * — a pure map-side projection with NO shuffle. The explode +
    * groupBy(doc).agg(min×k) alternative was measured ~40% slower at sf0.1
    * and adds a shuffle of |corpus|·|shingles| rows, which at 100 TB is the
    * difference between a scan-speed pass and a multi-TB exchange. */
  def minhashBands: Q = (s, d) => {
    val sigs = (0 until NumHashes).map(j =>
      expr(s"array_min(transform(shingles, x -> md5(concat('$j|', x))))")
        .as(s"sig$j"))
    val bands = bandCols(j => s"sig$j").zipWithIndex.map {
      case (e, b) => expr(e).as(s"band_$b")
    }
    plantedCorpus(s, d)
      .select(col("doc_id"), split(col("text"), " ").as("words"))
      .select(col("doc_id"), expr(shinglesExprSpark).as("shingles"))
      .select(col("doc_id") +: sigs: _*)
      .select(col("doc_id") +: bands: _*)
  }

  val minhashBandsOracle: String = {
    val sigs = (0 until NumHashes).map(j => s"${sigExprDuck(j)} AS sig$j")
    val bands = bandCols(j => s"sig$j").zipWithIndex
      .map { case (e, b) => s"$e AS band_$b" }
    s"""WITH corpus AS ($corpusSql),
       | w AS (SELECT doc_id, string_split(text, ' ') AS words FROM corpus),
       | sh AS (SELECT doc_id, $shinglesExprDuck AS shingles FROM w),
       | sigs AS (SELECT doc_id, ${sigs.mkString(", ")} FROM sh)
       |SELECT doc_id, ${bands.mkString(", ")} FROM sigs""".stripMargin
  }

  /** LSH candidate pairs (shared band bucket) verified by exact n-gram
    * Jaccard ≥ 0.4 — the full dedup-pair pipeline. */
  def lshJaccardPairs: Q = (s, d) => {
    // bands feed a self-join and the shingle set feeds three joins — cache
    // both so the 12-hash minhash projection runs once, not per branch.
    val bands = minhashBands(s, d)
      .select(col("doc_id"), explode(array(
        (0 until NumBands).map(b => col(s"band_$b")): _*)).as("bk"))
      .cache()
    val cand = bands.as("a").join(bands.as("b"),
        col("a.bk") === col("b.bk") && col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("a_id"), col("b.doc_id").as("b_id"))
      .distinct()
    val shingleSet = plantedCorpus(s, d)
      .select(col("doc_id"), split(col("text"), " ").as("words"))
      .select(col("doc_id"), explode(expr(shinglesExprSpark)).as("sh"))
      .distinct()
      .cache()
    val counts = shingleSet.groupBy("doc_id").agg(count(lit(1)).as("n"))
    val inter = cand
      .join(shingleSet.as("x"), col("a_id") === col("x.doc_id"))
      .join(shingleSet.as("y"),
        col("b_id") === col("y.doc_id") && col("x.sh") === col("y.sh"))
      .groupBy("a_id", "b_id").agg(count(lit(1)).as("ninter"))
    inter
      .join(counts.as("ca"), col("a_id") === col("ca.doc_id"))
      .join(counts.as("cb"), col("b_id") === col("cb.doc_id"))
      .select(col("a_id"), col("b_id"),
        round(col("ninter") /
          (col("ca.n") + col("cb.n") - col("ninter")).cast("double"), 6)
          .as("jaccard"))
      .filter(col("jaccard") >= 0.4)
  }

  val lshJaccardPairsOracle: String = {
    val sigs = (0 until NumHashes).map(j => s"${sigExprDuck(j)} AS sig$j")
    val bandList = bandCols(j => s"sig$j").mkString(", ")
    s"""WITH corpus AS ($corpusSql),
       | w AS (SELECT doc_id, string_split(text, ' ') AS words FROM corpus),
       | shl AS (SELECT doc_id, $shinglesExprDuck AS shingles FROM w),
       | sigs AS (SELECT doc_id, ${sigs.mkString(", ")} FROM shl),
       | bands AS (SELECT doc_id, unnest([$bandList]) AS bk FROM sigs),
       | cand AS (SELECT DISTINCT a.doc_id AS a_id, b.doc_id AS b_id
       |   FROM bands a JOIN bands b ON a.bk = b.bk AND a.doc_id < b.doc_id),
       | shd AS (SELECT DISTINCT doc_id, unnest(shingles) AS sh FROM shl),
       | cnt AS (SELECT doc_id, count(*) AS n FROM shd GROUP BY doc_id),
       | inter AS (SELECT c.a_id, c.b_id, count(*) AS ninter FROM cand c
       |   JOIN shd x ON x.doc_id = c.a_id
       |   JOIN shd y ON y.doc_id = c.b_id AND y.sh = x.sh
       |   GROUP BY c.a_id, c.b_id)
       |SELECT a_id, b_id,
       | round(ninter / CAST(ca.n + cb.n - ninter AS DOUBLE), 6) AS jaccard
       |FROM inter JOIN cnt ca ON a_id = ca.doc_id JOIN cnt cb ON b_id = cb.doc_id
       |WHERE round(ninter / CAST(ca.n + cb.n - ninter AS DOUBLE), 6) >= 0.4""".stripMargin
  }

  // ---- SimHash ----

  private val hexDigitsSpark = (0 until 6).map(p =>
    s"(instr('0123456789abcdef', substring(h, ${p + 1}, 1)) - 1) * ${math.pow(16, 5 - p).toLong}")
  private val hexDigitsDuck = (0 until 6).map(p =>
    s"(strpos('0123456789abcdef', substr(h, ${p + 1}, 1)) - 1) * ${math.pow(16, 5 - p).toLong}")

  private def contribExpr(wh: String, b: Int): String =
    s"CASE WHEN ($wh & ${1L << b}) != 0 THEN 1 ELSE -1 END"
  private def simhashExpr: String =
    (0 until SimBits).map(b =>
      s"CASE WHEN s_$b > 0 THEN ${1L << b} ELSE 0 END").mkString(" + ")

  /** SimHash: 24-bit per-document fingerprint from word-hash bit votes
    * (weighted by word frequency). Near-dups differ in few bits. */
  def simhash: Q = (s, d) => {
    val sums = (0 until SimBits).map(b =>
      sum(expr(contribExpr("wh", b))).as(s"s_$b"))
    documents(s, d)
      .select(col("doc_id"), explode(split(col("text"), " ")).as("word"))
      .select(col("doc_id"), md5(col("word")).as("h"))
      .select(col("doc_id"), expr(hexDigitsSpark.mkString(" + ")).as("wh"))
      .groupBy("doc_id").agg(sums.head, sums.tail: _*)
      .select(col("doc_id"), expr(simhashExpr).cast("bigint").as("simhash"))
  }

  val simhashOracle: String = {
    val sums = (0 until SimBits).map(b =>
      s"sum(${contribExpr("wh", b)}) AS s_$b")
    s"""WITH words AS (SELECT doc_id, unnest(string_split(text, ' ')) AS word
       |  FROM documents),
       | hashes AS (SELECT doc_id, md5(word) AS h FROM words),
       | wh AS (SELECT doc_id, ${hexDigitsDuck.mkString(" + ")} AS wh FROM hashes),
       | votes AS (SELECT doc_id, ${sums.mkString(", ")} FROM wh GROUP BY doc_id)
       |SELECT doc_id, CAST($simhashExpr AS BIGINT) AS simhash FROM votes""".stripMargin
  }
}
