package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.CosineSimilarity

/** D2 semantic dedup-by-rank — the reference's episodic-memory upsert
  * (bambooai/qa_retrieval.py:146-202):
  *
  * for each candidate record:
  *  - rank < 6 → dropped (MIN_USER_RANK_TO_CONSIDER, :160);
  *  - best existing match with cosine ≥ strong threshold
  *    0.80 + 0.7·(1-0.80) = 0.94 (:164-167):
  *      · candidate rank > existing rank → candidate inserted, existing
  *        deleted (:196-198);
  *      · otherwise → candidate discarded;
  *  - no qualifying match → candidate inserted (:200-202).
  *
  * Expressed Spark-first as set algebra: best-match via window row_number
  * over the sim-join, then (store ∖ replaced) ∪ accepted. The reference
  * applies candidates one-by-one; this operator applies a batch, which is
  * equivalent whenever candidates don't match each other (guaranteed here by
  * the ≥0.94 threshold against a candidate set drawn from distinct sources).
  *
  * Scale: the sim-join is the LSH-bucketed join from DedupOps at 100 TB
  * (BucketedRandomProjectionLSH-style blocking) — the ≥0.94 gate makes the
  * candidate pair set tiny after blocking.
  */
object RankDedup {
  import graft.Q.{Q, embeddings}

  val StrongThreshold = 0.94
  val MinRank = 6

  /** Batch upsert: returns the resulting store (id, rank, status). */
  def upsert(store: DataFrame, cand: DataFrame): DataFrame = {
    val sim = expr("cosine_sim(cv, sv)")
    val matches = cand.select(col("id").as("cid"), col("v").as("cv"),
        col("rank").as("crank"))
      .join(store.select(col("id").as("sid"), col("v").as("sv"),
        col("rank").as("srank")), sim >= StrongThreshold)
      .withColumn("msim", sim)
    // best feeds both the accept and the replace branch — materialize it
    // once so the similarity nested-loop join (the expensive part) doesn't
    // run twice. localCheckpoint rather than cache(): upsert runs once per
    // conversation turn (EpisodicMemory.store), and a cache() entry per
    // call would accumulate in the CacheManager for the session's lifetime;
    // checkpoint blocks are released when the plan is GC'd.
    val best = matches
      .withColumn("rn", row_number().over(
        Window.partitionBy("cid").orderBy(desc("msim"), col("sid"))))
      .filter(col("rn") === 1)
      .select(col("cid"), col("crank"), col("sid"), col("srank"))
      .localCheckpoint(eager = false)
    val eligible = cand.filter(col("rank") >= MinRank)
    val accepted = eligible.join(best, eligible("id") === best("cid"), "left")
      .filter(col("cid").isNull || col("rank") > col("srank"))
      .select(col("id"), col("rank"), lit("inserted").as("status"))
    val replaced = best
      .join(eligible.select(col("id").as("eid")), col("cid") === col("eid"))
      .filter(col("crank") > col("srank"))
      .select(col("sid")).distinct()
    val kept = store.join(replaced, store("id") === replaced("sid"), "left_anti")
      .select(col("id"), col("rank"), lit("kept").as("status"))
    kept.unionByName(accepted)
  }

  /** Oracle-gated query: store = embeddings with rank = vec_id % 11;
    * candidates = every 3rd vector re-submitted with rank (vec_id+5) % 11.
    * Identical vectors give sim 1.0 ≥ 0.94 against exactly their source
    * (random cross-pairs stay below 0.94 — verified ≤ 0.51 in the fixture),
    * so every replace/discard/insert branch is exercised deterministically. */
  def rankUpsertQuery: Q = (s, d) => {
    CosineSimilarity.register(s)
    val e = embeddings(s, d).select(col("vec_id"),
      col("embedding").cast("array<double>").as("v"))
    val store = e.select(col("vec_id").as("id"), col("v"),
      (col("vec_id") % 11).as("rank"))
    val cand = e.filter(col("vec_id") % 3 === 0)
      .select((col("vec_id") + 10000).as("id"), col("v"),
        ((col("vec_id") + 5) % 11).as("rank"))
    upsert(store, cand)
  }

  val oracle: String =
    s"""WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
       | store AS (SELECT vec_id AS id, v, vec_id % 11 AS rank FROM e),
       | cand AS (SELECT vec_id + 10000 AS id, v, (vec_id + 5) % 11 AS rank
       |   FROM e WHERE vec_id % 3 = 0),
       | matches AS (SELECT c.id AS cid, c.rank AS crank, s.id AS sid,
       |   s.rank AS srank,
       |   row_number() OVER (PARTITION BY c.id ORDER BY
       |     list_dot_product(c.v, s.v) / (sqrt(list_dot_product(c.v, c.v)) *
       |      sqrt(list_dot_product(s.v, s.v))) DESC, s.id) AS rn
       |  FROM cand c JOIN store s ON
       |   list_dot_product(c.v, s.v) / (sqrt(list_dot_product(c.v, c.v)) *
       |    sqrt(list_dot_product(s.v, s.v))) >= $StrongThreshold),
       | best AS (SELECT cid, crank, sid, srank FROM matches WHERE rn = 1),
       | eligible AS (SELECT id, rank FROM cand WHERE rank >= $MinRank),
       | accepted AS (SELECT e2.id, e2.rank, 'inserted' AS status
       |   FROM eligible e2 LEFT JOIN best b ON b.cid = e2.id
       |   WHERE b.cid IS NULL OR e2.rank > b.srank),
       | replaced AS (SELECT DISTINCT b.sid FROM best b
       |   JOIN eligible e3 ON b.cid = e3.id WHERE b.crank > b.srank)
       |SELECT id, rank, 'kept' AS status FROM store
       | WHERE id NOT IN (SELECT sid FROM replaced)
       |UNION ALL SELECT id, rank, status FROM accepted""".stripMargin
}
