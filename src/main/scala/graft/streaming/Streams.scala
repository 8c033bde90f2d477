package graft.streaming

import java.sql.Timestamp
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode, StreamingQuery}

/** Structured Streaming surface (SURVEY §2.10).
  *
  * The reference is batch-only — its "interactivity" is a conversation loop
  * and a 2s file poll (bambooai/context_retrieval.py:46-78) — so this module
  * is the declared Spark extension: the same aggregates that run in batch
  * (A1-A4) run unchanged under event-time windows, and the reference's
  * activity/segment grouping (W6) becomes a stateful session operator.
  *
  * Scale: watermarking bounds state; tumbling windows shuffle once on
  * (window, key); `flatMapGroupsWithState` keeps one small state record per
  * key. All operators here are the canonical forms that survive a 1000-node
  * deployment without change.
  */
object Streams {

  /** Tumbling 1h event-time window with watermark — streaming form of
    * Relational.hourlyEvents. Works on any events-shaped source.
    *
    * The groupBy key is the FULL window struct, with `start` projected
    * after the agg: extracting the field inside the key strips the
    * event-time tag, so the unsupported-operation checker saw "aggregation
    * without watermark" and refused Append mode — leaving only Complete,
    * whose state never evicts (found by the round-13 late-data gate; the
    * old form only ever ran under Complete in tests, which masked it). */
  def hourlyCounts(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "1 hour")
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"), sum("value").as("total_value"))
      .select(col("window.start").as("hour"), col("event_type"),
        col("n"), col("total_value"))

  /** Sliding window (1h window, 15m slide) per event type. */
  def slidingCounts(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "1 hour")
      .groupBy(window(col("ts"), "1 hour", "15 minutes"), col("event_type"))
      .agg(count(lit(1)).as("n"))
      .select(col("window.start").as("wstart"), col("event_type"), col("n"))

  /** Built-in session windows: 30-minute gap, per user — the streaming form
    * of Relational.sessionize. */
  def sessionWindows(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "1 hour")
      .groupBy(session_window(col("ts"), "30 minutes").as("sw"), col("user_id"))
      .agg(count(lit(1)).as("n_events"), sum("value").as("total_value"))
      .select(col("user_id"), col("sw.start").as("session_start"),
        col("n_events"), col("total_value"))

  case class Event(ts: Timestamp, user_id: Long, event_type: String, value: Double)
  case class SessionState(start: Long, last: Long, n: Long, total: Double)
  case class SessionOut(user_id: Long, start_s: Long, n_events: Long,
      total_value: Double, closed_by_timeout: Boolean)

  /** Custom stateful sessionization via flatMapGroupsWithState — the explicit
    * state-machine form for when session semantics exceed session_window
    * (e.g. the reference's value-threshold segment close, W6). Emits a
    * session when the 30-minute gap is crossed within a batch or state times
    * out. */
  def statefulSessions(events: Dataset[Event]): Dataset[SessionOut] = {
    import events.sparkSession.implicits._
    val gapMs = 30L * 60 * 1000
    events
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[SessionState, SessionOut](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (userId: Long, it: Iterator[Event], state: GroupState[SessionState]) =>
          val sorted = it.toSeq.sortBy(e => (e.ts.getTime, e.value))
          var cur = state.getOption
          val out = Seq.newBuilder[SessionOut]
          sorted.foreach { e =>
            val t = e.ts.getTime
            cur match {
              case Some(s) if t - s.last > gapMs =>
                out += SessionOut(userId, s.start / 1000, s.n, s.total, false)
                cur = Some(SessionState(t, t, 1, e.value))
              case Some(s) =>
                cur = Some(SessionState(s.start, t, s.n + 1, s.total + e.value))
              case None =>
                cur = Some(SessionState(t, t, 1, e.value))
            }
          }
          cur.foreach(state.update)
          out.result().iterator
      }
  }

  /** Streaming exact dedup — the streaming form of dd1 (DedupOps.exactDedup):
    * keep the FIRST event per key, with dedup state bounded by the watermark
    * horizon (`dropDuplicatesWithinWatermark`). This is the only dedup form
    * that runs unbounded: plain dropDuplicates on a stream accumulates one
    * state row per distinct key forever, while the watermark variant evicts
    * keys older than the horizon — at 100 TB/day the state is a sliding
    * window of the horizon, not the corpus. Two events with the same key
    * farther apart than the horizon are both kept, by contract.
    * `tsCol` names the event-time column the watermark rides on (default
    * "ts", the fixture schema). */
  def dedupStream(events: DataFrame, keyCols: Seq[String],
      horizon: String = "1 hour", tsCol: String = "ts"): DataFrame =
    events
      .withWatermark(tsCol, horizon)
      .dropDuplicatesWithinWatermark(keyCols.toArray)

  /** Streaming D2: the rank-gated semantic upsert as a `foreachBatch` sink.
    * Each microbatch of candidate records `(id, v, rank)` is applied to the
    * running store through the SAME batch operator the dd5 oracle gates
    * ([[graft.operators.RankDedup.upsert]]), so streaming and batch
    * semantics cannot drift. The store keeps its vectors by joining the
    * upsert verdict (id, rank, status) back to the prior store ∪ batch
    * vectors on id — candidate ids must therefore be globally unique across
    * the stream (the reference's UUID ids are; qa_retrieval.py:173).
    *
    * Scale shape: state is re-materialized with an EAGER localCheckpoint
    * after every batch, so the store's plan stays one scan deep instead of
    * growing by one join per microbatch (the self-referential foreachBatch
    * state pattern); the banded sim-join inside upsert keeps each batch a
    * hash join, never store × batch. */
  final class RankUpsertSink(initialStore: DataFrame, dim: Int = 64,
      planesPerBand: Int = 0) {
    @volatile private var storeDf: DataFrame =
      initialStore.select(col("id"), col("v"), col("rank"))
        .localCheckpoint(eager = true)

    /** The current store (id, v, rank) — safe to read between batches. */
    def store: DataFrame = storeDf

    /** One microbatch application; also the direct entry for parity tests.
      * Idempotent under foreachBatch's at-least-once redelivery: a
      * replayed candidate that was already inserted appears in BOTH the
      * store and the batch, so the verdict-to-vectors join would fan out —
      * `dropDuplicates("id")` collapses it, and the re-run verdict itself
      * is a no-op (the candidate meets its stored copy at sim 1.0 with an
      * equal rank → discarded). */
    def processBatch(batch: DataFrame, batchId: Long): Unit = synchronized {
      if (!batch.isEmpty) {
        val verdict = graft.operators.RankDedup.upsert(storeDf, batch, dim,
          planesPerBand)
        val vectors = storeDf.select(col("id"), col("v"))
          .unionByName(batch.select(col("id"), col("v")))
          .dropDuplicates("id")
        storeDf = verdict.join(vectors, Seq("id"))
          .select(col("id"), col("v"), col("rank"))
          .localCheckpoint(eager = true)
      }
    }

    /** Attach to a candidate stream; processAllAvailable + [[store]] reads
      * the result deterministically on bounded sources. */
    def attach(candidates: DataFrame): StreamingQuery =
      candidates.writeStream
        .outputMode(OutputMode.Append())
        .foreachBatch((b: Dataset[org.apache.spark.sql.Row], id: Long) =>
          processBatch(b.toDF(), id))
        .start()
  }

  /** Streaming near-dup ADMISSION — the online form of the dedup family:
    * a document stream where each arrival is accepted only if it is not a
    * semantic near-duplicate (cosine ≥ 0.94, RankDedup.StrongThreshold) of
    * anything ALREADY ACCEPTED. Sequential semantics modulo LSH candidate
    * recall — match edges (store and in-batch alike) come from the banded
    * RP-LSH join, so a true ≥0.94 pair that misses every band (probability
    * ≤ ~1e-8 per pair at 8 bands × 4 planes) is invisible to the greedy;
    * given the found edges, the replay IS exact: a candidate blocked only
    * by a REJECTED earlier candidate is admitted (rejections leave no
    * trace), the greedy arrival-order independent-set rule; within a
    * microbatch, arrival order is id order.
    *
    * Hybrid shape, same philosophy as the dd7 AUTO path: the expensive
    * part — finding matches — runs distributed as the SAME banded RP-LSH
    * hash join the dd5 oracle gates (batch×store and batch×batch, never a
    * nested loop); the sequential greedy then replays arrival order over
    * the bounded per-batch match edges on the driver. State is the
    * accepted store, eagerly checkpointed per batch ([[RankUpsertSink]]'s
    * pattern). */
  final class NearDupAdmitSink(initialStore: DataFrame, dim: Int = 64,
      planesPerBand: Int = 4) {
    import graft.operators.RankDedup

    @volatile private var storeDf: DataFrame =
      initialStore.select(col("id"), col("v")).localCheckpoint(eager = true)

    /** The accepted set (id, v) — safe to read between batches. */
    def store: DataFrame = storeDf

    /** One microbatch admission; also the direct entry for parity tests. */
    def processBatch(batch0: DataFrame, batchId: Long): Unit = synchronized {
      if (batch0.isEmpty) return
      val s = batch0.sparkSession
      import s.implicits._
      // dropDuplicates: a redelivered or doubly-emitted id within one batch
      // would otherwise survive the admitted-set join twice and land as
      // duplicate rows in the accepted store (RankUpsertSink's same guard)
      val batch = batch0.select(col("id"), col("v"))
        .dropDuplicates("id")
        .localCheckpoint(eager = true)
      def ranked(df: DataFrame) = df.withColumn("rank", lit(0L))
      // matches against the accepted store: outright rejections
      val storeHits = RankDedup.bandedMatches(ranked(storeDf), ranked(batch),
          dim, planesPerBand, forceShuffle = false)
        .select(col("cid")).distinct()
        .collect().map(_.getLong(0)).toSet
      // batch-internal match edges, arrival(=id)-ordered
      val inner = RankDedup.bandedMatches(ranked(batch), ranked(batch),
          dim, planesPerBand, forceShuffle = false)
        .filter(col("sid") < col("cid"))
        .select(col("sid"), col("cid"))
        .collect().map(r => (r.getLong(0), r.getLong(1)))
      val earlier = inner.groupBy(_._2).map { case (c, ps) =>
        c -> ps.map(_._1).toSet
      }
      val admitted = scala.collection.mutable.LinkedHashSet.empty[Long]
      batch.select(col("id")).collect().map(_.getLong(0)).sorted.foreach { id =>
        if (!storeHits(id) &&
            !earlier.getOrElse(id, Set.empty[Long]).exists(admitted))
          admitted += id
      }
      if (admitted.nonEmpty)
        storeDf = storeDf
          .unionByName(batch.join(admitted.toSeq.toDF("id"), Seq("id")))
          .localCheckpoint(eager = true)
    }

    /** Attach to a document stream of (id, v) rows. */
    def attach(candidates: DataFrame): StreamingQuery =
      candidates.writeStream
        .outputMode(OutputMode.Append())
        .foreachBatch((b: Dataset[org.apache.spark.sql.Row], id: Long) =>
          processBatch(b.toDF(), id))
        .start()
  }

  /** The durable commit-log shared by the streaming index sinks: batchId
    * MARKERS (a marker means "fully applied"), PENDING batch copies (the
    * durable intent a crashed fold is repaired from), and the compact
    * `seen_ids` duplicate-submission sidecar with its loss-tolerant
    * compaction. Factored so [[ClusterIndexSink]] and [[IvfIndexSink]]
    * cannot drift on the protocol while differing only in their fold. */
  private[streaming] final class StreamCommitLog(indexPath: String,
      idCol: String) {
    import org.apache.hadoop.fs.{FileSystem, Path}
    import org.apache.spark.sql.SaveMode

    val commitsDir = new Path(s"$indexPath/_stream_commits")
    val seenIdsDir = new Path(commitsDir, "seen_ids")
    def marker(batchId: Long) = new Path(commitsDir, s"batch-$batchId")
    def pending(batchId: Long) = new Path(commitsDir, s"pending-$batchId")

    /** Sidecar file count that triggers compaction — small enough that
      * the per-batch anti-join never reads an unbounded file listing,
      * large enough that compaction is amortized over many batches. */
    private val CompactAfterFiles = 64

    def fs(s: SparkSession): FileSystem =
      commitsDir.getFileSystem(s.sparkContext.hadoopConfiguration)

    /** The streamed-ids sidecar as a one-column frame. */
    def seenIds(s: SparkSession): DataFrame =
      if (fs(s).exists(seenIdsDir))
        s.read.parquet(seenIdsDir.toString).select(idCol)
      else s.range(0).select(col("id").as(idCol))

    /** Anti-join a deduplicated batch against the sidecar — bounded by the
      * STREAMED id count, never the index artifact. */
    def fresh(batch: DataFrame): DataFrame =
      batch.dropDuplicates(idCol)
        .join(seenIds(batch.sparkSession), Seq(idCol), "left_anti")

    /** Record a fold's ids; call BEFORE the marker so a marker always
      * means fully recorded (a crash between them at worst duplicates
      * sidecar rows — anti-join semantics unaffected). */
    def recordIds(df: DataFrame): Unit = {
      df.select(idCol).write.mode(SaveMode.Append).parquet(seenIdsDir.toString)
      compactSeenIds(df.sparkSession)
    }

    def commit(s: SparkSession, batchId: Long): Unit = {
      val f = fs(s)
      f.mkdirs(commitsDir)
      f.create(marker(batchId)).close()
      f.delete(pending(batchId), true)
    }

    /** Pending batchIds whose marker is missing (crashed folds), oldest
      * first; pendings whose marker landed are cleaned up here. */
    def orphans(s: SparkSession): Seq[Long] = {
      val f = fs(s)
      if (!f.exists(commitsDir)) return Nil
      Option(f.listStatus(commitsDir)).toSeq.flatten
        .map(_.getPath).filter(_.getName.startsWith("pending-"))
        .map(p => p.getName.stripPrefix("pending-").toLong)
        .sorted
        .filter { id =>
          if (f.exists(marker(id))) { f.delete(pending(id), true); false }
          else true
        }
    }

    /** Rewrite the sidecar as one file once it fragments past
      * [[CompactAfterFiles]]. Loss-tolerant by design (a lost sidecar row
      * only costs re-probe work downstream), so plain write-aside + swap
      * suffices — no staged-rename protocol. */
    private def compactSeenIds(s: SparkSession): Unit = {
      val f = fs(s)
      val files = Option(f.listStatus(seenIdsDir)).toSeq.flatten
        .count(_.getPath.getName.endsWith(".parquet"))
      if (files <= CompactAfterFiles) return
      val tmp = new Path(commitsDir, "seen_ids_compact_tmp")
      f.delete(tmp, true)
      s.read.parquet(seenIdsDir.toString).select(idCol).distinct()
        .coalesce(1)
        .write.mode(SaveMode.Overwrite).parquet(tmp.toString)
      f.delete(seenIdsDir, true)
      if (!f.rename(tmp, seenIdsDir))
        throw new java.io.IOException(
          s"sidecar compaction: rename $tmp -> $seenIdsDir failed")
    }
  }

  /** Streaming maintenance of the AT-REST duplicate-cluster index: each
    * microbatch of (doc_id, text) documents is folded into the persisted
    * label artifact through the SAME incremental operator the batch gates
    * pin ([[graft.operators.ClusterIndex.append]]) — new docs probe the
    * stored band index, only touched components re-resolve, untouched
    * buckets stay byte-identical. This is the operational chain a
    * production ingest runs: documents arrive continuously, cluster
    * labels stay current ON DISK, and every downstream consumer joins the
    * artifact instead of recomputing LSH + connected components
    * ([[NearDupAdmitSink]] is the admission-decision variant of the same
    * idea; this one persists the full cluster structure).
    *
    * Correct under foreachBatch's at-least-once redelivery AND under a
    * crash anywhere inside the fold, three layers:
    *
    *  1. A durable PENDING copy of each deduplicated batch is written
    *     under `_stream_commits/pending-<batchId>` BEFORE the fold starts,
    *     and a committed batchId MARKER after it finishes (the standard
    *     idempotent-foreachBatch pattern). A pending dir without its
    *     marker is a crashed fold; [[processBatch]] repairs every such
    *     orphan on entry by RE-RUNNING the fold from the pending copy —
    *     sound because [[graft.operators.ClusterIndex.append]] is
    *     idempotent for resubmitted doc_ids (it force-touches their
    *     stored components), so a re-run closes even the duplicate-visible
    *     window a crash between rewriteBuckets' gains and swaps leaves
    *     (stale rows of a migrated component in an unswapped bucket
    *     alongside the new copy — the state a labels anti-join alone
    *     would skip forever, since the new docs ARE labeled).
    *  2. Duplicate SUBMISSIONS (the same doc arriving again in a later
    *     batch) are dropped by an anti-join against a compact
    *     `_stream_commits/seen_ids` sidecar — one doc_id column, appended
    *     per committed batch — instead of scanning the full label
    *     artifact (whose rows carry the wide shingle-hash sets) every
    *     batch. The sidecar read is bounded by the STREAMED id count, not
    *     the corpus. This guard is an optimization, not a correctness
    *     layer: a miss (e.g. resubmission of a doc seeded by `write`,
    *     which the sidecar never saw) is absorbed idempotently by the
    *     force-touch path, at the cost of one touched component.
    *  3. The sidecar self-compacts past [[CompactAfterFiles]] batch files
    *     (read → single-file rewrite → swap). A crash mid-compaction can
    *     at worst LOSE sidecar rows, which by (2) only costs work, never
    *     correctness — the loss-tolerant shape is what keeps compaction
    *     dependency-free.
    *
    * The index must be seeded by [[graft.operators.ClusterIndex.write]]
    * (a non-empty corpus) before attaching. Appends are synchronized and
    * the artifact's [[graft.operators.MaintenanceLock]] fences concurrent
    * writers: single-writer maintenance is the contract. */
  final class ClusterIndexSink(path: String) {
    import graft.operators.ClusterIndex
    import org.apache.hadoop.fs.FileSystem
    import org.apache.spark.sql.SaveMode

    private val log = new StreamCommitLog(path, "doc_id")

    private def fs(s: SparkSession): FileSystem = log.fs(s)

    /** The duplicate-submission guard's plan, exposed for the spec that
      * asserts it probes the compact sidecar, never the label artifact. */
    private[graft] def freshDocs(batch: DataFrame): DataFrame =
      log.fresh(batch.select(col("doc_id"), col("text")))

    /** One microbatch fold; also the direct entry for parity tests. */
    def processBatch(batch0: DataFrame, batchId: Long): Unit = synchronized {
      val s = batch0.sparkSession
      val f = fs(s)
      repairPending(s) // close any crashed fold before taking new work
      if (f.exists(log.marker(batchId))) return // redelivery of applied batch
      if (batch0.isEmpty) return
      val fresh = freshDocs(batch0).localCheckpoint(eager = true)
      if (fresh.head(1).nonEmpty) {
        // durable intent FIRST: the fold below can crash mid-rewrite, and
        // the repair path must be able to re-run the exact same batch
        fresh.write.mode(SaveMode.Overwrite)
          .parquet(log.pending(batchId).toString)
        foldPending(s, batchId)
      } else {
        log.commit(s, batchId) // nothing to fold, batch applied
      }
    }

    /** Fold a durable pending batch and commit it: append → sidecar ids →
      * marker → drop pending. Re-runs are idempotent because
      * [[graft.operators.ClusterIndex.append]] absorbs resubmitted doc_ids
      * (force-touch), so the repair path simply folds again. */
    private def foldPending(s: SparkSession, batchId: Long): Unit = {
      val docs = s.read.parquet(log.pending(batchId).toString)
      ClusterIndex.append(docs, path)
      log.recordIds(docs)
      log.commit(s, batchId)
    }

    /** Re-run every pending batch whose marker is missing (a crashed
      * fold), oldest first. */
    private def repairPending(s: SparkSession): Unit =
      log.orphans(s).foreach(id => foldPending(s, id))

    /** Attach to a document stream of (doc_id, text) rows. */
    def attach(docs: DataFrame): StreamingQuery =
      docs.writeStream
        .outputMode(OutputMode.Append())
        .foreachBatch((b: Dataset[org.apache.spark.sql.Row], id: Long) =>
          processBatch(b.toDF(), id))
        .start()
  }

  /** Streaming maintenance of the AT-REST IVF index — the vector twin of
    * [[ClusterIndexSink]]: each microbatch of (vec_id, v) rows appends
    * through the format-aware [[graft.operators.VectorOps.appendToIvfIndex]]
    * (full-precision, SQ8, and IVF-PQ indexes all take the same stream).
    *
    * Same commit-log protocol, different repair: IVF append is NOT
    * idempotent (a re-append lands duplicate rows), so a crashed fold is
    * repaired by DELETING the pending batch's vec_ids from the index
    * (removing whatever partial append survived — a no-op when the crash
    * hit before any rows landed) and then re-appending from the durable
    * pending copy. Delete-then-append from the same durable input makes
    * the fold idempotent even though the underlying append is not; the
    * happy path never pays the delete. The index must be seeded by one of
    * the writers before attaching; single-writer maintenance per the
    * [[graft.operators.MaintenanceLock]] contract. */
  final class IvfIndexSink(path: String) {
    import graft.operators.VectorOps
    import org.apache.spark.sql.SaveMode

    private val log = new StreamCommitLog(path, "vec_id")

    /** The duplicate-submission guard, sidecar-bounded like the sink's. */
    private[graft] def freshVecs(batch: DataFrame): DataFrame =
      log.fresh(batch.select(col("vec_id"), col("v")))

    def processBatch(batch0: DataFrame, batchId: Long): Unit = synchronized {
      val s = batch0.sparkSession
      repairPending(s)
      if (log.fs(s).exists(log.marker(batchId))) return
      if (batch0.isEmpty) return
      val fresh = freshVecs(batch0).localCheckpoint(eager = true)
      if (fresh.head(1).nonEmpty) {
        fresh.write.mode(SaveMode.Overwrite)
          .parquet(log.pending(batchId).toString)
        foldPending(s, batchId, repair = false)
      } else log.commit(s, batchId)
    }

    private def foldPending(s: SparkSession, batchId: Long,
        repair: Boolean): Unit = {
      val vecs = s.read.parquet(log.pending(batchId).toString)
      // only the repair path pays the delete scan: a fresh fold cannot
      // have landed rows yet, a crashed one may have landed any prefix
      if (repair) VectorOps.deleteFromIvfIndex(vecs.select("vec_id"), path)
      VectorOps.appendToIvfIndex(vecs, path)
      log.recordIds(vecs)
      log.commit(s, batchId)
    }

    private def repairPending(s: SparkSession): Unit =
      log.orphans(s).foreach(id => foldPending(s, id, repair = true))

    /** Attach to a vector stream of (vec_id, v) rows. */
    def attach(vectors: DataFrame): StreamingQuery =
      vectors.writeStream
        .outputMode(OutputMode.Append())
        .foreachBatch((b: Dataset[org.apache.spark.sql.Row], id: Long) =>
          processBatch(b.toDF(), id))
        .start()
  }

  /** Streaming maintenance of the AT-REST span-gram inventory — the third
    * sink over the shared [[StreamCommitLog]] protocol: microbatches of
    * (doc_id, text) documents append their carrier facts through
    * [[graft.operators.SpanIndex.append]], so ingest-time boilerplate
    * scrubbing ([[graft.operators.SpanIndex.probeScrub]]) always probes a
    * current inventory. Repair is the SIMPLEST of the three sinks:
    * SpanIndex.append is idempotent BY ITSELF (its docs/-commit guard skips
    * already-committed ids, and the duplicate carrier rows a crashed fold
    * can leave are read-harmless and collapsed by compaction), so a
    * crashed fold is repaired by just re-running it — no delete pass
    * (IVF), no force-touch re-resolution (cluster index). */
  final class SpanIndexSink(path: String) {
    import graft.operators.SpanIndex
    import org.apache.spark.sql.SaveMode

    private val log = new StreamCommitLog(path, "doc_id")

    /** Duplicate-submission guard, sidecar-bounded like the other sinks'. */
    private[graft] def freshDocs(batch: DataFrame): DataFrame =
      log.fresh(batch.select(col("doc_id"), col("text")))

    def processBatch(batch0: DataFrame, batchId: Long): Unit = synchronized {
      val s = batch0.sparkSession
      repairPending(s)
      if (log.fs(s).exists(log.marker(batchId))) return
      if (batch0.isEmpty) return
      val fresh = freshDocs(batch0).localCheckpoint(eager = true)
      if (fresh.head(1).nonEmpty) {
        fresh.write.mode(SaveMode.Overwrite)
          .parquet(log.pending(batchId).toString)
        foldPending(s, batchId)
      } else log.commit(s, batchId)
    }

    private def foldPending(s: SparkSession, batchId: Long): Unit = {
      val docs = s.read.parquet(log.pending(batchId).toString)
      SpanIndex.append(docs, path)
      log.recordIds(docs)
      log.commit(s, batchId)
    }

    private def repairPending(s: SparkSession): Unit =
      log.orphans(s).foreach(id => foldPending(s, id))

    /** Attach to a document stream of (doc_id, text) rows. */
    def attach(docs: DataFrame): StreamingQuery =
      docs.writeStream
        .outputMode(OutputMode.Append())
        .foreachBatch((b: Dataset[org.apache.spark.sql.Row], id: Long) =>
          processBatch(b.toDF(), id))
        .start()
  }

  /** The full curation-ingest loop over the span inventory: each
    * microbatch is SCRUBBED against the index as it stood before the
    * batch ([[graft.operators.SpanIndex.probeScrub]] — corpus-known
    * boilerplate is cut from the new docs), the cleaned rows land under
    * `outPath/batch-<id>/`, and THEN the raw batch folds into the index
    * ([[graft.operators.SpanIndex.append]]) so every later batch sees
    * this one's spans. Scrub-before-append is a correctness requirement,
    * not a style choice: after the append, the batch's own intra-batch
    * duplicates would count as ≥2 stored carriers and a REPLAYED fold
    * would cut spans the original did not — so the repair path reuses the
    * already-written per-batch output when it exists (its parquet
    * `_SUCCESS` is the completion marker; the overwrite is idempotent
    * otherwise) and only re-runs the idempotent append. Intra-batch span
    * dedup is deliberately NOT this sink's job — that is dd9/dd10's batch
    * pass; the ingest cut handles what the CORPUS already carries. */
  final class ScrubIngestSink(indexPath: String, outPath: String) {
    import graft.operators.SpanIndex
    import org.apache.hadoop.fs.Path
    import org.apache.spark.sql.SaveMode

    private val log = new StreamCommitLog(indexPath, "doc_id")

    private def cleanedDir(batchId: Long) = s"$outPath/batch-$batchId"

    def processBatch(batch0: DataFrame, batchId: Long): Unit = synchronized {
      val s = batch0.sparkSession
      repairPending(s)
      if (log.fs(s).exists(log.marker(batchId))) return
      if (batch0.isEmpty) return
      val fresh = log.fresh(batch0.select(col("doc_id"), col("text")))
        .localCheckpoint(eager = true)
      if (fresh.head(1).nonEmpty) {
        fresh.write.mode(SaveMode.Overwrite)
          .parquet(log.pending(batchId).toString)
        foldPending(s, batchId)
      } else log.commit(s, batchId)
    }

    private def foldPending(s: SparkSession, batchId: Long): Unit = {
      val docs = s.read.parquet(log.pending(batchId).toString)
      val done = new Path(cleanedDir(batchId), "_SUCCESS")
      if (!done.getFileSystem(s.sparkContext.hadoopConfiguration)
          .exists(done)) {
        // scrub against the PRE-append index state (see class doc)
        SpanIndex.probeScrub(docs, indexPath)
          .write.mode(SaveMode.Overwrite).parquet(cleanedDir(batchId))
      }
      SpanIndex.append(docs, indexPath)
      log.recordIds(docs)
      log.commit(s, batchId)
    }

    private def repairPending(s: SparkSession): Unit =
      log.orphans(s).foreach(id => foldPending(s, id))

    /** All cleaned batches as one frame — [[Streams.cleanedCorpus]] over
      * this sink's output dir. */
    def cleaned(s: SparkSession): DataFrame = cleanedCorpus(s, outPath)

    def attach(docs: DataFrame): StreamingQuery =
      docs.writeStream
        .outputMode(OutputMode.Append())
        .foreachBatch((b: Dataset[org.apache.spark.sql.Row], id: Long) =>
          processBatch(b.toDF(), id))
        .start()
  }

  /** The crawl-ingest front door END TO END: a landing directory of
    * `.warc` archives streams through record framing
    * ([[graft.sources.Sources.warcStream]]), h1 extraction and h2
    * quality curation (the same narrow expressions the oracle-gated
    * batch queries run — stateless projections, so the stream needs no
    * rewrite), into a [[ScrubIngestSink]]: each microbatch is scrubbed
    * against the span index as it stood BEFORE the batch and then folded
    * in, so corpus-known boilerplate is cut from every later wave. Only
    * cleanly-framed `response` records that pass the h2 quality gate
    * reach the corpus; `doc_id` at this grain is `xxhash64(url)` — the
    * 64-bit keyspace the at-rest indexes already use. Returns the sink
    * (for [[ScrubIngestSink.cleaned]]) and the running query.
    *
    * Scale shape: framing + extraction + scoring are narrow (scan-speed,
    * no shuffle — the h1/h2 plan pins hold unchanged here); the only
    * wide work per microbatch is the scrub probe and index fold, both
    * priced at 10x in BASELINE §5. At 100 TB the landing dir is the
    * crawler hand-off bucket and archives are the unit of admission —
    * exactly Common Crawl's layout. */
  def crawlIngest(s: SparkSession, landingDir: String, indexPath: String,
      outPath: String): (ScrubIngestSink, StreamingQuery) = {
    import graft.operators.TextOps
    val recs = graft.sources.Sources.warcStream(s, landingDir)
    val curated = TextOps.webCurationOver(TextOps.htmlExtractOver(
        recs.filter(col("warc_type") === "response" && col("framing_valid"))
          .select(xxhash64(col("url")).as("doc_id"),
            col("body").as("html"))))
      .filter(col("keep"))
      .select(col("doc_id"), col("clean_text").as("text"))
    val sink = new ScrubIngestSink(indexPath, outPath)
    (sink, sink.attach(curated))
  }

  /** The scrubbed-corpus CONSUMER CONTRACT: one stable table over a
    * [[ScrubIngestSink]]'s per-batch output dirs. Unions exactly the
    * COMMITTED batches — dirs whose parquet write finished (Spark's
    * `_SUCCESS` marker; the sink never rewrites a batch dir once that
    * marker exists, so a committed dir's content is final even while the
    * batch's index append is still being crash-repaired). A crashed
    * batch's partial dir is excluded until its replay recommits it, and
    * an outPath with no committed batches yet returns an EMPTY frame
    * with the scrub schema instead of a path-not-found error — so a
    * downstream curation job can point at the dir unconditionally. */
  def cleanedCorpus(s: SparkSession, outPath: String): DataFrame = {
    import org.apache.spark.sql.types._
    val (committed, _) = cleanedDirs(s, outPath)
    if (committed.isEmpty)
      s.createDataFrame(s.sparkContext.emptyRDD[org.apache.spark.sql.Row],
        StructType(Seq(
          StructField("doc_id", LongType),
          StructField("n_cut_spans", IntegerType),
          StructField("chars_cut", LongType),
          StructField("clean_text", StringType))))
    else s.read.parquet(committed.sorted: _*)
  }

  /** The committed batch dirs the view serves, minus any dir a committed
    * consolidation has absorbed (its `_sources` manifest — exclusion by
    * manifest, not by deletion, is what makes the crash window between a
    * consolidation landing and its sources being deleted DUPLICATE-FREE),
    * plus the absorbed-but-not-yet-deleted leftovers for the janitor. */
  private def cleanedDirs(s: SparkSession,
      outPath: String): (Seq[String], Seq[org.apache.hadoop.fs.Path]) = {
    import org.apache.hadoop.fs.Path
    val root = new Path(outPath)
    val fs = root.getFileSystem(s.sparkContext.hadoopConfiguration)
    if (!fs.exists(root)) return (Seq.empty, Seq.empty)
    val committed = fs.listStatus(root).filter(_.isDirectory).map(_.getPath)
      .filter(p => p.getName.startsWith("batch-") &&
        fs.exists(new Path(p, "_SUCCESS")))
    val absorbed = committed.filter(p => fs.exists(new Path(p, "_sources")))
      .flatMap { p =>
        val in = fs.open(new Path(p, "_sources"))
        try scala.io.Source.fromInputStream(in, "UTF-8").getLines().toList
        finally in.close()
      }.toSet
    val (leftover, live) = committed.partition(p => absorbed(p.getName))
    (live.map(_.toString).toSeq, leftover.toSeq)
  }

  /** Consolidate a [[ScrubIngestSink]]'s per-batch output: a long-running
    * ingest lands one dir per microbatch FOREVER, so the consumer view's
    * path list (and the filesystem's dir count) grows without bound — the
    * small-files problem on the streaming output path, the same disease
    * [[graft.operators.ClusterIndex.compact]] treats at rest. This folds
    * every currently-committed batch dir (including earlier
    * consolidations) into ONE new committed dir and retires the sources.
    *
    * CRASH-safe at every step: the consolidated rows are staged under a
    * dot-prefixed dir (invisible to the view), its `_sources` manifest
    * is written INSIDE, and a single rename exposes both atomically —
    * from that instant [[cleanedCorpus]] excludes the absorbed sources
    * by manifest, so the window where sources still exist on disk
    * serves NO duplicate rows, and a crash before the rename leaves
    * only a dot-prefixed orphan the next run clears on entry. Source
    * deletion is the lazy janitor tail: a crash mid-delete leaves dirs
    * the manifest already excludes, swept by the next consolidation.
    *
    * Concurrency contract: a view RESOLVED while consolidation runs is
    * duplicate-free but not existence-safe — a reader that listed the
    * source dirs before the janitor deletes them can hit a missing
    * path mid-scan. Like the index rebucket, this is a quiesced
    * maintenance op: run it on the compact cadence with readers (and
    * rival consolidations — fence via
    * [[graft.operators.MaintenanceLock]] if scheduled) off the dir;
    * the SINK appending new batch dirs concurrently is fine.
    * Returns the number of source dirs absorbed (0 = nothing to do). */
  def compactCleaned(s: SparkSession, outPath: String,
      minDirs: Int = 2): Int = {
    import org.apache.hadoop.fs.Path
    val root = new Path(outPath)
    val fs = root.getFileSystem(s.sparkContext.hadoopConfiguration)
    // a crash between the staging write and the rename strands a FULL
    // corpus copy under .consolidating-* — restartable garbage (the
    // rename is the commit), cleared on entry or it accumulates per crash
    if (fs.exists(root))
      fs.listStatus(root).map(_.getPath)
        .filter(_.getName.startsWith(".consolidating-"))
        .foreach(p => fs.delete(p, true))
    val (live, leftover) = cleanedDirs(s, outPath)
    // janitor: sources a previous crash left behind are already
    // manifest-excluded — just drop them
    leftover.foreach(p => fs.delete(p, true))
    if (live.length < minDirs) return 0
    val stamp = java.util.UUID.randomUUID().toString.take(8)
    val staging = new Path(root, s".consolidating-$stamp")
    s.read.parquet(live.sorted: _*)
      .write.mode(org.apache.spark.sql.SaveMode.Overwrite)
      .parquet(staging.toString)
    val names = live.map(p => new Path(p).getName)
    val out = fs.create(new Path(staging, "_sources"), true)
    try out.write((names.sorted.mkString("\n") + "\n").getBytes("UTF-8"))
    finally out.close()
    val target = new Path(root, s"batch-c$stamp")
    if (!fs.rename(staging, target))
      throw new java.io.IOException(
        s"consolidation aborted: rename $staging -> $target failed")
    names.foreach(n => fs.delete(new Path(root, n), true))
    names.length
  }

  /** Drive any of the above against a bounded parquet dir through a real
    * streaming query into a memory sink; returns the sink table name. Used by
    * tests and the streaming demo — `processAllAvailable` makes it
    * deterministic. Stateful aggregations use Complete mode; row-emitting
    * operators (dedup) use Append. */
  def runToMemory(spark: SparkSession, transformed: DataFrame,
      name: String, mode: OutputMode = OutputMode.Complete()): Unit = {
    val q = transformed.writeStream
      .outputMode(mode)
      .format("memory").queryName(name)
      .start()
    q.processAllAvailable()
    q.stop()
  }
}
