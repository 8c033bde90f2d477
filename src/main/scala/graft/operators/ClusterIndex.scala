package graft.operators

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{Column, DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Duplicate-cluster labels AT REST — the operational form of the dd7/dd8
  * family. The oracle-gated queries ([[DedupOps.dupClusters]],
  * [[DedupOps.clusterRetention]]) recompute the whole LSH + connected-
  * components pipeline per invocation, which is correct for a self-contained
  * gate but not how production dedup ships: there, the cluster labels are an
  * ARTIFACT materialized once and joined everywhere, maintained
  * incrementally as the corpus grows (the same at-rest treatment
  * [[VectorOps.writeIvfIndex]] gives the ANN family). The reference's dedup
  * surface is the per-pair episodic gate (qa_retrieval.py:146-202); this is
  * its corpus-scale operational shape.
  *
  * Layout under `path/`:
  *  - `labels/` — (doc_id, hs, n, n_words, component, keep, canonical),
  *    partitioned by `part` = hash-bucket of `component`. The label table
  *    AND the per-doc MinHash verify attributes in one artifact, so an
  *    append never recomputes shingle hashes for the existing corpus.
  *  - `edges/`  — (a, b, component), same component-bucket partitioning;
  *    the resolved pair graph, kept so a merge can re-run CC on ONLY the
  *    touched components' subgraph.
  *  - `bands/`  — (doc_id, bk), the at-rest LSH band index the incremental
  *    probe equi-joins against (plain parquet: the probe is a join on `bk`,
  *    not a partition lookup — at larger scale this table is the one to
  *    bucket by `bk`).
  *
  * Why bucket by component hash instead of one dir per component: near-dup
  * corpora have ~as many components as documents — millions of directories
  * is a metadata explosion. [[NumParts]] buckets make incremental
  * maintenance PHYSICAL partition work: an append reads only the buckets
  * holding touched components (partition pruning on `part`) and rewrites
  * only those buckets; every other bucket's files stay byte-identical
  * (asserted in ClusterIndexSpec). At 100 TB raise NumParts (e.g. 64k) so
  * one bucket rewrite stays a small, bounded slice of the corpus.
  */
object ClusterIndex {

  /** Component-bucket count. 64 keeps fixture artifacts readable while
    * still demonstrating pruning; the knob to raise with corpus size. */
  val NumParts = 64

  private def partOf(c: Column): Column =
    pmod(xxhash64(c), lit(NumParts.toLong)).cast("int")

  private val LabelCols = Seq("doc_id", "hs", "n", "n_words",
    "component", "keep", "canonical", "part")

  /** Full build over a (doc_id, text) corpus: LSH pair discovery →
    * connected components → retention (keep-the-most-complete, dd8's
    * policy), persisted under `path`. Same plan family as the dd7/dd8
    * gates; ClusterIndexSpec asserts label parity with them. */
  def write(corpus: DataFrame, path: String): Unit = {
    val docs = DedupOps.lshDocsOf(corpus)
    val pairs = DedupOps.lshPairsFromDocs(docs)
    val edges = pairs.select(col("a_id").as("a"), col("b_id").as("b"))
    val nWords = corpus.select(col("doc_id"),
      size(split(col("text"), " ")).as("n_words"))
    val cc = GraphOps.connectedComponents(
        corpus.select(col("doc_id").as("id")), edges)
      .select(col("id").as("doc_id"), col("component"))
      .localCheckpoint(eager = false) // feeds labels AND the edge bucketing
    retention(cc.join(nWords, "doc_id")
        .join(docs.select("doc_id", "hs", "n"), "doc_id"))
      .withColumn("part", partOf(col("component")))
      .select(LabelCols.map(col): _*)
      .write.mode(SaveMode.Overwrite).partitionBy("part").parquet(s"$path/labels")
    // an edge's endpoints share a component by definition; bucket by it
    edges.join(cc.select(col("doc_id").as("a"), col("component")), Seq("a"))
      .withColumn("part", partOf(col("component")))
      .select("a", "b", "component", "part")
      .write.mode(SaveMode.Overwrite).partitionBy("part").parquet(s"$path/edges")
    DedupOps.lshBandsOf(docs)
      .write.mode(SaveMode.Overwrite).parquet(s"$path/bands")
  }

  /** The persisted label table (doc_id, …, component, keep, canonical). */
  def labels(s: SparkSession, path: String): DataFrame =
    s.read.parquet(s"$path/labels")

  /** dd8's retention policy over (doc_id, component, n_words, …): keep
    * exactly one member per component — max word count, doc_id tie-break —
    * and label every member with the surviving canonical. */
  private def retention(members: DataFrame): DataFrame = {
    val w = Window.partitionBy("component")
      .orderBy(desc("n_words"), col("doc_id"))
    val wFull = w.rowsBetween(Window.unboundedPreceding,
      Window.unboundedFollowing)
    members
      .withColumn("keep", row_number().over(w) === 1)
      .withColumn("canonical", first("doc_id").over(wFull))
  }

  /** Incremental maintenance: fold a batch of NEW documents (doc_ids must
    * be disjoint from the stored corpus — the reference's UUID contract)
    * into the at-rest index, re-resolving ONLY the touched components.
    *
    * Steps, each bounded by the new batch + touched components (never the
    * stored corpus):
    *  1. band the new docs, probe the at-rest band index (equi-join on
    *     `bk`) for new×old candidates, self-join for new×new, verify
    *     exact Jaccard against the stored (hs, n) attributes;
    *  2. touched components = components of old endpoints of the found
    *     edges; their buckets are the ONLY label/edge partitions read
    *     (partition pruning on `part`) and the only ones rewritten;
    *  3. re-run [[GraphOps.connectedComponents]] on the touched subgraph
    *     (stored edges of touched components ∪ new edges) plus the new
    *     docs, recompute retention for exactly those members;
    *  4. physical write: affected buckets are deleted and rewritten with
    *     (their untouched components' rows ∪ re-resolved rows); rows whose
    *     component hashes elsewhere are APPENDED — pre-existing files in
    *     unaffected buckets are never modified (ClusterIndexSpec asserts
    *     byte-identity).
    *
    * Label parity with a full batch rebuild is exact, not approximate: the
    * band pipeline is deterministic, so old×old pair discovery equals the
    * stored edge set and components without a new edge cannot change.
    *
    * @return the affected bucket ids (diagnostics + spec assertions)
    */
  def append(newCorpus: DataFrame, path: String): Seq[Int] = {
    val s = newCorpus.sparkSession
    // eager: nd feeds candidate probing, verify lookup, and attrs below
    val nd = DedupOps.lshDocsOf(newCorpus).localCheckpoint(eager = true)
    val ndWords = newCorpus.select(col("doc_id"),
      size(split(col("text"), " ")).as("n_words"))
    val newBands = DedupOps.lshBandsOf(nd).localCheckpoint(eager = true)
    val oldBands = s.read.parquet(s"$path/bands")
    val oldLabels = labels(s, path)

    // 1. candidate pairs touching a new doc: new×new plus new×old
    val nn = newBands.as("a").join(newBands.as("b"),
        col("a.bk") === col("b.bk") && col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("a_id"), col("b.doc_id").as("b_id"))
    val no = newBands.as("a").join(oldBands.as("b"), Seq("bk"))
      .select(least(col("a.doc_id"), col("b.doc_id")).as("a_id"),
        greatest(col("a.doc_id"), col("b.doc_id")).as("b_id"))
      .filter(col("a_id") =!= col("b_id"))
    val lookup = nd.select("doc_id", "hs", "n")
      .unionByName(oldLabels.select("doc_id", "hs", "n"))
    val newEdges = DedupOps.lshVerify(nn.unionByName(no).distinct(), lookup)
      .select(col("a_id").as("a"), col("b_id").as("b"))
      .localCheckpoint(eager = true)

    // 2. touched components and their physical buckets
    val endpoints = newEdges.select(col("a").as("doc_id"))
      .unionByName(newEdges.select(col("b").as("doc_id"))).distinct()
    val touched = oldLabels.join(endpoints, Seq("doc_id"))
      .select("component").distinct().localCheckpoint(eager = true)
    // bounded by NumParts — bucket METADATA, the one collect this op allows
    val affectedParts = touched.select(partOf(col("component")).as("part"))
      .distinct().collect().map(_.getInt(0)).toSeq

    // 3. re-resolve the touched subgraph + all new docs
    val oldInParts = oldLabels.filter(col("part").isin(affectedParts: _*))
    val touchedMembers = oldInParts.join(touched, Seq("component"))
      .localCheckpoint(eager = true)
    val oldEdges = s.read.parquet(s"$path/edges")
    val oldEdgesTouched = oldEdges
      .filter(col("part").isin(affectedParts: _*))
      .join(touched, Seq("component"))
      .select("a", "b")
    val cc = GraphOps.connectedComponents(
        touchedMembers.select(col("doc_id").as("id"))
          .unionByName(nd.select(col("doc_id").as("id"))),
        newEdges.unionByName(oldEdgesTouched))
      .select(col("id").as("doc_id"), col("component"))
      .localCheckpoint(eager = false)
    val attrs = touchedMembers.select("doc_id", "hs", "n", "n_words")
      .unionByName(nd.select("doc_id", "hs", "n").join(ndWords, "doc_id")
        .select("doc_id", "hs", "n", "n_words"))
    val relabeled = retention(cc.join(attrs, "doc_id"))
      .withColumn("part", partOf(col("component")))
      .select(LabelCols.map(col): _*)
    val relabeledEdges = newEdges.unionByName(oldEdgesTouched)
      .join(cc.select(col("doc_id").as("a"), col("component")), Seq("a"))
      .withColumn("part", partOf(col("component")))
      .select("a", "b", "component", "part")

    // 4. physical write — keep rows of untouched components sharing an
    // affected bucket ride along in the rewrite. Write ORDER is part of
    // the crash contract: bands first, then edges, LABELS LAST — a doc
    // present in labels is therefore fully applied, so "in labels" is the
    // only membership test a caller needs (ClusterIndexSink's replay
    // guard). A crash between the writes re-runs the whole append on
    // redelivery and converges: candidate pairs are distinct'd, so the
    // duplicate band rows a re-run appends only add join work, and the
    // re-resolved edge rewrite recomputes the same components (pair
    // discovery was checkpointed before the first write landed).
    val keepLabels = oldInParts.join(touched, Seq("component"), "left_anti")
      .select(LabelCols.map(col): _*)
    val keepEdges = oldEdges.filter(col("part").isin(affectedParts: _*))
      .join(touched, Seq("component"), "left_anti")
      .select("a", "b", "component", "part")
    // safe here: nn/no candidate discovery materialized into newEdges'
    // eager checkpoint above, so the probe never sees these new rows
    newBands.write.mode(SaveMode.Append).parquet(s"$path/bands")
    rewriteBuckets(relabeledEdges.unionByName(keepEdges), affectedParts,
      s"$path/edges", s)
    rewriteBuckets(relabeled.unionByName(keepLabels), affectedParts,
      s"$path/labels", s)
    affectedParts
  }

  /** Replace exactly the affected `part=` bucket dirs (and append staged
    * files to any other bucket the rows hash into), two-phase: stage the
    * replacement rows as a complete durable parquet write FIRST, then
    * move staged files into their buckets with CHECKED renames (Hadoop
    * reports rename failure by returning false — an unchecked false here
    * nests dirs or strands rows, so any false aborts loudly). Appends to
    * unaffected buckets go first (pure gains), then each affected bucket
    * is swapped (retire the live dir, move the staged dir into place),
    * then the retired copies are dropped. No bucket is ever deleted
    * before its replacement exists on disk — a crash leaves every row
    * present in a live, staged, or retired location (dot-prefixed dirs
    * are invisible to parquet scans), unlike a delete-then-append whose
    * failure window loses the affected buckets outright. The residual
    * crash window is DUPLICATE-visible, not loss: appends landed but an
    * affected bucket not yet swapped still holds the old copy of a
    * migrated component until the swap completes — detectable (doc_id
    * multiplicity), and [[write]] rebuilds from the corpus. Orphaned
    * staging/retired dirs from a previous crashed run are cleared on
    * entry (single-writer maintenance is the contract, as with the IVF
    * index). At 100 TB this artifact graduates to a transactional table
    * format (commit-log semantics); the staged-rename protocol is the
    * dependency-free analog. Explicit swap (rather than dynamic
    * partition overwrite) also clears a bucket whose every component
    * migrated elsewhere, which dynamic overwrite would leave stale
    * because no new row lands in it. */
  private def rewriteBuckets(rows: DataFrame, affectedParts: Seq[Int],
      dir: String, s: SparkSession): Unit = {
    val fs = new Path(dir).getFileSystem(s.sparkContext.hadoopConfiguration)
    def renameOrFail(src: Path, dst: Path): Unit =
      if (!fs.rename(src, dst))
        throw new java.io.IOException(
          s"bucket swap aborted: rename $src -> $dst failed")
    // clear orphans from a previous crashed run before writing new ones.
    // Retired dirs are RESTORED first, not just deleted: a crash between
    // a bucket's retire-rename and its staged-rename leaves that bucket's
    // only copy under .retired-* — rename it back before dropping the dir
    // (if the staged rename did land, the live dir exists and the retired
    // copy is stale — deleted as before).
    Option(fs.listStatus(new Path(dir))).toSeq.flatten
      .map(_.getPath)
      .filter(p => p.getName.startsWith(".staging-") ||
        p.getName.startsWith(".retired-"))
      .foreach { orphan =>
        if (orphan.getName.startsWith(".retired-"))
          Option(fs.listStatus(orphan)).toSeq.flatten
            .filter(st => st.getPath.getName.startsWith("part="))
            .foreach { st =>
              val live = new Path(dir, st.getPath.getName)
              if (!fs.exists(live)) renameOrFail(st.getPath, live)
            }
        fs.delete(orphan, true)
      }
    val stamp = java.util.UUID.randomUUID().toString.take(8)
    val staging = new Path(dir, s".staging-$stamp")
    val retired = new Path(dir, s".retired-$stamp")
    // reads the live buckets, writes a durable copy; live files untouched
    rows.write.mode(SaveMode.Overwrite).partitionBy("part")
      .parquet(staging.toString)
    val affected = affectedParts.toSet
    // 1. rows can land OUTSIDE the affected buckets — a re-resolved
    // component's id (min member) can change, so its hash bucket moves,
    // and brand-new components hash wherever. Those buckets GAIN the
    // staged files without their existing ones being disturbed
    // (unaffected buckets are never rewritten, only appended to) — file
    // names carry a write-UUID so moves cannot collide. Gains go first
    // so a crash mid-protocol duplicates rather than loses.
    Option(fs.listStatus(staging)).toSeq.flatten
      .filter(st => st.isDirectory && st.getPath.getName.startsWith("part="))
      .foreach { st =>
        val p = st.getPath.getName.stripPrefix("part=").toInt
        if (!affected.contains(p)) {
          val live = new Path(s"$dir/part=$p")
          fs.mkdirs(live)
          fs.listStatus(st.getPath).foreach { f =>
            renameOrFail(f.getPath, new Path(live, f.getPath.getName))
          }
        }
      }
    // 2. swap the affected buckets
    fs.mkdirs(retired)
    affectedParts.foreach { p =>
      val live = new Path(s"$dir/part=$p")
      if (fs.exists(live)) renameOrFail(live, new Path(retired, s"part=$p"))
      val staged = new Path(staging, s"part=$p")
      if (fs.exists(staged)) renameOrFail(staged, live)
    }
    fs.delete(staging, true)
    fs.delete(retired, true)
  }
}
