package graft.operators

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession

/** Whole-artifact staged-swap protocol for the GEOMETRY STEP-UP (rebucket)
  * lifecycle op shared by [[ClusterIndex]] and [[SpanIndex]].
  *
  * Why this exists: both at-rest artifacts intentionally pin appends to the
  * STORED `_meta` geometry (re-deriving from the grown corpus would
  * silently re-hash every bucket assignment), but the bucket-count
  * derivations ([[OperatingPoint.clusterIndexParts]] /
  * [[OperatingPoint.bandIndexBuckets]]) hold per-bucket volume flat only if
  * the geometry tracks the corpus. After enough appends, per-bucket volume
  * is a multiple of the design point and probe/maintenance costs quietly
  * grow. Rebucket re-derives the geometry from the CURRENT corpus size and
  * rewrites the artifact under it — the one op allowed to change `_meta`.
  *
  * Unlike [[ClusterIndex.rewriteBuckets]] (which swaps individual bucket
  * dirs inside a fixed geometry), a geometry change invalidates EVERY
  * bucket assignment at once, so the unit of atomicity is the whole
  * sub-artifact dir. Protocol, all under the caller's [[MaintenanceLock]]:
  *
  *  1. BUILD: write the complete re-bucketed artifact (every data dir plus
  *     its new `_meta`) under `path/.rebucket-staging/`. Live dirs are
  *     only read. A crash here leaves the live artifact untouched; the
  *     partial staging is rolled BACK (deleted) by [[repair]].
  *  2. COMMIT POINT: create the empty marker `path/.rebucket-commit`.
  *     From here the swap is roll-FORWARD obligated: the marker is only
  *     ever written after the staging is complete, so [[repair]] can
  *     always finish from it.
  *  3. SWAP: per data dir, retire the live dir into
  *     `path/.rebucket-retired/` and move the staged dir into place
  *     (checked renames — Hadoop reports failure by returning false, and
  *     an unchecked false would nest dirs or strand rows). Idempotent
  *     under re-run: a dir whose staged copy is already gone was swapped
  *     by the crashed predecessor and is skipped.
  *  4. META LAST: promote `staging/_meta` over `path/_meta`. Only now do
  *     probes/appends see the new geometry; the staged data it describes
  *     is already live.
  *  5. CLEANUP: drop marker, retired copies, staging shell.
  *
  * Readers are NOT safe concurrent with a geometry swap (unlike the
  * fixed-geometry bucket rewrites, where an unaffected bucket's files stay
  * byte-identical): a reader that loaded the old `_meta` and prunes
  * against swapped dirs can miss rows. Rebucket is a quiesced-maintenance
  * op — schedule it like a compaction window. Crash at ANY step is
  * repaired by [[repair]], which every maintenance entry point of both
  * artifacts calls first (one `exists` probe when healthy).
  */
private[graft] object GeometrySwap {

  private val StagingName = ".rebucket-staging"
  private val MarkerName = ".rebucket-commit"
  private val RetiredName = ".rebucket-retired"

  def stagingPath(path: String): String = s"$path/$StagingName"

  /** Test-only crash injection (the same failpoint pattern as
    * [[ClusterIndex.failpoint]]): `"after-marker"` throws with the commit
    * marker durable but no dir swapped; `"after-swap"` throws with every
    * dir swapped but the OLD `_meta` still live — the two windows
    * [[repair]] must roll forward from. Null in production. */
  private[graft] val failpoint =
    new java.util.concurrent.atomic.AtomicReference[String](null)

  private def maybeFail(stage: String): Unit =
    if (failpoint.get == stage)
      throw new IllegalStateException(s"rebucket failpoint $stage")

  private def fsOf(s: SparkSession, path: String) =
    new Path(path).getFileSystem(s.sparkContext.hadoopConfiguration)

  private def renameOrFail(fs: org.apache.hadoop.fs.FileSystem,
      src: Path, dst: Path): Unit =
    if (!fs.rename(src, dst))
      throw new java.io.IOException(
        s"rebucket swap aborted: rename $src -> $dst failed")

  /** Steps 2-5: marker, per-dir swap, meta promotion, cleanup.
    * `promoteMeta` copies the staged `_meta` over the live one (each
    * artifact owns its meta format). Safe to re-run: every rename is
    * guarded by existence checks. */
  def commit(s: SparkSession, path: String, dirs: Seq[String],
      promoteMeta: () => Unit): Unit = {
    val fs = fsOf(s, path)
    val marker = new Path(path, MarkerName)
    if (!fs.exists(marker)) fs.create(marker, true).close()
    maybeFail("after-marker")
    val staging = new Path(path, StagingName)
    val retired = new Path(path, RetiredName)
    fs.mkdirs(retired)
    dirs.foreach { d =>
      val staged = new Path(staging, d)
      if (fs.exists(staged)) {
        val live = new Path(path, d)
        if (fs.exists(live)) renameOrFail(fs, live, new Path(retired, d))
        renameOrFail(fs, staged, live)
      }
    }
    maybeFail("after-swap")
    promoteMeta()
    fs.delete(marker, false)
    fs.delete(retired, true)
    fs.delete(staging, true)
  }

  /** Converge a crashed rebucket: with the commit marker present the
    * staging is complete, so roll FORWARD (finish [[commit]]); without it
    * any staging/retired residue is a partial build or post-meta cleanup
    * debris, rolled BACK (deleted). Called at the top of every locked
    * maintenance op of both artifacts — a healthy artifact pays one
    * `exists` probe. */
  def repair(s: SparkSession, path: String, dirs: Seq[String],
      promoteMeta: () => Unit): Unit = {
    val fs = fsOf(s, path)
    if (fs.exists(new Path(path, MarkerName)))
      commit(s, path, dirs, promoteMeta)
    else Seq(StagingName, RetiredName).foreach { n =>
      val p = new Path(path, n)
      if (fs.exists(p)) fs.delete(p, true)
    }
  }
}
