package graft.streaming

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.DataFrame

/** The ONE copy of the spill-store crash-recovery protocol shared by
  * [[DocMaintenance.autoExecOnArrival]] and [[Requeue]] (it used to be
  * inlined in both — a fix to one would have missed the other).
  *
  * Protocol: the store at `p` is rewritten via `.p.tmp` + an OWN
  * commit marker (`_GRAFT_COMMIT`, created only after the parquet
  * write returns) + delete + rename. The marker is AtomicSpill's, not
  * parquet's `_SUCCESS`: deployments running with
  * `mapreduce.fileoutputcommitter.marksuccessfuljobs=false` emit no
  * `_SUCCESS`, and keying recovery on it would misjudge a fully
  * committed tmp as partial and DELETE it — silently dropping the
  * whole pending store in the delete(p)→rename crash window. Crash
  * windows and their recovery, in order:
  *  - crash mid-write of tmp (or before the marker lands) → tmp lacks
  *    `_GRAFT_COMMIT` → [[recover]] DELETES the partial tmp (the live
  *    store, if any, is intact; with no live store the rewrite never
  *    happened and the caller's at-least-once upstream redelivers);
  *  - crash between tmp commit and delete(p) → both exist → drop the
  *    tmp (p still holds every pending key, possibly plus already-
  *    handled ones — at-least-once);
  *  - crash between delete(p) and rename → tmp committed, p gone →
  *    promote the tmp: it IS the complete store.
  */
private[streaming] object AtomicSpill {

  def tmpOf(p: Path): Path = new Path(p.getParent, s".${p.getName}.tmp")

  private val Marker = "_GRAFT_COMMIT"

  private[streaming] def markerOf(tmp: Path): Path = new Path(tmp, Marker)

  /** Run the recovery protocol for the store at `p` (call at the top of
    * every trigger, before reading the store). */
  def recover(fs: FileSystem, p: Path): Unit = {
    val tmp = tmpOf(p)
    if (fs.exists(tmp)) {
      val committed = fs.exists(markerOf(tmp))
      if (committed && !fs.exists(p)) { fs.rename(tmp, p); () }
      else { fs.delete(tmp, true); () }
    }
  }

  /** Atomically replace the store at `p` with `df` (write tmp → commit
    * marker → delete live → rename), relying on [[recover]] for every
    * crash window. */
  def rewrite(df: DataFrame, fs: FileSystem, p: Path): Unit = {
    val tmp = tmpOf(p)
    df.write.mode("overwrite").parquet(tmp.toString)
    fs.create(markerOf(tmp), true).close()
    if (fs.exists(p)) fs.delete(p, true)
    fs.rename(tmp, p)
    ()
  }
}
