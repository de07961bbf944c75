package graft.streaming

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.DataFrame

/** The ONE copy of the spill-store crash-recovery protocol shared by
  * [[DocMaintenance.autoExecOnArrival]] and [[Requeue]] (it used to be
  * inlined in both — a fix to one would have missed the other).
  *
  * Protocol: the store at `p` is rewritten via `.p.tmp` + delete +
  * rename. Crash windows and their recovery, in order:
  *  - crash mid-write of tmp → tmp lacks the parquet `_SUCCESS` commit
  *    marker → [[recover]] DELETES the partial tmp (the live store, if
  *    any, is intact; with no live store the rewrite never happened and
  *    the caller's at-least-once upstream redelivers);
  *  - crash between tmp commit and delete(p) → both exist → drop the
  *    tmp (p still holds every pending key, possibly plus already-
  *    handled ones — at-least-once);
  *  - crash between delete(p) and rename → tmp committed, p gone →
  *    promote the tmp: it IS the complete store.
  */
private[streaming] object AtomicSpill {

  def tmpOf(p: Path): Path = new Path(p.getParent, s".${p.getName}.tmp")

  /** Run the recovery protocol for the store at `p` (call at the top of
    * every trigger, before reading the store). */
  def recover(fs: FileSystem, p: Path): Unit = {
    val tmp = tmpOf(p)
    if (fs.exists(tmp)) {
      val committed = fs.exists(new Path(tmp, "_SUCCESS"))
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
    if (fs.exists(p)) fs.delete(p, true)
    fs.rename(tmp, p)
    ()
  }
}
