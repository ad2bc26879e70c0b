package graft.streaming

/** Batch-keyed on-disk state layout shared by the streaming
  * components: every state write lands in `<root>/batch=<id>` with
  * overwrite semantics, so foreachBatch's replay contract (a batch
  * whose processing did not commit is re-delivered with the SAME
  * epochId) makes each write idempotent — a replay overwrites its own
  * earlier partial output instead of accumulating a second copy, and
  * readers of "history" take only ids strictly before the batch being
  * processed. The `batch=<id>` naming is deliberately hive-style so a
  * plain `spark.read.parquet(root)` still works for consumers (the
  * partition column surfaces as `batch`). */
object StreamingState {

  private val BatchRe = "^batch=(\\d+)$".r

  def batchDir(root: String, batchId: Long): String = s"$root/batch=$batchId"

  /** Committed batch ids under `root`, ascending (a dir counts once it
    * holds at least one parquet part — an empty mkdir is not a commit). */
  def batchIds(root: String): Seq[Long] = {
    val d = new java.io.File(root)
    if (!d.isDirectory) Seq.empty
    else d.listFiles().toSeq.flatMap { f =>
      f.getName match {
        case BatchRe(id) if f.isDirectory &&
          f.listFiles().exists(_.getName.endsWith(".parquet")) => Some(id.toLong)
        case _ => None
      }
    }.sorted
  }

  /** The batch directories holding ids strictly before `before`
    * (all of them when `before` is None), ascending. */
  def batchDirs(root: String, before: Option[Long] = None): Seq[String] =
    batchIds(root)
      .filter(id => before.forall(id < _))
      .map(batchDir(root, _))

  /** Drop snapshot dirs older than the `keep` most recent ids at or
    * below `upTo` — dim-snapshot hygiene (replays only ever go back to
    * the last uncommitted batch, so a short tail is safe to prune). */
  def pruneBefore(root: String, upTo: Long, keep: Int): Unit = {
    val stale = batchIds(root).filter(_ <= upTo).dropRight(keep)
    stale.foreach { id =>
      val dir = new java.io.File(batchDir(root, id))
      dir.listFiles().foreach(_.delete())
      dir.delete()
    }
  }
}
