package graft.store

import org.apache.hadoop.fs.{FileSystem, Path}

/** The newest-generation liveness rule, shared by every counted/folded
  * generation table in the repo (the streaming curation store's
  * `batch_id=` parts, [[graft.frontier.GraphIndex]]'s `delta_id=` parts):
  * a directory's LIVE parts are the newest `compact_C` dir plus every
  * delta dir with id > C. Stale dirs (already folded, or superseded
  * compact generations) are ignored by readers and swept opportunistically;
  * `_tmp_*` dirs (crashed writes pending atomic rename) match neither
  * prefix and are invisible. One copy of the rule — the two stores had
  * drifted into byte-identical private twins.
  */
object Generations {

  val CompactPrefix = "compact_"

  /** Highest compaction generation present under `dir` (-1 if none). */
  def maxCompactGen(fs: FileSystem, dir: String): Long = {
    val p = new Path(dir)
    if (!fs.exists(p)) -1L
    else fs.listStatus(p).toSeq.map(_.getPath.getName)
      .filter(_.startsWith(CompactPrefix))
      .map(_.stripPrefix(CompactPrefix).toLong)
      .foldLeft(-1L)(math.max)
  }

  /** Live part dirs under `dir`: newest compact + every `deltaPrefix`N
    * with N > that generation (minus `excludeDelta`, for writers that must
    * not read their own in-flight part).
    */
  def livePaths(fs: FileSystem, dir: String, deltaPrefix: String,
      excludeDelta: Long = Long.MinValue): Seq[String] = {
    val p = new Path(dir)
    if (!fs.exists(p)) return Seq.empty
    val gen = maxCompactGen(fs, dir)
    val names = fs.listStatus(p).toSeq.map(_.getPath)
    val compacted = names.filter(_.getName == s"$CompactPrefix$gen")
    val deltas = names
      .filter(_.getName.startsWith(deltaPrefix))
      .filter { q =>
        val id = q.getName.stripPrefix(deltaPrefix).toLong
        id > gen && id != excludeDelta
      }
    (compacted ++ deltas).map(_.toString)
  }

  /** Next delta id: above every on-disk delta AND the compact generation. */
  def nextDeltaId(fs: FileSystem, dir: String, deltaPrefix: String): Long = {
    val p = new Path(dir)
    val maxDelta =
      if (!fs.exists(p)) -1L
      else fs.listStatus(p).toSeq.map(_.getPath.getName)
        .filter(_.startsWith(deltaPrefix))
        .map(_.stripPrefix(deltaPrefix).toLong)
        .foldLeft(-1L)(math.max)
    math.max(maxDelta, maxCompactGen(fs, dir)) + 1L
  }
}
