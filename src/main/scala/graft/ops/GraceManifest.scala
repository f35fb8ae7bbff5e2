package graft.ops

import org.apache.hadoop.fs.{FileSystem, Path}

/** THE grace-period reclamation protocol, factored to one
  * implementation (r17 verdict task 2: `Scale.compact` and
  * `Dedup.compactCanonIndex` each hand-rolled the read-manifest /
  * age-check / carry-forward / publish-last block, one divergence
  * away from a protocol bug). Every deferred-delete index compaction
  * (generic [[Scale.compact]]`(deferDeletes = true)` behind the
  * minhash-LSH / sign-plane / substring compactions, and the canon
  * fold) drives its `_GARBAGE` manifest through these four calls.
  *
  * ==Manifest format==
  * One entry per line: `<doomedAtEpochMs>\t<qualified path>`. The
  * timestamp is PER ENTRY (r17 advice: the old whole-manifest mtime
  * grace reset on every rewrite, so any compaction cadence shorter
  * than the grace carried garbage forward forever — reclamation
  * needed a quiet gap longer than the grace). Entries now age out
  * INDIVIDUALLY: a pass that dooms new files merely appends fresh
  * entries; the old ones keep their original doom stamps and reclaim
  * on schedule regardless of churn. Legacy bare-path lines (pre-r18)
  * parse with doomedAt = the manifest file's mtime — at worst LATER
  * than the true doom time (rewrites refresh mtime), which only
  * delays their reclamation, never reclaims early.
  *
  * ==Clock model (r17 verdict task 3)==
  * A doom stamp is the DOOMING writer's `System.currentTimeMillis()`;
  * the age check compares it against the RECLAIMING writer's clock —
  * two different hosts on a real cluster. If the doomer's clock runs
  * AHEAD of the reclaimer's by S, the entry just looks younger
  * (reclamation delayed — safe). If it runs BEHIND by S, the entry
  * looks S older, silently shrinking the reader window — so for
  * graceMs > 0 the reclaim threshold is `graceMs + SkewMarginMs`:
  * any cross-writer skew up to [[SkewMarginMs]] can never shrink the
  * effective reader grace below `graceMs` (larger skew eats into it
  * linearly; NTP-disciplined fleets sit orders of magnitude under a
  * minute). No `require` floor on graceMs is needed under this
  * ADDITIVE margin — a small positive grace still yields an effective
  * window ≥ SkewMarginMs, unlike a subtract-the-margin design.
  * `graceMs = 0` bypasses the margin entirely: that is the explicit
  * maintenance-window mode (reclaim NOW, no concurrent readers by
  * operator contract).
  *
  * Reader guarantee restated under this model: a reader lists the
  * layout and excludes manifest-doomed files up front
  * ([[Scale.readLive]]); a file in its listing is doomed at some
  * Td ≥ its listing time and deleted no earlier than
  * Td + graceMs + SkewMarginMs on the reclaimer's clock ≥
  * Td + graceMs on the reader's own clock (skew ≤ margin) — so any
  * probe shorter than graceMs is structurally safe, and the bounded
  * FNF retry absorbs the pathological rest.
  *
  * ==Publish visibility==
  * The manifest is rewritten via temp file + rename (r17 advice: the
  * old in-place `create(overwrite = true)` let a concurrent reader
  * observe a TRUNCATED manifest). Where the store supports an atomic
  * overwrite rename (local, HDFS) the swap is invisible; elsewhere
  * the fallback delete + rename shows readers a brief NO-manifest
  * window — they admit doomed files transiently (value-invisible
  * duplicates under this mode's set/semilattice contract), but never
  * a half-written entry list. Abandoned temp files from crashed
  * writers are invisible to readers (underscore prefix) and are
  * swept by [[reclaimExpired]] once aged.
  */
private[graft] object GraceManifest {

  val Name = "_GARBAGE"

  /** Cross-writer clock-skew allowance added on top of graceMs > 0 —
    * see the clock model above.
    */
  val SkewMarginMs: Long = 60L * 1000L

  def manifestPath(dir: Path): Path = new Path(dir, Name)

  private def readText(fs: FileSystem, p: Path): String = {
    val in = fs.open(p)
    try new String(org.apache.hadoop.io.IOUtils.readFullyToByteArray(in), "UTF-8")
    finally in.close()
  }

  /** Parse the manifest: qualified path → doomedAt epoch ms. Missing
    * manifest → empty. Legacy bare-path lines stamp the manifest's
    * own mtime (see format notes).
    *
    * Bounded retry on two TRANSIENT read races a concurrent publish
    * can expose (both caught live by the race specs): (1) on a local
    * ChecksumFileSystem the data file and its `.crc` sidecar swap as
    * TWO renames, so a reader between them sees new bytes under the
    * old checksum — ChecksumException; (2) on the no-FileContext
    * fallback swap (and the empty-publish delete) the manifest is
    * briefly absent between this reader's exists() and open() —
    * FileNotFoundException. Both windows are microseconds; persistent
    * failures propagate.
    */
  def read(fs: FileSystem, dir: Path): Map[String, Long] = {
    var left = 5
    while (true) {
      val m = manifestPath(dir)
      if (!fs.exists(m)) return Map.empty
      try {
        val mtime = fs.getFileStatus(m).getModificationTime
        return readText(fs, m).split("\n").filter(_.nonEmpty).map { line =>
          line.split("\t", 2) match {
            case Array(ts, p) if ts.nonEmpty && ts.forall(_.isDigit) => p -> ts.toLong
            case _ => line -> mtime
          }
        }.toMap
      } catch {
        case e @ (_: org.apache.hadoop.fs.ChecksumException |
                  _: java.io.FileNotFoundException) if left > 1 =>
          left -= 1
          System.err.println(s"[graft] _GARBAGE read raced a publish (${e.getClass.getSimpleName}) — retrying")
          Thread.sleep(50)
      }
    }
    throw new IllegalStateException("unreachable")
  }

  /** The doomed path set a reader must exclude up front. */
  def doomedPaths(fs: FileSystem, dir: Path): Set[String] = read(fs, dir).keySet

  /** Delete the files of every entry past its effective grace
    * (per-entry age-out — churn can no longer starve reclamation) and
    * return the still-in-grace survivors for the caller to carry
    * forward. Also sweeps aged-out temp manifests from crashed
    * publishes. Deleting an already-gone file is a no-op, so a crash
    * mid-reclaim converges on the next pass.
    */
  def reclaimExpired(
      fs: FileSystem, dir: Path,
      entries: Map[String, Long], graceMs: Long): Map[String, Long] = {
    require(graceMs >= 0, s"graceMs must be >= 0, got $graceMs")
    val now = System.currentTimeMillis()
    def expired(doomedAt: Long): Boolean =
      graceMs == 0 || now - doomedAt >= graceMs + SkewMarginMs
    val (dead, carried) = entries.partition { case (_, ts) => expired(ts) }
    dead.keys.foreach(p => fs.delete(new Path(p), false))
    // crashed-publish temp sweep: same age rule, mtime as the stamp
    if (fs.exists(dir)) fs.listStatus(dir).foreach { s =>
      if (s.isFile && s.getPath.getName.startsWith(s"$Name.tmp-") &&
        expired(s.getModificationTime)) fs.delete(s.getPath, false)
    }
    carried
  }

  /** Publish the merged entry map (carried survivors ∪ this pass's
    * fresh garbage) — temp write + rename, never in place; an empty
    * map deletes the manifest. Written LAST by every compaction, so a
    * crash anywhere earlier leaves only live duplicates.
    */
  def publish(fs: FileSystem, dir: Path, entries: Map[String, Long]): Unit = {
    val m = manifestPath(dir)
    if (entries.isEmpty) { fs.delete(m, false); () }
    else {
      val tmp = new Path(dir, s"$Name.tmp-${java.util.UUID.randomUUID.toString.take(8)}")
      val out = fs.create(tmp, /* overwrite = */ true)
      try out.write(entries.toSeq.sorted
        .map { case (p, ts) => s"$ts\t$p" }.mkString("\n").getBytes("UTF-8"))
      finally out.close()
      try {
        // atomic overwrite where the store has one (local, HDFS)
        val fc = org.apache.hadoop.fs.FileContext.getFileContext(
          fs.makeQualified(dir).toUri, fs.getConf)
        fc.rename(fs.makeQualified(tmp), fs.makeQualified(m),
          org.apache.hadoop.fs.Options.Rename.OVERWRITE)
      } catch {
        case _: org.apache.hadoop.fs.UnsupportedFileSystemException =>
          // object-store fallback: brief no-manifest window (readers
          // see transient duplicates, never a truncated list)
          fs.delete(m, false)
          if (!fs.rename(tmp, m))
            throw new java.io.IOException(s"failed to publish garbage manifest at $m")
      }
    }
  }
}
