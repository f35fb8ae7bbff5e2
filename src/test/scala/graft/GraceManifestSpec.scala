package graft

import graft.ops.{Dedup, GraceManifest, Scale}

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.functions._

/** Pins the factored grace-reclaim protocol (r17 verdict tasks 2-3 +
  * r17 advice): per-ENTRY doom timestamps (reclamation stays live
  * under sustained churn — the whole-manifest mtime grace reset on
  * every rewrite and never aged out), the additive clock-skew margin
  * on graceMs > 0, the graceMs = 0 maintenance-window edge, legacy
  * bare-path manifest parsing, temp+rename publish, and readLive's
  * refusal to fall back to a raw directory read when the live set is
  * empty under a surviving manifest.
  */
class GraceManifestSpec extends SparkSpecBase {

  private def fsFor(p: Path) =
    p.getFileSystem(spark.sparkContext.hadoopConfiguration)

  private def tmpDir(tag: String): Path = {
    val d = new Path(java.nio.file.Files.createTempDirectory(tag).toString)
    fsFor(d).makeQualified(d)
  }

  private def touch(dir: Path, name: String): String = {
    val fs = fsFor(dir)
    val p  = fs.makeQualified(new Path(dir, name))
    val out = fs.create(p, true)
    try out.write("x".getBytes("UTF-8")) finally out.close()
    p.toString
  }

  test("per-entry age-out: an old entry reclaims while a younger one in the SAME manifest survives") {
    val dir = tmpDir("gracelive")
    val fs  = fsFor(dir)
    val old = touch(dir, "part-old.parquet")
    val yng = touch(dir, "part-young.parquet")
    val now = System.currentTimeMillis()
    val graceMs = 1000L
    GraceManifest.publish(fs, dir, Map(
      old -> (now - graceMs - GraceManifest.SkewMarginMs - 5000L), // past effective grace
      yng -> now))                                                 // fresh
    val carried = GraceManifest.reclaimExpired(fs, dir, GraceManifest.read(fs, dir), graceMs)
    assert(!fs.exists(new Path(old)), "aged entry must be reclaimed even alongside fresh garbage")
    assert(fs.exists(new Path(yng)), "in-grace entry must survive")
    assert(carried.keySet === Set(yng))
    assert(carried(yng) === now, "carried entries keep their ORIGINAL doom stamps")
  }

  test("skew margin: an entry older than graceMs but inside graceMs+margin is NOT reclaimed") {
    val dir = tmpDir("graceskew")
    val fs  = fsFor(dir)
    val f   = touch(dir, "part-a.parquet")
    val graceMs = 1000L
    // 30 s old: past graceMs (1 s) but inside graceMs + 60 s margin
    GraceManifest.publish(fs, dir, Map(f -> (System.currentTimeMillis() - 30000L)))
    val carried = GraceManifest.reclaimExpired(fs, dir, GraceManifest.read(fs, dir), graceMs)
    assert(fs.exists(new Path(f)), "skew margin must extend the effective grace")
    assert(carried.keySet === Set(f))
  }

  test("graceMs = 0 (maintenance-window mode) reclaims immediately, no margin") {
    val dir = tmpDir("gracezero")
    val fs  = fsFor(dir)
    val f   = touch(dir, "part-a.parquet")
    GraceManifest.publish(fs, dir, Map(f -> System.currentTimeMillis()))
    val carried = GraceManifest.reclaimExpired(fs, dir, GraceManifest.read(fs, dir), 0L)
    assert(!fs.exists(new Path(f)))
    assert(carried.isEmpty)
    intercept[IllegalArgumentException](
      GraceManifest.reclaimExpired(fs, dir, Map.empty, -1L))
  }

  test("legacy bare-path manifest lines parse with the manifest's mtime as the doom stamp") {
    val dir = tmpDir("gracelegacy")
    val fs  = fsFor(dir)
    val f   = touch(dir, "part-a.parquet")
    val m   = GraceManifest.manifestPath(dir)
    val out = fs.create(m, true)
    try out.write(f.getBytes("UTF-8")) finally out.close()
    val mtime = fs.getFileStatus(m).getModificationTime
    val entries = GraceManifest.read(fs, dir)
    assert(entries === Map(f -> mtime))
    // a legacy entry is at worst stamped LATE (mtime >= true doom
    // time), so it can only be reclaimed late, never early
    assert(GraceManifest.reclaimExpired(fs, dir, entries, 60000L).keySet === Set(f))
  }

  test("publish: round-trips entries, deletes the manifest when empty, sweeps aged temp files") {
    val dir = tmpDir("gracepub")
    val fs  = fsFor(dir)
    val f   = touch(dir, "part-a.parquet")
    val ts  = 1234567890123L
    GraceManifest.publish(fs, dir, Map(f -> ts))
    assert(GraceManifest.read(fs, dir) === Map(f -> ts))
    // no temp leftovers after a clean publish
    val tmps = fs.listStatus(dir).filter(_.getPath.getName.startsWith("_GARBAGE.tmp-"))
    assert(tmps.isEmpty, "publish must rename its temp file away")
    // empty publish removes the manifest entirely
    GraceManifest.publish(fs, dir, Map.empty)
    assert(!fs.exists(GraceManifest.manifestPath(dir)))
    // a crashed writer's FRESH temp survives a reclaim pass; an AGED
    // one is swept
    touch(dir, "_GARBAGE.tmp-deadbeef")
    GraceManifest.reclaimExpired(fs, dir, Map.empty, 60000L)
    assert(fs.exists(new Path(dir, "_GARBAGE.tmp-deadbeef")),
      "a fresh temp (possibly a LIVE writer's) must not be swept")
    GraceManifest.reclaimExpired(fs, dir, Map.empty, 0L)
    assert(!fs.exists(new Path(dir, "_GARBAGE.tmp-deadbeef")),
      "an aged-out temp from a crashed publish must be swept")
  }

  test("readLive: empty live set under a surviving manifest throws without a schema, is empty with one") {
    val dir = tmpDir("gracelive2")
    val fs  = fsFor(dir)
    // one real parquet file, then doom it: live set is empty but the
    // manifest survives
    val df = spark.range(3).selectExpr("id AS h", "id AS keep_id")
    df.coalesce(1).write.mode("overwrite").parquet(dir.toString)
    val part = fs.listStatus(dir).filter(_.getPath.getName.endsWith(".parquet"))
      .map(s => fs.makeQualified(s.getPath).toString).head
    GraceManifest.publish(fs, dir, Map(part -> System.currentTimeMillis()))
    val e = intercept[IllegalStateException](
      Scale.readLive(spark, dir.toString))
    assert(e.getMessage.contains("_GARBAGE"),
      s"error must name the manifest: ${e.getMessage}")
    assert(Scale.readLive(spark, dir.toString, Some(df.schema)).count() === 0L)
  }

  test("liveness end-to-end: churned garbage ages out through a real compact pass, per entry") {
    val dir = tmpDir("graceete")
    val fs  = fsFor(dir)
    spark.range(200).selectExpr("id", "id % 7 AS k")
      .repartition(8).write.mode("overwrite").parquet(dir.toString)
    // two deferred passes back-to-back: the second must CARRY the
    // first's garbage (in grace) while adding its own
    val s1 = Scale.compact(spark, dir.toString, targetBytes = 1L << 30, deferDeletes = true)
    assert(s1.nonEmpty, "fragmented layout must compact")
    val g1 = GraceManifest.read(fs, dir)
    assert(g1.nonEmpty)
    // re-fragment and compact again while g1 is still in grace
    spark.range(200, 400).selectExpr("id", "id % 7 AS k")
      .repartition(8).write.mode("append").parquet(dir.toString)
    Scale.compact(spark, dir.toString, targetBytes = 1L << 30, deferDeletes = true)
    val g2 = GraceManifest.read(fs, dir)
    assert(g1.keySet.subsetOf(g2.keySet), "in-grace entries must carry forward")
    g1.foreach { case (p, ts) =>
      assert(g2(p) === ts, s"carried entry $p must keep its original stamp") }
    // back-date ONLY the first pass's entries past the effective
    // grace: the next pass must reclaim exactly those and carry the
    // rest — per-entry liveness under churn (the r17 advice bug: the
    // whole-manifest grace would have reset and reclaimed nothing)
    val backdated = g2.map { case (p, ts) =>
      p -> (if (g1.contains(p)) ts - 3600000L else ts) }
    GraceManifest.publish(fs, dir, backdated)
    Scale.compact(spark, dir.toString, targetBytes = 1L << 30, deferDeletes = true)
    g1.keys.foreach(p => assert(!fs.exists(new Path(p)), s"aged entry $p must be reclaimed"))
    val g3 = GraceManifest.read(fs, dir)
    assert(g1.keySet.intersect(g3.keySet).isEmpty, "reclaimed entries must leave the manifest")
    (g2.keySet -- g1.keySet).foreach(p =>
      assert(fs.exists(new Path(p)), s"in-grace entry $p must survive"))
  }

  test("retryOnMissingFiles: a missing index ROOT (PATH_NOT_FOUND) propagates on the first throw") {
    var n = 0
    val e = intercept[RuntimeException] {
      Dedup.retryOnMissingFiles(4) {
        n += 1
        throw new RuntimeException(
          "[PATH_NOT_FOUND] Path does not exist: file:/no/such/index.")
      }
    }
    assert(n === 1, "a wrong index path is a user error, not a compaction race — no retries")
    assert(e.getMessage.contains("PATH_NOT_FOUND"))
    // the raw-Hadoop flavor: an FNF naming a refreshPaths ROOT itself
    // (readLive's own listStatus throws this shape) — while an FNF
    // naming a part file UNDER the root stays retryable
    var k = 0
    intercept[RuntimeException] {
      Dedup.retryOnMissingFiles(4, spark, Seq("/tmp/gone-idx")) {
        k += 1
        throw new RuntimeException(
          "java.io.FileNotFoundException: File file:/tmp/gone-idx does not exist")
      }
    }
    assert(k === 1, "an FNF naming the index root is a user error — no retries")
    var j2 = 0
    Dedup.retryOnMissingFiles(2, spark, Seq("/tmp/gone-idx")) {
      j2 += 1
      if (j2 < 2) throw new RuntimeException(
        "java.io.FileNotFoundException: File file:/tmp/gone-idx/part-0001.parquet does not exist")
    }
    assert(j2 === 2, "a part-file FNF under the root must stay retryable")
    // and the real probe surface: a probe against a never-created
    // index path fails fast (no 4×200 ms retry sleeps)
    val t0 = System.nanoTime()
    intercept[Throwable] {
      Dedup.probeMinhashIndexMd5(spark, "/tmp/graft-no-such-idx-" +
        java.util.UUID.randomUUID.toString, spark.range(1)
          .selectExpr("id", "'a b c' AS text"), "id", "text").collect()
    }
    val sec = (System.nanoTime() - t0) / 1e9
    assert(sec < 30.0, f"missing-root probe should fail fast, took $sec%.1f s")
  }

  test("retryOnMissingFiles: PATH_NOT_FOUND naming a part file UNDER a root is a race, not a user error") {
    // readLive hands spark.read.parquet an explicit part-file list, so
    // a file reclaimed between listing and plan resolution surfaces as
    // AnalysisException PATH_NOT_FOUND naming the PART FILE — the r18
    // advice: that must stay retryable; only the ROOT shape is a
    // wrong-path user error
    var n = 0
    Dedup.retryOnMissingFiles(3, spark, Seq("/tmp/race-idx")) {
      n += 1
      if (n < 2) throw new RuntimeException(
        "[PATH_NOT_FOUND] Path does not exist: " +
          "file:/tmp/race-idx/part-00007-abc.snappy.parquet. SQLSTATE: 42K03")
    }
    assert(n === 2, "PATH_NOT_FOUND under a refresh root must retry with a fresh listing")
    // scheme variants normalize: file:///tmp/... is the same path
    var m = 0
    Dedup.retryOnMissingFiles(3, spark, Seq("/tmp/race-idx/")) {
      m += 1
      if (m < 2) throw new RuntimeException(
        "[PATH_NOT_FOUND] Path does not exist: file:///tmp/race-idx/part-0.parquet.")
    }
    assert(m === 2, "trailing-slash root + file:// scheme must still scope as under-root")
    // the ROOT itself via PATH_NOT_FOUND stays a first-throw propagate
    var k = 0
    intercept[RuntimeException] {
      Dedup.retryOnMissingFiles(4, spark, Seq("/tmp/race-idx")) {
        k += 1
        throw new RuntimeException(
          "[PATH_NOT_FOUND] Path does not exist: file:/tmp/race-idx.")
      }
    }
    assert(k === 1, "PATH_NOT_FOUND naming the root itself is a user error — no retries")
    // a path unrelated to every root is unplaceable → user error
    var j = 0
    intercept[RuntimeException] {
      Dedup.retryOnMissingFiles(4, spark, Seq("/tmp/race-idx")) {
        j += 1
        throw new RuntimeException(
          "[PATH_NOT_FOUND] Path does not exist: file:/somewhere/else/part-0.parquet.")
      }
    }
    assert(j === 1, "a missing path outside every refresh root is not a compaction race")
  }
}
