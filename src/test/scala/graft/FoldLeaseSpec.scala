package graft

import graft.ops.CorpusOps

import org.apache.spark.sql.functions._

/** Mechanical single-writer guard for the assignment folds (r15
  * verdict, What's wrong #2): `appendToCurriculum` / `appendToShards`
  * hand out position/offset ranges from the committed tail, so two
  * CONCURRENT distinct folds reading the same tail would emit
  * overlapping ranges — silently, until a loader collides. The
  * `_FOLD_LEASE` marker turns that into a loud CONCURRENT_FOLD
  * failure while keeping every documented fold law intact: same-id
  * replay (crash recovery, stream batch retry) stays allowed, a
  * completed or failed fold releases the lease, and only a fold whose
  * JVM died leaves the marker behind (fail-closed, remedy named in
  * the error).
  */
class FoldLeaseSpec extends SparkSpecBase {

  private def docs = GraftSession.table(spark, sf, "documents")
    .select(col("doc_id"), col("text"))

  private def leaseFile(path: String) = new java.io.File(path, "_FOLD_LEASE")

  private def plantLease(path: String, holder: String): Unit = {
    val f = leaseFile(path)
    f.getParentFile.mkdirs()
    java.nio.file.Files.write(f.toPath, holder.getBytes("UTF-8"))
  }

  test("curriculum fold: in-flight distinct fold fails CONCURRENT_FOLD and publishes nothing") {
    val base = docs.filter(pmod(col("doc_id"), lit(9)) =!= 4)
    val inc  = docs.filter(pmod(col("doc_id"), lit(9)) === 4)
    val path = java.nio.file.Files.createTempDirectory("foldlease-curr").toString + "/man"
    CorpusOps.writeCurriculumManifest(base, "doc_id", "text", shards = 4, path)
    plantLease(path, "in-flight-m1") // fold m1 is mid-run in another writer
    val e = intercept[IllegalStateException] {
      CorpusOps.appendToCurriculum(spark, path, inc, "doc_id", "text", "m2")
    }
    assert(e.getMessage.contains("CONCURRENT_FOLD"), s"wrong error: ${e.getMessage}")
    assert(e.getMessage.contains("in-flight-m1"), "error must name the holding fold")
    assert(e.getMessage.contains("_FOLD_LEASE"), "error must name the lease (the remedy)")
    // the blocked fold must not have published its counts partition
    assert(!new java.io.File(s"$path/parts/inc=m2").exists(),
      "blocked fold published a counts partition anyway")
    // and must not have stolen the in-flight fold's lease
    assert(leaseFile(path).exists())
  }

  test("curriculum fold: same-id retry proceeds through its own stale lease, then releases it") {
    val base = docs.filter(pmod(col("doc_id"), lit(9)) =!= 4)
    val inc  = docs.filter(pmod(col("doc_id"), lit(9)) === 4)
    val path = java.nio.file.Files.createTempDirectory("foldlease-retry").toString + "/man"
    CorpusOps.writeCurriculumManifest(base, "doc_id", "text", shards = 4, path)
    // crashed attempt of m1 left its lease behind: the RETRY of m1
    // must go through (replay is idempotent) and clean the lease up
    plantLease(path, "m1")
    val rows = CorpusOps.appendToCurriculum(spark, path, inc, "doc_id", "text", "m1")
    assert(rows.count() > 0)
    assert(!leaseFile(path).exists(), "completed fold must release the lease")
    // a subsequent distinct fold is unblocked
    val inc2 = docs.filter(pmod(col("doc_id"), lit(9)) === 5)
    assert(CorpusOps.appendToCurriculum(spark, path, inc2, "doc_id", "text", "m2").count() > 0)
    assert(!leaseFile(path).exists())
  }

  test("shard fold: in-flight distinct fold fails CONCURRENT_FOLD; failed fold releases its lease") {
    val base = docs.filter(col("doc_id") % 9 =!= 4)
    val inc  = docs.filter(col("doc_id") % 9 === 4)
    val path = java.nio.file.Files.createTempDirectory("foldlease-shard").toString + "/man"
    CorpusOps.writeShardManifest(base, "doc_id", "text", shards = 8, path)
    plantLease(path, "nightly-a")
    val e = intercept[IllegalStateException] {
      CorpusOps.appendToShards(spark, path, inc, "doc_id", "text", "nightly-b")
    }
    assert(e.getMessage.contains("CONCURRENT_FOLD"), s"wrong error: ${e.getMessage}")
    assert(!new java.io.File(s"$path/parts/inc=nightly-b").exists())
    leaseFile(path).delete()
    // a fold that THROWS (bad increment id caught inside the lease is
    // not reachable — use a corrupt manifest instead) must release:
    // empty parts dir → audit throws SHARD_MANIFEST_CORRUPT, lease gone
    val p2 = java.nio.file.Files.createTempDirectory("foldlease-fail").toString + "/man"
    CorpusOps.writeShardManifest(base, "doc_id", "text", shards = 8, p2)
    // poison: drop the base partition so the fold fails mid-lease
    // (surfaces as an audit or read error — either way, post-acquire)
    val baseDir = new java.io.File(s"$p2/parts/inc=base")
    baseDir.listFiles().foreach(_.delete()); baseDir.delete()
    intercept[Exception] {
      CorpusOps.appendToShards(spark, p2, inc, "doc_id", "text", "d1")
    }
    assert(!leaseFile(p2).exists(), "failed fold must release the lease it created")
  }

  test("BM25 maintenance: foreign lease blocks append/delete/compact; same-id replay proceeds") {
    import graft.ops.TextAnalysis
    val base = docs.filter(col("doc_id") % 3 === 0)
    val inc  = docs.filter(col("doc_id") % 3 === 1).limit(50)
    val path = java.nio.file.Files.createTempDirectory("bm25lease").toString + "/idx"
    TextAnalysis.writeBm25Index(base, "doc_id", "text", path)
    plantLease(path, "crawl-a") // another maintenance job mid-run
    def blocked(body: => Any): Unit = {
      val e = intercept[IllegalStateException](body)
      assert(e.getMessage.contains("CONCURRENT_FOLD"), s"wrong error: ${e.getMessage}")
    }
    blocked(TextAnalysis.appendToBm25Index(inc, "doc_id", "text", path, "crawl-b"))
    blocked(TextAnalysis.deleteFromBm25Index(inc, "doc_id", "text", path, "retract-1"))
    blocked(TextAnalysis.compactBm25Index(spark, path))
    // the blocked ops must not have folded meta: applied ledger empty
    val metaRow = spark.read.parquet(s"$path/meta").collect()(0)
    val applied = metaRow.getSeq[String](metaRow.fieldIndex("applied"))
    assert(applied.isEmpty, s"blocked maintenance still folded meta: $applied")
    // same-id replay: crawl-a retries through its own stale lease and
    // releases it; subsequent distinct maintenance is unblocked
    TextAnalysis.appendToBm25Index(inc, "doc_id", "text", path, "crawl-a")
    assert(!leaseFile(path).exists(), "completed maintenance must release the lease")
    TextAnalysis.deleteFromBm25Index(inc.limit(5), "doc_id", "text", path, "retract-1")
    TextAnalysis.compactBm25Index(spark, path)
    assert(!leaseFile(path).exists())
  }

  test("BM25 compaction lease is generation-keyed: same-gen replay passes, cross-gen is blocked") {
    import graft.ops.TextAnalysis
    val base = docs.filter(col("doc_id") % 3 === 0)
    val path = java.nio.file.Files.createTempDirectory("bm25compactlease").toString + "/idx"
    TextAnalysis.writeBm25Index(base, "doc_id", "text", path)
    // crashed PRE-flip compaction of the live gen: replay derives the
    // same gen-keyed id and passes through its own stale lease
    plantLease(path, "__compact:postings")
    TextAnalysis.compactBm25Index(spark, path) // flips to postings_g1
    assert(!leaseFile(path).exists(), "completed compaction must release the lease")
    // a lease from a compaction of a DIFFERENT generation state (a
    // post-flip crash, or a live concurrent compaction that just
    // flipped) must block — the r16 advice hole: a fixed "__compact"
    // id waved every live compaction through
    plantLease(path, "__compact:postings")
    val e = intercept[IllegalStateException](TextAnalysis.compactBm25Index(spark, path))
    assert(e.getMessage.contains("CONCURRENT_FOLD"), s"wrong error: ${e.getMessage}")
    // the named remedy (one file delete) restores availability
    leaseFile(path).delete()
    TextAnalysis.compactBm25Index(spark, path)
    assert(!leaseFile(path).exists())
  }

  test("versioned retrain: foreign-version lease blocks CONCURRENT_FOLD; same-version replay rewrites") {
    import graft.ops.Similarity
    val e = GraftSession.table(spark, sf, "embeddings").select(col("vec_id"), col("embedding"))
    val path = java.nio.file.Files.createTempDirectory("retrainlease").toString + "/model"
    Similarity.writeKmeansModel(e, "vec_id", "embedding", k = 4, iters = 1, path)
    val inc = e.filter(col("vec_id") < 20)
      .select((col("vec_id") + lit(100000L)).as("vec_id"),
        expr("transform(embedding, x -> cast(x * 2 as float))").as("embedding"))
    def run(version: Long) = Similarity.retrainWhenDriftedVersioned(
        spark, path, version, inc, "vec_id", "embedding",
        corpus = e, k = 4, iters = 1, driftThreshold = 2.0)
      .orderBy("cluster").collect().map(_.toSeq).toSeq
    // a DISTINCT retrain (version 7) is mid-run in another writer:
    // version 8 must fail loudly BEFORE touching any marker — the
    // r16 verdict's last doc-only single-writer assumption
    plantLease(path, "__retrain:v7")
    val ex = intercept[IllegalStateException](run(8L))
    assert(ex.getMessage.contains("CONCURRENT_FOLD"), s"wrong error: ${ex.getMessage}")
    assert(!new java.io.File(s"$path/v=8").exists(),
      "blocked retrain published a version anyway")
    // v7's "crashed" attempt replays through its own lease, rewrites,
    // commits, and releases — crash recovery stays one replay away
    val rep = run(7L)
    assert(rep.forall(_.last == 1L), "threshold 2 must fire")
    assert(new java.io.File(s"$path/v=7/_COMMITTED").exists(),
      "replayed retrain must publish with its commit marker")
    assert(!leaseFile(path).exists(), "completed retrain must release the lease")
  }

  test("law: two concurrent distinct folds serialize — loser retries, final positions stay dense") {
    val base = docs.filter(col("doc_id") % 9 =!= 4)
    val incA = docs.filter(col("doc_id") % 9 === 4).select(col("doc_id"), col("text"))
    val incB = docs.filter(col("doc_id") % 9 === 2)
      .select((col("doc_id") + 90000).as("doc_id"), col("text"))
    val path = java.nio.file.Files.createTempDirectory("foldlease-race").toString + "/man"
    CorpusOps.writeShardManifest(base, "doc_id", "text", shards = 8, path)
    // genuinely concurrent distinct folds; CONCURRENT_FOLD losers
    // retry until the lease frees. If the lease failed to serialize
    // them, both read the same committed tail and the density
    // assertion below catches the overlap.
    // each thread keeps the assignment ITS fold handed out — a
    // re-run after both landed would be a replay against a BIGGER
    // tail (the fold excludes only its own partition), which is
    // exactly the ordering hazard the lease exists to serialize
    val handedOut = new java.util.concurrent.ConcurrentHashMap[String, Array[(Long, Long)]]()
    def foldWithRetry(inc: org.apache.spark.sql.DataFrame, id: String): Unit = {
      var done = false
      var attempts = 0
      while (!done) {
        try {
          val rows = CorpusOps.appendToShards(spark, path, inc, "doc_id", "text", id)
            .select(col("shard"), col("position")).collect()
            .map(r => (r.getAs[Long]("shard"), r.getAs[Long]("position")))
          handedOut.put(id, rows)
          done = true
        } catch {
          case e: IllegalStateException if e.getMessage.contains("CONCURRENT_FOLD") =>
            attempts += 1
            // generous cap: the winning fold is a full Spark job chain
            // that can hold the lease well past 12 s on a loaded host
            assert(attempts < 240, "lease never freed — release path broken")
            Thread.sleep(500)
        }
      }
    }
    val ta = new Thread(() => foldWithRetry(incA, "race-a"))
    val tb = new Thread(() => foldWithRetry(incB, "race-b"))
    val errs = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]()
    val h: Thread.UncaughtExceptionHandler = (_, e) => errs.add(e)
    ta.setUncaughtExceptionHandler(h); tb.setUncaughtExceptionHandler(h)
    ta.start(); tb.start(); ta.join(300000); tb.join(300000)
    assert(errs.isEmpty, s"fold thread failed: ${Option(errs.peek()).map(_.toString)}")
    // serialization law: per shard, the positions HANDED OUT (base +
    // both increments' own assignments) are exactly 0..n-1 — two
    // folds reading the same tail would overlap and break density
    val all = CorpusOps.shardShuffle(base, "doc_id", "text", 8)
      .select(col("shard"), col("position"))
      .collect().map(r => (r.getAs[Long]("shard"), r.getAs[Long]("position"))) ++
      handedOut.get("race-a") ++ handedOut.get("race-b")
    all.groupBy(_._1).foreach { case (shard, rows) =>
      val ps = rows.map(_._2).sorted.toSeq
      assert(ps === (0L until ps.size.toLong),
        s"shard $shard positions not dense — concurrent folds overlapped: ${ps.take(20)}")
    }
    assert(!leaseFile(path).exists())
  }
}
