package graft

import java.nio.file.{Files, Path, Paths}
import java.util.Comparator

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.ops.{CorpusOps, Dedup, Similarity, TextAnalysis}

/** The shared crash-consistency LAW spec for every persistent-index
  * append path — the round-8 BM25 NULL-meta bug was an instance of a
  * CLASS (an empty or replayed increment silently poisoning index
  * state), so the laws are asserted uniformly instead of per-bug:
  *
  *   1. append(∅) ≡ id — an empty increment changes no probe result.
  *   2. replay — append(x); append(x) ≡ append(x), at probe level.
  *      Two layout classes honor it differently:
  *        - exactly-once layouts (BM25 postings+meta ledger, IVF
  *          `inc=` dynamic overwrite): the replay converges storage
  *          itself;
  *        - set-semantics layouts (minhash bands, sign-plane,
  *          substring fingerprints): storage is at-least-once but the
  *          probe algebra (dropDuplicates / collect_set) is invariant
  *          under duplicated rows.
  *   3. crash-between-writes (BM25 only — the one layout with TWO
  *      ordered writes): a replay after "postings landed, meta did
  *      not" must double-count nothing.
  *
  * Concurrency is NOT law-tested: BM25's meta fold is documented
  * single-writer; the other paths are pure partition appends with no
  * shared scalar.
  */
class IndexMaintenanceSpec extends SparkSpecBase {
  import spark.implicits._

  private def tmp(tag: String): String =
    Files.createTempDirectory(s"idx-law-$tag").toString

  private def rows(df: DataFrame): Seq[Seq[Any]] =
    df.collect().map(_.toSeq.map {
      case a: Array[_] => a.toSeq
      case x           => x
    }.toSeq).toSeq

  /** Recursive copy/restore — the crash simulator: snapshot meta
    * before an append, restore it after, leaving the postings of a
    * "half-committed" increment behind.
    */
  private def copyDir(src: String, dst: String): Unit = {
    val s = Paths.get(src); val d = Paths.get(dst)
    Files.walk(s).forEach { p =>
      val t = d.resolve(s.relativize(p))
      if (Files.isDirectory(p)) Files.createDirectories(t)
      else { Files.createDirectories(t.getParent); Files.copy(p, t) }
    }
  }
  private def deleteDir(dir: String): Unit = {
    val p = Paths.get(dir)
    if (Files.exists(p))
      Files.walk(p).sorted(Comparator.reverseOrder[Path]()).forEach(Files.delete(_))
  }

  private lazy val docsAll =
    GraftSession.table(spark, sf, "documents").select(col("doc_id").as("id"), col("text"))
  private lazy val embAll =
    GraftSession.table(spark, sf, "embeddings").select(col("vec_id"), col("embedding"))

  // ------------------------------------------------------------------
  // BM25 — the exactly-once layout with a meta ledger
  // ------------------------------------------------------------------

  private def bm25Queries =
    Seq((1L, "spark window agg"), (2L, "customer query data")).toDF("query_id", "qtext")
  private def bm25Probe(path: String) =
    TextAnalysis.probeBm25Index(spark, path, bm25Queries, "query_id", "qtext", k = 5)
      .orderBy("query_id", "rank")

  test("law: BM25 append(∅) ≡ id and replayed append ≡ single append (ledger short-circuit)") {
    val base = docsAll.filter(col("id") % 2 === 0)
    val inc  = docsAll.filter(col("id") % 2 === 1)
    val path = tmp("bm25-replay")
    TextAnalysis.writeBm25Index(base, "id", "text", path, buckets = 8)
    TextAnalysis.appendToBm25Index(inc, "id", "text", path, incrementId = "crawl-1")
    val once = rows(bm25Probe(path))
    // replay the SAME increment id: the applied ledger short-circuits
    TextAnalysis.appendToBm25Index(inc, "id", "text", path, incrementId = "crawl-1")
    assert(rows(bm25Probe(path)) === once, "replayed increment changed probe results")
    val meta = spark.read.parquet(s"$path/meta").collect()(0)
    assert(meta.getLong(meta.fieldIndex("n")) === docsAll.count(),
      "replay double-counted meta.n")
    assert(meta.getSeq[String](meta.fieldIndex("applied")) === Seq("crawl-1"))
    // empty increment: distinct id, zero rows — probe and meta unchanged
    TextAnalysis.appendToBm25Index(inc.filter(col("id") < 0), "id", "text", path,
      incrementId = "crawl-2")
    assert(rows(bm25Probe(path)) === once, "empty increment changed probe results")
    val meta2 = spark.read.parquet(s"$path/meta").collect()(0)
    assert(meta2.getLong(meta2.fieldIndex("n")) === docsAll.count())
    assert(meta2.getLong(meta2.fieldIndex("t")) === meta.getLong(meta.fieldIndex("t")))
  }

  test("law: BM25 replay AFTER a crash between postings and meta double-counts nothing") {
    val base = docsAll.filter(col("id") % 2 === 0)
    val inc  = docsAll.filter(col("id") % 2 === 1)
    val path = tmp("bm25-crash")
    TextAnalysis.writeBm25Index(base, "id", "text", path, buckets = 8)
    // simulate the crash window: run the full append, then restore
    // meta to its pre-append state — on disk this is EXACTLY
    // "postings committed, meta write never happened"
    val metaSnap = tmp("bm25-metasnap")
    deleteDir(metaSnap); copyDir(s"$path/meta", metaSnap)
    TextAnalysis.appendToBm25Index(inc, "id", "text", path, incrementId = "crawl-1")
    deleteDir(s"$path/meta"); copyDir(metaSnap, s"$path/meta")
    // the recovery replay: ledger does NOT contain crawl-1, so the
    // postings re-land (dynamic overwrite of inc=crawl-1 — no
    // duplicates) and the meta fold finally commits
    TextAnalysis.appendToBm25Index(inc, "id", "text", path, incrementId = "crawl-1")
    // ground truth: a from-scratch rebuild over the full corpus
    val full = tmp("bm25-full")
    TextAnalysis.writeBm25Index(docsAll, "id", "text", full, buckets = 8)
    assert(rows(bm25Probe(path)) === rows(bm25Probe(full)),
      "recovered index diverges from rebuild — tf/df or meta double-counted")
  }

  test("maintenance: BM25 compaction folds increments into one generation — " +
      "fewer files, same rows, same probes, ledger intact") {
    val base = docsAll.filter(col("id") % 3 === 0)
    val path = tmp("bm25-compact")
    TextAnalysis.writeBm25Index(base, "id", "text", path, buckets = 4)
    // three generations of postings files: base + two crawls
    TextAnalysis.appendToBm25Index(docsAll.filter(col("id") % 3 === 1),
      "id", "text", path, incrementId = "crawl-1")
    val crawl2 = docsAll.filter(col("id") % 3 === 2)
    TextAnalysis.appendToBm25Index(crawl2, "id", "text", path, incrementId = "crawl-2")
    val before     = rows(bm25Probe(path))
    val rowsBefore = spark.read.parquet(s"$path/postings").count()
    val (filesBefore, filesAfter) = TextAnalysis.compactBm25Index(spark, path)
    assert(filesAfter < filesBefore,
      s"file count did not shrink ($filesBefore -> $filesAfter)")
    assert(!new java.io.File(s"$path/postings").exists(),
      "old generation not deleted after the flip")
    assert(spark.read.parquet(s"$path/postings_g1").count() === rowsBefore,
      "compaction lost or duplicated postings rows")
    assert(rows(bm25Probe(path)) === before, "compaction changed probe results")
    // the applied ledger survives the flip: a replayed pre-compaction
    // increment must STILL short-circuit (its rows are in the folded base)
    TextAnalysis.appendToBm25Index(crawl2, "id", "text", path, incrementId = "crawl-2")
    assert(rows(bm25Probe(path)) === before,
      "replay of a folded increment escaped the ledger after compaction")
    // and maintenance keeps composing: append-after-compact then a
    // second compaction flips to the next generation
    TextAnalysis.appendToBm25Index(
      docsAll.filter(col("id") % 3 === 2)
        .select((col("id") + 90000).as("id"), col("text")),
      "id", "text", path, incrementId = "crawl-3")
    val after3 = rows(bm25Probe(path))
    val (_, _) = TextAnalysis.compactBm25Index(spark, path)
    assert(rows(bm25Probe(path)) === after3, "second flip changed probe results")
    assert(new java.io.File(s"$path/postings_g2").exists())
  }

  // ------------------------------------------------------------------
  // IVF (full-precision + quantized) — exactly-once via inc= overwrite
  // ------------------------------------------------------------------

  test("law: IVF append(∅) ≡ id and replayed append ≡ single append (dynamic inc overwrite)") {
    val base = embAll
    val inc = base.filter(col("vec_id") < 10)
      .select((col("vec_id") + 5000).as("vec_id"),
        transform(col("embedding"), x => (x * lit(2.0f)).cast("float")).as("embedding"))
    val q = base.filter(col("vec_id") < 5)
    for (quant <- Seq(false, true)) {
      val path = tmp(s"ivf-replay-$quant")
      def append(df: DataFrame, id: String): Unit =
        if (quant) Similarity.appendToIvfIndexQuantized(spark, df, "vec_id", "embedding", path, id)
        else Similarity.appendToIvfIndex(spark, df, "vec_id", "embedding", path, id)
      def probe() = rows(
        (if (quant) Similarity.probeIvfIndexQuantized(spark, path, q, "vec_id", "embedding", k = 3)
         else Similarity.probeIvfIndex(spark, path, q, "vec_id", "embedding", k = 3))
          .select("query_id", "rank", "neighbor_id").orderBy("query_id", "rank"))
      if (quant) Similarity.writeIvfIndexQuantized(base, "vec_id", "embedding", path, nCells = 8)
      else Similarity.writeIvfIndex(base, "vec_id", "embedding", path, nCells = 8)
      append(inc, "inc-1")
      val once   = probe()
      val nFiles = spark.read.parquet(s"$path/assigned").count()
      append(inc, "inc-1") // replay: overwrites its own inc= partitions
      assert(probe() === once, s"replay changed probe results (quant=$quant)")
      assert(spark.read.parquet(s"$path/assigned").count() === nFiles,
        s"replay duplicated assigned rows (quant=$quant)")
      append(inc.filter(col("vec_id") < 0), "inc-2") // empty increment
      assert(probe() === once, s"empty increment changed probe results (quant=$quant)")
    }
  }

  // ------------------------------------------------------------------
  // Set-semantics layouts: minhash bands / sign-plane / substring fp —
  // at-least-once storage, exactly-once probes
  // ------------------------------------------------------------------

  test("law: minhash-LSH index — append(∅) ≡ id, replay invisible to probes") {
    val base = docsAll.filter(col("id") < 400)
    val inc  = docsAll.filter(col("id") >= 400 && col("id") < 450)
    val fresh = docsAll.filter(col("id") < 25)
      .select((col("id") + 10000).as("id"), concat(col("text"), lit(" zz yy")).as("text"))
    val path = tmp("lsh-replay")
    Dedup.writeMinhashIndexMd5(base, "id", "text", path)
    Dedup.appendToMinhashIndex(inc, "id", "text", path)
    def probe() = rows(Dedup.probeMinhashIndexMd5(spark, path, fresh, "id", "text")
      .orderBy("id_a", "id_b"))
    val once = probe()
    assert(once.nonEmpty, "vacuous probe — planted near-dups never surfaced")
    Dedup.appendToMinhashIndex(inc, "id", "text", path) // duplicate delivery
    assert(probe() === once, "replayed append leaked duplicate pairs through the probe")
    Dedup.appendToMinhashIndex(inc.filter(col("id") < 0), "id", "text", path)
    assert(probe() === once, "empty append changed probe results")
  }

  test("law: sign-plane index — append(∅) ≡ id, replay invisible to probes") {
    val base = embAll
    val inc = base.filter(col("vec_id") >= 20 && col("vec_id") < 40)
      .select((col("vec_id") + 200000).as("vec_id"),
        transform(col("embedding"), x => (x * lit(3.0f)).cast("float")).as("embedding"))
    val fresh = base.filter(col("vec_id") < 20)
      .select((col("vec_id") + 100000).as("vec_id"),
        transform(col("embedding"), x => (x * lit(2.0f)).cast("float")).as("embedding"))
    val path = tmp("sp-replay")
    Dedup.writeSignPlaneIndex(base, "vec_id", "embedding", path)
    Dedup.appendToSignPlaneIndex(inc, "vec_id", "embedding", path)
    def probe() = rows(Dedup.probeSignPlaneIndex(spark, path, fresh, "vec_id", "embedding", 0.99)
      .orderBy("id_a", "id_b"))
    val once = probe()
    assert(once.nonEmpty, "vacuous probe — planted colinear vectors never surfaced")
    Dedup.appendToSignPlaneIndex(inc, "vec_id", "embedding", path) // duplicate delivery
    assert(probe() === once, "replayed append leaked duplicate pairs through the probe")
    Dedup.appendToSignPlaneIndex(inc.filter(col("vec_id") < 0), "vec_id", "embedding", path)
    assert(probe() === once, "empty append changed probe results")
  }

  test("law: substring-fingerprint index — append(∅) ≡ id, replay invisible to probes") {
    val base = docsAll.filter(col("id") < 400)
    val inc  = docsAll.filter(col("id") >= 400 && col("id") < 450)
    val toksOf = filter(split(col("text"), " "), t => t =!= "")
    val fresh = docsAll.filter(col("id") < 25)
      .select((col("id") + 30000).as("id"),
        concat(array_join(slice(toksOf, 1, 12), " "),
          lit(" qq ww ee rr tt yy uu ii oo pp")).as("text"))
    val path = tmp("sub-replay")
    CorpusOps.writeSubstringIndex(base, "id", "text", path, window = 8)
    CorpusOps.appendToSubstringIndex(inc, "id", "text", path, window = 8)
    def probe() = rows(CorpusOps.probeSubstringIndex(spark, path, fresh, "id", "text", window = 8)
      .orderBy("id"))
    val once = probe()
    assert(once.exists(_(2).asInstanceOf[Int] > 0),
      "vacuous probe — no increment passage was ever cut")
    CorpusOps.appendToSubstringIndex(inc, "id", "text", path, window = 8) // duplicate delivery
    assert(probe() === once, "replayed append changed probe results")
    CorpusOps.appendToSubstringIndex(inc.filter(col("id") < 0), "id", "text", path, window = 8)
    assert(probe() === once, "empty append changed probe results")
  }
}
