package graft

import scala.util.Random

import org.apache.spark.sql.functions._

/** Seeded randomized parity checks for the native kernels — hundreds
  * of arbitrary inputs per property, all in one DataFrame pass, so the
  * fused expressions can never silently drift from the column-algebra
  * formulations they replaced (the fixed-case parity specs pin known
  * values; this pins the input space).
  */
class KernelPropertySpec extends SparkSpecBase {
  import spark.implicits._

  private val rnd = new Random(42)

  test("minhash_sigs ≡ per-seed array_min(transform(xxhash64)) on 200 random arrays") {
    val k = 16
    val data = Seq.fill(200)(Seq.fill(1 + rnd.nextInt(60))(rnd.nextLong()))
    val df = data.map(Tuple1(_)).toDF("hs")
    val ref = array((0 until k).map { i =>
      array_min(transform(col("hs"), h => xxhash64(lit(i), h)))
    }: _*)
    val bad = df.select(graft.ops.Dedup.minhashSignatureFast(col("hs"), k).as("a"), ref.as("b"))
      .filter(col("a") =!= col("b")).count()
    assert(bad === 0)
  }

  test("simhash64 ≡ 64 per-bit aggregate folds on 200 random arrays") {
    val data = Seq.fill(200)(Seq.fill(1 + rnd.nextInt(60))(rnd.nextLong()))
    val df = data.map(Tuple1(_)).toDF("hs")
    val ref = (0 until 64).map { bit =>
      val votes = aggregate(col("hs"), lit(0L),
        (acc, h) => acc + when(shiftright(h, bit).bitwiseAND(lit(1L)) === 1L, lit(1L)).otherwise(lit(-1L)))
      when(votes > 0, lit(1L << bit)).otherwise(lit(0L))
    }.reduce((a, b) => a.bitwiseOR(b))
    val bad = df.select(graft.ops.Dedup.simhashOfHashes(col("hs")).as("a"), ref.as("b"))
      .filter(col("a") =!= col("b")).count()
    assert(bad === 0)
  }

  test("minhash_md5_sigs ≡ per-seed array_min(transform(md5)) on 100 random shingle sets") {
    val k = 12
    val data = Seq.fill(100)(Seq.fill(1 + rnd.nextInt(40))(s"tok${rnd.nextInt(999)} w${rnd.nextInt(99)}"))
    val df = data.map(Tuple1(_)).toDF("shs")
    val ref = array((0 until k).map { seed =>
      array_min(transform(col("shs"), s => md5(concat(lit(s"$seed:"), s))))
    }: _*)
    val bad = df.select(graft.ops.Dedup.minhashSignatureMd5(col("shs"), k).as("a"), ref.as("b"))
      .filter(col("a") =!= col("b")).count()
    assert(bad === 0)
  }

  test("md5_feature_counts ≡ explode+md5/conv+groupBy on 200 random token arrays") {
    // arbitrary token arrays: unicode, repeats, single-token (no
    // bigram), empty — the full input space of the DSIR feature stage
    val words = Vector("alpha", "beta", "γάμμα", "δ", "x1", "xx", "a b", "héllo", "日本", "z")
    val data = Seq.fill(198)(Seq.fill(rnd.nextInt(40))(words(rnd.nextInt(words.size)))) ++
      Seq(Seq.empty[String], Seq("solo"))
    val df = data.zipWithIndex.map { case (ts, i) => (i.toLong, ts) }.toDF("doc_id", "__t")
    val buckets = 4096
    val fused = df
      .select(col("doc_id"), explode(call_function("md5_feature_counts", col("__t"), lit(buckets))).as("fc"))
      .select(col("doc_id"), col("fc.bucket").as("bucket"), col("fc.c").as("c"))
    val ref = df
      .select(col("doc_id"), concat(col("__t"),
        when(size(col("__t")) >= 2, expr(
          "transform(sequence(0, size(__t) - 2), " +
            "i -> concat(element_at(__t, i + 1), ' ', element_at(__t, i + 2)))"))
          .otherwise(array().cast("array<string>"))).as("__f"))
      .select(col("doc_id"), explode(col("__f")).as("f"))
      .select(col("doc_id"),
        pmod(conv(substring(md5(col("f")), 1, 4), 16, 10).cast("long"),
          lit(buckets.toLong)).as("bucket"))
      .groupBy(col("doc_id"), col("bucket")).agg(count(lit(1)).as("c"))
    def canon(x: org.apache.spark.sql.DataFrame) =
      x.orderBy("doc_id", "bucket").collect().map(_.toSeq).toSeq
    assert(canon(fused) === canon(ref))
    assert(canon(fused).nonEmpty)
  }

  test("dot_f32 ≡ aggregate(zip_with) bit-for-bit on 200 random float pairs") {
    val data = Seq.fill(200) {
      val n = 1 + rnd.nextInt(80)
      (Seq.fill(n)(rnd.nextFloat() * 20f - 10f), Seq.fill(n)(rnd.nextFloat() * 20f - 10f))
    }
    val df  = data.toDF("a", "b")
    val ref = aggregate(zip_with(col("a"), col("b"), (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, v) => acc + v)
    val bad = df.select(graft.ops.Similarity.dot(col("a"), col("b")).as("f"), ref.as("r"))
      .filter(col("f") =!= col("r")).count()
    assert(bad === 0)
  }

  test("dot_f32 / dot_i8 null on length mismatch; md5 kernels skip null elements") {
    // dot_f32: mismatched dims → NULL, matching aggregate(zip_with)
    val mm = Seq((Seq(1.0f, 2.0f), Seq(1.0f, 2.0f, 3.0f))).toDF("a", "b")
      .select(graft.ops.Similarity.dot(col("a"), col("b")).as("d"))
    assert(mm.filter(col("d").isNull).count() === 1)
    // dot_i8 via the quantized path: equal-length still works
    val ok = Seq((Seq(1.0f, 2.0f), Seq(3.0f, 4.0f))).toDF("a", "b")
      .select(graft.ops.Similarity.dot(col("a"), col("b")).as("d"))
    assert(ok.head().getDouble(0) === 11.0)
    // null shingle elements: kernels must match the null-skipping
    // column algebra instead of NPE-ing (public SQL functions)
    val withNull = Seq(Tuple1(Seq[String]("alpha beta", null, "gamma delta")))
      .toDF("shs")
    val k = 4
    val ref = array((0 until k).map { seed =>
      array_min(transform(col("shs"), s => md5(concat(lit(s"$seed:"), s))))
    }: _*)
    val bad = withNull
      .select(graft.ops.Dedup.minhashSignatureMd5(col("shs"), k).as("a"), ref.as("b"))
      .filter(col("a") =!= col("b")).count()
    assert(bad === 0)
    val sim = withNull
      .select(graft.ops.Dedup.simhash32OfMd5(transform(col("shs"), s => md5(s))).as("s"))
    assert(sim.head().getLong(0) ===
      Seq(Tuple1(Seq("alpha beta", "gamma delta"))).toDF("shs")
        .select(graft.ops.Dedup.simhash32OfMd5(transform(col("shs"), s => md5(s))).as("s"))
        .head().getLong(0))
  }

  test("quantize_i8: bounded error, scale invariance, values in [-127,127]") {
    val data = Seq.fill(200)(Seq.fill(1 + rnd.nextInt(64))(rnd.nextFloat() * 6f - 3f))
    val df = data.zipWithIndex.map { case (v, i) => (i.toLong, v) }.toDF("vec_id", "embedding")
    val qz = graft.ops.Similarity.quantizeInt8(df, "vec_id", "embedding")
      .orderBy("vec_id").collect()
    data.zip(qz).foreach { case (orig, row) =>
      val q     = row.getSeq[Int](1)
      val scale = row.getDouble(2)
      assert(q.forall(v => v >= -127 && v <= 127))
      orig.zip(q).foreach { case (x, qi) =>
        assert(math.abs(qi * scale - x) <= scale / 2 + 1e-12, s"dequant error for $x")
      }
    }
    // positive scaling preserves the quantized ints exactly
    val doubled = df.select(col("vec_id"),
      transform(col("embedding"), x => (x * lit(4.0f)).cast("float")).as("embedding"))
    val q2 = graft.ops.Similarity.quantizeInt8(doubled, "vec_id", "embedding")
      .orderBy("vec_id").collect()
    qz.zip(q2).foreach { case (a, b) => assert(a.getSeq[Int](1) === b.getSeq[Int](1)) }
  }

  test("chunkDocuments: chunk count formula, full coverage, overlap relation on random docs") {
    val size = 16; val overlap = 4; val stride = size - overlap
    val data = Seq.tabulate(100)(i => (i.toLong, Seq.fill(1 + rnd.nextInt(90))(s"w${rnd.nextInt(50)}")))
    val df = data.map { case (i, ts) => (i, ts.mkString(" ")) }.toDF("doc_id", "text")
    val out = graft.ops.CorpusOps.chunkDocuments(df, "doc_id", "text", size, overlap)
      .orderBy("doc_id", "chunk_idx").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getString(2)))
      .groupBy(_._1).view.mapValues(_.sortBy(_._2).map(_._3)).toMap
    data.foreach { case (id, toks) =>
      val chunks = out(id)
      val expect = math.max(math.ceil((toks.length - overlap).toDouble / stride).toInt, 1)
      assert(chunks.length === expect, s"doc $id: ${toks.length} tokens")
      // non-overlapping prefixes + the full last chunk reconstruct the
      // document exactly
      val full = chunks.init.flatMap(_.split(" ").take(stride)) ++ chunks.last.split(" ")
      assert(full === toks, s"doc $id reconstruction")
    }
  }
}
