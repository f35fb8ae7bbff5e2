package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deduplication operators for training-data pipelines, designed
  * around one rule: never materialize the O(n²) pair space. Every
  * variant reduces candidate generation to an equi-join on a blocking
  * key (hash, shingle, LSH band, simhash band), so the shuffle is
  * keyed and skew-safe (AQE splits hot buckets), and verification runs
  * only on candidates that share a block.
  *
  * The reference's own dedup is exact subset-dedup
  * (kpi_inference_curator.py:400-403, farm_trainer.py:73) and
  * keep-first-per-group (text_curator.py:101); the near-dup family
  * extends it per the north-star brief.
  */
object Dedup {

  /** P4: exact dedup on a key subset, keep-first by explicit order.
    * `dropDuplicates` keeps an *arbitrary* row, which is
    * nondeterministic under retries/partition layout — at scale that
    * silently breaks reruns, so the engine always dedups through a
    * deterministic window.
    */
  def dedupKeepFirst(df: DataFrame, keys: Seq[String], order: Seq[Column]): DataFrame = {
    val w = Window.partitionBy(keys.map(col): _*).orderBy(order: _*)
    df.withColumn("__rn", row_number().over(w)).filter(col("__rn") === 1).drop("__rn")
  }

  /** Exact content dedup by md5 of a (normalized) text column: one
    * row survives per distinct content hash — groupBy on a 128-bit
    * key, fully map-side-combinable, no sort.
    */
  def exactByContent(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.groupBy(md5(col(textCol)).as("content_hash"))
      .agg(min(col(idCol)).as("keep_id"), count(lit(1)).as("dup_count"))

  /** Word tokens of a text column (empties dropped so Spark
    * split/DuckDB string_split edge cases agree).
    */
  def tokens(c: Column): Column =
    filter(split(c, " "), t => t =!= "")

  /** Distinct word w-shingles over an already-materialized token
    * array column. `ts` MUST be a column attribute: inline
    * subexpressions inside a lambda re-evaluate per element (the
    * token split would run once per shingle).
    */
  def shinglesOf(ts: Column, w: Int): Column = {
    // zip_with form: no outer-column capture inside lambdas (see
    // shingleHashesOf for why that matters)
    val n       = greatest(size(ts) - (w - 1), lit(0))
    val shifted = (0 until w).map(j => slice(ts, lit(j + 1), n))
    array_distinct(
      shifted.reduce((a, b) => zip_with(a, b, (x, y) => concat_ws(" ", x, y))))
  }

  /** Exact n-gram-Jaccard near-dup pairs via an inverted shingle
    * index: explode distinct shingles → self-join on shingle (only
    * docs sharing a shingle ever meet) → intersection counts → Jaccard
    * from |A|+|B|−|A∩B|. Candidate volume is Σ df(shingle)², so a
    * single hot shingle (boilerplate header, stopword run) with
    * df=10⁶ would emit 10¹² candidate rows — `dfCap` drops shingles
    * with document frequency above the cap from BOTH the index and
    * the size counts (Jaccard is computed over the capped shingle
    * space). High-df shingles carry no discriminative signal, so the
    * recall cost is marginal; pairs that ONLY share boilerplate are
    * the pairs a near-dup pass should not emit anyway. The hot list
    * is tiny by construction (only shingles above the cap), so the
    * anti-join broadcasts under AQE. Returns (id_a, id_b, jaccard)
    * with id_a < id_b, jaccard rounded to 4dp.
    */
  def jaccardPairs(df: DataFrame, idCol: String, textCol: String, w: Int, threshold: Double,
      dfCap: Int = Int.MaxValue): DataFrame = {
    val shM = cappedShingleIndex(df, idCol, textCol, w, dfCap)
    val sizes = shM.groupBy("id").agg(count(lit(1)).as("n_sh"))
    val inter = shM.as("a")
      .join(shM.as("b"), col("a.sh") === col("b.sh") && col("a.id") < col("b.id"))
      .groupBy(col("a.id").as("id_a"), col("b.id").as("id_b"))
      .agg(count(lit(1)).as("n_inter"))
    val jac = col("n_inter").cast("double") /
      (col("sa.n_sh") + col("sb.n_sh") - col("n_inter")).cast("double")
    inter
      .join(sizes.as("sa"), col("id_a") === col("sa.id"))
      .join(sizes.as("sb"), col("id_b") === col("sb.id"))
      .filter(jac >= threshold)
      .select(col("id_a"), col("id_b"), round(jac, 4).as("jaccard"))
  }

  /** The (id, sh) inverted index feeding [[jaccardPairs]], partitioned
    * on `sh` and materialized ONCE for all consumers (size counts and
    * both self-join sides — AQE stage reuse).
    *
    * df-cap ordering matters at scale: the cap is applied BEFORE the
    * `(sh)` exchange, so the materialized stage never carries a
    * pathological partition — a boilerplate shingle with df=10⁶ would
    * otherwise land a 10⁶-row partition in the exchange even though
    * the cap drops it immediately after. The price is one extra
    * exchange on `id` (balanced by construction: ids are unique) that
    * pins the raw explode for its two consumers (the exact-df
    * aggregation — itself skew-safe, partial aggregation combines
    * map-side — and the anti-join probe). At extreme scale the exact
    * hot list can be replaced by a DetHash-sampled estimate to drop
    * the id-exchange entirely; exact df is kept here because the
    * DuckDB oracle replicates `HAVING count(*) > cap` semantics.
    */
  private[graft] def cappedShingleIndex(
      df: DataFrame, idCol: String, textCol: String, w: Int, dfCap: Int): DataFrame = {
    val shRaw = df
      .select(col(idCol).as("id"), tokens(col(textCol)).as("ts"))
      .select(col("id"), explode(shinglesOf(col("ts"), w)).as("sh"))
    if (dfCap == Int.MaxValue) shRaw.repartition(col("sh"))
    else {
      val pinned = shRaw.repartition(col("id"))
      val hot = pinned.groupBy("sh").agg(count(lit(1)).as("df"))
        .filter(col("df") > dfCap).select(col("sh"))
      pinned.join(hot, Seq("sh"), "left_anti").repartition(col("sh"))
    }
  }

  /** MinHash signature: for each of `numHashes` seeded hash functions,
    * the min of xxhash64(seed, shingle) over the doc's shingle set.
    * Pure column algebra — the signature matrix never leaves codegen.
    */
  def minhashSignature(shingleArr: Column, numHashes: Int): Column =
    array((0 until numHashes).map { seed =>
      array_min(transform(shingleArr, s => xxhash64(lit(seed), s)))
    }: _*)

  /** Rotate-left on a long column (ANSI-safe bit algebra). */
  private def rotl(h: Column, k: Int): Column =
    shiftleft(h, k).bitwiseOR(shiftrightunsigned(h, 64 - k))

  /** Distinct numeric w-shingle hashes over an already-materialized
    * token-hash array column: each shingle combined from its w token
    * hashes with rotate+xor and one final long-hash for dispersal.
    *
    * `hs` MUST be a materialized column attribute, not an inline
    * expression: a subexpression inside a lambda body is re-evaluated
    * per array element, so an inline token-hash array would be
    * recomputed once per shingle per reference (measured 20-100×
    * slower). Callers project `transform(tokens(c), xxhash64)` first.
    */
  def shingleHashesOf(hs: Column, w: Int): Column = {
    // Structural zip_with form: lambdas reference ONLY their bound
    // variables. Any outer-column capture inside a lambda body gets
    // inlined by CollapseProject and re-evaluated per array element —
    // measured 20-100× slower on the token-hash array.
    val n       = greatest(size(hs) - (w - 1), lit(0))
    val shifted = (0 until w).map(j => slice(hs, lit(j + 1), n))
    val rotated = shifted.zipWithIndex.map { case (a, j) =>
      transform(a, h => rotl(h, (j * 19) % 63 + 1))
    }
    val combined = rotated.reduce((a, b) => zip_with(a, b, (x, y) => x.bitwiseXOR(y)))
    array_distinct(transform(combined, h => xxhash64(lit(w), h)))
  }

  /** Derived minhash family over numeric shingle hashes:
    * h_i = xxhash64(seed, h) — hashing a single long per (shingle,
    * seed), not a string. Computed by the fused one-pass native
    * expression ([[graft.functions.MinhashSigsExpr]], bit-identical
    * to the per-seed `array_min(transform(...))` formulation it
    * replaced — see its scaladoc); requires `GraftExtensions` on the
    * session.
    */
  def minhashSignatureFast(shingleHashArr: Column, numHashes: Int): Column =
    call_function("minhash_sigs", shingleHashArr, lit(numHashes))

  /** MinHash-LSH near-dup candidate pairs: signature → `bands` bands of
    * `rows` hashes → hash each band → docs sharing any (band, value)
    * bucket become candidates → verified by estimated Jaccard (fraction
    * of agreeing minhashes). This is the 100 TB path: cost is
    * O(n · numHashes) + a keyed join on band buckets, never O(n²).
    * Returns (id_a, id_b, est_jaccard).
    */
  def minhashLshPairs(
      df: DataFrame,
      idCol: String,
      textCol: String,
      w: Int = 5,
      numHashes: Int = 16,
      bands: Int = 4,
      threshold: Double = 0.5
  ): DataFrame = {
    require(numHashes % bands == 0, "bands must divide numHashes")
    val rows = numHashes / bands
    val sig = df
      .select(col(idCol).as("id"), transform(tokens(col(textCol)), t => xxhash64(t)).as("hs"))
      .select(col("id"), shingleHashesOf(col("hs"), w).as("sh"))
      .filter(size(col("sh")) > 0)
      .select(col("id"), minhashSignatureFast(col("sh"), numHashes).as("sig"))
    val banded = sig.select(
      col("id"),
      col("sig"),
      explode(
        array((0 until bands).map { b =>
          struct(lit(b).as("band"),
            (b * rows until (b + 1) * rows)
              .map(j => rotl(element_at(col("sig"), j + 1), (j * 13) % 63 + 1))
              .reduce((a: Column, c: Column) => a.bitwiseXOR(c)).as("bucket"))
        }: _*)
      ).as("bb")
    ).select(col("id"), col("sig"), col("bb.band").as("band"), col("bb.bucket").as("bucket"))
      // materialize ONE banded-signature stage on the join keys: both
      // sides of the self-join below reuse it (AQE stage reuse), so
      // the numHashes min-passes run once per corpus, not twice
      .repartition(col("band"), col("bucket"))
    val est = aggregate(
      zip_with(col("sig_a"), col("sig_b"), (x, y) => when(x === y, 1).otherwise(0)),
      lit(0),
      (acc, v) => acc + v
    ).cast("double") / lit(numHashes.toDouble)
    // verify-then-dedup: the threshold rejects most candidates, so the
    // distinct shuffle only carries survivors
    banded.as("a")
      .join(banded.as("b"),
        col("a.band") === col("b.band") &&
          col("a.bucket") === col("b.bucket") &&
          col("a.id") < col("b.id"))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"),
        col("a.sig").as("sig_a"), col("b.sig").as("sig_b"))
      .select(col("id_a"), col("id_b"), round(est, 4).as("est_jaccard"))
      .filter(col("est_jaccard") >= threshold)
      .dropDuplicates("id_a", "id_b")
  }

  /** MinHash-blocked, exact-Jaccard-verified pairs: banding generates
    * candidates with the production xxhash64 machinery
    * (O(n·numHashes) + keyed equi-join, same plan shape as
    * [[minhashLshPairs]]), but the verdict is the TRUE shingle-set
    * Jaccard — hash-family-independent, so for any pair the blocking
    * surfaces the output matches plain-SQL ground truth. With
    * rows-per-band = numHashes/bands = 2, blocking recall at true
    * jaccard j is 1-(1-j²)^bands — ≈ 3e-12 miss at j ≥ 0.9 with the
    * default 32/16 — which is what lets the x_dedup_minhash_agree
    * query hash-check the fast pipeline against an all-pairs DuckDB
    * oracle. Production near-dup runs keep the estimated-Jaccard
    * verify (16 longs per pair instead of the shingle sets); this is
    * the ground-truth harness flavor.
    */
  def minhashExactPairs(
      df: DataFrame,
      idCol: String,
      textCol: String,
      w: Int = 3,
      numHashes: Int = 32,
      bands: Int = 16,
      threshold: Double = 0.9
  ): DataFrame = {
    require(numHashes % bands == 0, "bands must divide numHashes")
    val rows = numHashes / bands
    val base = df
      .select(col(idCol).as("id"), transform(tokens(col(textCol)), t => xxhash64(t)).as("hs"))
      .select(col("id"), shingleHashesOf(col("hs"), w).as("sh"))
      .filter(size(col("sh")) > 0)
      .select(col("id"), col("sh"), minhashSignatureFast(col("sh"), numHashes).as("sig"))
    val banded = base.select(
      col("id"),
      col("sh"),
      explode(
        array((0 until bands).map { b =>
          struct(lit(b).as("band"),
            (b * rows until (b + 1) * rows)
              .map(j => rotl(element_at(col("sig"), j + 1), (j * 13) % 63 + 1))
              .reduce((a: Column, c: Column) => a.bitwiseXOR(c)).as("bucket"))
        }: _*)
      ).as("bb")
    ).select(col("id"), col("sh"), col("bb.band").as("band"), col("bb.bucket").as("bucket"))
      .repartition(col("band"), col("bucket"))
    val jac = size(array_intersect(col("sh_a"), col("sh_b"))).cast("double") /
      size(array_union(col("sh_a"), col("sh_b"))).cast("double")
    banded.as("a")
      .join(banded.as("b"),
        col("a.band") === col("b.band") &&
          col("a.bucket") === col("b.bucket") &&
          col("a.id") < col("b.id"))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"),
        col("a.sh").as("sh_a"), col("b.sh").as("sh_b"))
      .select(col("id_a"), col("id_b"), round(jac, 4).as("jaccard"))
      .filter(col("jaccard") >= threshold)
      .dropDuplicates("id_a", "id_b")
  }

  /** SimHash-blocked, exact-Jaccard-verified pairs: the 64-bit
    * xxhash64 fingerprint + pigeonhole band join from [[simhashPairs]]
    * generate candidates at a wide Hamming radius, then the TRUE
    * shingle-set Jaccard decides. A j ≥ 0.9 pair has fingerprint
    * cosine ≳ 0.95, i.e. expected Hamming ≈ 6.5/64 — radius 20 leaves
    * a ~5σ recall margin (miss ≈ 1e-7) while the Jaccard verify
    * restores precision, so the agreement query is deterministic
    * ground truth. 21 bands × 3 bits cover 63 bits; diffs within the
    * covered region are ≤ total Hamming ≤ 20 < 21 bands, so at least
    * one band is clean (pigeonhole holds with the uncovered top bit).
    */
  def simhashExactPairs(
      df: DataFrame,
      idCol: String,
      textCol: String,
      w: Int = 3,
      maxHamming: Int = 20,
      threshold: Double = 0.9
  ): DataFrame = {
    val bands     = 21
    val bandWidth = 3
    val base = df
      .select(col(idCol).as("id"), transform(tokens(col(textCol)), t => xxhash64(t)).as("hs"))
      .select(col("id"), simhashOfHashes(col("hs")).as("sim"), shingleHashesOf(col("hs"), w).as("sh"))
      .filter(size(col("sh")) > 0)
    val banded = base.select(
      col("id"),
      col("sim"),
      col("sh"),
      explode(array((0 until bands).map { b =>
        struct(
          lit(b).as("band"),
          shiftright(col("sim"), b * bandWidth)
            .bitwiseAND(lit((1L << bandWidth) - 1)).as("chunk"))
      }: _*)).as("bb")
    ).select(col("id"), col("sim"), col("sh"), col("bb.band").as("band"), col("bb.chunk").as("chunk"))
      .repartition(col("band"), col("chunk"))
    val jac = size(array_intersect(col("sh_a"), col("sh_b"))).cast("double") /
      size(array_union(col("sh_a"), col("sh_b"))).cast("double")
    banded.as("a")
      .join(banded.as("b"),
        col("a.band") === col("b.band") &&
          col("a.chunk") === col("b.chunk") &&
          col("a.id") < col("b.id"))
      .filter(bit_count(col("a.sim").bitwiseXOR(col("b.sim"))) <= maxHamming)
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"),
        col("a.sh").as("sh_a"), col("b.sh").as("sh_b"))
      .select(col("id_a"), col("id_b"), round(jac, 4).as("jaccard"))
      .filter(col("jaccard") >= threshold)
      .dropDuplicates("id_a", "id_b")
  }

  /** MinHash signature, md5 flavor: the per-seed min is the
    * lexicographic minimum of `md5(seed:shingle)` hex strings. Slower
    * than the xxhash64 flavor (use that at scale) but byte-identical
    * in ANSI SQL, which makes the whole LSH pipeline oracle-checkable.
    */
  def minhashSignatureMd5(shingleArr: Column, numHashes: Int): Column =
    call_function("minhash_md5_sigs", shingleArr, lit(numHashes))

  /** MinHash-LSH near-dup pairs, md5/oracle flavor. Identical plan
    * shape to [[minhashLshPairs]]: signature → bands → bucket
    * equi-join → estimated-Jaccard verify. Returns
    * (id_a, id_b, est_jaccard).
    */
  def minhashLshPairsMd5(
      df: DataFrame,
      idCol: String,
      textCol: String,
      w: Int = 3,
      numHashes: Int = 12,
      bands: Int = 4,
      threshold: Double = 0.5
  ): DataFrame = {
    require(numHashes % bands == 0, "bands must divide numHashes")
    val rows = numHashes / bands
    val sig = df
      .select(col(idCol).as("id"), tokens(col(textCol)).as("ts"))
      .select(col("id"), shinglesOf(col("ts"), w).as("sh"))
      .filter(size(col("sh")) > 0)
      .select(col("id"), minhashSignatureMd5(col("sh"), numHashes).as("sig"))
    val banded = sig.select(
      col("id"),
      col("sig"),
      explode(array((0 until bands).map { b =>
        struct(lit(b).as("band"),
          concat_ws("|", slice(col("sig"), b * rows + 1, rows)).as("bucket"))
      }: _*)).as("bb")
    ).select(col("id"), col("sig"), col("bb.band").as("band"), col("bb.bucket").as("bucket"))
      // single materialized banded stage reused by both self-join sides
      .repartition(col("band"), col("bucket"))
    val est = aggregate(
      zip_with(col("sig_a"), col("sig_b"), (x, y) => when(x === y, 1).otherwise(0)),
      lit(0),
      (acc, v) => acc + v
    ).cast("double") / lit(numHashes.toDouble)
    banded.as("a")
      .join(banded.as("b"),
        col("a.band") === col("b.band") &&
          col("a.bucket") === col("b.bucket") &&
          col("a.id") < col("b.id"))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"),
        col("a.sig").as("sig_a"), col("b.sig").as("sig_b"))
      .select(col("id_a"), col("id_b"), round(est, 4).as("est_jaccard"))
      .filter(col("est_jaccard") >= threshold)
      .dropDuplicates("id_a", "id_b")
  }

  /** 32-bit SimHash, md5 flavor (oracle-checkable): bit b of a token's
    * hash is bit (b%4) of hex nibble b/4 of md5(token); the fingerprint
    * sets bit b when the token votes sum positive.
    */
  def simhash32Md5(tokensArr: Column): Column =
    simhash32OfMd5(transform(tokensArr, t => md5(t)))

  /** Same, over an already-materialized md5-hex array column — the
    * pairs op projects the hashes first so each token is hashed once,
    * not once per bit.
    */
  def simhash32OfMd5(hs: Column): Column = call_function("simhash32_md5", hs)

  /** SimHash near-dup pairs, 32-bit md5 flavor with 8 bands of 4 bits:
    * pigeonhole guarantees recall for Hamming distance ≤ 7. Returns
    * (id_a, id_b, hamming).
    */
  def simhash32Pairs(df: DataFrame, idCol: String, textCol: String, maxHamming: Int = 7): DataFrame = {
    val bands     = 8
    val bandWidth = 4
    val withSim = df
      .select(col(idCol).as("id"), transform(tokens(col(textCol)), t => md5(t)).as("hs"))
      .select(col("id"), simhash32OfMd5(col("hs")).as("sim"))
    val banded = withSim.select(
      col("id"),
      col("sim"),
      explode(array((0 until bands).map { b =>
        struct(
          lit(b).as("band"),
          shiftright(col("sim"), b * bandWidth)
            .bitwiseAND(lit((1L << bandWidth) - 1)).as("chunk"))
      }: _*)).as("bb")
    ).select(col("id"), col("sim"), col("bb.band").as("band"), col("bb.chunk").as("chunk"))
      // single materialized banded stage reused by both self-join sides
      .repartition(col("band"), col("chunk"))
    val ham = bit_count(col("sim_a").bitwiseXOR(col("sim_b")))
    banded.as("a")
      .join(banded.as("b"),
        col("a.band") === col("b.band") &&
          col("a.chunk") === col("b.chunk") &&
          col("a.id") < col("b.id"))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"),
        col("a.sim").as("sim_a"), col("b.sim").as("sim_b"))
      .withColumn("hamming", ham)
      .filter(col("hamming") <= maxHamming)
      .dropDuplicates("id_a", "id_b")
      .select(col("id_a"), col("id_b"), col("hamming"))
  }

  /** 64-bit SimHash over word tokens: sign-sum of the bits of
    * xxhash64(token). Docs with small Hamming distance are near-dups.
    * Computed via bit algebra on longs — no UDF.
    */
  def simhash(tokensArr: Column): Column =
    simhashOfHashes(transform(tokensArr, t => xxhash64(t)))

  /** Same, over an already-materialized xxhash64 array column: the
    * fused one-pass native expression
    * ([[graft.functions.Simhash64Expr]], bit-identical to the 64
    * per-bit aggregate folds it replaced; requires `GraftExtensions`
    * on the session).
    */
  def simhashOfHashes(hashes: Column): Column = call_function("simhash64", hashes)

  /** SimHash near-dup pairs with band blocking: split the 64-bit
    * fingerprint into `bands` chunks; by pigeonhole, any pair within
    * Hamming distance < bands shares at least one exact chunk, so the
    * join is again a keyed equi-join, verified by popcount.
    */
  def simhashPairs(df: DataFrame, idCol: String, textCol: String, maxHamming: Int = 3): DataFrame = {
    val bands     = maxHamming + 1
    val bandWidth = 64 / bands
    val withSim = df
      .select(col(idCol).as("id"), transform(tokens(col(textCol)), t => xxhash64(t)).as("hs"))
      .select(col("id"), simhashOfHashes(col("hs")).as("sim"))
    val banded = withSim.select(
      col("id"),
      col("sim"),
      explode(array((0 until bands).map { b =>
        struct(
          lit(b).as("band"),
          shiftright(col("sim"), b * bandWidth)
            .bitwiseAND(lit((1L << bandWidth) - 1)).as("chunk"))
      }: _*)).as("bb")
    ).select(col("id"), col("sim"), col("bb.band").as("band"), col("bb.chunk").as("chunk"))
      // single materialized banded stage reused by both self-join sides
      .repartition(col("band"), col("chunk"))
    val ham = bit_count(col("sim_a").bitwiseXOR(col("sim_b")))
    banded.as("a")
      .join(banded.as("b"),
        col("a.band") === col("b.band") &&
          col("a.chunk") === col("b.chunk") &&
          col("a.id") < col("b.id"))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"),
        col("a.sim").as("sim_a"), col("b.sim").as("sim_b"))
      .withColumn("hamming", ham)
      .filter(col("hamming") <= maxHamming)
      .dropDuplicates("id_a", "id_b")
      .select(col("id_a"), col("id_b"), col("hamming"))
  }

  /** Embedding near-dup pairs by cosine ≥ threshold, blocked by a
    * coarse quantization of the dominant dimensions (sign of the first
    * `planes` components) so candidates are bucket-local. For exact
    * recall use Similarity.cosineTopK against the full set.
    */
  def embeddingNearDupPairs(df: DataFrame, idCol: String, vecCol: String, threshold: Double, planes: Int = 4): DataFrame = {
    // No per-element normalization (a normalize lambda would capture
    // the norm and recompute it per element): cosine is computed as
    // dot(a,b)/(‖a‖·‖b‖) with norms carried as plain columns. The
    // sign-plane bucket uses raw components — positive scaling
    // preserves signs, so bucketing matches normalized semantics.
    val keyed = df.select(
      col(idCol).as("id"),
      col(vecCol).as("v"),
      sqrt(aggregate(col(vecCol), lit(0.0),
        (acc, x) => acc + x.cast("double") * x.cast("double"))).as("nrm"),
      (0 until planes)
        .map(i => when(element_at(col(vecCol), i + 1) >= 0, 1 << i).otherwise(0))
        .reduce((a: Column, b: Column) => a + b).as("bucket")
    )
    val cos = Similarity.dot(col("a.v"), col("b.v")) / (col("a.nrm") * col("b.nrm"))
    // single materialized keyed stage reused by both self-join sides
    val keyedM = keyed.repartition(col("bucket"))
    keyedM.as("a")
      .join(keyedM.as("b"), col("a.bucket") === col("b.bucket") && col("a.id") < col("b.id"))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"), round(cos, 4).as("cosine"))
      .filter(col("cosine") >= threshold)
  }
}
