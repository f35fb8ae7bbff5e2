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

  /** Distinct word w-shingles of a text column. */
  def shingles(c: Column, w: Int): Column = {
    val ts = tokens(c)
    array_distinct(
      transform(
        sequence(lit(1), greatest(size(ts) - (w - 1), lit(0))),
        i => array_join(slice(ts, i, lit(w)), " ")
      )
    )
  }

  /** Exact n-gram-Jaccard near-dup pairs via an inverted shingle
    * index: explode distinct shingles → self-join on shingle (only
    * docs sharing a shingle ever meet) → intersection counts → Jaccard
    * from |A|+|B|−|A∩B|. Candidate volume is Σ df(shingle)², which
    * w-shingling keeps near-linear for natural text; the same plan at
    * 100 TB just needs the shingle join bucketed. Returns
    * (id_a, id_b, jaccard) with id_a < id_b, jaccard rounded to 4dp.
    */
  def jaccardPairs(df: DataFrame, idCol: String, textCol: String, w: Int, threshold: Double): DataFrame = {
    val sh = df
      .select(col(idCol).as("id"), explode(shingles(col(textCol), w)).as("sh"))
    val sizes = sh.groupBy("id").agg(count(lit(1)).as("n_sh"))
    val inter = sh.as("a")
      .join(sh.as("b"), col("a.sh") === col("b.sh") && col("a.id") < col("b.id"))
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

  /** MinHash signature: for each of `numHashes` seeded hash functions,
    * the min of xxhash64(seed, shingle) over the doc's shingle set.
    * Pure column algebra — the signature matrix never leaves codegen.
    */
  def minhashSignature(shingleArr: Column, numHashes: Int): Column =
    array((0 until numHashes).map { seed =>
      array_min(transform(shingleArr, s => xxhash64(lit(seed), s)))
    }: _*)

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
      .select(col(idCol).as("id"), shingles(col(textCol), w).as("sh"))
      .filter(size(col("sh")) > 0)
      .select(col("id"), minhashSignature(col("sh"), numHashes).as("sig"))
    val banded = sig.select(
      col("id"),
      col("sig"),
      explode(
        array((0 until bands).map { b =>
          struct(lit(b).as("band"), xxhash64(slice(col("sig"), b * rows + 1, rows).cast("string")).as("bucket"))
        }: _*)
      ).as("bb")
    )
    val cand = banded.as("a")
      .join(banded.as("b"),
        col("a.bb.band") === col("b.bb.band") &&
          col("a.bb.bucket") === col("b.bb.bucket") &&
          col("a.id") < col("b.id"))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"),
        col("a.sig").as("sig_a"), col("b.sig").as("sig_b"))
      .dropDuplicates("id_a", "id_b")
    val est = aggregate(
      zip_with(col("sig_a"), col("sig_b"), (x, y) => when(x === y, 1).otherwise(0)),
      lit(0),
      (acc, v) => acc + v
    ).cast("double") / lit(numHashes.toDouble)
    cand.select(col("id_a"), col("id_b"), round(est, 4).as("est_jaccard"))
      .filter(col("est_jaccard") >= threshold)
  }

  /** MinHash signature, md5 flavor: the per-seed min is the
    * lexicographic minimum of `md5(seed:shingle)` hex strings. Slower
    * than the xxhash64 flavor (use that at scale) but byte-identical
    * in ANSI SQL, which makes the whole LSH pipeline oracle-checkable.
    */
  def minhashSignatureMd5(shingleArr: Column, numHashes: Int): Column =
    array((0 until numHashes).map { seed =>
      array_min(transform(shingleArr, s => md5(concat(lit(s"$seed:"), s))))
    }: _*)

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
      .select(col(idCol).as("id"), shingles(col(textCol), w).as("sh"))
      .filter(size(col("sh")) > 0)
      .select(col("id"), minhashSignatureMd5(col("sh"), numHashes).as("sig"))
    val banded = sig.select(
      col("id"),
      col("sig"),
      explode(array((0 until bands).map { b =>
        struct(lit(b).as("band"),
          concat_ws("|", slice(col("sig"), b * rows + 1, rows)).as("bucket"))
      }: _*)).as("bb")
    )
    val est = aggregate(
      zip_with(col("sig_a"), col("sig_b"), (x, y) => when(x === y, 1).otherwise(0)),
      lit(0),
      (acc, v) => acc + v
    ).cast("double") / lit(numHashes.toDouble)
    banded.as("a")
      .join(banded.as("b"),
        col("a.bb.band") === col("b.bb.band") &&
          col("a.bb.bucket") === col("b.bb.bucket") &&
          col("a.id") < col("b.id"))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"),
        col("a.sig").as("sig_a"), col("b.sig").as("sig_b"))
      .dropDuplicates("id_a", "id_b")
      .select(col("id_a"), col("id_b"), round(est, 4).as("est_jaccard"))
      .filter(col("est_jaccard") >= threshold)
  }

  /** 32-bit SimHash, md5 flavor (oracle-checkable): bit b of a token's
    * hash is bit (b%4) of hex nibble b/4 of md5(token); the fingerprint
    * sets bit b when the token votes sum positive.
    */
  def simhash32Md5(tokensArr: Column): Column = {
    val hs = transform(tokensArr, t => md5(t))
    (0 until 32).map { b =>
      val votes = aggregate(hs, lit(0), (acc, h) => {
        val n  = conv(substring(h, b / 4 + 1, 1), 16, 10).cast("int")
        val bt = shiftright(n, b % 4).bitwiseAND(lit(1))
        acc + (bt * 2 - 1)
      })
      when(votes > 0, lit(1L << b)).otherwise(lit(0L))
    }.reduce((a: Column, b: Column) => a + b)
  }

  /** SimHash near-dup pairs, 32-bit md5 flavor with 8 bands of 4 bits:
    * pigeonhole guarantees recall for Hamming distance ≤ 7. Returns
    * (id_a, id_b, hamming).
    */
  def simhash32Pairs(df: DataFrame, idCol: String, textCol: String, maxHamming: Int = 7): DataFrame = {
    val bands     = 8
    val bandWidth = 4
    val withSim = df.select(col(idCol).as("id"), simhash32Md5(tokens(col(textCol))).as("sim"))
    val banded = withSim.select(
      col("id"),
      col("sim"),
      explode(array((0 until bands).map { b =>
        struct(
          lit(b).as("band"),
          shiftright(col("sim"), b * bandWidth)
            .bitwiseAND(lit((1L << bandWidth) - 1)).as("chunk"))
      }: _*)).as("bb")
    )
    val ham = bit_count(col("sim_a").bitwiseXOR(col("sim_b")))
    banded.as("a")
      .join(banded.as("b"),
        col("a.bb.band") === col("b.bb.band") &&
          col("a.bb.chunk") === col("b.bb.chunk") &&
          col("a.id") < col("b.id"))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"),
        col("a.sim").as("sim_a"), col("b.sim").as("sim_b"))
      .dropDuplicates("id_a", "id_b")
      .withColumn("hamming", ham)
      .filter(col("hamming") <= maxHamming)
      .select(col("id_a"), col("id_b"), col("hamming"))
  }

  /** 64-bit SimHash over word tokens: sign-sum of the bits of
    * xxhash64(token). Docs with small Hamming distance are near-dups.
    * Computed via bit algebra on longs — no UDF.
    */
  def simhash(tokensArr: Column): Column = {
    val hashes = transform(tokensArr, t => xxhash64(t))
    (0 until 64)
      .map { bit =>
        val votes = aggregate(
          hashes,
          lit(0L),
          (acc, h) => acc + when(shiftright(h, bit).bitwiseAND(lit(1L)) === 1L, lit(1L)).otherwise(lit(-1L))
        )
        when(votes > 0, lit(1L << bit)).otherwise(lit(0L))
      }
      .reduce((a: Column, b: Column) => a.bitwiseOR(b))
  }

  /** SimHash near-dup pairs with band blocking: split the 64-bit
    * fingerprint into `bands` chunks; by pigeonhole, any pair within
    * Hamming distance < bands shares at least one exact chunk, so the
    * join is again a keyed equi-join, verified by popcount.
    */
  def simhashPairs(df: DataFrame, idCol: String, textCol: String, maxHamming: Int = 3): DataFrame = {
    val bands     = maxHamming + 1
    val bandWidth = 64 / bands
    val withSim = df.select(col(idCol).as("id"), simhash(tokens(col(textCol))).as("sim"))
    val banded = withSim.select(
      col("id"),
      col("sim"),
      explode(array((0 until bands).map { b =>
        struct(
          lit(b).as("band"),
          shiftright(col("sim"), b * bandWidth)
            .bitwiseAND(lit((1L << bandWidth) - 1)).as("chunk"))
      }: _*)).as("bb")
    )
    val ham = bit_count(col("sim_a").bitwiseXOR(col("sim_b")))
    banded.as("a")
      .join(banded.as("b"),
        col("a.bb.band") === col("b.bb.band") &&
          col("a.bb.chunk") === col("b.bb.chunk") &&
          col("a.id") < col("b.id"))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"),
        col("a.sim").as("sim_a"), col("b.sim").as("sim_b"))
      .dropDuplicates("id_a", "id_b")
      .withColumn("hamming", ham)
      .filter(col("hamming") <= maxHamming)
      .select(col("id_a"), col("id_b"), col("hamming"))
  }

  /** Embedding near-dup pairs by cosine ≥ threshold, blocked by a
    * coarse quantization of the dominant dimensions (sign of the first
    * `planes` components) so candidates are bucket-local. For exact
    * recall use Similarity.cosineTopK against the full set.
    */
  def embeddingNearDupPairs(df: DataFrame, idCol: String, vecCol: String, threshold: Double, planes: Int = 4): DataFrame = {
    val normed = df.select(col(idCol).as("id"), Similarity.l2normalize(col(vecCol)).as("v"))
    val key = (0 until planes)
      .map(i => when(element_at(col("v"), i + 1) >= 0, 1 << i).otherwise(0))
      .reduce((a: Column, b: Column) => a + b)
    val keyed = normed.withColumn("bucket", key)
    val cos = Similarity.dot(col("a.v"), col("b.v"))
    keyed.as("a")
      .join(keyed.as("b"), col("a.bucket") === col("b.bucket") && col("a.id") < col("b.id"))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"), round(cos, 4).as("cosine"))
      .filter(col("cosine") >= threshold)
  }
}
