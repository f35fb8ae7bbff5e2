package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Deterministic pseudo-random numbers from integer keys.
  *
  * The reference pipeline samples with Python `random`/`np.random`
  * seeds 41/42 (reference: src/components/preprocessing/text_curator.py:224-250,
  * notebooks/demo2/settings.yaml). Exact RNG replay across languages is
  * impossible, so the engine defines sampling as *seeded and
  * deterministic from the row key*: a Knuth multiplicative hash mapped
  * to [0,1). Pure 64-bit integer arithmetic means the identical value
  * is computable in ANSI SQL (DuckDB oracle) and in Spark, and the
  * result is stable under repartitioning — unlike `rand(seed)`, whose
  * stream depends on partition layout and so breaks at scale-out.
  */
object DetHash {

  /** Knuth's multiplicative constant (golden-ratio hash). */
  val Mult = 2654435761L
  val Mod  = 4294967296L  // 2^32
  val KeyMod = 2147483648L // 2^31: (KeyMod-1)*Mult < Long.MaxValue

  /** Uniform-ish [0,1) double from a non-negative integer key column.
    * The key is reduced mod 2^31 before the multiply so the product
    * cannot overflow Long — Spark 4's default ANSI mode turns a silent
    * wraparound into a job-killing ARITHMETIC_OVERFLOW (and the DuckDB
    * oracle into a bigint out-of-range error). Keys below 2^31 (every
    * key the engine derives) hash exactly as before; larger keys fold.
    */
  def detUnit(key: Column): Column =
    (pmod(pmod(key, lit(KeyMod)) * lit(Mult), lit(Mod))).cast("double") / lit(Mod.toDouble)

  /** Same, as SQL text for the DuckDB oracle. `key` must be a
    * non-negative integer expression.
    */
  def detUnitSql(keyExpr: String): String =
    s"(CAST((((($keyExpr) % $KeyMod) * $Mult) % $Mod) AS DOUBLE) / $Mod.0)"

  /** Deterministic bucket in [0, n) from a key column. */
  def detBucket(key: Column, n: Int): Column =
    pmod(pmod(key, lit(KeyMod)) * lit(Mult), lit(Mod)) % n
}
