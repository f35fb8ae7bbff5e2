package graft.functions

import java.nio.charset.StandardCharsets
import java.security.MessageDigest

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** KMV (k-minimum-values) distinct-count sketch as a native Spark
  * aggregate: `kmv_distinct(str, k)`.
  *
  * The sketch keeps the k lexicographically-smallest DISTINCT md5
  * hashes seen. md5 hex of a uniform input is uniform in [0,1) read
  * as a hex fraction, so the k-th smallest value u_k estimates
  * distinct ≈ (k−1)/u_k; with fewer than k distinct hashes the set IS
  * the distinct values and the count is exact. Standard error is
  * ~1/√(k−2) (Beyer et al., "On Synopses for Distinct-Value
  * Estimation Under Multiset Operations", SIGMOD'07).
  *
  * Why this over `approx_count_distinct`: HLL sketches are
  * engine-specific byte layouts, so no cross-engine oracle can check
  * one. KMV is deterministic given the hash — DuckDB replays the
  * estimator in plain SQL (distinct md5s → k-th smallest → same
  * division) and the result hash-matches, which makes the sketch
  * family itself oracle-gateable.
  *
  * Scale shape: a TypedImperativeAggregate, so partial sketches build
  * map-side (each task keeps ≤ k hashes) and merge is a bounded
  * set-union-and-trim — the shuffle carries k·32 bytes per group, not
  * the distinct values. That is the whole point of a sketch at 100 TB:
  * `countDistinct` shuffles every distinct value; this shuffles a
  * fixed-size synopsis.
  *
  * The input must already be a string (cast explicitly): hashing
  * CAST(x AS VARCHAR) keeps Spark and the oracle byte-identical.
  */
case class KmvDistinctAgg(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0
) extends TypedImperativeAggregate[java.util.TreeSet[String]] {

  require(k >= 2, "kmv_distinct needs k >= 2")

  override def children: Seq[Expression] = Seq(child)
  // Hashing CAST(x AS VARCHAR) is the cross-engine contract, so the
  // cast must be explicit at the call site — reject non-string input
  // at analysis instead of ClassCastException at execution.
  override def checkInputDataTypes(): TypeCheckResult =
    KmvDistinctAgg.requireString("kmv_distinct", child)
  override def nullable: Boolean = false
  override def dataType: DataType = DoubleType
  override def prettyName: String = "kmv_distinct"

  override def createAggregationBuffer(): java.util.TreeSet[String] =
    new java.util.TreeSet[String]()

  private def add(buf: java.util.TreeSet[String], h: String): Unit = {
    if (buf.size < k) { buf.add(h); () }
    else if (h < buf.last && !buf.contains(h)) { buf.add(h); buf.remove(buf.last); () }
  }

  override def update(buf: java.util.TreeSet[String], input: InternalRow): java.util.TreeSet[String] = {
    val v = child.eval(input)
    if (v != null) add(buf, KmvDistinctAgg.md5Hex(v.asInstanceOf[UTF8String].getBytes))
    buf
  }

  override def merge(buf: java.util.TreeSet[String], other: java.util.TreeSet[String]): java.util.TreeSet[String] = {
    val it = other.iterator()
    while (it.hasNext) add(buf, it.next())
    buf
  }

  override def eval(buf: java.util.TreeSet[String]): Any =
    if (buf.size < k) buf.size.toDouble
    else {
      // u_k from the first 48 bits (12 hex nibbles) of the k-th
      // smallest hash — exactly representable in double, exactly
      // reproducible by the SQL oracle's nibble fold
      val u = java.lang.Long.parseLong(buf.last.substring(0, 12), 16).toDouble /
        KmvDistinctAgg.Denom
      (k - 1).toDouble / u
    }

  override def serialize(buf: java.util.TreeSet[String]): Array[Byte] =
    String.join(",", buf).getBytes(StandardCharsets.US_ASCII)

  override def deserialize(bytes: Array[Byte]): java.util.TreeSet[String] = {
    val buf = new java.util.TreeSet[String]()
    val s   = new String(bytes, StandardCharsets.US_ASCII)
    if (s.nonEmpty) s.split(",").foreach(buf.add)
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): KmvDistinctAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): KmvDistinctAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): KmvDistinctAgg =
    copy(child = newChildren.head)
}

object KmvDistinctAgg {
  /** 16^12 = 2^48: the hex-fraction denominator for the first 12 nibbles. */
  val Denom: Double = 281474976710656.0

  /** Analysis-time input check shared by both KMV forms: the value
    * child must already be a string (the md5(CAST(x AS VARCHAR))
    * cross-engine contract), never implicitly cast.
    */
  private[functions] def requireString(fn: String, child: Expression): TypeCheckResult =
    child.dataType match {
      case StringType => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"$fn requires a STRING value argument (cast explicitly so the " +
          s"oracle hashes the same bytes); got ${other.catalogString}")
    }

  def md5Hex(bytes: Array[Byte]): String = {
    val d  = MessageDigest.getInstance("MD5").digest(bytes)
    val sb = new java.lang.StringBuilder(32)
    var i  = 0
    while (i < d.length) {
      sb.append(Character.forDigit((d(i) >> 4) & 0xf, 16))
      sb.append(Character.forDigit(d(i) & 0xf, 16))
      i += 1
    }
    sb.toString
  }

  /** (k−1)/u_k estimate from a sorted k-min hash set; exact below k. */
  def estimate(sorted: Seq[String], k: Int): Double =
    if (sorted.size < k) sorted.size.toDouble
    else (k - 1).toDouble /
      (java.lang.Long.parseLong(sorted(k - 1).substring(0, 12), 16).toDouble / Denom)
}

/** The k-min SKETCH itself (`kmv_sketch(str, k)` → sorted
  * `array<string>` of the k smallest distinct md5s) — the composable
  * form of [[KmvDistinctAgg]]: synopses of different groups combine
  * by set algebra (union = k smallest of the merged sets; Jaccard =
  * share of the union synopsis present in both sides; intersection =
  * Jaccard × union estimate — Beyer et al. SIGMOD'07), which is what
  * makes overlap questions answerable from per-group sketches without
  * re-scanning the corpus. Same buffer/merge discipline as the
  * estimate form: map-side partials, k·32 bytes per group on the
  * shuffle.
  */
case class KmvSketchAgg(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0
) extends TypedImperativeAggregate[java.util.TreeSet[String]] {

  require(k >= 2, "kmv_sketch needs k >= 2")

  override def children: Seq[Expression] = Seq(child)
  override def checkInputDataTypes(): TypeCheckResult =
    KmvDistinctAgg.requireString("kmv_sketch", child)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "kmv_sketch"

  override def createAggregationBuffer(): java.util.TreeSet[String] =
    new java.util.TreeSet[String]()

  private def add(buf: java.util.TreeSet[String], h: String): Unit = {
    if (buf.size < k) { buf.add(h); () }
    else if (h < buf.last && !buf.contains(h)) { buf.add(h); buf.remove(buf.last); () }
  }

  override def update(buf: java.util.TreeSet[String], input: InternalRow): java.util.TreeSet[String] = {
    val v = child.eval(input)
    if (v != null) add(buf, KmvDistinctAgg.md5Hex(v.asInstanceOf[UTF8String].getBytes))
    buf
  }

  override def merge(buf: java.util.TreeSet[String], other: java.util.TreeSet[String]): java.util.TreeSet[String] = {
    val it = other.iterator()
    while (it.hasNext) add(buf, it.next())
    buf
  }

  override def eval(buf: java.util.TreeSet[String]): Any = {
    val arr = new Array[Any](buf.size)
    val it  = buf.iterator()
    var i   = 0
    while (it.hasNext) { arr(i) = UTF8String.fromString(it.next()); i += 1 }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(arr)
  }

  override def serialize(buf: java.util.TreeSet[String]): Array[Byte] =
    String.join(",", buf).getBytes(StandardCharsets.US_ASCII)

  override def deserialize(bytes: Array[Byte]): java.util.TreeSet[String] = {
    val buf = new java.util.TreeSet[String]()
    val s   = new String(bytes, StandardCharsets.US_ASCII)
    if (s.nonEmpty) s.split(",").foreach(buf.add)
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): KmvSketchAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): KmvSketchAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): KmvSketchAgg =
    copy(child = newChildren.head)
}
