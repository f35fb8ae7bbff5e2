package graft.functions

import java.nio.charset.StandardCharsets

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.types._

/** Distinct-sampling quantile sketch as a native Spark aggregate:
  * `kmv_quantile(v_bigint, k, p)` → the p-th percentile (p in 0..100)
  * of the multiset, estimated from a bounded synopsis.
  *
  * The synopsis keeps the k distinct values whose md5(CAST(v AS
  * VARCHAR)) hashes are lexicographically smallest — the same k-min
  * rule as [[KmvDistinctAgg]] — and, per kept value, its TOTAL
  * multiset count. Counts survive partials and merges exactly: a value
  * in the final k-min set has a hash below every intermediate
  * buffer's eviction threshold (thresholds only shrink), so every
  * occurrence was tallied somewhere that merged in ascending-hash
  * order before the value could be discarded. The result is a
  * uniform-over-distinct-values sample carrying exact frequencies
  * (Gibbons, "Distinct Sampling for Highly-Accurate Answers to
  * Distinct Values Queries and Event Reports", VLDB'01), and the
  * weighted empirical CDF over the sample estimates the true CDF.
  * (Exactness argument: a hash is only ever discarded or evicted when
  * k smaller distinct hashes exist in the same buffer; those are real
  * hashes of the global union, so the victim was never in the union's
  * k-min set — final members are therefore never dropped anywhere and
  * their counts accumulate losslessly.)
  *
  * eval returns the LOWER WEIGHTED QUANTILE of the sample: the
  * smallest kept value v with 100·cum(v) ≥ p·total — all-integer
  * arithmetic, so the whole estimator (k-min selection included) is
  * replayable in plain SQL and hash-gateable cross-engine. When the
  * group has ≤ k distinct values the sample IS the distribution and
  * the answer is the exact percentile. GK/KLL/t-digest summaries are
  * merge-ORDER-dependent, which is what makes them un-oracle-able;
  * this sketch is a semilattice (k-min set union + count addition),
  * so any partitioning, any merge tree, same bytes.
  *
  * Scale shape: map-side partials keep ≤ k (hash, value, count)
  * entries; the shuffle carries a ≤ k-entry synopsis per group where
  * exact `percentile` shuffles every value. Accuracy degrades
  * gracefully on heavy-hitter-skewed multisets (a heavy value is
  * sampled at the same rate as a rare one); the sf-gate query rides
  * the exact percentile alongside so the error stays driver-visible.
  */
case class KmvQuantileAgg(
    child: Expression,
    k: Int,
    p: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0
) extends TypedImperativeAggregate[java.util.TreeMap[String, Array[Long]]] {

  require(k >= 2, "kmv_quantile needs k >= 2")
  require(p >= 0 && p <= 100, "kmv_quantile needs a percentile in 0..100")

  override def children: Seq[Expression] = Seq(child)
  // md5(CAST(v AS VARCHAR)) with BIGINT rendering is the cross-engine
  // contract: require the long explicitly so Spark and the oracle
  // hash identical bytes ("42", never "42.0").
  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case LongType => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"kmv_quantile requires a BIGINT value argument (cast explicitly so " +
          s"the oracle hashes the same rendering); got ${other.catalogString}")
    }
  override def nullable: Boolean = true
  override def dataType: DataType = LongType
  override def prettyName: String = "kmv_quantile"

  override def createAggregationBuffer(): java.util.TreeMap[String, Array[Long]] =
    new java.util.TreeMap[String, Array[Long]]()

  override def update(buf: java.util.TreeMap[String, Array[Long]], input: InternalRow): java.util.TreeMap[String, Array[Long]] = {
    val raw = child.eval(input)
    if (raw != null) QuantileSynopsis.addLong(buf, k, raw.asInstanceOf[Long])
    buf
  }

  // discards are safe in any iteration order: a hash only gets
  // dropped when k smaller hashes are present, and those are genuine
  // members of the union — so the dropped hash was never going to be
  // in the union's k-min set
  override def merge(buf: java.util.TreeMap[String, Array[Long]], other: java.util.TreeMap[String, Array[Long]]): java.util.TreeMap[String, Array[Long]] =
    QuantileSynopsis.merge(buf, k, other)

  override def eval(buf: java.util.TreeMap[String, Array[Long]]): Any =
    QuantileSynopsis.quantile(buf, p)

  override def serialize(buf: java.util.TreeMap[String, Array[Long]]): Array[Byte] =
    QuantileSynopsis.serialize(buf)

  override def deserialize(bytes: Array[Byte]): java.util.TreeMap[String, Array[Long]] =
    QuantileSynopsis.deserialize(bytes)

  override def withNewMutableAggBufferOffset(newOffset: Int): KmvQuantileAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): KmvQuantileAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): KmvQuantileAgg =
    copy(child = newChildren.head)
}

/** Shared synopsis algebra for the quantile-sketch family: the
  * TreeMap buffer (hash → [value, count]), the k-min insert rule, the
  * lower-weighted-quantile eval and the `h:v:c` wire form.
  */
private[functions] object QuantileSynopsis {
  def add(buf: java.util.TreeMap[String, Array[Long]], k: Int, h: String, v: Long, n: Long): Unit = {
    val hit = buf.get(h)
    if (hit != null) hit(1) += n
    else if (buf.size < k) { buf.put(h, Array(v, n)); () }
    else if (h < buf.lastKey) { buf.put(h, Array(v, n)); buf.remove(buf.lastKey); () }
  }

  /** The raw-value insert shared by the direct and sketch forms — one
    * definition so their hashing can never desynchronize (the
    * merge ≡ direct law depends on it).
    */
  def addLong(buf: java.util.TreeMap[String, Array[Long]], k: Int, v: Long): Unit =
    add(buf, k, KmvDistinctAgg.md5Hex(v.toString.getBytes(StandardCharsets.US_ASCII)), v, 1L)

  /** Parse one `hash:value:count` wire entry; None for anything
    * malformed (a merge over arbitrary strings must degrade per-entry,
    * not throw on an executor).
    */
  def parseEntry(s: String): Option[(String, Long, Long)] = {
    val parts = s.split(":")
    if (parts.length != 3) None
    else
      try Some((parts(0), parts(1).toLong, parts(2).toLong))
      catch { case _: NumberFormatException => None }
  }

  def merge(buf: java.util.TreeMap[String, Array[Long]], k: Int,
      other: java.util.TreeMap[String, Array[Long]]): java.util.TreeMap[String, Array[Long]] = {
    val it = other.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      add(buf, k, e.getKey, e.getValue()(0), e.getValue()(1))
    }
    buf
  }

  def quantile(buf: java.util.TreeMap[String, Array[Long]], p: Int): Any =
    if (buf.isEmpty) null
    else {
      val sample = new Array[Array[Long]](buf.size)
      val it     = buf.values().iterator()
      var i      = 0
      while (it.hasNext) { sample(i) = it.next(); i += 1 }
      java.util.Arrays.sort(sample, java.util.Comparator.comparingLong[Array[Long]](_(0)))
      var total = 0L
      sample.foreach(total += _(1))
      var cum = 0L
      var res = sample(sample.length - 1)(0)
      var j   = 0
      var hit = false
      while (j < sample.length && !hit) {
        cum += sample(j)(1)
        if (100L * cum >= p.toLong * total) { res = sample(j)(0); hit = true }
        j += 1
      }
      res
    }

  def serialize(buf: java.util.TreeMap[String, Array[Long]]): Array[Byte] = {
    val sb = new java.lang.StringBuilder(buf.size * 48)
    val it = buf.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      if (sb.length > 0) sb.append(',')
      sb.append(e.getKey).append(':').append(e.getValue()(0)).append(':').append(e.getValue()(1))
    }
    sb.toString.getBytes(StandardCharsets.US_ASCII)
  }

  def deserialize(bytes: Array[Byte]): java.util.TreeMap[String, Array[Long]] = {
    val buf = new java.util.TreeMap[String, Array[Long]]()
    val s   = new String(bytes, StandardCharsets.US_ASCII)
    if (s.nonEmpty) s.split(",").foreach { entry =>
      val parts = entry.split(":")
      buf.put(parts(0), Array(parts(1).toLong, parts(2).toLong))
    }
    buf
  }
}

/** The quantile SYNOPSIS itself (`kmv_quantile_sketch(v, k)` → sorted
  * `array<string>` of `hash:value:count` entries) — the composable
  * form of [[KmvQuantileAgg]]: per-group/day/source synopses persist
  * as plain string arrays, and because the summary is a semilattice,
  * re-aggregating stored synopses with [[KmvQuantileMergeAgg]] yields
  * EXACTLY the sketch (and quantile) a direct pass over the raw rows
  * would — the law the gate verifies cross-engine. Same buffer
  * discipline: ≤ k entries map-side and on the shuffle.
  */
case class KmvQuantileSketchAgg(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0
) extends TypedImperativeAggregate[java.util.TreeMap[String, Array[Long]]] {

  require(k >= 2, "kmv_quantile_sketch needs k >= 2")

  override def children: Seq[Expression] = Seq(child)
  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case LongType => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"kmv_quantile_sketch requires a BIGINT value argument; got ${other.catalogString}")
    }
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "kmv_quantile_sketch"

  override def createAggregationBuffer(): java.util.TreeMap[String, Array[Long]] =
    new java.util.TreeMap[String, Array[Long]]()

  override def update(buf: java.util.TreeMap[String, Array[Long]], input: InternalRow): java.util.TreeMap[String, Array[Long]] = {
    val raw = child.eval(input)
    if (raw != null) QuantileSynopsis.addLong(buf, k, raw.asInstanceOf[Long])
    buf
  }

  override def merge(buf: java.util.TreeMap[String, Array[Long]], other: java.util.TreeMap[String, Array[Long]]): java.util.TreeMap[String, Array[Long]] =
    QuantileSynopsis.merge(buf, k, other)

  override def eval(buf: java.util.TreeMap[String, Array[Long]]): Any = {
    val arr = new Array[Any](buf.size)
    val it  = buf.entrySet().iterator()
    var i   = 0
    while (it.hasNext) {
      val e = it.next()
      arr(i) = org.apache.spark.unsafe.types.UTF8String.fromString(
        s"${e.getKey}:${e.getValue()(0)}:${e.getValue()(1)}")
      i += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(arr)
  }

  override def serialize(buf: java.util.TreeMap[String, Array[Long]]): Array[Byte] =
    QuantileSynopsis.serialize(buf)
  override def deserialize(bytes: Array[Byte]): java.util.TreeMap[String, Array[Long]] =
    QuantileSynopsis.deserialize(bytes)

  override def withNewMutableAggBufferOffset(newOffset: Int): KmvQuantileSketchAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): KmvQuantileSketchAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): KmvQuantileSketchAgg =
    copy(child = newChildren.head)
}

/** Re-aggregate stored synopsis entries (`hash:value:count` strings,
  * e.g. exploded [[KmvQuantileSketchAgg]] output) back into the
  * global quantile: `kmv_quantile_merge(entry, k, p)`. Counts sum on
  * shared hashes, the k-min rule trims, eval is the same
  * lower-weighted quantile — so merge(sketches) ≡ direct sketch by
  * the semilattice law, answering corpus-level quantile questions
  * from per-partition synopsis tables without re-scanning the rows.
  */
case class KmvQuantileMergeAgg(
    child: Expression,
    k: Int,
    p: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0
) extends TypedImperativeAggregate[java.util.TreeMap[String, Array[Long]]] {

  require(k >= 2, "kmv_quantile_merge needs k >= 2")
  require(p >= 0 && p <= 100, "kmv_quantile_merge needs a percentile in 0..100")

  override def children: Seq[Expression] = Seq(child)
  override def checkInputDataTypes(): TypeCheckResult =
    KmvDistinctAgg.requireString("kmv_quantile_merge", child)
  override def nullable: Boolean = true
  override def dataType: DataType = LongType
  override def prettyName: String = "kmv_quantile_merge"

  override def createAggregationBuffer(): java.util.TreeMap[String, Array[Long]] =
    new java.util.TreeMap[String, Array[Long]]()

  // malformed entries are SKIPPED, not thrown: this is a public SQL
  // function, and one bad string must not fail the job
  override def update(buf: java.util.TreeMap[String, Array[Long]], input: InternalRow): java.util.TreeMap[String, Array[Long]] = {
    val raw = child.eval(input)
    if (raw != null)
      QuantileSynopsis.parseEntry(raw.toString).foreach { case (h, v, n) =>
        QuantileSynopsis.add(buf, k, h, v, n)
      }
    buf
  }

  override def merge(buf: java.util.TreeMap[String, Array[Long]], other: java.util.TreeMap[String, Array[Long]]): java.util.TreeMap[String, Array[Long]] =
    QuantileSynopsis.merge(buf, k, other)

  override def eval(buf: java.util.TreeMap[String, Array[Long]]): Any =
    QuantileSynopsis.quantile(buf, p)

  override def serialize(buf: java.util.TreeMap[String, Array[Long]]): Array[Byte] =
    QuantileSynopsis.serialize(buf)
  override def deserialize(bytes: Array[Byte]): java.util.TreeMap[String, Array[Long]] =
    QuantileSynopsis.deserialize(bytes)

  override def withNewMutableAggBufferOffset(newOffset: Int): KmvQuantileMergeAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): KmvQuantileMergeAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): KmvQuantileMergeAgg =
    copy(child = newChildren.head)
}
