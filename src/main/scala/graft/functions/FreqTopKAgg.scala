package graft.functions

import java.nio.charset.StandardCharsets.UTF_8

import scala.collection.mutable

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Misra-Gries heavy-hitters sketch as a native Spark aggregate:
  * `freq_topk(str, k)` → `array<struct<item, cnt>>` sorted by
  * (cnt desc, item asc).
  *
  * The summary keeps at most k counters. Seeing a tracked item
  * increments its counter; an untracked item either claims a free
  * slot or decrements EVERY counter by one (dropping zeros) — the
  * classic frequent-items algorithm (Misra & Gries 1982). Guarantees:
  * every item with true frequency > N/(k+1) is present, and each
  * reported count undercounts its true frequency by at most N/(k+1).
  * With k at least the number of distinct items, no decrement ever
  * fires and the counts are EXACT — the envelope the cross-engine
  * oracle checks (the decrement path is order-dependent, so no SQL
  * replay can pin its exact counters; the error-bound contract is
  * spec-checked instead, the same split as the SimHash fast flavor).
  *
  * Merge is the mergeable-summaries rule (Agarwal et al., "Mergeable
  * Summaries", PODS'12): add counters pointwise, and if more than k
  * remain, subtract the (k+1)-th largest count from all and drop the
  * non-positive — error stays ≤ N/(k+1) after any merge tree, which
  * is what makes the map-side partial → shuffle → final path safe.
  *
  * Scale shape: a TypedImperativeAggregate, so partials build map-side
  * and the shuffle carries ≤ k (item, count) pairs per group instead
  * of every distinct item — `groupBy(token).count().orderBy(...)` at
  * 100 TB shuffles the whole vocabulary; this shuffles a bounded
  * synopsis.
  */
case class FreqTopKAgg(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0
) extends TypedImperativeAggregate[mutable.HashMap[String, Long]] {

  require(k >= 1, "freq_topk needs k >= 1")

  override def children: Seq[Expression] = Seq(child)
  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case StringType => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"freq_topk requires a STRING item argument; got ${other.catalogString}")
    }
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(
    StructType(Seq(
      StructField("item", StringType, nullable = false),
      StructField("cnt", LongType, nullable = false))),
    containsNull = false)
  override def prettyName: String = "freq_topk"

  override def createAggregationBuffer(): mutable.HashMap[String, Long] =
    mutable.HashMap.empty

  private def offer(buf: mutable.HashMap[String, Long], item: String, by: Long): Unit = {
    buf.get(item) match {
      case Some(c) => buf.update(item, c + by)
      case None if buf.size < k => buf.update(item, by)
      case None =>
        // decrement-all by the smaller of `by` and the current minimum
        // (repeat until the new item lands or its weight is consumed —
        // weighted MG, needed for counter-carrying merges)
        var remaining = by
        while (remaining > 0 && !buf.contains(item) && buf.size >= k) {
          val dec = math.min(remaining, buf.values.min)
          buf.mapValuesInPlace((_, c) => c - dec)
          buf.filterInPlace((_, c) => c > 0)
          remaining -= dec
        }
        if (remaining > 0) buf.update(item, remaining)
    }
    ()
  }

  override def update(buf: mutable.HashMap[String, Long], input: InternalRow): mutable.HashMap[String, Long] = {
    val v = child.eval(input)
    if (v != null) offer(buf, v.asInstanceOf[UTF8String].toString, 1L)
    buf
  }

  override def merge(buf: mutable.HashMap[String, Long], other: mutable.HashMap[String, Long]): mutable.HashMap[String, Long] = {
    // pointwise add, then the PODS'12 trim back to k counters
    other.foreach { case (item, c) =>
      buf.update(item, buf.getOrElse(item, 0L) + c)
    }
    if (buf.size > k) {
      val cut = buf.values.toArray.sorted(Ordering[Long].reverse).apply(k)
      buf.mapValuesInPlace((_, c) => c - cut)
      buf.filterInPlace((_, c) => c > 0)
    }
    buf
  }

  override def eval(buf: mutable.HashMap[String, Long]): Any = {
    val sorted = buf.toArray.sortBy { case (item, c) => (-c, item) }
    new GenericArrayData(sorted.map { case (item, c) =>
      InternalRow(UTF8String.fromString(item), c)
    }.asInstanceOf[Array[Any]])
  }

  // length-prefixed binary layout (items may contain any character)
  override def serialize(buf: mutable.HashMap[String, Long]): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    val out = new java.io.DataOutputStream(bos)
    out.writeInt(buf.size)
    buf.foreach { case (item, c) =>
      val b = item.getBytes(UTF_8)
      out.writeInt(b.length); out.write(b); out.writeLong(c)
    }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): mutable.HashMap[String, Long] = {
    val in  = new java.io.DataInputStream(new java.io.ByteArrayInputStream(bytes))
    val n   = in.readInt()
    val buf = mutable.HashMap.empty[String, Long]
    var i   = 0
    while (i < n) {
      val b = new Array[Byte](in.readInt()); in.readFully(b)
      buf.update(new String(b, UTF_8), in.readLong())
      i += 1
    }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): FreqTopKAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): FreqTopKAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): FreqTopKAgg =
    copy(child = newChildren.head)
}
