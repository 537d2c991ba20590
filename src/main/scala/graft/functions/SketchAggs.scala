package graft.functions

import java.nio.ByteBuffer
import java.nio.charset.StandardCharsets

import scala.collection.mutable

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Count-min sketch aggregate: `graft_cms(hashes, d, w)` where `hashes`
  * is the item's d precomputed row hashes (built in SQL as
  * `array(xxhash64(0, x), xxhash64(1, x), ...)` so a PROBE can reproduce
  * the identical mapping with builtin expressions — the sketch output is
  * a flat d×w LONG array and `element_at(sk, i*w + pmod(h_i, w) + 1)`
  * min-reduced over i is the estimate, no custom scalar needed).
  *
  * The buffer is one primitive long array; update touches d cells; merge
  * is elementwise add — the mergeable-sketch shape, so map-side partial
  * aggregation compresses each partition's billions of rows to d·w longs
  * before the single-row shuffle. At 100 TB this replaces a
  * groupBy(item) over an unbounded key space with O(d·w) fixed memory,
  * at the cost of a one-sided error ≤ n/w per row (Cormode &
  * Muthukrishnan, J.Alg 2005). */
case class CmsAgg(
    hs: Expression, d: Expression, w: Expression,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[Array[Long]] {

  override def children: Seq[Expression] = Seq(hs, d, w)

  override def checkInputDataTypes(): TypeCheckResult =
    if (!hs.dataType.isInstanceOf[ArrayType] ||
        hs.dataType.asInstanceOf[ArrayType].elementType != LongType)
      TypeCheckResult.TypeCheckFailure("graft_cms expects ARRAY<BIGINT>")
    else if (!d.foldable || !w.foldable ||
             d.dataType != IntegerType || w.dataType != IntegerType)
      TypeCheckResult.TypeCheckFailure("graft_cms d/w must be INT literals")
    else TypeCheckResult.TypeCheckSuccess

  private lazy val D = d.eval().asInstanceOf[Int]
  private lazy val W = w.eval().asInstanceOf[Int]

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "graft_cms"

  override def createAggregationBuffer(): Array[Long] = new Array[Long](D * W)

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val v = hs.eval(input)
    if (v != null) {
      val arr = v.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
      var i = 0
      while (i < D) {
        val h = arr.getLong(i)
        buf(i * W + java.lang.Math.floorMod(h, W.toLong).toInt) += 1L
        i += 1
      }
    }
    buf
  }

  override def merge(buf: Array[Long], other: Array[Long]): Array[Long] = {
    var i = 0
    while (i < buf.length) { buf(i) += other(i); i += 1 }
    buf
  }

  override def eval(buf: Array[Long]): Any = new GenericArrayData(buf)

  override def serialize(buf: Array[Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(buf.length * 8)
    buf.foreach(bb.putLong)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val bb = ByteBuffer.wrap(bytes)
    Array.fill(bytes.length / 8)(bb.getLong)
  }

  override def withNewMutableAggBufferOffset(offset: Int): CmsAgg =
    copy(mutableAggBufferOffset = offset)
  override def withNewInputAggBufferOffset(offset: Int): CmsAgg =
    copy(inputAggBufferOffset = offset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(hs = newChildren(0), d = newChildren(1), w = newChildren(2))
}

/** Misra-Gries heavy-hitter summary: `graft_topfreq(item, m)` keeps at
  * most m counters and emits them as array<struct<item,cnt>> sorted
  * (cnt DESC, item ASC). Guarantees (mergeable, Agarwal et al. PODS'12):
  * est ≤ true, and true − est ≤ n/(m+1) — so every item with true count
  * > n/(m+1) survives, with m·8-ish bytes of state per group instead of
  * a counter per distinct item. When m exceeds the number of distinct
  * items the summary is EXACT (no decrement ever fires) — that is the
  * declared-query configuration, which is why it carries a SQL oracle;
  * the compression path is property-tested separately.
  *
  * update: hit → +1; miss with room → insert; miss when full → decrement
  * all (amortized O(1) per row via the zero-drop). merge: add counts,
  * then subtract the (m+1)-th largest and drop non-positive. */
case class TopFreqAgg(
    item: Expression, m: Expression,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[mutable.HashMap[String, Long]] {

  override def children: Seq[Expression] = Seq(item, m)

  override def checkInputDataTypes(): TypeCheckResult =
    if (item.dataType != StringType)
      TypeCheckResult.TypeCheckFailure("graft_topfreq expects STRING item")
    else if (!m.foldable || m.dataType != IntegerType)
      TypeCheckResult.TypeCheckFailure("graft_topfreq m must be INT literal")
    else TypeCheckResult.TypeCheckSuccess

  private lazy val M = m.eval().asInstanceOf[Int]

  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("item", StringType, nullable = false),
    StructField("cnt", LongType, nullable = false))), containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "graft_topfreq"

  override def createAggregationBuffer(): mutable.HashMap[String, Long] =
    mutable.HashMap.empty

  override def update(buf: mutable.HashMap[String, Long],
                      input: InternalRow): mutable.HashMap[String, Long] = {
    val v = item.eval(input)
    if (v != null) {
      val s = v.asInstanceOf[UTF8String].toString
      buf.get(s) match {
        case Some(c) => buf(s) = c + 1
        case None if buf.size < M => buf(s) = 1L
        case None =>
          // Misra-Gries decrement-all; zero counters drop out
          val dead = mutable.ArrayBuffer.empty[String]
          buf.mapValuesInPlace((_, c) => c - 1)
          buf.foreach { case (k, c) => if (c <= 0) dead += k }
          dead.foreach(buf.remove)
      }
    }
    buf
  }

  override def merge(buf: mutable.HashMap[String, Long],
                     other: mutable.HashMap[String, Long])
      : mutable.HashMap[String, Long] = {
    other.foreach { case (k, c) => buf(k) = buf.getOrElse(k, 0L) + c }
    if (buf.size > M) {
      // subtract the (m+1)-th largest count, drop non-positive
      val counts = buf.values.toArray.sorted(Ordering[Long].reverse)
      val cut = counts(M)
      val dead = mutable.ArrayBuffer.empty[String]
      buf.mapValuesInPlace((_, c) => c - cut)
      buf.foreach { case (k, c) => if (c <= 0) dead += k }
      dead.foreach(buf.remove)
    }
    buf
  }

  override def eval(buf: mutable.HashMap[String, Long]): Any = {
    val sorted = buf.toArray.sortBy { case (k, c) => (-c, k) }
    new GenericArrayData(sorted.map { case (k, c) =>
      InternalRow(UTF8String.fromString(k), c)
    })
  }

  override def serialize(buf: mutable.HashMap[String, Long]): Array[Byte] = {
    val entries = buf.toArray.map { case (k, c) =>
      (k.getBytes(StandardCharsets.UTF_8), c)
    }
    val bb = ByteBuffer.allocate(
      4 + entries.map(e => 4 + e._1.length + 8).sum)
    bb.putInt(entries.length)
    entries.foreach { case (kb, c) =>
      bb.putInt(kb.length); bb.put(kb); bb.putLong(c)
    }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte])
      : mutable.HashMap[String, Long] = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val buf = mutable.HashMap.empty[String, Long]
    (0 until n).foreach { _ =>
      val kb = new Array[Byte](bb.getInt)
      bb.get(kb)
      buf(new String(kb, StandardCharsets.UTF_8)) = bb.getLong
    }
    buf
  }

  override def withNewMutableAggBufferOffset(offset: Int): TopFreqAgg =
    copy(mutableAggBufferOffset = offset)
  override def withNewInputAggBufferOffset(offset: Int): TopFreqAgg =
    copy(inputAggBufferOffset = offset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(item = newChildren(0), m = newChildren(1))
}

/** KLL quantile sketch aggregate (Apache DataSketches):
  * `graft_kll(x, k, array(ranks...))` → array of quantile estimates at
  * the requested normalized ranks. This is the mergeable-quantile tier
  * that replaces an exact global percentile (full sort / large
  * percentile_approx state) for pipeline bookkeeping at 100 TB: each
  * partition compresses to O(k·log(n/k)) doubles in the map-side partial
  * aggregation, the shuffle carries one sketch per partition, and
  * sketches from separate ingest batches union losslessly w.r.t. the
  * error bound — same standing pattern as the HLL union roll-up.
  * Normalized rank error ≈ 1.65% at k=200 with 99% confidence
  * (Karnin-Lang-Liberty, FOCS'16); the Wave10 property test pins the
  * estimates inside the exact-rank ±3% envelope. */
case class KllAgg(
    child: Expression, k: Expression, ranks: Expression,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[
      org.apache.datasketches.kll.KllDoublesSketch] {

  import org.apache.datasketches.kll.KllDoublesSketch
  import org.apache.datasketches.memory.Memory
  import org.apache.datasketches.quantilescommon.QuantileSearchCriteria

  override def children: Seq[Expression] = Seq(child, k, ranks)

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType != DoubleType)
      TypeCheckResult.TypeCheckFailure("graft_kll expects DOUBLE input")
    else if (!k.foldable || k.dataType != IntegerType)
      TypeCheckResult.TypeCheckFailure("graft_kll k must be INT literal")
    else if (!ranks.foldable ||
             !ranks.dataType.isInstanceOf[ArrayType] ||
             ranks.dataType.asInstanceOf[ArrayType].elementType != DoubleType)
      TypeCheckResult.TypeCheckFailure(
        "graft_kll ranks must be an ARRAY<DOUBLE> literal")
    else TypeCheckResult.TypeCheckSuccess

  private lazy val K = k.eval().asInstanceOf[Int]
  private lazy val RANKS = ranks.eval()
    .asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
    .toDoubleArray()

  override def dataType: DataType = ArrayType(DoubleType, containsNull = true)
  override def nullable: Boolean = false
  override def prettyName: String = "graft_kll"

  override def createAggregationBuffer(): KllDoublesSketch =
    KllDoublesSketch.newHeapInstance(K)

  override def update(buf: KllDoublesSketch,
                      input: InternalRow): KllDoublesSketch = {
    val v = child.eval(input)
    if (v != null) buf.update(v.asInstanceOf[Double])
    buf
  }

  override def merge(buf: KllDoublesSketch,
                     other: KllDoublesSketch): KllDoublesSketch = {
    buf.merge(other)
    buf
  }

  override def eval(buf: KllDoublesSketch): Any =
    if (buf.isEmpty) new GenericArrayData(RANKS.map(_ => null: Any))
    else new GenericArrayData(RANKS.map(r =>
      buf.getQuantile(r, QuantileSearchCriteria.INCLUSIVE): Any))

  override def serialize(buf: KllDoublesSketch): Array[Byte] =
    buf.toByteArray

  override def deserialize(bytes: Array[Byte]): KllDoublesSketch =
    KllDoublesSketch.heapify(Memory.wrap(bytes))

  override def withNewMutableAggBufferOffset(offset: Int): KllAgg =
    copy(mutableAggBufferOffset = offset)
  override def withNewInputAggBufferOffset(offset: Int): KllAgg =
    copy(inputAggBufferOffset = offset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren(0), k = newChildren(1), ranks = newChildren(2))
}

object Sketches {
  def register(spark: SparkSession): Unit =
    GraftExtensions.register(spark, "graft_cms", "graft_topfreq",
                             "graft_kll", "graft_theta", "graft_theta_est",
                             "graft_theta_setop", "graft_bitmap_distinct",
                             "graft_bitmap", "graft_bitmap_union",
                             "graft_bitmap_card")
}
