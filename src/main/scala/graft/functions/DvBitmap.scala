package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, BinaryType, BooleanType, DataType, LongType, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** Roaring-style compressed bitset for deletion vectors (container
  * design after Chambi, Lemire, Kaser, Godin — "Better bitmap
  * performance with Roaring bitmaps", Software: Practice & Experience
  * 2016; own encoding, no library dependency).
  *
  * Why: the range-list DV encoding is O(consecutive deleted runs) —
  * perfect for contiguous predicate deletes, degenerate for SCATTERED
  * deletes, where a million dispersed dead rows become a million
  * width-1 range rows (~24 MB shuffled and broadcast per read). This
  * bitset bounds the same million rows at ≤ 2 bytes/row sparse and a
  * hard 8 KiB per 65 536-row block dense, whichever is smaller per
  * block — O(set bits) with a constant ~100× below the degenerate
  * range list.
  *
  * Layout (big-endian, all offsets byte-based):
  * {{{
  *   int32   container count
  *   per container, sorted by key:
  *     int64  key        = rowIndex >>> 16
  *     int8   kind       (0 = sorted uint16 array, 1 = 8 KiB bitmap)
  *     int32  cardinality
  *     bytes  payload    (2×card for kind 0; 8192 for kind 1)
  * }}}
  * Kind selection at 4096 entries — the break-even point where
  * 2 bytes/entry crosses the fixed 8 KiB bitmap.
  *
  * Probing goes through [[DvBitmapCodec.Parsed]] — the container
  * directory (keys + payload offsets) parses ONCE per bitmap, then each
  * probe is a binary search over the key array plus one payload test
  * (bit test dense, uint16 binary search sparse): O(log containers) per
  * row, zero per-row allocation. The probe expression builds its Parsed
  * map lazily at executor init.
  */
object DvBitmapCodec {

  private val DenseThreshold = 4096
  private val BitmapBytes = 8192

  /** Serialize from RLE ranges (the form dvDelete already computes):
    * iterate [start, end] runs in sorted order, splitting at container
    * boundaries. Input ranges must be sorted and non-overlapping (the
    * groupBy-consecutive construction guarantees both). */
  def fromRanges(ranges: Seq[(Long, Long)]): Array[Byte] = {
    // per-container collected low-16 values, containers in sorted order
    val containers = scala.collection.mutable.LinkedHashMap
      .empty[Long, java.util.BitSet]
    ranges.foreach { case (s, e) =>
      var lo = s
      while (lo <= e) {
        val key = lo >>> 16
        val hiOfKey = ((key + 1) << 16) - 1
        val upto = math.min(e, hiOfKey)
        val bs = containers.getOrElseUpdate(key, new java.util.BitSet(1 << 16))
        bs.set((lo & 0xFFFF).toInt, (upto & 0xFFFF).toInt + 1)
        lo = upto + 1
      }
    }
    val sorted = containers.toSeq.sortBy(_._1)
    val payloadBytes = sorted.map { case (_, bs) =>
      val card = bs.cardinality()
      13 + (if (card > DenseThreshold) BitmapBytes else 2 * card)
    }.sum
    val buf = java.nio.ByteBuffer.allocate(4 + payloadBytes)
    buf.putInt(sorted.size)
    sorted.foreach { case (key, bs) =>
      val card = bs.cardinality()
      buf.putLong(key)
      if (card > DenseThreshold) {
        buf.put(1.toByte); buf.putInt(card)
        buf.put(java.util.Arrays.copyOf(bs.toByteArray, BitmapBytes))
      } else {
        buf.put(0.toByte); buf.putInt(card)
        var i = bs.nextSetBit(0)
        while (i >= 0) { buf.putShort(i.toShort); i = bs.nextSetBit(i + 1) }
      }
    }
    buf.array()
  }

  /** Parsed directory of a serialized bitset: container keys and byte
    * offsets as parallel arrays, built ONCE per bitmap (the probe
    * expression parses at executor init), so each row's probe is a
    * binary search over keys + one payload test instead of a linear
    * length-prefix walk per row. */
  final class Parsed(val bytes: Array[Byte]) {
    private val bb = java.nio.ByteBuffer.wrap(bytes)
    private val n = bb.getInt(0)
    val keys = new Array[Long](n)
    private val offs = new Array[Int](n) // payload offset
    private val kinds = new Array[Byte](n)
    private val cards = new Array[Int](n)
    locally {
      var off = 4
      var i = 0
      while (i < n) {
        keys(i) = bb.getLong(off)
        kinds(i) = bb.get(off + 8)
        cards(i) = bb.getInt(off + 9)
        offs(i) = off + 13
        off = offs(i) + (if (kinds(i) == 1) BitmapBytes else 2 * cards(i))
        i += 1
      }
    }
    def contains(ri: Long): Boolean = {
      if (ri < 0) return false
      val key = ri >>> 16
      val low = (ri & 0xFFFF).toInt
      val c = java.util.Arrays.binarySearch(keys, key)
      if (c < 0) return false
      if (kinds(c) == 1) {
        val b = bytes(offs(c) + (low >>> 3))
        ((b >> (low & 7)) & 1) == 1
      } else {
        var lo = 0; var hi = cards(c) - 1
        while (lo <= hi) {
          val mid = (lo + hi) >>> 1
          val v = bb.getShort(offs(c) + 2 * mid) & 0xFFFF
          if (v == low) return true
          else if (v < low) lo = mid + 1
          else hi = mid - 1
        }
        false
      }
    }
  }

  /** One-shot probe against the serialized form (spec/driver use; the
    * per-row hot path goes through a cached [[Parsed]]). */
  def contains(bytes: Array[Byte], ri: Long): Boolean =
    new Parsed(bytes).contains(ri)

  /** Decode back to sorted RLE ranges — the inverse of [[fromRanges]];
    * used for driver-side unions of the rare multi-bitmap-per-file case
    * and for spec round-trips. O(set bits). */
  def toRanges(bytes: Array[Byte]): Seq[(Long, Long)] = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    val n = bb.getInt(0)
    val out = scala.collection.mutable.ArrayBuffer.empty[(Long, Long)]
    var runStart = -1L
    var runEnd = -2L
    def emit(ri: Long): Unit =
      if (ri == runEnd + 1) runEnd = ri
      else {
        if (runStart >= 0) out += ((runStart, runEnd))
        runStart = ri; runEnd = ri
      }
    var off = 4
    var i = 0
    while (i < n) {
      val key = bb.getLong(off)
      val kind = bb.get(off + 8)
      val card = bb.getInt(off + 9)
      if (kind == 1) {
        var low = 0
        while (low < 65536) {
          val b = bytes(off + 13 + (low >>> 3))
          if (((b >> (low & 7)) & 1) == 1) emit((key << 16) | low)
          low += 1
        }
        off += 13 + BitmapBytes
      } else {
        var j = 0
        while (j < card) {
          emit((key << 16) | (bb.getShort(off + 13 + 2 * j) & 0xFFFF))
          j += 1
        }
        off += 13 + 2 * card
      }
      i += 1
    }
    if (runStart >= 0) out += ((runStart, runEnd))
    out.toSeq
  }

  /** Total set bits — the dead-row count optimizeDvs budgets from. */
  def cardinality(bytes: Array[Byte]): Long = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    val n = bb.getInt(0)
    var off = 4
    var i = 0
    var total = 0L
    while (i < n) {
      val kind = bb.get(off + 8)
      val card = bb.getInt(off + 9)
      total += card
      off += 13 + (if (kind == 1) BitmapBytes else 2 * card)
      i += 1
    }
    total
  }
}

/** `dv_bitmap_from_ranges(sort_array(collect_list(struct(start, end))))`
  * → serialized bitset bytes. One evaluation per (file) group row in the
  * DV write path — eval-only (CodegenFallback) is fine off the per-row
  * hot path. */
case class DvBitmapFromRanges(child: Expression)
    extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = BinaryType
  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(s: StructType, _) if s.length == 2 &&
          s.fields.forall(_.dataType == LongType) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"dv_bitmap_from_ranges expects array<struct<start:bigint,end:bigint>>, got ${other.simpleString}")
    }
  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val ranges = (0 until arr.numElements()).map { i =>
      val row = arr.getStruct(i, 2)
      (row.getLong(0), row.getLong(1))
    }
    DvBitmapCodec.fromRanges(ranges)
  }
  override protected def withNewChildInternal(c: Expression): DvBitmapFromRanges =
    copy(child = c)
}

/** Constant-map DV probe: `bitmapsByFile` is resolved ONCE at plan time
  * (from a foldable map literal — the NearestCellsL2 pattern) and rides
  * the expression to executors; each row pays one parse-free
  * [[DvBitmapCodec.contains]] against its file's bytes. This keeps the
  * scattered-delete read path JOIN-FREE — the per-file bitmap plays the
  * role Delta's DV descriptor plays in its scan's partition metadata.
  * Size ceiling is the plan-shipping cost of the map (same ceiling the
  * literal centroid matrix documents); a DV set outgrowing it is the
  * standing signal to run optimizeDvs, which rewrites heavily-deleted
  * files and retires their DVs. */
case class DvMapProbe(file: Expression, ri: Expression,
    bitmapsByFile: Map[String, Array[Byte]])
    extends Expression {
  override def children: Seq[Expression] = Seq(file, ri)
  override def dataType: DataType = BooleanType
  override def nullable: Boolean = false
  // keyed by UTF8String (no per-row String conversion) and PRE-PARSED
  // (no per-row directory walk): built once per executor at first probe
  @transient private lazy val keyed: Map[UTF8String, DvBitmapCodec.Parsed] =
    bitmapsByFile.map { case (k, v) =>
      UTF8String.fromString(k) -> new DvBitmapCodec.Parsed(v) }
  /** Per-row probe shared by eval and the generated code. */
  def probe(f: UTF8String, r: Long): Boolean = keyed.get(f) match {
    case Some(p) => p.contains(r)
    case None => false
  }
  override def eval(input: InternalRow): Any = {
    val f = file.eval(input)
    val r = ri.eval(input)
    if (f == null || r == null) false
    else probe(f.asInstanceOf[UTF8String], r.asInstanceOf[Long])
  }
  /** Real codegen (not CodegenFallback): this sits on the scan side of
    * every bitmap-DV'd read, and an interpreted expression there would
    * break the whole-stage-codegen span around the filter. The
    * expression instance ships as a codegen reference object; generated
    * code calls [[probe]] directly. */
  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
      : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode = {
    import org.apache.spark.sql.catalyst.expressions.codegen.Block._
    import org.apache.spark.sql.catalyst.expressions.codegen.FalseLiteral
    val refName = ctx.addReferenceObj("dvMapProbe", this)
    val fGen = file.genCode(ctx)
    val rGen = ri.genCode(ctx)
    ev.copy(code = code"""
      ${fGen.code}
      ${rGen.code}
      boolean ${ev.value} = false;
      if (!${fGen.isNull} && !${rGen.isNull}) {
        ${ev.value} = $refName.probe(${fGen.value}, ${rGen.value});
      }""", isNull = FalseLiteral)
  }
  override protected def withNewChildrenInternal(
      cs: IndexedSeq[Expression]): DvMapProbe =
    copy(file = cs(0), ri = cs(1))
}
