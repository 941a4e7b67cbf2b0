package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.functions.DvBitmapCodec

/** Codec-level contract of the roaring-style deletion bitset
  * (DvBitmap.scala): round-trips, probes, cardinality, container-kind
  * selection, and the 64 Ki-row container boundary — pure byte-level
  * tests, no Spark. The storage-tier integration (encoding switch,
  * mixed-encoding snapshots, protocol stamp) lives in TxLogSpec. */
class DvBitmapSpec extends AnyFunSuite {

  private def bits(ranges: (Long, Long)*): Array[Byte] =
    DvBitmapCodec.fromRanges(ranges)

  test("round-trip: ranges -> bytes -> ranges, probes and cardinality exact") {
    val ranges = Seq((0L, 0L), (5L, 9L), (100L, 100L), (70000L, 70005L))
    val bm = bits(ranges: _*)
    assert(DvBitmapCodec.toRanges(bm) === ranges)
    assert(DvBitmapCodec.cardinality(bm) === 1 + 5 + 1 + 6)
    val set = ranges.flatMap { case (s, e) => s to e }.toSet
    (0L to 70010L).foreach { ri =>
      assert(DvBitmapCodec.contains(bm, ri) === set.contains(ri), s"ri=$ri")
    }
    assert(!DvBitmapCodec.contains(bm, -1L))
    assert(!DvBitmapCodec.contains(bm, Long.MaxValue))
  }

  test("container boundary: 65535 and 65536 land in different containers") {
    val bm = bits((65534L, 65537L))
    assert(DvBitmapCodec.cardinality(bm) === 4)
    Seq(65534L, 65535L, 65536L, 65537L).foreach(ri =>
      assert(DvBitmapCodec.contains(bm, ri), s"ri=$ri"))
    assert(!DvBitmapCodec.contains(bm, 65533L))
    assert(!DvBitmapCodec.contains(bm, 65538L))
    // the run decodes back as ONE range even across the container split
    assert(DvBitmapCodec.toRanges(bm) === Seq((65534L, 65537L)))
  }

  test("kind selection: sparse stays ~2 bytes/row, dense is a fixed 8 KiB block") {
    // 1000 scattered rows in one container -> sorted-array kind
    val sparse = DvBitmapCodec.fromRanges((0 until 1000).map(i =>
      (i * 60L, i * 60L)))
    assert(sparse.length === 4 + 13 + 2 * 1000, s"sparse ${sparse.length}")
    // every other row of a full container (32768 > 4096) -> bitmap kind
    val dense = DvBitmapCodec.fromRanges((0 until 32768).map(i =>
      (i * 2L, i * 2L)))
    assert(dense.length === 4 + 13 + 8192, s"dense ${dense.length}")
    assert(DvBitmapCodec.cardinality(dense) === 32768)
    assert(DvBitmapCodec.contains(dense, 2L) && !DvBitmapCodec.contains(dense, 3L))
    // the degenerate range-list equivalent of `dense` is 32768 rows x 3
    // longs — the bitset bounds it two orders of magnitude lower
    assert(dense.length < 32768 * 24 / 90)
  }

  test("large row indices: container keys carry the high bits") {
    val base = 1L << 33
    val bm = bits((base, base + 2L), (base + 100000L, base + 100000L))
    assert(DvBitmapCodec.cardinality(bm) === 4)
    assert(DvBitmapCodec.contains(bm, base + 1L))
    assert(!DvBitmapCodec.contains(bm, base + 3L))
    assert(DvBitmapCodec.contains(bm, base + 100000L))
    assert(!DvBitmapCodec.contains(bm, 1L)) // same low bits, wrong container
    assert(DvBitmapCodec.toRanges(bm) ===
      Seq((base, base + 2L), (base + 100000L, base + 100000L)))
  }
}
