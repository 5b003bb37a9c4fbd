package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.sources.LogLake.{AddFile, ColStats}
import graft.sources.PackedAddFiles

/** The block-compressed active-file set ([[PackedAddFiles]]) must be
  * OBSERVATIONALLY IDENTICAL to the plain Vector it replaces — same
  * elements, same order, same Seq equality — while holding compressed
  * blocks instead of object graphs. Pure JVM, no Spark session. */
class PackedAddFilesSpec extends AnyFunSuite {

  private def mk(i: Int): AddFile = AddFile(
    path = f"data/f-$i%012d.parquet",
    rows = 1000L + i,
    stats = if (i % 7 == 0) Map.empty
      else Map(
        "k" -> ColStats("long", (i * 10).toString, (i * 10 + 9).toString, i % 3),
        "s" -> ColStats(if (i % 5 == 0) "strunc" else "string",
          s"min-$i", s"max-$i😀", 0L)),
    bytes = if (i % 11 == 0) -1L else 4096L * i,
    dv = if (i % 13 == 0) s"dv/d-$i.dv" else "",
    dvRows = if (i % 13 == 0) i.toLong else 0L,
    partitionValues = if (i % 4 == 0) Map("p" -> s"v${i % 10}") else Map.empty,
    baseRowId = i % 6 match {
      case 0 => -1L
      case 1 => -2L
      case 2 => -3L
      case _ => i.toLong * 1000
    })

  private def pack(n: Int): (Vector[AddFile], Seq[AddFile]) = {
    val plain = (0 until n).map(mk).toVector
    val b = new PackedAddFiles.Builder
    plain.foreach(b += _)
    (plain, b.result())
  }

  test("round-trip: every field of every entry survives, across block boundaries") {
    val n = PackedAddFiles.BlockEntries + 1234 // force 2 blocks
    val (plain, packed) = pack(n)
    assert(packed.length == n)
    assert(packed.isInstanceOf[PackedAddFiles])
    // Seq equality with the plain form (the property every caller relies on)
    assert(packed == plain)
    // random access across the block boundary
    assert(packed(0) == plain(0))
    assert(packed(PackedAddFiles.BlockEntries - 1) ==
      plain(PackedAddFiles.BlockEntries - 1))
    assert(packed(PackedAddFiles.BlockEntries) == plain(PackedAddFiles.BlockEntries))
    assert(packed(n - 1) == plain(n - 1))
  }

  test("rangeIterator slices match, including non-block-aligned bounds") {
    val n = PackedAddFiles.BlockEntries * 2 + 77
    val (plain, packed0) = pack(n)
    val packed = packed0.asInstanceOf[PackedAddFiles]
    for ((from, until) <- Seq((0, n), (100, 200),
        (PackedAddFiles.BlockEntries - 5, PackedAddFiles.BlockEntries + 5),
        (n - 10, n), (n, n), (0, 1))) {
      assert(packed.rangeIterator(from, until).toSeq ==
        plain.slice(from, until), s"slice [$from,$until)")
    }
  }

  test("rewriteBlocks: drops, in-place updates, appends; untouched blocks reuse compressed bytes") {
    val n = PackedAddFiles.BlockEntries * 3
    val (plain, packed0) = pack(n)
    val packed = packed0.asInstanceOf[PackedAddFiles]
    // touch only entries in the SECOND block
    val dropPath = plain(PackedAddFiles.BlockEntries + 10).path
    val updPath = plain(PackedAddFiles.BlockEntries + 20).path
    val updated = plain(PackedAddFiles.BlockEntries + 20).copy(rows = 42L)
    val extra = Seq(mk(n + 1).copy(path = "data/extra-1.parquet"),
      mk(n + 2).copy(path = "data/extra-2.parquet"))
    val out = packed.rewriteBlocks(
      a => if (a.path == dropPath) None
        else if (a.path == updPath) Some(updated) else Some(a),
      extra.iterator)
    val expect = plain.filterNot(_.path == dropPath)
      .map(a => if (a.path == updPath) updated else a) ++ extra
    assert(out == expect)
    // blocks 1 and 3 must be carried over as the SAME compressed arrays
    assert(out.blocks(0) eq packed.blocks(0))
    assert(out.blocks.exists(_ eq packed.blocks(2)))
    // the touched block must NOT be reused
    assert(!out.blocks.exists(_ eq packed.blocks(1)))
  }

  test("concat glues packed pieces at the block level") {
    // totals above the threshold glue; the sizes force that path
    val (plainA, packedA) = pack(PackedAddFiles.PackThreshold + 3)
    val plainB = (0 until 500).map(i => mk(i + 900000)).toVector
    val bb = new PackedAddFiles.Builder
    plainB.foreach(bb += _)
    val packedB = bb.result()
    val glued = PackedAddFiles.concat(Seq(packedA, packedB))
    assert(glued == plainA ++ plainB)
    val g = glued.asInstanceOf[PackedAddFiles]
    // every source block adopted verbatim
    assert(packedA.asInstanceOf[PackedAddFiles].blocks
      .forall(b => g.blocks.exists(_ eq b)))
    // below-threshold concat stays plain
    assert(PackedAddFiles.concat(Seq(plainB, plainB.take(2)))
      .isInstanceOf[Vector[_]])
  }

  test("GrowingBuilder stays a plain Vector below the threshold, packs above") {
    val small = new PackedAddFiles.GrowingBuilder
    (0 until 100).foreach(i => small += mk(i))
    assert(small.result().isInstanceOf[Vector[_]])
    val big = new PackedAddFiles.GrowingBuilder
    val n = PackedAddFiles.PackThreshold + 10
    (0 until n).foreach(i => big += mk(i % 1000)) // cheap entries
    val r = big.result()
    assert(r.isInstanceOf[PackedAddFiles] && r.length == n)
    assert(r(n - 1) == mk((n - 1) % 1000))
  }
}
