package graft.functions

import org.scalatest.funsuite.AnyFunSuite

/** Gear-hash CDC: exact coverage, length bounds, determinism, and
  * the property the operator exists for — SHIFT INVARIANCE: after a
  * prefix edit, chunk digests resynchronize, so most of an edited
  * document's chunks keep their identity (fixed frames lose all of
  * them).
  */
class CdcChunksSpec extends AnyFunSuite {

  private def chunksOf(payload: Array[Byte], minLen: Int = 32,
                       avgBits: Int = 6, maxLen: Int = 256)
      : Seq[(Int, Int, String)] = {
    val arr = CdcChunksExpr.compute(payload, minLen, avgBits, maxLen)
    (0 until arr.numElements()).map { i =>
      val row = arr.getStruct(i, 3)
      (row.getInt(0), row.getInt(1), row.getUTF8String(2).toString)
    }
  }

  private def bytes(n: Int, seed: Int): Array[Byte] = {
    val rnd = new scala.util.Random(seed)
    Array.fill(n)(rnd.nextInt(256).toByte)
  }

  test("chunks cover the payload exactly and respect length bounds") {
    val p = bytes(10000, 3)
    val ch = chunksOf(p)
    assert(ch.map(_._2).sum === 10000)
    ch.zipWithIndex.foreach { case ((off, len, _), i) =>
      assert(off === ch.take(i).map(_._2).sum) // contiguous
      assert(len >= 1 && len <= 256)
      // every chunk except possibly the last respects minLen
      if (i < ch.size - 1) assert(len >= 32)
    }
  }

  test("deterministic: same bytes, same chunks") {
    val p = bytes(5000, 7)
    assert(chunksOf(p) === chunksOf(p.clone()))
  }

  test("empty payload chunks to nothing; tiny payload to one chunk") {
    assert(chunksOf(Array.emptyByteArray) === Seq.empty)
    val tiny = bytes(5, 11)
    val ch = chunksOf(tiny)
    assert(ch.size === 1 && ch.head._2 === 5)
  }

  test("shift invariance: a prefix edit preserves most chunk " +
      "digests; a fixed grid preserves none") {
    val p = bytes(20000, 13)
    val edited = bytes(7, 17) ++ p // 7 inserted bytes at the front
    val a = chunksOf(p).map(_._3)
    val b = chunksOf(edited).map(_._3)
    val shared = a.toSet.intersect(b.toSet).size
    // CDC resynchronizes: the vast majority of chunks survive
    assert(shared >= (a.size * 3) / 4, s"shared=$shared of ${a.size}")
    // the fixed-frame strawman: 64-byte grid digests all shift
    val grid = (0 until p.length by 64)
      .map(i => p.slice(i, i + 64).toSeq).toSet
    val gridEdited = (0 until edited.length by 64)
      .map(i => edited.slice(i, i + 64).toSeq).toSet
    assert(grid.intersect(gridEdited).size <= 1)
  }
}
