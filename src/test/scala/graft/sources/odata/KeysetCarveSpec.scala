package graft.sources.odata

import org.scalatest.funsuite.AnyFunSuite

/** Overflow safety of the numeric tail-window carve (ADVICE r7): wide
  * integral key domains — snowflake IDs, or ranges spanning the Long sign
  * boundary — must still carve into monotone, disjoint, covering windows.
  * The pre-fix Long math wrapped `(h-l)*i` and produced overlapping windows
  * (duplicate rows read). */
class KeysetCarveSpec extends AnyFunSuite {

  private def checkCover(l: Long, h: Long, n: Int): Unit = {
    val w = KeysetWindows.carveRange(l, h, n)
    assert(w.nonEmpty)
    assert(w.head._1 == l, s"first window must start at lo: $w")
    assert(w.last._2 == h, s"last window must end at hi: $w")
    w.foreach { case (a, b) => assert(a < b, s"degenerate window ($a,$b)") }
    w.sliding(2).foreach {
      case Seq((_, b1), (a2, _)) =>
        assert(b1 == a2, s"gap/overlap between windows: $w")
      case _ =>
    }
    assert(w.size <= math.max(1, n))
  }

  test("small ranges carve evenly") {
    checkCover(0L, 100L, 4)
    assert(KeysetWindows.carveRange(0L, 100L, 4) ==
      Seq((0L, 25L), (25L, 50L), (50L, 75L), (75L, 100L)))
  }

  test("width smaller than n yields width windows") {
    checkCover(10L, 13L, 8)
    assert(KeysetWindows.carveRange(10L, 13L, 8).size == 3)
  }

  test("snowflake-wide positive range does not overflow") {
    checkCover(1L, Long.MaxValue - 1, 7)
  }

  test("range spanning the sign boundary (width > Long.MaxValue)") {
    checkCover(Long.MinValue + 5, Long.MaxValue - 5, 9)
    checkCover(Long.MinValue + 1, Long.MaxValue, 3)
  }

  test("n=1 and degenerate-adjacent bounds") {
    assert(KeysetWindows.carveRange(5L, 6L, 4) == Seq((5L, 6L)))
    assert(KeysetWindows.carveRange(-3L, -2L, 1) == Seq((-3L, -2L)))
  }
}
