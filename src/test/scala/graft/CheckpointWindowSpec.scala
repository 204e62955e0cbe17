package graft

import graft.core.{CheckpointWindow, Point}
import org.scalatest.funsuite.AnyFunSuite
import scala.util.Random

/** Pins the checkpoint-window math (reference
  * `ReducerStateCheckpointWindow.cs:13-45`): newest-first, distinct by
  * slot, capped at 10; roll-forward drops points at/past the new slot;
  * rollback keeps strictly-before points.
  */
class CheckpointWindowSpec extends AnyFunSuite {
  private def p(s: Long) = Point(s"h$s", s)

  test("addRollForward prepends, drops >= slot, caps at 10") {
    val w0 = (1L to 12L).foldLeft(Seq.empty[Point])((w, s) =>
      CheckpointWindow.addRollForward(w, p(s)))
    assert(w0.size == 10)
    assert(w0.map(_.slot) == (12L to 3L by -1))
    // re-adding an older slot drops everything at or past it
    val w1 = CheckpointWindow.addRollForward(w0, p(7))
    assert(w1.head.slot == 7 && w1.map(_.slot) == Seq(7L, 6L, 5L, 4L, 3L))
  }

  test("applyRollback keeps strictly-before points") {
    val w = (1L to 10L).foldLeft(Seq.empty[Point])((acc, s) =>
      CheckpointWindow.addRollForward(acc, p(s)))
    assert(CheckpointWindow.applyRollback(w, 6).map(_.slot) == Seq(5L, 4L, 3L, 2L, 1L))
    assert(CheckpointWindow.applyRollback(w, 1).isEmpty)
  }

  test("random-walk properties: sorted desc, distinct slots, bounded") {
    val rnd = new Random(7)
    for (_ <- 1 to 200) {
      val ss = Seq.fill(rnd.nextInt(40))(rnd.nextLong(1000))
      val w = ss.foldLeft(Seq.empty[Point])((acc, s) =>
        CheckpointWindow.addRollForward(acc, p(s)))
      assert(w.size <= CheckpointWindow.DefaultMaxCount)
      assert(w.map(_.slot) == w.map(_.slot).distinct.sorted.reverse)
      if (ss.nonEmpty) assert(w.head.slot == ss.last)
      val once = CheckpointWindow.normalize(ss.map(p))
      assert(CheckpointWindow.normalize(once) == once)
    }
  }
}
