package graft

import graft.streaming.ChangeFeedStream
import graft.streaming.ChangeFeedStream.{SessEvent, SessState}
import org.scalatest.funsuite.AnyFunSuite

/** Pure-fold lateness semantics for the streaming sessionizer. */
class SessionFoldSpec extends AnyFunSuite {

  private val Gap = ChangeFeedStream.SessionGapUs
  private def ev(ts: Long, id: Long = 1L) = SessEvent(7L, ts, id)

  test("gap closes the open session and starts the next") {
    val (closed, next) = ChangeFeedStream.foldSession(7L,
      Some(SessState(0L, 100L, 2L, 1L, 1L)), Seq(ev(100L + Gap + 1, 9L)))
    assert(closed.map(c => (c.session_seq, c.n_events)) === Seq((1L, 2L)))
    assert(next === Some(SessState(100L + Gap + 1, 100L + Gap + 1, 1L, 9L, 2L)))
  }

  test("late event within gap widens the session, never shrinks it") {
    val (closed, next) = ChangeFeedStream.foldSession(7L,
      Some(SessState(1000L, 2000L, 2L, 5L, 3L)), Seq(ev(500L, 2L)))
    assert(closed.isEmpty)
    assert(next === Some(SessState(500L, 2000L, 3L, 2L, 3L)))
  }

  test("event older than start by more than the gap is dropped") {
    val open = SessState(Gap * 3, Gap * 3 + 10, 1L, 5L, 2L)
    val (closed, next) = ChangeFeedStream.foldSession(7L,
      Some(open), Seq(ev(Gap, 2L)))
    assert(closed.isEmpty)
    assert(next === Some(open))
  }

  test("batch sorts events before folding") {
    val (closed, next) = ChangeFeedStream.foldSession(7L, None,
      Seq(ev(3L, 3L), ev(1L, 1L), ev(2L, 2L)))
    assert(closed.isEmpty)
    assert(next === Some(SessState(1L, 3L, 3L, 1L, 1L)))
  }
}
