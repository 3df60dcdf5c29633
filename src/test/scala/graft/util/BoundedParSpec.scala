package graft.util

import org.scalatest.funsuite.AnyFunSuite

class BoundedParSpec extends AnyFunSuite {

  test("preserves input order across 200 items") {
    val out = BoundedPar.map((0 until 200).toVector)(i => i * 2)
    assert(out == (0 until 200).map(_ * 2).toVector)
  }

  test("propagates the original exception, not ExecutionException") {
    val boom = intercept[IllegalStateException] {
      BoundedPar.map(Seq(1, 2, 3)) { i =>
        if (i == 2) throw new IllegalStateException("footer corrupt") else i
      }
    }
    assert(boom.getMessage == "footer corrupt")
  }

  test("runs items concurrently (wall-time well under the serial sum)") {
    // 32 × 50 ms = 1.6 s serial; 16 threads ⇒ 2 waves ≈ 100 ms.
    // The 800 ms bound leaves 8× headroom for a loaded CI box while
    // still proving the loop did not serialize.
    val t0 = System.nanoTime()
    val out = BoundedPar.map((0 until 32).toVector) { i => Thread.sleep(50); i }
    val elapsedMs = (System.nanoTime() - t0) / 1e6
    assert(out == (0 until 32).toVector)
    assert(elapsedMs < 800, f"expected concurrent execution, took $elapsedMs%.0f ms")
  }

  test("single-item fast path runs on the calling thread") {
    val caller = Thread.currentThread()
    var ran: Thread = null
    BoundedPar.map(Seq(42)) { i => ran = Thread.currentThread(); i }
    assert(ran eq caller)
  }
}
