package graft.operators

import org.scalatest.funsuite.AnyFunSuite

/** Pins the Par overlap helper's contract: order-preserving, equal to
  * sequential map, first failure rethrown with its original type, and
  * genuinely concurrent under the default pool (the property the
  * sweep-query overlap relies on). */
class ParSpec extends AnyFunSuite {

  test("results equal sequential map, in input order") {
    val xs = 1 to 17
    assert(Par.map(xs)(_ * 3) == xs.map(_ * 3))
    assert(Par.map(Seq.empty[Int])(_ * 3) == Seq.empty[Int])
    assert(Par.map(Seq(42))(_ + 1) == Seq(43))
  }

  test("join2 returns both branch results") {
    assert(Par.join2("a" * 2, 7) == ("aa", 7))
  }

  test("first failure rethrown with original type after all settle") {
    val started = new java.util.concurrent.atomic.AtomicInteger(0)
    val e = intercept[IllegalStateException] {
      Par.map(Seq(1, 2, 3, 4), maxConcurrency = 2) { i =>
        started.incrementAndGet()
        if (i == 2) throw new IllegalStateException(s"boom $i")
        i
      }
    }
    assert(e.getMessage == "boom 2")
    // every branch ran to completion before the rethrow (no abandoned
    // in-flight work)
    assert(started.get() == 4)
  }

  test("branches overlap: two blocking branches release each other") {
    // a latch only a CONCURRENT second branch can open — sequential
    // execution would deadlock, so a short await proves overlap
    val gate = new java.util.concurrent.CountDownLatch(2)
    val out = Par.map(Seq(0, 1), maxConcurrency = 2) { i =>
      gate.countDown()
      assert(gate.await(10, java.util.concurrent.TimeUnit.SECONDS),
        "branches did not run concurrently")
      i * 10
    }
    assert(out == Seq(0, 10))
  }
}
