package graft

import java.util.concurrent.{CountDownLatch, TimeUnit}
import java.util.concurrent.atomic.AtomicBoolean

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Par

/** [[graft.operators.Par.two]] — the §2.6 overlap helper's contract:
  * both results returned; side-thread failures propagate unwrapped;
  * and (the round-16 ADVICE fix) a caller-side failure CANCELS the
  * side task and waits for it to stop before rethrowing, so caller
  * cleanup (staging deletes, lease release) never races a
  * still-running side job. */
class ParSpec extends AnyFunSuite {

  test("two returns both sides' results") {
    assert(Par.two(1 + 1, "b") === ((2, "b")))
  }

  test("a side-thread exception propagates unwrapped") {
    val boom = intercept[IllegalStateException] {
      Par.two({ Thread.sleep(50); 1 },
        throw new IllegalStateException("side"))
    }
    assert(boom.getMessage === "side")
  }

  test("caller-side failure interrupts the side task and joins it " +
      "before rethrowing") {
    val started = new CountDownLatch(1)
    val sawInterrupt = new AtomicBoolean(false)
    val sideDone = new CountDownLatch(1)
    val boom = intercept[IllegalArgumentException] {
      Par.two(
        {
          // fail only once the side task is definitely running
          assert(started.await(5, TimeUnit.SECONDS))
          throw new IllegalArgumentException("caller")
        },
        try {
          started.countDown()
          Thread.sleep(30000) // far longer than the helper's join bound
          "never"
        } catch {
          case _: InterruptedException =>
            sawInterrupt.set(true)
            sideDone.countDown()
            throw new RuntimeException("side interrupted")
        })
    }
    assert(boom.getMessage === "caller")
    // two() must not return before the cancelled side stopped: the
    // interrupt flag is already visible HERE, without any extra wait
    assert(sideDone.await(1, TimeUnit.SECONDS))
    assert(sawInterrupt.get())
  }
}
