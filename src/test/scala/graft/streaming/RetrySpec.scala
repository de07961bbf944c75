package graft.streaming

import org.scalatest.funsuite.AnyFunSuite

/** ST6: exponential backoff with jitter for throttled externals —
  * reference semantics (assetIndexer.py:147-178) with injected clock
  * and jitter for determinism. */
class RetrySpec extends AnyFunSuite {

  private class Flaky(failures: Int, t: => Throwable) {
    var calls = 0
    def apply(): String = {
      calls += 1
      if (calls <= failures) throw t else s"ok@$calls"
    }
  }

  test("retries throttled calls with exponential backoff + jitter, then succeeds") {
    val sleeps = scala.collection.mutable.ArrayBuffer.empty[Long]
    val flaky = new Flaky(3, new Retry.ThrottledException("429"))
    val out = Retry.withBackoff(maxAttempts = 5, baseDelayMs = 100,
        sleep = (ms: Long) => sleeps += ms, jitter = () => 0.5)(flaky())
    assert(out == "ok@4")
    // 100*2^k + 0.5*100 for k = 0,1,2 — the reference's wait shape
    assert(sleeps.toSeq == Seq(150L, 250L, 450L))
  }

  test("the last attempt's throttle propagates after maxAttempts") {
    val sleeps = scala.collection.mutable.ArrayBuffer.empty[Long]
    val flaky = new Flaky(Int.MaxValue, new Retry.ThrottledException("429"))
    intercept[Retry.ThrottledException] {
      Retry.withBackoff(maxAttempts = 3, baseDelayMs = 10,
        sleep = (ms: Long) => sleeps += ms, jitter = () => 0.0)(flaky())
    }
    assert(flaky.calls == 3)
    assert(sleeps.toSeq == Seq(10L, 20L))
  }

  test("non-retryable failures are NOT retried (the reference re-raises non-429)") {
    val flaky = new Flaky(1, new IllegalArgumentException("bad request"))
    intercept[IllegalArgumentException] {
      Retry.withBackoff(maxAttempts = 5, sleep = _ => ())(flaky())
    }
    assert(flaky.calls == 1)
  }

  test("delays cap at maxDelayMs") {
    val sleeps = scala.collection.mutable.ArrayBuffer.empty[Long]
    val flaky = new Flaky(6, new Retry.ThrottledException("429"))
    Retry.withBackoff(maxAttempts = 7, baseDelayMs = 100, maxDelayMs = 500,
      sleep = (ms: Long) => sleeps += ms, jitter = () => 0.0)(flaky())
    assert(sleeps.toSeq == Seq(100L, 200L, 400L, 500L, 500L, 500L))
  }

  test("a throttled foreachBatch sink drains the batch after backoff (ST6 composition)") {
    // the wiring the utility exists for: the handler's sink throttles
    // twice, the wrapped handler converges without failing the stream
    val sunk = scala.collection.mutable.ArrayBuffer.empty[String]
    var throttles = 2
    def sink(row: String): Unit = {
      if (throttles > 0) { throttles -= 1; throw new Retry.ThrottledException("429") }
      sunk += row
    }
    Retry.withBackoff(maxAttempts = 5, baseDelayMs = 1, sleep = _ => ())(
      sink("batch-7"))
    assert(sunk.toSeq == Seq("batch-7"))
  }
}
