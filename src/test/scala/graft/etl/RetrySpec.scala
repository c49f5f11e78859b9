package graft.etl

import org.scalatest.funsuite.AnyFunSuite

class RetrySpec extends AnyFunSuite {

  test("a stage that fails once inside the budget succeeds on retry") {
    var calls = 0
    val out = Retry.withRetry(1) {
      calls += 1
      if (calls == 1) throw new RuntimeException("transient")
      42
    }
    assert(out === 42 && calls === 2)
  }

  test("an exhausted budget rethrows with earlier attempts suppressed") {
    var calls = 0
    val e = intercept[RuntimeException](Retry.withRetry(2) {
      calls += 1
      throw new RuntimeException(s"attempt $calls")
    })
    assert(calls === 3)
    assert(e.getMessage === "attempt 3")
    assert(e.getSuppressed.map(_.getMessage).toSet === Set("attempt 1", "attempt 2"))
  }

  test("zero-retry budget runs the stage exactly once") {
    var calls = 0
    intercept[RuntimeException](Retry.withRetry(0) {
      calls += 1; throw new RuntimeException("boom")
    })
    assert(calls === 1)
  }
}
