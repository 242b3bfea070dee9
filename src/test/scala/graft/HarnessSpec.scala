package graft

import org.scalatest.funsuite.AnyFunSuite

/** Failure-isolation policy for the driver-facing mains
  * (VERDICT r15 #8): per-key isolation for ordinary failures, but a
  * fatal JVM error must propagate — after being recorded — so a
  * corrupted JVM cannot keep producing plausible-looking artifacts. */
class HarnessSpec extends AnyFunSuite {

  test("guarded records and swallows a NonFatal failure") {
    val errors = scala.collection.mutable.LinkedHashMap.empty[String, String]
    val r = Harness.guarded("k1", errors) {
      throw new RuntimeException("boom\nsecond line")
    }
    assert(r === None)
    assert(errors("k1") === "boom") // first line only
  }

  test("guarded records a fatal error AND rethrows it") {
    val errors = scala.collection.mutable.LinkedHashMap.empty[String, String]
    val oom = intercept[OutOfMemoryError] {
      Harness.guarded("k2", errors) { throw new OutOfMemoryError("heap") }
    }
    assert(oom.getMessage === "heap")
    assert(errors("k2") === "heap",
      "the fatal failure must still be recorded before propagating")
  }

  test("guarded passes successful results through") {
    val errors = scala.collection.mutable.LinkedHashMap.empty[String, String]
    assert(Harness.guarded("k3", errors)(42) === Some(42))
    assert(errors.isEmpty)
  }
}
