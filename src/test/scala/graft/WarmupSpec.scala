package graft

/** The bench mains swallow Warmup failures (a broken warmup must never
  * cost the bench run), so THIS is where warmup breakage surfaces: run
  * it unguarded. A silent warmup failure would put ~30 s of per-JVM
  * JIT/Janino cost back inside the driver's measured queries.
  */
class WarmupSpec extends SparkSpec {
  test("Warmup.run completes against a live session") {
    Warmup.run(spark)
  }
}
