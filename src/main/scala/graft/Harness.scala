package graft

import scala.util.control.NonFatal

/** Shared failure handling for the two driver-facing mains.
  *
  * Per-key isolation is the contract (one broken key must not erase
  * the other 150 from the round's artifacts — the round-13 lesson),
  * but it must stop at FATAL JVM errors: an OutOfMemoryError or
  * LinkageError caught and logged as "one key failed" leaves a
  * corrupted JVM producing plausible-looking numbers for every key
  * after it (VERDICT r15 #8). So: NonFatal → record + continue;
  * fatal → record + RETHROW, and the mains flush their partial
  * artifacts in a finally so the crash is still auditable.
  */
object Harness {
  /** Run `body`; a NonFatal failure is recorded into `errors` and
    * returns None, a fatal one is recorded and rethrown. */
  def guarded[T](name: String,
      errors: scala.collection.mutable.Map[String, String])(body: => T): Option[T] =
    try Some(body) catch {
      case e: Throwable =>
        // first line of EACH throwable in the cause chain (bounded):
        // an analysis exception wrapping the real I/O cause must not
        // lose that cause in verify_errors.json (VERDICT r16 nit #5)
        errors(name) = Iterator.iterate(e)(_.getCause)
          .takeWhile(_ != null).take(5)
          .map(t => Option(t.getMessage).getOrElse(t.getClass.getName)
            .linesIterator.take(1).mkString)
          .mkString(" <- ")
        System.err.println(s"[graft] $name failed: ${errors(name)}")
        if (NonFatal(e)) None else throw e
    }
}
