package graft

import org.scalatest.funsuite.AnyFunSuite

/** Library-caller cache hygiene: EVERY public gate entry point must
  * release the cached/persisted intermediates it created by the time
  * its result is materialized. A query that returns a lazy frame
  * reading its own `.cache()` leaks cached partitions into the
  * caller's session — the class of bug behind round 8's `setSimParts`
  * advice and round 9's `behavior_seq_support` suite regression
  * (in-suite 7.50 s vs 2.38 s isolated: its `u.cache()` competed with
  * later gates' caches for executor memory). The contract asserted
  * here is the checkpoint-then-release pattern: materialize what the
  * result needs, then unpersist, BEFORE returning.
  *
  * Runs the full gate surface at sf0.001 (one materialization each,
  * the Bench hash-agg shape) and asserts the session cache registry is
  * empty after each gate. Failures name the offending gate directly.
  */
class CacheHygieneSpec extends AnyFunSuite {
  private val spark = SparkTestSession.spark
  private val sf = SparkTestSession.sf

  private def cacheEmpty: Boolean = spark.sharedState.cacheManager.isEmpty

  test("every public gate leaves the cache registry empty") {
    spark.catalog.clearCache()
    assert(cacheEmpty, "pre-existing cached frames — fix the harness")
    val leaks = scala.collection.mutable.ListBuffer.empty[String]
    val failures = scala.collection.mutable.ListBuffer.empty[String]
    for ((name, fn) <- SparkEntry.queries.toSeq.sortBy(_._1)) {
      try {
        Bench.materialize(fn(spark, sf))
        if (!cacheEmpty) leaks += name
      } catch {
        case e: Throwable =>
          failures += s"$name: ${Option(e.getMessage).getOrElse(e.getClass.getName).take(120)}"
      } finally {
        // reset for independence: the NEXT gate's verdict must not be
        // polluted by this one's leak
        spark.catalog.clearCache()
        graft.streaming.EventStream.purgeStaging()
      }
    }
    assert(failures.isEmpty, s"gates crashed: ${failures.mkString("; ")}")
    assert(leaks.isEmpty,
      s"${leaks.size} gates leak cached frames to library callers: " +
        leaks.mkString(", "))
  }
}
