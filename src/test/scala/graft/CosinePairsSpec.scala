package graft

import graft.functions.SortedWeightedDot
import graft.operators.Dedup
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Exact TF-IDF cosine near-dup join: the packed-dot kernel, the
  * lossless prefix-filtered all-pairs variant (proved equal to brute
  * force over the full sf0.001 corpus), and the LSH-candidate gate. */
class CosinePairsSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def pack(kw: (Long, Long)*): Array[Long] =
    kw.map { case (k, w) => (k << SortedWeightedDot.weightBits) | w }
      .sorted.toArray

  test("sorted_weighted_dot matches a reference dot product") {
    val rows = Seq(
      (pack(1L -> 2L, 3L -> 5L, 7L -> 1L), pack(3L -> 4L, 7L -> 6L), 26L),
      (pack(1L -> 2L), pack(2L -> 9L), 0L),
      (pack(), pack(1L -> 1L), 0L),
      (pack(5L -> 1000L, 9L -> 3L), pack(5L -> 1000L, 9L -> 3L),
        1000000L + 9L))
      .toDF("a", "b", "expect")
    val got = rows.select(
      SortedWeightedDot.sorted_weighted_dot(col("a"), col("b")).as("dot"),
      col("expect")).collect()
    got.foreach(r => assert(r.getLong(0) == r.getLong(1)))
  }

  test("all-pairs cosine equals driver-side brute force on sf0.001") {
    val docs = Tables.load(spark, SparkTestSession.sf, "documents")
    val vecs = Dedup.cosineVectors(docs).collect().map { r =>
      val packed = r.getSeq[Long](1)
      val m = packed.map(v =>
        (v >>> SortedWeightedDot.weightBits) ->
          (v & ((1L << SortedWeightedDot.weightBits) - 1))).toMap
      (r.getLong(0), m, r.getLong(2))
    }
    // reference: every unordered pair, exact integer dot + threshold
    val expect = (for {
      (da, ma, na2) <- vecs
      (db, mb, nb2) <- vecs if da < db
      dot = ma.keysIterator
        .map(k => ma(k) * mb.getOrElse(k, 0L)).sum
      if BigInt(dot) * dot * Dedup.cosSimDen * Dedup.cosSimDen >=
        BigInt(na2) * nb2 * Dedup.cosSimNum * Dedup.cosSimNum
    } yield (da, db, dot)).toSet
    val got = Dedup.cosineAllPairsExact(docs)
      .select("da", "db", "dot").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got == expect,
      s"prefix-filtered all-pairs diverged: missing=${expect -- got} " +
        s"extra=${got -- expect}")
    assert(expect.nonEmpty, "degenerate fixture: no cosine duplicates")
  }

  test("gate scores exactly the simhash candidate set") {
    val gate = Dedup.cosinePairsQuery(spark, SparkTestSession.sf)
      .select("da", "db").collect().map(r => (r.getLong(0), r.getLong(1)))
    val cand = Dedup.simhashPairsQuery(spark, SparkTestSession.sf)
      .select("da", "db").collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(gate.toSet == cand.toSet)
    assert(gate.length == cand.length)
  }

  test("cos2_q12 is bounded and dup agrees with the threshold") {
    val rows = Dedup.cosinePairsQuery(spark, SparkTestSession.sf)
      .select("cos2_q12", "dup").collect()
    rows.foreach { r =>
      val c = r.getLong(0)
      assert(c >= 0L && c <= 1000000000000L)
      // quantization truncates, so compare against the q12 threshold
      // conservatively on both sides of the boundary
      val t = 1000000000000L * Dedup.cosSimNum * Dedup.cosSimNum /
        (Dedup.cosSimDen * Dedup.cosSimDen)
      if (r.getBoolean(1)) assert(c >= t - 1)
    }
  }
}
