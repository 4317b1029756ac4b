package graft

import graft.functions.RollingHash.rolling_hash
import graft.operators.Dedup
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class RollingHashSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  /** Direct O(n·w) per-window recompute the O(1)-slide kernel must match. */
  private def reference(toks: Seq[String], w: Int, mult: Long,
      modulus: Long): Seq[Long] = {
    def tokenHash(s: String): Long =
      if (modulus > 0)
        (0 until 24).foldLeft(0L)((h, i) =>
          (h * mult + (if (i < s.length) s.charAt(i).toLong else 0L)) % modulus)
      else s.foldLeft(0L)((h, c) => h * mult + c.toLong)
    if (toks.length < w) Seq.empty
    else (0 to toks.length - w).map { i =>
      toks.slice(i, i + w).foldLeft(0L)((h, t) =>
        if (modulus > 0) (h * mult + tokenHash(t)) % modulus
        else h * mult + tokenHash(t))
    }
  }

  private def viaSpark(toks: Seq[String], w: Int, modulus: Long): Seq[Long] =
    Seq(Tuple1(toks)).toDF("t")
      .select(rolling_hash(col("t"), w, 31L, modulus).as("h"))
      .collect()(0).getSeq[Long](0)

  test("slide recurrence equals direct recompute in both rings") {
    // LCG-deterministic token soup: short tokens, >24-char tokens (the
    // mod ring truncates at 24, the 2^64 ring does not), repeats
    var s = 42L
    def nxt(): Long = { s = s * 6364136223846793005L + 1442695040888963407L; s }
    val toks = (0 until 200).map { _ =>
      val len = 1 + Math.floorMod(nxt(), 30L).toInt
      (0 until len).map(_ => ('a' + Math.floorMod(nxt(), 26L).toInt).toChar)
        .mkString
    }
    for (w <- Seq(1, 2, 16); m <- Seq(0L, 2000000011L)) {
      assert(viaSpark(toks, w, m) == reference(toks, w, 31L, m),
        s"w=$w modulus=$m")
    }
    // edge: fewer tokens than the window -> empty output
    assert(viaSpark(toks.take(3), 16, 0L).isEmpty)
    assert(viaSpark(Seq.empty[String], 16, 2000000011L).isEmpty)
  }

  test("rolling hash stays inside whole-stage codegen over a scan") {
    val scanned = Tables.load(spark, SparkTestSession.sf, "documents")
      .select(rolling_hash(split(col("text"), " "), 16).as("h"))
    val planLine = scanned.queryExecution.executedPlan.toString
      .linesIterator.find(_.contains("rolling_hash")).get
    assert(planLine.trim.startsWith("*"), s"not codegen'd: $planLine")
    assert(scanned.filter(size(col("h")) > 0).count() > 0)
  }

  test("hashed substring census equals the text-window census") {
    // same corpus, same w: grouping windows by rolling hash must give
    // the same per-doc (n_windows, n_dup) as grouping by window text —
    // i.e. the mod-P2 ring is collision-free on this corpus, so the
    // 8-bytes-per-window production shuffle loses nothing
    val docs = Tables.load(spark, SparkTestSession.sf, "documents")
    val byText = Dedup.substringDedupDf(docs).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    val byHash = Dedup.substringDedupRollingDf(docs).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(byHash == byText)
  }

  test("64-bit ring catches the alignment-shifted planted passage") {
    val passage = (1 to 16).map(i => s"boiler$i")
    val d10 = passage ++ (1 to 16).map(i => s"ten$i")
    val d11 = (1 to 5).map(i => s"eleven$i") ++ passage ++
      (1 to 11).map(i => s"tail$i")
    val planted = Seq((10L, d10.mkString(" ")), (11L, d11.mkString(" ")))
      .toDF("doc_id", "text")
    val out = Dedup.substringDedupRollingDf(planted, modulus = 0L).collect()
      .map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(out(10L) == 0 && out(11L) == 1)
  }
}
