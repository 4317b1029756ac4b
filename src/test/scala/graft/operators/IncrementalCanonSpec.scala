package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** [[Dedup.setSimCanonicalIncremental]] contract: folding a delta
  * batch into an existing canonical labeling equals a full recompute
  * over base ∪ delta — including the hard case where a delta document
  * BRIDGES two base components that were (correctly) separate before
  * it arrived. */
class IncrementalCanonSpec extends AnyFunSuite {
  lazy val spark = graft.SparkTestSession.spark

  private def canon(df: org.apache.spark.sql.DataFrame): Set[(Long, Long, Long)] =
    df.select("doc_id", "canonical_id", "n_members")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet

  test("a delta doc bridging two base components merges them to the global min") {
    import spark.implicits._
    // Jaccard(t=0.7) geometry: C shares 17 of 23 tokens with A and
    // with B (17/23 ≈ 0.739 ≥ 0.7), while A∩B = 14 of 26 (≈0.538 < 0.7)
    // — so base holds two separate components {1},{2} and the delta
    // doc 100 legally merges them.
    val t = (1 to 20).map(i => s"t$i")
    val a = (t.take(17) ++ Seq("xa", "xb", "xc")).mkString(" ")
    val b = (t.drop(3) ++ Seq("ya", "yb", "yc")).mkString(" ")
    val c = t.mkString(" ")
    val base = Seq((1L, a), (2L, b), (3L, "zq zw ze zr zt zy"))
      .toDF("doc_id", "text")
    val all = base.union(Seq((100L, c)).toDF("doc_id", "text"))
    val baseLab = Dedup.canonicalLabels(base, Dedup.setSimNum, Dedup.setSimDen)
    // base sanity: three singleton components
    assert(baseLab.collect().map(r => (r.getLong(0), r.getLong(1))).toSet ==
      Set((1L, 1L), (2L, 2L), (3L, 3L)))
    val inc = canon(Dedup.setSimCanonicalIncremental(all, baseLab,
      col("doc_id") > 3L))
    assert(inc == Set((1L, 1L, 3L), (2L, 1L, 3L), (100L, 1L, 3L),
      (3L, 3L, 1L)), s"bridge merge wrong: $inc")
    // and it equals the full recompute
    assert(inc == canon(Dedup.setSimCanonical(all)))
  }

  test("incremental equals full recompute on the real corpus") {
    val docs = graft.Tables.load(spark, graft.SparkTestSession.sf, "documents")
    val mx = docs.agg(max("doc_id")).head().getLong(0)
    val cut = mx / 2 // harsher than the gate's 80/20: half the corpus is delta
    val baseLab = Dedup.canonicalLabels(docs.filter(col("doc_id") <= cut),
      Dedup.setSimNum, Dedup.setSimDen)
    val inc = canon(Dedup.setSimCanonicalIncremental(docs, baseLab,
      col("doc_id") > cut))
    val full = canon(Dedup.setSimCanonical(docs))
    assert(inc == full, "incremental diverges from full recompute")
  }
}
