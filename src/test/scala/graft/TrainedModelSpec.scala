package graft

import graft.functions.TextAnalysis
import graft.operators.TrainPrep
import org.scalatest.funsuite.AnyFunSuite

/** Specs for the in-engine trained models: batch perceptron and BPE
  * merge application. */
class TrainedModelSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val sf = SparkTestSession.sf

  test("perceptron margins equal a sequential batch-update reference") {
    // presence features, replicated driver-side from the same hash
    val feats = Tables.load(spark, sf, "documents")
      .selectExpr("doc_id", "CASE WHEN lang = 'en' THEN 1L ELSE -1L END AS y",
        "explode(split(text, ' ')) AS term")
      .select(org.apache.spark.sql.functions.col("doc_id"),
        org.apache.spark.sql.functions.col("y"),
        org.apache.spark.sql.functions.pmod(
          graft.operators.Dedup.charPolyHash(
            org.apache.spark.sql.functions.col("term"), 31L, 2000000011L),
          org.apache.spark.sql.functions.lit(TrainPrep.perceptronBuckets))
          .as("b"))
      .distinct().collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val byDoc = feats.groupBy(_._1).map { case (d, rows) =>
      (d, rows.head._2, rows.map(_._3).toSet)
    }.toSeq
    var w = Map.empty[Long, Long].withDefaultValue(0L)
    for (_ <- 1 to TrainPrep.perceptronRounds) {
      val mis = byDoc.filter { case (_, y, bs) => y * bs.toSeq.map(w).sum <= 0 }
      val delta = mis.flatMap { case (_, y, bs) => bs.map(_ -> y) }
        .groupBy(_._1).map { case (b, ys) => b -> ys.map(_._2).sum }
      w = w ++ delta.map { case (b, d) => b -> (w(b) + d) }
    }
    val want = byDoc.map { case (d, y, bs) =>
      val m = bs.toSeq.map(w).sum
      (d, y, m, if (m > 0) 1L else -1L, (if (m > 0) 1L else -1L) == y)
    }.toSet
    val out = TrainPrep.perceptron(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getBoolean(4))).toSet
    assert(out == want)
    // the trained model separates better than chance on its own corpus
    val acc = want.count(_._5).toDouble / want.size
    assert(acc > 0.5, s"training accuracy $acc")
  }

  test("bpe apply: subword counts equal greedy merge application") {
    val merges = TextAnalysis.bpeTrain(spark, sf).collect()
      .sortBy(_.getLong(0)).map(r => (r.getString(1), r.getString(2)))
    val docs = Tables.load(spark, sf, "documents")
      .selectExpr("doc_id", "split(text, ' ') AS ws").collect()
      .map(r => (r.getLong(0), r.getSeq[String](1)))
    def encode(word: String): Long = {
      var s = word.flatMap(c => s"_${c}_")
      merges.foreach { case (a, b) => s = s.replace(s"_${a}__${b}_", s"_$a$b" + "_") }
      s.stripPrefix("_").stripSuffix("_").split("__").length.toLong
    }
    val cache = scala.collection.mutable.Map.empty[String, Long]
    val want = docs.map { case (d, ws) =>
      val nSub = ws.map(w => cache.getOrElseUpdate(w, encode(w))).sum
      (d, ws.length.toLong, nSub, 1000000L * nSub / ws.length)
    }.toSet
    val out = TextAnalysis.bpeApply(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSet
    assert(out == want)
    // merges only shrink symbol counts: chars >= subwords >= words
    out.foreach { case (d, nW, nS, _) =>
      assert(nS >= nW, s"doc $d: fewer subwords than words")
    }
    assert(out.exists { case (_, nW, nS, _) => nS > nW },
      "no word was ever split — merge table suspiciously total")
  }
}
