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

  test("train eval: confusion cells and AUC equal an exact recompute") {
    val p = TrainPrep.perceptron(spark, sf).collect()
      .map(r => (r.getLong(1), r.getLong(2))) // (label, margin)
    val row = TrainPrep.trainEval(spark, sf).collect().head
    val n = p.length.toLong
    val nPos = p.count(_._1 == 1L).toLong
    assert(row.getLong(0) == n && row.getLong(1) == nPos)
    // confusion cells from the raw (label, margin) pairs
    val tp = p.count(x => x._1 == 1 && x._2 > 0).toLong
    val fp = p.count(x => x._1 == -1 && x._2 > 0).toLong
    val fn = p.count(x => x._1 == 1 && x._2 <= 0).toLong
    val tn = p.count(x => x._1 == -1 && x._2 <= 0).toLong
    assert((row.getLong(2), row.getLong(3), row.getLong(4), row.getLong(5))
      == ((tp, fp, fn, tn)))
    // exact integer AUC via tie-averaged doubled ranks (BigInt mirror
    // of the published fixed-point formula)
    val sorted = p.map(_._2).sorted
    def rank2(m: Long): BigInt =
      BigInt(2) * sorted.indexWhere(_ == m) + sorted.count(_ == m) + 1
    val u2 = p.filter(_._1 == 1L).map(x => rank2(x._2)).sum
    val aucQ6 = (BigInt(1000000) * (u2 - BigInt(nPos) * (nPos + 1))) /
      (BigInt(2) * nPos * (n - nPos))
    assert(BigInt(row.getLong(9)) == aucQ6)
    assert(row.getLong(9) >= 0 && row.getLong(9) <= 1000000)
    // margins must rank the target language above chance even when the
    // hard 3-round classifier degenerates to the majority class
    assert(row.getLong(9) > 500000, s"AUC ${row.getLong(9)} at chance")
    // cells partition the corpus; F1 consistent with its own cells
    assert(tp + fp + fn + tn == n)
    if (2 * tp + fp + fn > 0)
      assert(row.getLong(8) == 2000000 * tp / (2 * tp + fp + fn))
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

  test("joint curation equals a sequential text+norm+cap reference") {
    val docs = Tables.load(spark, sf, "documents")
      .selectExpr("doc_id", "size(split(text, ' ')) AS nw",
        "length(replace(text, ' ', '')) AS cns").collect()
      .map(r => (r.getLong(0), r.getInt(1).toLong, r.getInt(2).toLong))
      .map(t => t._1 -> (t._2, t._3)).toMap
    val vecs = Tables.load(spark, sf, "embeddings")
      .selectExpr("vec_id", "CAST(label AS BIGINT)", "embedding").collect()
      .map { r =>
        val v = r.getSeq[Float](2).map(_.toDouble)
        val nrm = math.sqrt(v.map(x => x * x).foldLeft(0.0)(_ + _))
        (r.getLong(0), r.getLong(1), math.floor(nrm * 1e6).toLong)
      }
    val byLabel = vecs.groupBy(_._2)
    val want = byLabel.toSeq.flatMap { case (label, vs) =>
      val sumU6 = vs.map(_._3).sum
      val n = vs.length.toLong
      val pass = vs.filter { case (id, _, u6) =>
        val (nw, cns) = docs(id)
        nw >= 5 && nw <= 2000 && cns <= 12 * nw && u6 * n <= 2 * sumU6
      }
      pass.map(v => (v._1, docs(v._1)._1))
        .sortBy { case (id, nw) => (-nw, id) }
        .take(TrainPrep.jointCapK).zipWithIndex
        .map { case ((id, nw), i) => (label, id, nw, i + 1L) }
    }.toSet
    val out = TrainPrep.jointCurate(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSet
    assert(out == want)
    // cap respected and ranks dense per label
    out.groupBy(_._1).foreach { case (label, rows) =>
      assert(rows.size <= TrainPrep.jointCapK)
      assert(rows.map(_._4).toSeq.sorted == (1L to rows.size))
    }
  }
}
