package graft

import graft.analytics.{Retrieval, TimeSeries}
import graft.store.BloomIndex
import graft.streaming.StreamEwma
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Specs for the bloom file index, MMR re-ranking, and streaming
  * EWMA. */
class IndexAndRerankSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val sf = SparkTestSession.sf

  test("bloom index prunes files and never loses a probed key") {
    val (kept, total) = BloomIndex.pruneCounts(spark, sf)
    assert(kept < total, s"no pruning: $kept of $total files kept")
    assert(kept >= 1)
  }

  test("bloom pruned lookup equals a plain filter over the table") {
    val pruned = BloomIndex.prunedLookup(spark, sf)
      .collect().map(_.toString).sorted.toSeq
    val path = BloomIndex.bootstrap(spark, sf)
    val all = spark.read.parquet(path)
    val Array(lo, hi) = all.agg(min(col("user_id")), max(col("user_id")))
      .collect()(0).toSeq.map(_.toString.toLong).toArray
    val span = hi - lo
    val keys = Seq(lo + span / 3, lo + span * 2 / 3)
    val plain = all.filter(col("user_id").isin(keys: _*))
      .groupBy("event_type")
      .agg(count(lit(1)).as("cnt"),
        countDistinct(col("user_id")).as("n_users"),
        Tables.dsum(col("value")).as("val_sum"))
      .collect().map(_.toString).sorted.toSeq
    assert(pruned == plain && pruned.nonEmpty)
  }

  test("bloom candidate files have no false negatives on real keys") {
    val path = BloomIndex.bootstrap(spark, sf)
    val idx = BloomIndex.index(spark, path).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    // every (key, actual file) pair must be inside the candidate set
    val actual = spark.read.parquet(path)
      .select(col("user_id"), col("_metadata.file_path").as("file"))
      .distinct().collect()
      .map(r => (r.getLong(0), r.getString(1)))
    actual.take(200).foreach { case (k, file) =>
      assert(BloomIndex.candidateFiles(idx, k).contains(file),
        s"false negative: key $k in $file not in candidates")
    }
  }

  test("MMR matches a sequential greedy reference") {
    val cand = graft.operators.Similarity
      .mmrCandidates(spark, sf, Retrieval.mmrQueries.toLong,
        Retrieval.mmrPoolK)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    // exact pairwise sims via the same quantization, sequentially
    val e = Tables.load(spark, sf, "embeddings")
      .select(col("vec_id"), col("embedding").cast("array<double>"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Double](1).toArray).toMap
    def simQ6(a: Long, b: Long): Long = {
      val (va, vb) = (e(a), e(b))
      var dot = 0.0; var na = 0.0; var nb = 0.0; var i = 0
      while (i < va.length) {
        dot += va(i) * vb(i); na += va(i) * va(i); nb += vb(i) * vb(i)
        i += 1
      }
      math.round(dot / (math.sqrt(na) * math.sqrt(nb)) * 1e6)
    }
    val expect = cand.groupBy(_._1).toSeq.flatMap { case (q, cs) =>
      val pool = cs.map(c => (c._2, c._3)).sortBy(c => (-c._2, c._1))
      val sel = scala.collection.mutable.ArrayBuffer.empty[(Long, Long)]
      while (sel.length < Retrieval.mmrK && sel.length < pool.length) {
        val scored = pool.filterNot(c => sel.exists(_._1 == c._1)).map {
          case (doc, s) =>
            val maxp = if (sel.isEmpty) 0L
              else sel.map(x => simQ6(doc, x._1)).max
            (doc, 5L * s - 5L * maxp)
        }
        val best = scored.minBy(c => (-c._2, c._1))
        sel += best
      }
      sel.zipWithIndex.map { case ((doc, score), i) =>
        (q, (i + 1).toLong, doc, score) }
    }.toSet
    val got = Retrieval.mmrDiversify(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSet
    assert(got == expect && got.nonEmpty)
  }

  test("MMR marginal scores are non-increasing from step 2 on") {
    // step 1 is excluded: its penalty is 0 by convention (max over an
    // empty set), while later steps can carry NEGATIVE max pair-sims
    // that raise their score above 5*sim. From step 2 the penalty max
    // runs over strictly growing sets, so marginals can only fall.
    val out = Retrieval.mmrDiversify(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(3)))
    out.groupBy(_._1).values.foreach { rows =>
      val scores = rows.filter(_._2 >= 2).sortBy(_._2).map(_._3)
      assert(scores.zip(scores.tail).forall { case (a, b) => a >= b })
    }
  }

  test("streaming EWMA equals the batch window form bit-for-bit") {
    val streamed = StreamEwma.streamEwma(spark, sf)
      .collect().map(_.toString).sorted.toSeq
    val batch = TimeSeries.ewma(spark, sf)
      .collect().map(_.toString).sorted.toSeq
    assert(streamed == batch && streamed.nonEmpty)
  }

  test("streaming EWMA replay splits the series across micro-batches") {
    val cut = java.sql.Timestamp.valueOf(
      graft.streaming.Sessionize.streamCut)
    val hours = TimeSeries.ewma(spark, sf)
      .select("hour_start").distinct().collect()
      .map(_.getTimestamp(0))
    assert(hours.exists(_.before(cut)) && hours.exists(h =>
      !h.before(cut)), "cut does not split the hourly series")
  }
}
