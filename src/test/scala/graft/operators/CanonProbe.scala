package graft.operators

import graft.Tables
import org.apache.spark.sql.functions._

/** Dev-only timing probe for [[graft.operators.Dedup.setSimCanonical]].
  * Test scope on purpose (never ships); data dir comes from args. The
  * box shows 2-3x minute-scale throughput swings, so judge variants by
  * interleaved min-of-N in ONE JVM (the r9 in-join-label experiment —
  * 6.71 s vs 4.30 s for the committed form — was decided exactly that
  * way; a between-JVM comparison had the sign REVERSED).
  * Run: sbt "Test/runMain graft.operators.CanonProbe /root/testdata/sf0.1"
  */
object CanonProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.ansi.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def t[T](tag: String)(f: => T): Double = {
      val t0 = System.nanoTime(); f
      val s = (System.nanoTime() - t0) / 1e9
      println(f"[probe] $tag%-34s $s%.2f s"); s
    }
    spark.range(1000).selectExpr("sum(id)").collect()
    val docs = Tables.load(spark, dir, "documents")
    val (num, den) = (Dedup.setSimNum, Dedup.setSimDen)
    t("setSimJoin (all-pairs, warm-up)") {
      graft.Bench.materialize(Dedup.setSimJoin(docs, num, den))
    }
    spark.catalog.clearCache(); System.gc()
    val rounds = sys.props.getOrElse("probe.rounds", "3").toInt
    val ts = (1 to rounds).map { i =>
      val s = t(s"setSimCanonical #$i") {
        graft.Bench.materialize(Dedup.setSimCanonical(docs, num, den))
      }
      spark.catalog.clearCache(); System.gc()
      s
    }
    println(f"[probe] canonical min ${ts.min}%.2f  median ${ts.sorted(Ordering.Double.TotalOrdering)(ts.size / 2)}%.2f")
    // fold-only: production feeds the STORED canonical table (and a
    // persisted token index); the per-snapshot cost is the delta fold.
    // Precompute base labels once outside the timer, then time the
    // public incremental entry point — an honest UPPER bound on the
    // fold (it still rebuilds the union token index the gate shares).
    val mx = docs.agg(max("doc_id")).head().getLong(0)
    val cut = 4L * mx / 5L
    val baseLab = Dedup
      .canonicalLabels(docs.filter(col("doc_id") <= cut), num, den)
      .localCheckpoint()
    spark.catalog.clearCache(); System.gc()
    val fs = (1 to rounds).map { i =>
      val s = t(s"incremental fold (stored base) #$i") {
        graft.Bench.materialize(Dedup.setSimCanonicalIncremental(
          docs, baseLab, col("doc_id") > cut, num, den))
      }
      spark.catalog.clearCache(); System.gc()
      s
    }
    println(f"[probe] fold min ${fs.min}%.2f  median ${fs.sorted(Ordering.Double.TotalOrdering)(fs.size / 2)}%.2f")
    spark.stop()
  }
}
