package graft.operators

import graft.Tables
import org.apache.spark.sql.functions._

/** Dev-only stage-timing probe for [[graft.operators.Dedup.setSimCanonical]].
  * Test scope on purpose (never ships); data dir comes from args.
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
    def t[T](tag: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"[probe] $tag%-28s ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    spark.range(1000).selectExpr("sum(id)").collect()
    val docs = Tables.load(spark, dir, "documents")
    val (num, den) = (Dedup.setSimNum, Dedup.setSimDen)
    // warm: the all-pairs gate, for a same-JVM reference point
    t("setSimJoin (all-pairs)") {
      graft.Bench.materialize(Dedup.setSimJoin(docs, num, den))
    }
    spark.catalog.clearCache(); System.gc()
    t("setSimCanonical TOTAL") {
      graft.Bench.materialize(Dedup.setSimCanonical(docs, num, den))
    }
    spark.catalog.clearCache(); System.gc()

    // ---- design B: minhash band-bucket seeding, single stream pass ----
    val tB = System.nanoTime()
    val (pref, docToks, cleanup) = Dedup.setSimParts(docs, num, den)
    val nodes = docs.select(col("doc_id"))
    val wB = org.apache.spark.sql.expressions.Window
      .partitionBy(col("band_id"), col("bucket"))
    val permA = Seq(1103515245L, 1103527591L, 1229782938L, 1301100263L,
      141421356L, 1618033988L, 1732050807L, 2045893137L,
      223606797L, 244948974L, 264575131L, 282842712L,
      300000007L, 316227766L, 331662479L, 346410161L)
    val permB = Seq(12345L, 54321L, 98765L, 13579L, 24680L, 11111L,
      22222L, 33333L, 44444L, 55555L, 66666L, 77777L,
      88888L, 99999L, 10101L, 20202L)
    val P = 2147483647L
    val P2 = 2000000011L
    val bandSeed = t("band seed build") {
      val sigs = docToks.select(col("doc_id"), explode(col("toks")).as("tid"))
        .withColumn("h", pmod(xxhash64(col("tid")), lit(P2)))
        .groupBy("doc_id")
        .agg(
          min(pmod(lit(permA.head) * col("h") + lit(permB.head), lit(P))).as("m0"),
          (1 until 16).map(i =>
            min(pmod(lit(permA(i)) * col("h") + lit(permB(i)), lit(P)))
              .as(s"m$i")): _*)
      val bandR = sys.props.getOrElse("probe.bandR", "4").toInt
      val bands = (0 until 16 / bandR).map { b =>
        val cols = (b * bandR until (b + 1) * bandR).map(i => col(s"m$i"))
        val bucket = cols.reduceLeft((acc, m) => acc * 31 + m)
        struct(lit(b).as("band_id"), bucket.as("bucket"))
      }
      sigs.select(col("doc_id"), explode(array(bands: _*)).as("bb"))
        .select(col("doc_id"), col("bb.band_id"), col("bb.bucket"))
        .withColumn("bmin", min(col("doc_id")).over(wB))
        .filter(col("doc_id") =!= col("bmin"))
        .select(col("bmin").as("da"), col("doc_id").as("db"))
        .distinct().localCheckpoint()
    }
    println(s"[probe] bandSeed rows ${bandSeed.count()}")
    val seedOk = t("seed verify")(Dedup.verifyPairs(bandSeed, docToks, num, den)
      .select("da", "db").localCheckpoint())
    println(s"[probe] seedOk rows ${seedOk.count()}")
    val (labels0, rounds0) = t("star loop 1") {
      graft.Conf.withConf(spark, "spark.sql.shuffle.partitions", sys.props.getOrElse("probe.starParts", "1")) {
        val (l, r) = Dedup.dupClustersStar(nodes, seedOk)
        (l.localCheckpoint(), r)
      }
    }
    println(s"[probe] star1 rounds $rounds0 comps ${labels0.select("cluster_id").distinct().count()}")
    def side(l: org.apache.spark.sql.DataFrame, from: String, to: String) =
      broadcast(l.select(col("doc_id").as(from), col("cluster_id").as(to)))
    val cands = Dedup.candStream(pref, num, den)
    val cross = t("cross attach+distinct") {
      cands
        .join(side(labels0, "da", "lda"), "da")
        .join(side(labels0, "db", "ldb"), "db")
        .filter(col("lda") =!= col("ldb"))
        .distinct().localCheckpoint()
    }
    println(s"[probe] cross rows ${cross.count()}")
    val crossOk = t("cross verify") {
      Dedup.verifyPairs(cross, docToks, num, den)
        .select(least(col("lda"), col("ldb")).as("da"),
          greatest(col("lda"), col("ldb")).as("db"))
        .distinct().localCheckpoint()
    }
    println(s"[probe] crossOk comp pairs ${crossOk.count()}")
    val superN0 = labels0.select(col("cluster_id").as("doc_id")).distinct()
    val superLab1 = t("star loop 2 (super)") {
      graft.Conf.withConf(spark, "spark.sql.shuffle.partitions", sys.props.getOrElse("probe.starParts", "1")) {
        Dedup.dupClustersStar(superN0, crossOk)._1.localCheckpoint()
      }
    }
    val out = t("compose + window") {
      val labels = labels0.select(col("doc_id"), col("cluster_id").as("c0"))
        .join(broadcast(superLab1.select(col("doc_id").as("c0"),
          col("cluster_id").as("canonical_id"))), "c0")
        .select(col("doc_id"), col("canonical_id"))
        .localCheckpoint()
      val wc = org.apache.spark.sql.expressions.Window.partitionBy(col("canonical_id"))
      val o = labels.withColumn("n_members", count(lit(1)).over(wc))
      graft.Bench.materialize(o); o
    }
    cleanup()
    println(f"[probe] design B TOTAL            ${(System.nanoTime() - tB) / 1e9}%.2f s")
    spark.stop()
  }
}
