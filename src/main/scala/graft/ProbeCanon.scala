package graft.operators
// TEMPORARY instrumentation — deleted before commit.
import graft.Tables
import org.apache.spark.sql.functions._
object ProbeCanon {
  def main(args: Array[String]): Unit = {
    val dir = "/root/testdata/sf0.1"
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
      println(f"[probe] $tag%-28s ${(System.nanoTime()-t0)/1e9}%.2f s"); r
    }
    spark.range(1000).selectExpr("sum(id)").collect()
    val docs = Tables.load(spark, dir, "documents")
    val (num, den) = (Dedup.setSimNum, Dedup.setSimDen)
    val (pref, docToks) = t("parts build (lazy)")(Dedup.setSimParts(docs, num, den))
    t("pref materialize")(pref.count())
    t("docToks materialize")(docToks.count())
    val cands = Dedup.candStream(pref, num, den)
    val hv = pmod(xxhash64(col("e.v")), lit(1L << 22)) * lit(1L << 40) + col("e.v")
    val seed = t("seed agg")({
      val probes = cands.select(explode(array(
          struct(col("da").as("u"), col("db").as("v")),
          struct(col("db").as("u"), col("da").as("v")))).as("e"))
        .groupBy(col("e.u").as("u"))
        .agg(min(col("e.v")).as("p1"), max(col("e.v")).as("p2"),
          min(hv).as("h1"), max(hv).as("h2"))
      probes.select(col("u"), explode(array(col("p1"), col("p2"),
          pmod(col("h1"), lit(1L << 40)), pmod(col("h2"), lit(1L << 40)))).as("v"))
        .filter(col("u") =!= col("v"))
        .select(least(col("u"), col("v")).as("da"),
          greatest(col("u"), col("v")).as("db"))
        .distinct().localCheckpoint()
    })
    println(s"[probe] seed rows ${seed.count()}")
    val seedOk = t("seed verify")(Dedup.verifyPairs(seed, docToks, num, den)
      .select("da", "db").localCheckpoint())
    println(s"[probe] seedOk rows ${seedOk.count()}")
    val nodes = docs.select(col("doc_id"))
    val labels0 = t("star loop 1")(graft.Conf.withConf(spark, "spark.sql.shuffle.partitions", "8") {
      Dedup.dupClustersStar(nodes, seedOk)._1.localCheckpoint()
    })
    def lab(side: String) = broadcast(labels0
      .select(col("doc_id").as(side), col("cluster_id").as(s"l$side")))
    val cross = t("cross filter+distinct")(cands
      .join(lab("da"), "da").join(lab("db"), "db")
      .filter(col("lda") =!= col("ldb"))
      .select("da", "db").distinct().localCheckpoint())
    println(s"[probe] cross rows ${cross.count()}")
    val crossOk = t("cross verify")(Dedup.verifyPairs(cross, docToks, num, den)
      .select("da", "db").localCheckpoint())
    println(s"[probe] crossOk rows ${crossOk.count()}")
    val superEdges = t("supernode contract")(crossOk
      .join(lab("da"), "da").join(lab("db"), "db")
      .select(least(col("lda"), col("ldb")).as("da"),
        greatest(col("lda"), col("ldb")).as("db"))
      .distinct().localCheckpoint())
    println(s"[probe] superEdges rows ${superEdges.count()}")
    val superNodes = labels0.select(col("cluster_id").as("doc_id")).distinct()
    val superLabels = t("star loop 2 (super)")(graft.Conf.withConf(spark, "spark.sql.shuffle.partitions", "8") {
      Dedup.dupClustersStar(superNodes, superEdges)._1.localCheckpoint()
    })
    val labels = labels0
      .join(broadcast(superLabels.select(col("doc_id").as("cluster_id"),
        col("cluster_id").as("root"))), Seq("cluster_id"))
      .select(col("doc_id"), col("root").as("cluster_id"))
    val wc = org.apache.spark.sql.expressions.Window.partitionBy(col("canonical_id"))
    val out = labels.select(col("doc_id"), col("cluster_id").as("canonical_id"))
      .withColumn("n_members", count(lit(1)).over(wc))
    t("final materialize")(out.agg(sum(xxhash64(struct(out.columns.toIndexedSeq.map(col): _*)))).collect())
    spark.stop()
  }
}
