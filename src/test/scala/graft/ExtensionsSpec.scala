package graft

import org.apache.spark.sql.{GraftBridge, SparkSessionExtensions}
import org.scalatest.funsuite.AnyFunSuite

class ExtensionsSpec extends AnyFunSuite {

  test("spark.sql.extensions config alone resolves cosine_sim and dot_product") {
    // SparkTestSession sets spark.sql.extensions=graft.GraftExtensions
    // (as Verify/Bench do) and nothing in the test JVM registers the
    // functions manually — SQL resolution proves the deployment-time
    // config path end-to-end.
    val spark = SparkTestSession.spark
    assert(spark.conf.get("spark.sql.extensions") == "graft.GraftExtensions")
    val r = spark.sql(
      """SELECT cosine_sim(array(1.0d, 2.0d), array(2.0d, 4.0d)) AS s,
        |       dot_product(array(1.0d, 2.0d), array(3.0d, 4.0d)) AS d
        |""".stripMargin).collect()(0)
    assert(math.abs(r.getDouble(0) - 1.0) < 1e-12)
    assert(math.abs(r.getDouble(1) - 11.0) < 1e-12)
  }

  test("config-injected planner strategy plans AsofJoinNode without the wrapper fallback") {
    // Build the node directly (NOT via AsofJoin.purchaseToViewNative,
    // whose experimental-strategies fallback would mask a broken
    // injectPlannerStrategy) — the config-built session must plan it.
    import org.apache.spark.sql.functions._
    val spark = SparkTestSession.spark
    import spark.implicits._
    val left = Seq((1L, 10L, 7L)).toDF("k", "t", "lid")
      .select(col("k"), col("t").cast("timestamp").as("ts"), col("lid"))
    val right = Seq((1L, 11L, 8L)).toDF("k2", "t2", "rid")
      .select(col("k2"), col("t2").cast("timestamp").as("ts2"), col("rid"))
    val lp = GraftBridge.analyzed(left)
    val rp = GraftBridge.analyzed(right)
    def attr(p: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan,
        n: String) = p.output.find(_.name == n).get
    val node = graft.plans.AsofJoinNode(lp, rp,
      attr(lp, "k"), attr(rp, "k2"), attr(lp, "ts"), attr(rp, "ts2"),
      attr(lp, "lid"), attr(rp, "rid"))
    // clear any fallback another suite installed on the shared session
    // so ONLY the config-injected strategy can plan the node
    val saved = spark.experimental.extraStrategies
    spark.experimental.extraStrategies = Nil
    try {
      val df = GraftBridge.ofRows(spark, node)
      assert(df.queryExecution.executedPlan.toString.contains("AsofJoin"))
      assert(df.collect().map(r => (r.getLong(2), r.getLong(5))).toSeq
        == Seq((8L, 7L)))
    } finally spark.experimental.extraStrategies = saved
  }

  test("GraftExtensions applies to a bare SparkSessionExtensions (programmatic path)") {
    val spark = SparkTestSession.spark
    val ext = new SparkSessionExtensions
    new GraftExtensions().apply(ext)
    // re-registration over the live session must be idempotent
    GraftBridge.registerInjectedFunctions(ext, spark)
    val r = spark.sql(
      "SELECT cosine_sim(array(1.0d, 2.0d), array(2.0d, 4.0d)) AS s")
      .collect()(0).getDouble(0)
    assert(math.abs(r - 1.0) < 1e-12)
  }
}
