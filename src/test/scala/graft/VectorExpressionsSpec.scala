package graft

import graft.functions.VectorExpressions
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class VectorExpressionsSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  test("cosine_sim matches a hand computation and stays in codegen") {
    import spark.implicits._
    val df = Seq((Array(1.0, 2.0, 3.0), Array(3.0, 2.0, 1.0)))
      .toDF("a", "b")
      .select(VectorExpressions.cosine_sim(col("a"), col("b")).as("s"))
    val got = df.collect()(0).getDouble(0)
    val expected = 10.0 / (math.sqrt(14.0) * math.sqrt(14.0))
    assert(math.abs(got - expected) < 1e-15)
    // must run inside a WholeStageCodegen span, not a fallback project
    // (literal inputs constant-fold, so check over a parquet scan)
    val scanned = Tables.load(spark, SparkTestSession.sf, "embeddings")
      .selectExpr("cast(embedding as array<double>) v")
      .select(VectorExpressions.cosine_sim(col("v"), col("v")).as("s"))
    // '*' prefix = inside a WholeStageCodegen stage
    val planLine = scanned.queryExecution.executedPlan.toString
      .linesIterator.find(_.contains("cosine_sim")).get
    assert(planLine.trim.startsWith("*"), s"not codegen'd: $planLine")
    assert(scanned.filter("s > 0.999").count() > 0)
  }

  test("dot_product matches sequential fold and stays in codegen") {
    // against a literal hyperplane, over a parquet scan (the LSH shape)
    val h = (0 until 64).map(i => graft.operators.Similarity.hyper(0, i))
    val scanned = Tables.load(spark, SparkTestSession.sf, "embeddings")
      .selectExpr("vec_id", "cast(embedding as array<double>) v")
      .select(col("vec_id"),
        VectorExpressions.dot_product(col("v"), typedlit(h)).as("d"))
    val planLine = scanned.queryExecution.executedPlan.toString
      .linesIterator.find(_.contains("dot_product")).get
    assert(planLine.trim.startsWith("*"), s"not codegen'd: $planLine")
    val row0 = Tables.load(spark, SparkTestSession.sf, "embeddings")
      .selectExpr("vec_id", "cast(embedding as array<double>) v")
      .filter("vec_id = 0").collect()(0).getSeq[Double](1)
    var exp = 0.0
    (0 until 64).foreach(i => exp += row0(i) * h(i))
    assert(scanned.filter("vec_id = 0").collect()(0).getDouble(1) == exp)
  }

  test("cosine_sim is registered and usable from SQL") {
    VectorExpressions.register(spark)
    val r = spark.sql(
      "SELECT cosine_sim(array(1.0d, 0.0d), array(1.0d, 0.0d)) AS s")
      .collect()(0).getDouble(0)
    assert(math.abs(r - 1.0) < 1e-15)
  }

  test("type mismatch is rejected at analysis") {
    VectorExpressions.register(spark)
    val e = intercept[Exception] {
      spark.sql("SELECT cosine_sim('x', 'y')").collect()
    }
    assert(e.getMessage.toLowerCase.contains("cosine_sim"))
  }

  test("agrees with the pairSims kernel on real embeddings") {
    val e = Tables.load(spark, SparkTestSession.sf, "embeddings")
      .selectExpr("vec_id", "cast(embedding as array<double>) v")
    val a = e.filter("vec_id = 0").select(col("v").as("va"))
    val b = e.filter("vec_id = 1").select(col("v").as("vb"))
    val viaExpr = a.crossJoin(b)
      .select(VectorExpressions.cosine_sim(col("va"), col("vb")))
      .collect()(0).getDouble(0)
    val rows = e.filter("vec_id <= 1").collect()
      .map(r => r.getSeq[Double](1).toArray)
    var dot = 0.0; var na = 0.0; var nb = 0.0
    (0 until 64).foreach { i =>
      dot += rows(0)(i) * rows(1)(i)
      na += rows(0)(i) * rows(0)(i); nb += rows(1)(i) * rows(1)(i)
    }
    assert(viaExpr == dot / (math.sqrt(na) * math.sqrt(nb)))
  }
}
