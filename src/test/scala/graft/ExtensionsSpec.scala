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
