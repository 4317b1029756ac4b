package graft

import org.apache.spark.sql.{GraftBridge, SparkSessionExtensions}
import org.scalatest.funsuite.AnyFunSuite

class ExtensionsSpec extends AnyFunSuite {
  test("GraftExtensions injects cosine_sim (applied to the live session)") {
    val spark = SparkTestSession.spark
    val ext = new SparkSessionExtensions
    new GraftExtensions().apply(ext)
    GraftBridge.registerInjectedFunctions(ext, spark)
    val r = spark.sql(
      "SELECT cosine_sim(array(1.0d, 2.0d), array(2.0d, 4.0d)) AS s")
      .collect()(0).getDouble(0)
    assert(math.abs(r - 1.0) < 1e-12)
  }
}
