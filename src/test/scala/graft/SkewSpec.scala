package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Runtime skew handling: SCALE.md claims AQE re-plans skewed
  * shuffle joins at runtime — this pins it. A join keyed 95% to one
  * value is executed under thresholds scaled to the fixture, and the
  * final adaptive plan must mark the sort-merge join as skew-split. */
class SkewSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  private def withConfs[T](kvs: (String, String)*)(body: => T): T =
    kvs.foldRight(() => body)((kv, acc) =>
      () => Conf.withConf(spark, kv._1, kv._2)(acc())).apply()

  test("AQE splits a skewed partition of a sort-merge join at runtime") {
    import spark.implicits._
    val hot = (0 until 200000).map(i => (1L, i.toLong)) ++
      (0 until 1000).map(i => (2L + (i % 50).toLong, i.toLong))
    val left = hot.toDF("k", "payload")
    val right = (1L to 60L).map(k => (k, s"dim$k")).toDF("k", "label")
    withConfs(
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "2",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "64KB",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "64KB") {
      val joined = left.join(right, "k")
      // execute THIS QueryExecution (count() would plan a separate
      // query and leave this one's adaptive plan unfinalized)
      assert(joined.collect().length == 200000 + 1000)
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("skew=true"),
        s"expected a skew-split SMJ in the adaptive plan:\n$plan")
    }
  }
}
