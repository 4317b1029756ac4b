package graft

import org.apache.spark.sql.SparkSession

/** Dev tool: dump formatted physical plans for the query surface so the
  * scan pruning / pushdown / broadcast / codegen shape can be audited.
  * Usage: runMain graft.Explain <sfDir> [queryName ...] */
object Explain {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val names = if (args.length > 1) args.drop(1).toSeq
      else SparkEntry.queries.keys.toSeq.sorted
    val spark = SparkSession.builder()
      .master(Conf.master("4"))
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.ansi.enabled", "false")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    names.foreach { n =>
      println(s"\n===================== $n =====================")
      // lazyPlans: see PlanDump — inspect the computing plan, not the
      // checkpoint scan, and don't execute the gate to explain it
      try println(Conf.withConf(spark, "spark.graft.internal.lazyPlans", "true") {
        SparkEntry.queries(n)(spark, sfDir)
          .queryExecution.explainString(
            org.apache.spark.sql.execution.FormattedMode)
      })
      catch { case e: Throwable => println(s"explain failed: ${e.getMessage}") }
      finally spark.catalog.clearCache() // lazyPlans skips the gates' own release
    }
    spark.stop()
  }
}
