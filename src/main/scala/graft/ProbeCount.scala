package graft
object ProbeCount {
  def main(args: Array[String]): Unit = {
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master("local[32]").config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.ansi.enabled", "false")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val n = operators.Dedup.setSimQuery(spark, "/root/testdata/sf0.1").count()
    println(s"[probe] setsim pairs sf0.1 = $n")
    spark.stop()
  }
}
