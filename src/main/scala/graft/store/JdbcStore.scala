package graft.store

import org.apache.spark.sql.{DataFrame, SparkSession}

/** JDBC storage variant for the reference's Postgres-backed tables
  * (reference/docker-compose.yml:4-18): a relational scan source and a
  * keyed upsert sink over any JDBC store, completing storage parity
  * with the lakehouse-native path in [[Catalog]]/[[graft.operators.Upsert]].
  *
  * Scale design:
  *  - reads go through `spark.read.jdbc`; the partitioned form issues
  *    one range-bounded query per task so a large table scan is
  *    parallel instead of a single-connection drain;
  *  - writes are `foreachPartition` batches — one connection per
  *    partition, update-else-insert per key (the portable upsert;
  *    vendor-specific `MERGE`/`ON CONFLICT` slots into `upsertSql`
  *    unchanged). Batches are bounded, nothing collects to the driver.
  * The embedded Derby driver shipped with Spark is the offline test
  * harness; against a real networked store only the URL changes.
  */
object JdbcStore {

  /** Relational scan (S3 variant): the whole table as one partition —
    * fine for dimension-sized tables; use [[scanPartitioned]] for facts. */
  def scan(spark: SparkSession, url: String, table: String): DataFrame =
    spark.read.format("jdbc")
      .option("url", url).option("dbtable", table).load()

  /** Parallel relational scan: `numPartitions` range-bounded queries on
    * a numeric/timestamp `partitionColumn` — one per task. */
  def scanPartitioned(spark: SparkSession, url: String, table: String,
      partitionColumn: String, lowerBound: Long, upperBound: Long,
      numPartitions: Int): DataFrame =
    spark.read.format("jdbc")
      .option("url", url).option("dbtable", table)
      .option("partitionColumn", partitionColumn)
      .option("lowerBound", lowerBound.toString)
      .option("upperBound", upperBound.toString)
      .option("numPartitions", numPartitions.toString)
      .load()

  /** Keyed upsert (K1 variant): per-partition connections, batched
    * update-else-insert on `keys`. Last writer wins per key, matching
    * [[graft.operators.Upsert.upsert]] semantics for a batch whose keys
    * are unique (the pipeline dedupes per batch before writing). */
  def upsert(df: DataFrame, url: String, table: String,
      keys: Seq[String], batchSize: Int = 500): Unit = {
    val schema = df.schema
    val cols = schema.fieldNames.toSeq
    val nonKeys = cols.filterNot(keys.contains)
    val updateSql =
      s"UPDATE $table SET ${nonKeys.map(c => s"$c = ?").mkString(", ")} " +
        s"WHERE ${keys.map(c => s"$c = ?").mkString(" AND ")}"
    val insertSql =
      s"INSERT INTO $table (${cols.mkString(", ")}) " +
        s"VALUES (${cols.map(_ => "?").mkString(", ")})"
    val colIdx = cols.zipWithIndex.toMap
    df.foreachPartition { rows: Iterator[org.apache.spark.sql.Row] =>
      val conn = java.sql.DriverManager.getConnection(url)
      try {
        conn.setAutoCommit(false)
        val upd = conn.prepareStatement(updateSql)
        val ins = conn.prepareStatement(insertSql)
        var inBatch = 0
        rows.foreach { row =>
          nonKeys.zipWithIndex.foreach { case (c, i) =>
            upd.setObject(i + 1, row.get(colIdx(c)))
          }
          keys.zipWithIndex.foreach { case (c, i) =>
            upd.setObject(nonKeys.length + i + 1, row.get(colIdx(c)))
          }
          if (upd.executeUpdate() == 0) {
            cols.zipWithIndex.foreach { case (c, i) =>
              ins.setObject(i + 1, row.get(colIdx(c)))
            }
            ins.executeUpdate()
          }
          inBatch += 1
          if (inBatch >= batchSize) { conn.commit(); inBatch = 0 }
        }
        conn.commit()
        upd.close(); ins.close()
      } finally conn.close()
    }
  }

  /** DDL helper for the test harness / bootstrap parity with
    * [[Catalog.bootstrap]]. */
  def execute(url: String, sql: String): Unit = {
    val conn = java.sql.DriverManager.getConnection(url)
    try {
      val st = conn.createStatement()
      try st.executeUpdate(sql) finally st.close()
    } finally conn.close()
  }
}
