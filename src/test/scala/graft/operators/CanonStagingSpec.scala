package graft.operators

import org.scalatest.funsuite.AnyFunSuite

/** [[Dedup.ensureCanonicalStaging]] contract: built once per corpus,
  * reused verbatim while the corpus file is unchanged, and re-staged
  * when it changes — the invalidation rule that keeps the
  * `dedup_canonical_incremental` gate honest across driver rounds
  * where /root/testdata is regenerated (same path, new bytes). */
class CanonStagingSpec extends AnyFunSuite {
  private val spark = graft.SparkTestSession.spark

  /** A private corpus dir this spec owns (staging keys include the
    * corpus file's mtime, so mutating the shared testdata is not an
    * option — and writing outside /tmp is banned anyway). */
  private def freshCorpusDir(): java.io.File = {
    val d = java.nio.file.Files.createTempDirectory("graft_canonstage_corpus").toFile
    val src = new java.io.File(s"${graft.SparkTestSession.sf}/documents.parquet")
    java.nio.file.Files.copy(src.toPath,
      new java.io.File(d, "documents.parquet").toPath)
    d
  }

  test("staging is idempotent per corpus and invalidates on corpus change") {
    val dir = freshCorpusDir()
    val corpus = new java.io.File(dir, "documents.parquet")
    try {
      val p1 = Dedup.ensureCanonicalStaging(spark, dir.getAbsolutePath)
      assert(java.nio.file.Files.exists(p1.resolve("_DONE")))
      assert(java.nio.file.Files.exists(p1.resolve("base_labels.parquet")))
      assert(java.nio.file.Files.exists(p1.resolve("pref.parquet")))
      assert(java.nio.file.Files.exists(p1.resolve("doctoks.parquet")))
      val builtAt = java.nio.file.Files
        .getLastModifiedTime(p1.resolve("_DONE")).toMillis
      // second call: same staging, nothing rebuilt
      val p2 = Dedup.ensureCanonicalStaging(spark, dir.getAbsolutePath)
      assert(p2 == p1, "staging rebuilt for an unchanged corpus")
      assert(java.nio.file.Files
        .getLastModifiedTime(p1.resolve("_DONE")).toMillis == builtAt)
      // the stored base covers exactly the <= cut docs of the corpus
      val cut = new String(java.nio.file.Files
        .readAllBytes(p1.resolve("cut"))).trim.toLong
      val nBase = spark.read.parquet(s"$dir/documents.parquet")
        .filter(org.apache.spark.sql.functions.col("doc_id") <= cut).count()
      assert(spark.read.parquet(p1.resolve("base_labels.parquet").toString)
        .count() == nBase)
      // corpus regenerated in place (same path, new mtime) -> new key
      assert(corpus.setLastModified(corpus.lastModified() + 60000L))
      val p3 = Dedup.ensureCanonicalStaging(spark, dir.getAbsolutePath)
      assert(p3 != p1, "staging not invalidated by a corpus change")
      assert(java.nio.file.Files.exists(p3.resolve("_DONE")))
    } finally {
      def rm(f: java.io.File): Unit = {
        val cs = f.listFiles(); if (cs != null) cs.foreach(rm); f.delete(); ()
      }
      rm(dir)
      spark.catalog.clearCache()
    }
  }
}
