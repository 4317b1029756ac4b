package graft

import graft.operators.TrainPrep
import org.scalacheck.{Gen, Properties, Test}
import org.scalacheck.Prop.forAll

/** Model-based property test: the distributed greedy packer must agree
  * with a trivial sequential reference fold on arbitrary corpora,
  * budgets, and shard counts — including oversized docs, empty shards,
  * and budget-boundary token counts. Small sample count — each sample
  * runs a real Spark job. */
object TrainPrepProps extends Properties("TrainPrep.pack") {

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(8)

  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  // (doc_id, n_tokens) with ids sparse and counts straddling the budget
  val docGen: Gen[(Long, Int)] = for {
    id <- Gen.choose(0L, 500L)
    n <- Gen.frequency(
      (4, Gen.choose(1, 40)),
      (2, Gen.choose(41, 64)),   // budget is 64 below: boundary regime
      (1, Gen.choose(65, 150)))  // oversized
  } yield (id, n)

  val corpusGen: Gen[List[(Long, Int)]] =
    Gen.listOfN(40, docGen).map(_.distinctBy(_._1))

  property("matches the sequential reference fold for any corpus") =
    forAll(corpusGen, Gen.choose(1L, 5L)) { (corpus, shards) =>
      val budget = 64L
      val docs = corpus
        .map { case (id, n) => (id, Seq.fill(n)("w").mkString(" ")) }
        .toDF("doc_id", "text")
      val got = TrainPrep.packSequences(docs, budget, shards).collect()
        .map(p => p.doc_id -> (p.shard, p.bin_id, p.n_tokens)).toMap
      val model = corpus.groupBy { case (id, _) => id % shards }
        .flatMap { case (shard, members) =>
          var bin = 0L; var cum = 0L
          members.sortBy(_._1).map { case (id, n) =>
            if (cum > 0 && cum + n > budget) { bin += 1; cum = 0L }
            cum += n
            id -> (shard, bin, n.toLong)
          }
        }
      got == model
    }
}
