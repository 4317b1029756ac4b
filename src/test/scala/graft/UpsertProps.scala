package graft

import graft.operators.Upsert
import org.scalacheck.{Gen, Properties, Test}
import org.scalacheck.Prop.forAll

/** Model-based property test: the distributed upsert must agree with a
  * trivial in-memory reference model (last-writer-wins map fold) on
  * arbitrary batches, and be idempotent. Small sample count — each
  * sample runs a real Spark job. */
object UpsertProps extends Properties("Upsert") {

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(8)

  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  val rowGen: Gen[(Long, Double, String)] = for {
    k <- Gen.choose(0L, 6L)
    v <- Gen.choose(0, 1000).map(_.toDouble)
    s <- Gen.oneOf("A", "B", "C")
  } yield (k, v, s)

  val batchGen: Gen[List[(Long, Double, String)]] =
    Gen.listOfN(8, rowGen).map(_.distinctBy(_._1)) // unique keys per batch

  property("matches in-memory last-writer-wins model") =
    forAll(batchGen, batchGen) { (cur, bat) =>
      val curDf = cur.toDF("k", "v", "s")
      val batDf = bat.toDF("k", "v", "s")
      val got = Upsert.upsert(curDf, batDf, Seq("k"), Seq("s"))
        .collect().map(r => (r.getLong(0), r.getDouble(1), r.getString(2)))
        .toSet
      val curM = cur.map(t => t._1 -> t).toMap
      val batM = bat.map(t => t._1 -> t).toMap
      val model = (curM.keySet ++ batM.keySet).map { k =>
        val newest = batM.getOrElse(k, curM(k))         // last writer wins
        val first = curM.getOrElse(k, batM(k))          // preserve col
        (k, newest._2, first._3)
      }
      got == model
    }

  property("idempotent under batch replay") =
    forAll(batchGen, batchGen) { (cur, bat) =>
      val curDf = cur.toDF("k", "v", "s")
      val batDf = bat.toDF("k", "v", "s")
      val once = Upsert.upsert(curDf, batDf, Seq("k"), Seq("s"))
      val twice = Upsert.upsert(once, batDf, Seq("k"), Seq("s"))
      twice.exceptAll(once).isEmpty && once.exceptAll(twice).isEmpty
    }
}
