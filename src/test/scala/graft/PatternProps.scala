package graft

import graft.streaming.{PatState, StreamPattern}
import org.scalacheck.{Gen, Properties}
import org.scalacheck.Prop.forAll

/** The streaming CEP operator is sound iff its automaton fold is
  * (a) equal to the batch regex count on the whole string and
  * (b) invariant under ANY micro-batch chunking — state composition
  * across triggers must lose nothing. Pure-JVM properties over random
  * event strings and random split points; no Spark session needed. */
object PatternProps extends Properties("StreamPattern.automaton") {

  private val pattern = "c[^ep]*p".r

  private def fold(chars: Seq[String]): PatState =
    chars.foldLeft(PatState(0L, 0L, false))(StreamPattern.step)

  val eventGen: Gen[String] = Gen.oneOf("c", "e", "p", "v", "s")
  val seqGen: Gen[List[String]] = Gen.listOfN(60, eventGen)
    .flatMap(l => Gen.choose(0, 60).map(l.take))

  property("fold equals the regex count and sees every event") = forAll(seqGen) { evs =>
    val st = fold(evs)
    st.nConv == pattern.findAllIn(evs.mkString).length &&
      st.nEvents == evs.length
  }

  property("fold is chunking-invariant") =
    forAll(seqGen, Gen.choose(0, 60), Gen.choose(0, 60)) { (evs, a, b) =>
      val Seq(i, j) = Seq(a, b).map(math.min(_, evs.length)).sorted
      val chunked = Seq(evs.take(i), evs.slice(i, j), evs.drop(j))
        .foldLeft(PatState(0L, 0L, false)) { (st, chunk) =>
          chunk.foldLeft(st)(StreamPattern.step)
        }
      chunked == fold(evs)
    }
}
