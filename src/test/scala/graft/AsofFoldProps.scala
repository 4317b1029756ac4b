package graft

import graft.streaming.{AsofEvent, AsofViewState, StreamAsof}
import org.scalacheck.{Gen, Properties}
import org.scalacheck.Prop.forAll

/** The streaming as-of operator is sound iff its per-user fold is
  * (a) equal to a direct latest-prior-view scan over the whole history
  * and (b) invariant under ANY micro-batch chunking — the O(1) view
  * state composed across triggers must lose nothing. Pure-JVM
  * properties over random event sequences and random split points. */
object AsofFoldProps extends Properties("StreamAsof.fold") {

  private val init = AsofViewState(-1L, -1L, -1L)

  /** Random in-order event sequence: strictly increasing microsecond
    * stamps, random view/purchase sides, distinct ids. */
  val seqGen: Gen[List[AsofEvent]] = for {
    n <- Gen.choose(0, 50)
    sides <- Gen.listOfN(n, Gen.oneOf(0, 1))
    gaps <- Gen.listOfN(n, Gen.choose(1L, 5000000L))
  } yield {
    var us = 0L
    sides.zip(gaps).zipWithIndex.map { case ((side, g), i) =>
      us += g
      AsofEvent(7L, us, side, 1000L + i, us / 1000000L)
    }
  }

  private def direct(evs: List[AsofEvent]): List[(Long, Option[Long], Option[Long])] =
    evs.zipWithIndex.collect { case (p, i) if p.side == 1 =>
      val prior = evs.take(i).filter(_.side == 0).lastOption
      (p.event_id, prior.map(_.event_id), prior.map(v => p.sec - v.sec))
    }

  property("fold equals the direct latest-prior scan") = forAll(seqGen) { evs =>
    val (_, out) = StreamAsof.fold(init, evs)
    out.map(m => (m.purchase_id, m.view_id, m.gap_s)).toList == direct(evs)
  }

  property("fold is chunking-invariant") =
    forAll(seqGen, Gen.choose(0, 50), Gen.choose(0, 50)) { (evs, a, b) =>
      val Seq(i, j) = Seq(a, b).map(math.min(_, evs.length)).sorted
      val chunks = Seq(evs.take(i), evs.slice(i, j), evs.drop(j))
      val (stC, outC) = chunks.foldLeft((init, Seq.empty[graft.streaming.AsofMatch])) {
        case ((st, acc), chunk) =>
          val (st2, out) = StreamAsof.fold(st, chunk)
          (st2, acc ++ out)
      }
      val (stW, outW) = StreamAsof.fold(init, evs)
      stC == stW && outC == outW
    }
}
