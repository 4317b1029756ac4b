package graft

import graft.operators.Multimodal
import org.scalacheck.{Gen, Properties}
import org.scalacheck.Prop.forAll

/** Pure-JVM properties of the 64-cell average hash — the algebraic
  * guarantees the `multimodal_phash_pairs` gate builds on. */
object AHashProps extends Properties("Multimodal.aHash64") {

  private val payloads: Gen[Array[Byte]] = for {
    n <- Gen.chooseNum(1, 4096)
    bytes <- Gen.containerOfN[Array, Byte](n, Gen.chooseNum(0, 200).map(_.toByte))
  } yield bytes

  property("equals a BigInt reference (no Long overflow anywhere)") =
    forAll(payloads) { p =>
      val n = p.length
      val sums = Array.fill(64)(BigInt(0))
      val cnts = Array.fill(64)(0L)
      p.zipWithIndex.foreach { case (b, i) =>
        val j = (64L * i / n).toInt
        sums(j) += (b & 0xff); cnts(j) += 1
      }
      val total = sums.sum
      var ref = 0L
      (0 until 64).foreach { j =>
        if (cnts(j) > 0 && sums(j) * n >= total * cnts(j)) ref |= 1L << j
      }
      Multimodal.aHash64(p) == ref
    }

  // the defining aHash property: adding a constant to every pixel
  // moves each cell average and the global mean by the same amount, so
  // every threshold comparison — and the hash — is unchanged
  property("invariant under uniform brightness shift") =
    forAll(for {
      p <- payloads
      c <- Gen.chooseNum(1, 55) // bytes capped at 200, so no wrap
    } yield (p, p.map(b => ((b & 0xff) + c).toByte))) { case (p, q) =>
      Multimodal.aHash64(p) == Multimodal.aHash64(q)
    }

  property("hi/lo split round-trips and both halves are non-negative") =
    forAll(payloads) { p =>
      val h = Multimodal.aHash64(p)
      ((h >>> 32) << 32 | (h & 0xFFFFFFFFL)) == h &&
        (h >>> 32) >= 0 && (h & 0xFFFFFFFFL) >= 0
    }
}
