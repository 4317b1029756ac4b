package graft

import graft.operators.Multimodal
import org.scalatest.funsuite.AnyFunSuite

class MultimodalSpec extends AnyFunSuite {

  test("audio windows tile every asset: full cover, stride-aligned, clamped") {
    val spark = SparkTestSession.spark
    val out = graft.operators.Multimodal
      .audioWindows(spark, SparkTestSession.sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4)))
    assert(out.nonEmpty)
    val st = graft.operators.Multimodal.audioStrideMs
    val wd = graft.operators.Multimodal.audioWinMs
    out.groupBy(_._1).foreach { case (id, ws) =>
      val d = ws.head._2
      val sorted = ws.sortBy(_._3)
      // dense indices, stride-aligned starts, clamped ends, full cover
      assert(sorted.map(_._3).toSeq == sorted.indices.map(_.toLong))
      sorted.foreach { case (_, _, i, s, e) =>
        assert(s == i * st && e == math.min(s + wd, d) && s < d)
      }
      assert(sorted.last._5 == d, s"asset $id last window must reach the end")
      assert(sorted.last._4 + st >= d, s"asset $id no missing final window")
    }
  }

  lazy val spark = SparkTestSession.spark

  test("decode stub derives metadata deterministically from payload bytes") {
    val a = Multimodal.Asset(7L, "video", "hello world".getBytes("UTF-8"))
    val m1 = Multimodal.decodeStub(a)
    val m2 = Multimodal.decodeStub(a)
    assert(m1 == m2)
    assert(m1.byte_len == 11 && m1.kind == "video" && m1.n_frames == 11 % 5 + 2)
  }

  test("featurizer emits an L1-normalized 16-bucket histogram") {
    val f = Multimodal.featurizeStub("abcabc".getBytes("UTF-8"))
    assert(f.length == 16)
    assert(math.abs(f.sum - 1.0) < 1e-12)
    // 'a'(97)/'b'(98)/'c'(99) all land in bucket 6
    assert(f(6) == 1.0)
  }

  test("feature knn returns same-kind neighbors with ranks 1..3") {
    val rows = Multimodal.featureKnn(spark, SparkTestSession.sf).collect()
    assert(rows.nonEmpty)
    assert(rows.forall(r => r.getLong(3) >= 1 && r.getLong(3) <= 3))
    val kinds = Set("image", "audio", "video")
    assert(rows.forall(r => kinds.contains(r.getString(2))))
  }

  test("resize plan: fits the box, preserves aspect within floor error, never upscales") {
    val rows = Multimodal.resizePlan(SparkTestSession.spark, SparkTestSession.sf)
      .collect()
      .map(r => (r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5),
        r.getLong(6)))
    assert(rows.nonEmpty)
    for ((w, h, ow, oh, ob) <- rows) {
      assert(ow <= Multimodal.thumbBox && oh <= Multimodal.thumbBox)
      assert(ow <= w && oh <= h, "upscaled")
      assert(ob == ow * oh * 3)
      if (math.max(w, h) > Multimodal.thumbBox) {
        // floor-scaled: out = floor(in * box / longSide), 1px floor
        val ls = math.max(w, h)
        assert(ow == math.max(1L, w * Multimodal.thumbBox / ls))
        assert(oh == math.max(1L, h * Multimodal.thumbBox / ls))
      } else assert(ow == w && oh == h)
    }
    // the corpus actually exercises the downscale branch
    assert(rows.exists { case (w, h, _, _, _) =>
      math.max(w, h) > Multimodal.thumbBox })
  }
}
