package graft

import graft.operators.Multimodal
import org.scalatest.funsuite.AnyFunSuite

class MultimodalSpec extends AnyFunSuite {
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
}
