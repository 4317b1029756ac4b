package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, LongType}

/** Product-quantization encoder: maps an `array<double>` vector to its
  * PQ code word — for each of S contiguous subspaces, the index of the
  * nearest codebook entry by squared L2 distance (Jégou et al.,
  * "Product Quantization for Nearest Neighbor Search", TPAMI 2011).
  *
  * This is the memory-side half of PQ-ANN: a Dim-double vector
  * (512 bytes at Dim=64) compresses to S small integers, so a 100 TB
  * embedding corpus's search structure fits in a fraction of the
  * footprint and the ADC scan streams codes, not vectors.
  *
  * Same design rationale as [[NearestCentroid]]: the codebook rides
  * along as an opaque reference object (never inlined literals), the
  * generated code is three short loops regardless of S*K, and argmin
  * accumulation is left-to-right with a strict `<` so ties keep the
  * smallest code — bit-reproducible in the DuckDB oracle.
  *
  * `codebook(s)(k)(d)`: S subspaces x K codes x dsub dims; subspace s
  * covers input dims [s*dsub, (s+1)*dsub).
  */
case class PqEncode(child: Expression, codebook: Array[Array[Array[Double]]])
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"pq_encode expects array<double>, got ${other.simpleString}")
  }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "pq_encode"

  private def encode(x: ArrayData): GenericArrayData = {
    val s = codebook.length
    val out = new Array[Long](s)
    var si = 0
    while (si < s) {
      val cb = codebook(si)
      val dsub = cb(0).length
      val off = si * dsub
      var best = Double.PositiveInfinity
      var bestK = -1L
      var k = 0
      while (k < cb.length) {
        val c = cb(k)
        var d2 = 0.0
        var d = 0
        while (d < dsub) {
          val t = x.getDouble(off + d) - c(d)
          d2 += t * t
          d += 1
        }
        if (java.lang.Double.compare(d2, best) < 0) { best = d2; bestK = k }
        k += 1
      }
      out(si) = bestK
      si += 1
    }
    new GenericArrayData(out)
  }

  override def nullSafeEval(a: Any): Any = encode(a.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cbRef = ctx.addReferenceObj("pqCodebook", codebook, "double[][][]")
    nullSafeCodeGen(ctx, ev, a => {
      val out = ctx.freshName("out")
      val si = ctx.freshName("si")
      val k = ctx.freshName("k")
      val d = ctx.freshName("d")
      val cb = ctx.freshName("cb")
      val c = ctx.freshName("c")
      val off = ctx.freshName("off")
      val best = ctx.freshName("best")
      val bestK = ctx.freshName("bestK")
      val d2 = ctx.freshName("d2")
      val t = ctx.freshName("t")
      s"""
         |long[] $out = new long[$cbRef.length];
         |for (int $si = 0; $si < $cbRef.length; $si++) {
         |  double[][] $cb = $cbRef[$si];
         |  int $off = $si * $cb[0].length;
         |  double $best = Double.POSITIVE_INFINITY;
         |  long $bestK = -1L;
         |  for (int $k = 0; $k < $cb.length; $k++) {
         |    double[] $c = $cb[$k];
         |    double $d2 = 0.0;
         |    for (int $d = 0; $d < $c.length; $d++) {
         |      double $t = $a.getDouble($off + $d) - $c[$d];
         |      $d2 += $t * $t;
         |    }
         |    if (java.lang.Double.compare($d2, $best) < 0) {
         |      $best = $d2; $bestK = $k;
         |    }
         |  }
         |  $out[$si] = $bestK;
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object PqEncode {
  import org.apache.spark.sql.GraftBridge

  /** Column-API entry point. */
  def pq_encode(v: Column, codebook: Array[Array[Array[Double]]]): Column =
    GraftBridge.column(PqEncode(GraftBridge.expression(v), codebook))
}
