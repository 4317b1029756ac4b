package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/** Total squared L2 reconstruction error of a vector under a PQ
  * codebook: Σ over subspaces of the distance to the NEAREST codebook
  * entry — i.e. what [[PqEncode]] loses. The standard quantizer-quality
  * metric (average it over the corpus to pick S/K or decide retraining;
  * per-vector outliers mark points the codebook cannot represent —
  * often drift or garbage).
  *
  * Same shape as [[PqEncode]] (reference-object codebook, short
  * generated loops, left-to-right accumulation, strict `<` argmin) but
  * emits the minimal distances' ordered sum instead of the argmin
  * indices, so the DuckDB oracle reproduces it as an s0..s7 fold over
  * per-subspace minima. One map-side pass, no joins, no shuffle.
  */
case class PqReconError(child: Expression, codebook: Array[Array[Array[Double]]])
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"pq_recon_error expects array<double>, got ${other.simpleString}")
  }
  override def dataType: DataType = DoubleType
  override def prettyName: String = "pq_recon_error"

  private def error(x: ArrayData): Double = {
    var err = 0.0
    var si = 0
    while (si < codebook.length) {
      val cb = codebook(si)
      val dsub = cb(0).length
      val off = si * dsub
      var best = Double.PositiveInfinity
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
        if (java.lang.Double.compare(d2, best) < 0) best = d2
        k += 1
      }
      err += best
      si += 1
    }
    err
  }

  override def nullSafeEval(a: Any): Any = error(a.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cbRef = ctx.addReferenceObj("pqCodebook", codebook, "double[][][]")
    nullSafeCodeGen(ctx, ev, a => {
      val err = ctx.freshName("err")
      val si = ctx.freshName("si")
      val k = ctx.freshName("k")
      val d = ctx.freshName("d")
      val cb = ctx.freshName("cb")
      val c = ctx.freshName("c")
      val off = ctx.freshName("off")
      val best = ctx.freshName("best")
      val d2 = ctx.freshName("d2")
      val t = ctx.freshName("t")
      s"""
         |double $err = 0.0;
         |for (int $si = 0; $si < $cbRef.length; $si++) {
         |  double[][] $cb = $cbRef[$si];
         |  int $off = $si * $cb[0].length;
         |  double $best = Double.POSITIVE_INFINITY;
         |  for (int $k = 0; $k < $cb.length; $k++) {
         |    double[] $c = $cb[$k];
         |    double $d2 = 0.0;
         |    for (int $d = 0; $d < $c.length; $d++) {
         |      double $t = $a.getDouble($off + $d) - $c[$d];
         |      $d2 += $t * $t;
         |    }
         |    if (java.lang.Double.compare($d2, $best) < 0) { $best = $d2; }
         |  }
         |  $err += $best;
         |}
         |${ev.value} = $err;
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object PqReconError {
  import org.apache.spark.sql.GraftBridge

  def pq_recon_error(v: Column, codebook: Array[Array[Array[Double]]]): Column =
    GraftBridge.column(PqReconError(GraftBridge.expression(v), codebook))
}
