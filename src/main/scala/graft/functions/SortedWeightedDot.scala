package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Sparse integer dot product Σ wa·wb over matching keys of two
  * ASC-SORTED packed `array<long>`s, as a zero-allocation two-pointer
  * merge — the weighted sibling of [[SortedIntersectCount]].
  *
  * Each element packs `(key << WEIGHT_BITS) | weight` with
  * `0 <= weight < 2^WEIGHT_BITS` and distinct keys per array, so
  * sorting by the packed long IS sorting by key and one primitive
  * comparison of the high bits drives the merge. Packing exists for
  * the same reason the intersect kernel dictionary-encodes: the
  * cosine verifier evaluates this once per candidate pair, and a
  * struct-array representation would allocate an InternalRow per
  * element access. Key budget: 43 bits (8T distinct tokens) on top of
  * 20 weight bits — a 100 TB vocabulary fits.
  */
case class SortedWeightedDot(left: Expression, right: Expression)
    extends BinaryExpression {

  import SortedWeightedDot.weightBits

  private def elemOk(dt: DataType): Boolean = dt match {
    case ArrayType(LongType, _) => true
    case _ => false
  }

  override def checkInputDataTypes(): TypeCheckResult =
    if (elemOk(left.dataType) && elemOk(right.dataType))
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"sorted_weighted_dot expects two array<long>, got " +
        s"(${left.dataType.simpleString}, ${right.dataType.simpleString})")

  override def dataType: DataType = LongType
  override def prettyName: String = "sorted_weighted_dot"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    val m = y.numElements()
    val mask = (1L << weightBits) - 1L
    var i = 0
    var j = 0
    var acc = 0L
    while (i < n && j < m) {
      val xv = x.getLong(i)
      val yv = y.getLong(j)
      val xk = xv >>> weightBits
      val yk = yv >>> weightBits
      if (xk == yk) { acc += (xv & mask) * (yv & mask); i += 1; j += 1 }
      else if (xk < yk) i += 1
      else j += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val n = ctx.freshName("n")
      val m = ctx.freshName("m")
      val acc = ctx.freshName("acc")
      val xv = ctx.freshName("xv")
      val yv = ctx.freshName("yv")
      val xk = ctx.freshName("xk")
      val yk = ctx.freshName("yk")
      val mask = (1L << weightBits) - 1L
      s"""
         |int $n = $a.numElements();
         |int $m = $b.numElements();
         |int $i = 0; int $j = 0; long $acc = 0L;
         |while ($i < $n && $j < $m) {
         |  long $xv = $a.getLong($i);
         |  long $yv = $b.getLong($j);
         |  long $xk = $xv >>> $weightBits;
         |  long $yk = $yv >>> $weightBits;
         |  if ($xk == $yk) {
         |    $acc += ($xv & ${mask}L) * ($yv & ${mask}L); $i++; $j++;
         |  } else if ($xk < $yk) { $i++; } else { $j++; }
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object SortedWeightedDot {
  import org.apache.spark.sql.GraftBridge

  /** Low bits of each packed element that hold the weight. */
  val weightBits = 20

  def sorted_weighted_dot(a: Column, b: Column): Column =
    GraftBridge.column(SortedWeightedDot(
      GraftBridge.expression(a), GraftBridge.expression(b)))

  /** Pack a (key, weight) pair for the kernel; callers guarantee
    * `0 <= weight < 2^weightBits`. */
  def pack(key: Column, weight: Column): Column =
    org.apache.spark.sql.functions.shiftleft(key, weightBits) + weight
}
