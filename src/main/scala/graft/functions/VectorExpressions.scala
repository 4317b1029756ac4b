package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}
import org.apache.spark.sql.SparkSession

/** Native Catalyst expression for cosine similarity over two
  * `array<double>` columns.
  *
  * Rationale (SURVEY.md §4.3): Spark's higher-order functions evaluate
  * lambdas interpreted (CodegenFallback), and a Scala UDF pays
  * serialization per row. A `BinaryExpression` with `doGenCode` emits a
  * tight Java loop inside whole-stage codegen — the preferred extension
  * point when built-ins can't express the kernel. Accumulation is
  * left-to-right, matching the sequential-fold semantics used
  * everywhere else (and the DuckDB oracle).
  */
case class CosineSimilarity(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = {
    val ok = Seq(left, right).forall(_.dataType match {
      case ArrayType(DoubleType, _) => true
      case _ => false
    })
    if (ok) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"cosine_sim expects (array<double>, array<double>), got " +
        s"(${left.dataType.simpleString}, ${right.dataType.simpleString})")
  }
  override def dataType: DataType = DoubleType
  override def prettyName: String = "cosine_sim"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var dot = 0.0; var na = 0.0; var nb = 0.0; var i = 0
    while (i < n) {
      val xi = x.getDouble(i); val yi = y.getDouble(i)
      dot += xi * yi; na += xi * xi; nb += yi * yi
      i += 1
    }
    dot / (math.sqrt(na) * math.sqrt(nb))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val dot = ctx.freshName("dot")
      val na = ctx.freshName("na")
      val nb = ctx.freshName("nb")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $dot = 0.0; double $na = 0.0; double $nb = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  double x = $a.getDouble($i);
         |  double y = $b.getDouble($i);
         |  $dot += x * y; $na += x * x; $nb += y * y;
         |}
         |${ev.value} = $dot / (java.lang.Math.sqrt($na) * java.lang.Math.sqrt($nb));
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Native dot product over two `array<double>` columns — same
  * left-to-right accumulation as [[CosineSimilarity]]. Exists because
  * an unrolled per-element sum over a 64-dim vector repeated per
  * hyperplane blows past Janino's method-size limit (observed: the
  * 24-hyperplane LSH signature projection failed to compile and fell
  * back to interpreted); a loop in one compact expression stays inside
  * whole-stage codegen at any width. */
case class DotProduct(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = {
    val ok = Seq(left, right).forall(_.dataType match {
      case ArrayType(DoubleType, _) => true
      case _ => false
    })
    if (ok) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"dot_product expects (array<double>, array<double>), got " +
        s"(${left.dataType.simpleString}, ${right.dataType.simpleString})")
  }
  override def dataType: DataType = DoubleType
  override def prettyName: String = "dot_product"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var dot = 0.0; var i = 0
    while (i < n) { dot += x.getDouble(i) * y.getDouble(i); i += 1 }
    dot
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val dot = ctx.freshName("dot")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $dot = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $dot += $a.getDouble($i) * $b.getDouble($i);
         |}
         |${ev.value} = $dot;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Nearest-centroid assignment as ONE compact loop expression: returns
  * the id of the centroid with the highest cosine similarity to the
  * input vector (ties and NaNs resolved exactly like Spark's struct-max
  * — `java.lang.Double.compare` treats NaN as largest and equal sims
  * keep the first, i.e. smallest, centroid id, because `centIds` is
  * sorted ascending).
  *
  * Exists because the expression-tree formulation (k `cosine_sim` calls
  * + `array_max` over k structs) generates a fresh multi-kilobyte
  * codegen class per centroid TABLE — and k-means assignment builds a
  * new centroid table every Lloyd round, so each round paid a full
  * Janino compile. The centroid matrix here is an opaque reference
  * object (not inlined literals), the generated code is one short
  * double loop regardless of k, and per-row work is identical:
  * k fused dot/norm loops. Accumulation is left-to-right per array,
  * and the combine is `dot / (sqrt(na) * sqrt(nc))` — bit-identical to
  * [[CosineSimilarity]] per centroid, so results (and the DuckDB
  * oracle) are unchanged. */
case class NearestCentroid(child: Expression, centIds: Array[Long],
    cents: Array[Array[Double]])
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {

  // per-centroid squared norms, same left-to-right accumulation as the
  // nb loop in CosineSimilarity
  private lazy val centNorms2: Array[Double] = cents.map { c =>
    var nb = 0.0; var i = 0
    while (i < c.length) { nb += c(i) * c(i); i += 1 }
    nb
  }

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"nearest_centroid expects array<double>, got ${other.simpleString}")
  }
  override def dataType: DataType = org.apache.spark.sql.types.LongType
  override def prettyName: String = "nearest_centroid"

  private def assign(x: ArrayData): Long = {
    var na = 0.0
    var i = 0
    val n = x.numElements()
    while (i < n) { val xi = x.getDouble(i); na += xi * xi; i += 1 }
    var bestSim = Double.NegativeInfinity
    var bestId = -1L
    var k = 0
    while (k < cents.length) {
      val c = cents(k)
      val m = math.min(n, c.length)
      var dot = 0.0
      i = 0
      while (i < m) { dot += x.getDouble(i) * c(i); i += 1 }
      val sim = dot / (math.sqrt(na) * math.sqrt(centNorms2(k)))
      if (java.lang.Double.compare(sim, bestSim) > 0) {
        bestSim = sim; bestId = centIds(k)
      }
      k += 1
    }
    bestId
  }

  override def nullSafeEval(a: Any): Any = assign(a.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cRef = ctx.addReferenceObj("cents", cents, "double[][]")
    val nRef = ctx.addReferenceObj("centNorms2", centNorms2, "double[]")
    val idRef = ctx.addReferenceObj("centIds", centIds, "long[]")
    nullSafeCodeGen(ctx, ev, a => {
      val i = ctx.freshName("i")
      val k = ctx.freshName("k")
      val n = ctx.freshName("n")
      val m = ctx.freshName("m")
      val na = ctx.freshName("na")
      val dot = ctx.freshName("dot")
      val sim = ctx.freshName("sim")
      val bestSim = ctx.freshName("bestSim")
      val bestId = ctx.freshName("bestId")
      val c = ctx.freshName("c")
      s"""
         |int $n = $a.numElements();
         |double $na = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  double x = $a.getDouble($i); $na += x * x;
         |}
         |double $bestSim = Double.NEGATIVE_INFINITY;
         |long $bestId = -1L;
         |for (int $k = 0; $k < $cRef.length; $k++) {
         |  double[] $c = $cRef[$k];
         |  int $m = java.lang.Math.min($n, $c.length);
         |  double $dot = 0.0;
         |  for (int $i = 0; $i < $m; $i++) {
         |    $dot += $a.getDouble($i) * $c[$i];
         |  }
         |  double $sim = $dot
         |    / (java.lang.Math.sqrt($na) * java.lang.Math.sqrt($nRef[$k]));
         |  if (java.lang.Double.compare($sim, $bestSim) > 0) {
         |    $bestSim = $sim; $bestId = $idRef[$k];
         |  }
         |}
         |${ev.value} = $bestId;
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object VectorExpressions {
  import org.apache.spark.sql.GraftBridge

  /** Column-API entry point. */
  def cosine_sim(a: Column, b: Column): Column =
    GraftBridge.column(CosineSimilarity(
      GraftBridge.expression(a), GraftBridge.expression(b)))

  /** Nearest-centroid id by cosine similarity; `cents` must be sorted
    * by id ascending for the smallest-id tie-break. */
  def nearest_centroid(v: Column, cents: Seq[(Long, Seq[Double])]): Column =
    GraftBridge.column(NearestCentroid(GraftBridge.expression(v),
      cents.map(_._1).toArray, cents.map(_._2.toArray).toArray))

  def dot_product(a: Column, b: Column): Column =
    GraftBridge.column(DotProduct(
      GraftBridge.expression(a), GraftBridge.expression(b)))

  /** SQL registration: SELECT cosine_sim(a, b) / dot_product(a, b) ... */
  def register(spark: SparkSession): Unit = {
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "cosine_sim", exprs => CosineSimilarity(exprs(0), exprs(1)), "scala_udf")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "dot_product", exprs => DotProduct(exprs(0), exprs(1)), "scala_udf")
  }
}
