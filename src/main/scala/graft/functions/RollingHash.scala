package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}

/** Rabin-Karp rolling hash over a token array: for an n-token input and
  * window width w, returns the `n - w + 1` hashes of every OVERLAPPING
  * w-token window in ONE O(n) pass — each slide is a subtract-multiply-
  * add, not a w-term recompute. This is the production kernel for
  * substring-level dedup ([[graft.operators.Dedup.substringDedupRolling]]):
  * the naive per-window formulation materializes and shuffles the
  * window TEXT (~w tokens per row), while this expression reduces every
  * window to 8 bytes before it leaves the scan — at 100 TB the shuffle
  * shrinks by the token width (~16x at w=16) and window generation
  * drops from O(n·w) to O(n).
  *
  * Two arithmetic modes, chosen by `modulus`:
  *  - `modulus > 0` — every step reduced mod `modulus` (< 2^31 so all
  *    intermediates fit a long). Per-token hashes use the same
  *    zero-padded 24-byte polynomial fold as
  *    [[graft.operators.Dedup.charPolyHash]], making the whole output
  *    bit-reproducible in the DuckDB oracle (byte == codepoint on
  *    ASCII corpora, same caveat as the multimodal byte histogram).
  *  - `modulus == 0` — arithmetic in the natural ring mod 2^64 (Java
  *    long wraparound; exact, not approximate), per-token hashes over
  *    ALL bytes. The production default: 64-bit collisions are
  *    negligible at corpus scale, where a 31-bit modulus is not.
  *
  * Window hash: Horner fold `h = h*mult + tokenHash` over the w token
  * hashes; slide drops `tokenHash[i] * mult^(w-1)` and folds in the
  * next token. The same recurrence at both widths keeps the codegen a
  * single loop body regardless of w.
  */
case class RollingHash(child: Expression, width: Int, mult: Long, modulus: Long)
    extends UnaryExpression {

  require(width >= 1, "width must be >= 1")
  require(modulus >= 0 && modulus < (1L << 31),
    "modulus must be 0 (mod-2^64 mode) or a positive int < 2^31")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"rolling_hash expects array<string>, got ${other.simpleString}")
  }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "rolling_hash"

  /** mult^(width-1) in the active ring — the drop-term factor. */
  private lazy val dropPow: Long = {
    var p = 1L
    var i = 1
    while (i < width) {
      p = if (modulus > 0) (p * mult) % modulus else p * mult
      i += 1
    }
    p
  }

  private def roll(arr: ArrayData): GenericArrayData = {
    val n = arr.numElements()
    if (n < width) return new GenericArrayData(Array.empty[Long])
    val th = new Array[Long](n)
    var i = 0
    if (modulus > 0) {
      while (i < n) {
        val s = arr.getUTF8String(i)
        val len = s.numBytes()
        var h = 0L
        var j = 0
        while (j < 24) { // zero-padded fixed width: mirrors charPolyHash
          val c = if (j < len) (s.getByte(j) & 0xffL) else 0L
          h = (h * mult + c) % modulus
          j += 1
        }
        th(i) = h
        i += 1
      }
    } else {
      while (i < n) {
        val s = arr.getUTF8String(i)
        val len = s.numBytes()
        var h = 0L
        var j = 0
        while (j < len) { h = h * mult + (s.getByte(j) & 0xffL); j += 1 }
        th(i) = h
        i += 1
      }
    }
    val out = new Array[Long](n - width + 1)
    var h = 0L
    var j = 0
    while (j < width) {
      h = if (modulus > 0) (h * mult + th(j)) % modulus else h * mult + th(j)
      j += 1
    }
    out(0) = h
    var k = 1
    while (k <= n - width) {
      h =
        if (modulus > 0)
          (Math.floorMod(h - th(k - 1) * dropPow % modulus, modulus) * mult
            + th(k + width - 1)) % modulus
        else (h - th(k - 1) * dropPow) * mult + th(k + width - 1)
      out(k) = h
      k += 1
    }
    new GenericArrayData(out)
  }

  override def nullSafeEval(a: Any): Any = roll(a.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val n = ctx.freshName("n")
      val th = ctx.freshName("th")
      val out = ctx.freshName("out")
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val k = ctx.freshName("k")
      val s = ctx.freshName("s")
      val len = ctx.freshName("len")
      val h = ctx.freshName("h")
      val c = ctx.freshName("c")
      val tokenHash =
        if (modulus > 0)
          s"""
             |    long $h = 0L;
             |    for (int $j = 0; $j < 24; $j++) {
             |      long $c = $j < $len ? ($s.getByte($j) & 0xffL) : 0L;
             |      $h = ($h * ${mult}L + $c) % ${modulus}L;
             |    }
           """.stripMargin
        else
          s"""
             |    long $h = 0L;
             |    for (int $j = 0; $j < $len; $j++) {
             |      $h = $h * ${mult}L + ($s.getByte($j) & 0xffL);
             |    }
           """.stripMargin
      val seed =
        if (modulus > 0) s"($h * ${mult}L + $th[$j]) % ${modulus}L"
        else s"$h * ${mult}L + $th[$j]"
      val slide =
        if (modulus > 0)
          s"""(java.lang.Math.floorMod(
             |      $h - $th[$k - 1] * ${dropPow}L % ${modulus}L, ${modulus}L)
             |      * ${mult}L + $th[$k + ${width - 1}]) % ${modulus}L""".stripMargin
        else s"($h - $th[$k - 1] * ${dropPow}L) * ${mult}L + $th[$k + ${width - 1}]"
      s"""
         |int $n = $a.numElements();
         |if ($n < $width) {
         |  ${ev.value} =
         |    new org.apache.spark.sql.catalyst.util.GenericArrayData(new long[0]);
         |} else {
         |  long[] $th = new long[$n];
         |  for (int $i = 0; $i < $n; $i++) {
         |    org.apache.spark.unsafe.types.UTF8String $s = $a.getUTF8String($i);
         |    int $len = $s.numBytes();
         |$tokenHash
         |    $th[$i] = $h;
         |  }
         |  long[] $out = new long[$n - ${width - 1}];
         |  long $h = 0L;
         |  for (int $j = 0; $j < $width; $j++) { $h = $seed; }
         |  $out[0] = $h;
         |  for (int $k = 1; $k <= $n - $width; $k++) {
         |    $h = $slide;
         |    $out[$k] = $h;
         |  }
         |  ${ev.value} =
         |    new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
         |}
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object RollingHash {
  import org.apache.spark.sql.GraftBridge

  /** Column-API entry point. `modulus = 0` selects the mod-2^64
    * production ring; a positive modulus selects the oracle-
    * reproducible mod-p ring. */
  def rolling_hash(tokens: Column, width: Int, mult: Long = 31L,
      modulus: Long = 0L): Column =
    GraftBridge.column(RollingHash(
      GraftBridge.expression(tokens), width, mult, modulus))
}
