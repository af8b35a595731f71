package graft.functions.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionDescription, TernaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, IntegerType}

/** Native squared-L2 distance between `b` and the window of `a`
  * starting at 0-based `off`: Σ_i (a[off+i] − b[i])², i over b's
  * length — one fused primitive loop with whole-stage codegen.
  *
  * Replaces the interpreted higher-order chain
  * `aggregate(zip_with(slice(a, off+1, len(b)), b,
  *   (x,y) -> (x-y)*(x-y)), 0D, (acc,z) -> acc+z)`
  * in the PQ/IVF hot paths (v6's per-(vector, subspace, codeword)
  * distance — 128 HOF evaluations per vector — and KMeans'
  * per-centroid assignment fold): the HOF form evaluates per element
  * with boxing and materializes a transient sliced + zipped array per
  * call. Bit-identical by construction: the lambda computes
  * d·d with d = x−y in double and the fold accumulates strictly
  * left-to-right in double; the loop below performs the same IEEE
  * operations in the same order, so every sum is the same double.
  *
  * Inputs must be array<double> (every call site pre-widens);
  * mismatched windows fail fast like cosine_sim — a silently
  * truncated distance would corrupt argmin/rankings undetectably
  * (the HOF form would pad with null and return null; no call site
  * can reach either case — 64-dim vectors, 8-dim aligned subspaces).
  */
@ExpressionDescription(
  usage = "_FUNC_(a, b, off) - squared L2 distance of b vs a[off..off+len(b)).")
case class L2SqAt(first: Expression, second: Expression, third: Expression)
  extends TernaryExpression {

  private def elemOk(dt: DataType): Boolean = dt match {
    case ArrayType(DoubleType, _) => true
    case _ => false
  }

  override def checkInputDataTypes(): TypeCheckResult = {
    if (elemOk(first.dataType) && elemOk(second.dataType) &&
        third.dataType == IntegerType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"l2sq_at expects (array<double>, array<double>, int), got " +
        s"(${first.dataType.simpleString}, ${second.dataType.simpleString}, " +
        s"${third.dataType.simpleString})")
  }

  override def dataType: DataType = DoubleType

  override def prettyName: String = "l2sq_at"

  override protected def nullSafeEval(a: Any, b: Any, o: Any): Any = {
    val (xs, ys) = (a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
    val off = o.asInstanceOf[Int]
    val n = ys.numElements()
    if (off < 0 || off + n > xs.numElements()) {
      throw new IllegalArgumentException(
        s"l2sq_at: window [$off, ${off + n}) out of bounds for " +
          s"${xs.numElements()}-element array")
    }
    var acc = 0.0
    var i = 0
    while (i < n) {
      val d = xs.getDouble(off + i) - ys.getDouble(i)
      acc += d * d
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b, o) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val acc = ctx.freshName("acc")
      val d = ctx.freshName("d")
      s"""
         |int $n = $b.numElements();
         |if ($o < 0 || $o + $n > $a.numElements()) {
         |  throw new IllegalArgumentException(
         |    "l2sq_at: window [" + $o + ", " + ($o + $n) +
         |      ") out of bounds for " + $a.numElements() + "-element array");
         |}
         |double $acc = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  double $d = $a.getDouble($o + $i) - $b.getDouble($i);
         |  $acc += $d * $d;
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newFirst: Expression,
      newSecond: Expression, newThird: Expression): L2SqAt =
    copy(first = newFirst, second = newSecond, third = newThird)
}
