package graft.functions.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpressionDescription}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** Native cosine-similarity over two array<double|float> columns.
  *
  * Rationale (SURVEY §2.10 + the ANN hot path): the higher-order-function
  * form — `aggregate(zip_with(a, b, (x,y) -> x*y), 0D, ...)` — is
  * interpreted per element with boxing, and builds a transient zipped
  * array per row-pair. This expression is one fused primitive loop with
  * whole-stage codegen: dot product and both norms in a single pass, no
  * allocation.
  *
  * Semantics match the HOF form bit-for-bit for equal-length inputs:
  * strict left-to-right accumulation in double,
  * `dot / (sqrt(na) * sqrt(nb))`. Mismatched lengths fail fast (a
  * silently truncated similarity would corrupt rankings undetectably).
  * Array elements must be non-null (embedding vectors).
  *
  * FLOAT inputs are read as floats and widened to double per element
  * inside the loop — bit-identical to casting the whole array to
  * array<double> first (float→double widening is exact), at half the
  * bytes per row. This is what lets the d5 verify join ship the raw
  * float32 `embedding` column through its shuffles instead of a
  * pre-cast double array (the round-10 sf10 finding: two float64[64]
  * vectors per candidate ≈ 50 GB of shuffle at 100× — float32 halves
  * it with zero numeric drift). Each side's element type is resolved
  * independently at analysis time (mixed float/double pairs are fine).
  */
@ExpressionDescription(
  usage = "_FUNC_(a, b) - cosine similarity of two double or float arrays.")
case class CosineSim(left: Expression, right: Expression)
  extends BinaryExpression {

  private def elemOk(dt: DataType): Boolean = dt match {
    case ArrayType(DoubleType, _) | ArrayType(FloatType, _) => true
    case _ => false
  }

  private def isFloat(dt: DataType): Boolean = dt match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  override def checkInputDataTypes(): TypeCheckResult = {
    if (elemOk(left.dataType) && elemOk(right.dataType))
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"cosine_sim expects (array<double|float>, array<double|float>), " +
        s"got (${left.dataType.simpleString}, ${right.dataType.simpleString})")
  }

  override def dataType: DataType = DoubleType

  override def prettyName: String = "cosine_sim"

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val (xs, ys) = (a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
    if (xs.numElements() != ys.numElements()) {
      // fail fast: a silently truncated similarity would corrupt top-k
      // rankings undetectably
      throw new IllegalArgumentException(
        s"cosine_sim: length mismatch ${xs.numElements()} vs ${ys.numElements()}")
    }
    val (lf, rf) = (isFloat(left.dataType), isFloat(right.dataType))
    val n = xs.numElements()
    var dot = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    while (i < n) {
      val x = if (lf) xs.getFloat(i).toDouble else xs.getDouble(i)
      val y = if (rf) ys.getFloat(i).toDouble else ys.getDouble(i)
      dot += x * y; na += x * x; nb += y * y
      i += 1
    }
    dot / (math.sqrt(na) * math.sqrt(nb))
  }

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val dot = ctx.freshName("dot")
      val na = ctx.freshName("na")
      val nb = ctx.freshName("nb")
      val x = ctx.freshName("x")
      val y = ctx.freshName("y")
      // element accessor resolved at CODEGEN time from the analyzed
      // child types — the generated loop stays branch-free
      val getX =
        if (isFloat(left.dataType)) s"(double) $a.getFloat($i)"
        else s"$a.getDouble($i)"
      val getY =
        if (isFloat(right.dataType)) s"(double) $b.getFloat($i)"
        else s"$b.getDouble($i)"
      s"""
         |if ($a.numElements() != $b.numElements()) {
         |  throw new IllegalArgumentException(
         |    "cosine_sim: length mismatch " + $a.numElements() + " vs " + $b.numElements());
         |}
         |int $n = $a.numElements();
         |double $dot = 0.0, $na = 0.0, $nb = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  double $x = $getX;
         |  double $y = $getY;
         |  $dot += $x * $y; $na += $x * $x; $nb += $y * $y;
         |}
         |${ev.value} = $dot / (java.lang.Math.sqrt($na) * java.lang.Math.sqrt($nb));
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): CosineSim = copy(left = newLeft, right = newRight)
}
