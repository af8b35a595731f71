package graft.functions.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpressionDescription}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/** Native cosine-similarity over two array<double> columns.
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
  */
@ExpressionDescription(
  usage = "_FUNC_(a, b) - cosine similarity of two double arrays.")
case class CosineSim(left: Expression, right: Expression)
  extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = {
    def ok(dt: DataType): Boolean = dt match {
      case ArrayType(DoubleType, _) => true
      case _ => false
    }
    if (ok(left.dataType) && ok(right.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"cosine_sim expects (array<double>, array<double>), " +
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
    val n = xs.numElements()
    var dot = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    while (i < n) {
      val x = xs.getDouble(i); val y = ys.getDouble(i)
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
      s"""
         |if ($a.numElements() != $b.numElements()) {
         |  throw new IllegalArgumentException(
         |    "cosine_sim: length mismatch " + $a.numElements() + " vs " + $b.numElements());
         |}
         |int $n = $a.numElements();
         |double $dot = 0.0, $na = 0.0, $nb = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  double $x = $a.getDouble($i);
         |  double $y = $b.getDouble($i);
         |  $dot += $x * $y; $na += $x * $x; $nb += $y * $y;
         |}
         |${ev.value} = $dot / (java.lang.Math.sqrt($na) * java.lang.Math.sqrt($nb));
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): CosineSim = copy(left = newLeft, right = newRight)
}
