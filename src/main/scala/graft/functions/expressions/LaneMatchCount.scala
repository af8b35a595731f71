package graft.functions.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpressionDescription}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, LongType}

/** Positional equal-lane count of two long arrays — the minhash
  * signature-similarity estimator's hot loop (d11: Ĵ = matching
  * lanes / 128, the unbiased LSH estimate that runs BEFORE any
  * shingle join at corpus scale).
  *
  * Replaces `aggregate(zip_with(sa, sb, (x,y) -> if(x=y,1,0)), 0,
  * (a,b) -> a+b)`: the HOF chain is interpreted per element with
  * boxing and builds a transient zipped array per row-pair — at the
  * round-9 sf1 probe's ~2M candidate pairs that interpretation was
  * the whole cost of d11 (~20 s). This is one fused primitive loop
  * inside whole-stage codegen; count semantics are identical.
  * Mismatched lengths fail fast (signatures are fixed-width by
  * construction; silent truncation would bias the estimate).
  */
@ExpressionDescription(
  usage = "_FUNC_(a, b) - count of positions where two bigint arrays match.")
case class LaneMatchCount(left: Expression, right: Expression)
  extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = {
    def ok(dt: DataType): Boolean = dt match {
      case ArrayType(LongType, _) => true
      case _ => false
    }
    if (ok(left.dataType) && ok(right.dataType))
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"lane_matches expects (array<bigint>, array<bigint>), " +
        s"got (${left.dataType.simpleString}, ${right.dataType.simpleString})")
  }

  override def dataType: DataType = IntegerType

  override def prettyName: String = "lane_matches"

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val (xs, ys) = (a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
    if (xs.numElements() != ys.numElements()) {
      throw new IllegalArgumentException(
        s"lane_matches: length mismatch ${xs.numElements()} vs ${ys.numElements()}")
    }
    val n = xs.numElements()
    var i = 0; var c = 0
    while (i < n) {
      if (xs.getLong(i) == ys.getLong(i)) c += 1
      i += 1
    }
    c
  }

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val c = ctx.freshName("c")
      s"""
         |if ($a.numElements() != $b.numElements()) {
         |  throw new IllegalArgumentException(
         |    "lane_matches: length mismatch " + $a.numElements() + " vs " + $b.numElements());
         |}
         |int $n = $a.numElements();
         |int $c = 0;
         |for (int $i = 0; $i < $n; $i++) {
         |  if ($a.getLong($i) == $b.getLong($i)) { $c++; }
         |}
         |${ev.value} = $c;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): LaneMatchCount =
    copy(left = newLeft, right = newRight)
}
