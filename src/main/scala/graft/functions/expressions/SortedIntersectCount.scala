package graft.functions.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpressionDescription}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, LongType}

/** Intersection SIZE of two sorted-distinct long arrays — the Jaccard
  * verify hot loop (SURVEY §2.10; reference near-dup verification
  * semantics, dicomDB query layer).
  *
  * Rationale: `size(array_intersect(a, b))` builds a hash set and
  * MATERIALIZES the intersection array per row-pair, only for `size`
  * to throw it away — measured ~7.7 µs per pair on ~300-element
  * shingle sets, which is the dominant cost of every LSH verify join
  * once candidates number in the millions (the round-9 sf1 probe:
  * d8's verify at 1.7 M candidate pairs). This expression is the
  * allocation-free two-pointer merge over the unsafe array data: one
  * fused primitive loop inside whole-stage codegen, no set, no output
  * array, no boxing.
  *
  * CONTRACT: both inputs must be strictly increasing (sorted,
  * distinct) — [[Md5Shingle60]] and [[ShingleHash64]] emit exactly
  * that; anything else needs `sort_array` (+ `array_distinct` if
  * duplicates are possible) first. On unsorted input the merge
  * silently undercounts, so the contract is pinned by spec
  * (ExpressionSpec) against `size(array_intersect(...))` on random
  * sorted inputs. Array elements must be non-null.
  */
@ExpressionDescription(
  usage = "_FUNC_(a, b) - |a ∩ b| for sorted-distinct bigint arrays.")
case class SortedIntersectCount(left: Expression, right: Expression)
  extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = {
    def ok(dt: DataType): Boolean = dt match {
      case ArrayType(LongType, _) => true
      case _ => false
    }
    if (ok(left.dataType) && ok(right.dataType))
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"sorted_intersect_count expects (array<bigint>, array<bigint>), " +
        s"got (${left.dataType.simpleString}, ${right.dataType.simpleString})")
  }

  override def dataType: DataType = IntegerType

  override def prettyName: String = "sorted_intersect_count"

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val (xs, ys) = (a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
    val (n, m) = (xs.numElements(), ys.numElements())
    var i = 0; var j = 0; var c = 0
    while (i < n && j < m) {
      val x = xs.getLong(i); val y = ys.getLong(j)
      if (x < y) i += 1
      else if (y < x) j += 1
      else { c += 1; i += 1; j += 1 }
    }
    c
  }

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val m = ctx.freshName("m")
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val c = ctx.freshName("c")
      val x = ctx.freshName("x")
      val y = ctx.freshName("y")
      s"""
         |int $n = $a.numElements(), $m = $b.numElements();
         |int $i = 0, $j = 0, $c = 0;
         |while ($i < $n && $j < $m) {
         |  long $x = $a.getLong($i);
         |  long $y = $b.getLong($j);
         |  if ($x < $y) { $i++; }
         |  else if ($y < $x) { $j++; }
         |  else { $c++; $i++; $j++; }
         |}
         |${ev.value} = $c;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): SortedIntersectCount =
    copy(left = newLeft, right = newRight)
}
