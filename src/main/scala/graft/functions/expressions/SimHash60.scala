package graft.functions.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionDescription, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** 60-bit SimHash over an array of 60-bit element hashes: bit b of the
  * result is set iff more elements have bit b set than clear (strict
  * majority). Bit-identical to the documented SQL form (the DuckDB
  * oracle recomputes it), but one fused primitive loop instead of a
  * 60×N interpreted nested aggregate.
  */
@ExpressionDescription(
  usage = "_FUNC_(hashes) - 60-bit simhash of an array<bigint>.")
case class SimHash60(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case dt => TypeCheckResult.TypeCheckFailure(
      s"simhash60 expects array<bigint>, got ${dt.simpleString}")
  }

  override def dataType: DataType = LongType

  override def prettyName: String = "simhash60"

  override protected def nullSafeEval(input: Any): Any = {
    val xs = input.asInstanceOf[ArrayData]
    val n = xs.numElements()
    val counts = new Array[Int](60)
    var i = 0
    while (i < n) {
      val x = xs.getLong(i)
      var b = 0
      while (b < 60) {
        if (((x >> b) & 1L) == 1L) counts(b) += 1
        b += 1
      }
      i += 1
    }
    var sim = 0L
    var b = 0
    while (b < 60) {
      // strict majority: set iff (#ones - #zeros) > 0  ⇔  2*ones > n
      if (2 * counts(b) > n) sim |= (1L << b)
      b += 1
    }
    sim
  }

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, xs => {
      val n = ctx.freshName("n")
      val counts = ctx.freshName("counts")
      val i = ctx.freshName("i")
      val b = ctx.freshName("b")
      val x = ctx.freshName("x")
      s"""
         |int $n = $xs.numElements();
         |int[] $counts = new int[60];
         |for (int $i = 0; $i < $n; $i++) {
         |  long $x = $xs.getLong($i);
         |  for (int $b = 0; $b < 60; $b++) {
         |    if ((($x >> $b) & 1L) == 1L) $counts[$b]++;
         |  }
         |}
         |${ev.value} = 0L;
         |for (int $b = 0; $b < 60; $b++) {
         |  if (2 * $counts[$b] > $n) ${ev.value} |= (1L << $b);
         |}
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression)
      : SimHash60 = copy(child = newChild)
}
