package graft.functions.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionDescription, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** 128-permutation MinHash signature over an array of (28-bit) element
  * hashes: sig[j] = min over x of ((2j+1)*x + j*j + 7919) mod (2^31-1).
  *
  * The HOF form (`transform(sequence(0,127), j -> array_min(transform(
  * xs, ...)))`) is interpreted with per-element boxing and allocates 128
  * transient arrays per row — it dominated the sf0.1 bench (75 s).
  * This is one fused primitive loop with whole-stage codegen.
  */
@ExpressionDescription(
  usage = "_FUNC_(hashes) - 128-perm minhash signature of an array<long>.")
case class MinHashSig(child: Expression) extends UnaryExpression {

  private final val P = 2147483647L // 2^31 - 1
  private final val Mask = 268435455L // inputs masked to 28 bits: no overflow
  private final val NumPerms = 128

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case dt => TypeCheckResult.TypeCheckFailure(
      s"minhash_sig expects array<bigint>, got ${dt.simpleString}")
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def prettyName: String = "minhash_sig"

  override protected def nullSafeEval(input: Any): Any = {
    val xs = input.asInstanceOf[ArrayData]
    val n = xs.numElements()
    val sig = new Array[Long](NumPerms)
    var j = 0
    while (j < NumPerms) {
      val a = 2L * j + 1; val b = j.toLong * j + 7919
      var min = Long.MaxValue
      var i = 0
      while (i < n) {
        val v = (a * (xs.getLong(i) & Mask) + b) % P
        if (v < min) min = v
        i += 1
      }
      sig(j) = min
      j += 1
    }
    new GenericArrayData(sig)
  }

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, xs => {
      val n = ctx.freshName("n")
      val sig = ctx.freshName("sig")
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val a = ctx.freshName("a")
      val b = ctx.freshName("b")
      val min = ctx.freshName("min")
      val v = ctx.freshName("v")
      s"""
         |int $n = $xs.numElements();
         |long[] $sig = new long[$NumPerms];
         |for (int $j = 0; $j < $NumPerms; $j++) {
         |  long $a = 2L * $j + 1; long $b = (long) $j * $j + 7919;
         |  long $min = Long.MAX_VALUE;
         |  for (int $i = 0; $i < $n; $i++) {
         |    long $v = ($a * ($xs.getLong($i) & ${Mask}L) + $b) % ${P}L;
         |    if ($v < $min) $min = $v;
         |  }
         |  $sig[$j] = $min;
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($sig);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression)
      : MinHashSig = copy(child = newChild)
}
