package graft.functions.expressions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionDescription, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.types.{DataType, IntegerType, StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** Native per-chunk ASCII feature stats for m3/m4 —
  * `chunk_ascii_stats(c)` returns
  * `struct<sum_bytes:int, n_space:int, n_upper:int>` where, over the
  * characters of `c`:
  *
  *  - `sum_bytes` = Σ code point of every printable-ASCII char
  *    (0x20 ' ' .. 0x7E '~');
  *  - `n_space`   = count of 0x20;
  *  - `n_upper`   = count of 0x41 'A' .. 0x5A 'Z'.
  *
  * One fused byte loop with whole-stage codegen, replacing the
  * interpreted chain the m3/m4 hot path ran per chunk (r17 "not yet
  * optimized" item): `regexp_replace(c, '[^ -~]', '')` + the
  * `aggregate(transform(sequence(1, length(ca)), i ->
  * ascii(substring(ca, i, 1))), 0, +)` HOF fold + a second
  * `regexp_replace(c, '[^A-Z]', '')` pass + a `replace` pass — four
  * string traversals, two of them regex, one per-character with a
  * boxed lambda and a substring allocation per step.
  *
  * Value-identical by construction (pinned bit-for-bit by
  * ChunkAsciiStatsSpec against the replaced SQL chain, through
  * codegen): in valid UTF-8 a byte in [0x20, 0x7E] IS a standalone
  * ASCII character (continuation bytes are ≥ 0x80, multibyte lead
  * bytes ≥ 0xC2), and every non-ASCII code point falls outside all
  * three ranges, so iterating BYTES equals iterating code points for
  * these counts; Spark's `ascii()` of a printable-ASCII char is its
  * code point, so the integer sums agree term by term — all-int
  * arithmetic, no float discipline needed. The old chain's
  * `if(length(ca) = 0, 0, ...)` empty-guard is the loop's natural 0.
  */
@ExpressionDescription(
  usage = "_FUNC_(c) - struct(sum of printable-ASCII code points, " +
    "space count, uppercase count) of string c.")
case class ChunkAsciiStats(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"chunk_ascii_stats expects string, got ${child.dataType.simpleString}")

  override def dataType: DataType = StructType(Seq(
    StructField("sum_bytes", IntegerType, nullable = false),
    StructField("n_space", IntegerType, nullable = false),
    StructField("n_upper", IntegerType, nullable = false)))

  override def prettyName: String = "chunk_ascii_stats"

  override protected def nullSafeEval(input: Any): Any = {
    val s = input.asInstanceOf[UTF8String]
    val nb = s.numBytes()
    var sum = 0
    var nsp = 0
    var nup = 0
    var i = 0
    while (i < nb) {
      val b = s.getByte(i)
      if (b >= 0x20 && b <= 0x7E) {
        sum += b
        if (b == 0x20) nsp += 1
        else if (b >= 0x41 && b <= 0x5A) nup += 1
      }
      i += 1
    }
    new GenericInternalRow(Array[Any](sum, nsp, nup))
  }

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val i = ctx.freshName("i")
      val nb = ctx.freshName("nb")
      val b = ctx.freshName("b")
      val sum = ctx.freshName("sum")
      val nsp = ctx.freshName("nsp")
      val nup = ctx.freshName("nup")
      val rowClass = classOf[GenericInternalRow].getName
      s"""
         |int $nb = $c.numBytes();
         |int $sum = 0; int $nsp = 0; int $nup = 0;
         |for (int $i = 0; $i < $nb; $i++) {
         |  byte $b = $c.getByte($i);
         |  if ($b >= 0x20 && $b <= 0x7E) {
         |    $sum += $b;
         |    if ($b == 0x20) { $nsp++; }
         |    else if ($b >= 0x41 && $b <= 0x5A) { $nup++; }
         |  }
         |}
         |${ev.value} = new $rowClass(new Object[] {
         |  java.lang.Integer.valueOf($sum),
         |  java.lang.Integer.valueOf($nsp),
         |  java.lang.Integer.valueOf($nup) });
       """.stripMargin
    })

  override protected def withNewChildInternal(
      newChild: Expression): ChunkAsciiStats = copy(child = newChild)
}
