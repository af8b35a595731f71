package graft.functions.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionDescription, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.Platform
import org.apache.spark.unsafe.hash.Murmur3_x86_32
import org.apache.spark.unsafe.types.UTF8String

/** Distinct hashed byte 8-gram shingles of a string, in one pass,
  * sorted ascending (the [[SortedIntersectCount]] input contract —
  * consumers are set-wise, so order is free).
  *
  * Replaces `array_distinct(transform(sequence(...), i -> substring(...)))`
  * + a per-shingle hash: the HOF form allocates ~300 substring objects
  * per document and array-distincts them by string compare; this slides
  * an 8-byte window over the UTF8String bytes and emits 64-bit hashes
  * (two murmur3 lanes combined), deduplicated in a hash set — no string
  * allocation at all. Shingle identity is hash-based on both sides of
  * any pair computation, so Jaccard over these equals string Jaccard
  * modulo 64-bit collisions (~1e-9 at corpus scale).
  */
@ExpressionDescription(
  usage = "_FUNC_(text) - distinct hashed byte-8-gram shingles.")
case class ShingleHash64(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case dt => TypeCheckResult.TypeCheckFailure(
      s"shingle_hash64 expects string, got ${dt.simpleString}")
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def prettyName: String = "shingle_hash64"

  override protected def nullSafeEval(input: Any): Any =
    new GenericArrayData(
      ShingleHash64.compute(input.asInstanceOf[UTF8String]))

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, s =>
      s"""${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData(
         |  graft.functions.expressions.ShingleHash64.compute($s));
       """.stripMargin)

  override protected def withNewChildInternal(newChild: Expression)
      : ShingleHash64 = copy(child = newChild)
}

object ShingleHash64 {
  private final val K = 8

  /** Static so generated code can call it directly. Strings shorter
    * than K yield an empty set — mirroring the substring definition
    * (and the DuckDB oracle), where no length-K window exists. */
  def compute(s: UTF8String): Array[Long] = {
    val bytes = s.getBytes
    val n = bytes.length - K + 1
    if (n <= 0) return Array.emptyLongArray
    val seen = new java.util.HashSet[java.lang.Long](n * 2)
    val out = new Array[Long](n)
    var m = 0
    var i = 0
    while (i < n) {
      val h = mix(bytes, i, K)
      if (seen.add(h)) { out(m) = h; m += 1 }
      i += 1
    }
    val res = java.util.Arrays.copyOf(out, m)
    java.util.Arrays.sort(res)
    res
  }

  private def mix(bytes: Array[Byte], offset: Int, len: Int): Long = {
    val base = Platform.BYTE_ARRAY_OFFSET + offset
    val lo = Murmur3_x86_32.hashUnsafeBytes(bytes, base, len, 42)
    val hi = Murmur3_x86_32.hashUnsafeBytes(bytes, base, len, 1042)
    (hi.toLong << 32) | (lo.toLong & 0xFFFFFFFFL)
  }
}
