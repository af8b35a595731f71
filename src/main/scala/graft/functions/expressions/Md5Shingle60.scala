package graft.functions.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionDescription, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Distinct 60-bit md5 hashes of the byte 8-gram shingles of a string:
  * exactly `conv(substr(md5(shingle),1,15),16,10)` per shingle — the
  * first 15 hex digits are the top 60 bits of the digest — but computed
  * in one pass with a reused MessageDigest instead of an interpreted
  * substring→md5-hex→conv string chain per shingle. The DuckDB oracle's
  * `('0x'||substr(md5(s),1,15))::BIGINT` is bit-identical.
  *
  * The output is SORTED ASCENDING (strictly increasing, since
  * distinct): every consumer treats the array as a set (minhash,
  * simhash, intersection), and sorted-distinct is exactly the input
  * contract of [[SortedIntersectCount]], the Jaccard-verify hot loop.
  */
@ExpressionDescription(
  usage = "_FUNC_(text) - distinct 60-bit md5 byte-8-gram shingle hashes.")
case class Md5Shingle60(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case dt => TypeCheckResult.TypeCheckFailure(
      s"md5_shingle60 expects string, got ${dt.simpleString}")
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def prettyName: String = "md5_shingle60"

  override protected def nullSafeEval(input: Any): Any =
    new GenericArrayData(
      Md5Shingle60.compute(input.asInstanceOf[UTF8String]))

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, s =>
      s"""${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData(
         |  graft.functions.expressions.Md5Shingle60.compute($s));
       """.stripMargin)

  override protected def withNewChildInternal(newChild: Expression)
      : Md5Shingle60 = copy(child = newChild)
}

object Md5Shingle60 {
  private final val K = 8

  private val digest = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  /** Static so generated code can call it directly. Dedupe is on the
    * string shingle (byte window); for distinct windows the 60-bit md5
    * values are distinct up to md5 collisions. Strings shorter than K
    * yield an empty set, mirroring the oracle's substring range.
    * Returned sorted ascending (see class doc). */
  def compute(s: UTF8String): Array[Long] = {
    val bytes = s.getBytes
    val n = bytes.length - K + 1
    if (n <= 0) return Array.emptyLongArray
    val md = digest.get()
    val seen = new java.util.HashSet[java.lang.Long](n * 2)
    val out = new Array[Long](n)
    var m = 0
    var i = 0
    while (i < n) {
      md.reset()
      md.update(bytes, i, math.min(K, bytes.length - i))
      val d = md.digest()
      var v = 0L
      var k = 0
      while (k < 8) { v = (v << 8) | (d(k) & 0xFFL); k += 1 }
      v = v >>> 4 // first 15 hex digits = top 60 bits
      if (seen.add(v)) { out(m) = v; m += 1 }
      i += 1
    }
    val res = java.util.Arrays.copyOf(out, m)
    java.util.Arrays.sort(res)
    res
  }
}
