package graft.functions.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionDescription, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.Platform
import org.apache.spark.unsafe.hash.Murmur3_x86_32
import org.apache.spark.unsafe.types.UTF8String

/** Distinct hashed WORD-trigram shingles of a single-space-tokenized
  * string, one pass, sorted ascending ([[SortedIntersectCount]]'s
  * input contract) — the d4 n-gram-Jaccard tokenizer (reference
  * duplicate detection semantics, Cenir_DB.py dedup family) without
  * the interpreted HOF chain.
  *
  * Replaces `sort_array(transform(array_distinct(transform(sequence(
  * 1, size(w)-2), i -> concat_ws(' ', w[i], w[i+1], w[i+2]))), t ->
  * xxhash64(t)))` over `w = split(text, ' ')`: that shape allocates a
  * words array, ~|w| trigram strings, and distinct-compares them as
  * strings, all in interpreted higher-order lambdas. KEY IDENTITY: a
  * trigram string `concat_ws(' ', w(i), w(i+1), w(i+2))` over a
  * single-space split is byte-identical to the SPAN of the original
  * text from the start of word i to the end of word i+2 (split on one
  * space reconstructs exactly, empty words included), so this
  * expression never materializes words or trigram strings — it finds
  * the space positions and hashes each trigram's byte span in place.
  * Trigram identity is hash-based on both sides of any pair
  * computation, so Jaccard equals string-set Jaccard modulo 64-bit
  * collisions (~1e-9 at corpus scale); the hash constants differ from
  * `xxhash64`, which is free — no oracle hashes these values, and the
  * AllPairs prefix filter is recall-exact under ANY consistent total
  * order on tokens.
  */
@ExpressionDescription(
  usage = """_FUNC_(text) - distinct hashed word-trigram shingles of a
    single-space-tokenized string, sorted ascending. Fewer than 3
    words yields an empty array.""")
case class WordTrigramHash64(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case dt => TypeCheckResult.TypeCheckFailure(
      s"word_trigram_hash64 expects string, got ${dt.simpleString}")
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def prettyName: String = "word_trigram_hash64"

  override protected def nullSafeEval(input: Any): Any =
    new GenericArrayData(
      WordTrigramHash64.compute(input.asInstanceOf[UTF8String]))

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, s =>
      s"""${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData(
         |  graft.functions.expressions.WordTrigramHash64.compute($s));
       """.stripMargin)

  override protected def withNewChildInternal(newChild: Expression)
      : WordTrigramHash64 = copy(child = newChild)
}

object WordTrigramHash64 {

  /** Static so generated code can call it directly. */
  def compute(s: UTF8String): Array[Long] = {
    val bytes = s.getBytes
    val n = bytes.length
    // word-start offsets under split-on-single-space semantics:
    // word k starts at 0 or one past each space byte; word k ends one
    // before the next space (or at n). Empty words participate, same
    // as Spark's split / the oracle's string_split.
    var words = 1
    var i = 0
    while (i < n) { if (bytes(i) == ' ') words += 1; i += 1 }
    if (words < 3) return Array.emptyLongArray
    val starts = new Array[Int](words)
    val ends = new Array[Int](words)
    var w = 0
    starts(0) = 0
    i = 0
    while (i < n) {
      if (bytes(i) == ' ') { ends(w) = i; w += 1; starts(w) = i + 1 }
      i += 1
    }
    ends(w) = n
    val m = words - 2
    val seen = new java.util.HashSet[java.lang.Long](m * 2)
    val out = new Array[Long](m)
    var k = 0
    i = 0
    while (i < m) {
      val from = starts(i)
      val to = ends(i + 2) // trigram span = words i..i+2 incl. spaces
      val h = mix(bytes, from, to - from)
      if (seen.add(h)) { out(k) = h; k += 1 }
      i += 1
    }
    val res = java.util.Arrays.copyOf(out, k)
    java.util.Arrays.sort(res)
    res
  }

  private def mix(bytes: Array[Byte], offset: Int, len: Int): Long = {
    val base = Platform.BYTE_ARRAY_OFFSET + offset
    val lo = Murmur3_x86_32.hashUnsafeBytes(bytes, base, len, 7)
    val hi = Murmur3_x86_32.hashUnsafeBytes(bytes, base, len, 1007)
    (hi.toLong << 32) | (lo.toLong & 0xFFFFFFFFL)
  }
}
