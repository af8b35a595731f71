package graft.functions.expressions

import java.io.ByteArrayInputStream

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpressionDescription}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{BinaryType, BooleanType, DataType, LongType}
import org.apache.spark.util.sketch.BloomFilter

/** Native bloom-filter membership probe: `bloom_contains(bloom, key)`
  * where `bloom` is a FOLDABLE binary literal holding a serialized
  * `org.apache.spark.util.sketch.BloomFilter` and `key` is a long.
  *
  * The build side is a driver-built sketch (`df.stat.bloomFilter` — a
  * treeAggregate, so the build never collects rows, only the bitset);
  * the probe side stays in whole-stage codegen. The filter is
  * deserialized ONCE per task from the serialized bytes (lazily in the
  * interpreted path, via a lazily-initialized generated-class field in
  * codegen) — never per row.
  *
  * Scale rationale: a semi-join against a small-but-not-broadcastable-
  * cheaply dim can instead ship a ~1 MB bitset to every task and drop
  * 99% of the fact rows BEFORE the shuffle; the exact join afterwards
  * removes the false positives, so composed results are exact (the
  * j11 oracle is the plain join).
  */
@ExpressionDescription(
  usage = "_FUNC_(bloom, key) - true if the serialized bloom filter might contain key.")
case class BloomContains(left: Expression, right: Expression)
  extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (!left.foldable || left.dataType != BinaryType)
      TypeCheckResult.TypeCheckFailure(
        "bloom_contains expects a foldable binary bloom as arg 1, got " +
          left.dataType.simpleString)
    else if (right.dataType != LongType)
      TypeCheckResult.TypeCheckFailure(
        s"bloom_contains expects a bigint key, got ${right.dataType.simpleString}")
    else TypeCheckResult.TypeCheckSuccess

  override def dataType: DataType = BooleanType

  override def prettyName: String = "bloom_contains"

  // Bytes evaluated from the foldable child once on the driver; the
  // byte[] (always serializable) travels with the plan, the filter is
  // rebuilt lazily on each executor.
  @transient private lazy val bloomBytes: Array[Byte] =
    left.eval(null).asInstanceOf[Array[Byte]]

  @transient private lazy val filter: BloomFilter =
    BloomFilter.readFrom(new ByteArrayInputStream(bloomBytes))

  override protected def nullSafeEval(b: Any, k: Any): Any =
    filter.mightContainLong(k.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode = {
    val bytesRef = ctx.addReferenceObj("bloomBytes", bloomBytes, "byte[]")
    val field = ctx.addMutableState(classOf[BloomFilter].getName, "bloomF")
    nullSafeCodeGen(ctx, ev, (_, k) => {
      s"""
         |if ($field == null) {
         |  try {
         |    $field = org.apache.spark.util.sketch.BloomFilter.readFrom(
         |      new java.io.ByteArrayInputStream($bytesRef));
         |  } catch (java.io.IOException e) {
         |    throw new RuntimeException(e);
         |  }
         |}
         |${ev.value} = $field.mightContainLong($k);
       """.stripMargin
    })
  }

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): BloomContains =
    copy(left = newLeft, right = newRight)
}
