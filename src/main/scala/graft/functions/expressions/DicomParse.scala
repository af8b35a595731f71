package graft.functions.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionDescription, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{BinaryType, DataType, MapType, StringType}

/** Native DICOM header parse: binary file bytes → flat key→value map
  * (S6/S7 — see [[graft.ingest.DicomCodec]] for the format walk).
  * NULL for non-DICOM bytes, so `dicom_parse(content) IS NOT NULL` IS
  * the S5 magic sniff — one expression gives sniff + parse in a single
  * pass over the bytes, inside whole-stage codegen (the generated code
  * calls the static parser; no UDF, no encoder round-trip).
  *
  * Scale note: the expression runs wherever the binary column already
  * is — no shuffle, no collect; a million-file scan parses a million
  * headers executor-side, and Catalyst prunes it away entirely if the
  * meta column goes unused. */
@ExpressionDescription(
  usage = "_FUNC_(bytes) - DICOM header tags as map<string,string>, " +
    "NULL if the bytes are not a DICOM file.")
case class DicomParse(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case dt => TypeCheckResult.TypeCheckFailure(
      s"dicom_parse expects binary, got ${dt.simpleString}")
  }

  override def dataType: DataType =
    MapType(StringType, StringType, valueContainsNull = false)

  override def nullable: Boolean = true

  override def prettyName: String = "dicom_parse"

  override def nullIntolerant: Boolean = true

  override protected def nullSafeEval(input: Any): Any =
    graft.ingest.DicomCodec.parseToMapData(input.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"""${ev.value} = graft.ingest.DicomCodec.parseToMapData($c);
         |${ev.isNull} = ${ev.value} == null;
       """.stripMargin)

  override protected def withNewChildInternal(newChild: Expression)
      : DicomParse = copy(child = newChild)
}
