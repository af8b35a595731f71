package graft.functions.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionDescription, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{BinaryType, DataType, StringType}

/** Native voxel-content hash: whole-file DICOM bytes → deterministic
  * md5 of (pixel-grid geometry + PixelData payload), NULL for
  * non-DICOM bytes or absent/encapsulated pixel data — the
  * full-fidelity K6/J6 compare key (do_dicom_compare_recup_to.py:
  * 234-243; see [[graft.ingest.DicomCodec.voxelHash]] for the
  * normalization contract: re-headered copies hash equal, any voxel
  * flip differs).
  *
  * Scale note: like `dicom_parse`, this runs executor-side next to the
  * binary scan inside whole-stage codegen; the pixel payload never
  * crosses a shuffle — only the 32-char hash travels. */
@ExpressionDescription(
  usage = "_FUNC_(bytes) - deterministic voxel content hash of a " +
    "DICOM file, NULL when pixel data is absent or encapsulated.")
case class DicomVoxelHash(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case dt => TypeCheckResult.TypeCheckFailure(
      s"dicom_voxel_hash expects binary, got ${dt.simpleString}")
  }

  override def dataType: DataType = StringType

  override def nullable: Boolean = true

  override def prettyName: String = "dicom_voxel_hash"

  override def nullIntolerant: Boolean = true

  override protected def nullSafeEval(input: Any): Any =
    graft.ingest.DicomCodec.voxelHashOrNull(input.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"""${ev.value} = graft.ingest.DicomCodec.voxelHashOrNull($c);
         |${ev.isNull} = ${ev.value} == null;
       """.stripMargin)

  override protected def withNewChildInternal(newChild: Expression)
      : DicomVoxelHash = copy(child = newChild)
}
