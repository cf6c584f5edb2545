package graft.functions

import java.nio.{ByteBuffer, ByteOrder}

import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._

/** WKB (well-known binary) point kernels — the value layer for the v3
  * `geometry`/`geography` columns the type system carries as WKB
  * BinaryType: `graft_st_point(x, y)` builds canonical little-endian
  * WKB, `graft_st_x`/`graft_st_y` read a point back, accepting BOTH
  * byte orders (the WKB spec's first byte declares it; a foreign
  * big-endian writer must read correctly) and refusing non-point
  * geometry types loudly. Codegen'd static calls — the kernels run
  * inside whole-stage codegen like every other graft expression.
  */
object GeoAlgos {

  val WkbPointType = 1

  /** Canonical little-endian 21-byte WKB point. */
  def pointWkb(x: Double, y: Double): Array[Byte] =
    ByteBuffer.allocate(21).order(ByteOrder.LITTLE_ENDIAN)
      .put(1.toByte).putInt(WkbPointType).putDouble(x).putDouble(y).array()

  /** Coordinate `idx` (0 = x, 1 = y) of a WKB point, either byte order. */
  def pointCoord(bytes: Array[Byte], idx: Int): Double = {
    if (bytes.length < 21)
      throw new IllegalArgumentException(
        s"WKB too short for a point: ${bytes.length} bytes")
    val order = bytes(0) match {
      case 1 => ByteOrder.LITTLE_ENDIAN
      case 0 => ByteOrder.BIG_ENDIAN
      case other => throw new IllegalArgumentException(
        s"bad WKB byte-order marker $other")
    }
    val bb = ByteBuffer.wrap(bytes, 1, bytes.length - 1).order(order)
    val geomType = bb.getInt
    if (geomType != WkbPointType)
      throw new IllegalArgumentException(
        s"not a WKB point (geometry type $geomType)")
    if (idx == 1) bb.getDouble // skip x
    bb.getDouble
  }
}

/** st_point(x, y) → canonical WKB binary. */
case class STPoint(left: Expression, right: Expression)
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression {
  override def nullIntolerant: Boolean = true
  override def dataType: DataType = BinaryType
  override def prettyName: String = "graft_st_point"

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (left.dataType == DoubleType && right.dataType == DoubleType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires (double, double), got " +
        s"${left.dataType.catalogString}, ${right.dataType.catalogString}")

  override protected def nullSafeEval(x: Any, y: Any): Any =
    GeoAlgos.pointWkb(x.asInstanceOf[Double], y.asInstanceOf[Double])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (x, y) => s"graft.functions.GeoAlgos.pointWkb($x, $y)")

  override protected def withNewChildrenInternal(l: Expression, r: Expression): STPoint =
    copy(left = l, right = r)
}

/** st_x / st_y over a WKB point (coordIdx 0 / 1). */
case class STCoord(child: Expression, coordIdx: Int)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {
  override def nullIntolerant: Boolean = true
  override def dataType: DataType = DoubleType
  override def prettyName: String = if (coordIdx == 0) "graft_st_x" else "graft_st_y"

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == BinaryType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a binary WKB input, got ${child.dataType.catalogString}")

  override protected def nullSafeEval(v: Any): Any =
    GeoAlgos.pointCoord(v.asInstanceOf[Array[Byte]], coordIdx)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.GeoAlgos.pointCoord($c, $coordIdx)")

  override protected def withNewChildInternal(c: Expression): STCoord = copy(child = c)
}
