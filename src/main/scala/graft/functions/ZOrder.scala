package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Z-order (Morton) interleaving for multi-dimensional clustering — the
  * key behind `rewrite_data_files(strategy => 'sort', sort_order =>
  * 'zorder(a, b)')`. Per column, values map to an ORDER-PRESERVING
  * unsigned 64-bit image (the byte-comparable normalization Iceberg's
  * z-order util defines: integers flip the sign bit; floating point
  * flips all bits when negative, the sign bit otherwise — NaNs land
  * above every finite value; strings/binary take their first 8 bytes
  * big-endian; null maps to 0, sorting first). The images' bits then
  * interleave round-robin into an 8·n-byte key whose UNSIGNED
  * LEXICOGRAPHIC order is the z-curve — exactly how Spark compares
  * BinaryType, so `repartitionByRange + sortWithinPartitions` on the
  * key clusters rows along the curve with zero extra machinery.
  *
  * Why a curve instead of a linear sort at 100 TB: a linear sort on
  * (a, b) gives tight file bounds in `a` only — a predicate on `b`
  * alone prunes NOTHING. The z-curve tiles the (a, b) space, so every
  * file covers a small rectangle and min/max pruning works for
  * predicates on ANY clustered column subset. */
object ZOrderAlgo {

  def normLong(v: Long): Long = v ^ Long.MinValue

  def normDouble(v: Double): Long = {
    val b = java.lang.Double.doubleToLongBits(v)
    if (b < 0) ~b else b ^ Long.MinValue
  }

  def normBytes(bytes: Array[Byte]): Long = {
    var out = 0L
    var i = 0
    while (i < 8) {
      out = (out << 8) | (if (i < bytes.length) bytes(i) & 0xffL else 0L)
      i += 1
    }
    out
  }

  /** Round-robin bit interleave of n unsigned-64 images into 8·n bytes,
    * most significant bits first. */
  def interleave(xs: Array[Long]): Array[Byte] = {
    val n = xs.length
    val out = new Array[Byte](8 * n)
    var bit = 0
    while (bit < 64) {
      var c = 0
      while (c < n) {
        if (((xs(c) >>> (63 - bit)) & 1L) != 0) {
          val outIdx = bit * n + c
          out(outIdx >>> 3) = (out(outIdx >>> 3) | (1 << (7 - (outIdx & 7)))).toByte
        }
        c += 1
      }
      bit += 1
    }
    out
  }
}

/** zorder_key(c1, c2, …) → binary. CodegenFallback is a deliberate
  * trade: the expression runs ONCE per row inside a maintenance rewrite
  * job whose cost is the shuffle and the parquet write — keeping it out
  * of whole-stage codegen costs nothing measurable there, and the
  * interpreted path stays allocation-lean (one long[] + one byte[] per
  * row). Never placed on a read/query path. */
case class ZOrderKey(children: Seq[Expression])
    extends Expression with CodegenFallback {

  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    val bad = children.map(_.dataType).collectFirst {
      case dt if !ZOrderKey.supported(dt) => dt
    }
    bad match {
      case Some(dt) => org.apache.spark.sql.catalyst.analysis.TypeCheckResult
        .TypeCheckFailure(s"zorder_key does not support ${dt.catalogString}")
      case None if children.isEmpty =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult
          .TypeCheckFailure("zorder_key needs at least one column")
      case None => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    }
  }

  override def eval(input: InternalRow): Any = {
    val xs = new Array[Long](children.length)
    var i = 0
    while (i < children.length) {
      val v = children(i).eval(input)
      xs(i) =
        if (v == null) 0L
        else children(i).dataType match {
          case IntegerType | DateType => ZOrderAlgo.normLong(v.asInstanceOf[Int].toLong)
          case LongType | TimestampType | TimestampNTZType =>
            ZOrderAlgo.normLong(v.asInstanceOf[Long])
          case DoubleType => ZOrderAlgo.normDouble(v.asInstanceOf[Double])
          case FloatType => ZOrderAlgo.normDouble(v.asInstanceOf[Float].toDouble)
          case StringType => ZOrderAlgo.normBytes(v.asInstanceOf[UTF8String].getBytes)
          case BinaryType => ZOrderAlgo.normBytes(v.asInstanceOf[Array[Byte]])
          case BooleanType => ZOrderAlgo.normLong(if (v.asInstanceOf[Boolean]) 1L else 0L)
          case d: DecimalType =>
            ZOrderAlgo.normLong(v.asInstanceOf[org.apache.spark.sql.types.Decimal].toUnscaledLong)
          case other => throw new IllegalStateException(s"unchecked type $other")
        }
      i += 1
    }
    ZOrderAlgo.interleave(xs)
  }

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): ZOrderKey = copy(children = newChildren)
}

object ZOrderKey {
  def supported(dt: DataType): Boolean = dt match {
    case IntegerType | DateType | LongType | TimestampType | TimestampNTZType |
         DoubleType | FloatType | StringType | BinaryType | BooleanType => true
    case d: DecimalType => d.precision <= 18
    case _ => false
  }
}
