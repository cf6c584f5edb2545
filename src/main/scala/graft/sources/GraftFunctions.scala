package graft.sources

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.functions.{BoundFunction, ScalarFunction, UnboundFunction}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

import graft.iceberg.PartitionTransforms

/** The Iceberg partition-transform functions, exposed through Spark's V2
  * `FunctionCatalog` API. Two jobs:
  *
  *   1. **Storage-partitioned joins.** When a scan reports
  *      `KeyGroupedPartitioning(bucket(8, key), ...)`, Catalyst resolves
  *      the `bucket` transform against the table's owning catalog via
  *      `V2ExpressionUtils.loadV2FunctionOpt` — no resolvable function,
  *      no SPJ. The bound function's `canonicalName` is what Spark
  *      compares to decide two tables share a partitioning, so the names
  *      here are stable and type-qualified.
  *   2. **SQL access to the transforms**: `graft.system.bucket(8, k)`
  *      lets a user pre-compute the engine's partition value for a key
  *      (e.g. to reason about layout or to bucket a foreign dataset the
  *      same way), `graft.system.years(d)` the temporal ordinals, etc.
  *
  * Semantics are pinned to the Iceberg spec's transform definitions via
  * [[graft.iceberg.PartitionTransforms]] (murmur3_x86_32 bucketing, UTC
  * temporal ordinals) — the same kernels the write path and the
  * manifest-summary pruning already use, so a value computed here always
  * agrees with the layout on disk. */
object GraftFunctions {

  val names: Seq[String] = Seq("bucket", "truncate", "years", "months", "days", "hours")

  def load(name: String): Option[UnboundFunction] = name.toLowerCase match {
    case "bucket" => Some(BucketUnbound)
    case "truncate" => Some(TruncateUnbound)
    case "years" => Some(temporal("years", IntegerType))
    case "months" => Some(temporal("months", IntegerType))
    // days returns DateType: the ordinal IS an epoch day, and surfacing
    // it as a date both reads naturally in SQL and keeps the catalyst
    // representation (Int) identical to the summary-derived value
    case "days" => Some(temporal("days", DateType))
    case "hours" => Some(temporal("hours", IntegerType))
    case _ => None
  }

  private def unsupported(fn: String, t: DataType): Nothing =
    throw new UnsupportedOperationException(
      s"graft function '$fn' does not support argument type ${t.catalogString}")

  /** bucket(n, value): murmur3 bucket in [0, n). Int/long/date/timestamp
    * hash through the spec's long form; strings through UTF-8 bytes;
    * decimals through their unscaled big-endian bytes. */
  private object BucketUnbound extends UnboundFunction {
    override def name(): String = "bucket"
    override def description(): String =
      "bucket(numBuckets, col): Iceberg murmur3 bucket transform"
    override def bind(inputType: StructType): BoundFunction = {
      require(inputType.fields.length == 2,
        s"bucket takes (numBuckets INT, value), got ${inputType.catalogString}")
      require(inputType.fields(0).dataType == IntegerType,
        s"bucket numBuckets must be INT, got ${inputType.fields(0).dataType.catalogString}")
      val vt = inputType.fields(1).dataType
      vt match {
        case IntegerType | LongType | DateType | TimestampType | TimestampNTZType |
            StringType | _: DecimalType => ()
        case other => unsupported("bucket", other)
      }
      new ScalarFunction[Integer] {
        override def inputTypes(): Array[DataType] = Array(IntegerType, vt)
        override def resultType(): DataType = IntegerType
        override def name(): String = "bucket"
        override def canonicalName(): String = s"graft.bucket(${vt.catalogString})"
        override def isResultNullable: Boolean = true
        override def produceResult(input: InternalRow): Integer = {
          if (input.isNullAt(1)) return null
          val n = input.getInt(0)
          vt match {
            case IntegerType | DateType =>
              PartitionTransforms.bucketLong(input.getInt(1).toLong, n)
            case LongType | TimestampType | TimestampNTZType =>
              PartitionTransforms.bucketLong(input.getLong(1), n)
            case StringType =>
              PartitionTransforms.bucketString(input.getUTF8String(1).toString, n)
            case dt: DecimalType =>
              val d = input.getDecimal(1, dt.precision, dt.scale)
              (PartitionTransforms.hashDecimal(
                d.toJavaBigDecimal.unscaledValue()) & Integer.MAX_VALUE) % n
            case other => unsupported("bucket", other)
          }
        }
      }
    }
  }

  /** truncate(width, value): int/long round toward negative infinity to a
    * multiple of width; strings truncate to width codepoints. */
  private object TruncateUnbound extends UnboundFunction {
    override def name(): String = "truncate"
    override def description(): String =
      "truncate(width, col): Iceberg truncate transform"
    override def bind(inputType: StructType): BoundFunction = {
      require(inputType.fields.length == 2,
        s"truncate takes (width INT, value), got ${inputType.catalogString}")
      require(inputType.fields(0).dataType == IntegerType,
        s"truncate width must be INT, got ${inputType.fields(0).dataType.catalogString}")
      val vt = inputType.fields(1).dataType
      vt match {
        case IntegerType | LongType | StringType => ()
        case other => unsupported("truncate", other)
      }
      new ScalarFunction[Any] {
        override def inputTypes(): Array[DataType] = Array(IntegerType, vt)
        override def resultType(): DataType = vt
        override def name(): String = "truncate"
        override def canonicalName(): String = s"graft.truncate(${vt.catalogString})"
        override def isResultNullable: Boolean = true
        override def produceResult(input: InternalRow): Any = {
          if (input.isNullAt(1)) return null
          val w = input.getInt(0)
          vt match {
            case IntegerType =>
              PartitionTransforms.truncateLong(input.getInt(1).toLong, w.toLong).toInt
            case LongType =>
              PartitionTransforms.truncateLong(input.getLong(1), w.toLong)
            case StringType => UTF8String.fromString(
              PartitionTransforms.truncateString(input.getUTF8String(1).toString, w))
            case other => unsupported("truncate", other)
          }
        }
      }
    }
  }

  /** years/months/days/hours over DATE or TIMESTAMP(_NTZ): the spec's
    * UTC ordinals relative to 1970 (hours over DATE is refused — the
    * spec does not define it). */
  private def temporal(fn: String, result: DataType): UnboundFunction = new UnboundFunction {
    override def name(): String = fn
    override def description(): String = s"$fn(col): Iceberg temporal partition transform"
    override def bind(inputType: StructType): BoundFunction = {
      require(inputType.fields.length == 1,
        s"$fn takes one DATE/TIMESTAMP argument, got ${inputType.catalogString}")
      val vt = inputType.fields(0).dataType
      vt match {
        case DateType if fn != "hours" => ()
        case TimestampType | TimestampNTZType => ()
        case other => unsupported(fn, other)
      }
      new ScalarFunction[Integer] {
        override def inputTypes(): Array[DataType] = Array(vt)
        override def resultType(): DataType = result
        override def name(): String = fn
        override def canonicalName(): String = s"graft.$fn(${vt.catalogString})"
        override def isResultNullable: Boolean = true
        override def produceResult(input: InternalRow): Integer = {
          if (input.isNullAt(0)) return null
          val epochDays: Int = vt match {
            case DateType => input.getInt(0)
            case _ => PartitionTransforms.epochDaysOfMicros(input.getLong(0))
          }
          fn match {
            case "years" => PartitionTransforms.yearOrdinal(epochDays)
            case "months" => PartitionTransforms.monthOrdinal(epochDays)
            case "days" => PartitionTransforms.dayOrdinal(epochDays)
            case "hours" => PartitionTransforms.hourOrdinal(input.getLong(0))
          }
        }
      }
    }
  }
}
