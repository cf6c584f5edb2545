package graft.iceberg

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.BoundDecode
import graft.iceberg.IcebergTypes._

/** Stats-based file pruning — the scan planning the reference's bound
  * decoding enables but never performs (SURVEY.md §4): filter the `files`
  * metadata table on predicate-vs-decoded-bounds, then read only surviving
  * data files.
  *
  * At 100 TB this is the difference between scanning everything and
  * scanning the handful of files whose [lower, upper] range intersects the
  * predicate: planning cost is proportional to metadata (thousands of
  * manifest rows, distributed one task per manifest), not data.
  */
object ScanPlanning {

  /** Files whose [lower_bounds(id), upper_bounds(id)] interval may contain
    * rows satisfying `lower <= value <= upper` (either side optional).
    * Null bounds (no stats) keep the file — pruning must be conservative.
    */
  def pruneFiles(
      entries: DataFrame,
      meta: TableMetadata,
      fieldId: Int,
      lower: Option[Any] = None,
      upper: Option[Any] = None): DataFrame = {
    val types = meta.fieldTypes
    val t = IcebergTypes.fromString(types(fieldId))
    val lo = BoundDecode.decodedBound(types, col("data_file.lower_bounds"), fieldId)
    val hi = BoundDecode.decodedBound(types, col("data_file.upper_bounds"), fieldId)
    def typed(c: Column): Column = t match {
      case TInt | TLong | TTime => c.cast("long")
      case TFloat | TDouble => c.cast("double")
      case TDecimal(p, s) => c.cast(s"decimal($p,$s)")
      case TDate => c.cast("date")
      case TTimestamp | TTimestamptz => c.cast("timestamp")
      case _ => c
    }
    val keepUpper = upper match {
      case Some(v) => lo.isNull || typed(lo) <= lit(v) // file's min <= predicate upper
      case None => lit(true)
    }
    val keepLower = lower match {
      case Some(v) => hi.isNull || typed(hi) >= lit(v) // file's max >= predicate lower
      case None => lit(true)
    }
    entries.filter(keepUpper && keepLower)
  }

  /** Surviving data-file paths for an equality/range predicate — feed for
    * `spark.read.parquet(paths: _*)`. */
  def planFiles(
      spark: SparkSession,
      meta: TableMetadata,
      manifestPaths: Seq[String],
      fieldId: Int,
      lower: Option[Any],
      upper: Option[Any]): Seq[String] = {
    val entries = ManifestReader.entries(spark, manifestPaths)
    pruneFiles(entries, meta, fieldId, lower, upper)
      .select(col("data_file.file_path"))
      .collect()
      .map(_.getString(0))
      .toSeq
  }
}
