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

  private val BucketRe = """bucket\[(\d+)\]""".r
  private val TruncateRe = """truncate\[(\d+)\]""".r

  /** A source-column equality value converted into a partition-transform's
    * value space — what makes Iceberg's partitioning "hidden": the reader
    * never names partition columns, the planner derives them. Returns the
    * transformed value and its type, or None for transforms that cannot
    * serve an equality predicate (e.g. `void`, or a type the transform
    * does not apply to) — unprunable, never wrong. */
  def transformValue(transform: String, sourceType: IcebergType, value: Any): Option[(IcebergType, Any)] =
    (transform, sourceType, value) match {
      case ("identity", t, v) => Some((t, v))
      case (BucketRe(n), TInt, v: Int) =>
        Some((TInt, PartitionTransforms.bucketLong(v.toLong, n.toInt)))
      case (BucketRe(n), TLong, v: Long) =>
        Some((TInt, PartitionTransforms.bucketLong(v, n.toInt)))
      case (BucketRe(n), TString, v: String) =>
        Some((TInt, PartitionTransforms.bucketString(v, n.toInt)))
      case (TruncateRe(w), TInt, v: Int) =>
        Some((TInt, PartitionTransforms.truncateLong(v.toLong, w.toLong).toInt))
      case (TruncateRe(w), TLong, v: Long) =>
        Some((TLong, PartitionTransforms.truncateLong(v, w.toLong)))
      case (TruncateRe(w), TString, v: String) =>
        Some((TString, PartitionTransforms.truncateString(v, w.toInt)))
      case ("year", TDate, v) => epochDays(v).map(d =>
        (TInt, PartitionTransforms.yearOrdinal(d)))
      case ("month", TDate, v) => epochDays(v).map(d =>
        (TInt, PartitionTransforms.monthOrdinal(d)))
      case ("day", TDate, v) => epochDays(v).map(d =>
        (TInt, PartitionTransforms.dayOrdinal(d)))
      case ("year", TTimestamp | TTimestamptz, v) => epochMicros(v).map(us =>
        (TInt, PartitionTransforms.yearOrdinal(PartitionTransforms.epochDaysOfMicros(us))))
      case ("month", TTimestamp | TTimestamptz, v) => epochMicros(v).map(us =>
        (TInt, PartitionTransforms.monthOrdinal(PartitionTransforms.epochDaysOfMicros(us))))
      case ("day", TTimestamp | TTimestamptz, v) => epochMicros(v).map(us =>
        (TInt, PartitionTransforms.dayOrdinal(PartitionTransforms.epochDaysOfMicros(us))))
      case ("hour", TTimestamp | TTimestamptz, v) => epochMicros(v).map(us =>
        (TInt, PartitionTransforms.hourOrdinal(us)))
      case _ => None
    }

  /** Pushed filter values for DATE columns arrive in whatever form the
    * session's datetime API produced (java.sql.Date, LocalDate, or an
    * already-normalized epoch-day Int) — fold them all to epoch days;
    * unknown forms stay unprunable, never wrong. */
  private def epochDays(v: Any): Option[Int] = v match {
    case d: Int => Some(d)
    case d: java.time.LocalDate => Some(d.toEpochDay.toInt)
    case d: java.sql.Date => Some(d.toLocalDate.toEpochDay.toInt)
    case _ => None
  }

  /** Same for TIMESTAMP values → epoch micros (timestamps compare as
    * instants; the session is pinned UTC, so NTZ literals are exact). */
  private def epochMicros(v: Any): Option[Long] = v match {
    case us: Long => Some(us)
    case t: java.time.Instant =>
      Some(java.lang.Math.addExact(
        java.lang.Math.multiplyExact(t.getEpochSecond, 1000000L), t.getNano / 1000L))
    case t: java.sql.Timestamp => epochMicros(t.toInstant)
    case t: java.time.LocalDateTime => epochMicros(t.toInstant(java.time.ZoneOffset.UTC))
    case _ => None
  }

  private[iceberg] def cmpValues(a: Any, b: Any): Option[Int] = (a, b) match {
    case (x: Number, y: Number) =>
      // NaN/Infinity have no BigDecimal rendering — toString would throw
      // NumberFormatException out of a PRUNING decision and fail the
      // whole read; an unorderable bound is just "unknown", so every
      // caller keeps its entry (the conservative direction everywhere
      // cmpValues feeds: key-range guards, list pruning, delete pruning)
      def finite(n: Number): Boolean = n match {
        case d: java.lang.Double => !d.isNaN && !d.isInfinite
        case f: java.lang.Float => !f.isNaN && !f.isInfinite
        case _ => true
      }
      if (!finite(x) || !finite(y)) None
      else Some(new java.math.BigDecimal(x.toString)
        .compareTo(new java.math.BigDecimal(y.toString)))
    case (x: String, y: String) => Some(x.compareTo(y))
    case _ => None
  }

  /** Result TYPE of a partition transform over `sourceType` — the type
    * field-507 summary bounds of that transform decode as. None for
    * transforms this planner doesn't model (void, unknown). */
  def transformResultType(transform: String, sourceType: IcebergType): Option[IcebergType] =
    transform match {
      case "identity" => Some(sourceType)
      case BucketRe(_) => Some(TInt)
      case TruncateRe(_) => sourceType match {
        case TInt | TLong | TString => Some(sourceType)
        case _ => None
      }
      case "year" | "month" | "day" | "hour" => Some(TInt)
      case _ => None
    }

  /** Typed per-field UNION of the field-507 summaries of a set of
    * manifests under ONE spec — what a delete commit writes for its new
    * delete manifest: the deletes address only files OWNED by these
    * manifests, so the addressed partitions lie inside the union of the
    * owners' summaries, and the symmetric delete-side prune can skip the
    * delete manifest for partition-disjoint reads. Conservative by
    * construction: None unless every owner shares one spec id, carries a
    * summary of the spec's width, and every bound decodes and compares —
    * no summary always beats a wrong summary. */
  def unionSummaries(meta: TableMetadata,
      owners: Seq[ManifestListReader.ManifestFileInfo])
      : Option[(Int, Seq[ManifestListWriter.FieldSummary])] = {
    def minMax(vs: Seq[Any]): Option[(Any, Any)] =
      vs.foldLeft(Option(vs.head, vs.head)) { case (acc, v) =>
        for {
          (lo, hi) <- acc
          cl <- cmpValues(v, lo)
          ch <- cmpValues(v, hi)
        } yield (if (cl < 0) v else lo, if (ch > 0) v else hi)
      }
    def decoded(b: Option[Array[Byte]], t: IcebergType): Option[Any] =
      b.filter(_.nonEmpty).flatMap(bytes =>
        scala.util.Try(SingleValueCodec.decode(t, bytes)).toOption)
    for {
      specId <- owners.map(_.specId).distinct match {
        case collection.Seq(one) => Some(one)
        case _ => None
      }
      spec <- meta.partitionSpecs.find(_.specId == specId)
      sums = owners.flatMap(_.summaries)
      if sums.size == owners.size && sums.forall(_.size == spec.fields.length)
      fields <- spec.fields.zipWithIndex.foldLeft(
          Option(Vector.empty[ManifestListWriter.FieldSummary])) {
        case (accOpt, (pf, i)) =>
          for {
            acc <- accOpt
            srcType <- meta.fieldTypes.get(pf.sourceId)
              .flatMap(IcebergTypes.fromStringOpt)
            tt <- transformResultType(pf.transform, srcType)
            lows <- Some(sums.map(s => decoded(s(i).lower, tt)))
              .filter(_.forall(_.isDefined)).map(_.flatten)
            highs <- Some(sums.map(s => decoded(s(i).upper, tt)))
              .filter(_.forall(_.isDefined)).map(_.flatten)
            (lo, _) <- minMax(lows)
            (_, hi) <- minMax(highs)
          } yield acc :+ ManifestListWriter.FieldSummary(
            sums.exists(_(i).containsNull),
            SingleValueCodec.encode(tt, lo), SingleValueCodec.encode(tt, hi))
      }
    } yield (specId, fields)
  }

  /** Manifest-level hidden-partition pruning: convert `sourceFieldId = value`
    * into each manifest's partition-transform space and test it against the
    * manifest-list's field-507 summaries — manifests whose summary interval
    * cannot contain the transformed value are skipped WITHOUT BEING OPENED.
    * Spec-id aware (each manifest prunes under ITS spec, the i32 mixed-spec
    * rule); a manifest with no summary, an unknown transform, or an
    * undecodable bound survives — pruning is conservative. Driver cost is
    * one KB-scale list read, the same boundary as Iceberg's planner. */
  def pruneManifestsByTransform(listPath: String, meta: TableMetadata,
      sourceFieldId: Int, value: Any): Seq[ManifestListReader.ManifestFileInfo] = {
    val sourceType = IcebergTypes.fromString(meta.fieldTypes(sourceFieldId))
    ManifestListReader.read(listPath).filter { info =>
      val keep = for {
        spec <- meta.partitionSpecs.find(_.specId == info.specId)
        sums <- info.summaries
      } yield spec.fields.zip(sums).forall { case (pf, s) =>
        if (pf.sourceId != sourceFieldId) true
        else transformValue(pf.transform, sourceType, value) match {
          case Some((tType, tv)) =>
            // empty/undecodable bounds (a null-valued partition's summary
            // writes zero bytes) mean "no bound" — keep, never throw
            def cmp(bound: Option[Array[Byte]]): Option[Int] =
              bound.filter(_.nonEmpty)
                .flatMap(b => scala.util.Try(SingleValueCodec.decode(tType, b)).toOption)
                .flatMap(cmpValues(_, tv))
            cmp(s.lower).forall(_ <= 0) && cmp(s.upper).forall(_ >= 0)
          case None => true
        }
      }
      keep.getOrElse(true)
    }
  }

  /** Transforms that preserve ordering — a VALUE range [lo, hi] maps to
    * the transform range [t(lo), t(hi)], so summaries prune range
    * predicates too. Bucket hashes are non-monotonic: never range-prunable. */
  private def isMonotonic(transform: String): Boolean = transform match {
    case "identity" | "year" | "month" | "day" | "hour" => true
    case TruncateRe(_) => true
    case _ => false
  }

  /** Manifest-level pruning for a VALUE RANGE `lower <= field <= upper`
    * (either side optional): the range converts through each spec's
    * MONOTONIC transforms and manifests whose field-507 summary interval
    * cannot overlap it are skipped WITHOUT BEING OPENED. Equality is the
    * degenerate range; bucket specs stay unpruned here (see
    * pruneManifestsByTransform for the equality-in-bucket-space rule).
    * Conservative on every missing/undecodable piece. */
  def pruneManifestsByRange(listPath: String, meta: TableMetadata,
      sourceFieldId: Int, lower: Option[Any], upper: Option[Any])
      : Seq[ManifestListReader.ManifestFileInfo] = {
    val sourceType = IcebergTypes.fromString(meta.fieldTypes(sourceFieldId))
    ManifestListReader.read(listPath).filter { info =>
      val keep = for {
        spec <- meta.partitionSpecs.find(_.specId == info.specId)
        sums <- info.summaries
      } yield spec.fields.zip(sums).forall { case (pf, s) =>
        if (pf.sourceId != sourceFieldId || !isMonotonic(pf.transform)) true
        else {
          def summaryBound(b: Option[Array[Byte]], tt: IcebergType): Option[Any] =
            b.filter(_.nonEmpty).flatMap(bytes =>
              scala.util.Try(SingleValueCodec.decode(tt, bytes)).toOption)
          // overlap test: summary.max >= t(lower) AND summary.min <= t(upper)
          val loOk = lower.flatMap(v => transformValue(pf.transform, sourceType, v))
            .forall { case (tt, tv) =>
              summaryBound(s.upper, tt).flatMap(cmpValues(_, tv)).forall(_ >= 0) }
          val hiOk = upper.flatMap(v => transformValue(pf.transform, sourceType, v))
            .forall { case (tt, tv) =>
              summaryBound(s.lower, tt).flatMap(cmpValues(_, tv)).forall(_ <= 0) }
          loOk && hiOk
        }
      }
      keep.getOrElse(true)
    }
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
