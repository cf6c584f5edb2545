package graft.iceberg

import com.fasterxml.jackson.databind.ObjectMapper

import graft.iceberg.IcebergTypes._

/** Table-statistics documents: per-column NDV + null counts committed by
  * `compute_table_stats` (ANALYZE) into the metadata `statistics` list
  * and served back to Spark's CBO through the DSv2 Statistics surface.
  *
  * The on-disk container is a spec-layout PUFFIN file (see [[Puffin]])
  * carrying TWO blob families per column:
  *
  *   - `graft-ndv-v1` — the engine's own NDV/null-count record (custom
  *     blob-type name so a foreign Puffin reader SKIPS it rather than
  *     misparse; ndv/null-count ride in the blob properties, the body
  *     repeats them as a small JSON document);
  *   - `apache-datasketches-theta-v1` — the STANDARD Iceberg statistics
  *     blob (puffin-spec): a serialized Apache DataSketches compact
  *     Theta sketch of the column's values, each value hashed through
  *     its Iceberg single-value binary serialization
  *     ([[SingleValueCodec.encode]]), with the spec's `ndv` property.
  *     Foreign engines consume this one — and can UNION it with their
  *     own sketches of other snapshots, which is the whole point of
  *     standardizing the hash input. Built with the same
  *     datasketches-java library Spark bundles, so the bytes are the
  *     reference serialization, not an imitation; TableStatsSpec ALSO
  *     decodes the container raw (preamble, flags, ordered hash run)
  *     against the published format.
  */
object TableStats {

  /** `nullCount` is None when the document came from a FOREIGN writer's
    * standard theta blobs — the theta sketch carries distinctness only. */
  final case class ColumnStats(ndv: Long, nullCount: Option[Long])
  final case class Doc(snapshotId: Long, rowCount: Long, columns: Map[Int, ColumnStats])

  /** The standard blob type name from the Iceberg Puffin spec. */
  val ThetaBlobType = "apache-datasketches-theta-v1"

  /** The PARTITION SKETCH BANK blob family (engine-private name — a
    * foreign Puffin reader skips it): one blob per (partition tuple,
    * column) whose body is that partition's compact theta sketch and
    * whose properties carry the partition's exact per-column null count,
    * empty-bytes flag and row count. The bank is what lets incremental
    * ANALYZE survive DELETEs: a delete invalidates ONE partition's
    * sketch, the rest union unchanged — without it any delete forces a
    * full table rescan (a theta union cannot subtract). */
  val PartBlobType = "graft-theta-part-v1"

  /** One partition's stats for one column: the union-ready compact theta
    * body, the exact null count, and whether the counted values included
    * an empty-bytes value (the +1 the body cannot carry). */
  final case class PartCol(body: Array[Byte], nullCount: Long, sawEmpty: Boolean)
  /** One partition's bank entry: exact row count + per-field-id columns. */
  final case class PartStats(rowCount: Long, cols: Map[Int, PartCol])

  private val mapper = new ObjectMapper()

  /** Types whose Spark scan values convert losslessly to the Iceberg
    * single-value serialization the theta sketch hashes. */
  def thetaSupported(t: IcebergType): Boolean = t match {
    case TBoolean | TInt | TLong | TFloat | TDouble | TString | TBinary |
         TFixed(_) | TDate | TTime | TTimestamp | TTimestamptz |
         TTimestampNs | TTimestamptzNs | TUuid | TDecimal(_, _) => true
    // unknown carries no values; geo values have no single-value
    // serialization (only bounding-box CORNERS do) — a standard blob over
    // them would not be union-compatible with any spec-conforming writer
    case _ => false
  }

  /** Types ANALYZE can sketch at all: the standard set plus geo (raw-WKB
    * hash, engine-internal NDV only). Nested/variant/unknown columns carry
    * NO statistics — they have no canonical value serialization to hash
    * (map iteration order alone would overcount), and Spark's CBO consults
    * attribute NDV for join estimation on scalar keys, not on nested
    * values. */
  def sketchable(t: IcebergType): Boolean = t match {
    case _: TGeometry | _: TGeography => true
    case other => thetaSupported(other)
  }

  /** The type whose serialization the sketch hashes for a column of
    * type `t`: int hashes as LONG and float as DOUBLE (the Puffin
    * spec's rule for `apache-datasketches-theta-v1` — hashing the
    * promoted type keeps sketches union-compatible across the only
    * legal type promotions, so an `ALTER COLUMN ... TYPE` widening
    * never invalidates previously-written blobs). */
  def promotedType(t: IcebergType): IcebergType = t match {
    case TInt => TLong
    case TFloat => TDouble
    case other => other
  }

  /** The type NAME a stats document records per field (`field-type`
    * blob property): the HASHED type, i.e. the promoted one — so an
    * int→long widening reads back as the same hash space and an
    * incremental union stays valid, while any other type change (or a
    * pre-promotion document without the record) forces a recompute.
    * Derived FROM promotedType so the promotion rule lives in exactly
    * one place — a divergence would let the widening guard accept a
    * cross-hash-space union or force needless recomputes. */
  def hashedTypeName(fieldType: String, t: IcebergType): String = {
    val p = promotedType(t)
    if (p == t) fieldType else p.name
  }

  /** A Spark row value → the Iceberg single-value bytes the sketch
    * hashes (the spec's standard input — values of promotable types
    * hash via [[promotedType]] — so foreign sketches of the same data
    * are union-compatible, including across widening). */
  def sketchBytes(t0: IcebergType, v: Any): Array[Byte] = {
    val t = promotedType(t0)
    (t, v) match {
    case (TLong, i: java.lang.Integer) =>
      SingleValueCodec.encode(TLong, i.longValue())
    case (TDouble, f: java.lang.Float) =>
      SingleValueCodec.encode(TDouble, f.doubleValue())
    case (TDate, d: java.sql.Date) => SingleValueCodec.encode(t, d.toLocalDate)
    case (TDate, d: java.time.LocalDate) => SingleValueCodec.encode(t, d)
    case (TTimestamptz, ts: java.sql.Timestamp) => SingleValueCodec.encode(t, ts.toInstant)
    case (TTimestamptz, i: java.time.Instant) => SingleValueCodec.encode(t, i)
    // no java.sql.Timestamp bridge for NTZ: Spark has no legacy external
    // type for TIMESTAMP_NTZ — rows always surface LocalDateTime, and a
    // Timestamp.toLocalDateTime detour would route through the JVM
    // default zone (DST-gap values would hash off-spec micros)
    case (TUuid, s: String) =>
      // uuid columns only arrive from foreign tables; one non-canonical
      // value must not fail the whole ANALYZE — hash its raw UTF-8 bytes
      // (distinctness preserved; the value is out-of-spec regardless)
      scala.util.Try(SingleValueCodec.encode(t, java.util.UUID.fromString(s)))
        .getOrElse(s.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    // geo values hash their raw WKB: good enough for the ENGINE's own
    // NDV record (distinctness of the bytes), but deliberately NOT a
    // standard blob input — thetaSupported excludes geo
    case (_: TGeometry | _: TGeography, b: Array[Byte]) => b
    case _ => SingleValueCodec.encode(t, v)
    }
  }

  def write(path: String, doc: Doc,
      thetaSketches: Map[Int, Array[Byte]] = Map.empty,
      sawEmpty: Set[Int] = Set.empty,
      fieldTypes: Map[Int, String] = Map.empty,
      bank: Map[String, PartStats] = Map.empty): Long = {
    val utf8 = java.nio.charset.StandardCharsets.UTF_8
    // the engine's own record is written ONLY for columns carrying a
    // null count; a FOREIGN-sourced column (nullCount None — e.g. an
    // expiry re-key carrying a foreign doc forward) keeps its declared
    // ndv through the STANDARD blob's property below instead of being
    // silently re-derived from the sketch estimate
    val ndvBlobs = doc.columns.toSeq
      .collect { case (fieldId, cs) if cs.nullCount.isDefined => (fieldId, cs) }
      .sortBy(_._1).map { case (fieldId, cs) =>
      val nulls = cs.nullCount.get
      val b = mapper.createObjectNode()
      b.put("ndv", cs.ndv)
      b.put("null-count", nulls)
      // empty-adjust records whether the column held an empty-bytes value
      // — the one distinct value a theta sketch body CANNOT represent
      // (update(byte[0]) is a documented no-op). Incremental ANALYZE
      // needs the flag to re-apply the +1 after unioning sketch bodies.
      // field-type records the type WHOSE single-value serialization the
      // sketch hashed (the PROMOTED one — hashedTypeName): the legal
      // widenings read back as the same hash space, so incremental
      // ANALYZE unions across them; any OTHER recorded-vs-current
      // mismatch, or a pre-promotion doc without the record, recomputes.
      Puffin.Blob("graft-ndv-v1", Seq(fieldId), doc.snapshotId, doc.snapshotId,
        Map("ndv" -> cs.ndv.toString, "null-count" -> nulls.toString,
          "empty-adjust" -> (if (sawEmpty(fieldId)) "1" else "0")) ++
          fieldTypes.get(fieldId).map("field-type" -> _),
        b.toString.getBytes(utf8))
    }
    val thetaBlobs = thetaSketches.toSeq.sortBy(_._1).map { case (fieldId, body) =>
      // the ndv PROPERTY carries the engine's corrected count (sketch
      // estimate +1 when the column held an empty-bytes value) so the
      // two blob families in one file agree; the BODY stays the
      // spec-conformant compact sketch (which cannot represent the
      // empty value — foreign unions recompute their own estimate)
      val ndv = doc.columns.get(fieldId).map(_.ndv).getOrElse {
        Math.round(org.apache.datasketches.theta.Sketches.wrapSketch(
          org.apache.datasketches.memory.Memory.wrap(body)).getEstimate)
      }
      Puffin.Blob(ThetaBlobType, Seq(fieldId), doc.snapshotId, doc.snapshotId,
        Map("ndv" -> ndv.toString), body)
    }
    // the bank rides in the SAME container: per (partition, column) one
    // engine-private blob — "partition" keys it (the manifest-derived
    // canonical tuple string, MetadataTables.partitionTuple), row-count
    // repeats the partition's row count on each of its columns so any
    // single blob reconstructs the partition's Doc-level contribution
    val bankBlobs = bank.toSeq.sortBy(_._1).flatMap { case (part, ps) =>
      ps.cols.toSeq.sortBy(_._1).map { case (fieldId, pc) =>
        Puffin.Blob(PartBlobType, Seq(fieldId), doc.snapshotId, doc.snapshotId,
          Map("partition" -> part,
            "row-count" -> ps.rowCount.toString,
            "null-count" -> pc.nullCount.toString,
            "empty-adjust" -> (if (pc.sawEmpty) "1" else "0")),
          pc.body)
      }
    }
    val (_, size) = Puffin.write(path, ndvBlobs ++ thetaBlobs ++ bankBlobs, Map(
      "snapshot-id" -> doc.snapshotId.toString,
      "row-count" -> doc.rowCount.toString))
    size
  }

  /** Read a statistics container, consuming BOTH families: the engine's
    * own `graft-ndv-v1` records win; columns carried only by standard
    * `apache-datasketches-theta-v1` blobs (a FOREIGN engine's ANALYZE)
    * still serve NDV — from the spec's `ndv` blob property when present,
    * else by deserializing the sketch itself — with no null count (the
    * sketch doesn't carry one). Interop both directions: we write the
    * standard blob for others, and read others' standard blobs. */
  def read(path: String): Doc = {
    val (raw, refs, props) = Puffin.read(path)
    docFrom(raw, refs, props)
  }

  /** A blob's body bytes, routed through its declared compression codec
    * (puffin-spec `compression-codec`) — None when the slice or the
    * decode fails, so one bad/unknown-codec blob costs ITSELF, not the
    * document. */
  private def bodyOf(raw: Array[Byte], r: Puffin.BlobRef): Option[Array[Byte]] =
    scala.util.Try(Puffin.decompress(r.codec, java.util.Arrays.copyOfRange(
      raw, r.offset.toInt, (r.offset + r.length).toInt))).toOption

  private def docFrom(raw: Array[Byte], refs: Seq[Puffin.BlobRef],
      props: Map[String, String]): Doc = {
    // per-blob recovery on BOTH families: one malformed blob (tampered
    // file, a third-party tool reusing the blob-type name) must drop
    // that column only — never throw past the caller's whole-doc Try
    // and take the healthy columns with it
    val own = refs.filter(_.blobType == "graft-ndv-v1").flatMap { r =>
      scala.util.Try(r.fields.head -> ColumnStats(
        r.properties("ndv").toLong,
        Some(r.properties("null-count").toLong))).toOption
    }.toMap
    val foreign = refs
      .filter(r => r.blobType == ThetaBlobType && r.fields.length == 1 &&
        !own.contains(r.fields.head))
      .flatMap { r =>
        // a malformed ndv property (e.g. a foreign writer rendering
        // "1.0E3") must fall to the sketch estimate
        r.properties.get("ndv").flatMap(v => scala.util.Try(v.toLong).toOption)
          .orElse(bodyOf(raw, r).flatMap(body => scala.util.Try(
            Math.round(org.apache.datasketches.theta.Sketches.wrapSketch(
              org.apache.datasketches.memory.Memory.wrap(body)).getEstimate))
            .toOption))
          .map(ndv => r.fields.head -> ColumnStats(ndv, None))
      }.toMap
    // a TRULY foreign file (Trino/Iceberg-Java ANALYZE) carries no
    // engine file-properties: tolerate their absence — the per-column
    // NDVs are the payload; -1 marks the counters unknown (consumers
    // that need them — incremental anchoring — reject negatives)
    def prop(k: String): Long = props.get(k)
      .flatMap(v => scala.util.Try(v.toLong).toOption).getOrElse(-1L)
    Doc(prop("snapshot-id"), prop("row-count"), foreign ++ own)
  }

  /** Everything the incremental-ANALYZE union needs from the anchor
    * document: the doc, the standard theta sketch BODIES (per field id,
    * union-ready), the columns whose counted values included an
    * empty-bytes value (the +1 the sketch body cannot carry), and the
    * recorded per-field TYPE whose serialization the sketch hashed
    * (absent on docs written before the property existed — the caller
    * must then recompute rather than risk a cross-type union). */
  final case class SketchDoc(doc: Doc, bodies: Map[Int, Array[Byte]],
      sawEmpty: Set[Int], fieldTypes: Map[Int, String],
      bank: Map[String, PartStats] = Map.empty)

  /** One read + parse of the container (the doc derives from the same
    * triple — on object storage this is one GET, not two). Files
    * written before `empty-adjust` existed infer the flag from ndv vs
    * the body's estimate — the +1 was the only adjustment the engine
    * ever applied. */
  def readWithSketches(path: String): SketchDoc = {
    val (raw, refs, props) = Puffin.read(path)
    // codec-aware: a compressed foreign body decompresses into a
    // union-ready sketch; an unknown codec drops that body only — the
    // incremental guard (every id must have a body) then recomputes
    val bodies = refs
      .filter(r => r.blobType == ThetaBlobType && r.fields.length == 1)
      .flatMap(r => bodyOf(raw, r).map(r.fields.head -> _)).toMap
    val ownRefs = refs.filter(r =>
      r.blobType == "graft-ndv-v1" && r.fields.nonEmpty)
    val sawEmpty = ownRefs.flatMap { r =>
      val fid = r.fields.head
      r.properties.get("empty-adjust") match {
        case Some(v) => if (v == "1") Some(fid) else None
        case None =>
          for {
            body <- bodies.get(fid)
            ndv <- r.properties.get("ndv").flatMap(v =>
              scala.util.Try(v.toLong).toOption)
            est = Math.round(org.apache.datasketches.theta.Sketches.wrapSketch(
              org.apache.datasketches.memory.Memory.wrap(body)).getEstimate)
            if ndv > est
          } yield fid
      }
    }.toSet
    val types = ownRefs.flatMap(r =>
      r.properties.get("field-type").map(r.fields.head -> _)).toMap
    // the partition sketch bank: group the per-(partition, column) blobs
    // back into PartStats; a malformed blob (foreign tampering, ancient
    // writer) drops the WHOLE bank rather than serve a partial one —
    // callers then recompute, never under-count
    val bank = scala.util.Try {
      refs.filter(_.blobType == PartBlobType)
        .groupBy(_.properties("partition"))
        .map { case (part, rs) =>
          part -> PartStats(rs.head.properties("row-count").toLong,
            rs.map { r =>
              // STRICT inside the Try: a bank blob with a malformed
              // field list, body or codec fails the whole bank here —
              // a silently-skipped blob would hand any consumer a
              // partial partition and under-count
              require(r.fields.length == 1, s"bank blob fields ${r.fields}")
              r.fields.head -> PartCol(
                Puffin.decompress(r.codec, java.util.Arrays.copyOfRange(
                  raw, r.offset.toInt, (r.offset + r.length).toInt)),
                r.properties("null-count").toLong,
                r.properties("empty-adjust") == "1")
            }.toMap)
        }
    }.getOrElse(Map.empty[String, PartStats])
    SketchDoc(docFrom(raw, refs, props), bodies, sawEmpty, types, bank)
  }
}
