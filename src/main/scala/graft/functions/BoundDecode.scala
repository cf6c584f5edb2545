package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.iceberg.{IcebergTypes, SingleValueCodec}

/** The reference's signature operator: decode the binary
  * `lower_bounds`/`upper_bounds` statistic blobs into typed, human-readable
  * values by joining each bound's column-id key against the table schema
  * (/root/reference/src/main/java/dev/liliwei/iceberg/tool/IcebergDatumWriter.java:84-95,149-160,194-202).
  *
  * Semantically a broadcast hash join (bound entries ⋈ schema on field-id)
  * followed by a type-dispatched decode. The id→type dictionary is tiny
  * (one entry per column), so it travels in the function closure — Spark
  * broadcasts task binaries, making this the degenerate-broadcast-join plan
  * the reference hand-rolls.
  *
  * Robustness over the reference: a column id missing from the current
  * schema (dropped column) yields `value:<hex>;type:unknown` instead of an
  * NPE (reference quirk 3, SURVEY.md §2.1), and decoding keys off the map
  * field itself, not the Avro record name "r2" (quirk 2).
  */
object BoundDecode {

  /** Decoded rendering `value:<v>;type:<t>` for every entry of a
    * map<int, binary> bounds column. */
  def decodeBoundsUdf(idToType: Map[Int, String]) = {
    val parsed = idToType.view.mapValues(IcebergTypes.fromStringOpt).toMap
    udf { m: Map[Int, Array[Byte]] =>
      if (m == null) null
      else m.map { case (id, bytes) =>
        id -> (parsed.get(id).flatten match {
          case Some(t) => SingleValueCodec.render(t, bytes)
          case None =>
            val hex = if (bytes == null) "" else bytes.map("%02x".format(_)).mkString
            s"value:$hex;type:unknown"
        })
      }
    }
  }

  /** One decoded bound as its natural string value (no render wrapper) —
    * feed for stats-based pruning casts. */
  def decodeOneUdf(idToType: Map[Int, String]) = {
    val parsed = idToType.view.mapValues(IcebergTypes.fromStringOpt).toMap
    udf { (m: Map[Int, Array[Byte]], id: Int) =>
      if (m == null) null
      else m.get(id).flatMap { bytes =>
        parsed.get(id).flatten.map(t => String.valueOf(SingleValueCodec.decode(t, bytes)))
      }.orNull
    }
  }

  /** Rewrites a manifest-entries DataFrame so `data_file.lower_bounds` /
    * `data_file.upper_bounds` carry decoded renderings. */
  def withDecodedBounds(entries: DataFrame, idToType: Map[Int, String]): DataFrame = {
    val dec = decodeBoundsUdf(idToType)
    entries.withColumn("data_file",
      col("data_file")
        .withField("lower_bounds", dec(col("data_file.lower_bounds")))
        .withField("upper_bounds", dec(col("data_file.upper_bounds"))))
  }

  def decodedBound(idToType: Map[Int, String], boundsCol: Column, fieldId: Int): Column =
    decodeOneUdf(idToType)(boundsCol, lit(fieldId))
}
