package graft.functions

import java.io.ByteArrayOutputStream

import org.apache.avro.Schema
import org.apache.avro.generic.{GenericDatumReader, GenericDatumWriter, GenericRecord}
import org.apache.avro.io.{DecoderFactory, EncoderFactory}
import org.apache.spark.sql.Column

/** Avro-binary payload codec.
  *
  * The Spark distribution here ships without the spark-avro external module,
  * so payload encode/decode is a thin Generic-API codec over the bundled
  * avro jars. This runs only at the pipeline *edges* (producer append /
  * consumer dispatch) — the serving path keeps payloads as opaque
  * `BinaryType`, matching the reference's zero-deserialization relay
  * (DbusEventBuffer.java:2235-2420 streams raw bytes; decode happens in
  * DbusEventAvroDecoder.getGenericRecord on the client).
  *
  * Writer-schema-by-digest dispatch (SURVEY.md §7.4): group rows by
  * schemaId, decode each group with its resolved writer schema, union —
  * done by the caller; this codec handles one schema at a time.
  */
object AvroCodec {

  /** Encode a payload struct → Avro binary. Delegates to the schema-walking
    * [[GenericAvroCodec]] (fields resolve by name against the struct), so
    * the same path carries the fixture `events` record and any user-
    * registered schema (OracleAvroGenericEventFactory.java:528-702). */
  def encodeEventPayload(schemaJson: String): Column => Column =
    GenericAvroCodec.encode(schemaJson)

  /** Decode Avro binary back to a struct column (writer schema = reader
    * schema here; schema-evolution resolution goes through
    * [[decodeEventPayloadEvolved]]). */
  def decodeEventPayload(schemaJson: String): Column => Column =
    GenericAvroCodec.decode(schemaJson)

  /** Decode with schema *evolution*: writer schema resolved per row group,
    * reader schema fixed (Avro resolution drops/defaults fields; output
    * shape = READER schema, so a v2 reader surfaces defaulted new fields). */
  def decodeEventPayloadEvolved(writerJson: String, readerJson: String)
      : Column => Column =
    GenericAvroCodec.decodeEvolved(writerJson, readerJson)

  /** J2 / SURVEY §7.4 — schema-by-digest decode of mixed-version payloads
    * in one column: the writer schema of each event is identified by the
    * 16-byte MD5 `schema_id` it carries; rows are grouped by digest,
    * decoded with their own writer schema against the common reader
    * schema, and unioned (DbusEventAvroDecoder.getGenericRecord resolves
    * `_schemaSet.getById(schemaId)` the same way).
    *
    * The per-digest split is a predicate on a 16-byte column — cheap, and
    * each branch scans only its slice (at scale, distinct digests per
    * source are few: schema versions, not rows).
    *
    * Rows whose digest the registry does not resolve have NO branch and
    * silently drop — the operational default (the reference's decoder
    * skips events it cannot resolve rather than halting the relay), with
    * [[graft.pipeline.StoreFsck.schemaCoverage]] as the audit that
    * surfaces them. `strict = true` inverts the trade for pipelines
    * where a dropped row is worse than a halted job (training-data
    * extraction, compliance scans): one digest-count-sized
    * distinct-aggregate up front fails the query loudly, naming the
    * unresolvable digests, before any slice decodes. */
  def decodeByDigest(df: org.apache.spark.sql.DataFrame,
      set: graft.model.VersionedSchemaSet, sourceName: String,
      payloadCol: String = "payload", schemaIdCol: String = "schema_id",
      strict: Boolean = false): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.functions.{col, lower, hex, lit}
    val reader = set.getLatest(sourceName).getOrElse(
      throw new IllegalArgumentException(s"no schema for $sourceName"))
    val versions = set.schemas.filter(_.sourceName == sourceName)
    if (strict) {
      // the guard must mirror the decode branches EXACTLY: branches below
      // cover only THIS source's schema versions, so a digest registered
      // under a different source still has no branch and would drop —
      // building `known` from all sources' schemas would wave it through
      val known = versions.map(_.digestHex).toSet
      val unknown = df.select(lower(hex(col(schemaIdCol))).as("d"))
        .distinct().collect().map(_.getString(0)).filterNot(known)
      require(unknown.isEmpty,
        s"decodeByDigest(strict): ${unknown.length} digest(s) resolve to" +
          s" no schema registered for source '$sourceName' — rows would" +
          s" silently drop: ${unknown.take(5).mkString(", ")}")
    }
    versions.map { vs =>
      val dec = decodeEventPayloadEvolved(vs.schemaJson, reader.schemaJson)
      df.where(lower(hex(col(schemaIdCol))) === lit(vs.digestHex))
        .withColumn("payload_rec", dec(col(payloadCol)))
    }.reduce(_ unionByName _)
  }

  def serialize(rec: GenericRecord, schema: Schema): Array[Byte] = {
    val out = new ByteArrayOutputStream()
    val encoder = EncoderFactory.get().binaryEncoder(out, null)
    new GenericDatumWriter[GenericRecord](schema).write(rec, encoder)
    encoder.flush()
    out.toByteArray
  }

  def deserialize(bytes: Array[Byte], writer: Schema, reader: Schema): GenericRecord = {
    val decoder = DecoderFactory.get().binaryDecoder(bytes, null)
    new GenericDatumReader[GenericRecord](writer, reader).read(null, decoder)
  }

}
