package graft.functions

import java.io.ByteArrayOutputStream

import org.apache.avro.Schema
import org.apache.avro.generic.{GenericData, GenericDatumReader, GenericDatumWriter, GenericRecord}
import org.apache.avro.io.{DecoderFactory, EncoderFactory}
import org.apache.spark.sql.Column
import org.apache.spark.sql.functions.udf

/** Decoded events-payload record (struct column shape). */
case class DecodedEventPayload(
    event_id: Option[Long], user_id: Option[Long], event_type: Option[String],
    value: Option[Double], props: Option[String])

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

  /** Encode (event_id, user_id, event_type, value, props) → Avro binary with
    * the events payload schema. Fields are nullable unions [type, null],
    * matching the reference's factory output (OracleAvroGenericEventFactory
    * .java:528-702). */
  def encodeEventPayload(schemaJson: String): Column => Column = {
    val enc = udf { (eventId: java.lang.Long, userId: java.lang.Long,
                     eventType: String, value: java.lang.Double, props: String) =>
      val schema = SchemaHolder.get(schemaJson)
      val rec = new GenericData.Record(schema)
      rec.put("event_id", eventId)
      rec.put("user_id", userId)
      rec.put("event_type", eventType)
      rec.put("value", value)
      rec.put("props", props)
      serialize(rec, schema)
    }
    (payloadStruct: Column) => enc(
      payloadStruct.getField("event_id"), payloadStruct.getField("user_id"),
      payloadStruct.getField("event_type"), payloadStruct.getField("value"),
      payloadStruct.getField("props"))
  }

  /** Decode Avro binary back to a struct column (writer schema = reader
    * schema here; schema-evolution resolution goes through
    * `decodeWith(writer, reader)`). */
  def decodeEventPayload(schemaJson: String): Column => Column = {
    val dec = udf { (bytes: Array[Byte]) =>
      if (bytes == null) None
      else {
        val schema = SchemaHolder.get(schemaJson)
        val rec = deserialize(bytes, schema, schema)
        def l(f: String): Option[Long] =
          Option(rec.get(f)).map(_.asInstanceOf[java.lang.Long].longValue)
        def s(f: String): Option[String] = Option(rec.get(f)).map(_.toString)
        def d(f: String): Option[Double] =
          Option(rec.get(f)).map(_.asInstanceOf[java.lang.Double].doubleValue)
        Some(DecodedEventPayload(l("event_id"), l("user_id"), s("event_type"),
          d("value"), s("props")))
      }
    }
    (bytes: Column) => dec(bytes)
  }

  /** Decode with schema *evolution*: writer schema resolved per row group,
    * reader schema fixed (Avro resolution drops/defaults fields). */
  def decodeEventPayloadEvolved(writerJson: String, readerJson: String)
      : Column => Column = {
    val dec = udf { (bytes: Array[Byte]) =>
      if (bytes == null) None
      else {
        val writer = SchemaHolder.get(writerJson)
        val reader = SchemaHolder.get(readerJson)
        val rec = deserialize(bytes, writer, reader)
        def l(f: String): Option[Long] =
          Option(rec.get(f)).map(_.asInstanceOf[java.lang.Long].longValue)
        def s(f: String): Option[String] = Option(rec.get(f)).map(_.toString)
        def d(f: String): Option[Double] =
          Option(rec.get(f)).map(_.asInstanceOf[java.lang.Double].doubleValue)
        Some(DecodedEventPayload(l("event_id"), l("user_id"), s("event_type"),
          d("value"), s("props")))
      }
    }
    (bytes: Column) => dec(bytes)
  }

  /** J2 / SURVEY §7.4 — schema-by-digest decode of mixed-version payloads
    * in one column: the writer schema of each event is identified by the
    * 16-byte MD5 `schema_id` it carries; rows are grouped by digest,
    * decoded with their own writer schema against the common reader
    * schema, and unioned (DbusEventAvroDecoder.getGenericRecord resolves
    * `_schemaSet.getById(schemaId)` the same way).
    *
    * The per-digest split is a predicate on a 16-byte column — cheap, and
    * each branch scans only its slice (at scale, distinct digests per
    * source are few: schema versions, not rows). */
  def decodeByDigest(df: org.apache.spark.sql.DataFrame,
      set: graft.model.VersionedSchemaSet, sourceName: String,
      payloadCol: String = "payload", schemaIdCol: String = "schema_id")
      : org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.functions.{col, lower, hex, lit}
    val reader = set.getLatest(sourceName).getOrElse(
      throw new IllegalArgumentException(s"no schema for $sourceName"))
    val versions = set.schemas.filter(_.sourceName == sourceName)
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

  /** Per-executor schema parse cache (Schema isn't serializable-friendly to
    * close over; ship JSON, parse once per JVM). */
  private object SchemaHolder {
    private val cache = new java.util.concurrent.ConcurrentHashMap[String, Schema]()
    def get(json: String): Schema =
      cache.computeIfAbsent(json, j => new Schema.Parser().parse(j))
  }
}
