package graft.functions

import java.nio.ByteBuffer

import scala.jdk.CollectionConverters._

import org.apache.avro.Schema
import org.apache.avro.Schema.Type
import org.apache.avro.generic.{GenericData, GenericRecord}
import org.apache.avro.util.Utf8
import org.apache.spark.sql.{Column, Row}
import org.apache.spark.sql.api.java.UDF1
import org.apache.spark.sql.functions.udf
import org.apache.spark.sql.types._

/** Schema-walking Avro payload codec — the generic event factory.
  *
  * The reference's Oracle factory materializes *any* registered source's
  * rows into Avro by walking the payload schema field by field
  * (OracleAvroGenericEventFactory.java:613-702 `put`): nullable unions are
  * unwound (:630), simple values BOOLEAN/BYTES/DOUBLE/FLOAT/INT/LONG/STRING
  * convert with BLOB→bytes, CLOB/SQLXML→string, DATE/TIMESTAMP→epoch-millis
  * coercions (putSimpleValue :519-612), nested RECORDs recurse
  * (addOracleRecordToParent :395-417), ARRAY-of-RECORD explodes a DB
  * collection (putArray :348-392), and ENUM/MAP/FIXED/UNION are rejected
  * (:693-702). This object is the Spark-side equivalent: one walk derives
  * the Catalyst [[StructType]] for a schema, and encode/decode walk rows
  * against that same schema, so ANY flat-or-nested record a user registers
  * rides the engine's payload path — not just the fixture `events` shape.
  *
  * Runs only at pipeline *edges* (producer append / consumer dispatch); the
  * serving path keeps payloads as opaque `BinaryType` (zero-deserialization
  * relay, DbusEventBuffer.java:2235-2420).
  */
object GenericAvroCodec {

  /** Unwind a nullable union `[T, "null"]` / `["null", T]` →
    * (T, nullable=true); a bare schema → (schema, false). Any other UNION
    * shape is rejected, matching the reference's unwind + UNION-case throw
    * (SchemaHelper.unwindUnionSchema; OracleAvroGenericEventFactory
    * .java:697-701). */
  def unwind(schema: Schema): (Schema, Boolean) =
    if (schema.getType != Type.UNION) (schema, false)
    else {
      val branches = schema.getTypes.asScala
      val nonNull = branches.filter(_.getType != Type.NULL)
      if (nonNull.size == 1 && branches.size <= 2) (nonNull.head, true)
      else throw new IllegalArgumentException(
        s"unsupported union (only [T, null] is known): $schema")
    }

  /** Avro schema → Catalyst type, same type menu the reference factory
    * supports (and the same rejections). */
  def sparkType(schema: Schema): DataType = {
    val (s, _) = unwind(schema)
    s.getType match {
      case Type.BOOLEAN => BooleanType
      case Type.BYTES   => BinaryType
      case Type.DOUBLE  => DoubleType
      case Type.FLOAT   => FloatType
      case Type.INT     => IntegerType
      case Type.LONG    => LongType
      case Type.STRING  => StringType
      case Type.NULL    => NullType
      case Type.RECORD  => StructType(s.getFields.asScala.map { f =>
        val (_, nullable) = unwind(f.schema())
        StructField(f.name(), sparkType(f.schema()), nullable)
      }.toArray)
      case Type.ARRAY =>
        val (elem, elemNullable) = unwind(s.getElementType)
        if (elem.getType != Type.RECORD)
          throw new IllegalArgumentException(
            s"array element must be a record (putArray): ${s.getElementType}")
        ArrayType(sparkType(elem), containsNull = elemNullable)
      case t => // ENUM | MAP | FIXED (UNION handled by unwind)
        throw new IllegalArgumentException(
          s"Don't know how to populate this type of field: $t")
    }
  }

  def structTypeFor(schemaJson: String): StructType =
    sparkType(SchemaCache.get(schemaJson)) match {
      case st: StructType => st
      case other => throw new IllegalArgumentException(
        s"top-level schema must be a record, got $other")
    }

  // ---------------------------------------------------------------- encode

  /** Row → GenericRecord by schema walk; fields resolve BY NAME against the
    * row (robust to extra/reordered struct fields, like the factory's
    * dbFieldPosition-by-meta resolution). */
  private def encodeRecord(row: Row, schema: Schema, path: String): GenericRecord = {
    val rec = new GenericData.Record(schema)
    schema.getFields.asScala.foreach { f =>
      val (fs, nullable) = unwind(f.schema())
      // a struct missing the field entirely = a source without that column
      // = null (the reference's nullable-field null handling, :633-641);
      // only a MISSING NON-NULLABLE field is a shape error
      val idx = try row.fieldIndex(f.name()) catch {
        case _: IllegalArgumentException =>
          if (nullable || fs.getType == Type.NULL) -1
          else throw new IllegalArgumentException(
            s"input struct has no field '${f.name()}' required by schema at $path")
      }
      val v = if (idx < 0 || row.isNullAt(idx)) null else row.get(idx)
      if (v == null) {
        // null + non-nullable is an error, not a silent null
        // (OracleAvroGenericEventFactory.java:633-641)
        if (!nullable && fs.getType != Type.NULL)
          throw new IllegalArgumentException(
            s"Null value not allowed for field $path${f.name()}")
        rec.put(f.name(), null)
      } else rec.put(f.name(), encodeValue(v, fs, s"$path${f.name()}."))
    }
    rec
  }

  private def encodeValue(v: Any, s: Schema, path: String): AnyRef =
    s.getType match {
      case Type.BOOLEAN => java.lang.Boolean.valueOf(v.asInstanceOf[Boolean])
      case Type.BYTES   => ByteBuffer.wrap(v.asInstanceOf[Array[Byte]])
      case Type.DOUBLE  => java.lang.Double.valueOf(v.asInstanceOf[Number].doubleValue)
      case Type.FLOAT   => java.lang.Float.valueOf(v.asInstanceOf[Number].floatValue)
      case Type.INT     => java.lang.Integer.valueOf(v.asInstanceOf[Number].intValue)
      case Type.LONG => v match {
        // DATE / TIMESTAMP ride LONG as epoch millis
        // (putSimpleValue LONG arm, :549-601)
        case ts: java.sql.Timestamp   => java.lang.Long.valueOf(ts.getTime)
        case d: java.sql.Date         => java.lang.Long.valueOf(d.getTime)
        case i: java.time.Instant     => java.lang.Long.valueOf(i.toEpochMilli)
        case ld: java.time.LocalDate  => java.lang.Long.valueOf(ld.toEpochDay * 86400000L)
        case n: Number                => java.lang.Long.valueOf(n.longValue)
        case other => throw new IllegalArgumentException(
          s"Cannot convert ${other.getClass} to long for field $path")
      }
      case Type.STRING  => v.toString // CLOB/XML equivalents are strings here
      case Type.NULL    => null
      case Type.RECORD  => encodeRecord(v.asInstanceOf[Row], s, path)
      case Type.ARRAY =>
        val (elem, _) = unwind(s.getElementType)
        val seq = v.asInstanceOf[scala.collection.Seq[Any]]
        val arr = new GenericData.Array[AnyRef](seq.size, s)
        seq.foreach { e =>
          arr.add(if (e == null) null else encodeRecord(e.asInstanceOf[Row], elem, path))
        }
        arr
      case t => throw new IllegalArgumentException(
        s"Don't know how to populate this type of field: $t at $path")
    }

  // ---------------------------------------------------------------- decode

  private def decodeRecord(rec: GenericRecord, schema: Schema): Row =
    Row.fromSeq(schema.getFields.asScala.map { f =>
      decodeValue(rec.get(f.name()), unwind(f.schema())._1)
    }.toSeq)

  private def decodeValue(v: AnyRef, s: Schema): Any =
    if (v == null) null
    else s.getType match {
      case Type.STRING => v match {
        case u: Utf8 => u.toString
        case other   => other.toString
      }
      case Type.BYTES =>
        val bb = v.asInstanceOf[ByteBuffer]
        val out = new Array[Byte](bb.remaining())
        bb.duplicate().get(out)
        out
      case Type.RECORD => decodeRecord(v.asInstanceOf[GenericRecord], s)
      case Type.ARRAY =>
        val (elem, _) = unwind(s.getElementType)
        v.asInstanceOf[java.util.Collection[AnyRef]].asScala
          .map(e => if (e == null) null
                    else decodeRecord(e.asInstanceOf[GenericRecord], elem)).toSeq
      case _ => v // BOOLEAN/DOUBLE/FLOAT/INT/LONG boxed primitives pass through
    }

  // --------------------------------------------------------------- columns

  /** struct column (fields resolved by name) → Avro binary. */
  def encode(schemaJson: String): Column => Column = {
    val f = udf(new UDF1[Row, Array[Byte]] {
      override def call(row: Row): Array[Byte] =
        if (row == null) null
        else {
          val schema = SchemaCache.get(schemaJson)
          AvroCodec.serialize(encodeRecord(row, schema, ""), schema)
        }
    }, BinaryType)
    (payloadStruct: Column) => f(payloadStruct)
  }

  /** Avro binary → struct column with the schema-derived shape
    * (writer = reader). */
  def decode(schemaJson: String): Column => Column = decodeEvolved(schemaJson, schemaJson)

  /** Decode with schema *evolution*: writer schema per row group, reader
    * fixed — Avro resolution drops/defaults fields; output shape = reader. */
  def decodeEvolved(writerJson: String, readerJson: String): Column => Column = {
    val dt = structTypeFor(readerJson)
    val f = udf(new UDF1[Array[Byte], Row] {
      override def call(bytes: Array[Byte]): Row =
        if (bytes == null) null
        else {
          val reader = SchemaCache.get(readerJson)
          decodeRecord(
            AvroCodec.deserialize(bytes, SchemaCache.get(writerJson), reader),
            reader)
        }
    }, dt)
    (bytes: Column) => f(bytes)
  }

  /** Per-executor schema parse cache (ship JSON, parse once per JVM). */
  private[functions] object SchemaCache {
    private val cache = new java.util.concurrent.ConcurrentHashMap[String, Schema]()
    def get(json: String): Schema =
      cache.computeIfAbsent(json, j => new Schema.Parser().parse(j))
  }
}
