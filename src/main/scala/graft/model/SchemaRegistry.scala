package graft.model

import java.security.MessageDigest

import org.apache.avro.Schema

/** A writer schema version of one logical source.
  *
  * Reference: databus-core/databus-core-schemas/.../VersionedSchema.java:1,
  * VersionedSchemaId.java:1. Schemas are identified *by MD5 digest inside
  * each event* (SchemaId; DbusEvent.java:36) and resolved at decode time.
  */
case class VersionedSchema(sourceName: String, version: Short, schemaJson: String) {
  lazy val schema: Schema = new Schema.Parser().parse(schemaJson)
  /** MD5 of the canonical schema text — the 16-byte SchemaId carried in the
    * event envelope (DbusEventAvroDecoder resolves writer schema by it). */
  lazy val digest: Array[Byte] =
    MessageDigest.getInstance("MD5").digest(schemaJson.getBytes("UTF-8"))
  def digestHex: String = digest.map("%02x".format(_)).mkString
}

/** Digest-keyed, version-keyed schema set.
  *
  * Reference: VersionedSchemaSet.java:1 + SchemaRegistryService.java:1
  * (file-system-backed provider). The decode path looks up the *writer*
  * schema by the digest found in the event; readers use the latest version
  * (DbusEventAvroDecoder.getGenericRecord).
  */
case class VersionedSchemaSet(schemas: Seq[VersionedSchema]) {
  private val byDigest: Map[String, VersionedSchema] =
    schemas.map(s => s.digestHex -> s).toMap
  private val bySource: Map[String, Seq[VersionedSchema]] =
    schemas.groupBy(_.sourceName)

  def getByDigest(digest: Array[Byte]): Option[VersionedSchema] =
    byDigest.get(digest.map("%02x".format(_)).mkString)
  def getLatest(sourceName: String): Option[VersionedSchema] =
    bySource.get(sourceName).map(_.maxBy(_.version))
  def getByVersion(sourceName: String, version: Short): Option[VersionedSchema] =
    bySource.get(sourceName).flatMap(_.find(_.version == version))
  def add(s: VersionedSchema): VersionedSchemaSet = copy(schemas = schemas :+ s)
}

/** Filesystem-backed schema-set provider: recursively loads
  * `<sourceName>.<version>.avsc` files from one or more directories.
  *
  * Reference: FileSystemVersionedSchemaSetProvider.java:1 (file-name
  * pattern `(.*)\.(\d+).avsc`, recursive directory walk, suffix filter);
  * files without a parseable version are skipped, unreadable roots throw.
  *
  * The walk goes through the Hadoop `FileSystem` API
  * ([[graft.pipeline.StoreFs]]), not `java.io.File`: a registry rooted
  * on a non-local URI (hdfs://, file:) would otherwise load ZERO
  * schemas without an error — and every digest lookup downstream would
  * fail at decode time deep inside a query instead of at registry load.
  * Missing roots still throw (the reference's unreadable-root
  * contract); registry trees are tens of files, so the driver-side walk
  * is registry-sized, never data-sized.
  */
object FileSystemSchemaProvider {

  private val FileName = """(.*)\.(\d+)\.avsc""".r

  def loadSchemas(dirs: Seq[java.io.File],
      suffix: String): VersionedSchemaSet =
    loadSchemasFrom(dirs.map(_.getPath), suffix)

  def loadSchemas(dirs: Seq[java.io.File]): VersionedSchemaSet =
    loadSchemasFrom(dirs.map(_.getPath), ".avsc")

  def loadSchemasFrom(dirs: Seq[String],
      suffix: String = ".avsc"): VersionedSchemaSet = {
    import graft.pipeline.StoreFs
    def walk(path: String): Seq[VersionedSchema] = {
      val (fs, p) = StoreFs.fsPath(path)
      if (!fs.exists(p))
        throw new IllegalArgumentException(
          s"File does not exist or cannot be read: $path")
      val st = fs.getFileStatus(p)
      if (st.isDirectory)
        fs.listStatus(p).sortBy(_.getPath.getName)
          .flatMap(c => walk(c.getPath.toString)).toSeq
      else if (st.getPath.getName.endsWith(suffix))
        st.getPath.getName match {
          case FileName(source, version) =>
            Seq(VersionedSchema(source, version.toShort,
              new String(StoreFs.readBytesOpt(path).get, "UTF-8")))
          case _ => Seq.empty // suffix matches but no version segment
        }
      else Seq.empty
    }
    VersionedSchemaSet(dirs.flatMap(walk))
  }

  def loadSchemas(dir: String): VersionedSchemaSet =
    loadSchemasFrom(Seq(dir))
}

class NoSuchSchemaException(msg: String) extends RuntimeException(msg)

/** The engine's SchemaRegistryService surface over a [[VersionedSchemaSet]]
  * (SchemaRegistryService.java:25-75: registerSchema / fetchSchema by
  * hex digest / latest-by-source / all-versions-by-source / schema id for
  * (source, version)). Thread-safe; `snapshot` hands the immutable set to
  * decode paths (AvroCodec.decodeByDigest). */
class SchemaRegistry(initial: VersionedSchemaSet = VersionedSchemaSet.empty) {
  @volatile private var set = initial

  def registerSchema(s: VersionedSchema): Unit = synchronized { set = set.add(s) }

  def snapshot: VersionedSchemaSet = set

  def fetchSchema(schemaIdHex: String): String =
    set.schemas.find(_.digestHex == schemaIdHex.toLowerCase)
      .getOrElse(throw new NoSuchSchemaException(s"no schema with id $schemaIdHex"))
      .schemaJson

  def fetchLatestSchemaBySourceName(source: String): String =
    set.getLatest(source)
      .getOrElse(throw new NoSuchSchemaException(s"no schemas for $source"))
      .schemaJson

  def fetchAllSchemaVersionsBySourceName(source: String): Map[Short, String] = {
    val vs = set.schemas.filter(_.sourceName == source)
    if (vs.isEmpty) throw new NoSuchSchemaException(s"no schemas for $source")
    vs.map(v => v.version -> v.schemaJson).toMap
  }

  def fetchSchemaIdForSourceNameAndVersion(source: String, version: Int): String =
    set.getByVersion(source, version.toShort)
      .getOrElse(throw new NoSuchSchemaException(
        s"no schema for $source v$version"))
      .digestHex
}

object VersionedSchemaSet {
  val empty: VersionedSchemaSet = VersionedSchemaSet(Nil)

  /** The feed's payload schema for the testdata `events` table — a flat
    * record of nullable unions, the shape the reference's Oracle factory
    * emits (OracleAvroGenericEventFactory.java:444-463; cf. the example
    * Person.1.avsc fixture). */
  val eventPayloadV1: VersionedSchema = VersionedSchema(
    "events", 1,
    """{"type":"record","name":"EventPayload","namespace":"graft.events",
      |"fields":[
      |{"name":"event_id","type":["long","null"],"meta":"pk=key;dbFieldPosition=0"},
      |{"name":"user_id","type":["long","null"],"meta":"dbFieldPosition=1"},
      |{"name":"event_type","type":["string","null"],"meta":"dbFieldPosition=2"},
      |{"name":"value","type":["double","null"],"meta":"dbFieldPosition=3"},
      |{"name":"props","type":["string","null"],"meta":"dbFieldPosition=4"}
      |]}""".stripMargin.replaceAll("\n", ""))

  /** A second registered source with a NESTED payload schema — flat fields
    * of every simple type the reference factory supports (BOOLEAN, BYTES/
    * BLOB, DOUBLE, FLOAT, INT, LONG incl. DATE/TIMESTAMP-as-millis, STRING/
    * CLOB) plus an ARRAY-of-RECORD collection, the exact shape
    * OracleAvroGenericEventFactory walks (putSimpleValue :519-612,
    * putArray :348-392). Exercised end-to-end by q_decode_generic. */
  val orderWithItemsV1: VersionedSchema = VersionedSchema(
    "orders_nested", 1,
    """{"type":"record","name":"OrderWithItems","namespace":"graft.orders",
      |"fields":[
      |{"name":"o_orderkey","type":["long","null"]},
      |{"name":"o_urgent","type":["boolean","null"]},
      |{"name":"o_bucket","type":["int","null"]},
      |{"name":"o_rate","type":["float","null"]},
      |{"name":"o_totalprice","type":["double","null"]},
      |{"name":"o_blob","type":["bytes","null"]},
      |{"name":"o_clob","type":["string","null"]},
      |{"name":"o_date_ms","type":["long","null"]},
      |{"name":"items","type":{"type":"array","items":
      |{"type":"record","name":"OrderItem","fields":[
      |{"name":"l_linenumber","type":["int","null"]},
      |{"name":"l_quantity","type":["double","null"]},
      |{"name":"l_returnflag","type":["string","null"]}]}}}
      |]}""".stripMargin.replaceAll("\n", ""))

  val default: VersionedSchemaSet =
    VersionedSchemaSet(Seq(eventPayloadV1, orderWithItemsV1))
}
