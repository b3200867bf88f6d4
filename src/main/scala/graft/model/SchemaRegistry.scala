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

  val default: VersionedSchemaSet = VersionedSchemaSet(Seq(eventPayloadV1))
}
