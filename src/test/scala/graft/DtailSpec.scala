package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.functions.AvroCodec
import graft.model.VersionedSchemaSet
import graft.sources.ChangeFeed
import graft.streaming.{Dtail, RelayStream}

/** K4 — dtail output formats, BOB/EOB start modes, and the `-n` cap
  * (DtailCliBase.java:34-60 surface). */
class DtailSpec extends SparkSpec {
  import spark.implicits._

  private lazy val envelope = ChangeFeed.envelope(spark, sf()).limit(100)

  test("JSON format renders whole events; every field survives") {
    val lines = Dtail.format(envelope, "JSON").as[String].collect()
    assert(lines.length == 100)
    val parsed = spark.read.json(spark.createDataset(lines))
    assert(parsed.columns.toSet.intersect(
      Set("scn", "seq", "source_id", "opcode", "key_long")).size == 5)
    assert(parsed.agg(countDistinct($"seq")).head().getLong(0) == 100)
  }

  test("AVRO_JSON renders the payload record only") {
    val lines = Dtail.format(envelope, "AVRO_JSON").as[String].collect()
    assert(lines.length == 100)
    assert(lines.forall(l => l.contains("\"event_id\"") &&
      l.contains("\"event_type\"") && !l.contains("\"scn\"")))
  }

  test("AVRO_BIN is real Avro binary (base64-armored, decodable)") {
    val line = Dtail.format(envelope.limit(1), "AVRO_BIN")
      .as[String].head()
    val bytes = java.util.Base64.getDecoder.decode(line)
    val schema = VersionedSchemaSet.eventPayloadV1.schema
    val rec = AvroCodec.deserialize(bytes, schema, schema)
    assert(rec.get("event_id") != null)
  }

  test("EVENT_INFO prints header metadata; NOOP prints nothing") {
    val info = Dtail.format(envelope, "EVENT_INFO").as[String].collect()
    assert(info.length == 100 &&
      info.forall(l => l.startsWith("scn:") && l.contains(" op:")))
    assert(Dtail.format(envelope, "NOOP").count() == 0)
  }

  test("BOB/EOB/scn start-position resolution") {
    assert(Dtail.parseScnSpec("BOB") == Dtail.BobScn)
    assert(Dtail.parseScnSpec("eob") == Dtail.EobScn)
    assert(Dtail.parseScnSpec("1234") == 1234L)

    val logDir = Files.createTempDirectory("dtail-log").toString
    RelayStream.writeEventLog(ChangeFeed.envelope(spark, sf()), logDir,
      filesHint = 4)
    val bob = Dtail.startCheckpoint(spark, logDir, Dtail.BobScn)
    assert(bob.isFlexible)
    val eob = Dtail.startCheckpoint(spark, logDir, Dtail.EobScn)
    assert(eob.windowScn == RelayStream.bufferInfo(spark, logDir)._2)

    // tail with -n cap: exactly n lines, scn-ordered within batches
    val out = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    Dtail.tail(spark, logDir, "BOB", "EVENT_INFO", maxEvents = 7,
      out = out.add(_)).awaitTermination()
    assert(out.size() == 7)

    // EOB start: the head window is fully consumed → nothing to print
    val out2 = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    Dtail.tail(spark, logDir, "EOB", "JSON", maxEvents = 100,
      out = out2.add(_)).awaitTermination()
    assert(out2.isEmpty)
  }
}
