package graft

import graft.functions.AvroCodec
import graft.model._
import graft.operators.Integrity
import graft.sources.{SyntheticFeed, TxlogCapture}
import graft.streaming.RelayStream

import org.apache.spark.sql.functions._

/** S1 capture, S7 synthetic feed, S9 chained relay, P16 CRC, C2 checkpoint
  * store, J2 digest-dispatch decode. */
class CaptureSpec extends SparkSpec {
  import spark.implicits._

  test("txlog capture query shapes mirror the reference SQL") {
    val q = TxlogCapture.captureQuery("person")
    assert(q.startsWith("select tx.scn scn, tx.ts event_timestamp, src.*"))
    assert(q.contains("sy$person src") && q.contains("sy$txlog tx"))
    assert(q.contains("src.txn=tx.txn and tx.scn > ?"))
    val c = TxlogCapture.chunkedCaptureQuery("person", "s.")
    assert(c.contains("row_number() OVER (ORDER BY TX.SCN) r"))
    assert(c.contains("src.txn = t.txn AND r <= ?"))
  }

  test("declarative capture joins the txlog tail incrementally") {
    val txlog = Seq((1L, 10L, 111L), (2L, 20L, 222L), (3L, 30L, 333L))
      .toDF("txn", "scn", "ts")
    val view = Seq((1L, "a"), (2L, "b"), (3L, "c"), (3L, "c2"))
      .toDF("txn", "payload")
    val got = TxlogCapture.capture(view, txlog, sinceScn = 10L)
    assert(got.count() == 3) // txns 2 and 3 (3 has two rows)
    assert(got.where($"scn" <= 10).count() == 0)
    val chunked = TxlogCapture.captureChunked(view, txlog, 0L, chunkTxns = 2)
    assert(chunked.select("txn").as[Long].collect().toSet == Set(1L, 2L))
  }

  test("synthetic feed is deterministic and window-aligned") {
    val a = SyntheticFeed.generate(spark, 1000).collect()
    val b = SyntheticFeed.generate(spark, 1000).collect()
    assert(a.sameElements(b))
    val df = SyntheticFeed.generate(spark, 1000)
    assert(df.where($"scn" =!= $"seq" - $"seq" % 10).count() == 0)
    assert(df.select("source_id").distinct().count() == 5)
    assert(df.where($"opcode" === "DELETE").count() > 0)
  }

  test("chained relay: a relay consumes another relay's event log (S9)") {
    val dir1 = java.nio.file.Files.createTempDirectory("relay1").toString
    val dir2 = java.nio.file.Files.createTempDirectory("relay2").toString
    val feed = SyntheticFeed.generate(spark, 500)
    RelayStream.writeEventLog(feed, dir1, filesHint = 4)
    // downstream relay re-serves what it read from the upstream log
    val upstream = spark.read.schema(RelayStream.schema).parquet(dir1)
    RelayStream.writeEventLog(upstream, dir2, filesHint = 2)
    val downstream = spark.read.schema(RelayStream.schema).parquet(dir2)
    assert(downstream.count() == 500)
    assert(downstream.select("seq").as[Long].collect().toSet ==
      feed.select("seq").as[Long].collect().toSet)
    assert(RelayStream.bufferInfo(spark, dir2) ==
      RelayStream.bufferInfo(spark, dir1))
  }

  test("crc stamp + validate catches corruption") {
    val schema = VersionedSchemaSet.eventPayloadV1.schemaJson
    val enc = AvroCodec.encodeEventPayload(schema)
    val df = Seq((1L, 10L, "click", 1.0, "{}"), (2L, 20L, "view", 2.0, "{}"))
      .toDF("event_id", "user_id", "event_type", "value", "props")
      .withColumn("payload",
        enc(struct($"event_id", $"user_id", $"event_type", $"value", $"props")))
    val stamped = Integrity.withCrc(df)
    assert(Integrity.validate(stamped).count() == 0)
    // corrupt one payload → exactly that row fails
    val corrupted = stamped.withColumn("payload",
      when($"event_id" === 2L, lit(Array[Byte](1, 2, 3))).otherwise($"payload"))
    val bad = Integrity.validate(corrupted)
    assert(bad.select("event_id").as[Long].collect().toSeq == Seq(2L))
  }

  test("filesystem checkpoint store roundtrips CheckpointMult atomically") {
    val dir = java.nio.file.Files.createTempDirectory("cpstore").toString
    val store = new FileSystemCheckpointStore(dir)
    val cp = CheckpointMult(Map[Short, Checkpoint](
      (0: Short) -> Checkpoint.online(100L, 2L),
      (1: Short) -> Checkpoint(Checkpoint.BootstrapSnapshot, windowScn = 50L,
        bootstrap_since_scn = 40L, snapshot_offset = 7L)),
      cursorPartition = Some(1: Short))
    assert(store.load("c1").isEmpty)
    store.store("c1", cp)
    assert(store.load("c1").contains(cp))
    // overwrite advances
    val cp2 = cp.updated(0, Checkpoint.online(200L))
    store.store("c1", cp2)
    assert(store.load("c1").contains(cp2))
  }

  test("digest-dispatch decode handles mixed schema versions in one column") {
    val v1 = VersionedSchemaSet.eventPayloadV1
    // v2 renames nothing but reorders serialization by adding a field with
    // default — same source, new version, different digest
    val v2 = VersionedSchema("events", 2,
      v1.schemaJson.dropRight(2) +
        """,{"name":"extra","type":["string","null"],"default":"x"}]}""")
    val set = VersionedSchemaSet(Seq(v1, v2))
    assert(v1.digestHex != v2.digestHex)

    val encV1 = AvroCodec.encodeEventPayload(v1.schemaJson)
    val rows1 = Seq((1L, 10L, "click", 1.5, "{}"))
      .toDF("event_id", "user_id", "event_type", "value", "props")
      .withColumn("payload",
        encV1(struct($"event_id", $"user_id", $"event_type", $"value", $"props")))
      .withColumn("schema_id", lit(v1.digest))
    // encode a v2 row manually via the generic API
    val v2bytes = {
      val rec = new org.apache.avro.generic.GenericData.Record(v2.schema)
      rec.put("event_id", 2L); rec.put("user_id", 20L)
      rec.put("event_type", "view"); rec.put("value", 2.5)
      rec.put("props", "{}"); rec.put("extra", "hello")
      AvroCodec.serialize(rec, v2.schema)
    }
    val rows2 = Seq((2L, v2bytes)).toDF("event_id", "payload")
      .withColumn("schema_id", lit(v2.digest))
      .select($"event_id", $"payload", $"schema_id")

    val mixed = rows1.select("event_id", "payload", "schema_id")
      .unionByName(rows2)
    // reader = latest (v2): v1 rows get the default for `extra`; both decode
    val decoded = AvroCodec.decodeByDigest(mixed, set, "events")
      .select($"payload_rec.event_id", $"payload_rec.event_type")
      .as[(Option[Long], Option[String])].collect().toSet
    assert(decoded == Set((Some(1L), Some("click")), (Some(2L), Some("view"))))

    // an UNREGISTERED digest: the default silently drops its rows (the
    // reference decoder's skip-don't-halt regime, audited by
    // StoreFsck.schemaCoverage); strict mode fails the query loudly
    // BEFORE any slice decodes — for pipelines where a dropped row is
    // worse than a halted job
    val ghost = graft.model.VersionedSchema("ghost", 1,
      """{"type":"record","name":"Ghost","fields":[]}""")
    val withGhost = mixed.unionByName(mixed.limit(1)
      .select($"event_id", $"payload",
        org.apache.spark.sql.functions.lit(ghost.digest).as("schema_id")))
    assert(AvroCodec.decodeByDigest(withGhost, set, "events")
      .count() == 2L) // ghost row dropped, not decoded
    val e = intercept[IllegalArgumentException] {
      AvroCodec.decodeByDigest(withGhost, set, "events", strict = true)
    }
    assert(e.getMessage.contains("silently drop"))
    // a digest registered under a DIFFERENT source is just as branchless
    // as an unregistered one (decode branches cover only this source's
    // versions) — strict must refuse it too, not wave it through because
    // the registry knows the digest somewhere
    val otherSet = VersionedSchemaSet(Seq(v1, v2, ghost))
    val withOther = mixed.unionByName(mixed.limit(1)
      .select($"event_id", $"payload",
        org.apache.spark.sql.functions.lit(ghost.digest).as("schema_id")))
    assert(AvroCodec.decodeByDigest(withOther, otherSet, "events")
      .count() == 2L) // cross-source row dropped by the lenient default
    val e2 = intercept[IllegalArgumentException] {
      AvroCodec.decodeByDigest(withOther, otherSet, "events", strict = true)
    }
    assert(e2.getMessage.contains("source 'events'"))
    // strict on a fully-registered frame decodes identically
    assert(AvroCodec.decodeByDigest(mixed, set, "events", strict = true)
      .count() == 2L)
  }
}
