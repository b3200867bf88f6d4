package graft

import graft.model._

import org.scalatest.funsuite.AnyFunSuite

/** Mirrors the reference's TestCheckpoint / TestCheckpointMult /
  * subscription codec tests (SURVEY.md §5). */
class ModelSpec extends AnyFunSuite {

  test("checkpoint json roundtrip preserves all fields") {
    val cp = Checkpoint(Checkpoint.BootstrapCatchup, windowScn = 123L,
      windowOffset = 7L, prevScn = 100L, tsNsecs = 42L,
      bootstrap_since_scn = 90L, bootstrap_start_scn = 95L,
      bootstrap_target_scn = 130L, bootstrap_snapshot_source_index = 2,
      bootstrap_catchup_source_index = 1, snapshot_offset = 500L)
    assert(Checkpoint.fromJson(cp.toJson) == cp)
  }

  test("flexible checkpoint = start wherever data exists") {
    assert(Checkpoint.flexible.isFlexible)
    assert(!Checkpoint.online(5L).isFlexible)
    assert(Checkpoint(Checkpoint.BootstrapSnapshot).isBootstrap)
  }

  test("checkpointMult round-robin cursor wraps across partitions") {
    val m = CheckpointMult(Map[Short, Checkpoint](
      (0: Short) -> Checkpoint.online(1), (2: Short) -> Checkpoint.online(2),
      (5: Short) -> Checkpoint.online(3)))
    assert(m.nextCursor.contains(0: Short))
    assert(m.copy(cursorPartition = Some(0: Short)).nextCursor.contains(2: Short))
    assert(m.copy(cursorPartition = Some(5: Short)).nextCursor.contains(0: Short))
  }

  test("subscription uri codec: modern and legacy forms") {
    val s = Subscription.parse("cdc://3/person/1")
    assert(s == Subscription(Some(3: Short), Some("person"), Some(1: Short)))
    assert(Subscription.parse("cdc://*/person/*") ==
      Subscription(None, Some("person"), None))
    assert(Subscription.parse("com.example.Person:3") ==
      Subscription(None, Some("com.example.Person"), Some(3: Short)))
    assert(Subscription.parse("person") == Subscription(None, Some("person"), None))
    assert(s.uri == "cdc://3/person/1")
    assert(Subscription.parseList("a, b:2").map(_.logicalSource) ==
      Seq(Some("a"), Some("b")))
  }

  test("schema registry resolves by digest and by latest version") {
    val v1 = VersionedSchemaSet.eventPayloadV1
    val v2 = v1.copy(version = 2,
      schemaJson = v1.schemaJson.replace("EventPayload", "EventPayloadV2"))
    val set = VersionedSchemaSet(Seq(v1, v2))
    assert(set.getByDigest(v1.digest).contains(v1))
    assert(set.getByDigest(v2.digest).contains(v2))
    assert(set.getLatest("events").contains(v2))
    assert(set.getByVersion("events", 1).contains(v1))
    assert(set.getByDigest(Array.fill[Byte](16)(0)).isEmpty)
    assert(v1.digest.length == 16) // MD5 SchemaId width
  }

  test("filesystem provider loads name.version.avsc trees; service surface") {
    val dir = java.nio.file.Files.createTempDirectory("schemas")
    val sub = java.nio.file.Files.createDirectory(dir.resolve("nested"))
    val v1 = VersionedSchemaSet.eventPayloadV1
    val v2 = v1.copy(version = 2,
      schemaJson = v1.schemaJson.replace("EventPayload", "EventPayloadV2"))
    java.nio.file.Files.writeString(dir.resolve("events.1.avsc"), v1.schemaJson)
    java.nio.file.Files.writeString(sub.resolve("events.2.avsc"), v2.schemaJson)
    java.nio.file.Files.writeString(dir.resolve("notes.txt"), "ignored")
    java.nio.file.Files.writeString(dir.resolve("noversion.avsc"), "{}")

    val set = FileSystemSchemaProvider.loadSchemas(dir.toString)
    assert(set.schemas.size == 2) // txt + unversioned skipped
    assert(set.getLatest("events").map(_.version).contains(2: Short))
    assert(set.getByVersion("events", 1).map(_.schemaJson).contains(v1.schemaJson))
    intercept[IllegalArgumentException] {
      FileSystemSchemaProvider.loadSchemas("/nonexistent-schema-dir")
    }

    val svc = new SchemaRegistry(set)
    assert(svc.fetchSchema(v1.digestHex) == v1.schemaJson)
    assert(svc.fetchLatestSchemaBySourceName("events") == v2.schemaJson)
    assert(svc.fetchAllSchemaVersionsBySourceName("events").keySet ==
      Set(1: Short, 2: Short))
    assert(svc.fetchSchemaIdForSourceNameAndVersion("events", 2) == v2.digestHex)
    intercept[NoSuchSchemaException] { svc.fetchSchema("00" * 16) }
    intercept[NoSuchSchemaException] {
      svc.fetchLatestSchemaBySourceName("nope")
    }
    // register a new version; the decode path sees it via snapshot
    val v3 = v1.copy(version = 3)
    svc.registerSchema(v3)
    assert(svc.snapshot.getLatest("events").map(_.version).contains(3: Short))
  }

  test("source registry maps name to id both ways") {
    val r = graft.sources.ChangeFeed.registry
    assert(r.idOf("click") == 1 && r.nameOf(5) == "error")
    assert(r.contains("purchase") && !r.contains("nope"))
  }
}
