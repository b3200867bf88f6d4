package graft.model

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Path, Paths, StandardCopyOption}

/** C2 — checkpoint persistence providers.
  *
  * Reference: FileSystemCheckpointPersistenceProvider /
  * ClusterCheckpointPersistenceProvider (databus-client-api/.../pub/
  * FileSystemCheckpointPersistenceProvider.java:1). The engine's streaming
  * offsets already live in the Structured Streaming checkpointLocation;
  * this store persists the *consumer-visible* Checkpoint JSON (the
  * reference's contract: a consumer can be moved between clients by
  * carrying its checkpoint), with atomic write-rename like the reference's
  * staging-file protocol.
  */
trait CheckpointStore {
  def store(consumerId: String, cp: CheckpointMult): Unit
  def load(consumerId: String): Option[CheckpointMult]
}

class FileSystemCheckpointStore(rootDir: String) extends CheckpointStore {
  private def path(id: String): Path = Paths.get(rootDir, s"$id.json")

  override def store(consumerId: String, cp: CheckpointMult): Unit = {
    Files.createDirectories(Paths.get(rootDir))
    val tmp = Paths.get(rootDir, s".$consumerId.json.tmp")
    Files.write(tmp, cp.toJson.getBytes(StandardCharsets.UTF_8))
    Files.move(tmp, path(consumerId), StandardCopyOption.ATOMIC_MOVE,
      StandardCopyOption.REPLACE_EXISTING)
  }

  override def load(consumerId: String): Option[CheckpointMult] = {
    val p = path(consumerId)
    if (!Files.exists(p)) None
    else Some(CheckpointStore.parseMult(
      new String(Files.readAllBytes(p), StandardCharsets.UTF_8)))
  }
}

object CheckpointStore {
  private val Entry = """"(\d+)":(\{[^{}]*\})""".r
  private val Cursor = """"cursorPartition":(\d+)""".r

  /** Parse CheckpointMult.toJson output. */
  def parseMult(json: String): CheckpointMult = {
    val cps = Entry.findAllMatchIn(json).map { m =>
      m.group(1).toShort -> Checkpoint.fromJson(m.group(2))
    }.toMap
    val cursor = Cursor.findFirstMatchIn(json).map(_.group(1).toShort)
    CheckpointMult(cps, cursor)
  }
}
