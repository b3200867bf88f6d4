package graft.sources

import java.nio.channels.FileChannel
import java.nio.file.{Files, Paths, StandardOpenOption}

/** Cross-process critical section: exclusive `FileLock` on a sidecar
  * lockfile. Serializes the ingest-once cache builds across concurrent
  * JVMs (sbt test, bench and verify can all cold-start the same store
  * entry; the reference single-writers its persisted buffer sessions the
  * same way, databus-core/.../core/DbusEventBuffer.java:1277).
  *
  * Callers must still hold a JVM-local monitor around this (all three call
  * sites do): `FileChannel.lock` throws `OverlappingFileLockException` if
  * two threads of one JVM contend for the same file.
  */
object ProcessLock {

  def exclusive[T](lockFile: String)(body: => T): T = {
    val p = Paths.get(lockFile)
    Files.createDirectories(p.getParent)
    val ch = FileChannel.open(p, StandardOpenOption.CREATE,
      StandardOpenOption.WRITE)
    try {
      val lock = ch.lock()
      try body
      finally lock.release()
    } finally ch.close()
  }
}
