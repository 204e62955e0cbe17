package graft.core

import java.nio.channels.{FileChannel, FileLock, OverlappingFileLockException}
import java.nio.file.{Files, Paths, StandardOpenOption}

/** Single-writer gate for a store root — the reference's T13
  * (`PostgresSingleInstanceLock.cs:28-120` advisory lock /
  * `MongoSingleInstanceLock.cs` lease). In this offline environment the
  * equivalent authority is an OS file lock on the store directory; on a
  * cluster the same trait would be backed by a JDBC advisory lock or the
  * object store's conditional-put.
  *
  * The lock is the *liveness* guard (don't run two indexers); the
  * *safety* backstop is StateStore's atomic manifest rename, which makes
  * a lost race corrupt nothing.
  */
final class SingleInstanceLock(root: String) extends AutoCloseable {
  private val path = Paths.get(root, ".lock")
  private var channel: FileChannel = _
  private var lock: FileLock = _

  /** Try to acquire; false if another live instance holds the lock.
    * Safe to call repeatedly (poll loop — the reference's
    * `WaitForAcquisitionAsync` polls the advisory lock the same way).
    */
  def tryAcquire(): Boolean = {
    if (isHeld) return true
    Files.createDirectories(Paths.get(root))
    if (channel == null || !channel.isOpen)
      channel = FileChannel.open(path,
        StandardOpenOption.CREATE, StandardOpenOption.WRITE)
    try {
      lock = channel.tryLock()
      lock != null
    } catch {
      case _: OverlappingFileLockException => false // same-JVM holder
    }
  }

  /** Poll until acquired or `timeoutMs` elapses (reference T13:
    * `CardanoIndexWorker.cs:81-84` awaits acquisition before processing).
    */
  def waitAcquire(timeoutMs: Long): Boolean = {
    val deadline = System.currentTimeMillis() + timeoutMs
    var ok = tryAcquire()
    while (!ok && System.currentTimeMillis() < deadline) {
      Thread.sleep(50)
      ok = tryAcquire()
    }
    ok
  }

  def isHeld: Boolean = lock != null && lock.isValid

  override def close(): Unit = {
    if (lock != null && lock.isValid) lock.release()
    if (channel != null && channel.isOpen) channel.close()
  }
}
