package graft

import graft.core.SingleInstanceLock
import org.scalatest.funsuite.AnyFunSuite
import java.io.{BufferedReader, InputStreamReader}

/** T13 across REAL OS processes: FailFastSpec exercises the
  * single-writer lock between objects in one JVM, but the reference's
  * guarantee is cross-PROCESS (`PostgresSingleInstanceLock.cs:28-120`;
  * `SingleInstanceLockTest.cs:46` parks a second instance until the
  * first releases). Here a second JVM is actually spawned
  * ([[graft.tools.LockProbe]]) and contends for the same lock
  * directory: it must observe BLOCKED while the parent holds, PARK in
  * waitAcquire until the parent releases, and symmetrically the parent
  * must block while the child holds.
  */
class CrossProcessLockSpec extends AnyFunSuite {

  private def pathOf(c: Class[_]): String =
    new java.io.File(c.getProtectionDomain.getCodeSource.getLocation.toURI)
      .getAbsolutePath

  // LockProbe + SingleInstanceLock live in the same classes dir; the
  // only other runtime need is scala-library (located via Predef) —
  // deliberately NOT java.class.path, which under sbt is the launcher
  private val cp = Seq(
    pathOf(classOf[SingleInstanceLock]),
    pathOf(scala.Predef.getClass)).distinct
    .mkString(java.io.File.pathSeparator)

  private val javaBin = java.nio.file.Paths
    .get(System.getProperty("java.home"), "bin", "java").toString

  private def spawn(args: String*): (Process, BufferedReader) = {
    val p = new ProcessBuilder(
      (Seq(javaBin, "-cp", cp, "graft.tools.LockProbe") ++ args): _*)
      .redirectErrorStream(true).start()
    (p, new BufferedReader(new InputStreamReader(p.getInputStream)))
  }

  private def tmp(): String =
    java.nio.file.Files.createTempDirectory("xlock").toString

  test("a second PROCESS cannot acquire a held lock") {
    val dir = tmp()
    val lock = new SingleInstanceLock(dir)
    try {
      assert(lock.tryAcquire())
      val (p, out) = spawn("try", dir)
      assert(p.waitFor(30, java.util.concurrent.TimeUnit.SECONDS))
      assert(out.readLine() == "BLOCKED",
        "the OS file lock must be visible to a different process")
    } finally lock.close()
  }

  test("a second process PARKS in waitAcquire until the holder releases") {
    val dir = tmp()
    val lock = new SingleInstanceLock(dir)
    try {
      assert(lock.tryAcquire())
      val (p, out) = spawn("wait", dir, "30000")
      assert(out.readLine() == "WAITING") // child's clock starts here
      Thread.sleep(1500) // provably parked, not polling through
      lock.close()
      assert(p.waitFor(30, java.util.concurrent.TimeUnit.SECONDS))
      val line = out.readLine()
      assert(line != null && line.startsWith("ACQUIRED"), s"got: $line")
      val elapsed = line.split(" ")(1).toLong
      assert(elapsed >= 1000,
        s"child acquired after ${elapsed}ms — it did not actually park " +
          "behind the parent's hold")
    } finally lock.close()
  }

  test("the parent blocks while a CHILD process holds, acquires after it exits") {
    val dir = tmp()
    val (p, out) = spawn("hold", dir, "2000")
    assert(out.readLine() == "ACQUIRED")
    val lock = new SingleInstanceLock(dir)
    try {
      assert(!lock.tryAcquire(),
        "parent must see the child process's lock")
      // parks until the child's 2s hold ends, then wins
      assert(lock.waitAcquire(30000))
      assert(p.waitFor(30, java.util.concurrent.TimeUnit.SECONDS))
    } finally lock.close()
  }
}
