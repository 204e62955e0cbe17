package graft.tools

import graft.core.SingleInstanceLock

/** Cross-process lock contender — spawned BY CrossProcessLockSpec as a
  * second JVM so the single-writer guarantee (reference T13,
  * `PostgresSingleInstanceLock.cs:28-120`, pinned cross-instance by
  * `SingleInstanceLockTest.cs:46`) is proven across real OS processes,
  * not just across objects in one JVM (FailFastSpec's scope).
  *
  * Modes (all print machine-readable lines on stdout):
  *   try  <dir>        one tryAcquire → ACQUIRED | BLOCKED
  *   hold <dir> <ms>   acquire (or BLOCKED + exit 2), hold ms, release
  *   wait <dir> <ms>   WAITING, then waitAcquire(ms) →
  *                     ACQUIRED <elapsedMs> | TIMEOUT <elapsedMs>
  */
object LockProbe {
  def main(args: Array[String]): Unit = {
    val mode = args(0)
    val dir = args(1)
    val lock = new SingleInstanceLock(dir)
    mode match {
      case "try" =>
        println(if (lock.tryAcquire()) "ACQUIRED" else "BLOCKED")
      case "hold" =>
        if (!lock.tryAcquire()) { println("BLOCKED"); sys.exit(2) }
        println("ACQUIRED")
        System.out.flush()
        Thread.sleep(args(2).toLong)
        lock.close()
        println("RELEASED")
      case "wait" =>
        println("WAITING")
        System.out.flush()
        val t0 = System.nanoTime()
        val ok = lock.waitAcquire(args(2).toLong)
        val ms = (System.nanoTime() - t0) / 1000000
        println(if (ok) s"ACQUIRED $ms" else s"TIMEOUT $ms")
      case other =>
        System.err.println(s"unknown mode $other")
        sys.exit(1)
    }
    System.out.flush()
  }
}
