package graft.plans

import java.io.File

/** JVM-unique scratch directories for queries that demonstrate STORED
  * index lanes (write once, serve many): path uniqueness needs a per-JVM
  * token — an invocation counter alone collides across JVMs sharing one
  * tmpdir (two JVMs both at invocation 1 would overwrite-delete each
  * other's live files under an unsealed lazy result, the
  * incrementalDedupStored lesson) — and a shutdown hook removes this
  * JVM's dirs so repeated local runs don't accrete tmpdir garbage
  * (crash leftovers are bounded by fixture scale; the OS owns tmpdir). */
object ScratchDirs {
  private val token: String =
    s"${ProcessHandle.current().pid()}_" +
      java.lang.Long.toUnsignedString(
        new java.security.SecureRandom().nextLong(), 36)

  private val registered =
    java.util.concurrent.ConcurrentHashMap.newKeySet[File]()

  private def rm(f: File): Unit = {
    val kids = f.listFiles(); if (kids != null) kids.foreach(rm)
    f.delete(); ()
  }

  private lazy val hookInstalled: Boolean = {
    Runtime.getRuntime.addShutdownHook(new Thread(() => {
      registered.forEach(rm(_))
    }))
    true
  }

  private val counter = new java.util.concurrent.atomic.AtomicLong()

  /** A fresh, JVM-unique, exit-cleaned directory under java.io.tmpdir. */
  def unique(prefix: String): File = {
    require(hookInstalled)
    val d = new File(sys.props("java.io.tmpdir"),
      s"$prefix-$token-${counter.incrementAndGet()}")
    d.mkdirs()
    registered.add(d)
    d
  }

  /** Eagerly remove a registered dir (happy-path cleanup; the exit hook
    * remains the backstop for abnormal paths). */
  def remove(d: File): Unit = {
    rm(d)
    registered.remove(d)
    ()
  }
}
