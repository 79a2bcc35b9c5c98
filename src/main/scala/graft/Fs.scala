package graft

/** Shared filesystem helper for staging/rig directories — one
  * definition of recursive delete instead of a copy per call site
  * (EventStream rig dirs, SourceSinks staged sinks). No symlink
  * traversal concerns: staging dirs contain only regular files this
  * process wrote.
  */
object Fs {
  def deleteRecursively(f: java.io.File): Unit = {
    if (f.isDirectory)
      Option(f.listFiles()).foreach(_.foreach(deleteRecursively))
    f.delete()
  }
}
