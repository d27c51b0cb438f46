package graft.index

/** Shared hand-rolled parser for the tiny index meta stamps
  * (`ivf_meta.json` / `sp_meta.json`). These files are re-read on every
  * index access as the freshness stamp — including the driver-side serving
  * hot path — so parsing must cost microseconds: a substring scan, no JSON
  * library. One definition serves every field reader (watermark, count,
  * purge, buckets, base, gen) in both index implementations. */
private[index] object MetaJson {

  /** Read one long field out of a meta file; `default` when absent. */
  def readLongField(metaPath: String, field: String, default: Long): Long = {
    val s = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(metaPath)))
    longField(s, field, default)
  }

  /** Write a meta stamp ATOMICALLY (write-temp + rename): the stamp is
    * re-read on every index access by THIS and other processes, so a
    * truncate-in-place write lets a concurrent reader catch a partial
    * file — the flickering stamp looks like a build-generation change and
    * flushes warm serving residency (observed as a 10x serve-qps collapse
    * under concurrent ingest). POSIX rename gives readers old-or-new,
    * never partial. */
  def writeAtomic(metaPath: String, content: String): Unit = {
    val target = java.nio.file.Paths.get(metaPath)
    // unique across processes AND threads: a colliding tmp name would let
    // two writers interleave write/move on the same staging file
    val tmp = target.resolveSibling(
      s"${target.getFileName}.${java.lang.ProcessHandle.current().pid()}" +
        s".${Thread.currentThread().getId}.${System.nanoTime()}.tmp")
    try {
      // force the bytes to disk BEFORE the rename: a power loss between
      // move and flush could otherwise surface an empty/old stamp after
      // the directory entry already points at the new file
      val ch = java.nio.channels.FileChannel.open(tmp,
        java.nio.file.StandardOpenOption.CREATE,
        java.nio.file.StandardOpenOption.WRITE,
        java.nio.file.StandardOpenOption.TRUNCATE_EXISTING)
      try {
        ch.write(java.nio.ByteBuffer.wrap(content.getBytes))
        ch.force(true)
      } finally ch.close()
      java.nio.file.Files.move(tmp, target,
        java.nio.file.StandardCopyOption.ATOMIC_MOVE,
        java.nio.file.StandardCopyOption.REPLACE_EXISTING)
    } finally {
      // a writer that dies between write and move must not strand staging
      // files next to the meta (they accumulate across crashed runs)
      java.nio.file.Files.deleteIfExists(tmp); ()
    }
    sweepOrphanTmp(target)
  }

  // best-effort removal of stale *.tmp siblings left by writers that died
  // mid-write in OTHER processes; only files older than a minute are swept
  // so a concurrent writer's in-flight staging file is never yanked away
  private def sweepOrphanTmp(target: java.nio.file.Path): Unit = {
    val dir = target.getParent
    if (dir == null || !java.nio.file.Files.isDirectory(dir)) return
    val prefix = s"${target.getFileName}."
    val cutoff = System.currentTimeMillis - 60000L
    scala.util.Try {
      val stream = java.nio.file.Files.list(dir)
      try {
        val it = stream.iterator()
        while (it.hasNext) {
          val p = it.next()
          val name = p.getFileName.toString
          if (name.startsWith(prefix) && name.endsWith(".tmp") &&
              scala.util.Try(java.nio.file.Files.getLastModifiedTime(p).toMillis < cutoff)
                .getOrElse(false))
            java.nio.file.Files.deleteIfExists(p)
        }
      } finally stream.close()
    }
    ()
  }

  /** Read one long field out of already-loaded meta content. */
  def longField(s: String, field: String, default: Long): Long = {
    val key = "\"" + field + "\":"
    val at = s.indexOf(key)
    if (at < 0) return default
    var i = at + key.length
    var end = i
    while (end < s.length && (s.charAt(end) == '-' || Character.isDigit(s.charAt(end)))) end += 1
    if (end == i) default else s.substring(i, end).toLong
  }
}
