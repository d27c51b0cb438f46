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
    java.nio.file.Files.write(tmp, content.getBytes)
    java.nio.file.Files.move(tmp, target,
      java.nio.file.StandardCopyOption.ATOMIC_MOVE,
      java.nio.file.StandardCopyOption.REPLACE_EXISTING)
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
