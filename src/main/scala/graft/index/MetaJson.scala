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
