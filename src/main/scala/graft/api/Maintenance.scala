package graft.api

case class MaintenanceReport(indexesRebuilt: Int, manifestsExpired: Int,
    walFilesExpired: Int, indexesAppended: Int = 0, indexesHealed: Int = 0)

/** Background maintenance, the Spark analog of the reference's rebuild
  * thread + WAL janitor (reference: db_server.hpp:21,133-142 — rebuild
  * every 60 s; write_ahead_log.hpp:27-28,86-89 — WAL rotation/retention):
  *
  *  - append-first index catch-up (`GraftDb.appendIndexes`, O(new rows)),
  *    then `rebuildIfNeeded` per vector field — which skips unless it's a
  *    first build, a purge mismatch, or appends passed the drift bound
  *    (then the full rebuild also re-fits centroids / compacts appended
  *    micro-batch files);
  *  - expire snapshot manifests beyond the retention window and vacuum
  *    the batch dirs only they referenced;
  *  - expire fully-consumed WAL files beyond the retention window.
  *
  * `tick()` is the unit of work (call it from any scheduler); `start()`
  * runs it on a daemon thread every `rebuildIntervalMs` like the
  * reference's in-process loop. In a real deployment, schedule `tick()`
  * as a batch job instead — the work is idempotent and skip-guarded.
  */
class Maintenance(
    db: GraftDb,
    rebuildIntervalMs: Long = 60000L,
    retentionMs: Long = 7L * 24 * 3600 * 1000,
    walDirs: Map[String, String] = Map.empty,
    declineHealThreshold: Long = 1L) {

  def tick(now: Long = System.currentTimeMillis): MaintenanceReport = {
    var rebuilt = 0
    var appended = 0
    var manifests = 0
    var walFiles = 0
    var healed = 0
    db.listTables().foreach { t =>
      val st = db.store(t)
      // append-first: catch existing indexes up to the store watermark —
      // O(new rows), covering batches from direct TableStore writers and
      // WAL replay. The rebuild pass after it then usually SKIPS (meta in
      // sync) and only runs a full O(table) build on first build, purge
      // mismatch, or when appends exceed the drift bound
      // (IvfIndex.MaxAppendFraction) — which also compacts the appended
      // micro-batch files.
      appended += db.appendIndexes(t)
      // dense fields -> IVF layout; sparse fields -> inverted-posting
      // index (rebuildIndex dispatches on the field type)
      st.schema.vectorFields
        .foreach { f => if (db.rebuildIndex(t, f.name)) rebuilt += 1 }
      // BM25 impact indexes (discovered from their layout dirs) refresh on
      // the same cadence — a rebuild re-derives the frozen global stats
      // (df/avgdl/N) the impacts bake in, bounding the staleness the
      // append caveat documents; unchanged tables skip via the stamp
      db.bm25Fields(t)
        .foreach { f => if (db.rebuildBm25Index(t, f)) rebuilt += 1 }
      // decline feedback: serve declines accumulated since the last heal
      // mean queries are falling off the serve path — split oversized IVF
      // clusters / force-refresh sparse layouts, then reset the counters
      // (they are a per-generation signal). This is the loop that turns
      // the serving guard's "decline, don't OOM" verdicts into layout
      // repairs instead of a permanent job-path floor.
      healed += db.healServingDeclines(t, declineHealThreshold)
      manifests += st.expireVersions(retentionMs, now)
      st.vacuum()
      walDirs.get(t).foreach { dir =>
        walFiles += graft.streaming.WalStream.expire(dir, st, retentionMs, now)
      }
    }
    MaintenanceReport(rebuilt, manifests, walFiles, appended, healed)
  }

  @volatile private var running = false
  private var thread: Thread = null

  def start(): Maintenance = synchronized {
    if (running) return this
    running = true
    thread = new Thread(() => {
      while (running) {
        try tick()
        catch { case e: Throwable =>
          System.err.println(s"[maintenance] tick failed: ${e.getMessage}")
        }
        var slept = 0L
        while (running && slept < rebuildIntervalMs) {
          Thread.sleep(math.min(200L, rebuildIntervalMs - slept)); slept += 200
        }
      }
    }, "graft-maintenance")
    thread.setDaemon(true)
    thread.start()
    this
  }

  def stop(): Unit = synchronized {
    running = false
    if (thread != null) { thread.join(5000); thread = null }
  }
}
