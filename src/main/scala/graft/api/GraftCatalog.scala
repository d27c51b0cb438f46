package graft.api

import org.apache.spark.sql.SparkSession
import org.json4s._
import org.json4s.jackson.JsonMethods
import java.nio.file.{Files, Paths}
import scala.jdk.CollectionConverters._

/** Multi-database namespace (reference: meta_types.hpp:85-90
  * `DatabaseSchema` — a named database with a path, containing tables;
  * load/unload/drop semantics db_server LoadDB/UnloadDB/DropDB via
  * basic_meta_impl.cpp:35-98). A database here is one GraftDb root
  * directory; `catalog.json` under the catalog root records every loaded
  * database (name → path) so a restart reloads the same namespace — the
  * same role as the reference's persisted meta catalog.
  *
  *  - load: open (or create) a database at a path and register it;
  *  - unload: forget the name, keep the files (reference UnloadDB);
  *  - drop: unload AND delete the files (reference DropDB).
  */
class GraftCatalog(val spark: SparkSession, val rootDir: String) {

  private val catalogPath = Paths.get(s"$rootDir/catalog.json")
  private val dbs = scala.collection.concurrent.TrieMap[String, GraftDb]()
  private val quotas = scala.collection.concurrent.TrieMap[String, (Int, Long)]()

  // reload previously-loaded databases (and their quotas) on open
  if (Files.exists(catalogPath)) {
    val o = JsonMethods.parse(new String(Files.readAllBytes(catalogPath)))
    (o \ "databases") match {
      case JObject(fields) => fields.foreach {
        case (name, JString(path)) => dbs(name) = new GraftDb(spark, path)
        case _ =>
      }
      case _ =>
    }
    (o \ "quotas") match {
      case JObject(fields) => fields.foreach { case (name, q) =>
        val mt = (q \ "maxTables") match {
          case JInt(i) => i.toInt; case _ => Int.MaxValue
        }
        val mr = (q \ "maxRowsPerTable") match {
          case JInt(i) => i.toLong; case _ => Long.MaxValue
        }
        quotas(name) = (mt, mr)
        dbs.get(name).foreach(applyQuota(name, _))
      }
      case _ =>
    }
  }

  private def applyQuota(name: String, db: GraftDb): Unit =
    quotas.get(name).foreach { case (mt, mr) =>
      db.quotaMaxTables = mt
      db.quotaMaxRowsPerTable = mr
    }

  /** Leader flag (reference: api/setleader → db_server SetLeader; a
    * follower never writes the shared catalog file,
    * basic_meta_impl.cpp:199-202 — it reads what the leader persisted). */
  @volatile var isLeader: Boolean = true
  def setLeader(b: Boolean): Unit = { isLeader = b }

  private def persist(): Unit = synchronized {
    if (!isLeader) return // followers read the leader's catalog, never write
    Files.createDirectories(Paths.get(rootDir))
    val entries = dbs.toSeq.sortBy(_._1)
      .map { case (n, db) => s"""${jstr(n)}:${jstr(db.root)}""" }
      .mkString(",")
    val qs = quotas.toSeq.sortBy(_._1)
      .map { case (n, (mt, mr)) =>
        s"""${jstr(n)}:{"maxTables":$mt,"maxRowsPerTable":$mr}""" }
      .mkString(",")
    val tmp = Files.createTempFile(Paths.get(rootDir), ".catalog", ".tmp")
    Files.write(tmp, s"""{"databases":{$entries},"quotas":{$qs}}""".getBytes)
    Files.move(tmp, catalogPath,
      java.nio.file.StandardCopyOption.ATOMIC_MOVE,
      java.nio.file.StandardCopyOption.REPLACE_EXISTING)
  }

  private def jstr(s: String): String =
    "\"" + s.replace("\\", "\\\\").replace("\"", "\\\"") + "\""

  /** Load (or create) a database; default path = `<rootDir>/<name>`.
    * Re-loading an already-loaded name with a DIFFERENT explicit path is
    * an error — silently returning the instance at the old path would hand
    * the caller the wrong database. */
  def load(name: String, path: String = null): GraftDb = {
    val db = dbs.getOrElseUpdate(name, {
      val p = Option(path).getOrElse(s"$rootDir/$name")
      Files.createDirectories(Paths.get(p))
      new GraftDb(spark, p)
    })
    if (path != null && db.root != path)
      throw new IllegalArgumentException(
        s"database $name is already loaded from ${db.root}; requested $path")
    applyQuota(name, db)
    persist()
    db
  }

  /** Per-database admission quotas (our multi-tenant extension; see
    * GraftDb.quotaMaxTables): persisted with the catalog, applied to the
    * loaded instance immediately and re-applied on reload. */
  def setQuota(name: String, maxTables: Int = Int.MaxValue,
      maxRowsPerTable: Long = Long.MaxValue): Unit = {
    quotas(name) = (maxTables, maxRowsPerTable)
    dbs.get(name).foreach(applyQuota(name, _))
    persist()
  }

  /** Register an already-open GraftDb under a name (in-process only use —
    * also persisted like load). */
  def register(name: String, db: GraftDb): GraftDb = {
    dbs(name) = db
    persist()
    db
  }

  /** Forget the database; its files stay on disk (reference UnloadDB). */
  def unload(name: String): Boolean = {
    val had = dbs.remove(name).isDefined
    if (had) persist()
    had
  }

  /** Unload AND delete the database directory (reference DropDB). */
  def drop(name: String): Unit = {
    val db = dbs.remove(name)
    db.foreach { d =>
      val p = Paths.get(d.root)
      if (Files.exists(p)) {
        val w = Files.walk(p)
        try w.iterator().asScala.toSeq.reverse.foreach(Files.delete)
        finally w.close()
      }
    }
    persist()
  }

  def db(name: String): GraftDb = dbs.getOrElse(name,
    throw new IllegalArgumentException(s"database $name not loaded"))

  def list(): Seq[String] = dbs.keys.toSeq.sorted

  /** Whether the name resolves (dump's 404-vs-500 distinction,
    * db_server.cpp:85-88 DB_NOT_FOUND). */
  def has(name: String): Boolean = dbs.contains(name)

  /** POST /api/dump analog (db_server.cpp:82-103): export the named
    * database's current snapshot to `path` (GraftDb.dump) plus a catalog
    * entry file — skipped on a follower, mirroring the reference's
    * SaveDBToFile leader guard. */
  def dump(name: String, path: String): Unit = {
    db(name).dump(path)
    if (isLeader) {
      Files.createDirectories(Paths.get(path))
      Files.write(Paths.get(s"$path/catalog"),
        s"""{"name":${jstr(name)},"path":${jstr(path)}}""".getBytes)
    }
  }
}
