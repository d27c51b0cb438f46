package graft.api

import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}
import java.nio.charset.StandardCharsets
import java.time.Duration
import org.json4s._
import org.json4s.jackson.JsonMethods

/** Typed client bindings over the HTTP front door — the analog of the
  * reference's Python bindings (engine/test/bindings/python/test.py drives
  * load_db/use_db/create_table/insert/query/get/delete/drop through a
  * client object; concurrent_test.py hammers it from 32 threads).
  *
  * The client is a thin JSON passthrough: methods take/return the same
  * request/response bodies as the server routes, with the StatusDto
  * envelope checked client-side — a non-200 statusCode raises
  * `GraftClientException` with the server's message, like the bindings'
  * error mapping. One `HttpClient` instance is shared and thread-safe, so
  * a single GraftClient can be hammered from many threads. */
class GraftClient(val baseUrl: String, timeoutMs: Long = 30000) {

  private val http = HttpClient.newBuilder()
    .connectTimeout(Duration.ofMillis(timeoutMs))
    .build()

  @volatile private var db: String = "default"

  /** Select the database name used by subsequent data-plane calls
    * (reference use_db). */
  def useDb(name: String): GraftClient = { db = name; this }

  def state(): Boolean =
    try (JsonMethods.parse(execute("GET", "/state", null)) \ "statusCode") == JInt(200)
    catch { case _: Exception => false }

  /** Load or create a database (reference load_db). */
  def loadDb(name: String, path: String = null): Unit = {
    val p = if (path == null) "" else s""","path":${jstr(path)}"""
    checked("POST", "/api/load", s"""{"name":${jstr(name)}$p}""")
  }

  def unloadDb(name: String): Unit = checked("POST", s"/api/$name/unload", "")

  def dropDb(name: String): Unit = checked("DELETE", s"/api/$name/drop", null)

  def createTable(schemaJson: String): Unit =
    checked("POST", s"/api/$db/schema/tables", schemaJson)

  def dropTable(table: String): Unit =
    checked("DELETE", s"/api/$db/schema/tables/$table", null)

  def listTables(): Seq[String] =
    (checked("GET", s"/api/$db/schema/tables/show", null) \ "result") match {
      case JArray(a) => a.collect { case JString(s) => s }
      case _ => Nil
    }

  /** Insert records; returns (inserted, skipped). */
  def insert(table: String, dataJson: String, upsert: Boolean = false): (Long, Long) = {
    val r = checked("POST", s"/api/$db/data/insert",
      s"""{"table":${jstr(table)},"data":$dataJson,"upsert":$upsert}""") \ "result"
    (long(r \ "inserted"), long(r \ "skipped"))
  }

  /** Vector top-K; returns the `result` array (rows as JValues). */
  def query(requestJson: String): List[JValue] =
    (checked("POST", s"/api/$db/data/query", requestJson) \ "result") match {
      case JArray(a) => a
      case _ => Nil
    }

  /** Raw query response (for callers that want facets / served markers). */
  def queryRaw(requestJson: String): JValue =
    checked("POST", s"/api/$db/data/query", requestJson)

  /** Filtered scan / PK lookup; returns the `result` array. */
  def get(requestJson: String): List[JValue] =
    (checked("POST", s"/api/$db/data/get", requestJson) \ "result") match {
      case JArray(a) => a
      case _ => Nil
    }

  /** Delete by PK list and/or filter; returns rows deleted. */
  def delete(requestJson: String): Long =
    long(checked("POST", s"/api/$db/data/delete", requestJson) \ "result" \ "deleted")

  /** Per-table statistics rows. */
  def statistics(): List[JValue] =
    (checked("GET", s"/api/$db/statistics", null) \ "result") match {
      case JArray(a) => a
      case _ => Nil
    }

  /** Rebuild ANN indexes across all loaded databases (reference
    * POST /api/rebuild). */
  def rebuild(): Unit = checked("POST", "/api/rebuild", "")

  // ---- plumbing ----

  private def execute(method: String, path: String, body: String): String = {
    val b = HttpRequest.newBuilder(URI.create(baseUrl + path))
      .timeout(Duration.ofMillis(timeoutMs))
    val req = (method match {
      case "GET" => b.GET()
      case "DELETE" => b.DELETE()
      case m => b.method(m, HttpRequest.BodyPublishers.ofString(
        Option(body).getOrElse(""), StandardCharsets.UTF_8))
    }).build()
    http.send(req, HttpResponse.BodyHandlers.ofString(StandardCharsets.UTF_8)).body()
  }

  private def checked(method: String, path: String, body: String): JValue = {
    val parsed = JsonMethods.parse(execute(method, path, body))
    (parsed \ "statusCode") match {
      case JInt(c) if c == 200 => parsed
      case JInt(c) =>
        val msg = (parsed \ "message") match { case JString(s) => s; case _ => "" }
        throw new GraftClientException(c.toInt, msg)
      case _ => throw new GraftClientException(500, "malformed server response")
    }
  }

  private def long(v: JValue): Long = v match {
    case JInt(i) => i.toLong
    case JLong(l) => l
    case _ => throw new GraftClientException(500, s"expected number, got $v")
  }

  private def jstr(s: String): String =
    "\"" + s.flatMap {
      case '"' => "\\\""; case '\\' => "\\\\"; case '\n' => "\\n"
      case '\r' => "\\r"; case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
}

class GraftClientException(val statusCode: Int, message: String)
  extends RuntimeException(s"[$statusCode] $message")
