package graft.api

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.json4s._
import org.json4s.jackson.JsonMethods
import graft.types._
import graft.store.{SchemaJson, TableStore}
import graft.query.QueryEngine
import graft.query.QueryEngine._
import java.nio.file.{Files, Paths}
import scala.jdk.CollectionConverters._

/** The reference's REST surface re-expressed as library calls over JSON
  * request/response shapes (reference: engine/server/web_server/
  * web_controller.hpp — create/drop table, insert/upsert, query, get,
  * delete, statistics). A database is a directory of tables; the catalog is
  * a JSON file per table (basic_meta_impl.cpp analog).
  */
class GraftDb(val spark: SparkSession, val root: String) {

  private def tablePath(name: String) = s"$root/$name"
  private val stores = scala.collection.concurrent.TrieMap[String, TableStore]()

  def createTable(schemaJson: String): TableSchema = {
    val schema = SchemaJson.read(schemaJson)
    require(!Files.exists(Paths.get(tablePath(schema.name))),
      s"table ${schema.name} already exists")
    stores(schema.name) = TableStore.create(spark, tablePath(schema.name), schema)
    schema
  }

  def dropTable(name: String): Unit = {
    stores.remove(name)
    val p = Paths.get(tablePath(name))
    if (Files.exists(p)) {
      Files.walk(p).iterator().asScala.toSeq.reverse.foreach(Files.delete)
    }
  }

  def listTables(): Seq[String] =
    if (!Files.exists(Paths.get(root))) Nil
    else Files.list(Paths.get(root)).iterator().asScala
      .filter(p => Files.exists(p.resolve("schema.json")))
      .map(_.getFileName.toString).toSeq.sorted

  def store(name: String): TableStore =
    stores.getOrElseUpdate(name, TableStore.open(spark, tablePath(name)))

  /** POST /data/insert analog: `{"table": t, "data": [...], "upsert": bool}`.
    * Returns `{"inserted": n, "skipped": m}`. */
  def insert(requestJson: String): String = {
    val req = JsonMethods.parse(requestJson)
    val table = str(req \ "table")
    val upsert = (req \ "upsert") match { case JBool(b) => b; case _ => false }
    val data = (req \ "data") match {
      case a: JArray => a.arr.map(r => JsonMethods.compact(JsonMethods.render(r)))
      case _ => throw new IllegalArgumentException("data must be an array")
    }
    val st = store(table)
    val ds = spark.createDataset(data.asJava)(org.apache.spark.sql.Encoders.STRING)
    val df = spark.read.schema(st.schema.structType).json(ds)
    val res = st.insert(df, upsert)
    s"""{"inserted":${res.inserted},"skipped":${res.skipped}}"""
  }

  /** POST /data/query analog: vector top-K with filter/projection/facets. */
  def query(requestJson: String): String = {
    val req = JsonMethods.parse(requestJson)
    val table = str(req \ "table")
    val st = store(table)
    val queryField = (req \ "queryField") match {
      case JString(s) => s
      case _ =>
        val vfs = st.schema.vectorFields
        require(vfs.size == 1, "queryField required when table has multiple vector fields")
        vfs.head.name
    }
    val limit = (req \ "limit") match { case JInt(i) => i.toInt; case _ => 10 }
    val filter = (req \ "filter") match { case JString(s) => s; case _ => "" }
    val withDistance = (req \ "withDistance") match { case JBool(b) => b; case _ => false }
    val response = (req \ "response") match {
      case JArray(a) => a.collect { case JString(s) => s }
      case _ => Nil
    }
    val qv: QueryVector = (req \ "queryVector") match {
      case JArray(vals) => DenseQuery(vals.map(num(_).toFloat).toArray)
      case o: JObject =>
        SparseQuery(
          (o \ "indices").asInstanceOf[JArray].arr.map(num(_).toInt).toArray,
          (o \ "values").asInstanceOf[JArray].arr.map(num(_).toFloat).toArray)
      case _ => throw new IllegalArgumentException("queryVector required")
    }
    val facets = parseFacets(req \ "facets")
    val (out, facetDfs) = QueryEngine.searchWithFacets(st.read(), st.schema,
      SearchRequest(queryField, qv, limit, filter, response, withDistance, facets))
    render(out, facetDfs, facets)
  }

  /** POST /data/get analog: filtered scan / PK lookup with pagination. */
  def get(requestJson: String): String = {
    val req = JsonMethods.parse(requestJson)
    val st = store(str(req \ "table"))
    val filter = (req \ "filter") match { case JString(s) => s; case _ => "" }
    val skip = (req \ "skip") match { case JInt(i) => i.toInt; case _ => 0 }
    val limit = (req \ "limit") match { case JInt(i) => i.toInt; case _ => Int.MaxValue }
    val response = (req \ "response") match {
      case JArray(a) => a.collect { case JString(s) => s }
      case _ => Nil
    }
    val pks: Seq[Any] = (req \ "primaryKeys") match {
      case JArray(a) => a.map {
        case JInt(i) => pkTyped(st, i)
        case JString(s) => s
        case other => throw new IllegalArgumentException(s"bad pk $other")
      }
      case _ => Nil
    }
    val facets = parseFacets(req \ "facets")
    val (out, facetDfs) = QueryEngine.getWithFacets(st.read(), st.schema,
      GetRequest(filter, skip, limit, pks, response, facets))
    render(out, facetDfs, facets)
  }

  /** POST /data/delete analog. Returns `{"deleted": n}`. */
  def delete(requestJson: String): String = {
    val req = JsonMethods.parse(requestJson)
    val st = store(str(req \ "table"))
    val filter = (req \ "filter") match { case JString(s) => s; case _ => "" }
    val pks: Seq[Any] = (req \ "primaryKeys") match {
      case JArray(a) => a.map {
        case JInt(i) => pkTyped(st, i)
        case JString(s) => s
        case other => throw new IllegalArgumentException(s"bad pk $other")
      }
      case _ => Nil
    }
    val res = st.delete(pks, filter)
    s"""{"deleted":${res.deleted}}"""
  }

  /** GET /statistics analog. */
  def statistics(table: String): String =
    s"""{"table":"$table","totalRecords":${store(table).count()}}"""

  // ---- helpers ----
  private def pkTyped(st: TableStore, i: BigInt): Any = st.pkField.map(_.sparkType) match {
    case Some(org.apache.spark.sql.types.IntegerType) => i.toInt
    case Some(org.apache.spark.sql.types.ShortType) => i.toShort
    case Some(org.apache.spark.sql.types.ByteType) => i.toByte
    case _ => i.toLong
  }
  private def str(v: JValue): String = v match {
    case JString(s) => s
    case other => throw new IllegalArgumentException(s"expected string, got $other")
  }
  private def num(v: JValue): Double = v match {
    case JDouble(d) => d
    case JInt(i) => i.toDouble
    case JLong(l) => l.toDouble
    case JDecimal(d) => d.toDouble
    case other => throw new IllegalArgumentException(s"expected number, got $other")
  }
  private def parseFacets(v: JValue): Seq[Facet] = v match {
    case JArray(fs) => fs.map { f =>
      Facet(
        (f \ "group") match {
          case JArray(g) => g.collect { case JString(s) => s }
          case _ => Nil
        },
        (f \ "aggregate") match {
          case JArray(a) => a.collect { case JString(s) => s }
          case _ => Nil
        })
    }
    case _ => Nil
  }

  private def render(out: DataFrame, facetDfs: Seq[DataFrame], facets: Seq[Facet]): String = {
    val records = out.toJSON.collect().mkString("[", ",", "]")
    if (facets.isEmpty) s"""{"result":$records}"""
    else {
      val fJson = facetDfs.map(df => df.toJSON.collect().mkString("[", ",", "]"))
        .mkString("[", ",", "]")
      s"""{"result":$records,"facets":$fJson}"""
    }
  }
}
