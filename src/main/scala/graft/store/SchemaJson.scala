package graft.store

import org.json4s._
import org.json4s.jackson.JsonMethods
import graft.types._

/** JSON catalog (de)serialization for table schemas, mirroring the reference's
  * JSON catalog file (reference: engine/db/catalog/basic_meta_impl.cpp:35-200):
  * a table is `{"name":..., "fields":[{"name","dataType","primaryKey",
  * "dimensions","metricType"}...]}`. */
object SchemaJson {
  def write(s: TableSchema): String = {
    val fields = s.fields.map { f =>
      val base = List(
        "name" -> JString(f.name),
        "dataType" -> JString(FieldType.refName(f.fieldType)),
        "primaryKey" -> JBool(f.primaryKey))
      val vec =
        if (FieldType.isVector(f.fieldType))
          List("dimensions" -> JInt(f.dimensions),
            "metricType" -> JString(MetricType.refName(f.metric)))
        else Nil
      JObject(base ++ vec)
    }
    val indices = s.indices.map { ix =>
      JObject(List(
        "name" -> JString(ix.name), "src" -> JString(ix.src),
        "tgt" -> JString(ix.tgt), "model" -> JString(ix.model)))
    }
    JsonMethods.compact(JsonMethods.render(
      JObject("name" -> JString(s.name), "fields" -> JArray(fields.toList),
        "indices" -> JArray(indices.toList))))
  }

  def read(json: String): TableSchema = {
    val o = JsonMethods.parse(json)
    val name = (o \ "name") match { case JString(s) => s; case _ => "table" }
    val fields = (o \ "fields") match {
      case JArray(fs) => fs.map { f =>
        val fname = (f \ "name") match { case JString(s) => s; case _ => sys.error("field name") }
        val ft = (f \ "dataType") match {
          case JString(s) => FieldType.parse(s)
          case _ => sys.error("field dataType")
        }
        val pk = (f \ "primaryKey") match { case JBool(b) => b; case _ => false }
        val dims = (f \ "dimensions") match {
          case JInt(i) => i.toInt; case JLong(l) => l.toInt; case _ => 0
        }
        val metric = (f \ "metricType") match {
          case JString(s) => MetricType.parse(s); case _ => MetricType.Euclidean
        }
        FieldSchema(fname, ft, pk, dims, metric)
      }
      case _ => Nil
    }
    val indices = (o \ "indices") match {
      case JArray(ixs) => ixs.map { ix =>
        def s(k: String): String = (ix \ k) match {
          case JString(v) => v; case _ => sys.error(s"index $k")
        }
        EmbeddingIndex(s("name"), s("src"), s("tgt"), s("model"))
      }
      case _ => Nil
    }
    TableSchema(name, fields, indices)
  }
}
