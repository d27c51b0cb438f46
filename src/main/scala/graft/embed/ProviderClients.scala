package graft.embed

import org.json4s._
import org.json4s.jackson.JsonMethods

/** Injected HTTP transport so provider clients are testable without a
  * network (and swappable for a pooled client in production). */
trait HttpTransport extends Serializable {
  /** POST `body` (JSON) to `url`; returns (statusCode, responseBody). */
  def post(url: String, headers: Map[String, String], body: String): (Int, String)
}

/** java.net.http-backed transport (lazily built per executor). */
class JdkHttpTransport(timeoutMs: Long = 30000) extends HttpTransport {
  @transient private lazy val client = java.net.http.HttpClient.newHttpClient()
  def post(url: String, headers: Map[String, String], body: String): (Int, String) = {
    val b = java.net.http.HttpRequest.newBuilder(java.net.URI.create(url))
      .timeout(java.time.Duration.ofMillis(timeoutMs))
      .POST(java.net.http.HttpRequest.BodyPublishers.ofString(body))
    headers.foreach { case (k, v) => b.header(k, v) }
    val resp = client.send(b.build(),
      java.net.http.HttpResponse.BodyHandlers.ofString())
    (resp.statusCode(), resp.body())
  }
}

/** Provider registry constants (reference: engine/utils/constants.hpp:4-9 —
  * per-provider API-key headers; engine/services/embedding_service.cpp:
  * 140-170 — key selection by model-name prefix). */
object Providers {
  val KeyHeaders: Seq[(String, String, String)] = Seq(
    // (model prefix, key header, human name for the missing-key error)
    ("openai/", "X-OpenAI-API-Key", "OpenAI"),
    ("jinaai/", "X-JinaAI-API-Key", "JinaAI"),
    ("voyageai/", "X-VoyageAI-API-Key", "VoyageAI"),
    ("mixedbreadai/", "X-MixedbreadAI-API-Key", "mixedbread ai"),
    ("nomicai/", "X-NOMIC-API-Key", "Nomic"),
    ("mistralai/", "X-MistralAI-API-Key", "MistralAI"))

  def forModel(model: String): Option[(String, String, String)] =
    KeyHeaders.find { case (p, _, _) => model.startsWith(p) }
}

/** Embedding client speaking the reference's embedding-service protocol
  * (engine/services/embedding_service.hpp:32-89, embedding_service.cpp:
  * 47-373): one proxy endpoint serves every standard provider —
  *
  *   POST {base}/v1/embeddings
  *        {"model": m, "documents": [...], "dimensions": d}
  *
  * with the provider's key header chosen by model prefix; VoyageAI
  * contextualized / multimodal models are special-cased to
  * /v1/contextualizedembeddings and /v1/multimodalembeddings with
  * `inputs: [[doc], ...]` request bodies. Responses are
  * `{"statusCode": 200, "result": [[floats], ...]}`.
  *
  * Failures throw — wrap in RetryingEmbeddingService for the reference's
  * exponential backoff (embedding_service.cpp:117-122). */
class ProviderEmbeddingService(
    baseUrl: String,
    val model: String,
    val dim: Int,
    keys: Map[String, String],
    transport: HttpTransport,
    reduceDimension: Boolean = false) extends EmbeddingService {

  private def jarr(xs: Seq[JValue]): JValue = JArray(xs.toList)

  private def keyHeader(): (String, String) = {
    val (_, header, name) = Providers.forModel(model).getOrElse(
      throw new IllegalArgumentException(s"no provider for model $model"))
    val key = keys.getOrElse(header,
      throw new IllegalArgumentException(s"Missing $name API key."))
    (header, key)
  }

  def embedBatch(texts: Seq[String]): Seq[Array[Float]] = {
    val isContextualized = model.contains("voyage-context")
    val isMultimodal = model.contains("voyage-multimodal")
    val (path, body) =
      if (isContextualized)
        ("/v1/contextualizedembeddings", JObject(List(
          "model" -> JString(model),
          "input_type" -> JString("document"),
          "output_dtype" -> JString("float"),
          "inputs" -> jarr(texts.map(t => jarr(Seq(JString(t))))))
          ++ (if (reduceDimension && dim > 0)
                List("output_dimension" -> JInt(dim)) else Nil)))
      else if (isMultimodal)
        ("/v1/multimodalembeddings", JObject(List(
          "model" -> JString(model),
          "input_type" -> JString("document"),
          "truncation" -> JBool(true),
          "inputs" -> jarr(texts.map(t => jarr(Seq(JString(t))))))))
      else
        ("/v1/embeddings", JObject(List(
          "model" -> JString(model),
          "documents" -> jarr(texts.map(JString)),
          "dimensions" -> JInt(if (reduceDimension) dim else 0))))
    val (header, key) = keyHeader()
    val (code, resp) = transport.post(s"$baseUrl$path",
      Map("Content-Type" -> "application/json", header -> key),
      JsonMethods.compact(JsonMethods.render(body)))
    if (code != 200)
      throw new RuntimeException(s"embedding service HTTP $code: $resp")
    val json = JsonMethods.parse(resp)
    (json \ "statusCode") match {
      case JInt(s) if s == 200 =>
      case other => throw new RuntimeException(s"embedding service status $other: $resp")
    }
    (json \ "result") match {
      case JArray(vecs) =>
        val out = vecs.map {
          case JArray(vals) => vals.map {
            case JDouble(d) => d.toFloat
            case JInt(i) => i.toFloat
            case JDecimal(d) => d.toFloat
            case other => throw new RuntimeException(s"bad embedding value $other")
          }.toArray
          case other => throw new RuntimeException(s"bad embedding row $other")
        }
        require(out.size == texts.size,
          s"embedding count ${out.size} != batch size ${texts.size}")
        out
      case other => throw new RuntimeException(s"no result in response: $resp")
    }
  }
}

object ProviderEmbeddingService {
  /** Register all provider prefixes in the AutoEmbed registry against one
    * service base URL (the reference passes the base URL at startup,
    * embedding_service.hpp:89; keys arrive per request as headers — here
    * they are captured at configuration time). */
  def configure(baseUrl: String, keys: Map[String, String],
      transport: HttpTransport = new JdkHttpTransport()): Unit =
    Providers.KeyHeaders.foreach { case (prefix, _, _) =>
      AutoEmbed.register(prefix, (model: String, dim: Int) =>
        new ProviderEmbeddingService(baseUrl, model, dim, keys, transport))
    }
}
