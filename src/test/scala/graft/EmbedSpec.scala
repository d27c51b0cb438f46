package graft

import org.apache.spark.sql.functions._
import graft.embed._
import graft.functions._

/** Static counters survive closure serialization in local mode (one JVM). */
object CountingEmbedder {
  val textsEmbedded = new java.util.concurrent.atomic.AtomicInteger(0)
  def reset(): Unit = textsEmbedded.set(0)
}
class CountingEmbedder(val model: String, val dim: Int) extends EmbeddingService {
  private val inner = new DeterministicEmbedder(model, dim)
  def embedBatch(texts: Seq[String]): Seq[Array[Float]] = {
    CountingEmbedder.textsEmbedded.addAndGet(texts.size)
    inner.embedBatch(texts)
  }
}

/** D5 auto-embedding stage + V9 search-by-content + S6 CSV source. */
class EmbedSpec extends SparkSpec {
  import spark.implicits._

  test("embedStage fills the vector column in batches; deterministic") {
    val docs = Seq((1L, "hello world"), (2L, "goodbye world"), (3L, "hello world"))
      .toDF("id", "text")
    val svc = new DeterministicEmbedder("fake/unit", 8)
    val out = AutoEmbed.embedStage(docs, "text", "emb", svc, batchSize = 2)
    val rows = out.collect().map(r => r.getLong(0) -> r.getSeq[Float](2)).toMap
    assert(rows(1L).length == 8)
    assert(rows(1L) == rows(3L)) // same text, same vector
    assert(rows(1L) != rows(2L))
    // unit norm
    val n = math.sqrt(rows(1L).map(x => x.toDouble * x).sum)
    assert(math.abs(n - 1.0) < 1e-5)
  }

  test("retrying service retries then succeeds") {
    var calls = 0
    val flaky = new EmbeddingService {
      def model = "flaky"; def dim = 4
      def embedBatch(texts: Seq[String]): Seq[Array[Float]] = {
        calls += 1
        if (calls < 3) throw new RuntimeException("transient")
        texts.map(_ => Array(1f, 0f, 0f, 0f))
      }
    }
    val svc = new RetryingEmbeddingService(flaky, retries = 3, backoffMs = 1)
    assert(svc.embedBatch(Seq("x")).head.toSeq == Seq(1f, 0f, 0f, 0f))
    assert(calls == 3)
  }

  test("search-by-content e2e: embed at ingest, query by text finds same doc") {
    val docs = Seq(
      (1L, "spark shuffles and joins"),
      (2L, "cats and dogs at home"),
      (3L, "parquet column pruning")).toDF("id", "text")
    val svc = new DeterministicEmbedder("fake/e2e", 16)
    val embedded = AutoEmbed.embedStage(docs, "text", "emb", svc)
    // querying with the exact text of doc 2 must rank doc 2 first
    val q = svc.embedBatch(Seq("cats and dogs at home")).head
    val top = embedded
      .withColumn("@distance", cosine_distance(col("emb"), lit(q)))
      .orderBy(col("@distance").asc, col("id").asc)
      .limit(1).select("id").head().getLong(0)
    assert(top == 2L)
  }

  test("insert embeds each row exactly once (batch cached across actions)") {
    // insert runs several actions (validation/dedup counts, id assignment,
    // write); without caching each one re-runs the embedding stage — and
    // re-calls the external service 4-6x per batch
    CountingEmbedder.reset()
    AutoEmbed.register("counting", dim => new CountingEmbedder("counting/test", dim))
    val schema = graft.types.TableSchema("embonce", Seq(
      graft.types.FieldSchema("id", graft.types.FieldType.BigInt, primaryKey = true),
      graft.types.FieldSchema("text", graft.types.FieldType.Str),
      graft.types.FieldSchema("vec", graft.types.FieldType.VectorFloat, dimensions = 8)),
      indices = Seq(graft.types.EmbeddingIndex("ix", "text", "vec", "counting/test")))
    val store = graft.store.TableStore.create(spark, tmpDir("embed_once"), schema)
    val n = 100
    val rows = (1 to n).map(i => (i.toLong, s"document number $i")).toDF("id", "text")
    val res = store.insert(rows)
    assert(res.inserted == n)
    assert(CountingEmbedder.textsEmbedded.get() == n,
      s"expected each of $n rows embedded once, got ${CountingEmbedder.textsEmbedded.get()}")
  }

  test("provider clients: request shapes, key headers, prefix dispatch") {
    import org.json4s._
    import org.json4s.jackson.JsonMethods
    // capturing fake transport: echoes back unit vectors
    var captured: (String, Map[String, String], String) = null
    val fake = new HttpTransport {
      def post(url: String, headers: Map[String, String], body: String): (Int, String) = {
        captured = (url, headers, body)
        val n = (JsonMethods.parse(body) \ "documents") match {
          case JArray(a) => a.size
          case _ => (JsonMethods.parse(body) \ "inputs") match {
            case JArray(a) => a.size; case _ => 1
          }
        }
        val vecs = (1 to n).map(i => s"[${i.toFloat}, 0.0]").mkString(",")
        (200, s"""{"statusCode":200,"result":[$vecs]}""")
      }
    }
    val keys = Map(
      "X-OpenAI-API-Key" -> "sk-test",
      "X-VoyageAI-API-Key" -> "vk-test")

    // standard shape: /v1/embeddings with model/documents/dimensions
    val openai = new ProviderEmbeddingService(
      "http://svc", "openai/text-embedding-3-small", 2, keys, fake)
    val out = openai.embedBatch(Seq("a", "b"))
    assert(out.size == 2 && out(1).head == 2.0f)
    assert(captured._1 == "http://svc/v1/embeddings")
    assert(captured._2("X-OpenAI-API-Key") == "sk-test")
    val body = JsonMethods.parse(captured._3)
    assert((body \ "model") == JString("openai/text-embedding-3-small"))
    assert((body \ "documents") == JArray(List(JString("a"), JString("b"))))

    // voyage contextualized: dedicated path + [[doc]] inputs
    val ctx = new ProviderEmbeddingService(
      "http://svc", "voyageai/voyage-context-3", 2, keys, fake)
    ctx.embedBatch(Seq("x"))
    assert(captured._1 == "http://svc/v1/contextualizedembeddings")
    assert((JsonMethods.parse(captured._3) \ "inputs")
      == JArray(List(JArray(List(JString("x"))))))
    assert((JsonMethods.parse(captured._3) \ "output_dtype") == JString("float"))

    // voyage multimodal: dedicated path + truncation flag
    val mm = new ProviderEmbeddingService(
      "http://svc", "voyageai/voyage-multimodal-3", 2, keys, fake)
    mm.embedBatch(Seq("y"))
    assert(captured._1 == "http://svc/v1/multimodalembeddings")
    assert((JsonMethods.parse(captured._3) \ "truncation") == JBool(true))

    // missing key mirrors the reference's error text
    val noKey = new ProviderEmbeddingService(
      "http://svc", "mistralai/mistral-embed", 2, Map.empty, fake)
    val e = intercept[IllegalArgumentException](noKey.embedBatch(Seq("z")))
    assert(e.getMessage == "Missing MistralAI API key.")

    // registry dispatch by prefix; unknown models fall back to the fake
    ProviderEmbeddingService.configure("http://svc", keys, fake)
    assert(AutoEmbed.serviceFor("openai/text-embedding-3-small", 2)
      .isInstanceOf[ProviderEmbeddingService])
    assert(AutoEmbed.serviceFor("totally/unknown-model", 2)
      .isInstanceOf[DeterministicEmbedder])
  }

  test("CSV source round-trips a table (S6)") {
    val dir = tmpDir("csv_src")
    Seq((1, "a", 1.5), (2, "b", 2.5)).toDF("id", "name", "v")
      .write.mode("overwrite").option("header", "true").csv(dir)
    val back = spark.read.option("header", "true").option("inferSchema", "true").csv(dir)
    assert(back.count() == 2)
    assert(back.orderBy("id").collect().map(_.getString(1)).toSeq == Seq("a", "b"))
  }
}
