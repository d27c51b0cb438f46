package graft.embed

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.types._
import org.apache.spark.sql.functions.col

/** Auto-embedding at ingest (reference: engine/db/table_segment_mvp.cpp:
  * 746-762 + engine/services/embedding_service.cpp:47-373 — batch REST calls
  * to a provider keyed by model-name prefix, with retry/backoff).
  *
  * The service sits behind an interface so tests use a deterministic fake;
  * a production implementation would POST to a real provider. The Spark
  * stage is a batched mapPartitions: each partition groups rows into
  * `batchSize` chunks and makes ONE service call per chunk — the same
  * batching shape as the reference, but running on every executor in
  * parallel instead of a single ingest thread.
  */
trait EmbeddingService extends Serializable {
  def model: String
  def dim: Int
  def embedBatch(texts: Seq[String]): Seq[Array[Float]]
}

/** Deterministic hash-based embedder for tests/offline runs (no model,
  * no network): same text always produces the same unit vector. */
class DeterministicEmbedder(val model: String, val dim: Int) extends EmbeddingService {
  def embedBatch(texts: Seq[String]): Seq[Array[Float]] = texts.map { t =>
    var h = 1125899906842597L
    var i = 0
    while (i < t.length) { h = h * 31 + t.charAt(i); i += 1 }
    val out = new Array[Float](dim)
    var j = 0
    var acc = 0.0
    while (j < dim) {
      h ^= h << 13; h ^= h >>> 7; h ^= h << 17
      out(j) = ((h % 1000).toFloat / 1000.0f)
      acc += out(j).toDouble * out(j); j += 1
    }
    if (acc > 0) { val inv = (1.0 / math.sqrt(acc)).toFloat; (0 until dim).foreach(k => out(k) *= inv) }
    out
  }
}

/** Retry wrapper mirroring the reference's exponential backoff
  * (embedding_service.cpp:69,117-122). */
class RetryingEmbeddingService(inner: EmbeddingService, retries: Int = 3,
    backoffMs: Long = 100) extends EmbeddingService {
  def model: String = inner.model
  def dim: Int = inner.dim
  def embedBatch(texts: Seq[String]): Seq[Array[Float]] = {
    var attempt = 0
    var lastErr: Throwable = null
    while (attempt <= retries) {
      try return inner.embedBatch(texts)
      catch { case e: Throwable =>
        lastErr = e
        Thread.sleep(backoffMs << attempt)
        attempt += 1
      }
    }
    throw lastErr
  }
}

object AutoEmbed {

  /** Registry keyed by model-name prefix (the reference dispatches
    * openai/jina/voyage/... the same way, embedding_service.cpp:140-170;
    * everything resolves to the deterministic fake unless a real service
    * is registered). The factory receives the FULL model name and the
    * target dimension. */
  @volatile private var registry: Map[String, (String, Int) => EmbeddingService] = Map.empty
  def register(prefix: String, factory: (String, Int) => EmbeddingService): Unit =
    registry = registry + (prefix -> factory)
  /** Back-compat overload for dim-only factories. */
  def register(prefix: String, factory: Int => EmbeddingService): Unit =
    register(prefix, (_: String, dim: Int) => factory(dim))
  def serviceFor(model: String, dim: Int): EmbeddingService =
    registry.collectFirst { case (p, f) if model.startsWith(p) => f(model, dim) }
      .getOrElse(new DeterministicEmbedder(model, dim))

  /** Batched embedding stage: fills `tgtCol` (array<float>) from `srcCol`
    * (string). Narrow transform — no shuffle; batches of `batchSize` per
    * service call. */
  def embedStage(df: DataFrame, srcCol: String, tgtCol: String,
      service: EmbeddingService, batchSize: Int = 64): DataFrame = {
    val spark = df.sparkSession
    val srcIdx = df.schema.fieldIndex(srcCol)
    val outSchema = StructType(df.schema.fields.map { f =>
      if (f.name == tgtCol)
        StructField(tgtCol, ArrayType(FloatType, containsNull = false), nullable = true)
      else f
    } ++ (if (df.schema.fieldNames.contains(tgtCol)) Nil
          else Seq(StructField(tgtCol, ArrayType(FloatType, containsNull = false), nullable = true))))
    val tgtIdx = outSchema.fieldIndex(tgtCol)
    val replacing = df.schema.fieldNames.contains(tgtCol)
    val rdd = df.rdd.mapPartitions { it =>
      it.grouped(batchSize).flatMap { chunk =>
        val vecs = service.embedBatch(chunk.map(r => Option(r.getString(srcIdx)).getOrElse("")))
        chunk.zip(vecs).map { case (r, v) =>
          val base = r.toSeq
          val vals =
            if (replacing) base.updated(tgtIdx, v.toSeq)
            else base :+ v.toSeq
          Row.fromSeq(vals)
        }
      }
    }
    spark.createDataFrame(rdd, outSchema)
  }
}
