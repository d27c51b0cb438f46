package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** DSIR — Data Selection via Importance Resampling (Xie et al. 2023,
  * "Data Selection for Language Models via Importance Resampling",
  * NeurIPS) — the published recipe for picking pretraining documents
  * that "look like" a target corpus:
  *
  *  1. FEATURES: hashed n-gram bag-of-words (unigrams AND bigrams both
  *     hashed into B buckets — fastText's `bucket` trick, Joulin et al.
  *     2016; unlike [[TextAnalysis.featureTokens]], which buckets only
  *     n >= 2 grams, DSIR's feature space is exactly the B buckets).
  *  2. FIT: two multinomial bag models — target p and raw q — from
  *     bucket counts with add-alpha (Lidstone) smoothing, kept as the
  *     per-bucket log importance ratio `ln p[b] - ln q[b]`.
  *  3. SCORE: per document, `log w(d) = Σ_features ln p[b(f)] - ln q[b(f)]`
  *     (the bag-of-buckets log likelihood ratio).
  *  4. RESAMPLE: Gumbel top-k — `key = log w + Gumbel(0,1)`, take the k
  *     largest — which draws k documents WITHOUT replacement with
  *     probability proportional to w (Efraimidis & Spirakis 2006 /
  *     Kool et al. 2019); the Gumbel noise is a deterministic hash of
  *     the document id, so the sample is reproducible on any engine,
  *     any partitioning, any run.
  *
  * Scale shape (the reason each stage looks the way it does):
  *  - fit is ONE pass over target ∪ raw (tag column, partial-merge
  *    count aggregate) whose result is bounded by B — the only shuffle
  *    carries B rows, and the driver read is the model itself;
  *  - the model rides the score expression as a hash-indexed reference
  *    object ([[TextAnalysis.linearClassSums]] — the langID kernel), so
  *    scoring is MAP-ONLY whole-stage codegen: no join, no shuffle, no
  *    UDF, with the per-document sum accumulated in exact micro-unit
  *    Longs (order-free, bit-identical on any partitioning);
  *  - resampling is one TakeOrderedAndProject (top-k, never a global
  *    sort), with ties broken by id.
  *
  * Everything is md5-derived ([[TextAnalysis.hash60]]), so the DuckDB
  * oracle can replay the whole chain value-for-value.
  */
object Dsir {
  import TextAnalysis.{hash60, linearClassSums, tokens}

  /** Hashed n-gram bucket-token features: every n-gram (n = 1..
    * `wordNgrams`, space-joined) becomes the token
    * `"#" + (hash60(ngram) mod buckets)`. The feature space is exactly
    * the B buckets — collisions share a ratio, the standard trade. */
  def featureBuckets(toks: Column, wordNgrams: Int, buckets: Int): Column = {
    require(wordNgrams >= 1 && wordNgrams <= 3, "wordNgrams must be 1..3")
    require(buckets >= 2, "need at least 2 buckets")
    def bucketOf(gram: Column): Column =
      concat(lit("#"), pmod(hash60(gram), lit(buckets.toLong)).cast("string"))
    (1 to wordNgrams).map { n =>
      if (n == 1) transform(toks, t => bucketOf(t))
      else when(size(toks) < n, array().cast("array<string>"))
        .otherwise {
          // zip_with over shifted slices, NOT transform(sequence)/
          // element_at: the latter re-evaluates the (inlined) toks
          // expression per element — O(tokens²) per doc (see
          // TextAnalysis.featureTokens)
          val len = size(toks) - (n - 1)
          val grams = (0 until n)
            .map(o => slice(toks, lit(o + 1), len))
            .reduce((a, b) =>
              zip_with(a, b, (x, y) => concat(x, lit(" "), y)))
          transform(grams, g => bucketOf(g))
        }
    }.reduce(concat(_, _))
  }

  /** A fitted DSIR model: one log importance ratio per bucket token
    * ("#0".."#B-1" — ALL B buckets present, unseen ones carrying the
    * smoothed constant), plus the fit configuration. Bounded by B. */
  final case class DsirModel(wordNgrams: Int, buckets: Int, alpha: Double,
      logRatio: Map[String, Double]) {
    require(logRatio.size == buckets, "model must cover every bucket")

    def save(spark: SparkSession, dir: String): Unit = {
      import spark.implicits._
      logRatio.toSeq.sortBy(_._1).toDF("bucket", "log_ratio")
        .coalesce(1).write.mode("overwrite").parquet(s"$dir/ratios.parquet")
      Seq((wordNgrams, buckets, alpha)).toDF("word_ngrams", "buckets", "alpha")
        .write.mode("overwrite").parquet(s"$dir/meta.parquet")
    }
  }

  object DsirModel {
    def load(spark: SparkSession, dir: String): DsirModel = {
      val meta = spark.read.parquet(s"$dir/meta.parquet").head()
      val ratios = spark.read.parquet(s"$dir/ratios.parquet")
        .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
      DsirModel(meta.getAs[Int]("word_ngrams"), meta.getAs[Int]("buckets"),
        meta.getAs[Double]("alpha"), ratios)
    }
  }

  /** Fit the per-bucket log importance ratios from a target corpus and a
    * raw corpus (they may overlap — e.g. target ⊂ raw, the paper's
    * setup; each side is counted independently). ONE distributed pass:
    * the union is tagged, exploded to bucket tokens, and count-aggregated
    * — a partial-merge shuffle bounded by B rows — then the B-row result
    * becomes the driver-side model (the same bounded model-read class as
    * the langID weight tables). Probabilities are add-`alpha` smoothed
    * over the B-bucket domain, so every bucket — including ones unseen
    * in either corpus — has a finite ratio. */
  def fit(target: DataFrame, raw: DataFrame, textCol: String,
      wordNgrams: Int = 2, buckets: Int = 10000,
      alpha: Double = 1.0): DsirModel = {
    require(alpha > 0, "alpha must be > 0")
    require(buckets <= (1 << 24), "bucket table must stay driver-bounded")
    val tagged = target.select(col(textCol).as("__t"), lit(1L).as("__is_t"))
      .unionByName(raw.select(col(textCol).as("__t"), lit(0L).as("__is_t")))
    val counts = tagged
      .select(explode(featureBuckets(tokens(col("__t")), wordNgrams, buckets))
        .as("b"), col("__is_t"))
      .groupBy("b")
      .agg(sum(col("__is_t")).as("ct"),
        sum(lit(1L) - col("__is_t")).as("cr"))
      .collect()
      .map(r => r.getString(0).drop(1).toInt -> (r.getLong(1), r.getLong(2)))
      .toMap
    val tTot = counts.valuesIterator.map(_._1).sum
    val rTot = counts.valuesIterator.map(_._2).sum
    val lnTDenom = math.log(tTot + alpha * buckets)
    val lnRDenom = math.log(rTot + alpha * buckets)
    val ratios = (0 until buckets).map { b =>
      val (ct, cr) = counts.getOrElse(b, (0L, 0L))
      ("#" + b) -> (math.log(ct + alpha) - lnTDenom
        - math.log(cr + alpha) + lnRDenom)
    }.toMap
    DsirModel(wordNgrams, buckets, alpha, ratios)
  }

  /** Score every document with its log importance weight, appended as a
    * MICRO-unit Long column (`round(ratio·1e6)` summed per feature
    * occurrence — exact, order-free, cross-engine-stable; divide by 1e6
    * for the double). Map-only: the model rides the expression as a
    * hash-indexed reference object, no join. An empty document scores 0. */
  def score(df: DataFrame, textCol: String, model: DsirModel,
      outCol: String = "dsir_logw_micro"): DataFrame = {
    val feats = featureBuckets(tokens(col(textCol)), model.wordNgrams,
      model.buckets)
    val micro = element_at(linearClassSums(feats, 1,
      model.logRatio.map { case (k, v) => k -> Seq(v) }), 1)
    df.withColumn(outCol, micro)
  }

  /** The Gumbel-perturbed resampling key: `log w + (-ln(-ln u))` with
    * `u = (hash60("g:" + id) mod 10^6 + 0.5) / 10^6` — a deterministic
    * uniform from the id, so the "randomness" replays identically on
    * any engine. Taking the k largest keys draws k documents without
    * replacement ∝ w (the Gumbel top-k identity). */
  def gumbelKey(idCol: Column, logwMicro: Column): Column = {
    val u = (pmod(hash60(concat(lit("g:"), idCol.cast("string"))),
      lit(1000000L)).cast("double") + lit(0.5)) / lit(1e6)
    logwMicro.cast("double") / lit(1e6) - log(-log(u))
  }

  /** Select `k` documents from a scored corpus by Gumbel top-k — one
    * TakeOrderedAndProject on (key desc, id asc), never a global sort.
    * Returns the selected rows with the key appended. */
  def resample(scored: DataFrame, idCol: String, k: Int,
      logwMicroCol: String = "dsir_logw_micro",
      keyCol: String = "dsir_key"): DataFrame = {
    require(k >= 0, "k must be >= 0")
    scored.withColumn(keyCol, gumbelKey(col(idCol), col(logwMicroCol)))
      .orderBy(col(keyCol).desc, col(idCol).asc)
      .limit(k)
  }

  /** fit + score + resample in one call — the paper's end-to-end
    * pipeline: rank the raw corpus by how target-like it looks, sample
    * k without replacement ∝ the importance weight. */
  def select(target: DataFrame, raw: DataFrame, textCol: String,
      idCol: String, k: Int, wordNgrams: Int = 2, buckets: Int = 10000,
      alpha: Double = 1.0): DataFrame = {
    val model = fit(target, raw, textCol, wordNgrams, buckets, alpha)
    resample(score(raw, textCol, model), idCol, k)
  }
}
