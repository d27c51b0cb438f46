package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** BM25 text retrieval, Spark-first.
  *
  * The reference has no keyword scoring (its only text operator is the
  * LIKE filter, engine/db/expr/expr.cpp) — this is a beyond-reference
  * pipeline operator: ranked keyword retrieval over the `documents`
  * table, the text half of a hybrid (dense + keyword) curation query.
  *
  * Two formulations, same math (Robertson/Okapi BM25, the nonnegative
  * "+1" idf of Lucene/public literature):
  *
  *   idf(t)      = ln(1 + (N - df + 0.5) / (df + 0.5))
  *   impact(d,t) = idf(t) * tf * (k1+1) / (tf + k1 * (1 - b + b*dl/avgdl))
  *   score(d,q)  = Σ_{t ∈ q} impact(d, t)
  *
  * 1. `scoreTopK` — ad-hoc: one pass over the corpus computing tf ONLY
  *    for the query's terms (the `isin` filter lands under the explode,
  *    so the shuffled relation is ≤ |q| rows per doc, not the corpus
  *    posting table). Corpus stats (N, avgdl, df) ride along as 1-row /
  *    |q|-row broadcasts — no driver action in the plan.
  *
  * 2. `impactPostings` — serving: the doc-side impact is a pure function
  *    of (tf, dl, df, N), all build-time constants, so BM25 top-k over a
  *    FROZEN corpus is exactly a sparse dot product between precomputed
  *    impact postings and a one-hot query over the terms' dims. That
  *    means the persisted inverted index (SparseIndex.buildFromPostings,
  *    bucketed by dim) and the WAND impact-ordered serving tier apply
  *    unchanged — keyword retrieval inherits the same guarded
  *    driver-serving path as sparse-vector search. Terms are
  *    feature-hashed to `dims` buckets (hash60 mod dims, the standard
  *    hashing-trick vocabulary: at 2^22 dims a 1M-term vocabulary sees
  *    ~0.01% pairwise collisions, which only ever MERGE two posting
  *    lists — scores degrade gracefully, ids never go missing).
  */
object Bm25 {

  val DefaultK1 = 1.2
  val DefaultB = 0.75
  val DefaultDims: Int = 1 << 22

  /** Per-(doc, term) tf plus the doc length, restricted to `terms` if
    * given (predicate under the explode → tiny shuffle). */
  private def tfWithDl(df: DataFrame, textCol: String, idCol: String,
      terms: Option[Seq[String]]): DataFrame = {
    val toks = df.select(col(idCol).as("id"),
      TextAnalysis.tokens(col(textCol)).as("toks"))
      .withColumn("dl", size(col("toks")).cast("double"))
    val exploded = toks.select(col("id"), col("dl"),
      explode(col("toks")).as("term"))
    val filtered = terms match {
      case Some(ts) => exploded.filter(col("term").isin(ts: _*))
      case None => exploded
    }
    filtered.groupBy(col("id"), col("term"))
      .agg(count(lit(1)).cast("double").as("tf"), first(col("dl")).as("dl"))
  }

  /** Corpus stats as a 1-row frame: (n_docs, avgdl). Broadcast-joined
    * into the scoring plan — no collect. */
  private def corpusStats(df: DataFrame, textCol: String): DataFrame =
    df.agg(count(lit(1)).cast("double").as("n_docs"),
      avg(TextAnalysis.tokenCount(col(textCol)).cast("double")).as("avgdl"))

  /** ALL of scoreTopK's global stats in ONE corpus pass: a 1-row frame
    * (n_docs, avgdl, df_0..df_{|q|-1}) with one conditional-sum aggregate
    * per query term — the literal term list is known at plan time, so df
    * needs no per-term shuffle, just |q| extra agg buffers. */
  private def queryStats(df: DataFrame, textCol: String,
      qTerms: Seq[String]): DataFrame = {
    val toks = TextAnalysis.tokens(col(textCol))
    val perDoc = df.select(
      size(toks).cast("double").as("dl"),
      array_intersect(array_distinct(toks), array(qTerms.map(lit): _*)).as("qt"))
    val aggs = Seq(count(lit(1)).cast("double").as("n_docs"),
      avg(col("dl")).as("avgdl")) ++
      qTerms.zipWithIndex.map { case (t, i) =>
        sum(when(array_contains(col("qt"), t), 1.0)).as(s"df_$i") }
    perDoc.agg(aggs.head, aggs.tail: _*)
  }

  private def impactCol(k1: Double, b: Double) =
    log(lit(1.0) + (col("n_docs") - col("df") + lit(0.5)) / (col("df") + lit(0.5))) *
      (col("tf") * lit(k1 + 1.0)) /
      (col("tf") + lit(k1) * (lit(1.0) - lit(b) + lit(b) * col("dl") / col("avgdl")))

  /** Top-k docs for a bag of query terms: (id, score) with score rounded
    * to 4 decimals; ordering (and the k-cut) on the ROUNDED score with id
    * tie-break, so the cut is reproducible across engines.
    * Exactly TWO corpus passes (the minimum — global stats must complete
    * before scoring): pass 1 is `queryStats`' single 1-row aggregate,
    * pass 2 is explode+filter → one partial-agged shuffle on (id, term)
    * → broadcast-stats scoring → groupBy(id) (≤|q| rows per id) →
    * TakeOrderedAndProject. */
  def scoreTopK(df: DataFrame, textCol: String, idCol: String,
      terms: Seq[String], k: Int,
      k1: Double = DefaultK1, b: Double = DefaultB): DataFrame = {
    val qTerms = terms.distinct
    // an empty keyword query matches nothing (and zero-arg coalesce below
    // would not even plan) — return an empty, correctly-typed result
    if (qTerms.isEmpty)
      return df.select(col(idCol), lit(0.0).as("score")).limit(0)
    val tf = tfWithDl(df, textCol, idCol, Some(qTerms))
    // per-row df: pick this row's term's df_i off the broadcast stats row
    val dfCol = coalesce(qTerms.zipWithIndex.map { case (t, i) =>
      when(col("term") === lit(t), col(s"df_$i")) }: _*)
    val scored = tf
      .crossJoin(broadcast(queryStats(df, textCol, qTerms)))
      .withColumn("df", dfCol)
      .withColumn("impact", impactCol(k1, b))
      .groupBy(col("id"))
      .agg(round(sum(col("impact")), 4).as("score"))
    scored.orderBy(col("score").desc, col("id").asc)
      .limit(k)
      .select(col("id").as(idCol), col("score"))
  }

  /** Batch BM25: many keyword queries in ONE pair of corpus passes.
    *
    * Pass 1 computes the global stats for the UNION of all queries' terms
    * (still a single 1-row aggregate — one conditional-sum buffer per
    * distinct term); pass 2 scores per-(doc, term) impacts once, then a
    * broadcast equi-join against the tiny (qid, term) relation fans each
    * impact out to the queries that asked for that term, sums per
    * (qid, doc), and cuts each query's top-k with the bounded-heap
    * aggregate ([[graft.functions.topk_min]] on the NEGATED rounded score
    * — partial aggregation, so the shuffle carries Q·k·tasks pairs).
    * Contamination sweeps and eval-probe retrieval want exactly this
    * shape: at 100 TB, Q sequential scoreTopK jobs = Q corpus scans; this
    * is 2 scans total regardless of Q.
    *
    * Queries with no terms (or only unseen terms) return no rows, like
    * `scoreTopK`. Returns (qid, rank, <idCol>, score), rank 1..k by
    * (score desc, id asc) on the 4-decimal-rounded score.
    */
  def scoreTopKBatch(df: DataFrame, textCol: String, idCol: String,
      queries: Seq[(Long, Seq[String])], k: Int,
      k1: Double = DefaultK1, b: Double = DefaultB): DataFrame = {
    val cleaned = queries.map { case (qid, ts) => (qid, ts.distinct) }
    val allTerms = cleaned.flatMap { case (_, ts) => ts }.distinct
    require(allTerms.nonEmpty, "batch keyword search needs at least one term")
    val tf = tfWithDl(df, textCol, idCol, Some(allTerms))
    val dfCol = coalesce(allTerms.zipWithIndex.map { case (t, i) =>
      when(col("term") === lit(t), col(s"df_$i")) }: _*)
    val scored = tf
      .crossJoin(broadcast(queryStats(df, textCol, allTerms)))
      .withColumn("df", dfCol)
      .withColumn("impact", impactCol(k1, b))
    val spark = df.sparkSession
    import spark.implicits._
    val qterms = broadcast(
      cleaned.flatMap { case (qid, ts) => ts.map(t => (qid, t)) }
        .toDF("qid", "term"))
    scored.join(qterms, "term")
      .groupBy(col("qid"), col("id"))
      .agg(round(sum(col("impact")), 4).as("score"))
      .groupBy(col("qid"))
      .agg(graft.functions.topk_min(k, -col("score"), col("id")).as("topk"))
      .select(col("qid"), posexplode(col("topk")).as(Seq("pos", "hit")))
      .select(col("qid"), (col("pos") + 1).cast("int").as("rank"),
        col("hit.id").as(idCol), (-col("hit.d")).as("score"))
  }

  /** Precomputed doc-side BM25 impact postings (id, dim, v): feed to
    * SparseIndex.buildFromPostings; colliding terms' impacts SUM into one
    * dim (deterministic merge). Build cost: the corpus posting shuffle +
    * one vocab-sized df agg — the same passes an inverted-index build
    * already pays.
    *
    * Append caveat (standard BM25 index maintenance): impacts bake in the
    * BUILD-TIME global stats (df, avgdl, N). Appending docs through
    * SparseIndex.append scores them against those frozen stats — idf goes
    * stale gradually, exactly like every production inverted index, and
    * the drift-bounded rebuild (SparseIndex.MaxAppendFraction) refreshes
    * the stats before staleness can matter. */
  def impactPostings(df: DataFrame, textCol: String, idCol: String,
      dims: Int = DefaultDims,
      k1: Double = DefaultK1, b: Double = DefaultB): DataFrame = {
    val tf = tfWithDl(df, textCol, idCol, None)
    val dfPerTerm = tf.groupBy(col("term"))
      .agg(count(lit(1)).cast("double").as("df"))
    tf.join(dfPerTerm, "term") // vocab-sized build-time join: shuffle, not broadcast
      .crossJoin(broadcast(corpusStats(df, textCol)))
      .withColumn("impact", impactCol(k1, b))
      .withColumn("dim", pmod(graft.functions.hash60(col("term")), lit(dims.toLong)).cast("int"))
      .groupBy(col("id"), col("dim"))
      .agg(sum(col("impact")).cast("float").as("v"))
  }

  /** The query side of the impact formulation: distinct sorted dims with
    * weight 1.0 each (a colliding pair of query terms keeps ONE dim —
    * its posting list already carries both terms' summed impacts). */
  def queryDims(terms: Seq[String], dims: Int = DefaultDims): Array[Int] =
    terms.distinct
      .map(t => math.floorMod(
        graft.functions.Hash60.compute(
          org.apache.spark.unsafe.types.UTF8String.fromString(t)),
        dims.toLong).toInt)
      .distinct.sorted.toArray
}
