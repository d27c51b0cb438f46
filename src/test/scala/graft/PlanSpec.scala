package graft

import org.apache.spark.sql.execution.ExplainMode

/** Plan-shape regression gate: the properties that make the engine scale
  * are facts about the PLAN (pushdown, broadcast, no cartesian blowups),
  * so they are asserted here rather than trusted to survive refactors. */
class PlanSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  // physical plan only: logical plans legitimately contain Sort/Join nodes
  // that the planner then specializes away
  private def explain(name: String): String =
    SparkEntry.queries(name)(spark, dir)
      .queryExecution.explainString(ExplainMode.fromString("simple"))

  // bounded theta-joins by design: exact verification baselines the
  // oracles need (dd_jaccard id<200 subset, dd_embed_cosine id<300
  // subset); r1_knn_join broadcasts a 20-row query side — a BNLJ with a
  // tiny broadcast side IS the right exact-kNN plan; the BM25 queries
  // crossJoin a broadcast ONE-ROW global-stats frame into the scoring
  // pass (Bm25.queryStats: the no-driver-action alternative to
  // collecting N/avgdl/df) — a 1-row broadcast BNLJ is a map-side
  // constant attach, not a blowup
  private val intentionalThetaJoins =
    Set("dd_jaccard_pairs", "dd_embed_cosine", "r1_knn_join",
      "tx_bm25_topk", "tx_bm25_batch", "hy_rrf_fusion",
      "hy_rrf_filtered", // same 1-row BM25 stats attach as hy_rrf_fusion
      // bigramLmScore crossJoins a broadcast ONE-ROW vocab-size frame into
      // the scoring pass — the same map-side constant attach as BM25
      // pl_ccnet_perlang carries one such 1-row attach PER language chain
      "tx_lm_score", "pl_lm_buckets", "pl_lm_mix", "pl_ccnet",
      "pl_ccnet_perlang",
      // the Zipf gate crossJoins two ONE-ROW aggregates (totals × slope)
      "tx_zipf_stats",
      // the joined-model classifier fans each doc out over the BOUNDED
      // (class, bias) table — a broadcast BNLJ over |classes| rows is
      // the intended per-class score expansion, not a blowup
      // (pl_ccnet_distributed composes that same classifier)
      "tx_langid_joined", "pl_ccnet_distributed")

  // store-DML queries execute real writes at construction; plan-shape for
  // their read side is covered by a1_store_scan_page's oracle. The two
  // cheap pure-query exclusions keep this suite fast, not lenient.
  private val skipped = Set(
    "d1_insert_firstwins", "d1_insert_counts", "d2_upsert_lastwins",
    "d3_delete_filter", "d4_insert_prepare", "a1_store_scan_page",
    "s2_time_travel", "s7_statistics", "s6_csv_load",
    // serve-dispatch gates: a fresh store + index build + DRIVER-side
    // serving runs at construction (store-DML cost class); their output
    // frames are collected serve results joined back by id — no analytic
    // plan to audit
    "v4_serve_filtered", "v11_serve_filtered_batch")

  test("no accidental cartesian or nested-loop joins in any gate query plan") {
    val offenders = SparkEntry.queries.keys.toSeq.sorted
      .filterNot(skipped)
      .filterNot(intentionalThetaJoins)
      .flatMap { name =>
        val p = explain(name)
        if (p.contains("CartesianProduct") || p.contains("BroadcastNestedLoopJoin"))
          Some(name)
        else None
      }
    assert(offenders.isEmpty, s"unexpected join blowup in: $offenders")
  }

  test("predicate pushdown reaches the parquet scan (p2_filter_expr)") {
    val p = explain("p2_filter_expr")
    assert(p.contains("PushedFilters: ["), p.linesIterator.toSeq.takeRight(30).mkString("\n"))
    assert(!p.contains("PushedFilters: []"))
  }

  test("pl_pack_sharded windows are partitioned (no single-partition global window)") {
    val p = explain("pl_pack_sharded")
    val windows = p.linesIterator.filter(_.contains("windowspecdefinition")).toSeq
    assert(windows.nonEmpty, p)
    assert(windows.forall(_.contains("lang")),
      s"window without a partition key found:\n${windows.mkString("\n")}")
  }

  test("q3 join keeps a broadcast side (small dimension table)") {
    val p = explain("q3_join_topk")
    assert(p.contains("BroadcastHashJoin") || p.contains("broadcast"), p)
  }

  test("dd_minhash_lsh candidate join is an equi-join, never a cross join") {
    val p = explain("dd_minhash_lsh")
    assert(p.contains("SortMergeJoin") || p.contains("BroadcastHashJoin")
      || p.contains("ShuffledHashJoin"), p)
  }

  test("v3 top-K compiles to TakeOrderedAndProject (no global sort)") {
    val p = explain("v3_topk_l2")
    assert(p.contains("TakeOrderedAndProject"), p)
    assert(!p.contains("Sort ["), "global sort snuck into the top-K plan")
  }

  test("a1 pagination prunes columns at the scan") {
    val p = explain("a1_scan_page")
    // events has 6+ columns; the query projects 4 — ReadSchema must not
    // carry the full row
    val read = p.linesIterator.find(_.contains("ReadSchema")).getOrElse("")
    assert(!read.contains("props"), s"unpruned scan: $read")
  }

  test("a4 default projection prunes the vector column from the scan") {
    val p = explain("a4_project_all")
    // default projection = non-vector fields only; column pruning must
    // keep the 64-float embedding out of the parquet read entirely
    val read = p.linesIterator.find(_.contains("ReadSchema")).getOrElse("")
    val schema = read.substring(read.indexOf("ReadSchema:"))
    assert(!schema.contains("embedding"),
      s"vector column read for a non-vector projection: $schema")
  }

  test("v10 second-field search is still a TakeOrderedAndProject top-K") {
    val p = explain("v10_multi_field")
    assert(p.contains("TakeOrderedAndProject"), p)
  }

  test("dd_paragraph_dedup dedups via a partial-merge aggregate, not a digest window") {
    // boilerplate paragraphs are heavy hitters: a window partitioned by
    // the digest shuffles every occurrence of a repeated paragraph into
    // ONE task and sorts it there (10⁹-row single-task sort at 100 TB).
    // The skew-proof shape is groupBy(digest).agg(min(struct(id, idx)))
    // — partial aggregation collapses heavy digests map-side — plus a
    // join-back on the unique (id, idx) coordinate. Assert the plan has
    // a partial min over the digest and NO window anywhere.
    val p = SparkEntry.queries("dd_paragraph_dedup")(spark, dir)
      .queryExecution.explainString(ExplainMode.fromString("formatted"))
    assert(!p.contains("Window"), s"digest window crept back into:\n$p")
    assert(p.contains("partial_min"),
      s"no map-side partial min over the digest in:\n$p")
  }

  test("survivor picks dedup via partial-merge aggregates, not digest/cluster windows") {
    // dropExactDuplicates[By] / keepClusterSurvivors are reachable from
    // every shipped composition (cleanCorpusFull, cleanCorpus, semDedup);
    // a digest- or cluster-partitioned window shuffles a duplicate FLOOD
    // (10⁹ identical docs) into ONE task. Assert the whole composed
    // plans are window-free and winner picks are partial-merge mins.
    for (q <- Seq("dd_dup_survivors", "pl_semdedup", "pl_clean_full",
        "pl_clean_corpus")) {
      val p = SparkEntry.queries(q)(spark, dir)
        .queryExecution.explainString(ExplainMode.fromString("formatted"))
      assert(!p.contains("Window"), s"window crept back into $q:\n$p")
      assert(p.contains("partial_min"),
        s"no map-side partial min winner pick in $q:\n$p")
    }
  }

  test("per-language tercile buckets assign via broadcast cutoffs, not a language window") {
    // language is THE canonical skewed key of a web crawl (English ≈ half
    // of CommonCrawl): ntile(3) OVER (PARTITION BY lang) shuffles every
    // row of the heaviest language into ONE task and sorts it there. The
    // scale-safe shape (Pipelines.quantileBuckets) is a partial-agg
    // (class, score) count, a tiny per-class cutoff fold, and a
    // BROADCAST join + map-only compare. Assert: no Window node anywhere
    // in any of the four composed plans, and the cutoff table joins back
    // as a broadcast.
    // pl_ccnet_joined: the joined multi-LM engine — additionally free of
    // the 1-row vocab crossJoin the per-class chains carry (its k·V mass
    // is a per-class broadcast HASH join), so it is NOT in the
    // theta-join allowlist above
    for (q <- Seq("pl_lm_buckets", "pl_lm_mix", "pl_ccnet",
        "pl_ccnet_perlang", "pl_ccnet_joined", "pl_ccnet_distributed",
        "pl_ccnet_trigram", "pl_ccnet_5gram", "pl_ccnet_kn5")) {
      val p = SparkEntry.queries(q)(spark, dir)
        .queryExecution.explainString(ExplainMode.fromString("formatted"))
      assert(!p.contains("Window"),
        s"skewed-key window crept back into $q:\n$p")
      assert(p.contains("BroadcastHashJoin") || p.contains("BroadcastNestedLoop"),
        s"no broadcast cutoff join in $q:\n$p")
    }
  }

  test("pruned and order-5 LM gates stay window-free with broadcast totals") {
    // the minCount floor is a filter on the partial-merge aggregate and
    // the order-n apply is left joins + a broadcast (N, V) attach — a
    // Window or a non-broadcast totals join here would re-introduce the
    // skewed-language single-task shapes these engines exist to avoid
    for (q <- Seq("tx_lm_trigram_pruned", "tx_lm_5gram_perlang",
        "tx_lm_kn5_perlang")) {
      val p = SparkEntry.queries(q)(spark, dir)
        .queryExecution.explainString(ExplainMode.fromString("formatted"))
      assert(!p.contains("Window"),
        s"skewed-key window crept back into $q:\n$p")
      assert(p.contains("BroadcastHashJoin"),
        s"no broadcast totals join in $q:\n$p")
    }
  }

  test("DSIR scoring is map-only (no shuffle, no join) and selection is a top-k") {
    // the model rides the score expression as a hash-indexed reference
    // object — an Exchange or Join in the score plan means the kernel
    // regressed to a shuffle shape that can't scale to a 100 TB raw side
    import org.apache.spark.sql.functions.col
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    val model = graft.pipeline.Dsir.fit(docs.filter(col("lang") === "en"),
      docs, "text", wordNgrams = 2, buckets = 64, alpha = 1.0)
    val scorePlan = graft.pipeline.Dsir.score(docs, "text", model)
      .queryExecution.explainString(ExplainMode.fromString("simple"))
    assert(!scorePlan.contains("Exchange"),
      s"DSIR score must stay map-only:\n$scorePlan")
    assert(!scorePlan.contains("Join"),
      s"the model must ride the kernel, not a join:\n$scorePlan")
    val p = explain("pl_dsir_select")
    assert(p.contains("TakeOrderedAndProject"),
      s"Gumbel top-k must be a TakeOrderedAndProject, not a global sort:\n$p")
  }

  test("sparse index read prunes posting buckets at the directory level (v2_sparse_inverted)") {
    val p = explain("v2_sparse_inverted")
    // the pruned posting scan must carry a PartitionFilters entry on the
    // bucket column — that's the directory-level prune that makes
    // per-query cost |postings of the queried dims|, not corpus size
    val scan = p.linesIterator.find(l =>
      l.contains("PartitionFilters") && l.contains("dim_bkt")).getOrElse("")
    assert(scan.nonEmpty,
      s"no partition filter on dim_bkt in:\n${p.linesIterator.toSeq.takeRight(40).mkString("\n")}")
    // and the norm2 column stays out of the dot-product scan (only the
    // Euclidean SERVING path reads it)
    val reads = p.linesIterator.filter(_.contains("ReadSchema")).toSeq
    assert(reads.nonEmpty && reads.forall(!_.contains("norm2")),
      s"norm2 read by a query that doesn't need it:\n${reads.mkString("\n")}")
  }
}
