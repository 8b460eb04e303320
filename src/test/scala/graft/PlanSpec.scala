package graft

import org.apache.spark.sql.execution.FormattedMode

/** Plan-shape regression guards: the properties that make these queries
  * scale (scan pushdown, column pruning, broadcast dims, bounded
  * shuffle counts) asserted against the optimized plans — a perf
  * regression that silently flips a join strategy or drops a pushed
  * filter fails here, not in production.
  */
class PlanSpec extends SparkSpec {

  private val d = "/root/testdata/sf0.001"
  private def plan(name: String): String =
    SparkEntry.queries(name)(spark, d)
      .queryExecution.explainString(FormattedMode)

  test("q02: filters and projection reach the parquet scan") {
    val p = plan("q02_filter_project")
    assert(p.contains("PushedFilters"))
    assert(p.contains("GreaterThanOrEqual(l_shipdate"))
    assert(p.contains("GreaterThanOrEqual(l_quantity,48.0)"))
    // pruned read: none of the untouched money columns are scanned
    val readSchema = p.linesIterator.find(_.contains("ReadSchema")).get
    assert(!readSchema.contains("l_extendedprice"))
    assert(!readSchema.contains("l_discount"))
  }

  test("q05: every dimension joins as broadcast, facts shuffle at most twice") {
    val p = plan("q05_local_supplier_volume")
    assert(p.contains("BroadcastHashJoin"))
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"))
  }

  test("q01: aggregation is partial (map-side) before the single exchange") {
    val p = plan("q01_pricing_summary")
    val aggs = p.linesIterator.count(_.contains("HashAggregate"))
    assert(aggs >= 2) // partial + final
    assert(p.contains("Exchange"))
  }

  test("q09: global top-k plans as TakeOrderedAndProject, not a full sort") {
    val p = plan("q09_global_topk")
    assert(p.contains("TakeOrderedAndProject"))
  }

  test("q22: corpus is scored scan-side against a broadcast query set") {
    val p = plan("q22_knn_bruteforce")
    assert(p.contains("BroadcastNestedLoopJoin")) // tiny query set × corpus
    assert(p.contains("graft_vector_dot")) // native expression in the plan
  }

  test("q35: range join is an equi-join on the bucket, not a nested loop") {
    val p = plan("q35_range_join")
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"))
  }

  test("q47: token-packing window is partitioned (never single-partition)") {
    val p = plan("q47_token_packing")
    val windowLine = p.linesIterator.find(_.contains("windowspecdefinition")).get
    // an empty partition spec would read `windowspecdefinition(doc_id ASC`
    // (no partition columns before the ordering spec)
    assert(windowLine.contains("windowspecdefinition(shard"))
  }

  test("q54: per-doc repetition metrics plan no aggregation exchange") {
    // scan-side metrics: the only exchange allowed is the narrow-source
    // widening repartition; no HashAggregate anywhere (a shuffle-based
    // bigram groupBy would reintroduce the corpus-wide multiset shuffle)
    val p = plan("q54_repetition_quality")
    assert(!p.contains("HashAggregate") && !p.contains("SortAggregate"),
      "repetition metrics must stay scan-side")
  }

  test("q61: hot-key tagging joins as broadcast on both sides") {
    // the adaptive salt's hot-key frame must broadcast to facts AND
    // dims — a shuffled tag join would cost more than the skew it cures
    val p = plan("q61_adaptive_salted_join")
    assert(p.linesIterator.count(_.contains("BroadcastHashJoin")) >= 2, p)
  }

  test("q64: the corpus-size scalar joins as broadcast, not a shuffle") {
    val p = plan("q64_tfidf_top_terms")
    assert(p.contains("BroadcastNestedLoopJoin") ||
      p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("CartesianProduct"), p)
  }

  test("q67: winsorization bounds join back as broadcast") {
    val p = plan("q67_winsorized_stats")
    assert(p.contains("BroadcastHashJoin"), p)
  }

  test("q19: capped jaccard never joins candidates back against full shingle sets") {
    // the capped path's final joins are the small prelim-pair frames;
    // sort-merge joining two full shingle relations on id columns was
    // the measured 59M-row hot spot. The shingle self-join on `shingle`
    // is expected; no CartesianProduct anywhere. Inspect the LAZY plan:
    // the public operator eagerly materializes (Lifecycle), so its
    // returned plan is just a checkpoint scan.
    val docs = Tables.documents(spark, d)
    val (lazyPairs, pinned) = graft.operators.Dedup.ngramJaccardPairsLazy(
      docs, "doc_id", "text", n = 3, minJaccard = 0.5,
      maxDocFreq = Some(queries.DedupQueries.NgramMaxDocFreq))
    val p = lazyPairs.queryExecution.explainString(FormattedMode)
    pinned.foreach(_.unpersist(false))
    assert(!p.contains("CartesianProduct"))
  }

  test("q89: index side is bloom-filtered before the anti-join") {
    val p = plan("q89_bloom_dedup")
    // the membership test sits in a Filter on the corpus scan branch —
    // the prune happens BEFORE the join, which is the whole point
    assert(p.contains("graft_bloom_might_contain"), p)
    assert(p.contains("LeftAnti"), p)
  }

  test("q90: BM25 top-k is TakeOrderedAndProject over broadcast stats") {
    // inspect the LAZY plan — the public operator eagerly materializes
    // (Lifecycle), so its returned plan is just a checkpoint scan
    val (lazyTopK, pinned) = graft.operators.Retrieval.bm25TopKLazy(
      Tables.documents(spark, d), "doc_id", "text",
      Seq("dup", "spark", "join"), k = 20)
    val p = lazyTopK.queryExecution.explainString(FormattedMode)
    pinned.foreach(_.unpersist(false))
    assert(p.contains("TakeOrderedAndProject"), p) // never a global sort
    assert(p.contains("BroadcastHashJoin"), p)     // df(term) joins broadcast
  }

  test("q93: repeated spans plan no pairwise joins; windows partition by doc") {
    val p = plan("q93_repeated_spans")
    assert(!p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoopJoin"), p)
    val windowLines = p.linesIterator
      .filter(_.contains("windowspecdefinition")).toSeq
    assert(windowLines.nonEmpty && windowLines.forall(_.contains("doc_id")), p)
  }

  test("q91: heavy-hitter candidates join back as broadcast") {
    val p = plan("q91_heavy_tokens")
    assert(p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("SortMergeJoin"), p) // candidate set must stay tiny
  }

  test("q99: one shared stats scan + a pruned scan per distinct, hash-aggregated") {
    val p = plan("q99_column_profile")
    // the r14 profile shape: ALL non-distinct stats (count/nulls/min/
    // max for every column) fold into ONE 5-column scan, and each
    // exact countDistinct keeps its own single-column pruned scan —
    // 6 scans total. Still no Expand / SortAggregate anywhere: the
    // multi-distinct single-scan form costs 6x rows + sorts (measured
    // 7.5s vs ~1s on this profile).
    val scans = p.linesIterator.count(_.matches(""".*\(\d+\) Scan parquet.*"""))
    assert(scans == 6, p)
    val readSchemas = p.linesIterator
      .filter(_.contains("ReadSchema")).toSeq
    assert(readSchemas.size == 6, p)
    // 5 distinct branches read exactly one column each ("ReadSchema:
    // struct<c:t>" has exactly two colons — the label's and the single
    // field's); the shared stats branch reads all 5 (six colons)
    assert(readSchemas.count(_.count(_ == ':') == 2) == 5,
      readSchemas.mkString("\n"))
    assert(readSchemas.count(_.count(_ == ':') == 6) == 1,
      readSchemas.mkString("\n"))
    assert(!p.contains("Expand"), p)
  }

  test("q100: histogram aggregation is partial map-side; no row-level shuffle") {
    val p = plan("q100_hist_quantiles")
    // the sketch path must partial-aggregate (bins) before its exchange
    val aggs = p.linesIterator.count(_.contains("HashAggregate"))
    assert(aggs >= 2, p)
    assert(!p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoopJoin"), p)
  }

  test("q98: drop-set anti-join broadcasts; pair gen stays block-scoped") {
    val p = plan("q98_semantic_dedup")
    assert(p.contains("BroadcastHashJoin") &&
      p.contains("LeftAnti"), p) // small drop set → broadcast anti-join
    assert(!p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoopJoin"), p)
  }

  test("q116: interval overlap is an equi-join on the bucket, never a nested loop") {
    val p = plan("q116_interval_overlap")
    // the naive formulation (pure theta predicate) would plan a
    // nested-loop; the bucketed rewrite must keep it an equi-join
    assert(!p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoopJoin"), p)
    assert(p.contains("SortMergeJoin") || p.contains("ShuffledHashJoin") ||
      p.contains("BroadcastHashJoin"), p)
  }

  test("q117: fuzzy match equi-joins on deletion variants, never all-pairs") {
    val p = plan("q117_fuzzy_entity_match")
    assert(!p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoopJoin"), p)
    // Levenshtein runs as a post-join filter on candidates only
    assert(p.contains("levenshtein"), p)
  }

  test("q108: per-key robust stats broadcast back to the fact stream") {
    val p = plan("q108_mad_anomalies")
    // two stats frames (median, MAD) both rejoin as broadcast — the
    // fact stream is never shuffled for the join itself
    val bhj = p.linesIterator.count(_.contains("BroadcastHashJoin"))
    assert(bhj >= 2, p)
    assert(!p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoopJoin"), p)
  }

  test("q115: the vocabulary joins the token stream as broadcast") {
    val p = plan("q115_vocab_coverage")
    assert(p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoopJoin"), p)
  }

  test("q152: HLL registers aggregate partially before one exchange") {
    val p = plan("q152_hll_registers")
    val aggs = p.linesIterator.count(_.contains("HashAggregate"))
    assert(aggs >= 2, p) // partial max(rho) map-side, final after shuffle
    // FormattedMode prints each node in the tree AND as a detail
    // heading, so one physical Exchange == 2 matching lines
    assert(p.linesIterator.count(_.contains("Exchange")) <= 2, p)
  }

  test("q154: the LM vocab scalar enters as a broadcast, counts shuffle") {
    val p = plan("q154_bigram_lm_scores")
    assert(p.contains("BroadcastNestedLoopJoin") ||
      p.contains("BroadcastHashJoin"), p) // 1-row V crossJoin broadcast
    assert(!p.contains("CartesianProduct"), p)
  }

  test("q159: ROLLUP plans one Expand, not one pass per level") {
    val p = plan("q159_rollup_revenue")
    assert(p.linesIterator.count(_.contains("Expand")) == 2, p) // tree + detail = ONE node
  }
}
