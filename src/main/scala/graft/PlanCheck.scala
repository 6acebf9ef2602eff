package graft
/** Dev tool: assert the physical-plan properties the 100-TB design
  * depends on — pushdown, pruning, broadcast joins, map-side partial
  * aggregation, top-k without global sort, shuffle-free scan-stage text
  * ops. Prints OK/MISS per property; run after plan-affecting changes.
  * (Codegen spans aren't asserted: under AQE the pre-execution plan
  * string doesn't carry WholeStageCodegen annotations.)
  */
object PlanCheck {
  def main(a: Array[String]): Unit = {
    val spark = GraftSession.get()
    val d = "/root/testdata/sf0.01"
    def plan(name: String): String = {
      val df = SparkEntry.queries(name)(spark, d)
      df.queryExecution.explainString(org.apache.spark.sql.execution.FormattedMode)
    }
    var misses = 0
    // tree-level predicate: FormattedMode text can't distinguish a
    // data-sized global window from the tiny key-table prefix window the
    // two-level numbering pattern legitimately uses (both print
    // "SinglePartition"), so this walks the physical plan instead
    def checkTree(name: String, what: String,
        pred: org.apache.spark.sql.execution.SparkPlan => Boolean): Unit = {
      val ok = try pred(SparkEntry.queries(name)(spark, d).queryExecution.sparkPlan) catch {
        case e: Throwable => System.err.println(s"[plancheck] $name: $e"); false
      }
      if (!ok) misses += 1
      println(f"${if (ok) "OK  " else "MISS"} $name%-28s $what")
    }
    // every zero-key Window must sit above an Aggregate (i.e. over a
    // cardinality-REDUCED key table, never over fact-sized input)
    def noGlobalFactWindow(p: org.apache.spark.sql.execution.SparkPlan): Boolean =
      p.collect { case w: org.apache.spark.sql.execution.window.WindowExec
          if w.partitionSpec.isEmpty => w }
        .forall(_.child.exists {
          case _: org.apache.spark.sql.execution.aggregate.BaseAggregateExec => true
          case _ => false
        })
    def check(name: String, what: String, pred: String => Boolean): Unit = {
      // a renamed/missing query is a MISS, not a crash of the whole tool
      val ok = try pred(plan(name)) catch {
        case e: Throwable => System.err.println(s"[plancheck] $name: $e"); false
      }
      if (!ok) misses += 1
      println(f"${if (ok) "OK  " else "MISS"} $name%-28s $what")
    }

    check("q02_filter_pushdown", "filter pushed to parquet scan",
      p => p.contains("PushedFilters") && p.contains("GreaterThan(l_shipdate"))
    check("q01_scan_project", "column-pruned ReadSchema (3 of 16 cols)",
      p => p.contains("ReadSchema: struct<l_orderkey:bigint,l_linenumber:int,l_quantity:double>"))
    check("q12_join_left_broadcast", "BroadcastHashJoin, no fact shuffle",
      p => p.contains("BroadcastHashJoin") && !p.contains("SortMergeJoin"))
    check("q24_star_join", "all dims broadcast (no SortMergeJoin)",
      p => !p.contains("SortMergeJoin"))
    check("q10_group_agg", "map-side partial agg before the exchange",
      p => p.contains("partial_sum") && p.contains("hashpartitioning"))
    check("q16_topk", "top-k via TakeOrderedAndProject (no global sort)",
      p => p.contains("TakeOrderedAndProject"))
    check("q17_poc_analysis", "both joins broadcast",
      p => p.contains("BroadcastHashJoin") && !p.contains("SortMergeJoin"))
    check("q40_token_stats", "text scoring stays in scan stage (no Exchange)",
      p => !p.contains("Exchange"))
    check("q51_minhash_signatures", "signature pass has no shuffle",
      p => !p.contains("Exchange"))
    // pivot compiles to agg -> exchange -> pivot-agg -> exchange; the 2nd
    // exchange carries |groups| x |pivot values| rows (nothing at scale),
    // and the 1st is preceded by a map-side partial agg — that partial is
    // what we assert.
    check("q38_pivot", "pivot: map-side partial agg before the data-sized exchange",
      p => p.contains("partial_sum"))
    check("q76_dsv2_catalog_source", "DSv2 scan absorbed the name-search filter",
      p => p.contains("StringContains(strDrink"))
    check("q88_topk_per_key_agg", "bounded top-k combines map-side (partial before exchange)",
      p => p.contains("partial_topkagg"))
    check("q89_topk_native_agg", "native top-k also combines map-side",
      p => p.contains("partial_topk_agg") || p.contains("partial_topkagg") ||
        p.contains("partial_topknative"))
    check("q45_hash_sample", "hash-sample predicate stays scan-local (no Exchange)",
      p => !p.contains("Exchange"))
    check("q47_full_outer_join", "both sides pre-aggregate before the outer join",
      p => p.contains("partial_count"))
    check("q81_large_orders", "HAVING dim broadcasts into both re-joins (no SortMergeJoin)",
      p => p.contains("BroadcastHashJoin") && !p.contains("SortMergeJoin"))
    check("q61_ann_bruteforce", "query set broadcasts; corpus never shuffles for the scoring",
      p => p.contains("BroadcastNestedLoopJoin") && !p.contains("SortMergeJoin"))
    check("q66_ann_quantized", "quantized scoring also broadcast-driven, no sort-merge",
      p => p.contains("BroadcastNestedLoopJoin") && !p.contains("SortMergeJoin"))
    check("q64_ann_ivf", "IVF probes equi-join broadcast on c_id (no SortMergeJoin)",
      p => p.contains("BroadcastHashJoin") && !p.contains("SortMergeJoin"))
    check("q101_pricing_summary", "wide agg: filter pushed, partials before the one exchange",
      p => p.contains("LessThanOrEqual(l_shipdate") && p.contains("partial_sum"))
    check("q102_revenue_forecast", "all three scalar-agg predicates reach the scan",
      p => p.contains("GreaterThanOrEqual(l_shipdate") &&
        p.contains("GreaterThanOrEqual(l_discount") && p.contains("LessThan(l_quantity"))
    check("q103_volume_shipping", "both nation roles broadcast (2+ BHJ, no SMJ)",
      p => "BroadcastHashJoin".r.findAllMatchIn(p).size >= 2 && !p.contains("SortMergeJoin"))
    check("q106_returned_items", "top-20 via TakeOrderedAndProject (no global sort)",
      p => p.contains("TakeOrderedAndProject"))
    check("q108_customer_distribution", "both aggregation levels combine map-side",
      p => p.contains("partial_count"))
    // scan-count assertions: these two were rewritten from their SQL forms
    // (which scanned lineitem 3x / 2x) to single-pass shapes — pin that
    def scans(p: String, table: String): Int =
      s"$table\\.parquet".r.findAllMatchIn(p).size
    check("q114_waiting_orders", "ONE lineitem scan (per-order array eval), no cartesian",
      p => scans(p, "lineitem") == 1 && !p.contains("CartesianProduct") &&
        p.contains("TakeOrderedAndProject"))
    check("q116_min_cost_supplier", "single lineitem scan (supply computed once, window min)",
      p => scans(p, "lineitem") == 1 && p.contains("Window"))
    check("q99_portable_minhash_pairs", "portable LSH: no cartesian, equi-join on (band,digest)",
      p => !p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"))
    check("q100_portable_simhash", "portable simhash: no cartesian, equi-join on (blk,val)",
      p => !p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"))
    check("q58_cross_source_contamination",
      "linear grouped form: 2 doc scans, no hh×hh self-join blowup",
      p => scans(p, "documents") == 2 && p.contains("partial_count"))
    check("q169_dsir_importance", "integer micro-unit scoring: map-side partials, top-25 via TakeOrderedAndProject",
      p => p.contains("partial_count") && p.contains("TakeOrderedAndProject"))
    check("q171_gopher_rules", "rule ledger: one scan, map-side-combined rollup",
      p => scans(p, "documents") == 1 && p.contains("partial_count"))
    // text-level !SinglePartition would false-flag the LM's legitimate
    // 1-row scalar agg (n_total/vocab) — walk the tree instead: every
    // zero-key window must sit above an aggregate, i.e. the NTILE window
    // itself is lang-keyed
    checkTree("q172_ccnet_buckets", "NTILE window is lang-keyed, never fact-global",
      p => p.collect { case w: org.apache.spark.sql.execution.window.WindowExec => w }
        .forall(_.partitionSpec.nonEmpty))
    check("q173_tokenizer_fertility", "fertility apply is ONE corpus scan (artifact fold)",
      p => scans(p, "documents") == 1)
    check("q174_bpe_train_k",
      "k-round trainer: final plan reads k PINNED 1-row winners (no 2^k re-derivation)",
      p => scans(p, "documents") == 0 && p.contains("ExistingRDD") &&
        !p.contains("CartesianProduct"))
    check("q170_semantic_dedup",
      "IVF codebook broadcasts into assignment; pair stage c_id-keyed, no cartesian",
      p => p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"))
    check("q168_bpe_fold_apply",
      "k-merge apply is ONE corpus scan (merge table folded, never rescanned)",
      p => scans(p, "documents") == 1)
    check("q77_token_packing", "packing cumsum is a KEYED window (never SinglePartition)",
      p => p.contains("Window") && !p.contains("SinglePartition"))
    check("q78_scd2_islands", "islands: keyed windows only, no cartesian",
      p => p.contains("Window") && !p.contains("SinglePartition") &&
        !p.contains("CartesianProduct"))
    check("q79_data_quality", "multi-distinct profile: one scan through Expand",
      p => p.contains("Expand") && scans(p, "documents") == 1)
    // r16: q117 takes the parallelScan floor (its 0.6 s of per-doc HOF
    // CPU ran in ONE task on the single-split local layout), so the ONE
    // allowed exchange is the floor's explicit doc_id repartition —
    // which never fires on a production multi-file layout. Any REQUIRED
    // exchange (agg/join, ENSURE_REQUIREMENTS) still fails the check.
    check("q117_repetition_filter",
      "repetition stats stay in the scan stage (only the parallelScan floor's repartition, no required Exchange)",
      p => !p.contains("ENSURE_REQUIREMENTS"))
    check("q118_ngram_decontam", "eval grams broadcast; corpus grams never shuffle",
      p => p.contains("BroadcastHashJoin") && !p.contains("SortMergeJoin"))
    // the sketch pass sits behind a lazy localCheckpoint boundary, so its
    // partial-agg is asserted in MisraGriesAggSpec; here we pin pass 2:
    // candidates broadcast into a semi-join, never sort-merge
    check("q119_heavy_hitters", "exact pass: candidates broadcast semi-join (no SMJ)",
      p => p.contains("LeftSemi") && p.contains("BroadcastHashJoin") &&
        !p.contains("SortMergeJoin"))
    check("q120_mixture_sample", "derived rates broadcast back (no fact-side sort-merge)",
      p => p.contains("BroadcastHashJoin") && !p.contains("SortMergeJoin"))
    check("q121_dpp_join", "runtime month set prunes fact partitions (DPP subquery)",
      p => p.toLowerCase.contains("dynamicpruning"))
    // the month predicate must land in the scan's PartitionFilters line
    // (directory pruning on the stored layout), never as a data filter
    check("q29_partitioned_scan", "stored-layout read: month range prunes partitions (PartitionFilters)",
      p => p.linesIterator.exists(l =>
        l.contains("PartitionFilters") && l.contains("ship_month")))
    check("q122_tfidf_top_terms", "df frame broadcasts back into tf (no SortMergeJoin)",
      p => p.contains("BroadcastHashJoin") && !p.contains("SortMergeJoin"))
    check("q123_unigram_lm_score", "LM build/score: every agg combines map-side",
      p => p.contains("partial_count") || p.contains("partial_sum"))
    check("q124_bm25_retrieval", "top-20 via TakeOrderedAndProject; stats broadcast",
      p => p.contains("TakeOrderedAndProject") && !p.contains("SortMergeJoin"))
    check("q125_bloom_prefilter_join", "bloom tests run in the fact scan stage " +
      "(one-row broadcast; 2 orders scans — count + ONE candidate pass)",
      p => p.contains("BroadcastNestedLoopJoin") && !p.contains("SortMergeJoin") &&
        scans(p, "orders") == 2)
    check("q126_gapfill_forward", "gap-fill windows are keyed (never SinglePartition)",
      p => p.contains("Window") && !p.contains("SinglePartition"))
    check("q127_markov_transitions", "successor window keyed on user_id; agg partials",
      p => p.contains("Window") && !p.contains("SinglePartition") &&
        p.contains("partial_count"))
    check("q128_doc_chunks", "chunk explode stays in the scan stage (no Exchange)",
      p => !p.contains("Exchange"))
    check("q130_lexical_diversity", "diversity HOFs stay in the scan stage (no Exchange)",
      p => !p.contains("Exchange"))
    check("q131_pipeline_poc", "end-to-end poc: both dimension joins broadcast",
      p => p.contains("BroadcastHashJoin") && !p.contains("SortMergeJoin"))
    checkTree("q131_pipeline_poc", "no data-sized global window anywhere " +
      "(every 0-key Window sits above an Aggregate — fact-side saleIDs are keyed)",
      noGlobalFactWindow)
    checkTree("q140_budget_selection", "two-level prefix sum: 0-key windows only above aggregates",
      noGlobalFactWindow)
    check("q132_rate_anomaly", "trailing stats window keyed on event_type; partials",
      p => p.contains("Window") && !p.contains("SinglePartition") &&
        p.contains("partial_count"))
    check("q133_cohort_retention", "cohort-size frame broadcasts back (no SortMergeJoin)",
      p => p.contains("BroadcastHashJoin") && !p.contains("SortMergeJoin"))
    check("q134_corpus_manifest", "manifest agg combines map-side (xor/min/max partials)",
      p => p.contains("partial_count"))
    check("q135_referential_integrity", "integrity checks are anti-joins, never cartesian",
      p => p.contains("LeftAnti") && !p.contains("CartesianProduct"))
    check("q136_knn_label_propagation", "classify rides q61's broadcast scan; |Q|-row prediction side broadcast (never the corpus truth map)",
      p => p.contains("BroadcastNestedLoopJoin") && !p.contains("SortMergeJoin"))
    check("q137_rolling_active_users", "day list broadcasts into the range join (no SMJ)",
      p => p.contains("BroadcastNestedLoopJoin") && !p.contains("SortMergeJoin"))
    check("q138_scd2_pit_join", "PIT lookup is union+window, never a range join",
      p => p.contains("Window") && !p.contains("CartesianProduct") &&
        !p.contains("BroadcastNestedLoopJoin"))
    // the sanctioned join shape here is the broadcast-driven inequality
    // join of negative mining (BroadcastNestedLoopJoin, q61's accepted
    // shape). Since the scored-pairs artifact landed, q139's pair input
    // is a parquet scan — its plan normally contains NO SortMergeJoin
    // at all, so the tree assert below is a pure NEGATIVE guard: if any
    // SMJ ever appears here it must be the bucketed exchange-free kind
    // (vacuously true today; the banding join's POSITIVE shape proof
    // lives on q99 and q148, which run it live)
    check("q139_contrastive_triples", "negative mining broadcast-driven; never cartesian",
      p => !p.contains("CartesianProduct"))
    checkTree("q139_contrastive_triples", "negative guard: any SMJ that appears must be bucketed exchange-free",
      PlanAudit.allSmjBucketed)
    // the only SinglePartition window allowed is the ≤10001-row bucket
    // table; the doc-side cumsum must be keyed on bucket and the offsets
    // must come back via broadcast
    check("q140_budget_selection", "two-level prefix sum: doc window keyed, offsets broadcast",
      p => p.contains("Window") && p.contains("BroadcastHashJoin") &&
        !p.contains("SortMergeJoin"))
    check("q141_window_suite", "all ten window funcs share ONE keyed sort (single Window op)",
      p => p.contains("Window") && !p.contains("SinglePartition"))
    check("q142_string_suite", "string toolbox stays in the scan stage (no Exchange)",
      p => !p.contains("Exchange"))
    check("q143_datetime_suite", "datetime toolbox stays in the scan stage (no Exchange)",
      p => !p.contains("Exchange"))
    check("q144_conditional_agg", "conditional aggs combine map-side in one pass",
      p => p.contains("partial_count") && scans(p, "orders") == 1)
    check("q145_triangle_census", "wedge+close are equi-joins on ids, never cartesian",
      p => !p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"))
    check("q146_join_skew_profile", "profile: partial agg + bounded top-k, stats broadcast",
      p => p.contains("partial_count") && p.contains("TakeOrderedAndProject"))
    check("q148_incremental_dedup", "batch→index banding is an equi-join, never cartesian",
      p => !p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"))
    // the stored-index claim, mechanical: the banding join's index side
    // is a bucketed scan of the persisted (band, digest, idx_id) table —
    // pre-partitioned on the join keys, so NO Exchange below the join on
    // that side (the batch side shuffles into the bucket layout). The
    // join is audited on its own DataFrame for a clean predicate — in
    // q148's final plan it sits inside a BroadcastExchange build subtree.
    locally {
      val what = "index side of the banding join is the stored bucketed scan (no Exchange)"
      val ok = try {
        val p = graft.operators.DedupQueries.q148BandingJoin(spark, d)
          .queryExecution.sparkPlan
        PlanAudit.hasBucketedSmj(p)
      } catch {
        case e: Throwable => System.err.println(s"[plancheck] q148 banding: $e"); false
      }
      if (!ok) misses += 1
      println(f"${if (ok) "OK  " else "MISS"} ${"q148_incremental_dedup"}%-28s $what")
    }
    check("q153_near_dup_edit_verify", "second text fetch is a keyed shuffle join — text prefixes never ride a broadcast",
      p => p.contains("ShuffledHashJoin"))
    // the stored bandrows artifact: candidate generation is a SELF-join
    // of the bucketed (band, digest, doc_id) table — both sides carry
    // the bucket partitioning, so the banding join has NO Exchange on
    // EITHER side (corpus minhashed once per corpus, not per query)
    checkTree("q99_portable_minhash_pairs", "banding self-join of the stored bucketed bandrows — no Exchange on either side",
      p => p.collect {
        case j: org.apache.spark.sql.execution.joins.SortMergeJoinExec => j
      }.exists(j => Seq(j.left, j.right).forall(PlanAudit.bucketedExchangeFreeSide)))
    check("q149_embedding_outliers",
      "dims expansion combines map-side; stats broadcast back; d2 is the fused per-row kernel (no exploded re-sum exchange)",
      p => p.contains("partial_sum") && p.contains("BroadcastHashJoin") &&
        !p.contains("SortMergeJoin") && p.contains("vec_centroid_d2"))
    checkTree("q151_vocab_coverage",
      "vocab rank/cumsum: NO zero-key window (keyedPrefixRank — the vocab GROWS with the corpus; r13 verdict #4)",
      p => p.collect { case w: org.apache.spark.sql.execution.window.WindowExec
          if w.partitionSpec.isEmpty => w }.isEmpty)
    check("q156_bpe_pair_stats", "pair counts combine map-side; top-50 via TakeOrderedAndProject (no global sort)",
      p => p.contains("partial_count") && p.contains("TakeOrderedAndProject"))
    // q158 is ALSO the per-round plan proof for q160/q165/q174: since
    // the winner pin, their top-1 subtrees run inside localCheckpoint
    // materialization jobs the final plan no longer shows — q158's
    // un-pinned single round is the same top1()+rewrite code path, so a
    // regression inside the round (lost partial agg, cartesian rewrite)
    // fails HERE even though the pinned queries' checks can't see it
    check("q158_bpe_merge_round", "merge round: winning pair broadcast into the rewrite; counts combine map-side; bounded top-k",
      p => p.contains("partial_count") && p.contains("TakeOrderedAndProject") &&
        p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"))
    // r15 optimization: the training REPORT reads the stored
    // `bpe_merges` artifact's round ≤ 3 prefix (rounds 1..3 of the k=5
    // trainer ARE the 3-round chain) — q158 keeps the un-pinned single
    // round live and q174 the k-round trainer, so a read-back that
    // silently reverts to re-training three corpus passes per run
    // fails HERE (scans == 0 and the artifact table in the plan)
    check("q160_bpe_training_rounds", "merge list is a bpe_merges artifact read-back, no corpus re-train, no cartesian",
      p => p.contains("graft_bpe_merges") && scans(p, "documents") == 0 &&
        !p.contains("CartesianProduct"))
    // (the only SinglePartition is the 1-row n_sources scalar aggregate,
    // which sits above the distinct-source rollup — bounded by design)
    check("q161_source_salient_terms", "class TF-IDF: tf combines map-side; rank window keyed on source",
      p => p.contains("partial_count") && !p.contains("CartesianProduct"))
    checkTree("q161_source_salient_terms", "no data-sized global window (0-key windows only above aggregates)",
      noGlobalFactWindow)
    check("q162_curation_pipeline", "curation pipeline: manifest rollup combines map-side; quality filter scan-stage; no cartesian",
      p => p.contains("partial_count") && !p.contains("CartesianProduct"))
    check("q163_label_centroid_overlap", "centroid stats combine map-side; pair matrix is a dim-keyed equi-join, never cartesian",
      p => p.contains("partial_sum") && !p.contains("CartesianProduct") &&
        !p.contains("BroadcastNestedLoopJoin"))
    check("q164_dup_ngram_fraction", "gram counts read the STORED bucketed inventory (no per-query re-hash); no cartesian",
      p => p.contains("graft_gpos3") && !p.contains("CartesianProduct") &&
        !p.contains("BroadcastNestedLoopJoin"))
    check("q177_media_phash_neardup", "media near-dup: stored fingerprints; (blk,val) equi-join, never cartesian",
      p => p.contains("media_phash") && !p.contains("CartesianProduct") &&
        !p.contains("BroadcastNestedLoopJoin"))
    // the fingerprint scan hides behind Components' per-round
    // localCheckpoint (RDDScan) in the final plan — q148's lesson — so
    // the stored-scan claim is asserted on the pair DataFrame via q177's
    // check above; here only the join discipline of the closure
    check("q179_media_dedup_clusters", "media clusters: id-keyed joins only, never cartesian",
      p => !p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"))
    check("q176_pii_scrub", "fused scrub rides the scan: ONE doc scan, no Exchange",
      p => scans(p, "documents") == 1 && !p.contains("Exchange"))
    check("q183_classifier_score", "fused classifier rides the scan: ONE doc scan, no Exchange",
      p => scans(p, "documents") == 1 && !p.contains("Exchange"))
    check("q184_cms_error_profile",
      "CMS: map-side-combined token agg; probe joins broadcast; top-20 via TakeOrdered",
      p => p.contains("partial_count") && p.contains("TakeOrderedAndProject") &&
        p.contains("BroadcastHashJoin") && !p.contains("SortMergeJoin"))
    check("q189_pair_pagerank",
      "PageRank rounds: keyed contribution aggregates over the pinned edge list, no cartesian",
      p => p.contains("partial_sum") && !p.contains("CartesianProduct") &&
        !p.contains("BroadcastNestedLoopJoin"))
    check("q187_bigram_lm_score",
      "bigram LM: map-side-combined aggregates; vocab stat broadcast; no cartesian",
      p => p.contains("partial_count") && p.contains("BroadcastExchange") &&
        !p.contains("CartesianProduct"))
    check("q188_source_divergence",
      "JS matrix: term joins keyed on (source, tok); only the dim-sized pair cross is unkeyed",
      p => p.contains("partial_count") && !p.contains("SortMergeJoin"))
    checkTree("q186_stratified_kfold", "fold dealing is stratum-keyed, never fact-global",
      p => {
        val ws = p.collect { case w: org.apache.spark.sql.execution.window.WindowExec => w }
        ws.nonEmpty && ws.forall(_.partitionSpec.nonEmpty)
      })
    checkTree("q185_winnowing_fingerprints", "winnowing windows are doc-keyed, never fact-global",
      p => {
        val ws = p.collect { case w: org.apache.spark.sql.execution.window.WindowExec => w }
        ws.nonEmpty && ws.forall(_.partitionSpec.nonEmpty)
      })
    check("q185_winnowing_fingerprints",
      "fingerprints read the STORED gram inventory; pair join gh-keyed, no cartesian",
      p => p.contains("graft_gpos5") && !p.contains("CartesianProduct") &&
        !p.contains("BroadcastNestedLoopJoin"))
    checkTree("q182_prototype_selection", "prototype ranking window is cluster-keyed, never fact-global",
      p => {
        val ws = p.collect { case w: org.apache.spark.sql.execution.window.WindowExec => w }
        ws.nonEmpty && ws.forall(_.partitionSpec.nonEmpty)
      })
    check("q182_prototype_selection", "codebook broadcasts into assignment; no cartesian",
      p => p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"))
    checkTree("q181_quality_canonical", "keeper window is cluster-keyed, never fact-global",
      p => {
        val ws = p.collect { case w: org.apache.spark.sql.execution.window.WindowExec => w }
        // nonEmpty: an empty collect would pass vacuously and stop
        // guarding the moment the keeper shape is rewritten
        ws.nonEmpty && ws.forall(_.partitionSpec.nonEmpty)
      })
    check("q181_quality_canonical", "quality keeper: id-keyed joins only, never cartesian",
      p => !p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"))
    check("q180_incremental_span_overlap", "span gate: both gram sides read the stored inventory; no cartesian",
      p => p.contains("graft_gpos5") && !p.contains("CartesianProduct") &&
        !p.contains("BroadcastNestedLoopJoin"))
    check("q178_span_removal", "removal pass reads the stored gram inventory; no cartesian",
      p => p.contains("graft_gpos5") && !p.contains("CartesianProduct") &&
        !p.contains("BroadcastNestedLoopJoin"))
    check("q175_repeated_spans", "span pass reads the stored gram inventory; no cartesian",
      p => p.contains("graft_gpos5") && !p.contains("CartesianProduct") &&
        !p.contains("BroadcastNestedLoopJoin"))
    // the island window must be doc-keyed, and the island + per-doc aggs
    // must REUSE its hashpartitioning(doc_id) — exactly one exchange at
    // and above the window (the subset-satisfied ClusteredDistribution
    // claim in the q175 scaladoc, made mechanical)
    checkTree("q175_repeated_spans", "island window doc-keyed; both aggs above it reuse its partitioning",
      p => {
        val ws = p.collect { case w: org.apache.spark.sql.execution.window.WindowExec => w }
        // (a) every window is keyed; (b) no shuffle sits ABOVE a window —
        // i.e. the island agg and the per-doc agg consume the window's
        // hashpartitioning(doc_id) directly, adding no exchange
        ws.nonEmpty && ws.forall(_.partitionSpec.nonEmpty) && !p.exists {
          case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec =>
            e.exists { case _: org.apache.spark.sql.execution.window.WindowExec => true
                       case _ => false }
          case _ => false
        }
      })
    // q190: the reconciliation claim — text is digested BEFORE the
    // full-outer join, so no Exchange block's input ever carries the
    // text column (asserted on the formatted blocks: sparkPlan predates
    // EnsureRequirements, so the exchanges only exist in the string)
    check("q190_snapshot_diff", "diff shuffles carry digests, never the text column",
      p => {
        val blocks = p.split("\n\n").filter(_.contains(") Exchange"))
        blocks.nonEmpty && !blocks.exists(_.contains("text#"))
      })
    // the scored-pairs artifact scan hides behind its localCheckpoint
    // (ExistingRDD) in the final plan — q148/q179's lesson; the stored-
    // scan shape itself is asserted by the ArtifactStore specs
    check("q191_lsh_calibration",
      "calibration rides the pinned scored pairs; gram recompute candidate-only; no cartesian",
      p => p.contains("ExistingRDD") && !p.contains("CartesianProduct") &&
        !p.contains("BroadcastNestedLoopJoin"))
    checkTree("q191_lsh_calibration", "cumulative window runs over the aggregate-reduced table, never fact input",
      noGlobalFactWindow)
    check("q192_embedding_dim_stats",
      "dim stats: ONE embeddings scan, explode collapsed by map-side partial agg",
      p => p.contains("partial_count") && scans(p, "embeddings") == 1 &&
        !p.contains("CartesianProduct"))
    // the gpos5 scan also hides behind the distinct's localCheckpoint
    checkTree("q196_quality_percentile", "percentile windows are source-keyed, never fact-global",
      p => {
        val ws = p.collect { case w: org.apache.spark.sql.execution.window.WindowExec => w }
        ws.nonEmpty && ws.forall(_.partitionSpec.nonEmpty)
      })
    check("q197_power_iteration",
      "direction reads the STORED pow_dir artifact (rounds run once per corpus)",
      p => p.contains("graft_pow_dir") && !p.contains("CartesianProduct"))
    check("q198_semantic_decontam",
      "decontam: IVF codebook broadcasts into assignment; eval x pool pairs c_id-keyed, no cartesian",
      p => p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"))
    check("q199_shard_dealing", "dealing rank is a source-KEYED window (never SinglePartition)",
      p => p.contains("Window") && !p.contains("SinglePartition"))
    check("q200_langid_confusion",
      "confusion cells combine map-side; labeled-lang totals broadcast back",
      p => p.contains("partial_count") && p.contains("BroadcastHashJoin") &&
        !p.contains("CartesianProduct"))
    check("q201_vocab_growth",
      "vocab growth: ONE documents scan; (source, tok) counts combine map-side",
      p => p.contains("partial_count") && scans(p, "documents") == 1)
    check("q202_cdc_chunks",
      "CDC rollup rides the STORED bucketed chunk inventory; fp rollup combines map-side",
      p => p.contains("graft_cdcocc") && p.contains("partial_count") &&
        scans(p, "documents") == 0)
    check("q209_incremental_chunk_overlap",
      "chunk gate: both sides read the bucketed inventory; per-doc rollups doc-keyed, no cartesian",
      p => p.contains("graft_cdcocc") && !p.contains("CartesianProduct") &&
        scans(p, "documents") == 0)
    check("q203_pmi_collocations",
      "PMI: bigram counts combine map-side; top-25 via TakeOrderedAndProject (no global sort)",
      p => p.contains("partial_count") && p.contains("TakeOrderedAndProject"))
    check("q204_whitening_residuals",
      "whitening apply: stored direction rides a 1-row broadcast; only the 64-key dim rollup shuffles",
      p => p.contains("graft_pow_dir") && p.contains("partial_count") &&
        !p.contains("CartesianProduct"))
    checkTree("q205_weighted_sample", "A-ES reservoir rank is source-keyed, never fact-global",
      p => {
        val ws = p.collect { case w: org.apache.spark.sql.execution.window.WindowExec => w }
        ws.nonEmpty && ws.forall(_.partitionSpec.nonEmpty)
      })
    check("q206_rendezvous_sharding",
      "HRW: per-doc scan-stage arithmetic only — no exchange, no window, no join",
      p => !p.contains("Exchange") && !p.contains("Window") &&
        scans(p, "documents") == 1)
    check("q208_fold_leakage",
      "leak audit rides the STORED scored-pairs artifact; fold joins doc_id-keyed, no cartesian",
      p => p.contains("graft_scored_pairs") && !p.contains("CartesianProduct") &&
        !p.contains("BroadcastNestedLoopJoin"))
    checkTree("q207_robust_length_outliers",
      "median/MAD rank windows are source-keyed, never fact-global",
      p => {
        val ws = p.collect { case w: org.apache.spark.sql.execution.window.WindowExec => w }
        ws.nonEmpty && ws.forall(_.partitionSpec.nonEmpty)
      })
    check("q210_padding_waste",
      "padding audit: ONE documents scan, map-side-combined source rollup",
      p => p.contains("partial_count") && scans(p, "documents") == 1)
    check("q211_pq_code_usage",
      "code usage: stored codebook broadcasts into encode; (j, code)-keyed 128-group rollup",
      p => p.contains("graft_cent_pq") && p.contains("partial_count") &&
        !p.contains("CartesianProduct"))
    checkTree("q212_seasonal_anomaly",
      "weekday-median rank window is (type, weekday)-keyed, never fact-global",
      p => {
        val ws = p.collect { case w: org.apache.spark.sql.execution.window.WindowExec => w }
        ws.nonEmpty && ws.forall(_.partitionSpec.nonEmpty)
      })
    // r15 optimization: the histogram reads the stored dedup_clusters
    // labels (q56 keeps the CC fixpoint live as the declared closure
    // this artifact is verified against) — a silent revert to a live
    // fixpoint re-pays the CC rounds per run and fails here
    check("q213_cluster_size_histogram",
      "histogram is a dedup_clusters artifact read-back (q56 keeps the closure live); no cartesian",
      p => p.contains("graft_dedup_clusters") && !p.contains("CartesianProduct") &&
        scans(p, "documents") == 0)
    check("q214_budget_apportionment",
      "apportionment: map-side source counts; rank window rides the |sources|-row aggregate",
      p => p.contains("partial_count") && !p.contains("CartesianProduct"))
    checkTree("q214_budget_apportionment",
      "the global remainder-rank window sits above the aggregate, never fact input",
      noGlobalFactWindow)
    check("q215_crossmodal_gate",
      "cross-modal join carries verdicts (id, small ints) — text and vectors reduced before the exchange",
      p => !p.contains("CartesianProduct") && scans(p, "documents") == 1 &&
        scans(p, "embeddings") == 2) // the q149 chain reads embeddings twice (stats + d2)
    check("q195_lsh_recall_audit",
      "recall audit rides the pinned gram sets + the stored admitted pairs; no cartesian",
      p => p.contains("ExistingRDD") && !p.contains("CartesianProduct") &&
        !p.contains("BroadcastNestedLoopJoin"))
    check("q216_admission_recall_audit",
      "incremental-direction recall audit: same pinned-artifact shape as q195",
      p => p.contains("ExistingRDD") && !p.contains("CartesianProduct") &&
        !p.contains("BroadcastNestedLoopJoin"))
    check("q217_span_gate_audit",
      "span-gate audit: both gram inventories read from stored catalog artifacts; no cartesian",
      p => p.contains("graft_gpos3_") && p.contains("graft_gpos5_") &&
        !p.contains("CartesianProduct"))
    check("q218_gopher_rules",
      "rule battery is pure scan-stage row work (no Exchange anywhere)",
      p => !p.contains("Exchange"))
    check("q219_bigram_repetition",
      "bigram repetition: map-side partial agg; doc window reuses the doc_id partitioning",
      p => p.contains("partial_count") && p.contains("hashpartitioning"))
    check("q220_source_entropy",
      "entropy: vocab-bounded map-side-combined aggregates, text never shuffles",
      p => p.contains("partial_count") && p.contains("hashpartitioning"))
    check("q221_bootstrap_quality_ci",
      "bootstrap: replicate rollups combine map-side; no cartesian",
      p => p.contains("partial_sum") && !p.contains("CartesianProduct"))
    // q222's per-round argmaxes run EAGERLY at frame-build time (1-row
    // localCheckpoint pins, q174's lesson) — each intermediate pick plan
    // rides TakeOrderedAndProject, but the FINAL plan only shows the
    // pinned picks (ExistingRDD) plus the radius pass's broadcast.
    check("q222_kcenter_coreset",
      "coreset: picks pinned (ExistingRDD); radius pass against 1-row broadcast centers",
      p => p.contains("ExistingRDD") && p.contains("BroadcastExchange") &&
        !p.contains("CartesianProduct"))
    check("q223_filter_calibration",
      "calibration: vocab-bounded LM chain, scan-stage quality, doc-keyed join; no cartesian",
      p => p.contains("partial_count") && !p.contains("CartesianProduct"))
    check("q226_sq8_error_profile",
      "sq8 audit: posexplode collapsed map-side into the 64-group aggregate (q192's shape)",
      p => p.contains("partial_sum") && p.contains("hashpartitioning"))
    check("q228_hard_negatives",
      "hard negatives: centroids broadcast; the pair stage is cluster-KEYED, never cartesian",
      p => p.contains("BroadcastExchange") && !p.contains("CartesianProduct"))
    check("q229_audio_landmark_dedup",
      "audio landmarks: scan-stage signal work; pair join landmark-keyed, no cartesian",
      p => p.contains("partial_count") && !p.contains("CartesianProduct") &&
        !p.contains("BroadcastNestedLoopJoin"))
    check("q224_portable_hll",
      "HLL: vocab distinct + 128-row-per-source rollup combine map-side; grids/tables broadcast; no cartesian",
      p => p.contains("partial_max") && p.contains("BroadcastExchange") &&
        scans(p, "documents") == 1 && !p.contains("CartesianProduct"))
    check("q225_length_bucket_waste",
      "length buckets: scan-stage pow2 bit-smear; ONE map-side-combined (source,bucket) rollup",
      p => p.contains("partial_count") && scans(p, "documents") == 1 &&
        !p.contains("CartesianProduct"))
    check("q227_label_scatter",
      "label scatter: (label,dim) partials combine map-side; label rollup broadcast; one embeddings scan per side",
      p => p.contains("partial_sum") && p.contains("BroadcastExchange") &&
        !p.contains("CartesianProduct"))
    check("q230_benford_audit",
      "benford: scan-stage digit ladder; map-side-combined (type,digit) counts; 9-row constants broadcast",
      p => p.contains("partial_count") && p.contains("BroadcastExchange") &&
        !p.contains("CartesianProduct"))
    check("q231_cluster_salient_terms",
      "cluster terms: labels read from the stored dedup_clusters artifact; tf/df rollups map-side; per-cluster keyed window",
      p => p.contains("graft_dedup_clusters_") && p.contains("partial_count") &&
        p.contains("hashpartitioning") && !p.contains("CartesianProduct"))
    check("q232_hubness_histogram",
      "hubness: reads the stored nn1 relation; bounded degree rollups; no cartesian",
      p => p.contains("graft_nn1_") && !p.contains("CartesianProduct"))
    check("q233_sampled_percentile_error",
      "sampled percentile: two event_type-keyed rank windows; no global window, no cartesian",
      p => p.contains("hashpartitioning") && !p.contains("CartesianProduct"))
    check("q234_interarrival_histogram",
      "interarrival: user-keyed lag window; (type,bucket) counts map-side; totals broadcast",
      p => p.contains("partial_count") && p.contains("hashpartitioning") &&
        p.contains("BroadcastExchange") && !p.contains("CartesianProduct"))
    check("q235_clip_calibration",
      "clip bounds: (dim,value) counts map-side FIRST, rank scan on the compressed table; 64-row bounds broadcast",
      p => p.contains("partial_count") && p.contains("BroadcastExchange") &&
        !p.contains("CartesianProduct"))
    check("q236_vocab_overlap",
      "vocab overlap: token-keyed vocab self-join (never documents); |sources|-row grid broadcast",
      p => p.contains("partial_count") && p.contains("BroadcastExchange") &&
        !p.contains("CartesianProduct"))
    check("q237_source_embedding_drift",
      "source drift: ONE corpus pass into the pinned moment table (ExistingRDD); all rollups downstream of it",
      p => p.contains("ExistingRDD") && p.contains("BroadcastExchange") &&
        !p.contains("CartesianProduct") &&
        scans(p, "documents") == 0)
    check("q238_threshold_sweep",
      "threshold sweep: bounded histograms off the stored scored_pairs; no corpus scan at all",
      p => p.contains("graft_scored_pairs_") && scans(p, "documents") == 0 &&
        !p.contains("CartesianProduct"))
    check("q239_vocab_novelty",
      "vocab novelty: two vocab-sized distinct aggs + token-keyed anti joins; text never shuffles",
      p => p.contains("partial_count") && !p.contains("CartesianProduct") &&
        p.contains("LeftAnti"))
    check("q240_knn_label_agreement",
      "1-NN probe: reads the stored nn1 relation; id-keyed label joins; bounded rollups; no cartesian",
      p => p.contains("graft_nn1_") && !p.contains("CartesianProduct"))
    check("q241_modal_coverage",
      "modal coverage: one id-keyed full-outer of id/source projections; |sources|-row rollup",
      p => p.contains("FullOuter") && p.contains("partial_sum") &&
        !p.contains("CartesianProduct"))
    check("q242_conversion_latency",
      "conversion latency: user-keyed MIN aggs + user-keyed join; no windows; bucket rollup map-side",
      p => p.contains("partial_min") && p.contains("partial_count") &&
        !p.contains("CartesianProduct"))
    check("q243_token_yield",
      "token yield: ONE corpus scan joined to the stored dedup_clusters labels; source rollup map-side",
      p => p.contains("graft_dedup_clusters_") && p.contains("partial_count") &&
        scans(p, "documents") == 1 && !p.contains("CartesianProduct"))
    check("q244_table_stats",
      "ANALYZE stats: portable-HLL NDV (NO Expand), all-long (col,bucket) rollup combines map-side; wide scan + narrow 2-col string pass",
      p => scans(p, "lineitem") == 2 && !p.contains("Expand") &&
        p.contains("partial_max") && !p.contains("CartesianProduct"))
    // the fact-sized rollup must stay hash-based: any SortAggregate in
    // q244's plan may only be the no-grouping 1-row string-stats tail
    // (empty grouping => no sort), never the grouped (col,bucket) agg
    checkTree("q244_table_stats",
      "every SortAggregate has empty grouping (fact rollup stays HashAggregate)",
      p => p.collect {
        case sa: org.apache.spark.sql.execution.aggregate.SortAggregateExec => sa
      }.forall(_.groupingExpressions.isEmpty))
    check("q253_join_strategy_audit",
      "strategy audit: five 1-row stat aggregates (map-side partials), no cartesian, no data-sized join",
      p => p.contains("partial_count") && !p.contains("CartesianProduct") &&
        !p.contains("SortMergeJoin"))
    check("q254_chunk_overlap_cost",
      "chunking audit: closed-form per-doc math (NO Generate/explode), ONE corpus scan, source rollup map-side",
      p => scans(p, "documents") == 1 && !p.contains("Generate") &&
        p.contains("partial_count") && !p.contains("CartesianProduct"))
    // the only BNLJ is the 1-row × 1-row aggregate cross at the tail —
    // wedge + closure joins themselves are BroadcastHashJoins on keys
    check("q255_pair_transitivity",
      "transitivity: wedge + closure joins KEYED over the stored pairs artifact, no cartesian",
      p => p.contains("graft_scored_pairs_") && p.contains("BroadcastHashJoin") &&
        !p.contains("CartesianProduct"))
    // the <=261-word filter is materialized once (localCheckpoint ->
    // ExistingRDD) and BROADCAST to the probe side — the probe scan
    // itself never shuffles, which is the point of runtime filters
    check("q256_bloom_runtime_filter",
      "bloom audit: materialized word table (ExistingRDD) broadcast to probes; probe side never sort-merges",
      p => p.contains("ExistingRDD") && p.contains("BroadcastExchange") &&
        !p.contains("CartesianProduct") && !p.contains("SortMergeJoin"))
    check("q257_mixture_epochs",
      "mixture epochs: two map-side source rollups; windows only over the |sources|-row aggregate",
      p => p.contains("partial_count") && !p.contains("CartesianProduct") &&
        !p.contains("SortMergeJoin"))
    checkTree("q257_mixture_epochs",
      "the ranking window sits above an Aggregate (never fact-sized)",
      noGlobalFactWindow)
    check("q258_sample_ks_audit",
      "KS audit: ONE scan, cumsum windows over the (source, n_tok) ROLLUP, source-keyed max",
      p => scans(p, "documents") == 1 && p.contains("partial_count") &&
        !p.contains("CartesianProduct"))
    check("q259_dataset_card",
      "dataset card: ONE corpus scan (ExistingRDD reuse) + label join; both rollups map-side; top-lang window source-keyed",
      p => p.contains("ExistingRDD") && p.contains("partial_count") &&
        !p.contains("CartesianProduct"))
    check("q260_stats_merge_audit",
      "sketch merge: (shard,bucket) rollup materialized once (ExistingRDD); estimator legs ride the tiny table; honest monolithic re-scan",
      p => p.contains("ExistingRDD") && scans(p, "lineitem") == 1 &&
        p.contains("partial_max") && !p.contains("CartesianProduct"))
    check("q261_l_diversity",
      "l-diversity: QI-keyed two-level agg (distinct users per GROUP, never global); type rollup map-side",
      p => p.contains("partial_count") && !p.contains("CartesianProduct") &&
        !p.contains("Window"))
    check("q262_skew_remediation_plan",
      "skew plan: one map-side key rollup + 1-row total broadcast; no window, no cartesian-shaped join",
      p => p.contains("partial_count") && !p.contains("Window") &&
        !p.contains("CartesianProduct") && !p.contains("SortMergeJoin"))
    check("q280_aqe_skew_audit",
      "AQE skew audit: two map-side key rollups into 1-row stats; no window, no join at all",
      p => p.contains("partial_count") && !p.contains("Window") &&
        !p.contains("Join"))
    checkTree("q296_token_decile_table",
      "decile table: cumsum windows are source-keyed over the value-count rollup",
      p => {
        val ws = p.collect { case w: org.apache.spark.sql.execution.window.WindowExec => w }
        ws.nonEmpty && ws.forall(_.partitionSpec.nonEmpty)
      })
    check("q296_token_decile_table",
      "decile table: map-side rollup, 9-row axis broadcast, one scan",
      p => p.contains("partial_count") && scans(p, "documents") == 1 &&
        p.contains("BroadcastExchange"))
    checkTree("q297_transition_dwell",
      "dwell: lag window user-keyed; cumsums pair-keyed over the rollup",
      p => {
        val ws = p.collect { case w: org.apache.spark.sql.execution.window.WindowExec => w }
        ws.nonEmpty && ws.forall(_.partitionSpec.nonEmpty)
      })
    check("q297_transition_dwell",
      "dwell: one events scan, map-side (pair, gap) rollup, no join",
      p => p.contains("partial_count") && scans(p, "events") == 1 &&
        !p.contains("Join"))
    checkTree("q293_length_distribution_drift",
      "KS drift: cumsum windows are source-keyed over the (source, len) rollup",
      p => {
        val ws = p.collect { case w: org.apache.spark.sql.execution.window.WindowExec => w }
        ws.nonEmpty && ws.forall(_.partitionSpec.nonEmpty)
      })
    check("q293_length_distribution_drift",
      "KS drift: map-side value-count rollup, no join at all",
      p => p.contains("partial_sum") && !p.contains("Join"))
    check("q294_embedding_freshness",
      "freshness: digest-compare full-outer (never text) + vec-keyed left join; no cartesian",
      p => p.contains("SortMergeJoin FullOuter") && !p.contains("CartesianProduct"))
    check("q295_inbatch_negative_risk",
      "negative risk: one stored-pair aggregate + 1-row doc count x 3-row grid; no corpus-sized join",
      p => !p.contains("CartesianProduct") && !p.contains("SortMergeJoin"))
    check("q289_partition_balance_audit",
      "partition-balance audit: map-side (candidate, partition) rollups (<=4x32 groups survive the partial); no join",
      p => p.contains("partial_count") && !p.contains("Join"))
    checkTree("q290_zipf_fit",
      "zipf rank window is source-keyed over the vocab rollup",
      p => {
        val ws = p.collect { case w: org.apache.spark.sql.execution.window.WindowExec => w }
        ws.nonEmpty && ws.forall(_.partitionSpec.nonEmpty)
      })
    check("q290_zipf_fit",
      "zipf fit: vocab-sized map-side rollup; normal equations are one |sources|-row agg",
      p => p.contains("partial_count") && scans(p, "documents") == 1)
    check("q291_gram_novelty_curve",
      "novelty curve: ONE gram explode into the materialized (decile, gram) rollup (ExistingRDD); both legs reuse it, text scanned once",
      p => p.contains("ExistingRDD") && p.contains("partial_count") &&
        scans(p, "documents") <= 1 && !p.contains("CartesianProduct"))
    check("q292_ranker_agreement",
      "ranker agreement: both legs TakeOrdered to 50 (ExistingRDD reuse); pair arithmetic on bounded lists",
      p => p.contains("ExistingRDD") && !p.contains("SortMergeJoin"))
    check("q281_dim_truncation_recall",
      "truncation sweep: ONE broadcast-driven corpus pass (the 4 widths explode scan-side), no sort-merge",
      p => p.contains("BroadcastNestedLoopJoin") && !p.contains("SortMergeJoin") &&
        scans(p, "embeddings") <= 2)
    checkTree("q281_dim_truncation_recall",
      "rank windows are (dims, q_id)-keyed, never global",
      p => {
        val ws = p.collect { case w: org.apache.spark.sql.execution.window.WindowExec => w }
        ws.nonEmpty && ws.forall(_.partitionSpec.nonEmpty)
      })
    check("q282_curriculum_mixture",
      "curriculum deciles: bounded (score, source) rollup materialized once (ExistingRDD); all four legs reuse it, corpus scanned once",
      p => p.contains("ExistingRDD") && scans(p, "documents") == 0 &&
        !p.contains("CartesianProduct"))
    checkTree("q283_clustering_factor",
      "layout audit: lag windows are zone-keyed, never a global order-by",
      p => {
        val ws = p.collect { case w: org.apache.spark.sql.execution.window.WindowExec => w }
        ws.nonEmpty && ws.forall(_.partitionSpec.nonEmpty)
      })
    check("q284_ab_required_n",
      "power analysis: one map-side user rollup; grid and stats broadcast",
      p => p.contains("partial_count") && p.contains("BroadcastExchange") &&
        scans(p, "events") == 1)
    check("q285_event_trigrams",
      "trigrams: ONE user-keyed window (both lags share it) into a map-side rollup",
      p => p.contains("partial_count") && scans(p, "events") == 1 &&
        !p.contains("CartesianProduct"))
    checkTree("q285_event_trigrams",
      "the double-lag window is user-keyed",
      p => {
        val ws = p.collect { case w: org.apache.spark.sql.execution.window.WindowExec => w }
        ws.size == 1 && ws.forall(_.partitionSpec.nonEmpty)
      })
    checkTree("q286_spearman_quality_length",
      "both rank windows are source-keyed (per-shard sort, never global)",
      p => {
        val ws = p.collect { case w: org.apache.spark.sql.execution.window.WindowExec => w }
        ws.nonEmpty && ws.forall(_.partitionSpec.nonEmpty)
      })
    check("q287_pii_cooccurrence",
      "PII detection rides the scan; one 1-row stats agg against the 3-row type axis",
      p => scans(p, "documents") == 1 && !p.contains("SortMergeJoin"))
    check("q288_idf_drift",
      "IDF drift: two vocab-sized df rollups (map-side), top-15 via TakeOrdered",
      p => p.contains("partial_count") && p.contains("TakeOrderedAndProject"))
    check("q263_lsh_parameter_advisor",
      "LSH advisor: six constant legs over the materialized 13-row n_match histogram (ExistingRDD); no corpus scan",
      p => p.contains("ExistingRDD") && scans(p, "documents") == 0 &&
        !p.contains("CartesianProduct"))
    check("q264_event_transitions",
      "transitions: user-keyed lag window + map-side (prev,next) rollup; totals broadcast",
      p => p.contains("partial_count") && p.contains("BroadcastExchange") &&
        !p.contains("CartesianProduct"))
    checkTree("q265_rfm_features",
      "RFM: NO zero-key window anywhere (each NTILE reconstructed from keyedPrefixRank's keyed global row index — r13 verdict #4)",
      p => p.collect { case w: org.apache.spark.sql.execution.window.WindowExec
          if w.partitionSpec.isEmpty => w }.isEmpty)
    check("q265_rfm_features",
      "RFM: user rollup pinned once (ExistingRDD) feeds all three rank passes",
      p => p.contains("ExistingRDD") && !p.contains("CartesianProduct"))
    check("q266_classifier_auc",
      "AUC: ONE fused corpus scan (score + rules row-local); cumsums over the (source,score) ROLLUP",
      p => scans(p, "documents") == 1 && p.contains("partial_count") &&
        !p.contains("CartesianProduct"))
    checkTree("q266_classifier_auc",
      "AUC windows sit above an Aggregate, never the fact scan",
      noGlobalFactWindow)
    check("q267_attribution",
      "attribution: USER-keyed window (never global), map-side channel rollups, 1-row total broadcast",
      p => p.contains("partial_count") && p.contains("BroadcastExchange") &&
        !p.contains("CartesianProduct"))
    checkTree("q267_attribution",
      "attribution window is user-keyed (no empty partitionSpec over the fact)",
      noGlobalFactWindow)
    check("q268_ab_test",
      "A/B: user rollup map-side combined; 2-row arm table; no window, no cartesian-shaped join",
      p => p.contains("partial_max") && !p.contains("Window") &&
        !p.contains("CartesianProduct") && !p.contains("SortMergeJoin"))
    check("q269_token_gini",
      "gini: map-side (source,token) rollup; rank window over the vocab-sized ROLLUP only",
      p => p.contains("partial_count") && !p.contains("CartesianProduct") &&
        !p.contains("SortMergeJoin"))
    checkTree("q269_token_gini",
      "gini rank window sits above the vocab Aggregate, never the corpus scan",
      noGlobalFactWindow)
    check("q270_hybrid_rrf_fusion",
      "RRF: both legs cut by TakeOrderedAndProject BEFORE the 50-row rank windows; query vector broadcast",
      p => p.contains("TakeOrderedAndProject") && p.contains("BroadcastExchange") &&
        !p.contains("CartesianProduct"))
    check("q271_randomized_response",
      "randomized response: coins row-local, k-row type table broadcast for the draw, map-side rollups",
      p => p.contains("partial_count") && p.contains("BroadcastExchange") &&
        !p.contains("CartesianProduct") && !p.contains("SortMergeJoin"))
    check("q272_chi2_independence",
      "chi2: (type,dow) rollup map-side; marginals broadcast back; no window anywhere",
      p => p.contains("partial_count") && !p.contains("Window") &&
        !p.contains("CartesianProduct") && !p.contains("SortMergeJoin"))
    check("q273_ab_peeking_audit",
      "peeking audit: one user rollup; cumsums over the |days|-bounded axis; day-keyed counts broadcast",
      p => p.contains("partial_min") && p.contains("BroadcastExchange") &&
        !p.contains("SortMergeJoin"))
    checkTree("q273_ab_peeking_audit",
      "peeking cumsum windows are arm-keyed over the day axis, never the fact",
      noGlobalFactWindow)
    check("q274_prefix_filter_pairs",
      "prefix filter: reads the STORED prefix_pairs artifact (build-once, gram-keyed self-join at ingest)",
      p => p.contains("graft_prefix_pairs_") && !p.contains("CartesianProduct"))
    check("q275_candidate_family_overlap",
      "family overlap: BOTH pair sets read from stored artifacts; pair-keyed full-outer merge; no cartesian",
      p => p.contains("graft_scored_pairs_") && p.contains("graft_prefix_pairs_") &&
        !p.contains("CartesianProduct"))
    check("q279_classifier_lift",
      "lift table: bounded cumulative table materialized once (ExistingRDD); decile legs never rescan the corpus",
      p => p.contains("ExistingRDD") && scans(p, "documents") == 0 &&
        !p.contains("CartesianProduct"))
    check("q278_seqlen_frontier",
      "seqlen frontier: ONE length pass (ExistingRDD reuse) feeds all four cap legs; no window, no cartesian",
      p => p.contains("ExistingRDD") && scans(p, "documents") == 0 &&
        !p.contains("CartesianProduct") && !p.contains("Window"))
    check("q277_incremental_prefix_admission",
      "incremental prefix admission: STORED decision artifact read back (index probe paid once at ingest)",
      p => p.contains("graft_prefix_admission_") && !p.contains("CartesianProduct"))
    check("q276_ivf_cell_balance",
      "cell balance: STORED codebook read back + broadcast, vec-keyed max assignment, K-row rollup",
      p => p.contains("graft_cent_ivf") && p.contains("BroadcastExchange") &&
        !p.contains("CartesianProduct"))
    check("q245_zorder_pruning",
      "zorder audit: analytic file ids (no global sort/row_number), 1-row stats broadcast",
      p => p.contains("BroadcastExchange") && p.contains("partial_min") &&
        !p.contains("Window") && !p.contains("CartesianProduct"))
    check("q246_kcore",
      "k-core: peel rounds ride the checkpointed edge set (ExistingRDD), no cartesian",
      p => p.contains("ExistingRDD") && !p.contains("CartesianProduct"))
    check("q304_cc_incremental",
      "incremental CC: labels read the re-converged checkpointed forest (ExistingRDD), no closure, no cartesian",
      p => p.contains("ExistingRDD") && !p.contains("CartesianProduct") &&
        !p.contains("BroadcastNestedLoopJoin"))
    checkTree("q305_last_touch_attribution",
      "attribution window is user-keyed, never a global fact window",
      noGlobalFactWindow)
    check("q306_dedup_drop_bias",
      "drop-bias: STORED closure labels join the scan-stage quality pass on doc_id; no cartesian",
      p => p.contains("graft_dedup_clusters") && !p.contains("CartesianProduct") &&
        !p.contains("BroadcastNestedLoopJoin"))
    check("q307_ivf_recall_curve",
      "recall curve: stored IVF codebook read back (never retrained); panel/probes broadcast; ONE candidate pass for all budgets (no per-budget re-search)",
      p => p.contains("graft_cent_ivf") && p.contains("BroadcastExchange") &&
        !p.contains("CartesianProduct"))
    check("q309_cluster_separation",
      "separation audit: stored codebook read back; K x K matrix from map-side-combined moment sums + 64-row broadcast side tables; no cartesian",
      p => p.contains("graft_cent_ivf") && p.contains("partial_sum") &&
        p.contains("BroadcastExchange") && !p.contains("CartesianProduct"))
    check("q308_shard_mixing_audit",
      "mixing audit: ONE source-keyed dealing window feeds a map-side (shard, source) rollup; S-row joins after; no cartesian",
      p => p.contains("partial_sum") && p.contains("Window") &&
        !p.contains("CartesianProduct"))
    check("q310_deletion_neighborhood_join",
      "deletion-neighborhood: variant equi-join (never a cross), key-pair distinct, names re-attached broadcast",
      p => !p.contains("CartesianProduct") &&
        !p.contains("BroadcastNestedLoopJoin") &&
        p.contains("BroadcastHashJoin"))
    check("q311_heaps_fit",
      "Heaps fit: map-side (source, decile, tok) rollup; fit windows ride <= 10*|sources| rows; no cartesian",
      p => p.contains("partial_count") && !p.contains("CartesianProduct"))
    check("q312_term_burstiness",
      "burstiness: map-side (tok, doc) rollup -> vocab rollup; 1-row doc count broadcast; no fact shuffle of text",
      p => p.contains("partial_sum") && p.contains("BroadcastExchange") &&
        !p.contains("CartesianProduct"))
    checkTree("q313_transition_holdout",
      "holdout xent: the lag window is user-keyed, never a global fact window",
      noGlobalFactWindow)
    check("q314_sq8_overlap_audit",
      "sq8 overlap: ONE panel-corpus pass carries both scores; two rankings ride the same q_id partition; panel broadcast",
      p => p.contains("BroadcastExchange") && !p.contains("CartesianProduct") &&
        scans(p, "embeddings") <= 2)
    check("q315_ncm_confusion",
      "NCM confusion: L label-sum arrays broadcast; one scan through the fused int dot/norms kernel; no cartesian blowup beyond the L-row broadcast",
      p => p.contains("vec_int_dot_norms") && p.contains("BroadcastExchange"))
    check("q316_mutual_nn_pairs",
      "mutual-NN: STORED nn1 relation read back (never rebuilt), keyed self-join, labels broadcast",
      p => p.contains("graft_nn1") && p.contains("BroadcastExchange") &&
        !p.contains("CartesianProduct"))
    checkTree("q317_session_funnel_strict",
      "strict funnel: session windows are user-keyed, never a global fact window",
      noGlobalFactWindow)
    check("q317_session_funnel_strict",
      "strict funnel: the sessionized relation is pinned once (ExistingRDD) and the chain joins are session-keyed",
      p => p.contains("ExistingRDD") && !p.contains("CartesianProduct"))
    check("q318_heaps_forecast_check",
      "forecast check: fit rollups + one new-view vocab rollup, source-keyed joins, no cartesian",
      p => p.contains("partial_count") && !p.contains("CartesianProduct") &&
        !p.contains("BroadcastNestedLoopJoin"))
    checkTree("q319_session_gap_advisor",
      "gap advisor: the one lag+lead window is user-keyed, never a global fact window",
      noGlobalFactWindow)
    check("q319_session_gap_advisor",
      "gap advisor: the window pass is pinned once (ExistingRDD) and feeds all five threshold arms",
      p => p.contains("ExistingRDD") && !p.contains("CartesianProduct"))
    check("q320_retrieval_source_bias",
      "source bias: top-50 via TakeOrderedAndProject, corpus rollup map-side, tiny sides broadcast",
      p => p.contains("TakeOrderedAndProject") && p.contains("BroadcastExchange") &&
        !p.contains("CartesianProduct"))
    check("q321_media_threshold_sweep",
      "media sweep: stored fingerprints read back; one pinned pair build (ExistingRDD) feeds all four threshold arms",
      p => p.contains("graft_media_phash") && p.contains("ExistingRDD") &&
        !p.contains("CartesianProduct"))
    check("q322_neyman_allocation",
      "Neyman: the |sources|-row weight table is pinned once (ExistingRDD) — the corpus quality scan never replicates; no cartesian",
      p => p.contains("ExistingRDD") && !p.contains("CartesianProduct"))
    checkTree("q323_watermark_advisor",
      "watermark advisor: the running-max window rides the AGGREGATE-REDUCED batch table, never the fact scan",
      noGlobalFactWindow)
    check("q323_watermark_advisor",
      "watermark advisor: one joined pass pinned (ExistingRDD) feeds all five delay arms (the broadcast join sits inside the pinned segment)",
      p => p.contains("ExistingRDD") && !p.contains("CartesianProduct") &&
        !p.contains("SortMergeJoin"))
    check("q324_encoding_advisor",
      "encoding advisor: runs fold hierarchically through KEYED windows (col,ok)->(col,bucket)->(col); <=2 stacked scans; NDV table broadcast",
      p => scans(p, "lineitem") <= 2 && p.contains("BroadcastExchange") &&
        !p.contains("CartesianProduct"))
    checkTree("q324_encoding_advisor",
      "encoding advisor: no zero-key window anywhere near fact-sized input",
      noGlobalFactWindow)
    check("q325_hll_overlap_matrix",
      "HLL overlap: dt + sketch pinned once (ExistingRDD) — sketch side is |sources|x128 rows; only the exact audit is tok-keyed",
      p => p.contains("ExistingRDD") && !p.contains("CartesianProduct"))
    checkTree("q326_t_closeness",
      "t-closeness: cum-diff windows are QI-keyed 8-row frames, never a global fact window",
      noGlobalFactWindow)
    check("q326_t_closeness",
      "t-closeness: QI-band rollup pinned once (ExistingRDD); axis/global-dist/total broadcast; no cartesian",
      p => p.contains("ExistingRDD") && p.contains("BroadcastExchange") &&
        !p.contains("CartesianProduct"))
    check("q327_cuped",
      "CUPED: user rollup pinned once (ExistingRDD) feeds pooled moments AND per-arm sums; 1-row moment table broadcast",
      p => p.contains("ExistingRDD") && p.contains("BroadcastExchange") &&
        !p.contains("CartesianProduct"))
    check("q328_cross_perplexity",
      "cross-perplexity: the (source, tok) rollup pinned once (ExistingRDD); LM side joins vocab-KEYED; totals/vocab broadcast; no cartesian",
      p => p.contains("ExistingRDD") && p.contains("BroadcastExchange") &&
        !p.contains("CartesianProduct"))
    checkTree("q329_exact_substring_mass",
      "prefix doubling: NO zero-key window anywhere (read-back consumer; r13 verdict #1 shape preserved)",
      p => p.collect { case w: org.apache.spark.sql.execution.window.WindowExec
          if w.partitionSpec.isEmpty => w }.isEmpty)
    check("q329_exact_substring_mass",
      "dup mass: READS the bucketed suffranks artifact (no live chain, no documents scan); stacked (round,r)-keyed rollup rides the bucketing — the ONLY exchange is the 2-row per-round rollup; no cartesian",
      p => p.contains("graft_suffranks") && scans(p, "documents") == 0 &&
        p.linesIterator.count(_.contains("+- Exchange")) <= 1 &&
        !p.contains("CartesianProduct"))
    checkTree("q339_exact_substring_spans",
      "span extraction: NO zero-key window anywhere (read-back ranks; island merge is (round,doc)-KEYED)",
      p => p.collect { case w: org.apache.spark.sql.execution.window.WindowExec
          if w.partitionSpec.isEmpty => w }.isEmpty)
    check("q339_exact_substring_spans",
      "span extraction: READS the bucketed suffranks artifact (no live chain, no documents scan); rank rollup + join-back ride the (round,r) bucketing; no cartesian",
      p => p.contains("graft_suffranks") && scans(p, "documents") == 0 &&
        !p.contains("CartesianProduct"))
    check("q354_span_dedup_yield",
      "span-dedup yield: READS the bucketed suffranks artifact; doc-keyed span rollup; ONE documents scan (token counts); no cartesian",
      p => p.contains("graft_suffranks") && scans(p, "documents") == 1 &&
        !p.contains("CartesianProduct"))
    checkTree("q354_span_dedup_yield",
      "span-dedup yield: no zero-key window (island merge + rollups keyed)",
      p => p.collect { case w: org.apache.spark.sql.execution.window.WindowExec
          if w.partitionSpec.isEmpty => w }.isEmpty)
    check("q356_span_cut_fingerprints",
      "span-cut fingerprints: READS the suffranks artifact; doc-keyed start collect; cut + md5 in the scan stage (HOFs, no Generate); no cartesian",
      p => p.contains("graft_suffranks") && !p.contains("+- Generate") &&
        !p.contains("CartesianProduct"))
    check("q355_span_dedup_lm_impact",
      "span-dedup LM impact: cut rides the read-back suffranks starts (pinned fragments, ExistingRDD); variant axis broadcast; eval join vocab-KEYED; no cartesian",
      p => p.contains("ExistingRDD") && p.contains("BroadcastExchange") &&
        !p.contains("CartesianProduct"))
    checkTree("q353_suffix_rank_chain",
      "live suffix chain (the artifact's plan proof): NO zero-key window at any round (hashBucketRank renumbers only)",
      p => p.collect { case w: org.apache.spark.sql.execution.window.WindowExec
          if w.partitionSpec.isEmpty => w }.isEmpty)
    check("q353_suffix_rank_chain",
      "live suffix chain: rounds pinned (ExistingRDD); the data-growing vocab rank joins WITHOUT a broadcast (r14 advisor); no cartesian",
      p => p.contains("ExistingRDD") && !p.contains("CartesianProduct"))
    check("q340_exact_substring_admission",
      "exact-substring admission: LeftSemi against the bucketed gpos16 inventory; doc-KEYED island windows; no cartesian",
      p => p.contains("LeftSemi") && !p.contains("CartesianProduct"))
    checkTree("q340_exact_substring_admission",
      "exact-substring admission: no zero-key window (island merge + rollup are doc-keyed)",
      p => p.collect { case w: org.apache.spark.sql.execution.window.WindowExec
          if w.partitionSpec.isEmpty => w }.isEmpty)
    check("q341_session_paths",
      "session paths: user-keyed session windows; top-10 via TakeOrderedAndProject; totals broadcast; no cartesian",
      p => p.contains("TakeOrderedAndProject") && p.contains("BroadcastExchange") &&
        !p.contains("CartesianProduct"))
    check("q342_shingle_size_advisor",
      "shingle advisor: one pinned text read feeds all four stacked arms (ExistingRDD); (w,gh)-keyed rollup; no cartesian",
      p => p.contains("ExistingRDD") && !p.contains("CartesianProduct"))
    check("q343_dedup_lm_impact",
      "dedup LM impact: pinned train/count fragments (ExistingRDD); variant axis broadcast; eval join vocab-KEYED; no cartesian",
      p => p.contains("ExistingRDD") && p.contains("BroadcastExchange") &&
        !p.contains("CartesianProduct"))
    check("q345_label_propagation",
      "LPA: edge set pinned once (ExistingRDD); per-round vertex-KEYED rank-1 windows; no cartesian",
      p => p.contains("ExistingRDD") && !p.contains("CartesianProduct"))
    checkTree("q345_label_propagation",
      "LPA: no zero-key window (argmax rank is vertex-keyed)",
      p => p.collect { case w: org.apache.spark.sql.execution.window.WindowExec
          if w.partitionSpec.isEmpty => w }.isEmpty)
    check("q346_forecast_backtest",
      "forecast backtest: day-KEYED self-joins on the pinned day rollup — no window at all",
      p => p.contains("ExistingRDD") && !p.contains("WindowExec") &&
        !p.contains("CartesianProduct"))
    check("q347_keyword_extraction",
      "keywords: one pinned tokenize feeds tf AND df (ExistingRDD); doc-KEYED top-3; n_docs broadcast",
      p => p.contains("ExistingRDD") && p.contains("BroadcastExchange") &&
        !p.contains("CartesianProduct"))
    checkTree("q348_zipf_fit",
      "zipf fit: NO zero-key window (rank via keyedPrefixRank over the growing vocab)",
      p => p.collect { case w: org.apache.spark.sql.execution.window.WindowExec
          if w.partitionSpec.isEmpty => w }.isEmpty)
    check("q349_length_psi_drift",
      "PSI drift: two snapshot-view scans of one pinned projection; bounded bucket axis full-outer; 1-row totals broadcast",
      p => p.contains("ExistingRDD") && p.contains("BroadcastExchange") &&
        !p.contains("CartesianProduct"))
    checkTree("q350_negative_sampling_table",
      "negative-sampling table: NO zero-key window (rank+cumsum via keyedPrefixRank over the growing vocab)",
      p => p.collect { case w: org.apache.spark.sql.execution.window.WindowExec
          if w.partitionSpec.isEmpty => w }.isEmpty)
    check("q351_partial_agg_advisor",
      "partial-agg advisor: one rollup per candidate off the pinned scan (ExistingRDD); map-side partials; no cartesian",
      p => p.contains("ExistingRDD") && p.contains("partial_count") &&
        !p.contains("CartesianProduct"))
    check("q352_physical_width_advisor",
      "width advisor: stacked canon scan folds to per-column min/max partials; no cartesian",
      p => p.contains("partial_min") && p.contains("partial_max") &&
        !p.contains("CartesianProduct"))
    check("q357_shuffle_partition_advisor",
      "partition advisor: ONE pinned vocab rollup (ExistingRDD) stacked over the 4-bounded candidate axis; (P,bucket)-keyed map-side rollup; no cartesian",
      p => p.contains("ExistingRDD") && p.contains("partial_sum") &&
        !p.contains("CartesianProduct"))
    checkTree("q358_mann_whitney",
      "Mann-Whitney: the pooled-rank cumsum is source-KEYED — no zero-key window anywhere (rank test without ranking rows)",
      p => p.collect { case w: org.apache.spark.sql.execution.window.WindowExec
          if w.partitionSpec.isEmpty => w }.isEmpty)
    check("q359_repetition_budget",
      "repetition budget: token counts ride the scan as regexp COUNTS — zero Generate (no explode), |sources|-row arithmetic, 1-row totals broadcast",
      p => !p.contains("Generate") && p.contains("BroadcastExchange") &&
        !p.contains("CartesianProduct"))
    check("q360_data_scaling_ladder",
      "scaling ladder: ONE pinned corpus token rollup (ExistingRDD); rung fan rides VOCAB-sized rows against the broadcast 4-row axis; no cartesian",
      p => p.contains("ExistingRDD") && p.contains("BroadcastExchange") &&
        !p.contains("CartesianProduct"))
    check("q361_broadcast_plan_advisor",
      "broadcast advisor: dim-table scans ONLY — the fact tables never enter the plan",
      p => scans(p, "lineitem") == 0 && scans(p, "orders") == 0 &&
        scans(p, "documents") == 0 && !p.contains("CartesianProduct"))
    check("q364_bbit_minhash_audit",
      "b-bit audit: candidate pairs + sigs pinned (ExistingRDD) — pair-sized work, never all-pairs; bounded b-axis fan on the PAIR table; no cartesian",
      p => p.contains("ExistingRDD") && !p.contains("CartesianProduct"))
    check("q365_stupid_backoff_score",
      "stupid backoff: every scorer leg reads the PINNED bigram rollup (ExistingRDD) — zero Generate above it; observed tables only (no V^2 smoothing mass); no cartesian",
      p => !p.contains("Generate") && p.contains("ExistingRDD") &&
        !p.contains("CartesianProduct"))
    check("q366_jl_projection_audit",
      "JL audit: pinned (vec,dim) explode + 16-bounded projection rollup (ExistingRDD); disjoint-pair KEYED joins — never all-pairs; no cartesian",
      p => p.contains("ExistingRDD") && !p.contains("CartesianProduct"))
    checkTree("q362_hill_tail_index",
      "Hill tail index: order statistics from lang-KEYED rank windows — no zero-key window, no global sort",
      p => p.collect { case w: org.apache.spark.sql.execution.window.WindowExec
          if w.partitionSpec.isEmpty => w }.isEmpty)
    check("q363_entropy_rate",
      "entropy rate: every consumer reads the PINNED bigram rollup (ExistingRDD) — zero Generate above it, so the corpus is tokenized once",
      p => !p.contains("Generate") && p.contains("ExistingRDD") &&
        !p.contains("CartesianProduct"))
    check("q367_good_turing",
      "Good-Turing: ONE pinned token rollup feeds total + counts-of-counts (ExistingRDD); r-axis 9-bounded BEFORE broadcast; no cartesian",
      p => p.contains("ExistingRDD") && p.contains("BroadcastExchange") &&
        !p.contains("CartesianProduct"))
    checkTree("q368_kruskal_wallis",
      "Kruskal-Wallis: the pooled-rank cumsum is source-KEYED — no zero-key window (k-group rank test without ranking rows)",
      p => p.collect { case w: org.apache.spark.sql.execution.window.WindowExec
          if w.partitionSpec.isEmpty => w }.isEmpty)
    checkTree("q369_cusum_drift",
      "CUSUM: both walk windows (cumsum + running min) are event_type-KEYED — no zero-key window, no sequential recurrence",
      p => p.collect { case w: org.apache.spark.sql.execution.window.WindowExec
          if w.partitionSpec.isEmpty => w }.isEmpty)
    checkTree("q370_sorted_neighborhood",
      "SNM: sort rank via keyedPrefixRank (no zero-key window over the growing corpus); block-keyed neighbor join + semi-join-restricted gram verify (no cartesian)",
      p => p.collect { case w: org.apache.spark.sql.execution.window.WindowExec
          if w.partitionSpec.isEmpty => w }.isEmpty &&
        p.collect { case c: org.apache.spark.sql.execution.joins.CartesianProductExec => c }.isEmpty)
    check("q371_snm_key_advisor",
      "SNM key advisor: ONE pinned prefix scan feeds cost rollup + both recall sides (ExistingRDD); 3-bounded w-axis broadcast; pair-sized recall join; no cartesian",
      p => p.contains("ExistingRDD") && p.contains("BroadcastExchange") &&
        !p.contains("CartesianProduct"))
    checkTree("q372_theil_sen",
      "Theil-Sen: rank + count windows are event_type-KEYED over the time-bounded pair set — no zero-key window, no global sort",
      p => p.collect { case w: org.apache.spark.sql.execution.window.WindowExec
          if w.partitionSpec.isEmpty => w }.isEmpty)
    check("q373_ratio_jackknife",
      "ratio jackknife: ONE pinned (type,day) rollup feeds totals + replicates + spread (ExistingRDD); subtractive replicates — no per-replicate re-scan; no cartesian",
      p => p.contains("ExistingRDD") && !p.contains("CartesianProduct"))
    check("q374_seasonality_strength",
      "seasonality strength: ONE pinned (type,day) rollup feeds dow rollup + totals (ExistingRDD); 7-bounded dow axis; no cartesian",
      p => p.contains("ExistingRDD") && !p.contains("CartesianProduct"))
    check("q375_dispersion_index",
      "dispersion index: map-side (type,day) rollup collapses to moment sums — no window, no join, no cartesian",
      p => !p.contains("CartesianProduct") && !p.contains("WindowExec"))
    check("q376_source_unseen_mass",
      "source unseen-mass: one (source,tok) rollup collapses to per-source aggregates — no window, no join, no cartesian",
      p => !p.contains("CartesianProduct") && !p.contains("WindowExec"))
    check("q344_loo_source_valuation",
      "LOO valuation: subtractive one-rollup form — NO tokenize above the pinned rollup (zero Generate downstream); variant axis broadcast; no cartesian",
      p => !p.contains("+- Generate") && p.contains("ExistingRDD") &&
        p.contains("BroadcastExchange") && !p.contains("CartesianProduct"))
    // the one-corpus-token-scan assertion runs on the UNPINNED builder,
    // where the whole lineage is one visible tree (the query's pinned
    // fragments hide the Generate below localCheckpoint boundaries).
    // A plan-copy tree replicates the shared rollup sub-DAG per consumer
    // path, so the mechanical form is: every Generate subtree is
    // JOIN-FREE (tokenize always reads the raw corpus directly — the
    // r14 x21 shape tokenized a variant-fanned crossJoin stream, i.e. a
    // join BELOW the Generate) and all Generates are the SAME tokenize
    // expression (one logical corpus token scan, not a second pass)
    locally {
      val name = "q344_loo_source_valuation"
      val what = "LOO valuation (unpinned lineage): ONE logical corpus token scan — every Generate join-free below, all Generates the same tokenize; no cartesian"
      val ok = try {
        val p = graft.operators.ModelPrepQueries
          .looSourceValuation(spark, d, pin = false).queryExecution.sparkPlan
        val gens = p.collect {
          case g: org.apache.spark.sql.execution.GenerateExec => g }
        gens.nonEmpty &&
        gens.forall(g => g.collect {
          case j: org.apache.spark.sql.execution.joins.BaseJoinExec => j
        }.isEmpty) &&
        gens.map(_.generator.toString.replaceAll("#\\d+", ""))
          .distinct.size == 1 &&
        p.collect {
          case c: org.apache.spark.sql.execution.joins.CartesianProductExec => c
        }.isEmpty
      } catch { case e: Throwable =>
        System.err.println(s"[plancheck] $name: $e"); false }
      if (!ok) misses += 1
      println(f"${if (ok) "OK  " else "MISS"} $name%-28s $what")
    }
    check("q330_autocorrelation",
      "autocorrelation: 7 lag self-joins ride the pinned AGGREGATE-REDUCED dense grid (ExistingRDD), axis broadcast; no cartesian",
      p => p.contains("ExistingRDD") && !p.contains("CartesianProduct"))
    check("q331_bradley_terry",
      "Bradley-Terry: the corpus quality scan lives INSIDE the pinned (source,band) rollup (zero visible parquet scans); MM rounds ride |sources|^2 tables; axis broadcast",
      p => scans(p, "documents") == 0 && p.contains("ExistingRDD") &&
        p.contains("BroadcastExchange") && !p.contains("CartesianProduct"))
    check("q332_brier_decomposition",
      "Brier: the fused score+verdict scan lives INSIDE the pinned (source,bin) rollup; per-source rollups only",
      p => scans(p, "documents") == 0 && p.contains("ExistingRDD") &&
        !p.contains("CartesianProduct"))
    check("q333_intrinsic_dim",
      "TwoNN: the sample x corpus kernel pass lives INSIDE the pinned top-2 table (ExistingRDD); one global rollup after",
      p => p.contains("ExistingRDD") && !p.contains("CartesianProduct") &&
        !p.contains("SortMergeJoin"))
    checkTree("q333_intrinsic_dim",
      "TwoNN: the top-2 window is q_id-keyed, never a global fact window",
      noGlobalFactWindow)
    check("q334_return_survival",
      "return survival: shared user-keyed session windows; ONE-row life table pinned (ExistingRDD) feeds the 5 horizon arms",
      p => p.contains("ExistingRDD") && !p.contains("CartesianProduct"))
    checkTree("q334_return_survival",
      "return survival: session/lead windows are user-keyed, never a global fact window",
      noGlobalFactWindow)
    check("q335_bloom_sizing",
      "bloom advisor: pinned distinct build keys (ExistingRDD), ONE keyed semi-join count, 4-row literal grid crossed broadcast",
      p => p.contains("ExistingRDD") && p.contains("LeftSemi") &&
        !p.contains("CartesianProduct"))
    check("q336_fd_discovery",
      "FD discovery: candidates stack per table into ONE arm-keyed map-side (lhs,rhs) rollup chain — no joins at all",
      p => p.contains("partial_count") && !p.contains("Join"))
    check("q337_partition_advisor",
      "partition advisor: per-key map-side (partition, flags) rollups pinned (ExistingRDD); no joins",
      p => p.contains("ExistingRDD") && !p.contains("Join"))
    check("q338_join_order_costs",
      "join-order costs: the keyed joins + pushed filtered scans live INSIDE the pinned 1-row stat table (ExistingRDD); no cartesian",
      p => p.contains("ExistingRDD") && !p.contains("CartesianProduct"))
    check("q302_token_waterfill",
      "waterfill: map-side source token rollup; windows ride |sources| rows",
      p => p.contains("partial_sum") && !p.contains("CartesianProduct"))
    check("q303_tokenizer_agreement",
      "tokenizer bake-off: stored merges read back; unigram side is the fused DP kernel (vocab rides as bounded literals); no cartesian",
      p => p.contains("graft_bpe_merges") && p.contains("unigram_segment") &&
        !p.contains("CartesianProduct"))
    check("q301_opq_rotation_audit",
      "OPQ audit: BOTH trained codebooks read back stored (identity + rotated), broadcast to the scans, no cartesian",
      p => p.contains("graft_cent_pq") && p.contains("graft_cent_pqrot") &&
        p.contains("BroadcastExchange") && !p.contains("CartesianProduct"))
    // unigram-LM trainer: the trained vocab is a stored corpus-keyed
    // artifact — q299 is a read-back, never a retrain
    check("q299_unigram_lm_train",
      "unigram trainer output reads the stored vocab artifact",
      p => p.contains("graft_unigramv"))
    // apply: ONE linear corpus scan through the fused DP kernel — the
    // vocab rides in as bounded literals, no join, no second scan
    check("q300_unigram_lm_apply",
      "unigram apply: one documents scan through the fused DP kernel, no cartesian",
      p => scans(p, "documents") == 1 && p.contains("unigram_segment") &&
        !p.contains("CartesianProduct") && !p.contains("Join"))
    check("q298_cc_large_small_star",
      "star CC: final labels read the converged checkpointed star forest (ExistingRDD), no closure materialization, no cartesian",
      p => p.contains("ExistingRDD") && !p.contains("CartesianProduct") &&
        !p.contains("BroadcastNestedLoopJoin"))
    check("q247_k_anonymity",
      "k-anonymity: QI rollup materialized once (ExistingRDD); thin groups broadcast back for the user-distinct pass",
      p => scans(p, "events") == 1 && p.contains("ExistingRDD") &&
        p.contains("BroadcastExchange") && !p.contains("CartesianProduct"))
    check("q248_phrase_search",
      "phrase search: bounded top-1 (TakeOrdered), phrase broadcast to term-pruned postings",
      p => p.contains("TakeOrderedAndProject") && p.contains("BroadcastExchange") &&
        !p.contains("CartesianProduct"))
    check("q249_shot_boundaries",
      "shots: typed scan-stage featurize (only longs cross exchange), media-keyed window",
      p => p.contains("SerializeFromObject") && p.contains("Window") &&
        !p.contains("CartesianProduct"))
    check("q250_join_cardinality_estimate",
      "join-card audit: keyed join counts + 1-row stat crosses, no cartesian",
      p => p.contains("partial_count") && !p.contains("CartesianProduct"))
    check("q251_histogram_selectivity",
      "histogram audit: 16-row histogram + 3-row preds broadcast; cumsum window over the value-count AGGREGATE",
      p => p.contains("BroadcastExchange") && p.contains("ExistingRDD") &&
        !p.contains("CartesianProduct"))
    check("q252_trend_test",
      "Mann-Kendall: day-pair self-join over the materialized AGGREGATE-REDUCED day rollup",
      p => p.contains("ExistingRDD") && !p.contains("CartesianProduct"))
    check("q193_containment_pairs",
      "containment rides the pinned gram sets; pair joins gh-keyed, no cartesian",
      p => p.contains("ExistingRDD") && !p.contains("CartesianProduct") &&
        !p.contains("BroadcastNestedLoopJoin"))
    check("q194_curation_funnel",
      "funnel: map-side-combined rollups; eval grams broadcast; only the 5x5 stage theta-join is unkeyed",
      p => p.contains("partial_count") && p.contains("BroadcastExchange") &&
        !p.contains("CartesianProduct"))
    // r15 optimization: the five downstream canonical-label consumers
    // read the STORED bucketed label table (q129 deliberately stays on
    // the live 6-round chain as the declared computation the artifact
    // is verified against — the q56/dedup_clusters rule). A consumer
    // silently reverting to the live chain re-pays 6 edge-keyed rounds
    // per run; this row makes that a build failure.
    Seq("q150_leakage_safe_split", "q155_dedup_sampling_weights",
      "q162_curation_pipeline", "q181_quality_canonical",
      "q194_curation_funnel").foreach(q =>
      check(q, "canonical labels come from the stored canonlabels artifact",
        p => p.contains("graft_canonlabels")))
    // r15 optimization: apply is ONE corpus scan folding the stored
    // merge artifact's round ≤ 3 prefix (q168's shape at depth 3) —
    // the old form paid four corpus passes per run
    check("q165_bpe_apply", "apply: ONE corpus scan folding the bpe_merges artifact; char counts map-side",
      p => p.contains("partial_count") && p.contains("graft_bpe_merges") &&
        scans(p, "documents") == 1 && !p.contains("CartesianProduct"))
    check("q166_mixture_temperature", "mixture weights: source counts combine map-side; scalar total broadcast back",
      p => p.contains("partial_count") && !p.contains("CartesianProduct"))
    check("q167_source_quality_profile", "quality pass scan-stage; one map-side-combined source rollup (single scan)",
      p => p.contains("partial_count") && scans(p, "documents") == 1)
    check("q157_boilerplate_prefix", "prefix groups combine map-side; 32-char hex md5 keys (unhex to 16 bytes in production), never text, cross the exchange",
      p => p.contains("partial_count") && !p.contains("CartesianProduct"))
    // the broadcast-side discipline, mechanized (q153's lesson, then
    // re-learned on q136/q154/q155): across the WHOLE corpus-scanning
    // family, no HINTED broadcast side may hold an UNBOUNDED documents /
    // embeddings scan — no aggregate, semi join, limit, or filter
    // between scan and broadcast. That shape is a driver-side collect
    // in disguise: free at sf0.1, fatal at 100x. (Un-hinted broadcasts
    // the planner picks from toy-scale statistics are exempt — they
    // flip to shuffle joins on real data.) One combined line so a new
    // corpus query is covered by adding its name here.
    locally {
      val family = Seq(
        "q40_token_stats", "q41_quality_score", "q42_lang_id", "q43_fingerprint",
        "q44_ngram_profile", "q45_hash_sample", "q46_class_balance", "q48_ngram_freq",
        "q49_array_ops", "q50_dedup_exact", "q51_minhash_signatures",
        "q52_minhash_lsh_dedup", "q53_simhash_dedup", "q54_ngram_jaccard_verify",
        "q55_group_minhash", "q56_dedup_clusters", "q57_source_profile",
        "q58_cross_source_contamination", "q60_embedding_profile", "q61_ann_bruteforce",
        "q62_ann_lsh_bucketed", "q63_embedding_near_dup", "q64_ann_ivf",
        "q65_ann_rank_oracle", "q66_ann_quantized", "q67_ann_pq",
        "q68_portable_vec_lsh", "q69_ann_ivfpq", "q77_token_packing",
        "q98_portable_fingerprint", "q99_portable_minhash_pairs",
        "q100_portable_simhash", "q117_repetition_filter", "q118_ngram_decontam",
        "q119_heavy_hitters", "q120_mixture_sample", "q121_dpp_join",
        "q122_tfidf_top_terms", "q123_unigram_lm_score", "q124_bm25_retrieval",
        "q125_bloom_prefilter_join", "q126_gapfill_forward", "q127_markov_transitions",
        "q128_doc_chunks", "q129_cluster_canonical", "q130_lexical_diversity",
        "q134_corpus_manifest", "q136_knn_label_propagation",
        "q139_contrastive_triples", "q140_budget_selection", "q145_triangle_census",
        "q148_incremental_dedup", "q149_embedding_outliers", "q150_leakage_safe_split",
        "q151_vocab_coverage", "q152_source_dedup_report", "q153_near_dup_edit_verify",
        "q154_retrieval_metrics", "q155_dedup_sampling_weights", "q156_bpe_pair_stats",
        "q157_boilerplate_prefix", "q158_bpe_merge_round", "q159_source_overlap_matrix",
        "q160_bpe_training_rounds", "q161_source_salient_terms", "q162_curation_pipeline",
        "q163_label_centroid_overlap", "q164_dup_ngram_fraction", "q165_bpe_apply",
        "q166_mixture_temperature", "q167_source_quality_profile",
        "q168_bpe_fold_apply", "q169_dsir_importance", "q170_semantic_dedup",
        "q171_gopher_rules", "q172_ccnet_buckets", "q173_tokenizer_fertility",
        "q174_bpe_train_k", "q175_repeated_spans", "q176_pii_scrub",
        "q177_media_phash_neardup", "q178_span_removal",
        "q179_media_dedup_clusters", "q180_incremental_span_overlap",
        "q181_quality_canonical", "q182_prototype_selection",
        "q183_classifier_score", "q184_cms_error_profile",
        "q185_winnowing_fingerprints", "q186_stratified_kfold",
        "q187_bigram_lm_score", "q188_source_divergence",
        "q189_pair_pagerank", "q190_snapshot_diff", "q191_lsh_calibration",
        "q192_embedding_dim_stats", "q193_containment_pairs",
        "q194_curation_funnel", "q195_lsh_recall_audit",
        "q196_quality_percentile", "q197_power_iteration",
        "q198_semantic_decontam", "q199_shard_dealing",
        "q200_langid_confusion", "q201_vocab_growth",
        "q202_cdc_chunks", "q203_pmi_collocations",
        "q204_whitening_residuals", "q205_weighted_sample",
        "q206_rendezvous_sharding", "q207_robust_length_outliers",
        "q208_fold_leakage", "q209_incremental_chunk_overlap",
        "q210_padding_waste", "q211_pq_code_usage",
        "q212_seasonal_anomaly", "q213_cluster_size_histogram",
        "q214_budget_apportionment", "q215_crossmodal_gate",
        "q216_admission_recall_audit", "q217_span_gate_audit",
        "q218_gopher_rules", "q219_bigram_repetition",
        "q220_source_entropy", "q221_bootstrap_quality_ci",
        "q222_kcenter_coreset", "q223_filter_calibration",
        "q224_portable_hll", "q225_length_bucket_waste",
        "q226_sq8_error_profile", "q227_label_scatter",
        "q228_hard_negatives", "q229_audio_landmark_dedup",
        "q231_cluster_salient_terms", "q232_hubness_histogram",
        "q235_clip_calibration", "q236_vocab_overlap",
        "q237_source_embedding_drift", "q238_threshold_sweep",
        "q239_vocab_novelty", "q240_knn_label_agreement",
        "q241_modal_coverage", "q243_token_yield", "q246_kcore",
        "q248_phrase_search", "q249_shot_boundaries",
        "q298_cc_large_small_star")
      val offenders = family.filter { n =>
        try !PlanAudit.boundedBroadcasts(
          SparkEntry.queries(n)(spark, d).queryExecution.optimizedPlan)
        catch { case e: Throwable =>
          System.err.println(s"[plancheck] broadcast audit $n: $e"); true }
      }
      val ok = offenders.isEmpty
      if (!ok) misses += 1
      println(f"${if (ok) "OK  " else "MISS"} ${"broadcast_audit"}%-28s " +
        s"no unbounded hinted corpus-table broadcast across ${family.size} corpus queries" +
        (if (ok) "" else s" — offenders: ${offenders.mkString(", ")}"))
    }
    // ---- repo-wide zero-key-window sweep (r13 verdict #4) ----
    // Every zero-key WindowExec that survives into ANY query's physical
    // plan must (a) sit above an Aggregate (never fact-sized input) and
    // (b) belong to a query on the ALLOWLIST below, where its input
    // bound is documented. A new zero-key window in an unlisted query
    // FAILS this gate — the mechanical form of the "sanctioned
    // two-level numbering" convention. Data-GROWING renumbers must use
    // Clean.keyedGroupRank (no window visible at all: keyed rank +
    // broadcast offsets). Bounds below are also recorded in
    // docs/SCALE.md.
    locally {
      val allowed: Map[String, String] = PlanAudit.zeroKeyWindowAllowlist
      val offenders = scala.collection.mutable.ArrayBuffer.empty[String]
      var sites = 0
      SparkEntry.queries.keys.toSeq.sorted.foreach { n =>
        try {
          val p = SparkEntry.queries(n)(spark, d).queryExecution.sparkPlan
          val zk = p.collect {
            case w: org.apache.spark.sql.execution.window.WindowExec
              if w.partitionSpec.isEmpty => w }
          if (zk.nonEmpty) {
            sites += zk.size
            val aboveAgg = zk.forall(_.child.exists {
              case _: org.apache.spark.sql.execution.aggregate.BaseAggregateExec => true
              case _ => false })
            // a "!"-prefixed bound documents a window whose input is a
            // limit/dim, not an Aggregate — allowed only when listed so
            if (!allowed.contains(n) ||
                (!aboveAgg && !allowed(n).startsWith("!")))
              offenders += s"$n(${zk.size}${if (aboveAgg) "" else ",NOT-above-Aggregate"})"
          }
        } catch { case e: Throwable =>
          System.err.println(s"[plancheck] zero-key sweep $n: $e")
          offenders += s"$n(construction-failed)"
        }
      }
      val ok = offenders.isEmpty
      if (!ok) misses += 1
      println(f"${if (ok) "OK  " else "MISS"} ${"zero_key_window_sweep"}%-28s " +
        s"all $sites zero-key window sites across ${SparkEntry.queries.size} queries are allowlisted+bounded" +
        (if (ok) "" else s" — offenders: ${offenders.mkString(", ")}"))
    }
    println(if (misses == 0) "ALL PLAN CHECKS OK" else s"$misses MISSES")
    spark.stop()
    if (misses > 0) sys.exit(1) // let CI/scripts gate on the result
  }
}
