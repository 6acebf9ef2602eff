package graft.operators

import graft.{QueryDef, Tables}
import graft.functions.HashFunctions._
import graft.functions.TextFunctions._
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Deduplication suite over `documents` — exact, MinHash+LSH, SimHash,
  * and n-gram Jaccard. Designed so the expensive pairwise work only ever
  * happens inside small hash buckets:
  *
  *   per-row signatures (scan stage, codegen, no shuffle)
  *     → explode band keys (bands× row multiplier, narrow)
  *     → shuffle on (band, bandhash)   ← the ONLY data-sized shuffle
  *     → pairwise verify within buckets (bucket sizes are ~Poisson, tiny)
  *
  * At 100 TB the band shuffle carries (doc_id, 8-byte key) pairs — a few
  * hundred GB — not document text; text re-joins only for the candidate
  * pairs (a broadcast-sized set unless the corpus is mostly duplicates).
  */
object DedupQueries {

  /** Exact dedup by content hash: every doc annotated with its group's
    * keeper (min doc_id with identical md5(text)) — with DuckDB oracle. */
  val q50 = QueryDef.oracle("q50_dedup_exact",
    """SELECT d.doc_id, g.keeper_id, g.n_copies,
      |       CASE WHEN d.doc_id = g.keeper_id THEN 'keep' ELSE 'drop' END AS action
      |FROM documents d JOIN (
      |  SELECT md5(text) AS h, min(doc_id) AS keeper_id, count(*) AS n_copies
      |  FROM documents GROUP BY md5(text)) g
      |ON md5(d.text) = g.h""".stripMargin)(
    (s, d) => {
      val docs = Tables.documents(s, d).withColumn("h", md5(col("text")))
      val groups = docs.groupBy("h")
        .agg(min("doc_id").as("keeper_id"), count(lit(1)).as("n_copies"))
      docs.join(groups, "h")
        .select(col("doc_id"), col("keeper_id"), col("n_copies"),
          when(col("doc_id") === col("keeper_id"), "keep").otherwise("drop").as("action"))
    })

  val MinhashK = 64
  val MinhashBands = 16

  // Portable-hash family constants — declared BEFORE the query vals that
  // bake them into oracle SQL strings at object-init time (a later-val
  // reference would silently read 0 during initialization).
  private val PortP = graft.functions.PortableHashKernels.P
  private val PortMul = 1000003L
  private[graft] val PortK = 12 // 4 bands × 3 rows: P(pair|j=.98)≈1, P(pair|j=.2)≈.03
  private[graft] val PortBands = 4
  private[graft] val PortMatchMin = PortK / 2 // est-Jaccard ≥ 0.5 ⇔ ≥ half the minhashes agree
  private val SimBits = 24 // < 30 bits of the mod-1e9+7 gram hash: unbiased-ish
  private val SimBlocks = 3 // 8-bit blocks; hamming ≤ SimBlocks qualifies a pair
  private val EditCap = 2000 // chars of each side the q153 edit-distance DP sees
  // constants live in the kernel — the SQL generator below and the native
  // expression must never disagree
  private def portA(i: Int): Long = graft.functions.PortableHashKernels.a(i)
  private def portB(i: Int): Long = graft.functions.PortableHashKernels.b(i)

  /** Per-doc MinHash signature + banded bucket keys (the signature pass
    * of MinHash-LSH), HASH-MATCHED on the portable family (the round-11
    * verdict's no_oracle shrink — this was the suite's last rows-only
    * MinHash): the k=[[PortK]] signature values mh0..mh11 and the
    * [[PortBands]] band digests come out as SCALAR columns, each
    * replayed bit-for-bit by the DuckDB oracle (same gram fold, same
    * affine streams, same band-digest polynomial as q99/q52/q148 —
    * which therefore agree with this query's keys by construction).
    * Gram-less docs carry NULL signatures in both engines. The
    * signature pass is still one shuffle-free codegen'd scan
    * (PlanCheck-asserted). */
  val q51 = QueryDef.oracle("q51_minhash_signatures", {
    val bandCols = (0 until PortBands).map { j =>
      val (m0, m1, m2) = (s"mh${3 * j}", s"mh${3 * j + 1}", s"mh${3 * j + 2}")
      s"((($m0 * $PortMul + $m1) % $PortP) * $PortMul + $m2) % $PortP AS b$j"
    }.mkString(",\n       ")
    s"""$portableBandrowsCtes
       |SELECT doc_id, ${(0 until PortK).map(i => s"mh$i").mkString(", ")},
       |       $bandCols
       |FROM sig""".stripMargin})(
    (s, d) => {
      val withSig = Tables.documents(s, d)
        .select(col("doc_id") +: portableMinhashCols(col("text")): _*)
      val bandCols = (0 until PortBands).map { j =>
        val (m0, m1, m2) = (col(s"mh${3 * j}"), col(s"mh${3 * j + 1}"),
          col(s"mh${3 * j + 2}"))
        ((((m0 * PortMul + m1) % PortP) * PortMul + m2) % PortP).as(s"b$j")
      }
      withSig.select(col("doc_id") +:
        (0 until PortK).map(i => col(s"mh$i")) ++: bandCols: _*)
    })

  /** Candidate pairs from LSH banding, verified with signature-estimated
    * Jaccard, per-doc near-dup summary (always n_docs rows, so the gate
    * is meaningful even on a dup-free corpus). HASH-MATCHED: built on the
    * portable MinHash kernels (q99's family), so the DuckDB oracle
    * replays signatures → bands → pairs → estimated Jaccard → summary
    * end to end. Scale shape: the band shuffle carries (band, digest,
    * doc_id) only; signatures are recomputed just for the (rare)
    * candidate docs — the q54 trade, candidates restrict the scan BEFORE
    * the kernel.
    */
  val q52 = QueryDef.oracle("q52_minhash_lsh_dedup", {
    s"""$portableScoredCtes,
       |kept AS (SELECT ia, ib, n_match FROM scored WHERE n_match >= $PortMatchMin),
       |perdoc AS (
       |  SELECT doc_id, CAST(count(*) AS BIGINT) AS n_near_dups, max(n_match) AS best_match
       |  FROM (SELECT ia AS doc_id, n_match FROM kept
       |        UNION ALL SELECT ib AS doc_id, n_match FROM kept)
       |  GROUP BY doc_id)
       |SELECT d.doc_id, COALESCE(n_near_dups, CAST(0 AS BIGINT)) AS n_near_dups,
       |       best_match / $PortK.0 AS best_jaccard
       |FROM documents d LEFT JOIN perdoc USING (doc_id)""".stripMargin})(
    (s, d) => {
      val scored = portableScoredPairs(s, d)
        .filter(col("n_match") >= PortMatchMin)
      val perDoc = scored.select(col("ia").as("doc_id"), col("n_match"))
        .unionByName(scored.select(col("ib").as("doc_id"), col("n_match")))
        .groupBy("doc_id")
        .agg(count(lit(1)).as("n_near_dups"), max("n_match").as("best_match"))
      Tables.documents(s, d).select(col("doc_id"))
        .join(perDoc, Seq("doc_id"), "left")
        .select(col("doc_id"),
          coalesce(col("n_near_dups"), lit(0L)).as("n_near_dups"),
          (col("best_match") / lit(PortK.toDouble)).as("best_jaccard"))
    })

  /** SimHash near-dup summary: signature; block split (any pair within
    * Hamming distance SimBlocks shares at least one block by pigeonhole);
    * candidates from the (block, value) equi-join; only candidates pay
    * the bit_count verify. HASH-MATCHED: built on the portable 24-bit
    * SimHash (q100's kernel — q100 reports partner IDENTITY, this query
    * the near-dup DISTANCES), so the DuckDB oracle replays fingerprints,
    * pigeonhole blocking, and hamming end to end. */
  val q53 = QueryDef.oracle("q53_simhash_dedup", {
    s"""$portableSimhashCtes,
       |perdoc AS (
       |  SELECT doc_id, CAST(count(*) AS BIGINT) AS n_near_dups, min(hamming) AS best_hamming
       |  FROM (SELECT ia AS doc_id, hamming FROM pairs
       |        UNION ALL SELECT ib AS doc_id, hamming FROM pairs)
       |  GROUP BY doc_id)
       |SELECT d.doc_id, s.fp AS simhash24,
       |       COALESCE(n_near_dups, CAST(0 AS BIGINT)) AS n_near_dups, best_hamming
       |FROM documents d
       |LEFT JOIN sig s USING (doc_id)
       |LEFT JOIN perdoc USING (doc_id)""".stripMargin})(
    (s, d) => {
      val docs = Tables.documents(s, d)
      val sigDf = storedSimhashSigs(s, d) // fingerprints read back, not re-hashed
      val blocks = sigDf.filter(col("n") > 0)
        .select(col("doc_id"), col("fp"),
          posexplode(array((0 until SimBlocks).map(b =>
            shiftright(col("fp"), 8 * b).bitwiseAND(lit(255L))): _*)).as(Seq("blk", "val")))
      val a = blocks.select(col("blk"), col("val"), col("doc_id").as("ia"), col("fp").as("fa"))
      val b = blocks.select(col("blk"), col("val"), col("doc_id").as("ib"), col("fp").as("fb"))
      val pairs = a.join(b, Seq("blk", "val")).filter(col("ia") < col("ib"))
        .select("ia", "fa", "ib", "fb").distinct()
        .select(col("ia"), col("ib"),
          bit_count(col("fa").bitwiseXOR(col("fb"))).cast("long").as("hamming"))
        .filter(col("hamming") <= SimBlocks)
      val perDoc = pairs.select(col("ia").as("doc_id"), col("hamming"))
        .unionByName(pairs.select(col("ib").as("doc_id"), col("hamming")))
        .groupBy("doc_id")
        .agg(count(lit(1)).as("n_near_dups"), min("hamming").as("best_hamming"))
      docs.select("doc_id")
        .join(sigDf.select(col("doc_id"), col("fp").as("simhash24")), Seq("doc_id"), "left")
        .join(perDoc, Seq("doc_id"), "left")
        .select(col("doc_id"), col("simhash24"),
          coalesce(col("n_near_dups"), lit(0L)).as("n_near_dups"),
          col("best_hamming"))
    })

  /** Exact n-gram Jaccard within LSH-candidate pairs only (never all
    * pairs): MinHash banding proposes, exact 3-gram Jaccard disposes.
    * The band shuffle carries ONLY (band, digest, doc_id) — document-
    * sized gram arrays never ride the explode; they re-join just for the
    * candidate pairs, which broadcast (they're rare unless the corpus is
    * mostly duplicates — and then dedup is the cheapest thing you run).
    * HASH-MATCHED: candidates come from the portable MinHash bands
    * (q99's pair set, by construction) and the exact Jaccard arithmetic
    * is engine-portable, so the oracle replays propose AND dispose. */
  val q54 = QueryDef.oracle("q54_ngram_jaccard_verify", {
    s"""$portablePairsCtes,
       |jac AS (
       |  SELECT p.ia, p.ib,
       |         len(list_intersect(ga.gs, gb.gs)) /
       |           CAST(len(ga.gs) + len(gb.gs) - len(list_intersect(ga.gs, gb.gs)) AS DOUBLE)
       |           AS jaccard
       |  FROM pairs p JOIN grams ga ON ga.doc_id = p.ia
       |               JOIN grams gb ON gb.doc_id = p.ib),
       |perdoc AS (
       |  SELECT doc_id, CAST(count(*) AS BIGINT) AS n_candidates, max(jaccard) AS best_jaccard
       |  FROM (SELECT ia AS doc_id, jaccard FROM jac
       |        UNION ALL SELECT ib AS doc_id, jaccard FROM jac)
       |  GROUP BY doc_id)
       |SELECT d.doc_id, COALESCE(n_candidates, CAST(0 AS BIGINT)) AS n_candidates, best_jaccard
       |FROM documents d LEFT JOIN perdoc USING (doc_id)""".stripMargin})(
    (s, d) => {
      // materialized once (it's tiny): three consumers below — without
      // this the whole minhash+banding pipeline re-executes per consumer
      val cand = portablePairs(s, d)
        .localCheckpoint(false) // lazy: construction stays side-effect-free
      // compute grams ONLY for docs that appear in a candidate pair: the
      // broadcast semi-join restricts the scan BEFORE the (expensive)
      // gram projection, so gram cost is O(candidates), not O(corpus)
      val candIds = cand.select(col("ia").as("doc_id"))
        .unionByName(cand.select(col("ib").as("doc_id"))).distinct()
      // also materialized once: consumed by BOTH sides of the pair join
      // below — without this the doc scan + (expensive) gram projection
      // runs twice per execution
      val grams = Tables.documents(s, d)
        .join(broadcast(candIds), Seq("doc_id"), "left_semi")
        .select(col("doc_id"), array_distinct(wordNgrams(col("text"), 3)).as("grams"))
        .localCheckpoint(false)
      val withA = grams.join(broadcast(cand), col("doc_id") === col("ia"))
        .select(col("ia"), col("ib"), col("grams").as("g_a"))
      val pairs = grams.join(broadcast(withA), col("doc_id") === col("ib"))
        .select(col("ia"), col("ib"), jaccardDistinct(col("g_a"), col("grams")).as("jaccard"))
      val perDoc = pairs.select(col("ia").as("doc_id"), col("jaccard"))
        .unionByName(pairs.select(col("ib").as("doc_id"), col("jaccard")))
        .groupBy("doc_id")
        .agg(count(lit(1)).as("n_candidates"), max("jaccard").as("best_jaccard"))
      Tables.documents(s, d).select(col("doc_id"))
        .join(perDoc, Seq("doc_id"), "left")
        .select(col("doc_id"), coalesce(col("n_candidates"), lit(0L)).as("n_candidates"),
          col("best_jaccard"))
    })

  /** Group-level set similarity: one MinHash signature per language over
    * the union of its documents' 3-gram sets, via the custom typed
    * Aggregator (map-side combinable — signatures, not shingles, cross
    * the exchange). Pairwise estimated Jaccard between languages.
    * HASH-MATCHED on the portable family (the round-11 verdict's
    * no_oracle shrink): the per-row signature is the portable kernel,
    * the group fold is [[graft.functions.MinSigAgg]]'s element-wise
    * min (exact under the union-set identity), and the DuckDB oracle
    * replays group signatures → pairwise agreeing-stream counts →
    * estimated Jaccard end to end (min over each doc's per-stream
    * minima, i.e. the same numbers without the distributed fold). An
    * all-gram-less group NULLs its signature in both engines, so
    * sentinel==sentinel can never count as agreement. */
  val q55 = QueryDef.oracle("q55_group_minhash", {
    val minCols = (0 until PortK).map(i => s"min(s.mh$i) AS mh$i").mkString(",\n         ")
    val matchSum = (0 until PortK).map(i =>
      s"CASE WHEN a.mh$i = b.mh$i THEN 1 ELSE 0 END").mkString(" + ")
    s"""$portableBandrowsCtes,
       |gsig AS (
       |  SELECT d.lang, CAST(count(*) AS BIGINT) AS n_docs,
       |         $minCols
       |  FROM sig s JOIN documents d ON d.doc_id = s.doc_id
       |  GROUP BY d.lang)
       |SELECT a.lang AS lang_a, b.lang AS lang_b, a.n_docs AS docs_a,
       |       CAST($matchSum AS BIGINT) AS n_match,
       |       CAST($matchSum AS BIGINT) / $PortK.0 AS est_jaccard
       |FROM gsig a JOIN gsig b ON a.lang < b.lang""".stripMargin})(
    (s, d) => {
      val agg = graft.functions.MinSigAgg.column(PortK)
      val folded = Tables.documents(s, d)
        .select(col("lang"),
          portableMinhashSigNative(col("text"), 3, PortK).as("sig"))
        .groupBy("lang")
        .agg(agg(col("sig")).as("sig"), count(lit(1)).as("n_docs"))
      // sentinel P (all grams absent across the whole group) -> NULL,
      // matching the oracle's min-skips-NULLs semantics. Long.MaxValue is
      // the fold's untouched-slot value (every row of the group had a
      // NULL signature — null text never reaches the kernel's sentinel-P
      // path), and must NULL out too: two all-null-text groups would
      // otherwise "agree" 12/12 on a buffer default while the oracle's
      // min-over-NULLs yields NULL columns that never match.
      val sigs = folded.select(col("lang") +: col("n_docs") +:
        (0 until PortK).map { i =>
          val v = element_at(col("sig"), i + 1)
          when(v === PortP || v === Long.MaxValue, lit(null).cast("long"))
            .otherwise(v).as(s"mh$i")
        }: _*)
      val l = sigs.select(col("lang").as("lang_a") +: col("n_docs").as("docs_a") +:
        (0 until PortK).map(i => col(s"mh$i").as(s"a$i")): _*)
      val r = sigs.select(col("lang").as("lang_b") +:
        (0 until PortK).map(i => col(s"mh$i").as(s"b$i")): _*)
      val nMatchCol = (0 until PortK).map(i =>
        when(col(s"a$i") === col(s"b$i"), 1).otherwise(0)).reduce(_ + _)
        .cast("long")
      l.join(r, col("lang_a") < col("lang_b"))
        .select(col("lang_a"), col("lang_b"), col("docs_a"),
          nMatchCol.as("n_match"),
          (nMatchCol / lit(PortK.toDouble)).as("est_jaccard"))
    })

  /** Near-dup CLUSTERS: LSH candidate pairs (est Jaccard ≥ 0.5) are edges;
    * connected components gives the transitive closure (a~b, b~c ⇒ one
    * cluster), min doc_id per cluster is the keeper. Always n_docs rows —
    * singletons are their own cluster. HASH-MATCHED: edges are the
    * portable scored pairs (q52's kept set, by construction) and the
    * oracle computes the same min-reachable-id labeling with a recursive
    * transitive-closure CTE, so the convergence-checked distributed loop
    * ([[Components.connectedComponents]]) is verified against an
    * independent fixpoint formulation — not just row counts. */
  val q56 = QueryDef.oracle("q56_dedup_clusters", {
    val recursiveCtes = portableScoredCtes.replaceFirst("^WITH ", "WITH RECURSIVE ")
    s"""$recursiveCtes,
       |kept AS (SELECT ia, ib FROM scored WHERE n_match >= $PortMatchMin),
       |undir AS (SELECT ia AS a, ib AS b FROM kept UNION SELECT ib, ia FROM kept),
       |reach(a, b) AS (
       |  SELECT a, b FROM undir
       |  UNION
       |  SELECT r.a, u.b FROM reach r JOIN undir u ON r.b = u.a),
       |comp AS (
       |  SELECT d.doc_id,
       |         CASE WHEN min(r.b) IS NULL THEN d.doc_id
       |              ELSE LEAST(d.doc_id, min(r.b)) END AS cluster_id
       |  FROM documents d LEFT JOIN reach r ON r.a = d.doc_id
       |  GROUP BY d.doc_id),
       |sizes AS (SELECT cluster_id, CAST(count(*) AS BIGINT) AS cluster_size
       |          FROM comp GROUP BY cluster_id)
       |SELECT c.doc_id, c.cluster_id, s.cluster_size,
       |       CASE WHEN c.doc_id = c.cluster_id THEN 'keep' ELSE 'drop' END AS action
       |FROM comp c JOIN sizes s USING (cluster_id)""".stripMargin})(
    (s, d) => {
      val edges = portableScoredPairs(s, d)
        .filter(col("n_match") >= PortMatchMin)
        .select(col("ia").as("src"), col("ib").as("dst"))
      val vertices = Tables.documents(s, d).select(col("doc_id").as("id"))
      val comp = Components.connectedComponents(vertices, edges)
      val sizes = comp.groupBy("component").agg(count(lit(1)).as("cluster_size"))
      comp.join(sizes, "component")
        .select(col("id").as("doc_id"), col("component").as("cluster_id"),
          col("cluster_size"),
          when(col("id") === col("component"), "keep").otherwise("drop").as("action"))
    })

  /** DUPLICATE-CLUSTER SIZE HISTOGRAM — the dedup forensics rollup of
    * q56: is duplication a long tail of pairs or a few mega-clusters?
    * The answer decides the remediation (pair-level keeper rules vs
    * hunting the template that spawned the mega-cluster) and the cost
    * model (Σ|cluster|² for any within-cluster pass). Since the r15
    * optimization round the labels come from the STORED
    * [[clusterLabels]] artifact (the canonlabels/bpe_merges read-back
    * pattern — q56 keeps the closure LIVE as the declared computation
    * the artifact is verified against; re-running the CC fixpoint here
    * per invocation was pure waste, guide §2.4), collapsed to one row
    * per distinct cluster size with cluster and doc counts —
    * ≤ √(2·pairs) rows at any corpus size. The oracle still extends
    * q56's recursive-CTE fixpoint with the rollup, so an artifact/live
    * divergence is a hash mismatch. Singletons are counted (size 1 =
    * the undeduplicated mass), so the histogram's doc total is always
    * the corpus size — a built-in conservation check. HASH-MATCHED.
    */
  val q213 = QueryDef.oracle("q213_cluster_size_histogram", {
    val recursiveCtes = portableScoredCtes.replaceFirst("^WITH ", "WITH RECURSIVE ")
    s"""$recursiveCtes,
       |kept AS (SELECT ia, ib FROM scored WHERE n_match >= $PortMatchMin),
       |undir AS (SELECT ia AS a, ib AS b FROM kept UNION SELECT ib, ia FROM kept),
       |reach(a, b) AS (
       |  SELECT a, b FROM undir
       |  UNION
       |  SELECT r.a, u.b FROM reach r JOIN undir u ON r.b = u.a),
       |comp AS (
       |  SELECT d.doc_id,
       |         CASE WHEN min(r.b) IS NULL THEN d.doc_id
       |              ELSE LEAST(d.doc_id, min(r.b)) END AS cluster_id
       |  FROM documents d LEFT JOIN reach r ON r.a = d.doc_id
       |  GROUP BY d.doc_id),
       |sizes AS (SELECT cluster_id, CAST(count(*) AS BIGINT) AS cluster_size
       |          FROM comp GROUP BY cluster_id)
       |SELECT cluster_size, CAST(count(*) AS BIGINT) AS n_clusters,
       |       CAST(cluster_size * count(*) AS BIGINT) AS n_docs
       |FROM sizes GROUP BY cluster_size""".stripMargin})(
    (s, d) =>
      clusterLabels(s, d)
        .groupBy("cluster_id").agg(count(lit(1)).as("cluster_size"))
        .groupBy("cluster_size").agg(count(lit(1)).as("n_clusters"))
        .select(col("cluster_size"), col("n_clusters"),
          (col("cluster_size") * col("n_clusters")).as("n_docs")))

  /** Per-source corpus profile over the `source` dimension — the intake
    * report a multi-source training-data pipeline starts from. One keyed
    * shuffle; the distinct-counts expand map-side. */
  val q57 = QueryDef.oracle("q57_source_profile",
    """SELECT source, count(*) AS n_docs,
      |       count(DISTINCT lang) AS n_langs,
      |       CAST(SUM(CAST(n_chars AS BIGINT)) AS BIGINT) AS total_chars,
      |       count(DISTINCT md5(text)) AS n_distinct_texts
      |FROM documents GROUP BY source""".stripMargin)(
    (s, d) => Tables.documents(s, d)
      .groupBy("source")
      .agg(count(lit(1)).as("n_docs"),
        countDistinct(col("lang")).as("n_langs"),
        sum(col("n_chars").cast("long")).as("total_chars"),
        countDistinct(md5(col("text"))).as("n_distinct_texts")))

  /** Exact cross-source contamination (benchmark/test-set leakage): per
    * source, how many of its documents' texts also appear verbatim in a
    * DIFFERENT source. A doc is contaminated iff its md5 occurs in ≥ 2
    * distinct sources, so the engine aggregates per-hash distinct-source
    * counts and joins them back — LINEAR in the corpus, where the naive
    * hash self-join (the oracle's formulation, kept as-is to prove
    * equivalence) squares the largest duplicate class: one
    * boilerplate stub repeated a million times would generate 10¹²
    * pairs on a single key. Shuffles carry the 16-byte md5, never text.
    * Always |sources| rows, zeros on a leak-free corpus; the near-dup
    * form of the same question is q52's candidate pairs filtered to
    * cross-source. */
  val q58 = QueryDef.oracle("q58_cross_source_contamination",
    """WITH h AS (SELECT doc_id, source, md5(text) AS hh FROM documents),
      |leaked AS (
      |  SELECT DISTINCT a.doc_id FROM h a
      |  JOIN h b ON a.hh = b.hh AND a.source <> b.source)
      |SELECT h.source, count(*) AS n_docs,
      |       count(leaked.doc_id) AS n_contaminated
      |FROM h LEFT JOIN leaked ON h.doc_id = leaked.doc_id
      |GROUP BY h.source""".stripMargin)(
    (s, d) => {
      val h = Tables.documents(s, d)
        .select(col("doc_id"), col("source"), md5(col("text")).as("hh"))
      // doc leaked ⟺ its OWN source is non-null AND its hash spans ≥2
      // distinct non-null sources (equivalent to the oracle's
      // exists-a-partner-in-another-source self-join: `a.source <>
      // b.source` is NULL-strict, so a NULL-source doc never joins and
      // a NULL-source partner never counts — countDistinct already
      // ignores NULL sources, and the isNotNull guard below matches the
      // a-side strictness). LEFT join: a NULL-text doc (NULL md5)
      // matches nothing on hh — the oracle's LEFT JOIN still counts it
      // in n_docs, an inner join would silently drop it
      val nsrc = h.groupBy("hh").agg(countDistinct(col("source")).as("nsrc"))
      h.join(nsrc, Seq("hh"), "left")
        .groupBy("source")
        .agg(count(lit(1)).as("n_docs"),
          sum(when(col("source").isNotNull && col("nsrc") >= 2, 1L)
            .otherwise(0L)).as("n_contaminated"))
    })

  // --- Engine-portable MinHash-LSH (q99) -------------------------------
  // The q51/q52 family uses xxhash64 — fast, but engine-internal, so those
  // queries can only be rows-only checked. This variant builds the WHOLE
  // MinHash-LSH pipeline from exact modular arithmetic every engine
  // reproduces bit-identically (same contract as q98's portable
  // fingerprint): gram hash = polynomial codepoint fold mod 1e9+7, k
  // universal hashes (a_i*h + b_i) mod p, bands folded to one digest.
  // The DuckDB oracle recomputes signatures, banding, the band self-join,
  // and the per-doc partner summary — the first dedup query where the
  // driver hash-checks the END-TO-END near-dup result, not just row
  // counts. Same scale shape as q52: the only data-sized shuffle carries
  // (band, digest, doc_id).
  /** The CTE chain up to `bandrows` (tokens → grams → gram hashes →
    * signature → band digests) — the shared prefix of every portable
    * MinHash oracle. */
  private[graft] def portableBandrowsCtes: String = {
    val mhs = (0 until PortK).map(i =>
      s"CASE WHEN len(hs) = 0 THEN NULL ELSE list_min(list_transform(hs, " +
        s"h -> (h * ${portA(i)} + ${portB(i)}) % $PortP)) END AS mh$i").mkString(",\n        ")
    val bandSelects = (0 until PortBands).map { j =>
      val (m0, m1, m2) = (s"mh${3 * j}", s"mh${3 * j + 1}", s"mh${3 * j + 2}")
      s"SELECT doc_id, $j AS band, ((($m0 * $PortMul + $m1) % $PortP) * $PortMul + $m2) % $PortP AS digest FROM sig"
    }.mkString("\n        UNION ALL ")
    s"""WITH toks AS (
       |  SELECT doc_id, list_filter(regexp_split_to_array(text, '\\s+'), x -> x <> '') AS l
       |  FROM documents),
       |grams AS (
       |  SELECT doc_id, CASE WHEN len(l) < 3 THEN CAST([] AS VARCHAR[])
       |         ELSE list_distinct([list_aggregate(l[i:i+2], 'string_agg', ' ')
       |                             FOR i IN range(1, len(l) - 1)]) END AS gs
       |  FROM toks),
       |gh AS (
       |  SELECT doc_id, list_transform(gs, g ->
       |    list_reduce(list_prepend(CAST(0 AS BIGINT),
       |      list_transform(string_split(g, ''), c -> CAST(unicode(c) AS BIGINT))),
       |      (a, b) -> (a * 131 + b) % $PortP)) AS hs
       |  FROM grams),
       |sig AS (SELECT doc_id,
       |        $mhs
       |        FROM gh),
       |bandrows AS (
       |        $bandSelects)""".stripMargin
  }

  /** SQL for the agreeing-minhash count between two sig-table aliases. */
  private[graft] def matchSumSql(a: String, b: String): String =
    (0 until PortK).map(i =>
      s"CASE WHEN $a.mh$i = $b.mh$i THEN 1 ELSE 0 END").mkString(" + ")

  /** The `WITH ... pairs` CTE chain of the portable MinHash-LSH oracle —
    * shared by q99 and the cluster-canonicalization oracle (q129), which
    * must agree on the candidate-pair set by construction. */
  private[graft] def portablePairsCtes: String =
    s"""$portableBandrowsCtes,
       |pairs AS (
       |  SELECT DISTINCT a.doc_id AS ia, b.doc_id AS ib
       |  FROM bandrows a JOIN bandrows b
       |    ON a.band = b.band AND a.digest = b.digest AND a.doc_id < b.doc_id)""".stripMargin

  private def portableMinhashOracleSql: String = {
    s"""$portablePairsCtes,
       |partners AS (
       |  SELECT doc_id, CAST(count(*) AS BIGINT) AS n_partners, min(p) AS min_partner
       |  FROM (SELECT ia AS doc_id, ib AS p FROM pairs
       |        UNION ALL SELECT ib AS doc_id, ia AS p FROM pairs)
       |  GROUP BY doc_id)
       |SELECT d.doc_id, COALESCE(n_partners, CAST(0 AS BIGINT)) AS n_partners, min_partner
       |FROM documents d LEFT JOIN partners USING (doc_id)""".stripMargin
  }

  /** The k portable minhash columns for a text column (mh0..mh{k-1});
    * empty gram set → NULL, matching the oracle's CASE. Native fused
    * kernel: one codegen'd pass per doc (the sig expression is CSE'd
    * across the k element_at's); the HOF twin below is the differential
    * spec. Exposed for the invariants spec.
    */
  def portableMinhashCols(text: Column): Seq[Column] = {
    val sig = portableMinhashSigNative(text, 3, PortK)
    (0 until PortK).map { i =>
      val v = element_at(sig, i + 1)
      when(v === PortP, lit(null).cast("long")).otherwise(v).as(s"mh$i")
    }
  }

  /** Interpreted higher-order-function formulation of the same math —
    * the executable spec [[portableMinhashCols]]'s kernel is
    * differential-tested against. Too slow for the corpus path (the k
    * streams each re-evaluate the gram-hash chain). */
  def portableMinhashColsHof(text: Column): Seq[Column] = {
    val hs = transform(array_distinct(wordNgrams(text, 3)), g => portableStringHash(g))
    (0 until PortK).map { i =>
      array_min(transform(hs, h => (h * portA(i) + portB(i)) % PortP)).as(s"mh$i")
    }
  }

  /** Band digests from the mh columns: PortBands values, each folding its
    * r consecutive minhashes with the q98 fingerprint constants. */
  def portableBandDigests(sigRow: Int => Column): Seq[Column] =
    (0 until PortBands).map { j =>
      val (m0, m1, m2) = (sigRow(3 * j), sigRow(3 * j + 1), sigRow(3 * j + 2))
      (((m0 * PortMul + m1) % PortP) * PortMul + m2) % PortP
    }

  /** Candidate near-dup pairs (ia < ib) from the portable MinHash-LSH —
    * the Spark twin of [[portablePairsCtes]]; shared by the whole pair
    * family (q52/q54/q56/q129/q139/q145/q150/q152/q153/q155/q159).
    * Reads the stored scored-pairs artifact: the candidate set is a pure
    * function of the corpus, so production computes it once at ingest —
    * consumers pay a parquet scan, never the banding join. q99 is the
    * exception on purpose: it runs [[bandingPairs]] live, proving the
    * generation PLAN (exchange-free bucketed self-join) stays right. */
  private[graft] def portablePairs(s: SparkSession, d: String): DataFrame =
    portableScoredPairs(s, d).select("ia", "ib")

  /** Candidate generation itself — the banding self-join over the stored
    * bucketed band table. The artifact build and q99 run THIS; everyone
    * else reads the resulting pair set back via [[portablePairs]]. */
  private[graft] def bandingPairs(s: SparkSession, d: String): DataFrame = {
    // the stored band table feeds BOTH sides of the banding self-join:
    // both scans carry the same (band, digest) bucketing, so candidate
    // generation is EXCHANGE-FREE — the corpus is minhashed once per
    // corpus (the store build), not once per consumer. The merge hint
    // pins the zip-into-buckets shape AQE would otherwise demote at toy
    // sizes.
    val bandrows = storedBandrows(s, d)
    val l = bandrows.select(col("band"), col("digest"), col("doc_id").as("ia"))
    val r = bandrows.select(col("band"), col("digest"), col("doc_id").as("ib"))
    l.join(r.hint("merge"), Seq("band", "digest")).filter(col("ia") < col("ib"))
      .select("ia", "ib").distinct()
  }

  /** The full-corpus (band, digest, doc_id) table as a STORED bucketed
    * artifact — the q148 contract generalized to the whole pair family:
    * signatures and band digests are a pure function of the corpus, so
    * production computes them once at ingest and every dedup query reads
    * them back; re-hashing the corpus per query is the cost the bench
    * should not pay either. Bucketed+sorted on (band, digest) with one
    * file per bucket, so the banding SELF-join in [[portablePairs]]
    * needs no Exchange on either side. Content is identical to the
    * previous inline derivation — every consumer's DuckDB oracle (which
    * recomputes from raw text) still hash-matches. */
  private def storedBandrows(s: SparkSession, d: String): DataFrame =
    graft.sources.ArtifactStore.bucketed(s, d, "bandrows",
      Seq("band", "digest"), BandIndexBuckets) {
      val sig = Tables.documents(s, d)
        .select(col("doc_id") +: portableMinhashCols(col("text")): _*)
      val digests = portableBandDigests(i => col(s"mh$i"))
      sig
        .select(col("doc_id"), posexplode(array(digests: _*)).as(Seq("band", "digest")))
        .filter(col("digest").isNotNull)
        .select(col("band"), col("digest"), col("doc_id"))
    }

  /** The portable SimHash signature table (doc_id, n, fp) as a stored
    * artifact — fingerprints are a pure function of the corpus, computed
    * at ingest in production; q53 and q100 read them back instead of
    * re-hashing every gram per query. Content identical to the inline
    * derivation, so both consumers' oracles (which recompute from raw
    * text) still hash-match. */
  private[graft] def storedSimhashSigs(s: SparkSession, d: String): DataFrame =
    graft.sources.ArtifactStore.table(s, d, "simhash") {
      Tables.documents(s, d)
        .select(col("doc_id"), portableSimhashNative(col("text"), 3, SimBits).as("sh"))
        .select(col("doc_id"), col("sh.n_grams").as("n"), col("sh.fp").as("fp"))
    }

  /** portablePairsCtes + scored(ia, ib, n_match): the agreeing-minhash
    * count per candidate pair — shared by q52 (threshold summary) and
    * q56 (cluster edges), which must agree on the edge set. */
  private[graft] def portableScoredCtes: String =
    s"""$portablePairsCtes,
       |scored AS (
       |  SELECT p.ia, p.ib, CAST(${matchSumSql("sa", "sb")} AS BIGINT) AS n_match
       |  FROM pairs p JOIN sig sa ON sa.doc_id = p.ia
       |               JOIN sig sb ON sb.doc_id = p.ib)""".stripMargin

  /** Spark twin of [[portableScoredCtes]]: candidate pairs with their
    * agreeing-minhash count, as a STORED artifact (the bandrows contract
    * one level up: the scored candidate set is a pure function of the
    * corpus, so production scores it once at ingest and every dedup /
    * cluster / split / sampling consumer reads it back — before this,
    * each of q52/q54/q56 and the six portablePairs consumers re-ran the
    * semi-join + signature recompute + two pair joins per query). The
    * build: signatures are recomputed ONLY for docs in a candidate pair
    * (broadcast semi-join BEFORE the kernel — the q54 trade: gram /
    * signature cost is O(candidates), not O(corpus), and the band
    * shuffle still carries just (band, digest, doc_id)). Content is a
    * deterministic SET (integer ids + exact match counts), so read-back
    * order differences cannot reach any consumer's output — every
    * consumer aggregates or joins on it. */
  private[graft] def portableScoredPairs(s: SparkSession, d: String): DataFrame =
    graft.sources.ArtifactStore.table(s, d, "scored_pairs") {
      // materialized once (lazily): candIds + both sides of the sig join
      val pairs = bandingPairs(s, d).localCheckpoint(false)
      val candIds = pairs.select(col("ia").as("doc_id"))
        .unionByName(pairs.select(col("ib").as("doc_id"))).distinct()
      // raw native sigs (sentinel P for gram-less docs — candidates always
      // have grams, so the sentinel never reaches the comparison). No
      // broadcast hints: candIds/pairs are candidate-sized — data-sized
      // on a duplicate-heavy corpus — so AQE decides (the q152/q155
      // rule; this is a once-per-corpus ingest job, not a query).
      val sigs = Tables.documents(s, d)
        .join(candIds, Seq("doc_id"), "left_semi")
        .select(col("doc_id"), portableMinhashSigNative(col("text"), 3, PortK).as("mh"))
        .localCheckpoint(false)
      val withA = sigs.join(pairs, col("doc_id") === col("ia"))
        .select(col("ia"), col("ib"), col("mh").as("mh_a"))
      sigs.join(withA, col("doc_id") === col("ib"))
        .select(col("ia"), col("ib"), nMatch(col("mh_a"), col("mh")).as("n_match"))
    }

  /** Agreeing-minhash count between two signature arrays — the Column
    * twin of [[matchSumSql]]. */
  private[graft] def nMatch(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => when(x === y, 1).otherwise(0)),
      lit(0), (acc, v) => acc + v).cast("long")

  /** Bucket count for the stored band index — a layout constant: at
    * 100 TB pick ~(index band-table size / target partition size) and
    * keep it a multiple across tables that join on the same keys. */
  private val BandIndexBuckets = 8

  /** The persisted index side of q148: (band, digest, idx_id) for every
    * non-batch doc, written ONCE per (JVM, sf-dir) bucketed+sorted on
    * (band, digest) via [[graft.sources.Bucketing]], then read back from
    * the catalog on every run. Repartitioning on the bucket keys before
    * the write yields one file per bucket, so the read-back scan is
    * pre-sorted as well as pre-partitioned — the banding join needs
    * neither an Exchange nor (single-file buckets) a Sort on this side.
    * The table content is a pure function of the sf-dir (the same
    * expressions as the previous inline form), so q148's result is
    * bit-identical to recomputing and the DuckDB oracle is unchanged.
    * Files live under the system tmpdir and are removed at JVM exit
    * (the in-memory catalog entry dies with the JVM anyway). */
  private[graft] def storedBandIndex(s: SparkSession, d: String): DataFrame =
    graft.sources.ArtifactStore.bucketed(s, d, "band_index",
      Seq("band", "digest"), BandIndexBuckets) {
      val sig = Tables.documents(s, d).filter(col("doc_id") % 5 =!= 0)
        .select(col("doc_id") +: portableMinhashCols(col("text")): _*)
      val digests = portableBandDigests(i => col(s"mh$i"))
      sig
        .select(col("doc_id").as("idx_id"),
          posexplode(array(digests: _*)).as(Seq("band", "digest")))
        .filter(col("digest").isNotNull)
        .select(col("band"), col("digest"), col("idx_id"))
    }

  /** The banding join of q148 (batch bands → stored index), exposed
    * separately so PlanCheck can audit the exchange-free bucketed index
    * side on the join's own DataFrame (in q148's final plan the join
    * sits inside a BroadcastExchange build subtree). Batch bands are
    * computed from the NEW docs only: the increment never scans the
    * index corpus's text. */
  private[graft] def q148BandingJoin(s: SparkSession, d: String): DataFrame = {
    val idx = storedBandIndex(s, d)
    val sigB = Tables.documents(s, d).filter(col("doc_id") % 5 === 0)
      .select(col("doc_id") +: portableMinhashCols(col("text")): _*)
    val digests = portableBandDigests(i => col(s"mh$i"))
    val batch = sigB
      .select(col("doc_id").as("new_id"),
        posexplode(array(digests: _*)).as(Seq("band", "digest")))
      .filter(col("digest").isNotNull)
      .select(col("band"), col("digest"), col("new_id"))
    batch.join(idx.hint("merge"), Seq("band", "digest"))
      .select("new_id", "idx_id").distinct()
  }

  /** Incremental (cross-corpus) near-dup admission — THE dedup shape a
    * growing 100-TB corpus actually runs day to day: a NEW batch (every
    * 5th doc_id here — the deterministic stand-in for today's crawl) is
    * checked against the EXISTING index (the rest), never against
    * itself. Asymmetric banding join, with the stored-index claim
    * MECHANICAL (not a comment): the index's (band, digest, idx_id)
    * table is built ONCE per (JVM, sf-dir) by [[storedBandIndex]] and
    * persisted bucketed+sorted on (band, digest) — every q148 run reads
    * it back, so the banding join's index side is a bucketed scan with
    * NO Exchange (PlanCheck tree-asserts this; the merge hint pins the
    * zip-into-buckets shape AQE would otherwise demote at toy sizes).
    * Each increment pays signatures + shuffle for the BATCH only — the
    * index never re-hashes, never re-shuffles, and batch×batch /
    * index×index pairs are never generated. Verification recomputes
    * signatures just for candidate pairs (q54's trade). Output is the
    * admission decision per new doc; HASH-MATCHED end to end.
    */
  val q148 = QueryDef.oracle("q148_incremental_dedup", {
    s"""$portableBandrowsCtes,
       |cand AS (
       |  SELECT DISTINCT b.doc_id AS new_id, a.doc_id AS idx_id
       |  FROM bandrows b JOIN bandrows a
       |    ON b.band = a.band AND b.digest = a.digest
       |  WHERE b.doc_id % 5 = 0 AND a.doc_id % 5 <> 0),
       |scored AS (
       |  SELECT c.new_id, c.idx_id, CAST(${matchSumSql("sa", "sb")} AS BIGINT) AS n_match
       |  FROM cand c JOIN sig sa ON sa.doc_id = c.new_id
       |              JOIN sig sb ON sb.doc_id = c.idx_id),
       |kept AS (SELECT * FROM scored WHERE n_match >= $PortMatchMin),
       |per AS (
       |  SELECT new_id, CAST(count(*) AS BIGINT) AS n_index_partners,
       |         min(idx_id) AS best_index_partner, max(n_match) AS best_match
       |  FROM kept GROUP BY new_id)
       |SELECT d.doc_id, COALESCE(n_index_partners, CAST(0 AS BIGINT)) AS n_index_partners,
       |       best_index_partner, best_match / $PortK.0 AS best_jaccard,
       |       best_match IS NULL AS admitted
       |FROM documents d LEFT JOIN per ON per.new_id = d.doc_id
       |WHERE d.doc_id % 5 = 0""".stripMargin})(
    (s, d) => {
      val docs = Tables.documents(s, d)
      val isNew = col("doc_id") % 5 === 0
      // Candidate pairs consumed ONCE (inside the broadcast build below),
      // so no checkpoint is needed and the whole query is 3 jobs:
      // broadcast(cand) → broadcast(withNew) → final. The previous form
      // (checkpoint cand, distinct candIds, checkpoint a shared sig
      // table, 3 broadcasts) ran ~6 jobs and double-checkpointed — at
      // toy scale that made the benched time GC/job-launch-noise bound
      // (observed 0.82–2.12 s for identical plans, round-9 adjudication
      // in BASELINE.md). Signatures are recomputed per PAIR side here
      // instead of per candidate DOC; candidates are collision pairs of
      // a 4-band LSH, so the duplicate-rate-bounded pair count keeps
      // that trade linear (same reasoning as q54's verify stage).
      val cand = q148BandingJoin(s, d)
      val withNew = docs
        .join(broadcast(cand), col("doc_id") === col("new_id"))
        .select(col("new_id"), col("idx_id"),
          portableMinhashSigNative(col("text"), 3, PortK).as("mh_new"))
      val kept = docs
        .join(broadcast(withNew), col("doc_id") === col("idx_id"))
        .select(col("new_id"), col("idx_id"),
          nMatch(col("mh_new"),
            portableMinhashSigNative(col("text"), 3, PortK)).as("n_match"))
        .filter(col("n_match") >= PortMatchMin)
      val per = kept.groupBy("new_id")
        .agg(count(lit(1)).as("n_index_partners"),
          min("idx_id").as("best_index_partner"),
          max("n_match").as("best_match"))
      docs.filter(isNew).select(col("doc_id"))
        .join(per, col("doc_id") === col("new_id"), "left")
        .select(col("doc_id"),
          coalesce(col("n_index_partners"), lit(0L)).as("n_index_partners"),
          col("best_index_partner"),
          (col("best_match") / lit(PortK.toDouble)).as("best_jaccard"),
          col("best_match").isNull.as("admitted"))
    })

  val q99 = QueryDef.oracle("q99_portable_minhash_pairs", portableMinhashOracleSql)(
    (s, d) => {
      val docs = Tables.documents(s, d)
      // LIVE banding join on purpose (not the stored pair artifact):
      // q99 is the plan-proof query — PlanCheck asserts candidate
      // generation stays an exchange-free bucketed self-join here
      val pairs = bandingPairs(s, d)
      val partners = pairs.select(col("ia").as("doc_id"), col("ib").as("p"))
        .unionByName(pairs.select(col("ib").as("doc_id"), col("ia").as("p")))
        .groupBy("doc_id")
        .agg(count(lit(1)).as("n_partners"), min(col("p")).as("min_partner"))
      docs.select("doc_id").join(partners, Seq("doc_id"), "left")
        .select(col("doc_id"),
          coalesce(col("n_partners"), lit(0L)).as("n_partners"),
          col("min_partner"))
    })

  // --- Engine-portable SimHash (q100) ----------------------------------
  // q53's SimHash uses xxhash64 (rows-only); this variant derives a
  // 24-bit SimHash from the SAME portable gram hashes as q99 — bit t of
  // the fingerprint is the majority vote of bit t across the doc's gram
  // hashes — then runs the classic pigeonhole: hamming ≤ 3 over 3 byte
  // blocks means ≥1 block matches exactly, so candidates come from a
  // keyed equi-join on (block, value) and only candidates pay the
  // bit_count(xor) verify. Fully hash-matched in DuckDB, end to end.
  /** Shared CTE chain of the portable SimHash family — sig(doc_id, n, fp)
    * and pairs(ia, ib, hamming ≤ SimBlocks). Consumed by q53 (near-dup
    * summary with hamming distances) and q100 (partner identity), which
    * therefore agree on the pair set by construction. */
  private def portableSimhashCtes: String = {
    val fpSum = (0 until SimBits).map(t =>
      s"CASE WHEN 2 * len(list_filter(hs, h -> ((h >> $t) & 1) = 1)) > len(hs) " +
        s"THEN CAST(${1L << t} AS BIGINT) ELSE CAST(0 AS BIGINT) END").mkString(" + ")
    val blockSelects = (0 until SimBlocks).map(b =>
      s"SELECT doc_id, fp, $b AS blk, (fp >> ${8 * b}) & 255 AS val FROM sig WHERE n > 0")
      .mkString("\n        UNION ALL ")
    s"""WITH toks AS (
       |  SELECT doc_id, list_filter(regexp_split_to_array(text, '\\s+'), x -> x <> '') AS l
       |  FROM documents),
       |grams AS (
       |  SELECT doc_id, CASE WHEN len(l) < 3 THEN CAST([] AS VARCHAR[])
       |         ELSE list_distinct([list_aggregate(l[i:i+2], 'string_agg', ' ')
       |                             FOR i IN range(1, len(l) - 1)]) END AS gs
       |  FROM toks),
       |gh AS (
       |  SELECT doc_id, list_transform(gs, g ->
       |    list_reduce(list_prepend(CAST(0 AS BIGINT),
       |      list_transform(string_split(g, ''), c -> CAST(unicode(c) AS BIGINT))),
       |      (a, b) -> (a * 131 + b) % $PortP)) AS hs
       |  FROM grams),
       |sig AS (SELECT doc_id, len(hs) AS n, $fpSum AS fp FROM gh),
       |blocks AS (
       |        $blockSelects),
       |pairs AS (
       |  SELECT ia, ib, CAST(bit_count(xor(fa, fb)) AS BIGINT) AS hamming FROM (
       |    SELECT DISTINCT a.doc_id AS ia, a.fp AS fa, b.doc_id AS ib, b.fp AS fb
       |    FROM blocks a JOIN blocks b
       |      ON a.blk = b.blk AND a.val = b.val AND a.doc_id < b.doc_id)
       |  WHERE bit_count(xor(fa, fb)) <= $SimBlocks)""".stripMargin
  }

  private def portableSimhashOracleSql: String = {
    s"""$portableSimhashCtes,
       |partners AS (
       |  SELECT doc_id, CAST(count(*) AS BIGINT) AS n_partners, min(p) AS min_partner
       |  FROM (SELECT ia AS doc_id, ib AS p FROM pairs
       |        UNION ALL SELECT ib AS doc_id, ia AS p FROM pairs)
       |  GROUP BY doc_id)
       |SELECT d.doc_id, s.fp AS simhash24,
       |       COALESCE(n_partners, CAST(0 AS BIGINT)) AS n_partners, min_partner
       |FROM documents d
       |LEFT JOIN sig s USING (doc_id)
       |LEFT JOIN partners USING (doc_id)""".stripMargin
  }

  /** Portable 24-bit SimHash from a gram-hash array column — the HOF
    * differential reference for the native kernel. */
  def portableSimhashHof(hs: Column): Column =
    (0 until SimBits).map { t =>
      when(lit(2) * size(filter(hs, h => shiftright(h, t).bitwiseAND(lit(1L)) === 1))
        > size(hs), lit(1L << t)).otherwise(lit(0L))
    }.reduce(_ + _)

  val q100 = QueryDef.oracle("q100_portable_simhash", portableSimhashOracleSql)(
    (s, d) => {
      val docs = Tables.documents(s, d)
      val sigDf = storedSimhashSigs(s, d) // fingerprints read back, not re-hashed
      val blocks = sigDf.filter(col("n") > 0)
        .select(col("doc_id"), col("fp"),
          posexplode(array((0 until SimBlocks).map(b =>
            shiftright(col("fp"), 8 * b).bitwiseAND(lit(255L))): _*)).as(Seq("blk", "val")))
      val a = blocks.select(col("blk"), col("val"), col("doc_id").as("ia"), col("fp").as("fa"))
      val b = blocks.select(col("blk"), col("val"), col("doc_id").as("ib"), col("fp").as("fb"))
      val pairs = a.join(b, Seq("blk", "val")).filter(col("ia") < col("ib"))
        .select("ia", "fa", "ib", "fb").distinct()
        .filter(bit_count(col("fa").bitwiseXOR(col("fb"))) <= SimBlocks)
        .select("ia", "ib")
      val partners = pairs.select(col("ia").as("doc_id"), col("ib").as("p"))
        .unionByName(pairs.select(col("ib").as("doc_id"), col("ia").as("p")))
        .groupBy("doc_id")
        .agg(count(lit(1)).as("n_partners"), min(col("p")).as("min_partner"))
      docs.select("doc_id")
        .join(sigDf.select(col("doc_id"), col("fp").as("simhash24")), Seq("doc_id"), "left")
        .join(partners, Seq("doc_id"), "left")
        .select(col("doc_id"), col("simhash24"),
          coalesce(col("n_partners"), lit(0L)).as("n_partners"),
          col("min_partner"))
    })

  /** Per-source dedup-rate intake report — the first dashboard a
    * multi-source corpus owner reads: per source, how many documents are
    * byte-exact redundant copies (md5 group non-keepers, q50's
    * semantics) and how many have at least one near-dup partner
    * anywhere in the corpus (q99's portable pair set — shared code and
    * CTEs, so this report and the dedup queries cannot disagree).
    * Rates are a single division of exact counts, rounded — HASH-
    * MATCHED. Scale: two keyed shuffles (md5 groups, source rollup);
    * the partnered-id set is candidate-sized — id-only, but on a
    * duplicate-heavy corpus that is data-sized, so it is NOT hinted
    * onto a broadcast: AQE broadcasts it when the candidate set is
    * actually small and shuffles it when it isn't (the q155 rule —
    * a forced hint must prove its side is bounded; this one can't). */
  val q152 = QueryDef.oracle("q152_source_dedup_report", {
    s"""$portablePairsCtes,
       |partnered AS (SELECT DISTINCT doc_id FROM (
       |  SELECT ia AS doc_id FROM pairs UNION ALL SELECT ib AS doc_id FROM pairs)),
       |h AS (SELECT doc_id, source, md5(text) AS hh FROM documents),
       |g AS (SELECT hh, min(doc_id) AS keeper FROM h GROUP BY hh),
       |per AS (SELECT h.source,
       |          CAST(count(*) AS BIGINT) AS n_docs,
       |          CAST(count(*) FILTER (WHERE h.doc_id <> g.keeper) AS BIGINT) AS n_exact_drops,
       |          CAST(count(p.doc_id) AS BIGINT) AS n_near_dup_docs
       |        FROM h JOIN g USING (hh)
       |        LEFT JOIN partnered p ON p.doc_id = h.doc_id
       |        GROUP BY h.source)
       |SELECT source, n_docs, n_exact_drops, n_near_dup_docs,
       |       round(n_exact_drops / CAST(n_docs AS DOUBLE), 4) AS exact_drop_rate,
       |       round(n_near_dup_docs / CAST(n_docs AS DOUBLE), 4) AS near_dup_rate
       |FROM per""".stripMargin})(
    (s, d) => {
      val pairs = portablePairs(s, d)
      val partnered = pairs.select(col("ia").as("doc_id"))
        .unionByName(pairs.select(col("ib").as("doc_id"))).distinct()
        .withColumn("p", lit(1))
      val h = Tables.documents(s, d)
        .select(col("doc_id"), col("source"), md5(col("text")).as("hh"))
      val g = h.groupBy("hh").agg(min("doc_id").as("keeper"))
      val per = h.join(g, "hh")
        .join(partnered, Seq("doc_id"), "left")
        .groupBy("source")
        .agg(count(lit(1)).as("n_docs"),
          count(when(col("doc_id") =!= col("keeper"), 1)).as("n_exact_drops"),
          count(col("p")).as("n_near_dup_docs"))
      per.select(col("source"), col("n_docs"), col("n_exact_drops"), col("n_near_dup_docs"),
        round(col("n_exact_drops") / col("n_docs").cast("double"), 4).as("exact_drop_rate"),
        round(col("n_near_dup_docs") / col("n_docs").cast("double"), 4).as("near_dup_rate"))
    })

  /** Cross-source overlap matrix — q152's companion: q152 says how
    * duplicated each source is; THIS says which sources duplicate WHICH
    * — the contamination-graph view a corpus owner reads before
    * deciding what to crawl less of (and the between-sources leg of
    * eval-set decontamination: a benchmark source overlapping a train
    * source is the leak). One row per unordered source pair (src_a ≤
    * src_b) with the near-dup pair count between them, split into
    * within-source and cross-source, plus the distinct docs involved on
    * each side. Same portable pair set as q99/q152 (shared code and
    * CTEs — the matrix cannot disagree with the dedup queries). Scale:
    * the pair set joins the (doc_id, source) map twice — two keyed
    * shuffles of id pairs, never text; the matrix itself is
    * |sources|²-bounded. HASH-MATCHED.
    */
  val q159 = QueryDef.oracle("q159_source_overlap_matrix", {
    s"""$portablePairsCtes,
       |src AS (SELECT doc_id, source FROM documents),
       |lab AS (
       |  SELECT least(a.source, b.source) AS src_a,
       |         greatest(a.source, b.source) AS src_b,
       |         CASE WHEN a.source <= b.source THEN p.ia ELSE p.ib END AS doc_a,
       |         CASE WHEN a.source <= b.source THEN p.ib ELSE p.ia END AS doc_b
       |  FROM pairs p JOIN src a ON a.doc_id = p.ia
       |               JOIN src b ON b.doc_id = p.ib)
       |SELECT src_a, src_b,
       |       CAST(count(*) AS BIGINT) AS n_pairs,
       |       src_a = src_b AS within_source,
       |       CAST(count(DISTINCT doc_a) AS BIGINT) AS n_docs_a,
       |       CAST(count(DISTINCT doc_b) AS BIGINT) AS n_docs_b
       |FROM lab GROUP BY src_a, src_b""".stripMargin})(
    (s, d) => {
      val pairs = portablePairs(s, d)
      val src = Tables.documents(s, d).select(col("doc_id"), col("source"))
      // doc_a/doc_b re-orient each pair to match the canonicalized
      // source order: doc_a always belongs to src_a (ia only happens to
      // be the lower DOC id — on a cross-source pair where least/
      // greatest swaps the sources, counting distinct ia under src_a
      // would count the WRONG source's doc)
      val lab = pairs
        .join(src.select(col("doc_id").as("ia"), col("source").as("sa")), Seq("ia"))
        .join(src.select(col("doc_id").as("ib"), col("source").as("sb")), Seq("ib"))
        .select(least(col("sa"), col("sb")).as("src_a"),
          greatest(col("sa"), col("sb")).as("src_b"),
          when(col("sa") <= col("sb"), col("ia")).otherwise(col("ib")).as("doc_a"),
          when(col("sa") <= col("sb"), col("ib")).otherwise(col("ia")).as("doc_b"))
      lab.groupBy("src_a", "src_b")
        .agg(count(lit(1)).as("n_pairs"),
          countDistinct("doc_a").as("n_docs_a"),
          countDistinct("doc_b").as("n_docs_b"))
        .select(col("src_a"), col("src_b"), col("n_pairs"),
          (col("src_a") === col("src_b")).as("within_source"),
          col("n_docs_a"), col("n_docs_b"))
    })

  /** Character-level verification of the near-dup candidates — the third
    * leg of the verify toolbox (q52 estimates set overlap from
    * signatures, q54 computes exact token-set Jaccard, this computes the
    * exact EDIT distance): per candidate pair, levenshtein over the raw
    * texts plus the length-normalized similarity — the measure that
    * separates "same text, light edits" from "same vocabulary, different
    * composition", which token sets cannot. Two cost bounds make it an
    * AUDIT, the shape this runs in production: (a) a deterministic
    * hash-SAMPLE of the candidate pairs (md5 nibble of "ia:ib", the q45
    * convention — 4/16 = 25%, reproducible across engines, runs, and
    * partitionings; the DP bill is bounded by the sample, not the dup
    * rate), and (b) the DP sees only the first EditCap chars of each
    * side (O(cap²) per pair instead of O(20K²) on the longest docs).
    * Texts join only for the sampled pairs — via KEYED joins, never a
    * text-carrying broadcast — and nothing but (band, digest, id) ever
    * crosses the band shuffle. Levenshtein parity with DuckDB
    * is already pinned by q59; the normalization is one division of
    * exact ints — HASH-MATCHED. */
  val q153 = QueryDef.oracle("q153_near_dup_edit_verify", {
    s"""$portablePairsCtes,
       |sampled AS (
       |  SELECT ia, ib FROM pairs
       |  WHERE substr(md5(CAST(ia AS VARCHAR) || ':' || CAST(ib AS VARCHAR)), 32, 1)
       |          IN ('0', '1', '2', '3')),
       |tx AS (SELECT doc_id, substr(text, 1, $EditCap) AS t,
       |              CAST(least(length(text), $EditCap) AS BIGINT) AS n FROM documents),
       |ed AS (SELECT p.ia, p.ib,
       |         CAST(levenshtein(a.t, b.t) AS BIGINT) AS edit_dist,
       |         a.n AS len_a, b.n AS len_b
       |       FROM sampled p JOIN tx a ON a.doc_id = p.ia
       |                      JOIN tx b ON b.doc_id = p.ib)
       |SELECT ia, ib, edit_dist, len_a, len_b,
       |       round(1.0 - edit_dist / CAST(greatest(len_a, len_b) AS DOUBLE), 6)
       |         AS edit_similarity
       |FROM ed""".stripMargin})(
    (s, d) => {
      // same candidate-restriction shape as q54: pairs are materialized
      // once, texts fetched only for docs in a SAMPLED pair
      val pairs = portablePairs(s, d)
        .filter(substring(md5(concat(col("ia").cast("string"), lit(":"),
          col("ib").cast("string"))), 32, 1).isin("0", "1", "2", "3"))
        .localCheckpoint(false)
      val candIds = pairs.select(col("ia").as("doc_id"))
        .unionByName(pairs.select(col("ib").as("doc_id"))).distinct()
      val tx = Tables.documents(s, d)
        .join(broadcast(candIds), Seq("doc_id"), "left_semi")
        .select(col("doc_id"), substring(col("text"), 1, EditCap).as("t"),
          least(length(col("text")), lit(EditCap)).cast("long").as("n"))
        .localCheckpoint(false)
      val withA = tx.join(broadcast(pairs), col("doc_id") === col("ia"))
        .select(col("ia"), col("ib"), col("t").as("ta"), col("n").as("len_a"))
      // the second text fetch is a plain keyed shuffle join: `withA`
      // carries text prefixes, and on a duplicate-heavy corpus the
      // sampled-pair set is data-sized — a text-carrying broadcast
      // would hit the broadcast ceiling exactly when the audit matters
      // most. Only the id-only `pairs` ever rides a broadcast.
      //
      // r15 optimization: the join's reduce stage is where every
      // levenshtein DP runs, and its BYTES (sampled pairs, capped
      // prefixes) are tiny while its CPU is quadratic per row — AQE's
      // byte-targeted coalescing collapsed it to ONE task (measured:
      // 1.08 s of CPU in one task at sf0.1). Explicit-N join-key
      // repartitions are user-specified partitioning: AQE never
      // coalesces them and the equi-join consumes them directly, so
      // the DP stage runs at full width with no extra exchange.
      val n = s.sparkContext.defaultParallelism
      tx.repartition(n, col("doc_id"))
        .join(withA.repartition(n, col("ib")).hint("shuffle_hash"),
          col("doc_id") === col("ib"))
        .select(col("ia"), col("ib"),
          levenshtein(col("ta"), col("t")).cast("long").as("edit_dist"),
          col("len_a"), col("n").as("len_b"))
        .withColumn("edit_similarity",
          round(lit(1.0) - col("edit_dist")
            / greatest(col("len_a"), col("len_b")).cast("double"), 6))
    })

  /** Duplicated n-gram FRACTION per document — the span-level dedup
    * metric (the RefinedWeb/Gopher-style "what share of this doc's text
    * exists elsewhere in the corpus" screen, finer than whole-doc
    * near-dup): for every POSITIONAL word 3-gram, is that gram present
    * in ≥ 2 distinct documents? Positional on purpose — the MinHash
    * family's grams are list_distinct'd (set semantics for signatures);
    * a fraction over positions is what quality filtering consumes, so
    * this deliberately does NOT share the bandrows gram fragment.
    * Output: (doc_id, n_grams, n_dup_grams, dup_fraction) — exact
    * BIGINT counts, one rounded division (q152's convention), NULL
    * fraction for gram-less docs. HASH-MATCHED.
    * Scale: the heavy honest metric — two keyed shuffles of
    * position-level rows: gram-hash partials for the distinct-doc
    * count, then the positions rejoin their counts on the same key.
    * The md5 collapses arbitrary-length gram text to fixed 32-char
    * keys BEFORE any exchange, so both shuffles carry hashes + ids
    * only, never text. In production this is an ingest-time artifact
    * like bandrows, not a per-query pass. */
  val q164 = QueryDef.oracle("q164_dup_ngram_fraction",
    """WITH toks AS (
      |  SELECT doc_id, list_filter(regexp_split_to_array(text, '\s+'), x -> x <> '') AS l
      |  FROM documents),
      |gpos AS (
      |  SELECT doc_id, unnest([list_aggregate(l[i:i+2], 'string_agg', ' ')
      |                         FOR i IN range(1, len(l) - 1)]) AS gram
      |  FROM toks WHERE len(l) >= 3),
      |g AS (SELECT doc_id, md5(gram) AS gh FROM gpos),
      |nd AS (SELECT gh, CAST(count(DISTINCT doc_id) AS BIGINT) AS nd FROM g GROUP BY 1),
      |per AS (SELECT g.doc_id,
      |          CAST(count(*) AS BIGINT) AS n_grams,
      |          CAST(count(CASE WHEN nd.nd >= 2 THEN 1 END) AS BIGINT) AS n_dup_grams
      |        FROM g JOIN nd USING (gh) GROUP BY 1)
      |SELECT d.doc_id,
      |       COALESCE(n_grams, CAST(0 AS BIGINT)) AS n_grams,
      |       COALESCE(n_dup_grams, CAST(0 AS BIGINT)) AS n_dup_grams,
      |       round(n_dup_grams / CAST(n_grams AS DOUBLE), 4) AS dup_fraction
      |FROM documents d LEFT JOIN per USING (doc_id)""".stripMargin)(
    (s, d) => {
      // `g` feeds both the distinct-doc count and the rejoin — read
      // back from the stored bucketed inventory, so BOTH uses are
      // exchange-free on the gram key (the per-query localCheckpoint
      // trade this comment used to weigh is gone: the table is built
      // once per corpus, not per query)
      val g = storedGramPositions(s, d, 3).select("doc_id", "gh")
      val nd = g.groupBy("gh").agg(countDistinct("doc_id").as("nd"))
      val per = g.join(nd, Seq("gh")) // data-sized both ways: plain keyed join
        .groupBy("doc_id")
        .agg(count(lit(1)).as("n_grams"),
          count(when(col("nd") >= 2, 1)).as("n_dup_grams"))
      Tables.documents(s, d).select(col("doc_id"))
        .join(per, Seq("doc_id"), "left")
        .select(col("doc_id"),
          coalesce(col("n_grams"), lit(0L)).as("n_grams"),
          coalesce(col("n_dup_grams"), lit(0L)).as("n_dup_grams"),
          round(col("n_dup_grams") / col("n_grams").cast("double"), 4)
            .as("dup_fraction"))
    })

  /** Stored positional gram inventory — (doc_id, pos, md5(gram)) for
    * every positional word n-gram, persisted bucketed+sorted on the
    * 32-char gram key. This is the table SCALE.md's q164 row always
    * claimed production materializes at ingest ("like bandrows") — now
    * it actually does: the gram-key aggregations run WITHOUT an
    * exchange (hashpartitioning(gh) subset-satisfies their clustering),
    * and the positions-rejoin-their-counts join is a bucket-aligned
    * self-read with no exchange on either side. Pure function of the
    * corpus, so every consumer's answer is bit-identical to recomputing
    * and the DuckDB oracles (which DO recompute from raw text) are
    * unchanged. Consumers: q164 (n=3), q175/q178/q180/q185 (n=SpanK), plus
    * the streaming span gate's index side (SpanOverlapStreamSpec). */
  private[graft] def storedGramPositions(s: SparkSession, d: String, n: Int): DataFrame =
    graft.sources.ArtifactStore.bucketed(s, d, s"gpos$n", Seq("gh"), 8) {
      Tables.documents(s, d)
        .select(col("doc_id"), posexplode(wordNgrams(col("text"), n)).as(Seq("pos", "gram")))
        .select(col("doc_id"), col("pos"), md5(col("gram")).as("gh"))
    }

  /** Window length (in word tokens) of the repeated-span detector —
    * Lee et al. 2022 ("Deduplicating Training Data Makes Language Models
    * Better") remove 50-token repeats from real corpora; 5 matches this
    * testdata's ~80-token documents. Baked into q175/q178's oracle SQL
    * at object init. */
  private[graft] val SpanK = 5

  /** Shared oracle prefix of the span family — toks + the positional
    * [[SpanK]]-gram inventory gpos(doc_id, pos, gh). ONE definition for
    * q175 (span report) and q178 (span removal), so the two queries
    * cannot disagree on tokenization or gram identity — the portable-
    * MinHash fragment convention applied here. */
  private[graft] def spanGposCtes: String = spanGposCtesAt(SpanK)

  /** The gram-grain-parameterized form of the canonical gpos chain —
    * ONE generator for every grain the engine indexes at (SpanK for the
    * q175/q178 span family, 16 for q340's window inventory), so a new
    * grain can never fork the tokenize/gram/hash definition
    * (OracleFragmentDriftSpec pins consumers per grain). */
  private[graft] def spanGposCtesAt(k: Int): String =
    s"""WITH toks AS (
       |  SELECT doc_id, list_filter(COALESCE(regexp_split_to_array(text, '\\s+'), []),
       |                             x -> x <> '') AS l
       |  FROM documents),
       |gpos AS (
       |  SELECT doc_id, unnest([{'pos': i - 1, 'gh': md5(list_aggregate(l[i:i+${k - 1}], 'string_agg', ' '))}
       |                        FOR i IN range(1, len(l) - $k + 2)]
       |                        , recursive := true)
       |  FROM toks WHERE len(l) >= $k)""".stripMargin

  /** Substring-level exact dedup — repeated-SPAN extraction (the Lee et
    * al. 2022 suffix-array pass, re-expressed bucketed): q164 reports
    * WHAT FRACTION of a doc's positional grams exist elsewhere; this
    * query reports WHERE — maximal runs of consecutive duplicated
    * [[SpanK]]-gram starts, i.e. the concrete character spans a
    * remove-repeated-substrings pass would cut. A gram is "duplicated"
    * when its text occurs ≥ 2 times ANYWHERE in the corpus (within- and
    * cross-document repeats both count, unlike q164's distinct-doc
    * test). Islands via the classic pos − row_number() trick under a
    * per-doc window. Output per doc: span count, duplicated gram count,
    * longest span (tokens), total span tokens (adjacent spans < SpanK
    * apart may overlap-count — documented upper bound), first span
    * start. HASH-MATCHED end to end.
    *
    * Scale shape (the anchor-gram alternative to a distributed suffix
    * array, which needs global order): two keyed shuffles of
    * position-level (32-char md5, id, pos) rows — gram-hash partials
    * for the occurrence count (map-side combine), positions rejoin
    * their counts on the same key — then ONE doc-keyed exchange for the
    * window; the island agg and the per-doc agg both reuse that
    * hashpartitioning(doc_id) (subset-satisfied ClusteredDistribution),
    * so they add no exchange. Text never shuffles. In production the
    * duplicated-gram inventory is an ingest-time artifact like
    * bandrows; the per-doc span pass is the only per-query work. */
  val q175 = QueryDef.oracle("q175_repeated_spans", {
    s"""$spanGposCtes,
       |rep AS (SELECT gh FROM gpos GROUP BY gh HAVING count(*) >= 2),
       |dup AS (SELECT g.doc_id, g.pos FROM gpos g JOIN rep USING (gh)),
       |isl AS (SELECT doc_id, pos,
       |               pos - row_number() OVER (PARTITION BY doc_id ORDER BY pos) AS grp
       |        FROM dup),
       |spans AS (SELECT doc_id, grp, CAST(count(*) AS BIGINT) AS n_gr,
       |                 min(pos) AS s, max(pos) AS e
       |          FROM isl GROUP BY 1, 2),
       |per AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_spans,
       |               CAST(sum(n_gr) AS BIGINT) AS n_dup_grams,
       |               CAST(max(e - s + $SpanK) AS BIGINT) AS max_span_tokens,
       |               CAST(sum(e - s + $SpanK) AS BIGINT) AS dup_tokens,
       |               CAST(min(s) AS BIGINT) AS first_dup_pos
       |        FROM spans GROUP BY 1)
       |SELECT d.doc_id, COALESCE(n_spans, CAST(0 AS BIGINT)) AS n_spans,
       |       COALESCE(n_dup_grams, CAST(0 AS BIGINT)) AS n_dup_grams,
       |       max_span_tokens, COALESCE(dup_tokens, CAST(0 AS BIGINT)) AS dup_tokens,
       |       first_dup_pos
       |FROM documents d LEFT JOIN per USING (doc_id)""".stripMargin})(
    (s, d) => {
      import org.apache.spark.sql.expressions.Window
      val docs = Tables.documents(s, d)
      val g = storedGramPositions(s, d, SpanK)
      val rep = g.groupBy("gh").agg(count(lit(1)).as("n_occ"))
        .filter(col("n_occ") >= 2).select("gh")
      val dup = g.join(rep, Seq("gh")).select("doc_id", "pos")
      val w = Window.partitionBy("doc_id").orderBy("pos")
      val isl = dup.withColumn("grp", col("pos") - row_number().over(w))
      val spans = isl.groupBy("doc_id", "grp")
        .agg(count(lit(1)).as("n_gr"), min("pos").as("s"), max("pos").as("e"))
      val per = spans.groupBy("doc_id")
        .agg(count(lit(1)).as("n_spans"),
          sum("n_gr").as("n_dup_grams"),
          max(col("e") - col("s") + SpanK).cast("long").as("max_span_tokens"),
          sum(col("e") - col("s") + SpanK).as("dup_tokens"),
          min("s").cast("long").as("first_dup_pos"))
      docs.select("doc_id").join(per, Seq("doc_id"), "left")
        .select(col("doc_id"),
          coalesce(col("n_spans"), lit(0L)).as("n_spans"),
          coalesce(col("n_dup_grams"), lit(0L)).as("n_dup_grams"),
          col("max_span_tokens"),
          coalesce(col("dup_tokens"), lit(0L)).as("dup_tokens"),
          col("first_dup_pos"))
    })

  /** Span REMOVAL — the executable form of q175: where q175 reports the
    * repeated spans, this query actually CUTS them and emits the cleaned
    * token stream's fingerprint — the Lee et al. 2022 dedup pass a
    * training pipeline runs, keep-first variant: every positional
    * [[SpanK]]-gram keeps its corpus-canonical occurrence (minimal
    * (doc_id, pos), encoded doc_id·10⁶+pos — positions are bounded by
    * document length, far under 10⁶) and every OTHER occurrence marks
    * its K token positions for removal; a token survives iff no
    * redundant gram start covers it. Cleaned text is the surviving
    * tokens joined by single spaces (whitespace-normalized on both
    * sides, so an untouched doc's fingerprint is md5 of its normalized
    * text, and a fully-duplicated doc cleans to the empty string).
    * Output: exact token counts, removal fraction, md5 fingerprint —
    * never the re-materialized text (q176's report discipline).
    * HASH-MATCHED end to end.
    *
    * Scale: q164/q175's two gram-key shuffles (md5 keys + ids, never
    * text) plus one doc-keyed collect_set of removal starts; the
    * coverage test is a per-doc HOF over (tokens × removal starts) —
    * bounded by the doc's own duplication, and the removal-start set is
    * the doc's redundant grams only. Set-vs-list is immaterial: the
    * coverage predicate is order-independent, so collect_set here and
    * list() in the oracle agree. */
  val q178 = QueryDef.oracle("q178_span_removal", {
    s"""$spanGposCtes,
       |gc AS (SELECT gh, count(*) AS n_occ, min(doc_id * 1000000 + pos) AS first_key
       |       FROM gpos GROUP BY gh),
       |red AS (SELECT g.doc_id, g.pos FROM gpos g JOIN gc USING (gh)
       |        WHERE gc.n_occ >= 2 AND g.doc_id * 1000000 + g.pos <> gc.first_key),
       |ps AS (SELECT doc_id, list(pos) AS ps FROM red GROUP BY doc_id),
       |c AS (SELECT t.doc_id, len(l) AS n_tokens,
       |        [l[i] FOR i IN range(1, len(l) + 1)
       |         IF len(list_filter(coalesce(ps, []), p -> p <= i - 1 AND i - 1 < p + $SpanK)) = 0] AS kept
       |      FROM toks t LEFT JOIN ps USING (doc_id))
       |SELECT doc_id, CAST(n_tokens AS BIGINT) AS n_tokens,
       |       CAST(n_tokens - len(kept) AS BIGINT) AS n_removed,
       |       CAST(len(kept) AS BIGINT) AS n_kept,
       |       CASE WHEN n_tokens > 0
       |            THEN round((n_tokens - len(kept)) / CAST(n_tokens AS DOUBLE), 4) END AS removed_frac,
       |       md5(COALESCE(list_aggregate(kept, 'string_agg', ' '), '')) AS cleaned_fp
       |FROM c""".stripMargin})(
    (s, d) => {
      val docs = Tables.documents(s, d)
      val g = storedGramPositions(s, d, SpanK)
      val gc = g.groupBy("gh").agg(count(lit(1)).as("n_occ"),
        min(col("doc_id") * 1000000 + col("pos")).as("first_key"))
      val red = g.join(gc, Seq("gh"))
        .filter(col("n_occ") >= 2 &&
          col("doc_id") * 1000000 + col("pos") =!= col("first_key"))
        .select("doc_id", "pos")
      val ps = red.groupBy("doc_id").agg(collect_set("pos").as("ps"))
      val kSpan = SpanK // stable identifier for the lambda closure
      // NULL text ⇒ empty token list on BOTH sides (oracle COALESCEs the
      // split): a NULL-text doc cleans to md5(''), never a NULL fingerprint
      docs.select(col("doc_id"),
        coalesce(graft.functions.TextFunctions.tokens(col("text")),
          array().cast("array<string>")).as("l"))
        .join(ps, Seq("doc_id"), "left")
        .select(col("doc_id"), col("l"),
          coalesce(col("ps"), array().cast("array<int>")).as("ps"))
        .select(col("doc_id"), col("l"),
          filter(col("l"), (_, i) =>
            !exists(col("ps"), p => p <= i && i < p + kSpan)).as("kept"))
        .select(col("doc_id"),
          size(col("l")).cast("long").as("n_tokens"),
          (size(col("l")) - size(col("kept"))).cast("long").as("n_removed"),
          size(col("kept")).cast("long").as("n_kept"),
          when(size(col("l")) > 0,
            round((size(col("l")) - size(col("kept")))
              / size(col("l")).cast("double"), 4)).as("removed_frac"),
          md5(array_join(col("kept"), " ")).as("cleaned_fp"))
    })

  /** Incremental SPAN overlap — the substring leg of the day-2 intake
    * gate, completing the incremental family (q148 asks "is today's doc
    * a near-duplicate of the index?"; this asks "how much of today's
    * doc's TEXT already exists in the index, verbatim?" — the question
    * that catches boilerplate-stuffed and template-heavy crawl arrivals
    * whole-doc MinHash misses): for each NEW doc (doc_id % 5 = 0, the
    * q148 convention), the fraction of its tokens covered by a
    * [[SpanK]]-gram that occurs ANYWHERE in the index corpus, via
    * q178's coverage machinery pointed across the corpus split.
    * `flagged` is the exact integer test overlap·2 ≥ n_tokens (≥ half
    * the doc is index text). HASH-MATCHED end to end.
    *
    * Scale: both gram sides read the stored `gpos` artifact — the index
    * gram SET distinct-aggregates on the bucketed gram key and the
    * batch positions semi-join it, both exchange-free bucket-aligned
    * reads; the only data shuffle is the batch-doc-keyed collect of hit
    * positions. The increment never re-reads index TEXT. */
  val q180 = QueryDef.oracle("q180_incremental_span_overlap", {
    s"""$spanGposCtes,
       |idx AS (SELECT DISTINCT gh FROM gpos WHERE doc_id % 5 <> 0),
       |hit AS (SELECT g.doc_id, g.pos FROM gpos g JOIN idx USING (gh)
       |        WHERE g.doc_id % 5 = 0),
       |ps AS (SELECT doc_id, list(pos) AS ps FROM hit GROUP BY doc_id),
       |c AS (SELECT t.doc_id, len(l) AS n_tokens,
       |        len([i FOR i IN range(1, len(l) + 1)
       |             IF len(list_filter(coalesce(ps, []), p -> p <= i - 1 AND i - 1 < p + $SpanK)) > 0]) AS ov
       |      FROM toks t LEFT JOIN ps USING (doc_id)
       |      WHERE t.doc_id % 5 = 0)
       |SELECT doc_id, CAST(n_tokens AS BIGINT) AS n_tokens,
       |       CAST(ov AS BIGINT) AS overlap_tokens,
       |       CASE WHEN n_tokens > 0 THEN round(ov / CAST(n_tokens AS DOUBLE), 4) END AS overlap_frac,
       |       CASE WHEN n_tokens > 0 THEN ov * 2 >= n_tokens ELSE FALSE END AS flagged
       |FROM c""".stripMargin})(
    (s, d) => {
      val g = storedGramPositions(s, d, SpanK)
      val isNew = col("doc_id") % 5 === 0
      val idx = g.filter(!isNew).select("gh").distinct()
      val hit = g.filter(isNew).join(idx, Seq("gh"), "left_semi")
        .select("doc_id", "pos")
      val ps = hit.groupBy("doc_id").agg(collect_set("pos").as("ps"))
      val kSpan = SpanK
      Tables.documents(s, d).filter(isNew)
        .select(col("doc_id"),
          coalesce(tokens(col("text")), array().cast("array<string>")).as("l"))
        .join(ps, Seq("doc_id"), "left")
        .select(col("doc_id"), col("l"),
          coalesce(col("ps"), array().cast("array<int>")).as("ps"))
        .select(col("doc_id"), size(col("l")).as("n_tokens"),
          size(filter(col("l"), (_, i) =>
            exists(col("ps"), p => p <= i && i < p + kSpan))).as("ov"))
        .select(col("doc_id"),
          col("n_tokens").cast("long").as("n_tokens"),
          col("ov").cast("long").as("overlap_tokens"),
          when(col("n_tokens") > 0,
            round(col("ov") / col("n_tokens").cast("double"), 4)).as("overlap_frac"),
          coalesce(when(col("n_tokens") > 0, col("ov") * 2 >= col("n_tokens")),
            lit(false)).as("flagged"))
    })

  /** Winnowing window width (in gram positions) and the stop-fingerprint
    * cap, baked into q185's oracle at object init. w=4 over the SpanK=5
    * gram inventory gives the Schleimer guarantee: any shared substring
    * of ≥ w + SpanK − 1 = 8 tokens produces at least one shared
    * fingerprint. */
  private[graft] val WinnowW = 4
  private[graft] val WinnowStop = 50

  /** Winnowing fingerprints (Schleimer, Wilkerson & Aiken 2003 — the
    * MOSS local document fingerprinting): over each document's
    * positional [[SpanK]]-gram hashes, slide a [[WinnowW]]-position
    * window and select the minimum hash (rightmost occurrence on ties —
    * ROBUST winnowing, so near-identical docs select the same
    * positions); the distinct selected hashes are the document's
    * fingerprints, and documents sharing ≥ 2 fingerprints are match
    * candidates. Position-ROBUST where MinHash is permutation-random:
    * winnowing guarantees every shared run of ≥ WinnowW+SpanK−1 tokens
    * yields a shared fingerprint, which is the plagiarism/quote
    * detector's contract, not a similarity estimate. Fingerprints
    * selected by > [[WinnowStop]] documents are dropped as boilerplate
    * BEFORE pairing (MOSS's "ignore matches in too many documents"),
    * which is also the 100-TB bound: the fingerprint-keyed pair join
    * fans out at most WinnowStop² per fingerprint, never a dup-class
    * square. The windowing itself is a constant ×WinnowW position
    * explode feeding a map-side-combinable min(long) hash aggregate
    * (fingerprint identity = the portable numeric fold of the stored
    * md5 key, so selection, boilerplate cap, and pair join all run on
    * 8-byte keys; the pos tiebreak rides the packed low 24 bits —
    * positions per doc are bounded far below 2²⁴). Reads the stored
    * gpos[[SpanK]] inventory (one gram scan per corpus, shared with
    * q175/q178/q180).
    */
  val q185 = QueryDef.oracle("q185_winnowing_fingerprints", {
    // fingerprint key = the portable codepoint fold of the md5 hex
    // string (CpHashUnicodeSpec pins the cross-engine fold): an 8-byte
    // numeric key, so the winnow selection is min() of ONE packed long
    // — gq·2²⁴ + (2²⁴−1−pos) is "smallest hash, rightmost position on
    // ties" (robust winnowing) as an UnsafeRow-mutable hash-agg buffer
    // instead of a per-(doc, window) string sort
    s"""$spanGposCtes,
       |gp AS (SELECT doc_id, pos,
       |              list_reduce(list_prepend(CAST(0 AS BIGINT),
       |                list_transform(string_split(gh, ''),
       |                  c -> CAST(unicode(c) AS BIGINT))),
       |                (a, b) -> (a * 131 + b) % $PortP) AS gq,
       |              CAST(count(*) OVER (PARTITION BY doc_id) AS BIGINT) AS np
       |       FROM gpos),
       |cells AS (SELECT doc_id, gq * 16777216 + (16777215 - pos) AS packed,
       |                 unnest(range(greatest(pos - ${WinnowW - 1}, 0),
       |                              least(pos, greatest(np - $WinnowW, 0)) + 1)) AS s
       |          FROM gp),
       |win AS (SELECT doc_id, MIN(packed) // 16777216 AS gq
       |        FROM cells GROUP BY doc_id, s),
       |fp AS (SELECT DISTINCT doc_id, gq FROM win),
       |keep AS (SELECT gq FROM fp GROUP BY gq
       |         HAVING count(*) BETWEEN 2 AND $WinnowStop)
       |SELECT a.doc_id AS ia, b.doc_id AS ib, CAST(count(*) AS BIGINT) AS n_shared
       |FROM fp a JOIN keep USING (gq) JOIN fp b USING (gq)
       |WHERE a.doc_id < b.doc_id
       |GROUP BY 1, 2
       |HAVING count(*) >= 2""".stripMargin})(
    (s, d) => {
      import org.apache.spark.sql.expressions.Window
      import graft.functions.HashFunctions.portableCpHashNative
      val g = storedGramPositions(s, d, SpanK)
      // per-window winner as a pure-LONG hash aggregate, not a
      // row_number window: the previous shape sorted the ×WinnowW-
      // exploded inventory by the 32-char md5 string inside every
      // shuffle partition; min(packed) partials combine map-side and
      // the buffer is one mutable long (a string/struct min buffer
      // would demote the whole agg to SortAggregate)
      val gp = g.select(col("doc_id"), col("pos"),
          portableCpHashNative(col("gh")).as("gq"))
        .withColumn("np",
          count(lit(1)).over(Window.partitionBy("doc_id")).cast("int"))
      val cells = gp.select(col("doc_id"),
        (col("gq") * lit(16777216L) + (lit(16777215) - col("pos"))).as("packed"),
        explode(sequence(greatest(col("pos") - (WinnowW - 1), lit(0)),
          least(col("pos"), greatest(col("np") - WinnowW, lit(0))))).as("s"))
      val win = cells.groupBy(col("doc_id"), col("s"))
        .agg(min("packed").as("mp"))
        .select(col("doc_id"), expr("mp div 16777216").as("gq"))
      val fp = win.select("doc_id", "gq").distinct()
      val keep = fp.groupBy("gq").agg(count(lit(1)).as("nd"))
        .filter(col("nd").between(2, WinnowStop)).select("gq")
      fp.join(keep, Seq("gq"))
        .join(fp.select(col("doc_id").as("ib"), col("gq")), Seq("gq"))
        .filter(col("doc_id") < col("ib"))
        .groupBy(col("doc_id").as("ia"), col("ib"))
        .agg(count(lit(1)).as("n_shared"))
        .filter(col("n_shared") >= 2)
    })

  /** Deterministic integer PageRank over the near-dup pair graph — the
    * ITERATION family beyond q56's fixpoint closure: q56 says which
    * docs form a cluster, this ranks HOW CENTRAL each doc is inside its
    * neighborhood (the "canonical hub" signal a keep-the-best dedup can
    * weight by, next to q181's quality rule). Graph = q56's exact edge
    * set (stored scored_pairs, n_match ≥ [[PortMatchMin]]), undirected.
    * Three damped iterations in PURE INTEGERS: contribution =
    * rank div degree (floor), new rank = 150000 + (85·Σ) div 100 —
    * the floors cost ≤1 micro-unit per term and buy bit-identical
    * results at any partitioning, on any engine (the k-means-oracle
    * convention: the oracle unrolls the same three rounds). Scale
    * shape: per iteration, one keyed shuffle of (node, contribution)
    * partial sums — the Pregel message pattern as a DataFrame — against
    * the artifact-scan edge list; no global state, rounds are a fixed
    * constant.
    */
  val q189 = QueryDef.oracle("q189_pair_pagerank", {
    val iter = (1 to 3).map { t =>
      s"""c$t AS (SELECT ed.v AS u, CAST(SUM(r${t - 1}.r // d.deg) AS BIGINT) AS s
         |       FROM ed JOIN r${t - 1} ON r${t - 1}.u = ed.u
         |               JOIN deg d ON d.u = ed.u
         |       GROUP BY 1),
         |r$t AS (SELECT deg.u,
         |          CAST(150000 + (85 * COALESCE(c$t.s, 0)) // 100 AS BIGINT) AS r
         |        FROM deg LEFT JOIN c$t USING (u))""".stripMargin
    }.mkString(",\n")
    s"""$portableScoredCtes,
       |e AS (SELECT ia, ib FROM scored WHERE n_match >= $PortMatchMin),
       |ed AS (SELECT ia AS u, ib AS v FROM e
       |       UNION ALL SELECT ib AS u, ia AS v FROM e),
       |deg AS (SELECT u, CAST(count(*) AS BIGINT) AS deg FROM ed GROUP BY 1),
       |r0 AS (SELECT u, CAST(1000000 AS BIGINT) AS r FROM deg),
       |$iter
       |SELECT deg.u AS doc_id, deg.deg AS degree, r3.r AS rank_micro
       |FROM deg JOIN r3 USING (u)""".stripMargin})(
    (s, d) => {
      val e = portableScoredPairs(s, d).filter(col("n_match") >= PortMatchMin)
      val ed = e.select(col("ia").as("u"), col("ib").as("v"))
        .unionByName(e.select(col("ib").as("u"), col("ia").as("v")))
        .localCheckpoint(false) // one artifact scan feeds all three rounds
      val deg = ed.groupBy("u").agg(count(lit(1)).as("deg"))
      var r = deg.select(col("u"), lit(1000000L).as("r"))
      for (_ <- 1 to 3) {
        val contrib = ed.join(r, Seq("u")).join(deg, Seq("u"))
          .select(col("v").as("u"), expr("r div deg").as("fl"))
          .groupBy("u").agg(sum("fl").as("s"))
        r = deg.select(col("u")).join(contrib, Seq("u"), "left")
          .select(col("u"), (lit(150000L)
            + expr("(85 * coalesce(s, CAST(0 AS BIGINT))) div 100")).as("r"))
      }
      deg.join(r, Seq("u"))
        .select(col("u").as("doc_id"), col("deg").as("degree"),
          col("r").as("rank_micro"))
    })

  /** LSH threshold calibration — the S-curve audit behind choosing
    * [[PortMatchMin]]: for every observed agreeing-minhash count
    * `n_match`, how many candidate pairs land there, how many are TRUE
    * near-dups by exact 3-gram Jaccard ≥ 1/2 (the integer cross-
    * multiplication 2·|∩| ≥ |∪| — no floats), and the CUMULATIVE
    * precision a deployment would get by admitting pairs at threshold
    * ≥ n_match (ppm, integer division — both engines truncate toward
    * zero). This is the measurement that justifies the banding
    * parameters everywhere else in the engine: q52/q56/q129/… all admit
    * at n_match ≥ PortMatchMin, and this table says what precision that
    * buys and what raising or lowering the bar would trade.
    *
    * Scale shape: rides the stored scored_pairs artifact (candidate-
    * bounded, never all-pairs); exact grams are recomputed ONLY for
    * docs in a candidate pair (q54's propose/dispose trade — broadcast
    * semi-join before the gram projection, so gram cost is
    * O(candidates), not O(corpus)); the calibration rollup groups by
    * n_match (≤ [[PortK]]+1 rows), and the cumulative window runs over
    * that aggregate-reduced table, never fact-sized input. HASH-MATCHED
    * end to end. */
  val q191 = QueryDef.oracle("q191_lsh_calibration", {
    s"""$portableScoredCtes,
       |jn AS (
       |  SELECT s.n_match,
       |         len(list_intersect(ga.gs, gb.gs)) AS inter,
       |         len(ga.gs) AS na, len(gb.gs) AS nb
       |  FROM scored s JOIN grams ga ON ga.doc_id = s.ia
       |                JOIN grams gb ON gb.doc_id = s.ib),
       |b AS (
       |  SELECT n_match, CAST(count(*) AS BIGINT) AS n_pairs,
       |         CAST(count(CASE WHEN 2 * inter >= na + nb - inter THEN 1 END) AS BIGINT) AS n_true
       |  FROM jn GROUP BY 1),
       |c AS (
       |  SELECT n_match, n_pairs, n_true,
       |         CAST(SUM(n_pairs) OVER w AS BIGINT) AS cum_pairs,
       |         CAST(SUM(n_true) OVER w AS BIGINT) AS cum_true
       |  FROM b WINDOW w AS (ORDER BY n_match DESC))
       |SELECT n_match, n_pairs, n_true, cum_pairs, cum_true,
       |       CAST((1000000 * cum_true) // cum_pairs AS BIGINT) AS precision_ppm
       |FROM c""".stripMargin})(
    (s, d) => {
      import org.apache.spark.sql.expressions.Window
      val scored = portableScoredPairs(s, d).localCheckpoint(false)
      // exact grams only for docs appearing in a candidate pair — the
      // q54 trade: the semi-join restricts the corpus scan BEFORE the
      // gram projection
      val candIds = scored.select(col("ia").as("doc_id"))
        .unionByName(scored.select(col("ib").as("doc_id"))).distinct()
      val grams = Tables.documents(s, d)
        .join(broadcast(candIds), Seq("doc_id"), "left_semi")
        .select(col("doc_id"), array_distinct(wordNgrams(col("text"), 3)).as("gs"))
        .localCheckpoint(false) // consumed by both sides of the pair join
      val withA = grams.join(broadcast(scored), col("doc_id") === col("ia"))
        .select(col("ia"), col("ib"), col("n_match"), col("gs").as("g_a"))
      val jn = grams.join(broadcast(withA), col("doc_id") === col("ib"))
        .select(col("n_match"),
          size(array_intersect(col("g_a"), col("gs"))).as("inter"),
          size(col("g_a")).as("na"), size(col("gs")).as("nb"))
      val b = jn.groupBy("n_match")
        .agg(count(lit(1)).as("n_pairs"),
          count(when(lit(2) * col("inter") >= col("na") + col("nb") - col("inter"), 1))
            .as("n_true"))
      // cumulative-by-descending-threshold over the ≤ PortK+1-row
      // aggregate (zero-key window above an Aggregate — never fact-sized)
      val w = Window.orderBy(col("n_match").desc)
        .rangeBetween(Window.unboundedPreceding, Window.currentRow)
      b.select(col("n_match"), col("n_pairs"), col("n_true"),
          sum("n_pairs").over(w).as("cum_pairs"),
          sum("n_true").over(w).as("cum_true"))
        .select(col("n_match"), col("n_pairs"), col("n_true"),
          col("cum_pairs"), col("cum_true"),
          expr("(1000000 * cum_true) div cum_pairs").as("precision_ppm"))
    })

  /** Boilerplate cap and candidate floor for q193 — grams selected by
    * more than ContStop docs are dropped before pairing (the q185
    * convention), and a pair must share ≥ ContMinShared CAPPED grams to
    * become a candidate. Baked into q193's oracle at object init. */
  private[graft] val ContStop = 50
  private[graft] val ContMinShared = 2

  /** Asymmetric CONTAINMENT pairs — the quote/excerpt detector Jaccard
    * can't be: a 30-token quote inside a 3000-token article has
    * near-zero Jaccard but containment ≈ 1.0 on the quote side.
    * Containment(A,B) = |G(A)∩G(B)| / min(|G(A)|,|G(B)|) over distinct
    * positional [[SpanK]]-gram hashes (the span family's gram
    * identity), reported in exact ppm (positive integers, so
    * truncation agrees across engines) with a quote flag at the 0.8
    * threshold via integer cross-multiplication (10·|∩| ≥ 8·min).
    * Propose/dispose (q54's shape, gram-keyed instead of band-keyed):
    * candidates = pairs sharing ≥ [[ContMinShared]] grams after the
    * [[ContStop]] boilerplate cap — so the gram-keyed pair join fans
    * out at most ContStop² per gram, never a dup-class square — then
    * the EXACT intersection is recounted over ALL shared grams (capped
    * and boilerplate alike) for just those candidate pairs.
    *
    * Scale shape: reads the stored gpos[[SpanK]] inventory (bucketed on
    * gh — the distinct, the per-gram cap count, and the per-doc gram
    * count all run exchange-free or doc-keyed); the exact recount joins
    * the BROADCAST candidate set back against the bucketed inventory,
    * so its cost is O(candidate docs' grams), not O(corpus).
    * HASH-MATCHED. */
  val q193 = QueryDef.oracle("q193_containment_pairs", {
    s"""$spanGposCtes,
       |dg AS (SELECT DISTINCT doc_id, gh FROM gpos),
       |nd AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS ng FROM dg GROUP BY 1),
       |keep AS (SELECT gh FROM dg GROUP BY gh
       |         HAVING count(*) BETWEEN 2 AND $ContStop),
       |cand AS (SELECT a.doc_id AS ia, b.doc_id AS ib
       |         FROM dg a JOIN keep USING (gh) JOIN dg b USING (gh)
       |         WHERE a.doc_id < b.doc_id
       |         GROUP BY 1, 2 HAVING count(*) >= $ContMinShared),
       |ex AS (SELECT c.ia, c.ib, CAST(count(*) AS BIGINT) AS inter
       |       FROM cand c JOIN dg a ON a.doc_id = c.ia
       |                   JOIN dg b ON b.doc_id = c.ib AND b.gh = a.gh
       |       GROUP BY 1, 2)
       |SELECT ex.ia, ex.ib, ex.inter, na.ng AS na, nb.ng AS nb,
       |       CAST((1000000 * ex.inter) // LEAST(na.ng, nb.ng) AS BIGINT)
       |         AS containment_ppm,
       |       10 * ex.inter >= 8 * LEAST(na.ng, nb.ng) AS quote_flag
       |FROM ex JOIN nd na ON na.doc_id = ex.ia
       |        JOIN nd nb ON nb.doc_id = ex.ib""".stripMargin})(
    (s, d) => {
      val dg = storedGramPositions(s, d, SpanK)
        .select("doc_id", "gh").distinct()
        .localCheckpoint(false) // five consumers below share one derivation
      val nd = dg.groupBy("doc_id").agg(count(lit(1)).as("ng"))
      val keep = dg.groupBy("gh").agg(count(lit(1)).as("ndocs"))
        .filter(col("ndocs").between(2, ContStop)).select("gh")
      val l = dg.join(keep, Seq("gh")).select(col("gh"), col("doc_id").as("ia"))
      val cand = l.join(dg.select(col("gh"), col("doc_id").as("ib")), Seq("gh"))
        .filter(col("ia") < col("ib"))
        .groupBy("ia", "ib").agg(count(lit(1)).as("nshared"))
        .filter(col("nshared") >= ContMinShared).select("ia", "ib")
      // exact recount over ALL shared grams, candidates only (broadcast)
      val withA = dg.join(broadcast(cand), col("doc_id") === col("ia"))
        .select(col("ia"), col("ib"), col("gh").as("gha"))
      val ex = dg.join(broadcast(withA),
          col("doc_id") === col("ib") && col("gh") === col("gha"))
        .groupBy("ia", "ib").agg(count(lit(1)).as("inter"))
      ex.join(nd.select(col("doc_id").as("ia"), col("ng").as("na")), Seq("ia"))
        .join(nd.select(col("doc_id").as("ib"), col("ng").as("nb")), Seq("ib"))
        .select(col("ia"), col("ib"), col("inter"), col("na"), col("nb"),
          expr("(1000000 * inter) div least(na, nb)").as("containment_ppm"),
          (lit(10) * col("inter") >= lit(8) * least(col("na"), col("nb")))
            .as("quote_flag"))
    })

  /** Truth-candidate floor for q195: a pair must share ≥ this many
    * CAPPED 3-grams to be recounted. Safe for the J ≥ 1/2 truth set: a
    * true pair on n-gram docs shares ≥ n/3 grams (26 at this corpus's
    * ~80 tokens), so 4 cannot drop truth unless nearly every shared
    * gram is boilerplate-capped — the documented > ContStop dup-class
    * caveat. Cuts the 3-gram candidate fan-out ~4x vs a floor of 2.
    * Baked into q195's oracle at object init. */
  private[graft] val RecallMinShared = 4

  /** LSH RECALL audit — q191's other half: q191 asks "of the pairs
    * banding proposes, how many are real?", this asks "of the REAL
    * near-dup pairs, how many does banding catch?". Ground truth is
    * generated INDEPENDENTLY of the banding under audit: candidate
    * pairs from the shared-3-gram inventory (the q193 machinery at
    * n = 3 — per-gram cap ≤ [[ContStop]] docs, ≥ [[ContMinShared]]
    * shared capped grams), exact-recounted and kept where exact 3-gram
    * Jaccard ≥ 1/2 (2·|∩| ≥ |∪|, q54's true-dup rule in integers).
    * Each true pair is then checked against the admitted set (stored
    * scored_pairs at n_match ≥ [[PortMatchMin]]) and rolled up by
    * Jaccard decile ((10·|∩|) div |∪| ∈ 5..10): n_true, n_caught,
    * recall_ppm — the curve that shows WHERE banding misses (recall
    * climbs with similarity; the 0.5-0.6 band is where tuning lives).
    * Truth caveat, documented: a true pair sharing ONLY grams that
    * occur in > ContStop docs escapes the truth set — that needs a
    * > ContStop-sized dup class, which exact dedup (q50) already owns.
    *
    * Scale shape: the truth side is q193's bounded gram-keyed
    * generation off the stored gpos3 inventory (≤ ContStop² fan-out
    * per gram, exact recount candidate-only); the admitted side is an
    * artifact scan; the rollup is 6 rows. HASH-MATCHED. */
  /** The recall-audit chain shared by q195 (all pairs) and q216 (the
    * incremental new×index direction): ground-truth true pairs from the
    * capped 3-gram inventory, exact-recounted, left-joined against the
    * admitted set, rolled up by Jaccard decile. `crossCond` restricts
    * the truth pair generation (empty for q195; the exactly-one-side-
    * is-new predicate for q216) — ONE definition, so the two audits
    * cannot disagree on truth generation or decile arithmetic. */
  private[graft] def recallAuditOracle(crossCond: String): String =
    s"""$portableScoredCtes,
       |dg AS (SELECT doc_id, md5(g) AS gh
       |       FROM (SELECT doc_id, unnest(gs) AS g FROM grams)),
       |nd AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS ng FROM dg GROUP BY 1),
       |gcap AS (SELECT gh FROM dg GROUP BY gh
       |         HAVING count(*) BETWEEN 2 AND $ContStop),
       |tc AS (SELECT a.doc_id AS ia, b.doc_id AS ib
       |       FROM dg a JOIN gcap USING (gh) JOIN dg b USING (gh)
       |       WHERE a.doc_id < b.doc_id$crossCond
       |       GROUP BY 1, 2 HAVING count(*) >= $RecallMinShared),
       |ex AS (SELECT c.ia, c.ib, CAST(count(*) AS BIGINT) AS inter
       |       FROM tc c JOIN dg a ON a.doc_id = c.ia
       |                 JOIN dg b ON b.doc_id = c.ib AND b.gh = a.gh
       |       GROUP BY 1, 2),
       |tr AS (SELECT ex.ia, ex.ib, ex.inter,
       |              na.ng + nb.ng - ex.inter AS un
       |       FROM ex JOIN nd na ON na.doc_id = ex.ia
       |               JOIN nd nb ON nb.doc_id = ex.ib
       |       WHERE 2 * ex.inter >= na.ng + nb.ng - ex.inter),
       |adm AS (SELECT ia, ib FROM scored WHERE n_match >= $PortMatchMin),
       |fl AS (SELECT CAST((10 * tr.inter) // tr.un AS BIGINT) AS jac_decile,
       |              (adm.ia IS NOT NULL) AS caught
       |       FROM tr LEFT JOIN adm ON adm.ia = tr.ia AND adm.ib = tr.ib)
       |SELECT jac_decile, CAST(count(*) AS BIGINT) AS n_true,
       |       CAST(count(CASE WHEN caught THEN 1 END) AS BIGINT) AS n_caught,
       |       CAST((1000000 * count(CASE WHEN caught THEN 1 END)) // count(*)
       |            AS BIGINT) AS recall_ppm
       |FROM fl GROUP BY 1""".stripMargin

  /** Spark twin of [[recallAuditOracle]]; crossOnly mirrors crossCond. */
  private def recallAuditFrame(s: SparkSession, d: String,
      crossOnly: Boolean): DataFrame = {
    val dg = storedGramPositions(s, d, 3)
      .select("doc_id", "gh").distinct()
      .localCheckpoint(false) // shared by the cap, counts, and both recount sides
    val nd = dg.groupBy("doc_id").agg(count(lit(1)).as("ng"))
    val gcap = dg.groupBy("gh").agg(count(lit(1)).as("ndocs"))
      .filter(col("ndocs").between(2, ContStop)).select("gh")
    val pairPred =
      if (crossOnly)
        col("ia") < col("ib") &&
          ((col("ia") % 5 === 0) =!= (col("ib") % 5 === 0))
      else col("ia") < col("ib")
    val tc = dg.join(gcap, Seq("gh")).select(col("gh"), col("doc_id").as("ia"))
      .join(dg.select(col("gh"), col("doc_id").as("ib")), Seq("gh"))
      .filter(pairPred)
      .groupBy("ia", "ib").agg(count(lit(1)).as("nshared"))
      .filter(col("nshared") >= RecallMinShared).select("ia", "ib")
    val withA = dg.join(broadcast(tc), col("doc_id") === col("ia"))
      .select(col("ia"), col("ib"), col("gh").as("gha"))
    val ex = dg.join(broadcast(withA),
        col("doc_id") === col("ib") && col("gh") === col("gha"))
      .groupBy("ia", "ib").agg(count(lit(1)).as("inter"))
    val tr = ex
      .join(nd.select(col("doc_id").as("ia"), col("ng").as("na")), Seq("ia"))
      .join(nd.select(col("doc_id").as("ib"), col("ng").as("nb")), Seq("ib"))
      .select(col("ia"), col("ib"), col("inter"),
        (col("na") + col("nb") - col("inter")).as("un"))
      .filter(lit(2) * col("inter") >= col("un"))
    val adm = portableScoredPairs(s, d)
      .filter(col("n_match") >= PortMatchMin)
      .select(col("ia"), col("ib"), lit(true).as("caught"))
    tr.join(adm, Seq("ia", "ib"), "left")
      .select(expr("(10 * inter) div un").as("jac_decile"),
        coalesce(col("caught"), lit(false)).as("caught"))
      .groupBy("jac_decile")
      .agg(count(lit(1)).as("n_true"),
        count(when(col("caught"), 1)).as("n_caught"))
      .select(col("jac_decile"), col("n_true"), col("n_caught"),
        expr("(1000000 * n_caught) div n_true").as("recall_ppm"))
  }

  val q195 = QueryDef.oracle("q195_lsh_recall_audit",
    recallAuditOracle(""))((s, d) => recallAuditFrame(s, d, crossOnly = false))

  /** PER-CLUSTER SALIENT TERMS — dedup forensics one level deeper than
    * q213's size histogram: not how big the near-dup clusters are but
    * WHAT CONTENT they hold, as each multi-document cluster's top-3
    * distinguishing terms by cluster-grain c-TF-IDF (q161's scoring —
    * tf·ln(N/df) rounded to 4 places, the same sanctioned double —
    * with clusters standing where q161 put sources). The report a
    * curation owner reads to see whether mega-clusters are boilerplate
    * templates, mirrored press releases, or genuine popular content —
    * which decides remediation exactly like q213 decides mechanism.
    * Cluster labels read back from the STORED `dedup_clusters` artifact
    * ([[clusterLabels]] — q56's closure materialized once at ingest,
    * the store-don't-recompute pattern); single-doc clusters carry no
    * duplication signal and are excluded before any token work, so the
    * explode only touches documents that are actually duplicated.
    * Scale shape: one label-table scan + ONE scan of the clustered
    * subset → map-side-combined (cluster, token) counts → vocab-sized
    * cluster-df rollup → per-cluster keyed top-3 window (never
    * global). Output: 3 rows per multi-doc cluster. HASH-MATCHED. */
  /** Dedup THRESHOLD sweep — the what-if q191's calibration curve is
    * read against: for every candidate threshold t (1..12 agreeing
    * minhash slots, bracketing [[PortMatchMin]]), how many candidate
    * PAIRS survive and how many DOCUMENTS would be touched? q191 gives
    * the precision of each threshold; this gives its blast radius —
    * together they are the evidence a threshold change ships with
    * (drop t by one: +how many docs suddenly near-dup?). Pure
    * artifact-side arithmetic: pair counts per n_match and per-doc max
    * n_match histograms (both tiny) cross a 12-row threshold grid, so
    * the sweep costs two bounded rollups over the STORED scored pairs
    * — no corpus scan at all. Cumulative counts by integer comparison,
    * shares in exact ppm of the all-candidate totals. Output: 12 rows.
    * HASH-MATCHED. */
  val q238 = QueryDef.oracle("q238_threshold_sweep", {
    s"""$portableScoredCtes,
       |ph AS (SELECT n_match, CAST(count(*) AS BIGINT) AS n_pairs
       |       FROM scored GROUP BY 1),
       |dm AS (SELECT doc_id, MAX(n_match) AS maxm FROM (
       |         SELECT ia AS doc_id, n_match FROM scored
       |         UNION ALL SELECT ib, n_match FROM scored)
       |       GROUP BY 1),
       |dh AS (SELECT maxm, CAST(count(*) AS BIGINT) AS n_docs
       |       FROM dm GROUP BY 1),
       |tot AS (SELECT CAST((SELECT SUM(n_pairs) FROM ph) AS BIGINT) AS tp,
       |               CAST((SELECT SUM(n_docs) FROM dh) AS BIGINT) AS td),
       |grid AS (SELECT CAST(range + 1 AS BIGINT) AS threshold FROM range(12))
       |SELECT g.threshold,
       |       CAST(COALESCE((SELECT SUM(p.n_pairs) FROM ph p
       |                      WHERE p.n_match >= g.threshold), 0) AS BIGINT)
       |         AS n_pairs,
       |       CAST(COALESCE((SELECT SUM(h.n_docs) FROM dh h
       |                      WHERE h.maxm >= g.threshold), 0) AS BIGINT)
       |         AS n_docs,
       |       CAST(COALESCE((SELECT SUM(p.n_pairs) FROM ph p
       |                      WHERE p.n_match >= g.threshold), 0)
       |            * 1000000 // tot.tp AS BIGINT) AS pair_share_ppm
       |FROM grid g, tot""".stripMargin})(
    (s, d) => {
      val sp = portableScoredPairs(s, d)
      val ph = sp.groupBy("n_match").agg(count(lit(1)).as("n_pairs"))
      val dm = sp.select(col("ia").as("doc_id"), col("n_match"))
        .unionByName(sp.select(col("ib").as("doc_id"), col("n_match")))
        .groupBy("doc_id").agg(max("n_match").as("maxm"))
      val dh = dm.groupBy("maxm").agg(count(lit(1)).as("n_docs"))
      val tot = ph.agg(sum("n_pairs").as("tp"))
        .crossJoin(dh.agg(sum("n_docs").as("td")))
      val grid = s.range(1, 13).withColumnRenamed("id", "threshold")
      val pcum = grid.join(broadcast(ph), col("n_match") >= col("threshold"),
          "left")
        .groupBy("threshold")
        .agg(coalesce(sum("n_pairs"), lit(0L)).as("n_pairs"))
      val dcum = grid.join(broadcast(dh), col("maxm") >= col("threshold"),
          "left")
        .groupBy("threshold")
        .agg(coalesce(sum("n_docs"), lit(0L)).as("n_docs"))
      pcum.join(dcum, Seq("threshold")).crossJoin(broadcast(tot))
        .select(col("threshold"), col("n_pairs").cast("long").as("n_pairs"),
          col("n_docs").cast("long").as("n_docs"),
          expr("CAST(n_pairs * 1000000 div tp AS BIGINT)")
            .as("pair_share_ppm"))
    })

  /** Per-source EFFECTIVE TOKEN YIELD — the number a crawl is actually
    * worth after dedup: q194's funnel counts surviving DOCUMENTS, but
    * training budgets are spent in TOKENS, and a source whose keepers
    * are its shortest documents yields far less than its doc-survival
    * rate suggests. Per source: raw docs/tokens, canonical keepers
    * (q56's keep rule — doc_id = cluster_id — read from the stored
    * `dedup_clusters` labels), kept tokens, and both survival rates in
    * exact ppm; the gap between doc_yield and token_yield is the
    * duplication-length skew. Scale shape: ONE corpus scan (token
    * counts ride it) joined to the label table, one source-keyed
    * map-side rollup. Output: one row per source. HASH-MATCHED. */
  val q243 = QueryDef.oracle("q243_token_yield", {
    val recursiveCtes = portableScoredCtes.replaceFirst("^WITH ", "WITH RECURSIVE ")
    s"""$recursiveCtes,
       |kept AS (SELECT ia, ib FROM scored WHERE n_match >= $PortMatchMin),
       |undir AS (SELECT ia AS a, ib AS b FROM kept UNION SELECT ib, ia FROM kept),
       |reach(a, b) AS (
       |  SELECT a, b FROM undir
       |  UNION
       |  SELECT r.a, u.b FROM reach r JOIN undir u ON r.b = u.a),
       |comp AS (
       |  SELECT d.doc_id,
       |         CASE WHEN min(r.b) IS NULL THEN d.doc_id
       |              ELSE LEAST(d.doc_id, min(r.b)) END AS cluster_id
       |  FROM documents d LEFT JOIN reach r ON r.a = d.doc_id
       |  GROUP BY d.doc_id),
       |tk AS (SELECT d.doc_id, d.source,
       |         CAST(len(regexp_extract_all(d.text, '\\S+')) AS BIGINT) AS n_tok,
       |         c.doc_id = c.cluster_id AS keeper
       |       FROM documents d JOIN comp c ON d.doc_id = c.doc_id)
       |SELECT source,
       |       CAST(count(*) AS BIGINT) AS n_docs,
       |       CAST(count(CASE WHEN keeper THEN 1 END) AS BIGINT) AS n_keepers,
       |       CAST(SUM(n_tok) AS BIGINT) AS raw_tokens,
       |       CAST(SUM(CASE WHEN keeper THEN n_tok ELSE 0 END) AS BIGINT)
       |         AS kept_tokens,
       |       CAST(count(CASE WHEN keeper THEN 1 END) * 1000000 // count(*)
       |            AS BIGINT) AS doc_yield_ppm,
       |       CASE WHEN SUM(n_tok) = 0 THEN NULL
       |            ELSE CAST(SUM(CASE WHEN keeper THEN n_tok ELSE 0 END)
       |                      * 1000000 // SUM(n_tok) AS BIGINT)
       |       END AS token_yield_ppm
       |FROM tk GROUP BY source""".stripMargin})(
    (s, d) => {
      import graft.functions.TextFunctions.tokenCount
      val labels = clusterLabels(s, d)
      val tk = Tables.documents(s, d)
        .select(col("doc_id"), col("source"),
          coalesce(tokenCount(col("text")).cast("long"), lit(0L)).as("n_tok"))
        .join(labels, Seq("doc_id"))
        .withColumn("keeper", col("doc_id") === col("cluster_id"))
      tk.groupBy("source")
        .agg(count(lit(1)).as("n_docs"),
          count(when(col("keeper"), 1)).as("n_keepers"),
          sum("n_tok").as("raw_tokens"),
          sum(when(col("keeper"), col("n_tok")).otherwise(0L))
            .as("kept_tokens"))
        .select(col("source"), col("n_docs"), col("n_keepers"),
          col("raw_tokens").cast("long").as("raw_tokens"),
          col("kept_tokens").cast("long").as("kept_tokens"),
          expr("CAST(n_keepers * 1000000 div n_docs AS BIGINT)")
            .as("doc_yield_ppm"),
          when(col("raw_tokens") === 0, lit(null).cast("long"))
            .otherwise(expr(
              "CAST(kept_tokens * 1000000 div raw_tokens AS BIGINT)"))
            .as("token_yield_ppm"))
    })

  /** K-CORE decomposition of the near-dup pair graph — the density
    * forensic q213's size histogram can't see: a large cluster can be a
    * thin chain (every node degree ≤ 2, one bad edge glues two distinct
    * groups) or a dense clique (true mass duplication). The k-core (the
    * maximal subgraph where every node keeps degree ≥ k) separates the
    * two: chains vanish at k=2's fixpoint only if open, cliques survive
    * to high k. Computed by BOUNDED-ROUND peeling (6 rounds, both
    * engines identical by construction) with an explicit `converged`
    * flag (round-5 node set == round-6 node set) so the audit reports
    * whether the fixpoint was reached rather than assuming it —
    * peeling rounds needed equal the graph's degeneracy ordering depth,
    * small for LSH pair graphs whose components are diameter-bounded
    * (q56). Exact integers. Scale shape: rides the stored scored_pairs
    * artifact (candidate-bounded); each round is one alive-keyed
    * semi-join + one map-side degree count over the (small) edge set;
    * output 2 rows (k=2,3). HASH-MATCHED. */
  val q246 = QueryDef.oracle("q246_kcore", {
    def peel(k: Int): String = {
      val rounds = (1 to 6).map { t =>
        // MATERIALIZED: each a_t is referenced by the next round twice
        // (u side + v side) — without it DuckDB inlines the chain into
        // 2^rounds copies of the full scored-pairs pipeline and runs
        // out of file handles on the parquet scans
        s"""e${k}_$t AS (SELECT ed.u, ed.v FROM ed
           |  JOIN a${k}_${t - 1} x ON x.u = ed.u
           |  JOIN a${k}_${t - 1} y ON y.u = ed.v),
           |a${k}_$t AS MATERIALIZED (SELECT u FROM (SELECT u, count(*) AS c
           |                            FROM e${k}_$t GROUP BY 1)
           |             WHERE c >= $k)""".stripMargin
      }.mkString(",\n")
      s"a${k}_0 AS MATERIALIZED (SELECT DISTINCT u FROM ed),\n$rounds"
    }
    def row(k: Int): String =
      s"""SELECT CAST($k AS BIGINT) AS k,
         |  CAST((SELECT count(*) FROM a${k}_6) AS BIGINT) AS core_nodes,
         |  CAST((SELECT count(*) FROM ed
         |        JOIN a${k}_6 x ON x.u = ed.u
         |        JOIN a${k}_6 y ON y.u = ed.v) // 2 AS BIGINT) AS core_edges,
         |  CAST(CASE WHEN (SELECT count(*) FROM a${k}_5)
         |                 = (SELECT count(*) FROM a${k}_6)
         |            THEN 1 ELSE 0 END AS BIGINT) AS converged""".stripMargin
    s"""$portableScoredCtes,
       |kept AS (SELECT ia, ib FROM scored WHERE n_match >= $PortMatchMin),
       |ed AS MATERIALIZED (SELECT ia AS u, ib AS v FROM kept
       |       UNION ALL SELECT ib AS u, ia AS v FROM kept),
       |${peel(2)},
       |${peel(3)}
       |${row(2)}
       |UNION ALL
       |${row(3)}""".stripMargin})(
    (s, d) => {
      val e = portableScoredPairs(s, d).filter(col("n_match") >= PortMatchMin)
      val ed = e.select(col("ia").as("u"), col("ib").as("v"))
        .unionByName(e.select(col("ib").as("u"), col("ia").as("v")))
        .localCheckpoint(false) // one artifact scan feeds all peel rounds
      // r15 optimization: the k=2 and k=3 peels ran as two INDEPENDENT
      // 6-round loops — 12 semi-join+degree rounds, each behind its own
      // localCheckpoint barrier (53 jobs measured, wall dominated by
      // barrier latency, taskSum < 1 s). Tagging every edge/node with k
      // and peeling both cores in ONE keyed loop does the identical
      // per-k computation (the k column rides every join/group key) in
      // half the rounds/jobs; at scale, half the driver barriers for
      // the same shuffle bytes. The 2-row k axis is driven from a
      // literal frame and the final report left-joins onto it, so an
      // EMPTY core still reports its zero row (the old per-k global
      // aggregates' convention).
      val ksDf = broadcast(s.createDataFrame(Seq(Tuple1(2L), Tuple1(3L)))
        .toDF("k"))
      val edK = ed.crossJoin(ksDf)
      var alive = ed.select("u").distinct().crossJoin(ksDf)
      var a5: DataFrame = alive
      for (t <- 1 to 6) {
        val among = edK
          .join(alive, Seq("k", "u"), "left_semi")
          .join(alive.withColumnRenamed("u", "v"), Seq("k", "v"), "left_semi")
        alive = among.groupBy("k", "u").agg(count(lit(1)).as("c"))
          .filter(col("c") >= col("k")).select("k", "u")
          .localCheckpoint(false) // bounded-round lineage cut, q56's pattern
        if (t == 5) a5 = alive
      }
      val coreEdges = edK
        .join(alive, Seq("k", "u"), "left_semi")
        .join(alive.withColumnRenamed("u", "v"), Seq("k", "v"), "left_semi")
        .groupBy("k").agg((count(lit(1)) / 2).cast("long").as("core_edges"))
      val nodes = alive.groupBy("k").agg(count(lit(1)).as("core_nodes"))
      val n5 = a5.groupBy("k").agg(count(lit(1)).as("c5"))
      ksDf
        .join(nodes, Seq("k"), "left")
        .join(coreEdges, Seq("k"), "left")
        .join(n5, Seq("k"), "left")
        .select(col("k"),
          coalesce(col("core_nodes"), lit(0L)).as("core_nodes"),
          coalesce(col("core_edges"), lit(0L)).as("core_edges"),
          when(coalesce(col("c5"), lit(0L)) ===
            coalesce(col("core_nodes"), lit(0L)), 1L).otherwise(0L)
            .as("converged"))
    })

  /** STORED near-dup cluster labels — (doc_id, cluster_id), q56's exact
    * closure over the stored scored-pairs edge set, materialized once
    * (the bandrows/codebook store-don't-recompute pattern: labels are a
    * pure function of the corpus, production writes them at ingest).
    * Day-2 consumers that need who-clusters-with-whom (q231, and since
    * the r15 optimization round the size histogram q213) read this
    * back instead of re-running label propagation; q56 keeps running
    * the closure LIVE — it IS the declared closure computation, and
    * its hash-matched output is what verifies this artifact's builder
    * (identical Components call, deterministic min-label fixpoint). */
  private[graft] def clusterLabels(s: SparkSession, d: String): DataFrame =
    graft.sources.ArtifactStore.table(s, d, "dedup_clusters") {
      val edges = portableScoredPairs(s, d)
        .filter(col("n_match") >= PortMatchMin)
        .select(col("ia").as("src"), col("ib").as("dst"))
      val vertices = Tables.documents(s, d).select(col("doc_id").as("id"))
      Components.connectedComponents(vertices, edges)
        .select(col("id").as("doc_id"), col("component").as("cluster_id"))
    }

  val q231 = QueryDef.oracle("q231_cluster_salient_terms", {
    val recursiveCtes = portableScoredCtes.replaceFirst("^WITH ", "WITH RECURSIVE ")
    s"""$recursiveCtes,
       |kept AS (SELECT ia, ib FROM scored WHERE n_match >= $PortMatchMin),
       |undir AS (SELECT ia AS a, ib AS b FROM kept UNION SELECT ib, ia FROM kept),
       |reach(a, b) AS (
       |  SELECT a, b FROM undir
       |  UNION
       |  SELECT r.a, u.b FROM reach r JOIN undir u ON r.b = u.a),
       |comp AS (
       |  SELECT d.doc_id,
       |         CASE WHEN min(r.b) IS NULL THEN d.doc_id
       |              ELSE LEAST(d.doc_id, min(r.b)) END AS cluster_id
       |  FROM documents d LEFT JOIN reach r ON r.a = d.doc_id
       |  GROUP BY d.doc_id),
       |sizes AS (SELECT cluster_id, CAST(count(*) AS BIGINT) AS cluster_size
       |          FROM comp GROUP BY cluster_id),
       |multi AS (SELECT cluster_id, cluster_size FROM sizes
       |          WHERE cluster_size >= 2),
       |ctoks AS (SELECT m.cluster_id, m.cluster_size,
       |            unnest(list_filter(regexp_split_to_array(d.text, '\\s+'),
       |                               x -> x <> '')) AS tok
       |          FROM documents d
       |          JOIN comp c ON d.doc_id = c.doc_id
       |          JOIN multi m ON c.cluster_id = m.cluster_id),
       |tf AS (SELECT cluster_id, cluster_size, tok,
       |         CAST(count(*) AS BIGINT) AS tf
       |       FROM ctoks GROUP BY 1, 2, 3),
       |cdf AS (SELECT tok, CAST(count(*) AS BIGINT) AS cl_df FROM tf GROUP BY 1),
       |ncl AS (SELECT CAST(count(*) AS BIGINT) AS n_clusters FROM multi),
       |scored_t AS (SELECT tf.cluster_id, tf.cluster_size, tf.tok, tf.tf,
       |               cdf.cl_df,
       |               round(tf.tf * ln(CAST(ncl.n_clusters AS DOUBLE) / cdf.cl_df),
       |                     4) AS score
       |             FROM tf JOIN cdf USING (tok), ncl)
       |SELECT cluster_id, cluster_size, tok, tf, cl_df, score, rnk FROM (
       |  SELECT *, CAST(ROW_NUMBER() OVER (PARTITION BY cluster_id
       |                 ORDER BY score DESC, tok) AS BIGINT) AS rnk
       |  FROM scored_t)
       |WHERE rnk <= 3""".stripMargin})(
    (s, d) => {
      import graft.functions.TextFunctions.tokens
      val comp = clusterLabels(s, d)
      val multi = comp.groupBy("cluster_id").agg(count(lit(1)).as("cluster_size"))
        .filter(col("cluster_size") >= 2)
      val clustered = comp.join(multi, "cluster_id")
        .select(col("doc_id"), col("cluster_id"), col("cluster_size"))
      val tf = Tables.documents(s, d).join(clustered, "doc_id")
        .select(col("cluster_id"), col("cluster_size"),
          explode(tokens(col("text"))).as("tok"))
        .groupBy("cluster_id", "cluster_size", "tok")
        .agg(count(lit(1)).as("tf"))
      val cdf = tf.groupBy("tok").agg(count(lit(1)).as("cl_df"))
      val ncl = multi.agg(count(lit(1)).as("n_clusters"))
      val scored = tf.join(cdf, Seq("tok")).crossJoin(broadcast(ncl))
        .select(col("cluster_id"), col("cluster_size"), col("tok"), col("tf"),
          col("cl_df"),
          round(col("tf") * log(col("n_clusters").cast("double") / col("cl_df")),
            4).as("score"))
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("cluster_id").orderBy(col("score").desc, col("tok"))
      scored.withColumn("rnk", row_number().over(w).cast("long"))
        .filter(col("rnk") <= 3)
        .select("cluster_id", "cluster_size", "tok", "tf", "cl_df", "score",
          "rnk")
    })

  /** STREAMING ADMISSION GATE recall audit (r9 verdict task 7): q195's
    * audit convention applied to the incremental ingest gate — the
    * direction `DocStreams.incrementalAdmission` (≡ batch q148, pinned
    * by IncrementalAdmissionStreamSpec) actually runs day to day. Truth
    * pairs are restricted to NEW×INDEX (exactly one side has
    * doc_id % 5 = 0 — q148's split), so recall_ppm per Jaccard decile
    * reads directly as "of arriving documents whose true overlap with
    * the stored corpus is in decile d, what fraction does the gate
    * catch?" — the gate's miss rate MEASURED, not assumed. The admitted
    * side stays the stored scored_pairs artifact: q148's banding
    * candidates are exactly the cross subset of the all-pairs banding
    * collisions (same bands, same signatures, same agreement count), so
    * restricting the TRUTH side suffices — and
    * StreamingGateAuditSpec pins that equivalence against q148's own
    * output at sf0.001, plus the decile-10 invariant (identical gram
    * sets ⇒ identical signatures ⇒ always caught, recall_ppm = 10⁶).
    * Scale shape: identical to q195 (bounded gram-keyed truth
    * generation, artifact-scan admitted side, ≤ 6-row rollup).
    * HASH-MATCHED. */
  val q216 = QueryDef.oracle("q216_admission_recall_audit",
    recallAuditOracle(" AND ((a.doc_id % 5 = 0) <> (b.doc_id % 5 = 0))"))(
    (s, d) => recallAuditFrame(s, d, crossOnly = true))

  /** STREAMING SPAN GATE audit (r9 verdict task 7, second gate): the
    * ingest span gate (`DocStreams.spanOverlap` ≡ batch q180, pinned by
    * SpanOverlapStreamSpec) flags an arriving doc when ≥ half its
    * tokens are covered by [[SpanK]]=5-gram matches against the stored
    * index — but a 5-gram gate is structurally blind to SHORT copies:
    * a doc stitched from 3–4-token index fragments has high true
    * overlap and near-zero 5-gram coverage. This query MEASURES that
    * blindness instead of assuming it away: true overlap = the same
    * merged-interval coverage at the finer 3-gram granularity (the
    * gpos3 inventory, windows [p, p+3)), and per TRUE-coverage decile
    * it reports how many new docs the 5-gram gate flags. Reading the
    * output: flag_ppm ≈ 10⁶ in deciles where the gate works; any
    * decile ≥ 5 with flag_ppm < 10⁶ is the gate's measured miss rate
    * (short-fragment copies), and flags in deciles < 5 would be
    * over-triggering. Both coverages share q180's exact interval
    * arithmetic; docs with zero tokens are excluded (no denominator).
    *
    * Scale shape: two gram-keyed semi-joins off the stored gpos3/gpos5
    * inventories (hashes + ids, never text), two doc-keyed position
    * collects bounded by each doc's own match count, one corpus scan
    * for the token arrays, ≤ 11-row rollup. HASH-MATCHED. */
  val q217 = QueryDef.oracle("q217_span_gate_audit", {
    s"""$spanGposCtes,
       |g3 AS (SELECT doc_id, unnest([{'pos': i - 1, 'gh': md5(list_aggregate(l[i:i+2], 'string_agg', ' '))}
       |                              FOR i IN range(1, len(l) - 1)]
       |                             , recursive := true)
       |       FROM toks WHERE len(l) >= 3),
       |idx5 AS (SELECT DISTINCT gh FROM gpos WHERE doc_id % 5 <> 0),
       |idx3 AS (SELECT DISTINCT gh FROM g3 WHERE doc_id % 5 <> 0),
       |ps5 AS (SELECT g.doc_id, list(g.pos) AS p5 FROM gpos g JOIN idx5 USING (gh)
       |        WHERE g.doc_id % 5 = 0 GROUP BY 1),
       |ps3 AS (SELECT g.doc_id, list(g.pos) AS p3 FROM g3 g JOIN idx3 USING (gh)
       |        WHERE g.doc_id % 5 = 0 GROUP BY 1),
       |c AS (SELECT t.doc_id, len(l) AS n_tokens,
       |        len([i FOR i IN range(1, len(l) + 1)
       |             IF len(list_filter(coalesce(p5, []), p -> p <= i - 1 AND i - 1 < p + $SpanK)) > 0]) AS ov5,
       |        len([i FOR i IN range(1, len(l) + 1)
       |             IF len(list_filter(coalesce(p3, []), p -> p <= i - 1 AND i - 1 < p + 3)) > 0]) AS ov3
       |      FROM toks t LEFT JOIN ps5 USING (doc_id) LEFT JOIN ps3 USING (doc_id)
       |      WHERE t.doc_id % 5 = 0 AND len(l) > 0)
       |SELECT CAST((10 * ov3) // n_tokens AS BIGINT) AS true_decile,
       |       CAST(count(*) AS BIGINT) AS n_docs,
       |       CAST(count(CASE WHEN 2 * ov5 >= n_tokens THEN 1 END) AS BIGINT) AS n_flagged,
       |       CAST((1000000 * count(CASE WHEN 2 * ov5 >= n_tokens THEN 1 END)) // count(*)
       |            AS BIGINT) AS flag_ppm
       |FROM c GROUP BY 1""".stripMargin})(
    (s, d) => {
      val g5 = storedGramPositions(s, d, SpanK)
      val g3 = storedGramPositions(s, d, 3)
      val isNew = col("doc_id") % 5 === 0
      val idx5 = g5.filter(!isNew).select("gh").distinct()
      val idx3 = g3.filter(!isNew).select("gh").distinct()
      val p5 = g5.filter(isNew).join(idx5, Seq("gh"), "left_semi")
        .groupBy("doc_id").agg(collect_set("pos").as("p5"))
      val p3 = g3.filter(isNew).join(idx3, Seq("gh"), "left_semi")
        .groupBy("doc_id").agg(collect_set("pos").as("p3"))
      val kSpan = SpanK
      Tables.documents(s, d).filter(isNew)
        .select(col("doc_id"),
          coalesce(tokens(col("text")), array().cast("array<string>")).as("l"))
        .join(p5, Seq("doc_id"), "left").join(p3, Seq("doc_id"), "left")
        .select(col("doc_id"), col("l"),
          coalesce(col("p5"), array().cast("array<int>")).as("p5"),
          coalesce(col("p3"), array().cast("array<int>")).as("p3"))
        .select(col("doc_id"), size(col("l")).as("n_tokens"),
          size(filter(col("l"), (_, i) =>
            exists(col("p5"), p => p <= i && i < p + kSpan))).as("ov5"),
          size(filter(col("l"), (_, i) =>
            exists(col("p3"), p => p <= i && i < p + 3))).as("ov3"))
        .filter(col("n_tokens") > 0)
        .groupBy(expr("(10 * ov3) div n_tokens").as("true_decile"))
        .agg(count(lit(1)).as("n_docs"),
          count(when(lit(2) * col("ov5") >= col("n_tokens"), 1)).as("n_flagged"))
        .select(col("true_decile"), col("n_docs"), col("n_flagged"),
          expr("(1000000 * n_flagged) div n_docs").as("flag_ppm"))
    })

  /** CONTENT-DEFINED CHUNKING dedup (the FastCDC/rsync family, at token
    * granularity) — the storage-style dedup modality the fixed-window
    * families miss: boundaries are cut where a ROLLING hash of the last
    * 3 tokens hits 0 mod 8 (expected chunk ≈ 8 tokens), so an insertion
    * early in a document shifts every fixed 512-token chunk but leaves
    * every content-defined boundary after it in place — the chunks
    * downstream of the edit still dedup. All arithmetic is the portable
    * modular family (q43/q98's fold, one definition both engines
    * replay): token hash = char fold mod 1e9+7; window hash =
    * ((h[i-2]·1000003 + h[i-1]) mod M ·1000003 + h[i]) mod M; chunk
    * fingerprint = the same 1000003-fold over the chunk's token hashes.
    * Scale shape: token/window hashes and boundary flags are pure
    * scan-stage array ops (no shuffle); the doc-keyed chunk-index
    * window carries (doc_id, pos, th) ints — never text; the final
    * rollup keys on the 8-byte chunk fingerprint (map-side combined).
    * Output: one row per distinct chunk (fingerprint, n_docs, n_occ,
    * n_tokens, keeper_doc, shared). HASH-MATCHED.
    */
  /** Shared oracle prefix of the CDC family — the chain up to
    * `ch(doc_id, chunk, chunk_fp, n_tokens)` (token hashes → rolling
    * window hashes → mod-8 boundaries → per-chunk fingerprints). ONE
    * definition for q202 (the corpus chunk rollup) and q209 (the
    * incremental intake overlap), which must agree on every boundary
    * and fingerprint by construction. */
  private[graft] def cdcChunkCtes: String =
    """WITH tk AS (SELECT doc_id, list_filter(
      |             regexp_split_to_array(text, '\s+'), x -> x <> '') AS l
      |           FROM documents),
      |th AS (SELECT doc_id,
      |         [list_reduce(list_prepend(CAST(0 AS BIGINT),
      |            list_transform(string_split(t, ''),
      |              c -> CAST(unicode(c) AS BIGINT))),
      |            (a, b) -> (a * 131 + b) % 1000000007) FOR t IN l] AS h
      |       FROM tk),
      |w AS (SELECT doc_id, h,
      |        [CASE WHEN i >= 3 THEN
      |           ((h[i-2] * 1000003 + h[i-1]) % 1000000007 * 1000003 + h[i])
      |             % 1000000007 END
      |         FOR i IN range(1, len(h) + 1)] AS wh
      |      FROM th),
      |tok AS (SELECT doc_id, pos, h[pos] AS th,
      |          len([j FOR j IN range(4, pos + 1) IF wh[j - 1] % 8 = 0])
      |            AS chunk
      |        FROM (SELECT doc_id, h, wh,
      |                unnest(range(1, len(h) + 1)) AS pos
      |              FROM w)),
      |ch AS (SELECT doc_id, chunk,
      |         list_reduce(list_prepend(CAST(0 AS BIGINT),
      |           array_agg(th ORDER BY pos)),
      |           (a, b) -> (a * 1000003 + b) % 1000000007) AS chunk_fp,
      |         CAST(count(*) AS BIGINT) AS n_tokens
      |       FROM tok GROUP BY doc_id, chunk)""".stripMargin

  /** Spark twin of [[cdcChunkCtes]]' `ch`, as a STORED BUCKETED artifact
    * (the gpos contract for the chunk modality): the corpus is chunked
    * ONCE per (JVM, corpus), bucketed on chunk_fp so q202's rollup and
    * q209's index/new-batch joins run bucket-aligned with no exchange
    * on the fingerprint key. */
  private[graft] def cdcChunkOcc(s: SparkSession, d: String): DataFrame =
    graft.sources.ArtifactStore.bucketed(s, d, "cdcocc", Seq("chunk_fp"), 8) {
      import org.apache.spark.sql.expressions.Window
      val M = 1000000007L
      val tk = Tables.documents(s, d)
        .select(col("doc_id"), tokens(col("text")).as("l"))
        .select(col("doc_id"),
          transform(col("l"), t => portableStringHash(t)).as("h"))
        // token-less docs produce no chunks — and Spark's sequence(1, 0)
        // would otherwise generate a DESCENDING [1, 0] (the charPairs
        // pitfall) and fabricate a phantom chunk (caught by CdcChunkSpec)
        .filter(size(col("h")) > 0)
      def at(arr: Column, i: Column) = element_at(arr, i.cast("int"))
      val withWh = tk.withColumn("wh",
        transform(sequence(lit(1), size(col("h"))), i =>
          when(i >= 3,
            ((at(col("h"), i - 2) * 1000003L + at(col("h"), i - 1)) % M
              * 1000003L + at(col("h"), i)) % M)))
      // (pos, th, boundary-before) rows; chunk index via doc-keyed cumsum
      val toks = withWh
        .select(col("doc_id"),
          posexplode(zip_with(col("h"),
            transform(sequence(lit(1), size(col("h"))), i =>
              (i >= 4 && at(col("wh"), i - 1) % 8 === 0).cast("int")),
            (a, b) => struct(a.as("th"), b.as("nb")))).as(Seq("p0", "x")))
        .select(col("doc_id"), (col("p0") + 1).as("pos"),
          col("x.th").as("th"), col("x.nb").as("nb"))
      val wc = Window.partitionBy("doc_id").orderBy("pos")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      toks
        .withColumn("chunk", sum("nb").over(wc))
        .groupBy("doc_id", "chunk")
        .agg(aggregate(
            transform(array_sort(collect_list(struct(col("pos"), col("th")))),
              x => x.getField("th")),
            lit(0L), (a, b) => (a * 1000003L + b) % M).as("chunk_fp"),
          count(lit(1)).as("n_tokens"))
    }

  val q202 = QueryDef.oracle("q202_cdc_chunks",
    s"""$cdcChunkCtes
       |SELECT chunk_fp, CAST(count(DISTINCT doc_id) AS BIGINT) AS n_docs,
       |       CAST(count(*) AS BIGINT) AS n_occ,
       |       CAST(min(n_tokens) AS BIGINT) AS n_tokens,
       |       min(doc_id) AS keeper_doc,
       |       count(DISTINCT doc_id) >= 2 AS shared
       |FROM ch GROUP BY chunk_fp""".stripMargin)(
    (s, d) => cdcChunkOcc(s, d)
      .groupBy("chunk_fp")
      .agg(countDistinct("doc_id").as("n_docs"), count(lit(1)).as("n_occ"),
        min("n_tokens").as("n_tokens"), min("doc_id").as("keeper_doc"))
      .select(col("chunk_fp"), col("n_docs"), col("n_occ"), col("n_tokens"),
        col("keeper_doc"), (col("n_docs") >= 2).as("shared")))

  /** INCREMENTAL CHUNK OVERLAP — the rsync question at intake time:
    * how much of an arriving document is ALREADY STORED, chunk for
    * chunk? New batch = doc_id % 5 = 0 (the q148/q180 convention);
    * the index side is the stored chunk inventory's distinct
    * fingerprints. Complements q180's span gate: spans ask about
    * verbatim n-gram runs anywhere, chunks ask about the storage
    * units a CDC-deduped store would actually skip re-writing — and
    * boundary realignment (CdcChunkSpec) means an edited re-upload
    * still reports high overlap. Both sides read the bucketed
    * `cdcocc` artifact, so the fingerprint joins are bucket-aligned
    * with NO exchange on the key; the per-doc rollups are doc-keyed.
    * Output: one row per chunked new doc. HASH-MATCHED.
    */
  val q209 = QueryDef.oracle("q209_incremental_chunk_overlap",
    s"""$cdcChunkCtes,
       |idx AS (SELECT DISTINCT chunk_fp FROM ch WHERE doc_id % 5 <> 0),
       |nw AS (SELECT doc_id, chunk_fp, n_tokens FROM ch WHERE doc_id % 5 = 0),
       |hit AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS known_chunks,
       |               CAST(SUM(n_tokens) AS BIGINT) AS known_tokens
       |        FROM nw JOIN idx USING (chunk_fp) GROUP BY doc_id),
       |tot AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_chunks,
       |               CAST(SUM(n_tokens) AS BIGINT) AS n_tokens
       |        FROM nw GROUP BY doc_id)
       |SELECT t.doc_id, t.n_chunks, t.n_tokens,
       |       COALESCE(h.known_chunks, CAST(0 AS BIGINT)) AS known_chunks,
       |       COALESCE(h.known_tokens, CAST(0 AS BIGINT)) AS known_tokens,
       |       COALESCE(h.known_tokens, CAST(0 AS BIGINT)) * 2 >= t.n_tokens
       |         AS flagged
       |FROM tot t LEFT JOIN hit h USING (doc_id)""".stripMargin)(
    (s, d) => {
      val occ = cdcChunkOcc(s, d)
      val isNew = col("doc_id") % 5 === 0
      val idx = occ.filter(!isNew).select("chunk_fp").distinct()
      val nw = occ.filter(isNew).select("doc_id", "chunk_fp", "n_tokens")
      val hit = nw.join(idx, Seq("chunk_fp"), "left_semi")
        .groupBy("doc_id")
        .agg(count(lit(1)).as("known_chunks"), sum("n_tokens").as("known_tokens"))
      nw.groupBy("doc_id")
        .agg(count(lit(1)).as("n_chunks"), sum("n_tokens").as("n_tokens"))
        .join(hit, Seq("doc_id"), "left")
        .select(col("doc_id"), col("n_chunks"), col("n_tokens"),
          coalesce(col("known_chunks"), lit(0L)).as("known_chunks"),
          coalesce(col("known_tokens"), lit(0L)).as("known_tokens"),
          (coalesce(col("known_tokens"), lit(0L)) * 2 >= col("n_tokens"))
            .as("flagged"))
    })

  /** Near-dup pair TRANSITIVITY audit — is "near-duplicate" actually an
    * equivalence relation on this corpus, or is q56's transitive
    * closure gluing chains of barely-similar docs into mega-clusters?
    * The triangle-closure rate answers it: over the kept edge set
    * (stored scored pairs at the production threshold), count every
    * WEDGE (two edges sharing a center vertex) and the fraction whose
    * closing third edge is also a kept pair. A closure rate near 1e6
    * ppm says clusters are cliques (keep-one-per-cluster is safe); a
    * low rate says chaining — the known failure mode of closure-based
    * dedup (Lee et al. 2022 §4 discusses cluster drift) — and argues
    * for q246's k-core view instead. Wedge enumeration is a vertex-
    * keyed self-join of the adjacency list — bounded by Σdeg², i.e. by
    * near-dup cluster sizes (q213's histogram shows the tail), never
    * corpus-sized; closure check is one keyed left join back to the
    * edge set. Exact integers, 1-row output. HASH-MATCHED. */
  val q255 = QueryDef.oracle("q255_pair_transitivity",
    s"""$portableScoredCtes,
       |kept AS (SELECT ia, ib FROM scored WHERE n_match >= $PortMatchMin),
       |und AS (SELECT ia AS v, ib AS nb FROM kept
       |        UNION ALL SELECT ib, ia FROM kept),
       |wedge AS (SELECT u1.nb AS a, u2.nb AS b
       |          FROM und u1 JOIN und u2
       |            ON u1.v = u2.v AND u1.nb < u2.nb),
       |cl AS (SELECT CASE WHEN k.ia IS NOT NULL THEN 1 ELSE 0 END AS closed
       |       FROM wedge w LEFT JOIN kept k ON k.ia = w.a AND k.ib = w.b),
       |eg AS (SELECT CAST(count(*) AS BIGINT) AS n_edges FROM kept),
       |wg AS (SELECT CAST(count(*) AS BIGINT) AS n_wedges,
       |              CAST(COALESCE(SUM(closed), 0) AS BIGINT) AS n_closed
       |       FROM cl)
       |SELECT eg.n_edges, wg.n_wedges, wg.n_closed,
       |       CASE WHEN wg.n_wedges = 0 THEN NULL
       |            ELSE CAST(wg.n_closed * 1000000 // wg.n_wedges AS BIGINT)
       |       END AS closure_ppm
       |FROM eg, wg""".stripMargin)(
    (s, d) => {
      val kept = portableScoredPairs(s, d)
        .filter(col("n_match") >= PortMatchMin)
        .select("ia", "ib")
      val und = kept.select(col("ia").as("v"), col("ib").as("nb"))
        .unionByName(kept.select(col("ib").as("v"), col("ia").as("nb")))
      val wedge = und.select(col("v"), col("nb").as("a"))
        .join(und.select(col("v"), col("nb").as("b")), Seq("v"))
        .filter(col("a") < col("b"))
      val cl = wedge.join(
          kept.select(col("ia").as("a"), col("ib").as("b"),
            lit(1L).as("hit")),
          Seq("a", "b"), "left")
      val eg = kept.agg(count(lit(1)).as("n_edges"))
      val wg = cl.agg(count(lit(1)).as("n_wedges"),
        coalesce(sum("hit"), lit(0L)).cast("long").as("n_closed"))
      eg.crossJoin(wg)
        .select(col("n_edges"), col("n_wedges"), col("n_closed"),
          when(col("n_wedges") === 0, lit(null).cast("long"))
            .otherwise(expr("CAST(n_closed * 1000000 div n_wedges AS BIGINT)"))
            .as("closure_ppm"))
    })

  /** DATASET CARD — the one-row-per-source datasheet a corpus ships
    * with (Gebru et al. 2021's "Datasheets for Datasets", the numbers
    * section): size (docs, tokens, exact tokens-per-doc), dedup
    * survival under the canonical-keeper rule (stored `dedup_clusters`
    * labels — q243's chain), the dominant language with its share, and
    * mean quality — every number the EXISTING drift-pinned fragment for
    * it (labels, q41's quality formula, token counts), composed rather
    * than re-derived, so the card can never disagree with the audits
    * it summarizes. Quality is averaged in exact integer
    * ten-thousandths (per-doc scores are 4-decimal-rounded doubles, so
    * the e4 integer is exact and the SUM is partition-order-proof —
    * never a float accumulation). Scale shape: ONE corpus scan
    * (quality + token count ride it) joined to the label table, one
    * source rollup + one (source, lang) rollup with a source-keyed
    * top-1 window. Output: one row per source. HASH-MATCHED. */
  val q259 = QueryDef.oracle("q259_dataset_card", {
    val qualitySql = graft.operators.TextQueries.qualitySql
    val recursiveCtes = portableScoredCtes.replaceFirst("^WITH ", "WITH RECURSIVE ")
    s"""$recursiveCtes,
       |kept AS (SELECT ia, ib FROM scored WHERE n_match >= $PortMatchMin),
       |undir AS (SELECT ia AS a, ib AS b FROM kept UNION SELECT ib, ia FROM kept),
       |reach(a, b) AS (
       |  SELECT a, b FROM undir
       |  UNION
       |  SELECT r.a, u.b FROM reach r JOIN undir u ON r.b = u.a),
       |comp AS (
       |  SELECT d.doc_id,
       |         CASE WHEN min(r.b) IS NULL THEN d.doc_id
       |              ELSE LEAST(d.doc_id, min(r.b)) END AS cluster_id
       |  FROM documents d LEFT JOIN reach r ON r.a = d.doc_id
       |  GROUP BY d.doc_id),
       |base AS (SELECT d.doc_id, d.source, d.lang,
       |           CAST(len(regexp_extract_all(d.text, '\\S+')) AS BIGINT)
       |             AS n_tok,
       |           CAST(round(($qualitySql) * 10000) AS BIGINT) AS q4,
       |           c.doc_id = c.cluster_id AS keeper
       |         FROM documents d JOIN comp c ON d.doc_id = c.doc_id),
       |src AS (SELECT source,
       |          CAST(count(*) AS BIGINT) AS n_docs,
       |          CAST(SUM(n_tok) AS BIGINT) AS n_tokens,
       |          CAST(count(CASE WHEN keeper THEN 1 END) AS BIGINT) AS n_keepers,
       |          CAST(SUM(q4) AS BIGINT) AS q4_sum
       |        FROM base GROUP BY 1),
       |lg AS (SELECT source, lang, CAST(count(*) AS BIGINT) AS c
       |       FROM base GROUP BY 1, 2),
       |top AS (SELECT source, lang AS top_lang, c AS top_c
       |        FROM (SELECT source, lang, c,
       |                ROW_NUMBER() OVER (PARTITION BY source
       |                  ORDER BY c DESC, lang) AS rk
       |              FROM lg) WHERE rk = 1)
       |SELECT s.source, s.n_docs, s.n_tokens,
       |       CAST(s.n_tokens // s.n_docs AS BIGINT) AS tok_per_doc,
       |       CAST(s.n_keepers * 1000000 // s.n_docs AS BIGINT) AS keeper_ppm,
       |       t.top_lang,
       |       CAST(t.top_c * 1000000 // s.n_docs AS BIGINT) AS top_lang_ppm,
       |       CAST(s.q4_sum // s.n_docs AS BIGINT) AS mean_quality_e4
       |FROM src s JOIN top t ON s.source = t.source""".stripMargin})(
    (s, d) => {
      import graft.functions.TextFunctions.{qualityScore, tokenCount}
      val labels = clusterLabels(s, d)
      val base = Tables.documents(s, d)
        .select(col("doc_id"), col("source"), col("lang"),
          coalesce(tokenCount(col("text")).cast("long"), lit(0L)).as("n_tok"),
          round(qualityScore(col("text")) * 10000).cast("long").as("q4"))
        .join(labels, Seq("doc_id"))
        .withColumn("keeper", col("doc_id") === col("cluster_id"))
        .localCheckpoint(false) // one scan feeds both rollups
      val src = base.groupBy("source")
        .agg(count(lit(1)).as("n_docs"), sum("n_tok").as("n_tokens"),
          count(when(col("keeper"), 1)).cast("long").as("n_keepers"),
          sum("q4").as("q4_sum"))
      val top = base.groupBy("source", "lang").agg(count(lit(1)).as("c"))
        .withColumn("rk", row_number().over(
          org.apache.spark.sql.expressions.Window.partitionBy("source")
            .orderBy(col("c").desc, col("lang"))))
        .filter(col("rk") === 1)
        .select(col("source"), col("lang").as("top_lang"), col("c").as("top_c"))
      src.join(top, Seq("source"))
        .select(col("source"), col("n_docs"), col("n_tokens"),
          expr("CAST(n_tokens div n_docs AS BIGINT)").as("tok_per_doc"),
          expr("CAST(n_keepers * 1000000 div n_docs AS BIGINT)").as("keeper_ppm"),
          col("top_lang"),
          expr("CAST(top_c * 1000000 div n_docs AS BIGINT)").as("top_lang_ppm"),
          expr("CAST(q4_sum div n_docs AS BIGINT)").as("mean_quality_e4"))
    })

  /** LSH PARAMETER ADVISOR — the design decision behind PortBands=4 ×
    * 3 rows, derived instead of asserted: for every (bands, rows)
    * factorization of the K=12 signature, the banding S-curve
    * p(s) = 1 − (1 − sʳ)ᵇ is evaluated in EXACT integer ppm (powers by
    * an unrolled multiply-and-floor chain — both engines run the
    * identical rounding sequence, so the curve is hash-replayable
    * without a single float), producing (a) the design-space error
    * masses against the est-Jaccard 0.5 admission target — false-
    * positive mass below, false-negative mass above, on a uniform
    * 19-point similarity grid; these are data-independent and embedded
    * as Scala-computed literals in both engines (the Benford-constant
    * trick) — and (b) the DATA-side consequence: the share of the
    * corpus's observed candidate pairs (stored scored pairs, q191's
    * histogram) each alternative banding would admit. Reading the
    * output: (4,3) sits at the error-mass minimum among 12's
    * factorizations, which is exactly why the engine ships it. Scale
    * shape: one 13-row n_match histogram off the stored pairs,
    * materialized once; six constant-expression legs over it; 6-row
    * output. HASH-MATCHED. */
  val q263 = {
    val combos = Seq((1, 12), (2, 6), (3, 4), (4, 3), (6, 2), (12, 1))
    // exact-ppm pow by an unrolled multiply-floor chain: pow(x, 0) = 1e6,
    // pow(x, n) = pow(x, n-1) * x // 1e6 — the SHARED rounding sequence
    def powPpm(x: Long, n: Int): Long =
      (1 to n).foldLeft(1000000L)((acc, _) => acc * x / 1000000L)
    def pPpm(sPpm: Long, r: Int, b: Int): Long =
      1000000L - powPpm(1000000L - powPpm(sPpm, r), b)
    // data-independent grid masses, computed HERE once for both engines
    val grid = (1 to 19).map(_ * 50000L)
    val masses = combos.map { case (b, r) =>
      val fp = grid.filter(_ < 500000L).map(pPpm(_, r, b)).sum
      val fn = grid.filter(_ >= 500000L).map(s => 1000000L - pPpm(s, r, b)).sum
      (b, r, fp, fn)
    }
    // unrolled p(s) over a COLUMN s (sql expression text, shared shape)
    def powSql(x: String, n: Int): String =
      (1 to n).foldLeft("1000000")((acc, _) => s"(($acc) * ($x)) // 1000000")
    def pSql(s: String, r: Int, b: Int): String =
      s"1000000 - (${powSql(s"1000000 - (${powSql(s, r)})", b)})"
    val duckArms = masses.map { case (b, r, fp, fn) =>
      s"""SELECT $b AS bands, $r AS rows_per_band,
         |  CAST($fp AS BIGINT) AS fp_grid_ppm, CAST($fn AS BIGINT) AS fn_grid_ppm,
         |  CAST(${fp + fn} AS BIGINT) AS total_err_ppm,
         |  CAST(SUM(cnt * (${pSql("s_ppm", r, b)})) // SUM(cnt)
         |       AS BIGINT) AS admit_expect_ppm,
         |  $b = $PortBands AS is_current
         |FROM hist""".stripMargin
    }
    QueryDef.oracle("q263_lsh_parameter_advisor",
      s"""$portableScoredCtes,
         |hist AS (SELECT CAST(n_match * 1000000 // $PortK AS BIGINT) AS s_ppm,
         |           CAST(count(*) AS BIGINT) AS cnt
         |         FROM scored GROUP BY 1)
         |${duckArms.mkString("\nUNION ALL\n")}""".stripMargin)(
      (s, d) => {
        val hist = portableScoredPairs(s, d)
          .groupBy(expr(s"CAST(n_match * 1000000 div $PortK AS BIGINT)").as("s_ppm"))
          .agg(count(lit(1)).as("cnt"))
          .localCheckpoint(false) // <=13 rows feed six constant legs
        val arms = masses.map { case (b, r, fp, fn) =>
          hist.agg(
            expr("CAST(SUM(cnt * (" + pSql("s_ppm", r, b).replace("//", "div") +
              ")) div SUM(cnt) AS BIGINT)").as("admit_expect_ppm"))
            .select(lit(b).as("bands"), lit(r).as("rows_per_band"),
              lit(fp).as("fp_grid_ppm"), lit(fn).as("fn_grid_ppm"),
              lit(fp + fn).as("total_err_ppm"), col("admit_expect_ppm"),
              lit(b == PortBands).as("is_current"))
        }
        arms.reduce(_ unionByName _)
      })
  }

  /** The ONE SQL chain producing verified 3-gram-Jaccard ≥ 0.5 pairs by
    * PREFIX FILTERING — embedded verbatim by q274 and the family
    * comparison q275 (drift-spec pinned). Ends in CTE `ppairs`
    * (ia, ib, i, sz_a, sz_b). Names are p-prefixed to compose with the
    * scored-pairs chain in one WITH. Grams are the q48 3-gram
    * convention — the SAME similarity unit the LSH family estimates,
    * so q275's comparison is apples to apples. */
  private[graft] val prefixPairCtes: String =
    """ptk AS (SELECT DISTINCT doc_id,
      |          unnest([list_aggregate(l[i:i+2], 'string_agg', ' ')
      |                  FOR i IN range(1, len(l) - 1)]) AS tok
      |        FROM (SELECT doc_id, list_filter(
      |                regexp_split_to_array(text, '\s+'), x -> x <> '') AS l
      |              FROM documents)
      |        WHERE len(l) >= 3),
      |pdsz AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS sz
      |         FROM ptk GROUP BY 1),
      |pdfq AS (SELECT tok, CAST(count(*) AS BIGINT) AS df
      |         FROM ptk GROUP BY 1),
      |pord AS (SELECT t.doc_id, t.tok,
      |           CAST(ROW_NUMBER() OVER (PARTITION BY t.doc_id
      |                                   ORDER BY f.df, t.tok) AS BIGINT) AS rk,
      |           d.sz
      |         FROM ptk t JOIN pdfq f USING (tok) JOIN pdsz d USING (doc_id)),
      |ppfx AS (SELECT doc_id, tok FROM pord
      |         WHERE rk <= sz - (sz + 1) // 2 + 1),
      |pcand AS (SELECT DISTINCT a.doc_id AS ia, b.doc_id AS ib
      |          FROM ppfx a JOIN ppfx b
      |            ON a.tok = b.tok AND a.doc_id < b.doc_id),
      |pint AS (SELECT c.ia, c.ib, CAST(count(*) AS BIGINT) AS i
      |         FROM pcand c
      |         JOIN ptk ta ON ta.doc_id = c.ia
      |         JOIN ptk tb ON tb.doc_id = c.ib AND tb.tok = ta.tok
      |         GROUP BY 1, 2),
      |ppairs AS (SELECT n.ia, n.ib, n.i, sa.sz AS sz_a, sb.sz AS sz_b
      |           FROM pint n
      |           JOIN pdsz sa ON sa.doc_id = n.ia
      |           JOIN pdsz sb ON sb.doc_id = n.ib
      |           WHERE 3 * n.i >= sa.sz + sb.sz)""".stripMargin

  /** Spark twin of [[prefixPairCtes]] — verified 3-gram-Jaccard ≥ 0.5
    * pairs (ia, ib, i, sz_a, sz_b), as a STORED artifact (the
    * scored_pairs contract: the pair set is a pure function of the
    * corpus, so production builds it once at ingest and q274/q275 read
    * it back). Build shape: one gram-set materialization feeds the df
    * rollup, the prefix ranking and the verify; candidate VERIFY
    * touches only candidate-doc gram sets (broadcast semi-join before
    * the intersection joins — the portableScoredPairs trade: verify
    * cost is O(candidate docs), not O(corpus)). */
  private[graft] def prefixFilterPairs(s: SparkSession, d: String): DataFrame =
    graft.sources.ArtifactStore.table(s, d, "prefix_pairs") {
      Tables.documents(s, d).createOrReplaceTempView("graft_docs_prefix")
      graft.functions.HashFunctions.registerAll(s)
      val tk = s.sql(
        """SELECT DISTINCT doc_id, gram AS tok FROM graft_docs_prefix
          |LATERAL VIEW ngram_explode(text, 3) g AS pos, gram""".stripMargin)
        .localCheckpoint(false) // one gram-set build feeds rank + verify
      val dsz = tk.groupBy("doc_id").agg(count(lit(1)).as("sz"))
      val dfq = tk.groupBy("tok").agg(count(lit(1)).as("df"))
      val ord = tk.join(dfq, Seq("tok")).join(dsz, Seq("doc_id"))
        .withColumn("rk", row_number().over(
          org.apache.spark.sql.expressions.Window.partitionBy("doc_id")
            .orderBy(col("df"), col("tok"))).cast("long"))
      val pfx = ord.filter(col("rk") <= col("sz") - expr("(sz + 1) div 2") + 1)
        .select("doc_id", "tok")
      val cand = pfx.as("a").join(pfx.as("b"),
          col("a.tok") === col("b.tok") && col("a.doc_id") < col("b.doc_id"))
        .select(col("a.doc_id").as("ia"), col("b.doc_id").as("ib")).distinct()
        .localCheckpoint(false) // candidate pairs feed doc-set + verify
      val candDocs = cand.select(col("ia").as("doc_id"))
        .unionByName(cand.select(col("ib").as("doc_id"))).distinct()
      // verify only ever reads candidate-doc gram sets
      val ctk = tk.join(broadcast(candDocs), Seq("doc_id"))
        .localCheckpoint(false)
      val inter = cand
        .join(ctk.select(col("doc_id").as("ia"), col("tok")), Seq("ia"))
        .join(ctk.select(col("doc_id").as("ib"), col("tok")), Seq("ib", "tok"))
        .groupBy("ia", "ib").agg(count(lit(1)).as("i"))
      inter
        .join(dsz.select(col("doc_id").as("ia"), col("sz").as("sz_a")), Seq("ia"))
        .join(dsz.select(col("doc_id").as("ib"), col("sz").as("sz_b")), Seq("ib"))
        .filter(col("i") * 3 >= col("sz_a") + col("sz_b"))
        .select("ia", "ib", "i", "sz_a", "sz_b")
    }

  /** PREFIX-FILTERING similarity join (AllPairs/PPJoin family, Bayardo
    * et al. 2007) — the OTHER exact candidate-generation algorithm next
    * to LSH banding, with a guarantee banding cannot give: every pair
    * with gram-Jaccard ≥ t SHARES a prefix gram when each doc's
    * distinct 3-grams are sorted by one global (df, gram) order and only
    * the first |d| − ⌈t·|d|⌉ + 1 survive as postings — so recall is
    * EXACTLY 1 by theorem (`PrefixFilterSpec` tests it against the
    * all-pairs truth at test SF), and candidates concentrate on RARE
    * grams (a frequent gram is almost never in anyone's prefix);
    * grams are the q48 3-gram unit — the similarity the LSH family
    * ESTIMATES, here exact.
    * Verification is exact set arithmetic: |∩| by a pair-token join,
    * J ≥ ½ as the cross-multiplication 3·|∩| ≥ |a| + |b|. Scale shape:
    * gram-keyed prefix-posting self-join (bucketed by construction —
    * the LSH-banding shape with grams as bands), pair-keyed verify
    * join bounded by candidates; doc-keyed rank window only. Output:
    * verified pairs with exact jaccard_ppm. HASH-MATCHED. */
  val q274 = QueryDef.oracle("q274_prefix_filter_pairs",
    s"""WITH $prefixPairCtes
       |SELECT ia, ib, i, sz_a, sz_b,
       |       CAST(i * 1000000 // (sz_a + sz_b - i) AS BIGINT) AS jaccard_ppm
       |FROM ppairs""".stripMargin)(
    (s, d) => prefixFilterPairs(s, d)
      .withColumn("jaccard_ppm",
        expr("CAST(i * 1000000 div (sz_a + sz_b - i) AS BIGINT)")))

  /** CANDIDATE-FAMILY OVERLAP — do the engine's two independent
    * near-dup pair generators agree? The stored LSH scored pairs
    * (3-gram est-Jaccard ≥ 0.5 via 12 minhashes, q52's chain) and the
    * prefix-filter verified pairs (the SAME 3-gram Jaccard, EXACT,
    * q274's chain) measure one similarity two ways over one corpus —
    * lsh_only is the banding's false-positive surface, prefix_only its
    * recall gap, measured against exact truth rather than estimated;
    * this audit counts the Venn regions (both / LSH-only /
    * prefix-only) and each family's pair totals — the evidence for
    * "which screen catches what" before choosing an admission rule.
    * Both chains ride their SHARED drift-pinned fragments. Scale
    * shape: two pair sets (each bucketed-bounded) full-outer-merged on
    * (ia, ib); 1-row output. HASH-MATCHED. */
  val q275 = QueryDef.oracle("q275_candidate_family_overlap",
    s"""$portableScoredCtes,
       |$prefixPairCtes,
       |lshp AS (SELECT ia, ib FROM scored WHERE n_match >= $PortMatchMin),
       |pfp AS (SELECT ia, ib FROM ppairs),
       |venn AS (SELECT COALESCE(l.ia, p.ia) AS ia,
       |           l.ia IS NOT NULL AS in_lsh, p.ia IS NOT NULL AS in_pf
       |         FROM lshp l FULL OUTER JOIN pfp p
       |           ON l.ia = p.ia AND l.ib = p.ib)
       |SELECT CAST(count(CASE WHEN in_lsh THEN 1 END) AS BIGINT) AS n_lsh,
       |       CAST(count(CASE WHEN in_pf THEN 1 END) AS BIGINT) AS n_prefix,
       |       CAST(count(CASE WHEN in_lsh AND in_pf THEN 1 END) AS BIGINT)
       |         AS n_both,
       |       CAST(count(CASE WHEN in_lsh AND NOT in_pf THEN 1 END) AS BIGINT)
       |         AS n_lsh_only,
       |       CAST(count(CASE WHEN in_pf AND NOT in_lsh THEN 1 END) AS BIGINT)
       |         AS n_prefix_only
       |FROM venn""".stripMargin)(
    (s, d) => {
      val lshp = portableScoredPairs(s, d)
        .filter(col("n_match") >= PortMatchMin).select("ia", "ib")
        .withColumn("in_lsh", lit(true))
      val pfp = prefixFilterPairs(s, d).select("ia", "ib")
        .withColumn("in_pf", lit(true))
      lshp.join(pfp, Seq("ia", "ib"), "full_outer")
        .agg(count(when(col("in_lsh"), 1)).cast("long").as("n_lsh"),
          count(when(col("in_pf"), 1)).cast("long").as("n_prefix"),
          count(when(col("in_lsh") && col("in_pf"), 1)).cast("long")
            .as("n_both"),
          count(when(col("in_lsh") && col("in_pf").isNull, 1)).cast("long")
            .as("n_lsh_only"),
          count(when(col("in_pf") && col("in_lsh").isNull, 1)).cast("long")
            .as("n_prefix_only"))
    })

  /** INCREMENTAL PREFIX ADMISSION — q274's candidate family at day-2
    * intake (the q148 contract for PPJoin): new docs (doc_id % 5 = 0,
    * q148's split) probe the DAY-1 prefix index of the other 4/5 —
    * crucially under the INDEX corpus's (df, gram) order, because
    * that order was frozen when the index was built (a gram the index
    * never saw ranks df = 0, i.e. rarest-first into the new doc's
    * prefix — conservative, keeps the recall-1 theorem: both sides
    * still sort by ONE total order). Candidates verify by exact gram
    * intersection against the index gram sets; a new doc is admitted
    * iff no index partner reaches Jaccard ≥ 0.5. The whole decision
    * table is a STORED artifact (pure function of the corpus — the
    * q274/scored_pairs contract), so day-2 queries read it back.
    * Output: one row per new doc. HASH-MATCHED. */
  val q277 = QueryDef.oracle("q277_incremental_prefix_admission",
    """WITH atk AS (SELECT DISTINCT doc_id,
      |          unnest([list_aggregate(l[i:i+2], 'string_agg', ' ')
      |                  FOR i IN range(1, len(l) - 1)]) AS tok
      |        FROM (SELECT doc_id, list_filter(
      |                regexp_split_to_array(text, '\s+'), x -> x <> '') AS l
      |              FROM documents)
      |        WHERE len(l) >= 3),
      |itk AS (SELECT * FROM atk WHERE doc_id % 5 <> 0),
      |ntk AS (SELECT * FROM atk WHERE doc_id % 5 = 0),
      |idf AS (SELECT tok, CAST(count(*) AS BIGINT) AS df FROM itk GROUP BY 1),
      |isz AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS sz FROM itk GROUP BY 1),
      |nsz AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS sz FROM ntk GROUP BY 1),
      |iord AS (SELECT t.doc_id, t.tok,
      |           CAST(ROW_NUMBER() OVER (PARTITION BY t.doc_id
      |                                   ORDER BY f.df, t.tok) AS BIGINT) AS rk,
      |           z.sz
      |         FROM itk t JOIN idf f USING (tok) JOIN isz z USING (doc_id)),
      |ipfx AS (SELECT doc_id, tok FROM iord
      |         WHERE rk <= sz - (sz + 1) // 2 + 1),
      |nord AS (SELECT t.doc_id, t.tok,
      |           CAST(ROW_NUMBER() OVER (PARTITION BY t.doc_id
      |                 ORDER BY COALESCE(f.df, 0), t.tok) AS BIGINT) AS rk,
      |           z.sz
      |         FROM ntk t LEFT JOIN idf f USING (tok) JOIN nsz z USING (doc_id)),
      |npfx AS (SELECT doc_id, tok FROM nord
      |         WHERE rk <= sz - (sz + 1) // 2 + 1),
      |acand AS (SELECT DISTINCT n.doc_id AS new_id, i.doc_id AS idx_id
      |          FROM npfx n JOIN ipfx i ON n.tok = i.tok),
      |aint AS (SELECT c.new_id, c.idx_id, CAST(count(*) AS BIGINT) AS i
      |         FROM acand c
      |         JOIN ntk tn ON tn.doc_id = c.new_id
      |         JOIN itk ti ON ti.doc_id = c.idx_id AND ti.tok = tn.tok
      |         GROUP BY 1, 2),
      |hit AS (SELECT a.new_id, a.idx_id,
      |          CAST(a.i * 1000000 // (n.sz + z.sz - a.i) AS BIGINT)
      |            AS jaccard_ppm
      |        FROM aint a
      |        JOIN nsz n ON n.doc_id = a.new_id
      |        JOIN isz z ON z.doc_id = a.idx_id
      |        WHERE 3 * a.i >= n.sz + z.sz),
      |per AS (SELECT new_id, CAST(count(*) AS BIGINT) AS n_index_partners,
      |          min(idx_id) AS best_index_partner,
      |          max(jaccard_ppm) AS best_jaccard_ppm
      |        FROM hit GROUP BY 1)
      |SELECT d.doc_id,
      |       COALESCE(per.n_index_partners, CAST(0 AS BIGINT))
      |         AS n_index_partners,
      |       per.best_index_partner, per.best_jaccard_ppm,
      |       per.new_id IS NULL AS admitted
      |FROM documents d LEFT JOIN per ON per.new_id = d.doc_id
      |WHERE d.doc_id % 5 = 0""".stripMargin)(
    (s, d) => graft.sources.ArtifactStore.table(s, d, "prefix_admission") {
      Tables.documents(s, d).createOrReplaceTempView("graft_docs_prefadm")
      graft.functions.HashFunctions.registerAll(s)
      val atk = s.sql(
        """SELECT DISTINCT doc_id, gram AS tok FROM graft_docs_prefadm
          |LATERAL VIEW ngram_explode(text, 3) g AS pos, gram""".stripMargin)
        .localCheckpoint(false)
      val itk = atk.filter(col("doc_id") % 5 =!= 0)
      val ntk = atk.filter(col("doc_id") % 5 === 0)
      val idf = itk.groupBy("tok").agg(count(lit(1)).as("df"))
      val isz = itk.groupBy("doc_id").agg(count(lit(1)).as("sz"))
      val nsz = ntk.groupBy("doc_id").agg(count(lit(1)).as("sz"))
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("doc_id").orderBy(col("df"), col("tok"))
      val ipfx = itk.join(idf, Seq("tok")).join(isz, Seq("doc_id"))
        .withColumn("rk", row_number().over(w).cast("long"))
        .filter(col("rk") <= col("sz") - expr("(sz + 1) div 2") + 1)
        .select("doc_id", "tok")
      val nord = ntk.join(idf, Seq("tok"), "left_outer")
        .withColumn("df", coalesce(col("df"), lit(0L)))
        .join(nsz, Seq("doc_id"))
      val npfx = nord
        .withColumn("rk", row_number().over(w).cast("long"))
        .filter(col("rk") <= col("sz") - expr("(sz + 1) div 2") + 1)
        .select("doc_id", "tok")
      val cand = npfx.select(col("doc_id").as("new_id"), col("tok"))
        .join(ipfx.select(col("doc_id").as("idx_id"), col("tok")), Seq("tok"))
        .select("new_id", "idx_id").distinct()
        .localCheckpoint(false)
      val candNew = cand.select(col("new_id").as("doc_id")).distinct()
      val candIdx = cand.select(col("idx_id").as("doc_id")).distinct()
      val ctn = ntk.join(broadcast(candNew), Seq("doc_id"))
      val cti = itk.join(broadcast(candIdx), Seq("doc_id"))
      val inter = cand
        .join(ctn.select(col("doc_id").as("new_id"), col("tok")), Seq("new_id"))
        .join(cti.select(col("doc_id").as("idx_id"), col("tok")),
          Seq("idx_id", "tok"))
        .groupBy("new_id", "idx_id").agg(count(lit(1)).as("i"))
      val hit = inter
        .join(nsz.select(col("doc_id").as("new_id"), col("sz").as("sz_n")),
          Seq("new_id"))
        .join(isz.select(col("doc_id").as("idx_id"), col("sz").as("sz_i")),
          Seq("idx_id"))
        .filter(col("i") * 3 >= col("sz_n") + col("sz_i"))
        .select(col("new_id"), col("idx_id"),
          expr("CAST(i * 1000000 div (sz_n + sz_i - i) AS BIGINT)")
            .as("jaccard_ppm"))
      val per = hit.groupBy("new_id")
        .agg(count(lit(1)).as("n_index_partners"),
          min("idx_id").as("best_index_partner"),
          max("jaccard_ppm").as("best_jaccard_ppm"))
      Tables.documents(s, d).filter(col("doc_id") % 5 === 0)
        .select(col("doc_id"))
        .join(broadcast(per), col("doc_id") === col("new_id"), "left_outer")
        .select(col("doc_id"),
          coalesce(col("n_index_partners"), lit(0L)).as("n_index_partners"),
          col("best_index_partner"), col("best_jaccard_ppm"),
          col("new_id").isNull.as("admitted"))
    })

  /** IN-BATCH NEGATIVE RISK — the contrastive-training consequence of
    * the near-dup pair set: with in-batch negatives, a batch that
    * contains a near-dup pair trains on a FALSE negative (two
    * near-identical texts pushed apart). Under a uniform random
    * partition of the N-doc corpus into B-sized batches, a given pair
    * co-batches with probability (B−1)/(N−1), so the expected false
    * negatives are |dup_pairs|·(B−1)/(N−1) per epoch exactly (linearity
    * — no simulation), priced here per epoch and per batch in micro
    * units over a batch-size grid. The number says when dedup (or
    * cluster-aware batching, q186's stratum trick) stops being
    * optional. Pure stored-artifact + closed-form arithmetic: the pair
    * count is one scored_pairs aggregate, the grid is 3 constant rows.
    * HASH-MATCHED. */
  val q295 = QueryDef.oracle("q295_inbatch_negative_risk",
    s"""$portableScoredCtes,
       |e AS (SELECT CAST(count(*) AS BIGINT) AS n_pairs
       |      FROM scored WHERE n_match >= $PortMatchMin),
       |nd AS (SELECT CAST(count(*) AS BIGINT) AS n FROM documents),
       |grid AS (SELECT unnest([256, 1024, 4096]) AS batch_size)
       |SELECT CAST(g.batch_size AS BIGINT) AS batch_size,
       |       nd.n AS n_docs, e.n_pairs AS n_dup_pairs,
       |       CAST(CAST(e.n_pairs AS HUGEINT) * (g.batch_size - 1) * 1000000
       |            // (nd.n - 1) AS BIGINT) AS exp_false_neg_per_epoch_micro,
       |       CAST(CAST(e.n_pairs AS HUGEINT) * g.batch_size
       |            * (g.batch_size - 1) * 1000000
       |            // (CAST(nd.n AS HUGEINT) * (nd.n - 1)) AS BIGINT)
       |         AS exp_false_neg_per_batch_micro
       |FROM grid g, e, nd""".stripMargin)(
    (s, d) => {
      val e = portableScoredPairs(s, d)
        .filter(col("n_match") >= PortMatchMin)
        .agg(count(lit(1)).as("n_pairs"))
      val nd = Tables.documents(s, d).agg(count(lit(1)).as("n"))
      val grid = s.createDataFrame(Seq(256L, 1024L, 4096L).map(Tuple1(_)))
        .toDF("batch_size")
      grid.crossJoin(broadcast(e)).crossJoin(broadcast(nd))
        .select(col("batch_size"), col("n").as("n_docs"),
          col("n_pairs").as("n_dup_pairs"),
          expr("CAST(CAST(n_pairs AS DECIMAL(38,0)) * (batch_size - 1)" +
            " * 1000000 div (n - 1) AS BIGINT)")
            .as("exp_false_neg_per_epoch_micro"),
          expr("CAST(CAST(n_pairs AS DECIMAL(38,0)) * batch_size" +
            " * (batch_size - 1) * 1000000" +
            " div (CAST(n AS DECIMAL(38,0)) * (n - 1)) AS BIGINT)")
            .as("exp_false_neg_per_batch_micro"))
    })

  /** Near-dup clusters by LARGE-STAR/SMALL-STAR connected components
    * (Kiveris et al. SoCC'14) — the 100-TB CC algorithm next to q56's
    * min-label loop: min-propagation needs Θ(diameter) rounds, the
    * star alternation contracts the graph in O(log² n) worst case
    * regardless of how deep the near-dup chains run, with every round
    * two edge-keyed exchanges and no closure materialization. Same
    * edges (the stored portable scored pairs at the q52 threshold),
    * same output contract as q56, and the SAME recursive-CTE oracle —
    * so the two algorithms are driver-verified to agree label for
    * label on the corpus, and `ComponentsSpec` pins agreement plus the
    * round bound on adversarial graphs (paths, cycles, stars). */
  val q298 = QueryDef.oracle("q298_cc_large_small_star", q56.sql.get)(
    (s, d) => {
      val edges = portableScoredPairs(s, d)
        .filter(col("n_match") >= PortMatchMin)
        .select(col("ia").as("src"), col("ib").as("dst"))
      val vertices = Tables.documents(s, d).select(col("doc_id").as("id"))
      val (comp, _) = Components.connectedComponentsStar(vertices, edges)
      val sizes = comp.groupBy("component").agg(count(lit(1)).as("cluster_size"))
      comp.join(sizes, "component")
        .select(col("id").as("doc_id"), col("component").as("cluster_id"),
          col("cluster_size"),
          when(col("id") === col("component"), "keep").otherwise("drop").as("action"))
    })

  /** INCREMENTAL connected components — the day-2 path of the cluster
    * graph, completing the incremental dedup story (q148 admits new
    * docs against the stored index; q274 appends their bandrows; THIS
    * folds their new edges into the cluster labels without re-running
    * CC over history): the converged star forest of the day-1 edges is
    * the persisted state — same components as the full day-1 graph in
    * O(components) edges — and the day-2 batch's edges union onto it,
    * re-converging in O(1) alternation rounds for bounded-diameter
    * deltas. Split rule here: docs with doc_id % 10 = 0 are the day-2
    * arrivals (their pairs are the delta; everything else is day-1
    * state). Correctness is structural — a star forest preserves
    * connectivity, so components(forest(day1) ∪ delta) =
    * components(day1 ∪ delta) — and the oracle proves it end to end:
    * the SAME recursive-closure SQL as q56/q298 over ALL kept pairs,
    * so the incremental path must land on the very labels a full
    * recompute yields. Output: the q56 contract (doc_id, cluster_id,
    * cluster_size, action). HASH-MATCHED. */
  val q304 = QueryDef.oracle("q304_cc_incremental", q56.sql.get)(
    (s, d) => {
      val kept = portableScoredPairs(s, d)
        .filter(col("n_match") >= PortMatchMin)
        .select(col("ia").as("src"), col("ib").as("dst"))
      val isNew = (c: org.apache.spark.sql.Column) => c % 10 === 0
      val delta = kept.filter(isNew(col("src")) || isNew(col("dst")))
      // the day-1 forest IS the persisted incremental-CC state — a pure
      // function of the corpus, stored like the band index, so each run
      // (and production's day-2 job) pays only the delta re-convergence
      val state = graft.sources.ArtifactStore.table(s, d, "ccforest") {
        Components.starForest(
          kept.filter(!isNew(col("src")) && !isNew(col("dst"))))._1
      }
      val (merged, _) = Components.starForest(state.unionByName(delta))
      val vertices = Tables.documents(s, d).select(col("doc_id").as("id"))
      val comp = Components.starLabels(vertices, merged)
      val sizes = comp.groupBy("component").agg(count(lit(1)).as("cluster_size"))
      comp.join(sizes, "component")
        .select(col("id").as("doc_id"), col("component").as("cluster_id"),
          col("cluster_size"),
          when(col("id") === col("component"), "keep").otherwise("drop").as("action"))
    })

  /** DELETION-NEIGHBORHOOD JOIN (the SymSpell/FastSS blocking scheme) —
    * the FIFTH candidate-generation family beside the suite's gram
    * postings, LSH bands, prefix filters and Hamming blocks, specialized
    * to EDIT distance on short keys: two strings within Levenshtein
    * distance 1 MUST share a member of {self} ∪ {one-character
    * deletions} (deletion → the shorter string itself; insertion →
    * symmetric; substitution → both delete the edited position), so
    * generating L+1 variants per key and equi-joining on the variant
    * finds every distance-1 pair while verifying only candidates —
    * never the O(n²) cross. Run over the customer entity keys, where
    * near-identical identifiers are the master-data hazard (fat-finger
    * duplicates, OCR'd IDs): every c_name pair one edit apart, with
    * both custkeys — the fuzzy-entity-resolution feed. The recall-1
    * theorem is spec-pinned on random strings with a random edit
    * (`DeletionNeighborhoodSpec`); false candidates (distance-2 pairs
    * sharing a variant, e.g. transpositions) are removed by the exact
    * `levenshtein` verify, identical unit-cost semantics both engines.
    * The engine never runs a per-pair edit-distance DP at all: each
    * variant carries its deletion POSITION (0 = the identity variant),
    * and a candidate pair is distance-1 EXACTLY when some shared
    * variant has posA=0, posB=0, or posA=posB (identity∩deletion =
    * insert/delete; same-position deletions on different strings =
    * substitution) — so verification is a predicate on the join row,
    * not a string algorithm (a first cut verified with
    * `levenshtein()` and measured 12.5 s at sf0.1 — the DP dominated;
    * this shape runs the same output in ~2 s). The ORACLE keeps the
    * definitional `levenshtein = 1`, so the witness⟺distance theorem
    * is machine-checked against DuckDB at every SF, and
    * `DeletionNeighborhoodSpec` pins it on random single edits.
    * Scale shape: |keys|·(L+1) variant rows (bounded — entity keys are
    * short), equi-join group sizes bounded by the alphabet, pair
    * distinct on 16-byte key pairs (names re-attached from a broadcast
    * dim); the corpus is touched once. Output: one row per distance-1
    * pair (key_a < key_b). HASH-MATCHED. */
  val q310 = QueryDef.oracle("q310_deletion_neighborhood_join",
    """WITH names AS (SELECT c_custkey AS k, c_name AS nm FROM customer),
      |vars AS (
      |  SELECT k, nm, unnest(list_distinct(list_append(
      |           [substr(nm, 1, i - 1) || substr(nm, i + 1, len(nm))
      |            FOR i IN range(1, len(nm) + 1)], nm))) AS v
      |  FROM names),
      |cand AS (
      |  SELECT DISTINCT a.nm AS name_a, b.nm AS name_b,
      |         a.k AS key_a, b.k AS key_b
      |  FROM vars a JOIN vars b ON a.v = b.v AND a.k < b.k)
      |SELECT name_a, name_b, key_a, key_b FROM cand
      |WHERE levenshtein(name_a, name_b) = 1""".stripMargin)(
    (s, d) => {
      // r15 optimization, two parallelism floors (guide §2.5): the
      // variant explode ran inside the single-task customer scan
      // (single-row-group file), and the self-join's reduce stage —
      // where the candidate verification CPU lives — was AQE-coalesced
      // to one partition because its BYTES are tiny while its CPU is
      // not. The parallelScan spreads the explode; the explicit-N
      // join-key repartition is user-specified partitioning, which AQE
      // never coalesces and the v-equi-join reuses directly (no extra
      // exchange — it replaces the join's own).
      val p = s"$d/customer.parquet"
      val names = Tables.parallelScan(s, p, s.read.parquet(p), "c_custkey")
        .select(col("c_custkey").as("k"), col("c_name").as("nm"))
      val vars = keyVariants(names)
        .repartition(s.sparkContext.defaultParallelism, col("v"))
      val cand = vars.alias("a").join(vars.alias("b"),
          col("a.v") === col("b.v") && col("a.k") < col("b.k") &&
            col("a.nm") =!= col("b.nm") &&
            witnessPred(col("a.pos"), col("b.pos")))
        .select(col("a.k").as("key_a"), col("b.k").as("key_b"))
        .distinct()
      cand
        .join(broadcast(names.select(col("k").as("key_a"), col("nm").as("name_a"))),
          Seq("key_a"))
        .join(broadcast(names.select(col("k").as("key_b"), col("nm").as("name_b"))),
          Seq("key_b"))
        .select(col("name_a"), col("name_b"), col("key_a"), col("key_b"))
    })

  /** q310's deletion-variant rows — (input columns) + (v, pos), pos 0 =
    * identity. ONE definition shared by the batch join and the
    * streaming [[graft.streaming.DocStreams.keyCollisionGate]], so the
    * gate cannot drift from the query it twins. Works on any frame
    * with a `nm` string column (extra columns, e.g. a stream's event
    * time, pass through). */
  private[graft] def keyVariants(names: DataFrame): DataFrame =
    names.withColumn("w", explode(expr("array_append(" +
      "transform(sequence(1, length(nm))," +
      " i -> struct(concat(substr(nm, 1, i - 1)," +
      "               substr(nm, i + 1, length(nm))) AS v, i AS pos))," +
      " struct(nm AS v, 0 AS pos))")))
      .withColumn("v", col("w.v")).withColumn("pos", col("w.pos"))
      .drop("w")

  /** The positional witness (q310's verification predicate): a shared
    * variant proves distance 1 exactly when one side is the identity
    * or both deleted the same position. */
  private[graft] def witnessPred(pa: Column, pb: Column): Column =
    pa === 0 || pb === 0 || pa === pb

  /** EXACT-SUBSTRING duplication mass via PREFIX-DOUBLING suffix ranks
    * — the scalable backbone of exact-substring dedup (Lee et al. 2022
    * build suffix arrays to find 50-token repeats; this is the
    * distributed construction): round j assigns every token position a
    * rank such that two positions share rank_j iff their 2^j-token
    * prefixes are IDENTICAL — r0 is the dense rank of the token itself
    * (exact, collision-free by construction, unlike a hash key), and
    * each round re-ranks the pair (rank_j[i], rank_j[i+2^j]) so
    * equality doubles in reach while only TWO LONGS per position ever
    * cross an exchange (grouping raw 16-token windows would shuffle
    * ~100-byte keys; the doubling ships 16 bytes per round — the whole
    * point at 100 TB). The shift join is (doc, pos)-keyed; the per-round
    * re-numbering rides the DISTINCT pair table through hashBucketRank
    * (hash-bucketed keyed rank, equality-only injective ids — NO
    * zero-key window; the pair table is DATA-sized so the old global
    * window was the r13 verdict's one scale-killer). Counted at rounds 2 and
    * 4: positions whose 4-/16-token window recurs anywhere (dup) and in
    * ANOTHER doc (cross-doc — the contamination/memorization surface,
    * q118's decontam risk measured at exact-match grain). The DuckDB
    * oracle is INDEPENDENT-ALGORITHM (q56's discipline): it groups the
    * actual token-array slices by value — definition, not replay — so a
    * doubling bug cannot hide. Since r15 a READ-BACK consumer of the
    * stored [[storedSuffixRanks]] artifact (the chain is built once per
    * corpus; q353 keeps the live chain plan-proven). Scale shape: one
    * bucketed artifact scan → ONE stacked (round, rank)-keyed rollup
    * (exchange-free — the scan is bucketed on exactly those keys) →
    * 2-row report. Output: one row per prefix length. HASH-MATCHED. */
  /** Shared distributed prefix-doubling suffix-rank builder (q329/q339
    * and the streaming inventory): round j's table assigns every token
    * position (doc_id, i) a long rank such that two positions share
    * rank_j iff their 2^j-token prefixes are identical. Round 0 ranks
    * the token itself (vocab-sized distinct); each later round re-ranks
    * the pair (rank[i], rank[i+2^j-1]) so equality reach doubles while
    * only TWO LONGS per position cross an exchange. EVERY renumber —
    * the round-0 vocab rank and each round's distinct-pair rank — is
    * [[graft.pipeline.Clean.hashBucketRank]]: hash-bucketed keyed
    * dense_rank composing the injective id bucket·2⁴²+local_rank, so NO
    * zero-key window exists anywhere in the lineage (the r13 verdict's
    * one named 100-TB scale-killer, fixed — the distinct-pair table is
    * DATA-sized at 16-token grain, ~91% of positions unique on this
    * corpus, so the old single-partition renumber would funnel
    * trillions of rows through one task at 100 TB). The doubling only
    * ever tests rank EQUALITY, which is why the equality-only hash form
    * (one keyed exchange, no range-sampling pass, no driver action)
    * beats the order-consistent keyedGroupRank here. Each round's pair
    * table is pinned once (lazy localCheckpoint) for its two consumers
    * (the distinct and the join-back). Returns (per-doc token lengths,
    * rank table per round 1..maxRound).
    */
  private def suffixRankRounds(s: SparkSession, d: String, maxRound: Int)
      : (DataFrame, Map[Int, DataFrame]) = {
    import graft.pipeline.Clean
    val base = Tables.documentsParallel(s, d)
      .select(col("doc_id"), posexplode(tokens(col("text")))
        .as(Seq("i", "tok")))
    val nl = base.groupBy("doc_id").agg(count(lit(1)).as("len"))
      .localCheckpoint(false) // joined by every arm
    // vr is the VOCAB rank table — data-GROWING (the r13 verdict #4
    // class), so no broadcast hint: round 0 uses the same plain
    // tok-keyed shuffle-join shape as every later round's keyed
    // exchange (r14 advisor — a hinted corpus-vocab broadcast would
    // OOM driver/executors at the 100-TB target)
    val vr = Clean.hashBucketRank(base.select("tok").distinct(), Seq("tok"), "r0")
    var cur = base.join(vr, Seq("tok"))
      .select(col("doc_id"), col("i"), col("r0").as("r"))
      .localCheckpoint(false)
    val snaps = scala.collection.mutable.Map.empty[Int, DataFrame]
    for (j <- 1 to maxRound) {
      val h = 1 << (j - 1)
      val shifted = cur.select(col("doc_id"), (col("i") - h).as("i"),
        col("r").as("rb"))
      val pair = cur.join(shifted, Seq("doc_id", "i"), "left")
        .select(col("doc_id"), col("i"), col("r"),
          coalesce(col("rb"), lit(-1L)).as("rb"))
        .localCheckpoint(false) // 2 consumers: the distinct and the join-back
      val rk = Clean.hashBucketRank(pair.select("r", "rb").distinct(),
        Seq("r", "rb"), "nr")
      cur = pair.join(rk, Seq("r", "rb"))
        .select(col("doc_id"), col("i"), col("nr").as("r"))
        .localCheckpoint(false)
      snaps(j) = cur
    }
    (nl, snaps.toMap)
  }

  /** The CONSUMED suffix-rank snapshots as a stored artifact (r14
    * verdict #2 — the chain was 12.9 s of the round's 21.3 s new-op
    * budget, recomputed by BOTH q329 (rounds ≤4) and q339 (rounds ≤6)):
    * one bucketed corpus-keyed table holding, for each consumed round
    * j ∈ {2, 4, 5, 6}, every VALID position (the i + 2^j ≤ len filter
    * both consumers always apply, pre-applied at build) with its rank —
    * columns (round, doc_id, i0, r). The gpos/bandrows/codebooks
    * pattern: built ONCE per (JVM, corpus snapshot), staleness-
    * fingerprinted by [[graft.sources.ArtifactStore]], read back by
    * every consumer; at 100 TB the ingest pipeline owns the build and
    * this is a warehouse table refreshed on corpus append. Bucketed +
    * sorted on (round, r) — exactly the rollup/join keys of both
    * consumers, so the read-back plans carry NO exchange between the
    * scan and the rank-keyed aggregates (HashPartitioning(round, r)
    * satisfies every (round, r, …) clustering downstream). The live
    * chain itself stays plan-proven by q353 (the q99 convention: the
    * artifact build and the proof query run the SAME builder, everyone
    * else reads the table). */
  private[graft] val SuffixRankRounds = Seq(2, 4, 5, 6)
  private[graft] def storedSuffixRanks(s: SparkSession, d: String): DataFrame =
    graft.sources.ArtifactStore.bucketed(s, d, "suffranks",
      Seq("round", "r"), 8) {
      val (nl, snaps) = suffixRankRounds(s, d, maxRound = SuffixRankRounds.max)
      SuffixRankRounds.map { j =>
        val l = 1 << j
        snaps(j).join(nl, Seq("doc_id"))
          .filter(col("i") + l <= col("len"))
          .select(lit(j).as("round"), col("doc_id"),
            col("i").cast("long").as("i0"), col("r"))
      }.reduce(_ unionByName _)
    }

  val q329 = {
    val arms = Seq(2, 4) // rounds → prefix lengths 4, 16
    def duckArm(l: Int): String =
      s"""p$l AS (SELECT doc_id, l[CAST(i AS INT):CAST(i + $l - 1 AS INT)] AS s
         |        FROM toks, unnest(range(1, len(l) - $l + 2)) AS t$l(i)),
         |g$l AS (SELECT s, CAST(count(*) AS BIGINT) AS n,
         |          CAST(count(DISTINCT doc_id) AS BIGINT) AS nd
         |        FROM p$l GROUP BY 1)""".stripMargin
    def duckSel(l: Int): String =
      s"""SELECT CAST($l AS BIGINT) AS prefix_len,
         |  CAST(SUM(n) AS BIGINT) AS n_positions,
         |  CAST(SUM(CASE WHEN n > 1 THEN n ELSE 0 END) AS BIGINT)
         |    AS dup_positions,
         |  CAST(SUM(CASE WHEN n > 1 THEN n ELSE 0 END) * 1000000
         |       // SUM(n) AS BIGINT) AS dup_ppm,
         |  CAST(SUM(CASE WHEN nd > 1 THEN n ELSE 0 END) AS BIGINT)
         |    AS cross_doc_positions,
         |  CAST(SUM(CASE WHEN nd > 1 THEN n ELSE 0 END) * 1000000
         |       // SUM(n) AS BIGINT) AS cross_doc_ppm,
         |  CAST(count(CASE WHEN n > 1 THEN 1 END) AS BIGINT) AS dup_groups
         |FROM g$l""".stripMargin
    QueryDef.oracle("q329_exact_substring_mass",
      s"""WITH toks AS (SELECT doc_id, list_filter(
         |                regexp_split_to_array(text, '\\s+'), x -> x <> '') AS l
         |              FROM documents),
         |${duckArm(4)},
         |${duckArm(16)}
         |${duckSel(4)}
         |UNION ALL
         |${duckSel(16)}""".stripMargin)(
      (s, d) => {
        val rt = storedSuffixRanks(s, d)
          .filter(col("round").isin(arms: _*))
        rt.groupBy("round", "r")
          .agg(count(lit(1)).as("n"), countDistinct("doc_id").as("nd"))
          .groupBy("round")
          .agg(sum("n").as("n_positions"),
            sum(when(col("n") > 1, col("n")).otherwise(0L))
              .as("dup_positions"),
            sum(when(col("nd") > 1, col("n")).otherwise(0L))
              .as("cross_doc_positions"),
            count(when(col("n") > 1, 1)).cast("long").as("dup_groups"))
          .select(expr("CAST(shiftleft(1, round) AS BIGINT)").as("prefix_len"),
            col("n_positions"),
            col("dup_positions"),
            expr("CAST(dup_positions * 1000000 div n_positions AS BIGINT)")
              .as("dup_ppm"),
            col("cross_doc_positions"),
            expr("CAST(cross_doc_positions * 1000000 div n_positions" +
              " AS BIGINT)").as("cross_doc_ppm"),
            col("dup_groups"))
      })
  }

  /** EXACT-SUBSTRING DUPLICATE SPANS — q329 extended to the Lee et al.
    * 2022 operating point (r13 verdict #5): rounds 5–6 of the shared
    * prefix-doubling builder give 32-/64-token window ranks (the paper
    * deduplicates at 50 tokens; 32/64 bracket it at power grain), and
    * this query emits the CONCRETE REMOVABLE SPANS a production
    * exact-substring dedup pass cuts — q178's keep-first rule lifted
    * from 5-gram to suffix-rank grain: within each rank group (identical
    * L-token window) the corpus-canonical occurrence — the lexicographic
    * min (doc_id, pos) STRUCT, collision-free at any document length —
    * is the keeper; every OTHER occurrence is removable. Removable
    * window starts merge per doc into maximal spans when they overlap
    * or touch (gap ≤ L), via a doc-KEYED lag/cumsum window — never a
    * global one. The rank grouping uses the keyed renumber throughout
    * (suffixRankRounds — no zero-key window at any round). The DuckDB
    * oracle is INDEPENDENT-ALGORITHM: it groups actual token-array
    * slices, picks the same min-key keeper, and rebuilds islands from
    * the definition. `ExactSubstringSpansSpec` proves the containment
    * theorem: every span lies inside the UNION of q175's 5-gram dup
    * islands on the same corpus (an L-dup window's every 5-gram recurs,
    * so each constituent window sits inside ONE island; the merged span
    * sits inside their union). Since r15 a READ-BACK consumer of the
    * stored [[storedSuffixRanks]] artifact (rounds 5–6; q353 keeps the
    * live chain plan-proven). Scale shape: one bucketed artifact scan →
    * stacked (round, rank)-keyed rollup + join-back (both exchange-free
    * on the bucketed keys) → (round, doc)-keyed island merge.
    * Output: one row per removable span per grain. HASH-MATCHED. */
  /** Shared q339-grain span ORACLE fragments (OracleFragmentDriftSpec
    * pins the consumer set): the tokenized-corpus CTE and the per-grain
    * chain positions → keeper groups → removable starts (dup$l) →
    * doc-keyed islands → maximal spans (sp$l). Every consumer of the
    * exact-substring span product must interpolate THESE — a forked
    * copy would silently decouple the cut list from the report. */
  private[graft] val spanSuffixToksCte: String =
    """toks AS (SELECT doc_id, list_filter(
      |           regexp_split_to_array(text, '\s+'), x -> x <> '') AS l
      |         FROM documents)""".stripMargin

  private[graft] def spanSuffixDuckArm(l: Int): String =
    s"""p$l AS (SELECT doc_id, CAST(i - 1 AS BIGINT) AS i0,
       |          l[CAST(i AS INT):CAST(i + $l - 1 AS INT)] AS s
       |        FROM toks, unnest(range(1, len(l) - $l + 2)) AS t$l(i)),
       |g$l AS (SELECT s, count(*) AS n,
       |          min({'d': doc_id, 'p': i0}) AS keeper
       |        FROM p$l GROUP BY s),
       |dup$l AS (SELECT p.doc_id, p.i0
       |          FROM p$l p JOIN g$l g USING (s)
       |          WHERE g.n > 1 AND NOT (p.doc_id = struct_extract(g.keeper, 'd')
       |                                 AND p.i0 = struct_extract(g.keeper, 'p'))),
       |brk$l AS (SELECT doc_id, i0,
       |            CASE WHEN i0 - lag(i0) OVER (PARTITION BY doc_id ORDER BY i0)
       |                   <= $l THEN 0 ELSE 1 END AS brk
       |          FROM dup$l),
       |isl$l AS (SELECT doc_id, i0, SUM(brk) OVER (PARTITION BY doc_id
       |            ORDER BY i0 ROWS UNBOUNDED PRECEDING) AS isl
       |          FROM brk$l),
       |sp$l AS (SELECT CAST($l AS BIGINT) AS prefix_len, doc_id,
       |           min(i0) AS span_start, max(i0) + $l AS span_end,
       |           max(i0) + $l - min(i0) AS span_tokens,
       |           CAST(count(*) AS BIGINT) AS n_starts
       |         FROM isl$l GROUP BY doc_id, isl)""".stripMargin

  /** Removable window STARTS per grain (pre-island) — the shared Spark
    * leg of the span family, a read-back consumer of
    * [[storedSuffixRanks]]: within each (round, rank) group the keeper
    * is the lexicographic min (doc_id, pos) STRUCT — collision-free at
    * ANY document length (the r14 advisor's finding: the old
    * doc_id·10⁶+pos encoding collides for docs ≥ 1e6 tokens, exactly
    * the long documents the Lee-et-al operating point targets) — and
    * every other occurrence is a removable start. Returns
    * (round, l, doc_id, i0). NOTE: island coverage ≡ start coverage
    * (gap ≤ L merging unions exactly the window intervals), so cut
    * consumers (q355) may use starts directly. */
  private[graft] def removableSpanStarts(s: SparkSession, d: String,
      rounds: Seq[Int]): DataFrame = {
    val rt = storedSuffixRanks(s, d)
      .filter(col("round").isin(rounds: _*))
    val grp = rt.groupBy("round", "r")
      .agg(count(lit(1)).as("n"),
        min(struct(col("doc_id"), col("i0"))).as("keeper"))
    rt.join(grp, Seq("round", "r"))
      .filter(col("n") > 1 && !(col("doc_id") === col("keeper.doc_id") &&
        col("i0") === col("keeper.i0")))
      .withColumn("l", expr("CAST(shiftleft(1, round) AS BIGINT)"))
      .select("round", "l", "doc_id", "i0")
  }

  /** Maximal removable spans per grain: starts merged per (round, doc)
    * when they overlap or touch (gap ≤ L) via a doc-KEYED lag/cumsum
    * window — never a global one. Returns q339's output shape. */
  private[graft] def removableSpans(s: SparkSession, d: String,
      rounds: Seq[Int]): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val dup = removableSpanStarts(s, d, rounds)
    val w = Window.partitionBy("round", "doc_id").orderBy("i0")
    val brk = dup
      .withColumn("brk", when(col("i0") - lag("i0", 1).over(w) <= col("l"), 0L)
        .otherwise(1L))
      .withColumn("isl", sum("brk").over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    brk.groupBy("round", "l", "doc_id", "isl")
      .agg(min("i0").as("span_start"),
        (max("i0") + col("l")).as("span_end"),
        (max("i0") + col("l") - min("i0")).as("span_tokens"),
        count(lit(1)).as("n_starts"))
      .select(col("l").as("prefix_len"), col("doc_id"),
        col("span_start"), col("span_end"), col("span_tokens"),
        col("n_starts"))
  }

  val q339 = {
    val grains = Seq(5, 6) // rounds → window lengths 32, 64
    QueryDef.oracle("q339_exact_substring_spans",
      s"""WITH $spanSuffixToksCte,
         |${spanSuffixDuckArm(32)},
         |${spanSuffixDuckArm(64)}
         |SELECT * FROM sp32 UNION ALL SELECT * FROM sp64""".stripMargin)(
      (s, d) => removableSpans(s, d, grains))
  }

  /** EXACT-SUBSTRING INCREMENTAL ADMISSION — the intake gate at
    * exact-match grain (r13 verdict #7): each arriving (day-2) document
    * is checked against the STORED 16-token window-digest inventory of
    * the index corpus (gpos16, built once at ingest like gpos5/gpos3),
    * and the verdict reports the EXACT duplicated geometry — matched
    * windows merged into maximal runs per doc (the q339 island rule at
    * intake), total covered tokens, and the LONGEST contiguous
    * duplicated run. Flag rule: longest run ≥ 32 tokens (a full q339-
    * grain copy survived inside the arrival — q118's decontam risk at
    * exact-match grain) OR ≥ half the doc covered (q180's mass rule).
    * This closes the intake family: q180 gates on 5-gram mass (blind
    * to WHERE), this gate on 16-token exact windows with run geometry;
    * the streaming twin is `DocStreams.exactSubstringGate` (stateless
    * stream-static join against the same stored inventory,
    * stream-≡-batch spec-pinned). Scale shape: arrivals-only gram
    * explode → keyed left-semi against the bucketed inventory →
    * doc-KEYED island windows → per-doc rollup. Output: one row per
    * arriving doc. HASH-MATCHED. */
  val q340 = {
    val L = 16
    QueryDef.oracle("q340_exact_substring_admission",
      s"""${spanGposCtesAt(L)},
         |idx AS (SELECT DISTINCT gh FROM gpos WHERE doc_id % 5 <> 0),
         |hit AS (SELECT g.doc_id, g.pos FROM gpos g JOIN idx USING (gh)
         |        WHERE g.doc_id % 5 = 0),
         |brk AS (SELECT doc_id, pos,
         |          CASE WHEN pos - lag(pos) OVER (PARTITION BY doc_id ORDER BY pos)
         |                 <= $L THEN 0 ELSE 1 END AS b
         |        FROM hit),
         |isl AS (SELECT doc_id, pos, SUM(b) OVER (PARTITION BY doc_id
         |          ORDER BY pos ROWS UNBOUNDED PRECEDING) AS grp
         |        FROM brk),
         |runs AS (SELECT doc_id, min(pos) AS s, max(pos) + $L AS e,
         |           CAST(count(*) AS BIGINT) AS nw
         |         FROM isl GROUP BY doc_id, grp),
         |per AS (SELECT doc_id, CAST(SUM(e - s) AS BIGINT) AS covered_tokens,
         |          CAST(MAX(e - s) AS BIGINT) AS longest_run_tokens,
         |          CAST(SUM(nw) AS BIGINT) AS n_dup_windows
         |        FROM runs GROUP BY doc_id)
         |SELECT t.doc_id, CAST(len(l) AS BIGINT) AS n_tokens,
         |       CAST(GREATEST(len(l) - ${L - 1}, 0) AS BIGINT) AS n_windows,
         |       COALESCE(n_dup_windows, CAST(0 AS BIGINT)) AS n_dup_windows,
         |       COALESCE(covered_tokens, CAST(0 AS BIGINT)) AS covered_tokens,
         |       COALESCE(longest_run_tokens, CAST(0 AS BIGINT)) AS longest_run_tokens,
         |       COALESCE(longest_run_tokens >= ${2 * L}, FALSE)
         |         OR (len(l) > 0 AND COALESCE(covered_tokens, 0) * 2 >= len(l))
         |         AS flagged
         |FROM toks t LEFT JOIN per USING (doc_id)
         |WHERE t.doc_id % 5 = 0""".stripMargin)(
      (s, d) => {
        import org.apache.spark.sql.expressions.Window
        val g = storedGramPositions(s, d, L)
        val isNew = col("doc_id") % 5 === 0
        val idx = g.filter(!isNew).select("gh").distinct()
        val hit = g.filter(isNew).join(idx, Seq("gh"), "left_semi")
          .select("doc_id", "pos")
        val w = Window.partitionBy("doc_id").orderBy("pos")
        val runs = hit
          .withColumn("b", when(col("pos") - lag("pos", 1).over(w) <= L, 0L)
            .otherwise(1L))
          .withColumn("grp", sum("b").over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
          .groupBy("doc_id", "grp")
          .agg(min("pos").as("s"), (max("pos") + L).as("e"),
            count(lit(1)).as("nw"))
        val per = runs.groupBy("doc_id").agg(
          sum(col("e") - col("s")).cast("long").as("covered_tokens"),
          max(col("e") - col("s")).cast("long").as("longest_run_tokens"),
          sum("nw").as("n_dup_windows"))
        Tables.documents(s, d).filter(isNew)
          .select(col("doc_id"),
            size(tokens(coalesce(col("text"), lit("")))).cast("long").as("n_tokens"))
          .join(per, Seq("doc_id"), "left")
          .select(col("doc_id"), col("n_tokens"),
            greatest(col("n_tokens") - (L - 1), lit(0L)).as("n_windows"),
            coalesce(col("n_dup_windows"), lit(0L)).as("n_dup_windows"),
            coalesce(col("covered_tokens"), lit(0L)).as("covered_tokens"),
            coalesce(col("longest_run_tokens"), lit(0L)).as("longest_run_tokens"),
            (coalesce(col("longest_run_tokens") >= 2 * L, lit(false)) ||
              (col("n_tokens") > 0 &&
                coalesce(col("covered_tokens"), lit(0L)) * 2 >= col("n_tokens")))
              .as("flagged"))
      })
  }

  /** SHINGLE-SIZE ADVISOR — the knob every gram-grain artifact in this
    * engine is built on (gpos3 feeds q148/q164, gpos5 the q175/q178
    * span family + winnowing, gpos16 the q340 intake gate), priced per
    * candidate w ∈ {3, 5, 8, 16} from ONE stacked scan: positions
    * (postings rows — the index's fact side), distinct grams
    * (dictionary side), duplicated-position mass and its cross-doc part
    * (what the gate can SEE at that grain, in exact ppm), and dup
    * groups. The tradeoff the table shows: small w = bigger dup mass
    * (more sensitive, more false-positive-ish matches, bigger
    * dictionary share per position), large w = exact-copy-only. This
    * is the decision table read BEFORE building a gram inventory at
    * 100 TB — the gram-grain sibling of q263's (b, r) banding advisor.
    * Scale shape: one corpus scan stacked ×4 → (w, gh)-keyed rollup →
    * 4-row advisor table. Output: one row per w. HASH-MATCHED. */
  val q342 = {
    val ws = Seq(3, 5, 8, 16)
    def duckArm(w: Int): String =
      s"""SELECT $w AS w, doc_id,
         |  md5(list_aggregate(l[i:i+${w - 1}], 'string_agg', ' ')) AS gh
         |FROM toks, unnest(range(1, len(l) - $w + 2)) AS t$w(i)""".stripMargin
    QueryDef.oracle("q342_shingle_size_advisor",
      s"""WITH toks AS (SELECT doc_id, list_filter(
         |                COALESCE(regexp_split_to_array(text, '\\s+'), []),
         |                x -> x <> '') AS l
         |              FROM documents),
         |st AS (${ws.map(duckArm).mkString("\nUNION ALL\n")}),
         |g AS (SELECT w, gh, CAST(count(*) AS BIGINT) AS n,
         |        CAST(count(DISTINCT doc_id) AS BIGINT) AS nd
         |      FROM st GROUP BY 1, 2)
         |SELECT CAST(w AS BIGINT) AS w,
         |  CAST(SUM(n) AS BIGINT) AS n_positions,
         |  CAST(count(*) AS BIGINT) AS n_distinct_grams,
         |  CAST(SUM(CASE WHEN n > 1 THEN n ELSE 0 END) AS BIGINT)
         |    AS dup_positions,
         |  CAST(SUM(CASE WHEN n > 1 THEN n ELSE 0 END) * 1000000
         |       // SUM(n) AS BIGINT) AS dup_ppm,
         |  CAST(SUM(CASE WHEN nd > 1 THEN n ELSE 0 END) AS BIGINT)
         |    AS cross_doc_positions,
         |  CAST(SUM(CASE WHEN nd > 1 THEN n ELSE 0 END) * 1000000
         |       // SUM(n) AS BIGINT) AS cross_doc_ppm,
         |  CAST(count(CASE WHEN n > 1 THEN 1 END) AS BIGINT) AS dup_groups
         |FROM g GROUP BY 1""".stripMargin)(
      (s, d) => {
        // r16 optimization: (1) the pinned text read is WIDENED first
        // (documentsParallel) — the old 1-partition checkpoint made each
        // of the four gram arms explode single-threaded (one 4-task
        // stage carrying 6.7 s of CPU at sf0.1); (2) the rollup groups
        // on unhex(md5) — the 16-byte binary digest is bijective to the
        // 32-char hex string, so group identity and every count are
        // unchanged while the exchange key halves (guide §2.3);
        // (3) countDistinct(doc_id) is gone — the advisor only consumes
        // nd > 1, which is exactly min(doc_id) ≠ max(doc_id), so the
        // Expand that doubled the gram shuffle is removed outright.
        val docs = Tables.documentsParallel(s, d)
          .select(col("doc_id"), coalesce(col("text"), lit("")).as("text"))
          .localCheckpoint(false) // one text read feeds all four arms
        val st = ws.map { w =>
          docs.select(lit(w).as("w"), col("doc_id"),
            explode(wordNgrams(col("text"), w)).as("gram"))
            .select(col("w"), col("doc_id"), unhex(md5(col("gram"))).as("gh"))
        }.reduce(_ unionByName _)
        st.groupBy("w", "gh")
          .agg(count(lit(1)).as("n"), min("doc_id").as("mnd"),
            max("doc_id").as("mxd"))
          .groupBy("w")
          .agg(sum("n").as("n_positions"),
            count(lit(1)).as("n_distinct_grams"),
            sum(when(col("n") > 1, col("n")).otherwise(0L)).as("dup_positions"),
            sum(when(col("mnd") =!= col("mxd"), col("n")).otherwise(0L))
              .as("cross_doc_positions"),
            count(when(col("n") > 1, 1)).cast("long").as("dup_groups"))
          .select(col("w").cast("long").as("w"), col("n_positions"),
            col("n_distinct_grams"),
            col("dup_positions"),
            expr("CAST(dup_positions * 1000000 div n_positions AS BIGINT)")
              .as("dup_ppm"),
            col("cross_doc_positions"),
            expr("CAST(cross_doc_positions * 1000000 div n_positions AS BIGINT)")
              .as("cross_doc_ppm"),
            col("dup_groups"))
      })
  }

  /** LABEL-PROPAGATION COMMUNITIES — the third graph view of the
    * near-dup pair graph (q56's components say WHO is connected, q246's
    * k-core says how DENSELY, this says into which DENSE NEIGHBORHOODS
    * a component decomposes): synchronous LPA, 3 rounds, fully
    * deterministic — label(v)₀ = v, each round every vertex adopts the
    * most frequent label among its neighbors with ties broken toward
    * the SMALLEST label (the rule that makes LPA, normally
    * order-sensitive, replayable by any engine). Communities refine
    * components: chains and loosely-bridged clusters split at the
    * bridge, which is the structure a dedup reviewer wants when q213's
    * histogram shows a mega-cluster (template hub vs true copies). The
    * DuckDB oracle replays all 3 rounds as unrolled CTEs with the same
    * rank-1 argmax. Scale shape: the stored candidate-bounded edge set
    * pinned once; per round one edge-keyed join + (vertex, label)
    * rollup + vertex-KEYED rank-1 window — rounds are O(diameter)-free
    * by construction (fixed 3; LPA converges or oscillates, so a fixed
    * round budget IS the algorithm). Output: one row per vertex.
    * HASH-MATCHED. */
  val q345 = QueryDef.oracle("q345_label_propagation", {
    val iter = (1 to 3).map { t =>
      s"""n$t AS (SELECT ed.v AS u, l${t - 1}.lbl AS lbl,
         |          CAST(count(*) AS BIGINT) AS cnt
         |        FROM ed JOIN l${t - 1} ON l${t - 1}.u = ed.u GROUP BY 1, 2),
         |p$t AS (SELECT u, lbl, ROW_NUMBER() OVER (PARTITION BY u
         |          ORDER BY cnt DESC, lbl) AS rn
         |        FROM n$t),
         |l$t AS (SELECT verts.u, COALESCE(p.lbl, verts.u) AS lbl
         |        FROM verts LEFT JOIN (SELECT u, lbl FROM p$t WHERE rn = 1) p
         |        USING (u))""".stripMargin
    }.mkString(",\n")
    s"""$portableScoredCtes,
       |e AS (SELECT ia, ib FROM scored WHERE n_match >= $PortMatchMin),
       |ed AS (SELECT ia AS u, ib AS v FROM e
       |       UNION ALL SELECT ib AS u, ia AS v FROM e),
       |verts AS (SELECT DISTINCT u FROM ed),
       |l0 AS (SELECT u, u AS lbl FROM verts),
       |$iter,
       |cs AS (SELECT lbl, CAST(count(*) AS BIGINT) AS community_size
       |       FROM l3 GROUP BY 1)
       |SELECT l3.u AS doc_id, l3.lbl AS community, cs.community_size
       |FROM l3 JOIN cs USING (lbl)""".stripMargin})(
    (s, d) => {
      import org.apache.spark.sql.expressions.Window
      val e = portableScoredPairs(s, d).filter(col("n_match") >= PortMatchMin)
      val ed = e.select(col("ia").as("u"), col("ib").as("v"))
        .unionByName(e.select(col("ib").as("u"), col("ia").as("v")))
        .localCheckpoint(false) // one artifact scan feeds all three rounds
      val verts = ed.select("u").distinct().localCheckpoint(false)
      var l = verts.select(col("u"), col("u").as("lbl"))
      val w = Window.partitionBy("u").orderBy(col("cnt").desc, col("lbl"))
      for (_ <- 1 to 3) {
        val n = ed.join(l, Seq("u"))
          .select(col("v").as("u"), col("lbl"))
          .groupBy("u", "lbl").agg(count(lit(1)).as("cnt"))
        val p = n.withColumn("rn", row_number().over(w))
          .filter(col("rn") === 1).select("u", "lbl")
        l = verts.join(p, Seq("u"), "left")
          .select(col("u"), coalesce(col("lbl"), col("u")).as("lbl"))
      }
      val cs = l.groupBy("lbl").agg(count(lit(1)).as("community_size"))
      l.join(cs, Seq("lbl"))
        .select(col("u").as("doc_id"), col("lbl").as("community"),
          col("community_size"))
    })

  /** SUFFIX-RANK CHAIN, LIVE — the plan-proof twin of the stored
    * [[storedSuffixRanks]] artifact (the q99 convention: the artifact
    * build and THIS query run the same prefix-doubling builder, every
    * other consumer reads the table — so the chain's plan properties
    * stay mechanically assertable after q329/q339 became read-back
    * consumers). Runs the live chain at rounds 1–2 (prefix lengths
    * 2/4 — enough to exercise the round-0 vocab rank, the shift join,
    * and a doubling renumber) and reports, per grain: valid positions,
    * DISTINCT windows (= distinct suffix ranks — the property the
    * doubling must get exactly right), and duplicated-position mass.
    * The DuckDB oracle is INDEPENDENT-ALGORITHM (q329's discipline):
    * it groups the actual token-array slices by value. PlanCheck
    * asserts the chain shape here: NO zero-key window, no cartesian,
    * and no broadcast of the data-growing vocab rank table. Scale
    * shape: one scan → 2 rounds of {(doc,pos)-keyed shift join +
    * distinct-pair renumber} → rank-keyed rollup. Output: one row per
    * prefix length. HASH-MATCHED. */
  val q353 = {
    val rounds = Seq(1, 2) // live rounds → prefix lengths 2, 4
    def duckArm(l: Int): String =
      s"""p$l AS (SELECT doc_id, l[CAST(i AS INT):CAST(i + $l - 1 AS INT)] AS s
         |        FROM toks, unnest(range(1, len(l) - $l + 2)) AS t$l(i)),
         |g$l AS (SELECT s, CAST(count(*) AS BIGINT) AS n
         |        FROM p$l GROUP BY 1)""".stripMargin
    def duckSel(l: Int): String =
      s"""SELECT CAST($l AS BIGINT) AS prefix_len,
         |  CAST(SUM(n) AS BIGINT) AS n_positions,
         |  CAST(count(*) AS BIGINT) AS n_distinct_windows,
         |  CAST(SUM(CASE WHEN n > 1 THEN n ELSE 0 END) AS BIGINT)
         |    AS dup_positions
         |FROM g$l""".stripMargin
    QueryDef.oracle("q353_suffix_rank_chain",
      s"""WITH toks AS (SELECT doc_id, list_filter(
         |                regexp_split_to_array(text, '\\s+'), x -> x <> '') AS l
         |              FROM documents),
         |${duckArm(2)},
         |${duckArm(4)}
         |${duckSel(2)}
         |UNION ALL
         |${duckSel(4)}""".stripMargin)(
      (s, d) => {
        val (nl, snaps) = suffixRankRounds(s, d, maxRound = rounds.max)
        def arm(j: Int): DataFrame = {
          val l = 1 << j
          snaps(j).join(nl, Seq("doc_id"))
            .filter(col("i") + l <= col("len"))
            .groupBy("r").agg(count(lit(1)).as("n"))
            .agg(sum("n").as("n_positions"),
              count(lit(1)).cast("long").as("n_distinct_windows"),
              sum(when(col("n") > 1, col("n")).otherwise(0L))
                .as("dup_positions"))
            .select(lit(l.toLong).as("prefix_len"), col("n_positions"),
              col("n_distinct_windows"), col("dup_positions"))
        }
        rounds.map(arm).reduce(_ unionByName _)
      })
  }

  /** SPAN-DEDUP YIELD — the cleaned-corpus view of q339's product (r14
    * verdict #7: the Lee-et-al pass must produce its PRODUCT, not just
    * its report): per source, exactly what survives cutting the
    * 32-token removable spans — docs, raw tokens, spans cut, tokens
    * removed/kept, and the removal fraction in exact ppm. This is the
    * token-yield delta a curator reads next to q343/q355's measured LM
    * impact and q243's doc-level yield: WHICH sources lose how much
    * mass to exact-substring duplication (template-heavy sources bleed;
    * clean sources are untouched). Spans are disjoint per doc by
    * construction (islands merge at gap ≤ L), so Σ span_tokens is the
    * exact union coverage — `SpanYieldReconcileSpec` reconciles the
    * start counts against the artifact's dup-mass identity
    * (Σ n_starts = dup_positions − dup_groups, q329's measure at the
    * same grain). Shares the span fragments with q339/q355 (Spark:
    * [[removableSpans]]; oracle: the pinned sp32 chain) so the yield
    * table can never disagree with the span report. Scale shape:
    * read-back span build → doc-keyed rollup → doc-grain metadata join
    * → |sources|-row report. Output: one row per source.
    * HASH-MATCHED. */
  val q354 = QueryDef.oracle("q354_span_dedup_yield",
    s"""WITH $spanSuffixToksCte,
       |${spanSuffixDuckArm(32)},
       |per AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_spans,
       |          CAST(SUM(span_tokens) AS BIGINT) AS cut
       |        FROM sp32 GROUP BY 1),
       |d AS (SELECT d.source,
       |        CAST(COALESCE(len(t.l), 0) AS BIGINT) AS n_tok,
       |        COALESCE(p.n_spans, CAST(0 AS BIGINT)) AS n_spans,
       |        COALESCE(p.cut, CAST(0 AS BIGINT)) AS cut
       |      FROM documents d JOIN toks t USING (doc_id)
       |      LEFT JOIN per p USING (doc_id))
       |SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
       |       CAST(SUM(n_tok) AS BIGINT) AS tokens_total,
       |       CAST(SUM(n_spans) AS BIGINT) AS n_spans,
       |       CAST(SUM(cut) AS BIGINT) AS tokens_removed,
       |       CAST(SUM(n_tok) - SUM(cut) AS BIGINT) AS tokens_kept,
       |       CASE WHEN SUM(n_tok) > 0
       |            THEN CAST(SUM(cut) * 1000000 // SUM(n_tok) AS BIGINT)
       |            ELSE CAST(0 AS BIGINT) END AS removed_ppm
       |FROM d GROUP BY 1""".stripMargin)(
    (s, d) => {
      val per = removableSpans(s, d, Seq(5))
        .groupBy("doc_id")
        .agg(count(lit(1)).as("n_spans"), sum("span_tokens").as("cut"))
      Tables.documents(s, d)
        .select(col("source"), col("doc_id"),
          size(tokens(coalesce(col("text"), lit("")))).cast("long").as("n_tok"))
        .join(per, Seq("doc_id"), "left")
        .groupBy("source")
        .agg(count(lit(1)).as("n_docs"),
          sum("n_tok").as("tokens_total"),
          sum(coalesce(col("n_spans"), lit(0L))).as("n_spans"),
          sum(coalesce(col("cut"), lit(0L))).as("tokens_removed"))
        .select(col("source"), col("n_docs"), col("tokens_total"),
          col("n_spans"), col("tokens_removed"),
          (col("tokens_total") - col("tokens_removed")).as("tokens_kept"),
          when(col("tokens_total") > 0,
            expr("CAST(tokens_removed * 1000000 div tokens_total AS BIGINT)"))
            .otherwise(0L).as("removed_ppm"))
    })

  /** SPAN-CUT FINGERPRINTS — q178's executable-cut discipline lifted to
    * the q339 grain: the per-document PRODUCT of the exact-substring
    * dedup pass. Each doc's tokens covered by any 32-token removable
    * start ([p, p+32), start coverage ≡ island union) are cut; the
    * output carries exact token counts, removal ppm, and the md5
    * fingerprint of the surviving token stream — never the
    * re-materialized text (q176/q178's report discipline). An untouched
    * doc's fingerprint is md5 of its whitespace-normalized text; a
    * fully-duplicated doc cleans to md5(''). This is the row-level
    * artifact a training pipeline ships downstream (q354 is its
    * per-source rollup; q355 its measured LM impact — all three ride
    * the SAME pinned removable-set fragments, and
    * `SpanYieldReconcileSpec` ties the cut masses together). Scale
    * shape: read-back starts → doc-keyed collect → scan-stage HOF cut +
    * fingerprint. Output: one row per document. HASH-MATCHED. */
  val q356 = QueryDef.oracle("q356_span_cut_fingerprints",
    s"""WITH $spanSuffixToksCte,
       |${spanSuffixDuckArm(32)},
       |ps AS (SELECT doc_id, list(i0) AS ps FROM dup32 GROUP BY 1),
       |c AS (SELECT t.doc_id, COALESCE(len(l), 0) AS n_tokens,
       |        [l[i] FOR i IN range(1, len(l) + 1)
       |         IF len(list_filter(COALESCE(ps, []),
       |              p -> p <= i - 1 AND i - 1 < p + 32)) = 0] AS kept
       |      FROM toks t LEFT JOIN ps USING (doc_id))
       |SELECT doc_id, CAST(n_tokens AS BIGINT) AS n_tokens,
       |       CAST(n_tokens - COALESCE(len(kept), 0) AS BIGINT) AS n_removed,
       |       CAST(COALESCE(len(kept), 0) AS BIGINT) AS n_kept,
       |       CASE WHEN n_tokens > 0
       |            THEN CAST((n_tokens - COALESCE(len(kept), 0)) * 1000000
       |                      // n_tokens AS BIGINT)
       |            ELSE CAST(0 AS BIGINT) END AS removed_ppm,
       |       md5(COALESCE(list_aggregate(kept, 'string_agg', ' '), ''))
       |         AS cleaned_fp
       |FROM c""".stripMargin)(
    (s, d) => {
      val ps = removableSpanStarts(s, d, Seq(5))
        .groupBy("doc_id").agg(collect_set("i0").as("ps"))
      Tables.documents(s, d)
        .select(col("doc_id"),
          coalesce(tokens(col("text")), array().cast("array<string>")).as("l"))
        .join(ps, Seq("doc_id"), "left")
        .select(col("doc_id"), col("l"),
          coalesce(col("ps"), array().cast("array<long>")).as("ps"))
        .select(col("doc_id"), col("l"),
          filter(col("l"), (_, i) =>
            !exists(col("ps"), p => p <= i && i < p + 32)).as("kept"))
        .select(col("doc_id"),
          size(col("l")).cast("long").as("n_tokens"),
          (size(col("l")) - size(col("kept"))).cast("long").as("n_removed"),
          size(col("kept")).cast("long").as("n_kept"),
          when(size(col("l")) > 0,
            expr("CAST(CAST(size(l) - size(kept) AS BIGINT) * 1000000" +
              " div size(l) AS BIGINT)")).otherwise(0L).as("removed_ppm"),
          md5(array_join(col("kept"), " ")).as("cleaned_fp"))
    })

  /** b-BIT MINHASH AUDIT (Li & König 2010) — prices the signature-
    * compression knob the wire format wants: storing only the low b
    * bits of each minhash slot shrinks the signature 64/b-fold, at the
    * cost of ACCIDENTAL slot agreements (two different minhashes
    * colliding in their low b bits, rate 2^-b) inflating the estimated
    * Jaccard. Over the banding candidate pairs and the SAME portable
    * signatures the dedup stack ships (q99's family, so DuckDB replays
    * every slot comparison bit-for-bit), per b ∈ {1, 2, 4, 8}: the
    * exact full-width slot-agreement total, the b-bit total, the
    * measured inflation, and the Li-König expectation
    * (disagreeing slots / 2^b) with a measured/expected ppm ratio —
    * the table that says which b keeps the q191-calibrated thresholds
    * valid. Scale shape: candidate-pair sigs (the scored-pairs build
    * shape — pair-sized, never all-pairs) → ×4 bounded-axis fan on the
    * PAIR table → 4-row report. HASH-MATCHED. */
  val q364 = {
    val bbits = Seq(1, 2, 4, 8)
    def modSum(b: Int): String = (0 until PortK).map(i =>
      s"CASE WHEN (a.mh$i % ${1L << b}) = (b.mh$i % ${1L << b})" +
        " THEN 1 ELSE 0 END").mkString(" + ")
    QueryDef.oracle("q364_bbit_minhash_audit",
      s"""$portablePairsCtes,
         |cmp AS (SELECT p.ia, p.ib,
         |          ${matchSumSql("a", "b")} AS m_full,
         |          ${bbits.map(b => s"${modSum(b)} AS m_b$b").mkString(",\n          ")}
         |        FROM pairs p JOIN sig a ON a.doc_id = p.ia
         |        JOIN sig b ON b.doc_id = p.ib),
         |ax AS (SELECT unnest([${bbits.mkString(", ")}]) AS bbits),
         |st AS (SELECT ax.bbits,
         |         CAST(count(*) AS BIGINT) AS n_pairs,
         |         CAST(count(*) * $PortK AS BIGINT) AS slots,
         |         CAST(SUM(m_full) AS BIGINT) AS full_matches,
         |         CAST(SUM(CASE ax.bbits ${bbits.map(b =>
                     s"WHEN $b THEN m_b$b").mkString(" ")} END) AS BIGINT)
         |           AS b_matches
         |       FROM cmp, ax GROUP BY 1)
         |SELECT bbits, n_pairs, slots, full_matches, b_matches,
         |  CAST(b_matches - full_matches AS BIGINT) AS extra_matches,
         |  CAST((slots - full_matches) // (CAST(1 AS BIGINT) << bbits)
         |       AS BIGINT) AS expected_extra,
         |  CASE WHEN (slots - full_matches) // (CAST(1 AS BIGINT) << bbits) = 0
         |       THEN NULL
         |       ELSE CAST((b_matches - full_matches) * 1000000
         |            // ((slots - full_matches) // (CAST(1 AS BIGINT) << bbits))
         |            AS BIGINT) END AS measured_vs_expected_ppm
         |FROM st""".stripMargin)(
      (s, d) => {
        val pairs = bandingPairs(s, d).localCheckpoint(false)
        val candIds = pairs.select(col("ia").as("doc_id"))
          .unionByName(pairs.select(col("ib").as("doc_id"))).distinct()
        val sigs = Tables.documents(s, d)
          .join(candIds, Seq("doc_id"), "left_semi")
          .select(col("doc_id"),
            portableMinhashSigNative(col("text"), 3, PortK).as("mh"))
          .localCheckpoint(false) // both sides of the pair join
        def nMatchMod(a: Column, b: Column, m: Long): Column =
          aggregate(zip_with(a, b, (x, y) =>
            when(x % m === y % m, 1).otherwise(0)),
            lit(0), (acc, v) => acc + v).cast("long")
        val withA = sigs.join(pairs, col("doc_id") === col("ia"))
          .select(col("ia"), col("ib"), col("mh").as("mh_a"))
        val cmp = sigs.join(withA, col("doc_id") === col("ib"))
          .select(
            (nMatch(col("mh_a"), col("mh")).as("m_full") +:
              bbits.map(b =>
                nMatchMod(col("mh_a"), col("mh"), 1L << b).as(s"m_b$b"))): _*)
        val ax = explode(array(bbits.map(b => lit(b.toLong)): _*)).as("bbits")
        cmp.select(col("*"), ax)
          .groupBy("bbits")
          .agg(count(lit(1)).as("n_pairs"),
            (count(lit(1)) * PortK).cast("long").as("slots"),
            sum("m_full").as("full_matches"),
            sum(bbits.tail.foldLeft(
              when(col("bbits") === bbits.head, col(s"m_b${bbits.head}")))(
              (acc, b) => acc.when(col("bbits") === b, col(s"m_b$b"))))
              .as("b_matches"))
          .select(col("bbits"), col("n_pairs"), col("slots"),
            col("full_matches"), col("b_matches"),
            (col("b_matches") - col("full_matches")).as("extra_matches"),
            expr("CAST((slots - full_matches)" +
              " div shiftleft(CAST(1 AS BIGINT), CAST(bbits AS INT))" +
              " AS BIGINT)").as("expected_extra"),
            expr("CASE WHEN (slots - full_matches)" +
              " div shiftleft(CAST(1 AS BIGINT), CAST(bbits AS INT)) = 0" +
              " THEN NULL ELSE CAST((b_matches - full_matches) * 1000000" +
              " div ((slots - full_matches)" +
              " div shiftleft(CAST(1 AS BIGINT), CAST(bbits AS INT)))" +
              " AS BIGINT) END").as("measured_vs_expected_ppm"))
      })
  }

  /** SORTED-NEIGHBORHOOD BLOCKING (Hernández & Stolfo 1995) — the
    * classic entity-resolution candidate generator the LSH family
    * (q52/q99) does NOT cover: sort the corpus on a cheap blocking key
    * (lang, normalized 16-char text prefix, doc_id tiebreak), slide a
    * window of W=4, and every pair within sorted-order distance 1..3
    * is a candidate — O(N·W) pairs by construction, and near-identical
    * prefixes (boilerplate heads, q157's finding) land adjacent no
    * matter how far apart they live on disk. The key normalizes a
    * 256-char raw head only — O(1) per doc; a 1 MB document never pays
    * a full-text regex for a 16-char key. The global sort rank is
    * `Clean.keyedPrefixRank` (range-partitioned two-level numbering —
    * the corpus GROWS, so never a zero-key rank window), carrying only
    * (doc_id, lang, 16 chars) across the exchange; the neighbor join
    * is rank-block-keyed (block = ⌊(rk−1)/W⌋, each left row probes its
    * own and the next block — one keyed shuffle, no range join, no
    * cartesian). Candidates then verify with the exact distinct
    * word-3-gram Jaccard of q54, grams computed ONLY for candidate
    * docs (semi-join restricted — O(candidates), not O(corpus)).
    * Report: per sorted-order distance d ∈ {1,2,3}: candidate pairs,
    * verified near-dups (Jaccard ≥ 0.6), and the mean Jaccard in exact
    * ppm — the precision-per-distance curve that says whether W should
    * grow (d=3 still matching → widen) or shrink (d=2 already noise).
    * HASH-MATCHED. */
  val q370 = QueryDef.oracle("q370_sorted_neighborhood",
    """WITH k AS (SELECT doc_id, lang,
      |        substr(regexp_replace(lower(substr(coalesce(text, ''), 1,
      |          256)), '\s+', ' ', 'g'), 1, 16) AS p16
      |      FROM documents),
      |r AS (SELECT doc_id, CAST(ROW_NUMBER() OVER (ORDER BY lang, p16,
      |          doc_id) AS BIGINT) AS rk
      |      FROM k),
      |cand AS (SELECT a.doc_id AS ia, b.doc_id AS ib,
      |        CAST(b.rk - a.rk AS BIGINT) AS dist
      |      FROM r a JOIN r b ON b.rk - a.rk BETWEEN 1 AND 3),
      |toks AS (SELECT doc_id,
      |        list_filter(regexp_split_to_array(text, '\s+'), x -> x <> '')
      |          AS l
      |      FROM documents),
      |grams AS (SELECT doc_id, CASE WHEN len(l) < 3
      |          THEN CAST([] AS VARCHAR[])
      |          ELSE list_distinct([list_aggregate(l[i:i+2], 'string_agg',
      |            ' ') FOR i IN range(1, len(l) - 1)]) END AS gs
      |      FROM toks),
      |jac AS (SELECT c.dist,
      |        CASE WHEN len(ga.gs) + len(gb.gs)
      |               - len(list_intersect(ga.gs, gb.gs)) = 0
      |             THEN CAST(0 AS BIGINT)
      |             ELSE CAST(CAST(len(list_intersect(ga.gs, gb.gs))
      |                    AS BIGINT) * 1000000
      |                  // (len(ga.gs) + len(gb.gs)
      |                     - len(list_intersect(ga.gs, gb.gs))) AS BIGINT)
      |             END AS jacc_ppm
      |      FROM cand c JOIN grams ga ON ga.doc_id = c.ia
      |                  JOIN grams gb ON gb.doc_id = c.ib)
      |SELECT dist, CAST(count(*) AS BIGINT) AS n_pairs,
      |  CAST(count(CASE WHEN jacc_ppm >= 600000 THEN 1 END) AS BIGINT)
      |    AS n_matches,
      |  CAST(SUM(jacc_ppm) // count(*) AS BIGINT) AS mean_jacc_ppm
      |FROM jac GROUP BY 1""".stripMargin)(
    (s, d) => {
      // rank carries (doc_id, lang, 16 chars) ONLY — text re-joins for
      // candidates below
      val keyed = Tables.documents(s, d).select(col("doc_id"), col("lang"),
        substring(regexp_replace(lower(
          substring(coalesce(col("text"), lit("")), 1, 256)),
          "\\s+", " "), 1, 16).as("p16"))
      val r = graft.pipeline.Clean.keyedPrefixRank(keyed,
          Seq(col("lang"), col("p16"), col("doc_id")), "rk")
        .select(col("doc_id"), col("rk"))
        .localCheckpoint(false) // both sides of the neighbor join
      // block-keyed neighbor join: left rows probe their own + the next
      // rank block, so every (dist 1..3) pair matches on exactly one key
      val a = r.select(col("doc_id").as("ia"), col("rk").as("ra"))
        .withColumn("jblk", explode(array(
          expr("CAST((ra - 1) div 4 AS BIGINT)"),
          expr("CAST((ra - 1) div 4 AS BIGINT) + 1"))))
      val b = r.select(col("doc_id").as("ib"), col("rk").as("rb"))
        .withColumn("jblk", expr("CAST((rb - 1) div 4 AS BIGINT)"))
      val cand = a.join(b, Seq("jblk"))
        .filter(col("rb") - col("ra") >= 1 && col("rb") - col("ra") <= 3)
        .select(col("ia"), col("ib"), (col("rb") - col("ra")).as("dist"))
        .localCheckpoint(false) // id list + both gram joins read it
      val candIds = cand.select(col("ia").as("doc_id"))
        .unionByName(cand.select(col("ib").as("doc_id"))).distinct()
      val grams = Tables.documents(s, d)
        .join(candIds, Seq("doc_id"), "left_semi")
        .select(col("doc_id"),
          array_distinct(wordNgrams(col("text"), 3)).as("gs"))
        .localCheckpoint(false) // consumed by both sides of the pair join
      val withA = grams.join(cand, col("doc_id") === col("ia"))
        .select(col("ia"), col("ib"), col("dist"), col("gs").as("g_a"))
      val jac = grams.join(withA, col("doc_id") === col("ib"))
        .withColumn("__inter",
          size(array_intersect(col("g_a"), col("gs"))).cast("long"))
        .withColumn("__uni",
          (size(col("g_a")) + size(col("gs"))).cast("long") - col("__inter"))
        .select(col("dist"),
          when(col("__uni") === 0, lit(0L))
            .otherwise(expr("CAST(__inter * 1000000 div __uni AS BIGINT)"))
            .as("jacc_ppm"))
      jac.groupBy("dist")
        .agg(count(lit(1)).as("n_pairs"),
          count(when(col("jacc_ppm") >= 600000, lit(1))).as("n_matches"),
          sum("jacc_ppm").as("__sj"))
        .select(col("dist"), col("n_pairs"), col("n_matches"),
          expr("CAST(__sj div n_pairs AS BIGINT)").as("mean_jacc_ppm"))
    })

  /** SNM BLOCKING-KEY ADVISOR — prices q370's one free parameter (the
    * normalized-prefix length) the q342/q263 way: BOTH sides of the
    * blocking trade, per w ∈ {8, 16, 24}, from one stacked scan. COST:
    * blocks = exact-equality groups on (lang, prefix_w) — block count,
    * max block size, and the within-block candidate-pair mass
    * Σ c(c−1) (doubled — exact in integer arithmetic without a halving
    * division; what a pure equality-blocking pass would verify; SNM's
    * sorted window adds only O(N·W) cross-block pairs on top). RECALL:
    * the fraction of the portable-MinHash candidate pairs (q54/q99's
    * band-bucket truth — the LSH family's own candidate set) whose two
    * docs land in the SAME block, i.e. what prefix-equality blocking
    * alone would have caught: longer prefixes shrink candidate mass but
    * leak near-dups whose edits touch the head. Pair-sized work on the
    * recall side (the pair table joins two 24-char prefixes by id —
    * never corpus×corpus), corpus-rollup work on the cost side (block
    * stats are map-side-combined counts; pair mass in DECIMAL(38,0),
    * shipped as VARCHAR digits — Σc² passes int64 once a boilerplate
    * block nears ~4·10⁹ docs). HASH-MATCHED. */
  val q371 = QueryDef.oracle("q371_snm_key_advisor", {
    s"""$portablePairsCtes,
       |norm AS (SELECT doc_id, lang,
       |        substr(regexp_replace(lower(substr(coalesce(text, ''), 1,
       |          256)), '\\s+', ' ', 'g'), 1, 24) AS p24
       |      FROM documents),
       |ax AS (SELECT CAST(range AS BIGINT) AS w FROM range(8, 25, 8)),
       |blk AS (SELECT ax.w, norm.lang, substr(norm.p24, 1, CAST(ax.w AS INT))
       |          AS k, CAST(count(*) AS BIGINT) AS c
       |      FROM norm, ax GROUP BY 1, 2, 3),
       |cost AS (SELECT w, CAST(count(*) AS BIGINT) AS n_blocks,
       |        CAST(max(c) AS BIGINT) AS max_block,
       |        CAST(SUM(CAST(c AS HUGEINT) * (c - 1)) AS DECIMAL(38,0))
       |          AS cand_pairs_x2
       |      FROM blk GROUP BY 1),
       |pr AS (SELECT p.ia, p.ib, na.lang AS la, nb.lang AS lb,
       |        na.p24 AS pa, nb.p24 AS pb
       |      FROM pairs p JOIN norm na ON na.doc_id = p.ia
       |                   JOIN norm nb ON nb.doc_id = p.ib),
       |rec AS (SELECT ax.w, CAST(count(*) AS BIGINT) AS n_pairs,
       |        CAST(count(CASE WHEN pr.la = pr.lb AND
       |            substr(pr.pa, 1, CAST(ax.w AS INT))
       |              = substr(pr.pb, 1, CAST(ax.w AS INT)) THEN 1 END)
       |          AS BIGINT) AS n_same_block
       |      FROM pr, ax GROUP BY 1)
       |SELECT c.w, c.n_blocks, c.max_block,
       |  CAST(c.cand_pairs_x2 AS VARCHAR) AS cand_pairs_x2,
       |  r.n_pairs, r.n_same_block,
       |  CASE WHEN r.n_pairs > 0 THEN CAST(r.n_same_block * 1000000
       |         // r.n_pairs AS BIGINT) END AS recall_ppm
       |FROM cost c JOIN rec r USING (w)""".stripMargin})(
    (s, d) => {
      val norm = Tables.documents(s, d).select(col("doc_id"), col("lang"),
          substring(regexp_replace(lower(
            substring(coalesce(col("text"), lit("")), 1, 256)),
            "\\s+", " "), 1, 24).as("p24"))
        .localCheckpoint(false) // cost rollup + both pair sides read it
      val ax = s.range(1L, 4L).select((col("id") * 8).as("w"))
      val blk = norm.crossJoin(broadcast(ax))
        .select(col("w"), col("lang"),
          expr("substr(p24, 1, CAST(w AS INT))").as("k"))
        .groupBy("w", "lang", "k").agg(count(lit(1)).as("c"))
      val cost = blk.groupBy("w").agg(count(lit(1)).as("n_blocks"),
        max("c").as("max_block"),
        sum(expr("CAST(c AS DECIMAL(38,0)) * (c - 1)"))
          .cast("decimal(38,0)").as("cand_pairs_x2"))
      val cand = portablePairs(s, d).localCheckpoint(false)
      val pr = cand
        .join(norm.select(col("doc_id").as("ia"), col("lang").as("la"),
          col("p24").as("pa")), Seq("ia"))
        .join(norm.select(col("doc_id").as("ib"), col("lang").as("lb"),
          col("p24").as("pb")), Seq("ib"))
      val rec = pr.crossJoin(broadcast(ax))
        .groupBy("w").agg(count(lit(1)).as("n_pairs"),
          count(when(col("la") === col("lb") &&
            expr("substr(pa, 1, CAST(w AS INT))")
              === expr("substr(pb, 1, CAST(w AS INT))"), lit(1)))
            .as("n_same_block"))
      cost.join(rec, Seq("w"))
        .select(col("w"), col("n_blocks"), col("max_block"),
          col("cand_pairs_x2").cast("string").as("cand_pairs_x2"),
          col("n_pairs"), col("n_same_block"),
          when(col("n_pairs") > 0,
            expr("CAST(n_same_block * 1000000 div n_pairs AS BIGINT)"))
            .as("recall_ppm"))
    })

  val defs: Seq[QueryDef] =
    Seq(q50, q51, q52, q53, q54, q55, q56, q57, q58, q99, q100, q148, q152,
      q153, q159, q164, q175, q178, q180, q185, q189, q191, q193, q195, q202,
      q209, q213, q216, q217, q231, q238, q243, q246, q255, q259, q263, q274,
      q275, q277, q295, q298, q304, q310, q329, q339, q340, q342, q345, q353,
      q354, q356, q364, q370, q371)
}
