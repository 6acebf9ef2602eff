package graft

import graft.operators.{DedupQueries, ModelPrepQueries}
import org.apache.spark.sql.functions._

/** Invariants for the model-prep suite (q123–q130) the DuckDB oracle
  * can't express: Bloom no-false-negatives, label-propagation fixpoint,
  * chunk coverage, probability normalization, entropy bounds.
  */
class ModelPrepSpec extends SparkSpec {

  private val d = "/root/testdata/sf0.001"
  private def q(name: String) = SparkEntry.queries(name)(spark, d)

  test("q123: every doc scored; bits/token within the smoothed-LM range") {
    val rows = q("q123_unigram_lm_score").collect()
    assert(rows.length == 500)
    // add-1 smoothing bounds: 0 < bits <= log2(N+V) (rarest token)
    val maxBits = rows.map(_.getDouble(2)).max
    val minBits = rows.map(_.getDouble(2)).min
    assert(minBits > 0 && maxBits <= 20.0, s"bits out of range: [$minBits, $maxBits]")
    // both keep decisions occur — the threshold actually splits the corpus
    val kept = rows.count(_.getBoolean(3))
    assert(kept > 0 && kept < rows.length, s"degenerate keep split: $kept")
  }

  test("q124: ranks are 1..20, scores strictly ordered by (micro desc, doc_id)") {
    val rows = q("q124_bm25_retrieval")
      .select("rnk", "score_micro", "doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sortBy(_._1)
    assert(rows.map(_._1).toSeq == (1L to 20L))
    rows.sliding(2).foreach { case Array((_, m1, id1), (_, m2, id2)) =>
      assert(m1 > m2 || (m1 == m2 && id1 < id2), "ranking order violated")
    }
    assert(rows.forall(_._2 > 0))
  }

  test("q125: Bloom has no false negatives; counts reconcile") {
    val r = q("q125_bloom_prefilter_join").collect()(0)
    val (nOrders, nCand, nMatch, nFp) =
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))
    // independent exact count: orders whose customer is in the segment
    val keys = Tables.customer(spark, d)
      .filter(col("c_mktsegment") === "BUILDING").select("c_custkey")
    val exact = Tables.orders(spark, d)
      .join(keys, col("o_custkey") === col("c_custkey"), "left_semi").count()
    assert(nMatch == exact, s"bloom dropped true matches: $nMatch != $exact")
    assert(nCand == nMatch + nFp && nCand <= nOrders)
  }

  test("q126: calendar is dense per priority; fills carry the last real value") {
    val rows = q("q126_gapfill_forward")
      .select("prio", "d", "n", "cents_filled", "is_gap").collect()
      .groupBy(_.getString(0))
    rows.foreach { case (_, rs) =>
      val days = rs.map(_.getDate(1).toLocalDate).sortBy(_.toEpochDay)
      // dense: row count == span length, first row is real data
      assert(days.length == days.last.toEpochDay - days.head.toEpochDay + 1)
      val byDay = rs.sortBy(_.getDate(1).toLocalDate.toEpochDay)
      assert(!byDay.head.getBoolean(4), "span must start on a data day")
      byDay.sliding(2).foreach { case Array(prev, cur) =>
        if (cur.getBoolean(4)) // gap row: forward-filled from predecessor
          assert(cur.getLong(3) == prev.getLong(3) && cur.getLong(2) == 0L)
      }
    }
  }

  test("q127: per-source transition probabilities normalize to ~1") {
    val bySrc = q("q127_markov_transitions")
      .groupBy("src").agg(sum("prob").as("p"), count(lit(1)).as("k"))
      .collect()
    bySrc.foreach { r =>
      // each addend rounded to 1e-6 -> sum within k ulps of 1
      assert(math.abs(r.getDouble(1) - 1.0) <= r.getLong(2) * 1e-6 + 1e-9,
        s"src ${r.getString(0)} sums to ${r.getDouble(1)}")
    }
  }

  test("q128: chunks tile each document — stride 24, full coverage, exact text") {
    val chunks = q("q128_doc_chunks")
    val perDoc = chunks.groupBy("doc_id")
      .agg(max(col("start_tok") + col("n_chunk_toks") - 1).as("covered"),
        count(lit(1)).as("n_chunks"))
    val docs = Tables.documents(spark, d).select(col("doc_id"),
      graft.functions.TextFunctions.tokenCount(col("text")).cast("long").as("n_toks"))
    // coverage: the furthest chunk end reaches exactly the doc's last token
    assert(perDoc.join(docs, Seq("doc_id"))
      .filter(col("covered") =!= col("n_toks")).count() == 0)
    // offsets follow the stride contract
    assert(chunks.filter(col("start_tok") =!= col("chunk_idx") * 24 + 1).count() == 0)
    // chunk_text really holds n_chunk_toks tokens
    assert(chunks.filter(
      graft.functions.TextFunctions.tokenCount(col("chunk_text")).cast("long")
        =!= col("n_chunk_toks")).count() == 0)
  }

  test("q129: 6 rounds reach the fixpoint at the driver's correctness SF too") {
    // sf0.01 is what the driver hash-checks; an unconverged-but-matching
    // result would be semantically wrong even though the oracle (same 6
    // rounds) agrees — so pin convergence where it is graded
    val d01 = "/root/testdata/sf0.01"
    val l6 = ModelPrepQueries.canonLabels(spark, d01, 6)
    val l7 = ModelPrepQueries.canonLabels(spark, d01, 7)
    assert(l6.join(l7.withColumnRenamed("lbl", "lbl7"), Seq("v"))
      .filter(col("lbl") =!= col("lbl7")).count() == 0,
      "label propagation had not converged after 6 rounds at sf0.01")
  }

  test("q129: 6 rounds reach the fixpoint at test scale; clusters are consistent") {
    val l6 = ModelPrepQueries.canonLabels(spark, d, 6)
    val l7 = ModelPrepQueries.canonLabels(spark, d, 7)
    assert(l6.join(l7.withColumnRenamed("lbl", "lbl7"), Seq("v"))
      .filter(col("lbl") =!= col("lbl7")).count() == 0,
      "label propagation had not converged after 6 rounds")
    // every LSH candidate pair ends up in the same cluster
    val pairs = DedupQueries.portablePairs(spark, d)
    val lab = l6
    val joined = pairs
      .join(lab.select(col("v").as("ia"), col("lbl").as("la")), Seq("ia"))
      .join(lab.select(col("v").as("ib"), col("lbl").as("lb")), Seq("ib"))
    assert(joined.filter(col("la") =!= col("lb")).count() == 0)
    // labels are cluster minima: lbl <= v, and lbl is itself labeled lbl
    assert(lab.filter(col("lbl") > col("v")).count() == 0)
  }

  test("q139: triples are distinct; every positive is a real LSH partner") {
    val t = q("q139_contrastive_triples").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(t.nonEmpty)
    t.foreach { case (a, p, n) =>
      assert(a != p && a != n && p != n, s"degenerate triple ($a,$p,$n)")
    }
    val pairSet = DedupQueries.portablePairs(spark, d).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    t.foreach { case (a, p, _) =>
      assert(pairSet.contains((a, p)), s"positive $p is not an LSH partner of $a")
    }
  }

  test("q140: kept set is a quality prefix that exactly fits the budget") {
    val rows = q("q140_budget_selection").collect()
      .map(r => (r.getLong(0), r.getDouble(1), r.getLong(2), r.getLong(3), r.getBoolean(4)))
    val totalToks = rows.map(_._3).sum
    val budget = (0.3 * totalToks).toLong
    val kept = rows.filter(_._5)
    assert(kept.nonEmpty && kept.length < rows.length)
    // greedy optimality of the prefix: fits the budget, and the next doc
    // in (quality desc, doc_id) order would overflow it
    assert(kept.map(_._3).sum <= budget)
    val ordered = rows.sortBy(r => (-r._2, r._1))
    val firstDropped = ordered.find(!_._5).get
    assert(kept.map(_._3).sum + firstDropped._3 > budget)
    // prefix property: nothing kept after the first drop
    assert(!ordered.dropWhile(_._5).exists(_._5))
    // cum_toks really is the running sum in the global order
    assert(ordered.scanLeft(0L)(_ + _._3).tail.zip(ordered).forall {
      case (cum, r) => cum == r._4
    })
  }

  test("q145: triangle incidences come in multiples of 3; triangles need degree >= 2") {
    val rows = q("q145_triangle_census").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    // each triangle contributes exactly one incidence to 3 vertices
    assert(rows.map(_._3).sum % 3 == 0)
    rows.filter(_._3 > 0).foreach { case (id, deg, _) =>
      assert(deg >= 2, s"doc $id in a triangle with degree $deg")
    }
  }

  test("q150: no near-dup cluster ever straddles a split; rescued ⇔ naive disagrees") {
    import org.apache.spark.sql.functions._
    val df = q("q150_leakage_safe_split").cache()
    // the leakage-safety invariant itself: one split per cluster
    val straddling = df.groupBy("cluster_id")
      .agg(countDistinct("split").as("n_splits"))
      .filter(col("n_splits") > 1).count()
    assert(straddling == 0, s"$straddling clusters straddle splits")
    // every split value is one of the three buckets
    assert(df.select("split").distinct().collect().map(_.getString(0)).toSet
      .subsetOf(Set("train", "val", "test")))
    // rescued is exactly the disagreement flag
    assert(df.filter(col("rescued") =!= (col("split") =!= col("naive_split"))).count() == 0)
    df.unpersist()
  }

  test("q186: per-stratum fold sizes never differ by more than one; folds partition the stratum") {
    val rows = q("q186_stratified_kfold").collect()
      .map(r => ((r.getString(1), r.getString(2)), r.getLong(3)))
    rows.groupBy(_._1).foreach { case (stratum, ms) =>
      val sizes = ms.groupBy(_._2).view.mapValues(_.size).toMap
      assert(sizes.keySet.subsetOf((0L until 5L).toSet), s"$stratum: bad fold id")
      val n = ms.size
      // exact largest-remainder shape: n mod 5 folds of ⌊n/5⌋+1, rest ⌊n/5⌋
      val expected = (0L until 5L).map(f =>
        f -> (n / 5 + (if (f < n % 5) 1 else 0))).filter(_._2 > 0).toMap
      assert(sizes == expected, s"$stratum: $sizes ≠ $expected")
    }
  }

  test("q187: bigram count is exactly n_tokens−1; scores positive; both classes cut") {
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
      .selectExpr("doc_id",
        "size(filter(split(text, '\\\\s+'), x -> x != '')) AS n")
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    val rows = q("q187_bigram_lm_score").collect()
      .map(r => (r.getLong(0), r.getLong(1),
        if (r.isNullAt(2)) None else Some(r.getDouble(2))))
    rows.foreach { case (id, nBi, bpb) =>
      val expect = math.max(docs(id) - 1, 0).toLong
      assert(nBi == expect, s"doc $id: $nBi bigrams ≠ n_toks−1 = $expect")
      bpb.foreach(b => assert(b > 0, s"doc $id: non-positive score $b"))
    }
    val kept = q("q187_bigram_lm_score").collect().map(r =>
      if (r.isNullAt(3)) None else Some(r.getBoolean(3)))
    assert(kept.contains(Some(true)) && kept.contains(Some(false)))
  }

  test("q130: entropy bounded by log2(types); ttr is the exact ratio") {
    val rows = q("q130_lexical_diversity").collect()
    rows.foreach { r =>
      val (n, types, ttr, ent) =
        (r.getLong(1), r.getLong(2), r.getDouble(3), r.getDouble(4))
      assert(ent >= -1e-4 && ent <= math.log(types.toDouble) / math.log(2.0) + 1e-4,
        s"entropy $ent outside [0, log2($types)]")
      assert(math.abs(ttr - types.toDouble / n) <= 5e-7)
    }
  }
}
