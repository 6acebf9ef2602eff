package graft.operators

import graft.{QueryDef, Tables}
import graft.functions.{HashFunctions, TextFunctions, UnigramSegment}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Unigram-LM (SentencePiece-style) tokenizer trainer + apply — the
  * tokenizer half the BPE family (q156–q174) lacks (the r12 verdict's
  * task #5): instead of greedily MERGING pairs bottom-up, unigram-LM
  * starts from an over-complete substring seed vocabulary and
  * alternates (E) Viterbi-segment the word types under current piece
  * weights with (M) re-estimate weights from the segmentation counts,
  * pruning to a budget each round — single characters always retained
  * so every word stays segmentable (SentencePiece's required-char
  * rule; Kudo 2018 is the published algorithm, re-expressed here in
  * the repo's exact-integer idiom).
  *
  * Hard-EM, exact integers, so the whole trainer is HASH-MATCHED: the
  * E-step is Viterbi (argmax segmentation, counts are plain integers —
  * no fractional posteriors to diverge on), weights are fixed-point
  * llog₂ units with add-one smoothing (w = llog(cnt+1) − llog(T+|V|),
  * [[UnigramSegment.llog]] — integer shifts both engines replay), and
  * every tie is resolved by a total order (the DP's packed key; prune
  * rank by (cnt DESC, piece) — ASCII corpus, where DuckDB's UTF-8 byte
  * order and the driver's byte-compare agree by construction). The
  * DuckDB oracle replays EVERYTHING: seed substring counts, both EM
  * rounds as unrolled position-DPs (max_by over the packed key, one
  * CTE per word position — collision-free, so argmax is unique), the
  * prune windows, and the final segmentation.
  *
  * Scale shape: all heavy work keys on the WORD-TYPE table (sublinear
  * in the corpus — Heaps' law), one linear scan per EM round through
  * the fused DP kernel; the vocabulary is bounded driver side-data
  * (≤ SeedK + charset, the codebook pattern) and the trained vocab is
  * a stored corpus-keyed artifact, so consumers pay lookup, not
  * training. Types longer than MaxWordLen are excluded by a documented
  * gate in BOTH engines (the DP unroll depth; CCNet-style absurd-token
  * drop).
  */
object UnigramQueries {

  private[graft] val MaxWordLen = 16
  private[graft] val MaxPieceLen = UnigramSegment.MaxPieceLen // 4
  private[graft] val SeedK = 256
  private[graft] val VocabK = 64

  // ---------- shared Spark-side pieces ----------

  private def typesDf(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d)
      .select(explode(TextFunctions.tokens(col("text"))).as("word"))
      .filter(length(col("word")) <= MaxWordLen)
      .groupBy("word").agg(count(lit(1)).as("freq"))

  /** All substring occurrences (with multiplicity) of lengths
    * 1..MaxPieceLen — the seed inventory. */
  private def seedCountsDf(s: SparkSession, d: String): DataFrame = {
    val subArrays = (1 to MaxPieceLen).map { l =>
      when(length(col("word")) >= l,
        transform(sequence(lit(1), length(col("word")) - l + 1),
          i => col("word").substr(i, lit(l))))
        .otherwise(array().cast("array<string>"))
    }
    typesDf(s, d)
      .select(col("freq"), explode(flatten(array(subArrays: _*))).as("piece"))
      .groupBy("piece").agg(sum("freq").as("cnt"))
  }

  private final case class P(piece: String, cnt: Long)

  // UTF-8 byte order — matches DuckDB's default VARCHAR collation and
  // Spark's UTF8String comparison, so prune ranks can't diverge on a
  // non-ASCII corpus the way UTF-16 code-unit order could
  private val byteOrd: Ordering[String] = new Ordering[String] {
    def compare(a: String, b: String): Int = {
      val x = a.getBytes("UTF-8"); val y = b.getBytes("UTF-8")
      var i = 0
      while (i < x.length && i < y.length) {
        val c = (x(i) & 0xff) - (y(i) & 0xff)
        if (c != 0) return c
        i += 1
      }
      x.length - y.length
    }
  }

  private def topK(counts: Seq[P], k: Int): Seq[P] =
    counts.sortBy(p => (-p.cnt, p.piece))(
      Ordering.Tuple2(Ordering.Long, byteOrd)).take(k)

  /** prune to k ∪ all single chars (coverage guarantee; absent chars
    * re-enter at count 0 — add-one smoothing keeps llog defined). */
  private def prune(counts: Seq[P], chars: Set[String], k: Int): Seq[P] = {
    val kept = topK(counts, k)
    val byPiece = counts.map(p => p.piece -> p.cnt).toMap
    val keptSet = kept.map(_.piece).toSet
    kept ++ chars.toSeq.filterNot(keptSet)
      .map(c => P(c, byPiece.getOrElse(c, 0L))).sortBy(_.piece)(byteOrd)
  }

  private def weights(v: Seq[P]): Seq[(String, Long, Long)] = {
    val t = v.map(_.cnt).sum
    val nv = v.size.toLong
    v.map(p => (p.piece, p.cnt,
      UnigramSegment.llog(p.cnt + 1) - UnigramSegment.llog(t + nv)))
  }

  /** One E-step: segment every type under (pieces, weights), recount.
    * Bounded collect — the piece table is vocabulary-sized. */
  private def segmentCounts(s: SparkSession, d: String,
      v: Seq[(String, Long, Long)]): Seq[P] = {
    val pieces = typedLit(v.map(_._1))
    val ws = typedLit(v.map(_._3))
    typesDf(s, d)
      .select(col("freq"),
        explode(split(HashFunctions.unigramSegment(col("word"), pieces, ws), "\t"))
          .as("piece"))
      .groupBy("piece").agg(sum("freq").as("cnt"))
      .collect().map(r => P(r.getString(0), r.getLong(1))).toSeq
  }

  /** The full trainer: seed → 2 hard-EM (segment, recount, prune)
    * rounds → final vocab with weights. Stored as a corpus-keyed
    * artifact (pure function of the corpus — the codebook contract). */
  private def vocabArtifact(s: SparkSession, d: String): DataFrame =
    graft.sources.ArtifactStore.table(s, d, "unigramv") {
      val seed = seedCountsDf(s, d).collect()
        .map(r => P(r.getString(0), r.getLong(1))).toSeq
      val chars = seed.filter(_.piece.length == 1).map(_.piece).toSet
      // seed prune: top SeedK ∪ chars (chars are all in the seed)
      val v0 = prune(seed, chars, SeedK)
      val v1 = prune(segmentCounts(s, d, weights(v0)), chars, VocabK)
      val v2 = prune(segmentCounts(s, d, weights(v1)), chars, VocabK)
      import s.implicits._
      weights(v2).toDF("piece", "cnt", "weight")
    }

  // ---------- DuckDB oracle (generated; unrolled DP) ----------

  private def llogSql(x: String): String = {
    val b = s"(length(printf('%b', $x)) - 1)"
    s"(($b << 16) + CASE WHEN $b >= 16 THEN (($x) - (1::BIGINT << $b)) >> ($b - 16)" +
      s" ELSE ((($x) - (1::BIGINT << $b)) << 16) >> $b END)"
  }

  /** weights CTE: w<r> = (piece, cnt, w) from vocab CTE v<r>. */
  private def weightsCte(r: String): String =
    s"""w$r AS MATERIALIZED (
       |  SELECT piece, cnt,
       |         ${llogSql("cnt + 1")} - ${llogSql("t + nv")} AS w
       |  FROM v$r, (SELECT CAST(SUM(cnt) AS BIGINT) AS t,
       |                    CAST(count(*) AS BIGINT) AS nv FROM v$r))""".stripMargin

  /** Unrolled Viterbi DP over word positions under weights CTE w<tag>:
    * s0<tag>..s16<tag> then seg<tag>(word, freq, sc, np, seg). max_by
    * on the packed key — unique argmax (equal (sc,np,lastLen) at a
    * position implies the identical transition). */
  private def dpBlock(tag: String): String = {
    val lvl0 = s"s0$tag AS MATERIALIZED (SELECT word, freq, CAST(0 AS BIGINT) AS sc, " +
      s"CAST(0 AS BIGINT) AS np, CAST('' AS VARCHAR) AS seg FROM types)"
    val levels = (1 to MaxWordLen).map { j =>
      val branches = (1 to math.min(MaxPieceLen, j)).map { l =>
        val i = j - l
        s"""    SELECT b.word, b.freq, b.sc + w.w AS csc, b.np + 1 AS cnp,
           |           concat(CASE WHEN b.np = 0 THEN '' ELSE b.seg || chr(9) END,
           |                  substr(b.word, ${i + 1}, $l)) AS cseg,
           |           (b.sc + w.w) * 2048 - (b.np + 1) * 64 + $l AS cpk
           |    FROM s$i$tag b JOIN w$tag w ON w.piece = substr(b.word, ${i + 1}, $l)
           |    WHERE length(b.word) >= $j""".stripMargin
      }.mkString("\n    UNION ALL\n")
      s"""s$j$tag AS MATERIALIZED (
         |  SELECT word, freq, st.sc AS sc, st.np AS np, st.seg AS seg FROM (
         |    SELECT word, freq,
         |           max_by(struct_pack(sc := csc, np := cnp, seg := cseg), cpk) AS st
         |    FROM (
         |$branches
         |    ) GROUP BY word, freq))""".stripMargin
    }
    val fin = (1 to MaxWordLen).map(j =>
      s"  SELECT word, freq, sc, np, seg FROM s$j$tag WHERE length(word) = $j")
      .mkString("\n  UNION ALL\n")
    (Seq(lvl0) ++ levels :+ s"seg$tag AS MATERIALIZED (\n$fin)").mkString(",\n")
  }

  private def countsCte(tag: String): String =
    s"""c$tag AS MATERIALIZED (
       |  SELECT piece, CAST(SUM(freq) AS BIGINT) AS cnt
       |  FROM (SELECT freq, unnest(string_split(seg, chr(9))) AS piece FROM seg$tag)
       |  GROUP BY piece)""".stripMargin

  private def pruneCte(r: String, fromCounts: String): String =
    s"""v$r AS MATERIALIZED (
       |  SELECT piece, cnt FROM (
       |    SELECT piece, cnt, ROW_NUMBER() OVER (ORDER BY cnt DESC, piece) AS rn
       |    FROM $fromCounts) WHERE rn <= $VocabK
       |  UNION
       |  SELECT ch.piece, COALESCE(c.cnt, 0) FROM chars ch
       |  LEFT JOIN $fromCounts c ON c.piece = ch.piece)""".stripMargin

  /** WITH-prefix shared by both queries: types → seed → v0/w0 → EM
    * round 1 (DP r1, counts, v1/w1) → EM round 2 (DP r2, counts,
    * v2/w2). */
  private def trainerCtes: String =
    s"""WITH types AS MATERIALIZED (
       |  SELECT tok AS word, CAST(count(*) AS BIGINT) AS freq
       |  FROM (SELECT unnest(list_filter(regexp_split_to_array(text, '\\s+'),
       |                                  x -> x <> '')) AS tok
       |        FROM documents)
       |  WHERE length(tok) <= $MaxWordLen
       |  GROUP BY tok),
       |seed AS MATERIALIZED (
       |  SELECT piece, CAST(SUM(freq) AS BIGINT) AS cnt
       |  FROM (SELECT freq,
       |          unnest(flatten([[substr(word, i, l)
       |                           FOR i IN range(1, length(word) - l + 2)]
       |                          FOR l IN range(1, ${MaxPieceLen + 1})])) AS piece
       |        FROM types)
       |  GROUP BY piece),
       |chars AS MATERIALIZED (SELECT piece FROM seed WHERE length(piece) = 1),
       |v0 AS MATERIALIZED (
       |  SELECT piece, cnt FROM (
       |    SELECT piece, cnt, ROW_NUMBER() OVER (ORDER BY cnt DESC, piece) AS rn
       |    FROM seed) WHERE rn <= $SeedK OR length(piece) = 1),
       |${weightsCte("0")},
       |${dpBlock("0")},
       |${countsCte("0")},
       |${pruneCte("1", "c0")},
       |${weightsCte("1")},
       |${dpBlock("1")},
       |${countsCte("1")},
       |${pruneCte("2", "c1")},
       |${weightsCte("2")}""".stripMargin

  /** Trainer output: the final pruned vocabulary with exact counts and
    * fixed-point weights. HASH-MATCHED (the oracle replays seed + both
    * EM rounds + prunes end to end). */
  val q299 = QueryDef.oracle("q299_unigram_lm_train",
    s"""$trainerCtes
       |SELECT piece, cnt, w AS weight FROM w2""".stripMargin)(
    (s, d) => vocabArtifact(s, d)
      .select(col("piece"), col("cnt"), col("weight")))

  /** Apply: Viterbi-segment every word type under the TRAINED vocab —
    * per type, the piece count and the tab-joined segmentation (the
    * fertility ledger a tokenizer eval reads). HASH-MATCHED: the
    * oracle replays the trainer AND the final DP. */
  val q300 = QueryDef.oracle("q300_unigram_lm_apply",
    s"""$trainerCtes,
       |${dpBlock("2")}
       |SELECT word, freq, np AS n_pieces, seg FROM seg2""".stripMargin)(
    (s, d) => {
      val v = vocabArtifact(s, d).collect()
        .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq
      val pieces = typedLit(v.map(_._1))
      val ws = typedLit(v.map(_._3))
      typesDf(s, d)
        .select(col("word"), col("freq"),
          HashFunctions.unigramSegment(col("word"), pieces, ws).as("seg"))
        .select(col("word"), col("freq"),
          size(split(col("seg"), "\t")).cast("long").as("n_pieces"),
          col("seg"))
    })

  /** TOKENIZER AGREEMENT — BPE (q156–q174's trained merges) vs
    * unigram-LM (q299's trained vocab) on the SAME word types: per
    * type, each tokenizer's piece count and who compresses better. The
    * eval a tokenizer bake-off actually reads — fertility (q173) says
    * how expensive each tokenizer is alone, this says WHERE they
    * disagree, type by type, weighted by frequency. BPE token count =
    * characters after the k sentinel merges (q165's convention, the
    * stored `bpe_merges` artifact applied per type); unigram count =
    * the Viterbi piece count under the stored vocab. Types longer than
    * MaxWordLen follow the unigram gate (the inner join makes the
    * domains equal). The oracle replays BOTH trainers end to end —
    * the unigram chain (q300's full statement nested as a CTE) and the
    * k-round BPE chain with its per-type replace ladder. Scale shape:
    * two linear type-table passes (one per tokenizer, both against
    * bounded broadcast side-data) + one |types|-row join.
    * HASH-MATCHED. */
  val q303 = QueryDef.oracle("q303_tokenizer_agreement", {
    val k = TextQueries.BpeTrainK
    val rewrites = (1 to k).map { r =>
      val src = if (r == 1) "ty" else s"ty${r - 1}"
      s"ty$r AS (SELECT word, replace($src.w, (SELECT pair FROM mr$r), chr($r)) AS w FROM $src)"
    }.mkString(",\n")
    val bpeInner =
      s"""${TextQueries.bpeTrainCtesK(k)},
         |ty AS (SELECT w AS word, w FROM (SELECT DISTINCT w FROM w)
         |       WHERE length(w) <= $MaxWordLen),
         |$rewrites
         |SELECT word, CAST(length(w) AS BIGINT) AS bpe_tokens FROM ty$k""".stripMargin
    s"""WITH uni AS (
       |${q300.sql.get}
       |),
       |bpet AS (
       |$bpeInner
       |)
       |SELECT u.word, u.freq, u.n_pieces AS uni_tokens, b.bpe_tokens,
       |       u.n_pieces - b.bpe_tokens AS diff,
       |       CASE WHEN u.n_pieces < b.bpe_tokens THEN 'unigram'
       |            WHEN u.n_pieces > b.bpe_tokens THEN 'bpe'
       |            ELSE 'tie' END AS winner
       |FROM uni u JOIN bpet b USING (word)""".stripMargin})(
    (s, d) => {
      val uni = q300.fn(s, d)
        .select(col("word"), col("freq"), col("n_pieces").as("uni_tokens"))
      val mrow = TextQueries.bpeMergeRow(s, d)
      val bpe = typesDf(s, d)
        .select(col("word"))
        .crossJoin(broadcast(mrow))
        .select(col("word"),
          length(expr("aggregate(ms, word, (acc, m) -> replace(acc, m.pat, m.sent))"))
            .cast("long").as("bpe_tokens"))
      uni.join(bpe, Seq("word"))
        .select(col("word"), col("freq"), col("uni_tokens"), col("bpe_tokens"),
          (col("uni_tokens") - col("bpe_tokens")).as("diff"),
          when(col("uni_tokens") < col("bpe_tokens"), "unigram")
            .when(col("uni_tokens") > col("bpe_tokens"), "bpe")
            .otherwise("tie").as("winner"))
    })

  val defs: Seq[QueryDef] = Seq(q299, q300, q303)
}
