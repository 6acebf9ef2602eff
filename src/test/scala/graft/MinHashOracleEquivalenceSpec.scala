package graft

import graft.functions.HashFunctions.{lshBands, minhashTextSignature}
import org.apache.spark.sql.catalyst.expressions.XXH64
import org.apache.spark.sql.functions._
import org.apache.spark.unsafe.Platform

/** Independent-replay coverage for the MinHash kernels: replay the
  * ENTIRE computation — tokenization, gram construction, the hash
  * family, banding, group union, estimated Jaccard — in independent
  * driver-side Scala over the full sf0.001 corpus, and require EXACT
  * equality. Only the primitive string hashes are shared with the
  * engine; every line of composition logic is written twice.
  *
  * Since round 12 the q51/q55 DRIVER queries ride the portable family
  * and are DuckDB-hash-matched, so this spec's roles are (a) the
  * xxhash64 signature/banding kernels that still power the STREAMING
  * admission path (`DocStreams`), replayed end to end, and (b) a
  * second, JVM-hosted replay of q55's portable group fold — defense
  * in depth over the oracle, catching a kernel edit even when both
  * SQL strings drift together.
  */
class MinHashOracleEquivalenceSpec extends SparkSpec {

  private val d = "/root/testdata/sf0.001"
  private val K = 64
  private val Bands = 16

  // splitmix64 finalizer, re-typed from the published algorithm (Steele
  // et al., "Fast splittable pseudorandom number generators") — NOT
  // imported from TextHashKernels; an accidental kernel edit must fail
  // here.
  private def mix64(v: Long): Long = {
    var z = v
    z ^= z >>> 30; z *= 0xBF58476D1CE4E5B9L
    z ^= z >>> 27; z *= 0x94D049BB133111EBL
    z ^ (z >>> 31)
  }

  private def xx(s: String, seed: Long): Long = {
    val b = s.getBytes("UTF-8")
    XXH64.hashUnsafeBytes(b, Platform.BYTE_ARRAY_OFFSET, b.length, seed)
  }

  private def grams3(text: String): Seq[String] = {
    val toks = text.split("\\s+").filter(_.nonEmpty)
    if (toks.length < 3) Seq.empty
    else toks.sliding(3).map(_.mkString(" ")).toSeq
  }

  /** q51's signature, independently: per gram two XXH64 passes (seed 42,
    * then h1-seeded), slot j = min over grams of mix64(h1 + j*h2). */
  private def xxSig(text: String): Seq[Long] = {
    val sig = Array.fill(K)(Long.MaxValue)
    for (g <- grams3(text)) {
      val h1 = xx(g, 42L)
      val h2 = xx(g, h1)
      var h = h1
      var j = 0
      while (j < K) {
        val v = mix64(h)
        if (v < sig(j)) sig(j) = v
        h += h2
        j += 1
      }
    }
    sig.toSeq
  }

  /** lshBands' key, independently: Spark's XxHash64 expression over
    * (int band, array<long> slice) folds seed 42 through hashInt then
    * element-wise hashLong. */
  private def bandKeys(sig: Seq[Long]): Seq[(Int, Long)] = {
    val r = K / Bands
    (0 until Bands).map { b =>
      var h = XXH64.hashInt(b, 42L)
      sig.slice(b * r, b * r + r).foreach(e => h = XXH64.hashLong(e, h))
      (b, h)
    }
  }

  test("streaming xxhash kernels (q51's former family): fused signature + band keys equal the independent replay on every sf0.001 doc") {
    val engine = Tables.documents(spark, d)
      .select(col("doc_id"), col("text"),
        minhashTextSignature(col("text"), 3, K).as("sig"))
      .select(col("doc_id"), col("text"), col("sig"),
        lshBands(col("sig"), K, Bands).as("bands"))
      .collect()
    assert(engine.length >= 500)
    engine.foreach { row =>
      val id = row.getLong(0)
      val text = row.getString(1)
      val sig = row.getSeq[Long](2)
      val bands = row.getSeq[org.apache.spark.sql.Row](3)
        .map(b => (b.getInt(0), b.getLong(1)))
      val expected = xxSig(text)
      assert(sig == expected, s"doc $id: signature diverged")
      assert(bands == bandKeys(expected), s"doc $id: band keys diverged")
    }
  }

  test("q55: portable group est-Jaccard matrix equals the independent JVM replay at sf0.001") {
    import graft.functions.PortableHashKernels.{P, a, b}
    val PK = graft.operators.DedupQueries.PortK
    // independent portable fold: codepoint-polynomial gram hash, then
    // per-stream affine min — written WITHOUT gramHashArray so a kernel
    // edit fails here (only the a/b stream constants are shared)
    def cpFold(s: String): Long = {
      var h = 0L; var i = 0
      while (i < s.length) {
        val cp = s.codePointAt(i)
        h = (h * 131L + cp) % P
        i += Character.charCount(cp)
      }
      h
    }
    val docs = Tables.documents(spark, d)
      .select(col("lang"), col("text")).collect()
      .map(r => (r.getString(0), r.getString(1)))
    val sigs = scala.collection.mutable.Map.empty[String, Array[Long]]
    val counts = scala.collection.mutable.Map.empty[String, Long]
    docs.foreach { case (lang, text) =>
      val sig = sigs.getOrElseUpdate(lang, Array.fill(PK)(Long.MaxValue))
      grams3(text).distinct.foreach { g =>
        val h = cpFold(g)
        var i = 0
        while (i < PK) {
          val v = (h * a(i) + b(i)) % P
          if (v < sig(i)) sig(i) = v
          i += 1
        }
      }
      counts(lang) = counts.getOrElse(lang, 0L) + 1
    }
    val expected = (for {
      (la, sa) <- sigs.toSeq; (lb, sb) <- sigs.toSeq if la < lb
    } yield {
      // Long.MaxValue = "no grams in the whole group" = NULL in the
      // engine; NULL never matches, and the replay corpus always has
      // grams per lang, so plain equality is the right comparison
      val eq = (0 until PK).count(i =>
        sa(i) != Long.MaxValue && sa(i) == sb(i))
      (la, lb, counts(la), eq.toLong, eq.toDouble / PK)
    }).toSet

    val engine = SparkEntry.queries("q55_group_minhash")(spark, d)
      .collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3),
        r.getDouble(4)))
      .toSet
    assert(engine.nonEmpty)
    assert(engine == expected)
  }
}
