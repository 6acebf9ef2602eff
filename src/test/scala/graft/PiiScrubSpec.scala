package graft

import graft.functions.HashFunctions.piiScrubNative
import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Differential gate for the fused PII kernel (q176's engine path):
  * [[graft.functions.PiiKernels]] must agree with the sequential
  * three-pass REGEX formulation — Spark's Java-regex `regexp_count` /
  * `regexp_replace` chain, the same patterns the DuckDB oracle runs —
  * on counts AND the redacted text, over adversarial fixtures and the
  * whole sf0.001 corpus with q176's injection applied.
  */
class PiiScrubSpec extends SparkSpec {
  import spark.implicits._

  // the QUERY's own patterns — shared, so the spec cannot drift from q176
  private val EmailRe = graft.operators.CurationQueries.EmailRe
  private val IpRe = graft.operators.CurationQueries.IpRe
  private val PhoneRe = graft.operators.CurationQueries.PhoneRe

  /** The reference: three sequential Java-regex passes, counts taken on
    * the text each pass actually sees. */
  private def regexChain(t: Column): Column = {
    val r1 = regexp_replace(t, EmailRe, "[EMAIL]")
    val r2 = regexp_replace(r1, IpRe, "[IP]")
    val r3 = regexp_replace(r2, PhoneRe, "[PHONE]")
    struct(
      regexp_count(t, lit(EmailRe)).as("n_emails"),
      regexp_count(r2, lit(PhoneRe)).as("n_phones"),
      regexp_count(r1, lit(IpRe)).as("n_ips"),
      r3.as("redacted"))
  }

  private def diff(texts: Seq[String]): Seq[(String, String, String)] =
    texts.toDF("t")
      .select(col("t"), piiScrubNative(col("t")).as("k"), regexChain(col("t")).as("r"))
      .filter(col("k") =!= col("r"))
      .select(col("t"), col("k").cast("string"), col("r").cast("string"))
      .as[(String, String, String)].collect().toSeq

  test("kernel == regex chain on adversarial fixtures") {
    val fixtures = Seq(
      "", " ", "@", "a@b", "a@b.c", "a@b.cd", "x a.b@c.de y",
      // greedy-domain backtrack: trailing junk after the TLD
      "a@b.ccc-d.ee-", "a@b.cd.ef", "a@b.cd.e", "u@x.co9",
      // adjacent/overlapping candidates
      "a@b.cc@d.ee", "a@@b.cc", "x@y.zz@w.aaa", "..a..@..b..cc..",
      // local-part class edges (%, +, -, ., _)
      "a.%+-_9@ex-a.mple.org!", "-@a.bc", ".@a.bc", "%a%@%.aa",
      // IPs: octet backtracking, boundaries, too-long runs
      "10.0.0.1", " 10.0.0.1 ", "x10.0.0.1", "10.0.0.1x", "1234.1.1.1",
      "1.2.3.4567", "12.34.56.789123", "1.2.3.4.5", "255.255.255.255",
      "1.2.3.4-5.6.7.8", "0.0.0.0.", "...1.2.3.4...",
      // phones: fixed-width + boundaries
      "555-0134", "x555-0134", "555-0134x", "5555-0134", "555-01345",
      "555-013", "a 555-0134, b", "555-0134-555-0134", "000-0000",
      // cross-pattern: phone-like inside IP-like, email eats digits
      "1.2.3.4 555-0134 a@b.cc", "555-0134@x.yy", "12@34.56.78.90.aa",
      "a@1.2.3.4", "a@1.2.3.com 5.6.7.8",
      // redaction tokens from an earlier pass abutting later matches
      "a@b.cc555-0134", "a@b.cc1.2.3.4",
      // non-ASCII neighbor where no \b is involved (é is outside every
      // char class, so Java and RE2 agree)
      "é a@b.cc é")
    val bad = diff(fixtures)
    assert(bad.isEmpty, s"kernel/regex divergence on:\n${bad.mkString("\n")}")
  }

  test("kernel == regex chain over the injected sf0.001 corpus") {
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
      .select(graft.operators.CurationQueries.piiInjectedCol.as("t"))
      .as[String].collect().toSeq
    val bad = diff(docs)
    assert(bad.isEmpty, s"kernel/regex divergence on corpus rows:\n${bad.take(3).mkString("\n")}")
  }

  test("\\b next to non-ASCII word chars follows RE2 (the oracle), not Java") {
    // Java's \b is Unicode-aware: δ/ü are word chars, so Java finds NO
    // boundary and NO match in these. RE2 — what DuckDB runs, i.e. the
    // ORACLE'S semantics — uses the ASCII \b and matches. The kernel
    // deliberately sides with the oracle; this pins that choice (and is
    // why these strings are excluded from the Java-chain differential
    // above). Irrelevant on the shipped corpus, which is ASCII-only.
    val r = Seq("δ10.0.0.1δ", "ü555-0134ü").toDF("t")
      .select(piiScrubNative(col("t")).as("k"))
      .select(col("k.n_ips"), col("k.n_phones"), col("k.redacted"))
      .as[(Int, Int, String)].collect().toList
    assert(r == List((1, 0, "δ[IP]δ"), (0, 1, "ü[PHONE]ü")))
  }

  test("pass order is observable: counts are per-pass, not per-original") {
    // an email whose domain is an IP: the email pass consumes it, so the
    // IP pass must NOT count it; a separate bare IP still counts
    val r = Seq("a@1.2.3.com 5.6.7.8").toDF("t")
      .select(piiScrubNative(col("t")).as("k"))
      .select(col("k.n_emails"), col("k.n_ips"), col("k.redacted"))
      .as[(Int, Int, String)].head()
    assert(r == ((1, 1, "[EMAIL] [IP]")))
  }
}
