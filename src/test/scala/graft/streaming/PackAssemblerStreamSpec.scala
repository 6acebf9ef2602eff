package graft.streaming

import java.sql.Timestamp

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** Stream ≡ batch for the STATEFUL pack assembler: feeding the corpus
  * through [[DocStreams.packAssembler]] in (source-wise) doc_id order —
  * split across two triggers, so the cumulative-token state must carry
  * over a trigger boundary — reproduces q77's concat-and-chunk
  * assignment bit-for-bit, including the NULL-text column semantics
  * (n_tokens/end_chunk/n_chunks NULL, cum_before/start_chunk real, no
  * state advance). A crafted feed pins the chunk-boundary arithmetic
  * (mid-chunk start, spanning docs, empty doc, exact-fit doc).
  */
class PackAssemblerStreamSpec extends SparkSpec {
  import spark.implicits._

  private val d = "/root/testdata/sf0.001"
  private def t(s: String) = Timestamp.valueOf(s)

  private def words(n: Int): String = Seq.fill(n)("w").mkString(" ")

  test("streamed pack assignment == q77 batch, state carried across two triggers") {
    implicit val sq = spark.sqlContext
    val docs = graft.Tables.documents(spark, d)
      .select(col("doc_id"), col("source"), col("text"))
      .collect().map(r => PackFeed(r.getLong(0), t("2024-01-01 10:00:00"),
        r.getString(1), if (r.isNullAt(2)) null else r.getString(2)))
      .sortBy(_.doc_id)
    val ms = MemoryStream[PackFeed]
    val q = DocStreams.packAssembler(ms.toDF())
      .writeStream.format("memory").queryName("packasm")
      .outputMode("append").start()
    try {
      val (first, second) = docs.splitAt(docs.length / 2)
      ms.addData(first.toSeq)
      q.processAllAvailable()
      ms.addData(second.toSeq)
      q.processAllAvailable()
      val streamed = spark.table("packasm").as[DocStreams.PackAssign]
        .collect().map(a => a.doc_id ->
          ((a.n_tokens, a.cum_before, a.start_chunk, a.end_chunk,
            a.n_chunks))).toMap
      val batch = graft.SparkEntry.queries("q77_token_packing")(spark, d)
        .collect().map { r =>
          r.getLong(0) -> ((
            if (r.isNullAt(2)) None else Some(r.getLong(2)),
            r.getLong(3), r.getLong(4),
            if (r.isNullAt(5)) None else Some(r.getLong(5)),
            if (r.isNullAt(6)) None else Some(r.getLong(6))))
        }.toMap
      assert(streamed.keySet == batch.keySet)
      val diverged = batch.keys.filter(k => streamed(k) != batch(k)).toSeq.sorted
      assert(diverged.isEmpty, diverged.take(5).map(k =>
        s"doc $k: stream=${streamed(k)} batch=${batch(k)}").mkString("\n"))
      // the corpus is big enough that some doc must span a chunk boundary
      assert(streamed.values.exists(_._5.exists(_ > 1)), "no spanning doc")
    } finally q.stop()
  }

  test("chunk-boundary arithmetic: spanning, empty, null-text, exact-fit docs") {
    implicit val sq = spark.sqlContext
    val ms = MemoryStream[PackFeed]
    val q = DocStreams.packAssembler(ms.toDF())
      .writeStream.format("memory").queryName("packbound")
      .outputMode("append").start()
    try {
      ms.addData(Seq(
        PackFeed(1, t("2024-01-01 10:00:00"), "s", words(600)),
        PackFeed(2, t("2024-01-01 10:00:01"), "s", ""),
        PackFeed(3, t("2024-01-01 10:00:02"), "s", null),
        PackFeed(4, t("2024-01-01 10:00:03"), "s", words(424))))
      q.processAllAvailable()
      // next trigger: state must resume at exactly 1024 tokens
      ms.addData(Seq(PackFeed(5, t("2024-01-01 10:00:04"), "s", words(1))))
      q.processAllAvailable()
      val out = spark.table("packbound").as[DocStreams.PackAssign]
        .collect().map(a => a.doc_id ->
          ((a.n_tokens, a.cum_before, a.start_chunk, a.end_chunk,
            a.n_chunks))).toMap
      assert(out(1L) == ((Some(600L), 0L, 0L, Some(1L), Some(2L))))
      assert(out(2L) == ((Some(0L), 600L, 1L, None, Some(0L))))
      assert(out(3L) == ((None, 600L, 1L, None, None)))
      assert(out(4L) == ((Some(424L), 600L, 1L, Some(1L), Some(1L))))
      assert(out(5L) == ((Some(1L), 1024L, 2L, Some(2L), Some(1L))))
    } finally q.stop()
  }
}

final case class PackFeed(doc_id: Long, ts: Timestamp, source: String,
    text: String)
