package graft.streaming

import java.sql.Timestamp

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

class VecStreamsSpec extends SparkSpec {
  import spark.implicits._
  import VecStreams._

  private def t(s: String) = Timestamp.valueOf(s)

  // two orthogonal centroid directions (already in 1e-4 integer units)
  private val cents: Array[(Int, Array[Long])] = Array(
    0 -> (Array(10000L, 0L) ++ Array.fill(6)(0L)),
    1 -> (Array(0L, 10000L) ++ Array.fill(6)(0L)))

  private def vec(xs: Float*): Seq[Float] = xs ++ Seq.fill(8 - xs.length)(0.0f)

  private val vA = vec(1.0f, 0.1f)        // cluster 0
  private val vAdup = vec(0.98f, 0.12f)   // cos(vA, vAdup) ≈ 0.9996 — dup
  private val vAfar = vec(0.3f, -0.95f)   // cluster 1 actually? x small... see assert below
  private val vB = vec(0.1f, 1.0f)        // cluster 1
  private val orthoA = vec(0.1f, -1.0f)   // cluster assignment cluster0? cos with e1=0.0995 vs e2=-0.995 → cluster 0

  test("quantize matches Spark round() (HALF_UP) on negative half-units") {
    import org.apache.spark.sql.functions.{col, round}
    val vals = Seq(-0.03125, 0.03125, -0.00005, 0.00005, 1.23456)
    val sparkSide = vals.toDF("x")
      .select(round(col("x") * 10000).cast("long")).collect().map(_.getLong(0))
    val streamSide = vals.map(VecStreams.quantize)
    assert(streamSide == sparkSide.toSeq,
      s"stream $streamSide vs batch ${sparkSide.toSeq} — verdicts would diverge")
    assert(VecStreams.quantize(-0.03125) == -313L) // math.round would say -312
  }

  test("threshold predicate: clear dup above, orthogonal below, zero-norm never") {
    def q(v: Seq[Float]) = v.map(x => math.round(x.toDouble * 10000)).toArray
    assert(closeEnough(q(vA), q(vAdup), 7, 20))
    assert(!closeEnough(q(vA), q(vB), 7, 20))
    assert(!closeEnough(q(vec()), q(vA), 7, 20), "zero-norm matched")
  }

  test("dimension mismatch matches nothing and assigns to the sentinel cluster — never throws") {
    def q(v: Seq[Float]) = v.map(x => math.round(x.toDouble * 10000)).toArray
    val short = Array(10000L, 500L) // 2 dims vs the 8-dim members/centroids
    assert(!closeEnough(short, q(vA), 7, 20))
    assert(!closeEnough(q(vA), short, 7, 20))
    assert(assign(short, cents) == Int.MinValue, "all centroids skipped")
    assert(assign(q(vA), cents) == 0, "well-formed assignment unchanged")
  }

  test("clamped non-finite coordinates promote to BigInt — verdict is exact, not wrapped") {
    // quantize(Inf) clamps to Long.MaxValue, whose square wraps a Long;
    // identical degraded vectors have cosine exactly 1 and MUST match,
    // while a degraded vs a normal vector is decided by the exact math
    val degraded = Array(Long.MaxValue, Long.MaxValue, 0L)
    assert(quantize(Double.PositiveInfinity) == Long.MaxValue)
    assert(quantize(Double.NaN) == 0L)
    assert(closeEnough(degraded, degraded, 7, 20),
      "identical degraded vectors are cos=1 — the wrapped-Long form got this wrong")
    val ortho = Array(0L, 0L, 10000L)
    assert(!closeEnough(degraded, ortho, 7, 20))
  }

  test("a wrong-dimension vector flows through the stream without killing it") {
    implicit val sq = spark.sqlContext
    val ms = MemoryStream[Vec]
    val q = VecStreams.semanticDupCandidates(ms.toDF(), cents)
      .writeStream.format("memory").queryName("vdbad").outputMode("append").start()
    try {
      ms.addData(
        Vec(1, t("2024-01-01 10:00:00"), vA),
        Vec(2, t("2024-01-01 10:00:10"), Seq(1.0f)), // 1 dim vs 8-dim centroids
        Vec(3, t("2024-01-01 10:00:20"), vAdup))
      q.processAllAvailable() // pre-guard this threw AIOOBE and killed the query
      val out = spark.table("vdbad").as[SemDup].collect().toSeq
      assert(out == Seq(SemDup(3, 1, 0, t("2024-01-01 10:00:20"))),
        s"well-formed dup detection must survive the malformed row: $out")
    } finally q.stop()
  }

  test("a later semantic near-dup is flagged against the earliest member; cross-cluster never compares") {
    implicit val sq = spark.sqlContext
    val ms = MemoryStream[Vec]
    val q = VecStreams.semanticDupCandidates(ms.toDF(), cents)
      .writeStream.format("memory").queryName("vd1").outputMode("append").start()
    try {
      ms.addData(Vec(1, t("2024-01-01 10:00:00"), vA),
        Vec(2, t("2024-01-01 10:00:30"), vB))
      q.processAllAvailable()
      assert(spark.table("vd1").count() == 0) // both admitted
      ms.addData(Vec(3, t("2024-01-01 10:01:00"), vAdup))
      q.processAllAvailable()
      val out = spark.table("vd1").as[SemDup].collect()
      assert(out.toSeq == Seq(SemDup(3, 1, 0, t("2024-01-01 10:01:00"))),
        s"unexpected: ${out.mkString(", ")}")
    } finally q.stop()
  }

  test("admit-first within one trigger, ordered by (ts, vec_id); dups never become members") {
    implicit val sq = spark.sqlContext
    val ms = MemoryStream[Vec]
    val q = VecStreams.semanticDupCandidates(ms.toDF(), cents)
      .writeStream.format("memory").queryName("vd2").outputMode("append").start()
    try {
      // all one trigger: 9 admits (earliest in cluster 0); 8 (cos vs
      // 9 = .8) is flagged against 9 and therefore NEVER admitted; 7
      // assigns to cluster 1 (cos vs e2 .89 > vs e1 .45) and admits
      // there — cross-cluster similarity to 9 (cos .45 ≥ .35!) is
      // invisible by design, SemDeDup only compares within a cluster
      ms.addData(
        Vec(9, t("2024-01-01 10:00:00"), vec(1.0f, 0.0f)),
        Vec(8, t("2024-01-01 10:00:10"), vec(0.80f, 0.60f)),
        Vec(7, t("2024-01-01 10:00:20"), vec(0.45f, 0.89f)))
      q.processAllAvailable()
      val out = spark.table("vd2").as[SemDup].collect().toSeq
      assert(out.toSet == Set(SemDup(8, 9, 0, t("2024-01-01 10:00:10"))),
        s"unexpected: ${out.mkString(", ")}")
    } finally q.stop()
  }

  test("cluster state evicts past the horizon: a replayed vector re-admits instead of flagging") {
    implicit val sq = spark.sqlContext
    val ms = MemoryStream[Vec]
    val q = VecStreams.semanticDupCandidates(ms.toDF(), cents,
        watermark = "1 minute", horizonSeconds = 60L)
      .writeStream.format("memory").queryName("vd3").outputMode("append").start()
    try {
      ms.addData(Vec(1, t("2024-01-01 10:00:00"), vA))
      q.processAllAvailable()
      // push the watermark far past 10:00 + horizon via another cluster
      ms.addData(Vec(2, t("2024-01-01 12:00:00"), vB))
      q.processAllAvailable()
      ms.addData(Vec(3, t("2024-01-01 12:00:30"), vAdup)) // vs evicted 1
      q.processAllAvailable()
      assert(spark.table("vd3").count() == 0,
        "vector was flagged against a member the horizon should have evicted")
    } finally q.stop()
  }

  test("batch execution: same emission rule over full history, agrees with a reference fold") {
    val rows = Seq(
      Vec(1, t("2024-01-01 10:00:00"), vA),
      Vec(2, t("2024-01-01 10:01:00"), vB),
      Vec(3, t("2024-01-01 10:02:00"), vAdup),
      Vec(4, t("2024-01-01 10:03:00"), orthoA),
      Vec(5, t("2024-01-01 10:04:00"), vec(0.11f, -0.99f))) // dup of 4
    val got = VecStreams.semanticDupCandidates(rows.toDF(), cents)
      .collect().map(d => d.vec_id -> d.dup_of).toMap

    // independent reference: greedy admit-first fold in arrival order
    def q(v: Seq[Float]) = v.map(x => math.round(x.toDouble * 10000)).toArray
    val byCluster = rows.sortBy(r => (r.ts.getTime, r.vec_id))
      .groupBy(r => assign(q(r.embedding), cents))
    val expected = byCluster.values.flatMap { members =>
      val admitted = scala.collection.mutable.ArrayBuffer.empty[Vec]
      members.flatMap { v =>
        admitted.find(m => closeEnough(q(m.embedding), q(v.embedding), 7, 20)) match {
          case Some(m) => Some(v.vec_id -> m.vec_id)
          case None => admitted += v; None
        }
      }
    }.toMap
    assert(expected.nonEmpty, "fixture produced no dups — vacuous")
    assert(got == expected)
  }
}
