package graft

import org.apache.spark.sql.functions._

/** q192's accounting against an independent recompute on the real
  * corpus (Σ per-dim sumsq must equal the directly-summed quantized
  * squared norms), plus a crafted-vector case pinning the
  * truncate-toward-zero mean on a NEGATIVE non-divisible sum — the
  * cell where floor-division engines would disagree.
  */
class DimStatsSpec extends SparkSpec {
  import spark.implicits._

  test("dim stats tile the corpus: n_vecs everywhere, Σ sumsq == direct norm sum") {
    val d = "/root/testdata/sf0.001"
    // sum_q/sumsq_q ship as digit strings (the q149 wire convention)
    val rows = SparkEntry.queries("q192_embedding_dim_stats")(spark, d)
      .collect().map(r => (r.getInt(0).toLong, r.getLong(1),
        r.getString(2).toLong, r.getString(3).toLong,
        r.getLong(6)))
    val n = Tables.embeddings(spark, d).count()
    assert(rows.length == 64 && rows.map(_._1).toSet == (0L until 64L).toSet)
    assert(rows.forall(_._2 == n), "every dimension must see every vector")
    // independent recompute of the total quantized energy
    val direct = Tables.embeddings(spark, d)
      .select(explode(transform(col("embedding").cast("array<double>"),
        x => round(x * 10000).cast("long"))).as("q"))
      .agg(sum(col("q") * col("q"))).collect()(0).getLong(0)
    assert(rows.map(_._4).sum == direct, "Σ per-dim sumsq != direct norm sum")
    // mean is the exact integer division of the published sums
    rows.foreach { case (dim, nv, sq, _, mean) =>
      assert(mean == (100L * sq) / nv, s"mean drift at dim $dim")
    }
  }

  test("negative non-divisible sums truncate toward zero (the engine-agreement cell)") {
    val dir = java.nio.file.Files.createTempDirectory("graft-dimstats-").toString
    Seq(
      (1L, Seq(-0.0001f, 1.0f), 0),
      (2L, Seq(-0.0001f, 0.5f), 0),
      (3L, Seq(0.0f, -0.75f), 0))
      .toDF("vec_id", "embedding", "label")
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    val out = SparkEntry.queries("q192_embedding_dim_stats")(spark, dir)
      .collect().map(r => r.getInt(0).toLong ->
        (r.getString(2).toLong, r.getLong(6))).toMap
    // dim 0: q = (-1, -1, 0) -> sum -2; (100 * -2) div 3 = -66 (trunc), not -67 (floor)
    assert(out(0L) == (-2L, -66L), s"dim0: $out")
    // dim 1: q = (10000, 5000, -7500) -> sum 7500; 750000 div 3 = 250000
    assert(out(1L) == (7500L, 250000L), s"dim1: $out")
  }
}
