package graft

/** Pre-commit bench-budget gate — the guardrail the round-10 verdict
  * asked for after q244 shipped at 18 s: every NEW operator gets an
  * isolated min-of-3 at sf0.1 BEFORE it lands, and anything over the
  * 3-second budget fails the gate unless BASELINE.md carries an
  * explicit design note naming it (marker: `bench-budget note: <name>`
  * anywhere in the file — the note is the place to argue why the cost
  * is structural, e.g. q147's fixed streaming-lifecycle latency).
  *
  * Usage: SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 \
  *          sbt "runMain graft.BenchGate q253_x q254_y"
  * Exit 1 on any un-noted query over budget; prints one line per query.
  * The first (warm-up) run is discarded — it pays artifact builds and
  * JIT, which the in-sweep number never does.
  */
object BenchGate {
  private val BudgetSec = 3.0

  def main(a: Array[String]): Unit = {
    require(a.nonEmpty, "BenchGate: pass query names")
    val spark = GraftSession.get()
    val d = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    // Resolve BASELINE.md explicitly (env override, else cwd) and WARN
    // when it's unreadable instead of degrading to "" — from a foreign
    // cwd every noted query would otherwise spuriously fail the gate
    // with no hint why (still fail-closed: a missing file notes nothing).
    val baselinePath = java.nio.file.Paths.get(
      sys.env.getOrElse("SPARK_GRAFT_BASELINE", "BASELINE.md"))
    val baseline = try new String(
      java.nio.file.Files.readAllBytes(baselinePath), "UTF-8") catch {
      case e: Throwable =>
        System.err.println(s"[benchgate] WARNING: cannot read " +
          s"${baselinePath.toAbsolutePath} ($e) — no bench-budget notes " +
          "will apply; set SPARK_GRAFT_BASELINE or run from the repo root")
        ""
    }
    var failed = 0
    a.foreach { name =>
      val fn = SparkEntry.queries.getOrElse(name,
        sys.error(s"BenchGate: unknown query $name"))
      val times = (1 to 4).map { _ =>
        val t0 = System.nanoTime()
        fn(spark, d).queryExecution.toRdd.count()
        (System.nanoTime() - t0) / 1e9
      }
      val best = times.drop(1).min // min-of-3 after the warm-up run
      val noted = baseline.contains(s"bench-budget note: $name")
      val ok = best <= BudgetSec || noted
      if (!ok) failed += 1
      println(f"${if (ok) "OK  " else "OVER"} $name%-32s min3=$best%.2f s" +
        (if (noted) " (noted in BASELINE.md)" else ""))
    }
    spark.stop()
    if (failed > 0) {
      System.err.println(s"[benchgate] $failed quer${if (failed == 1) "y" else "ies"} over the ${BudgetSec}s budget without a BASELINE.md note")
      sys.exit(1)
    }
  }
}
