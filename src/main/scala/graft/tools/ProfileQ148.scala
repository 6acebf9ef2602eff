package graft.tools

import graft._

/** Throwaway profiling harness for the q148 adjudication (round 9): runs
  * the full query N times after a warm-up and prints per-iteration wall
  * times, to separate steady-state cost from GC/job-launch variance. Not
  * part of the driver contract. */
object ProfileQ148 {
  def main(args: Array[String]): Unit = {
    val d = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val s = GraftSession.get()
    val fn = SparkEntry.queries("q148_incremental_dedup")
    def once(): Double = {
      val t0 = System.nanoTime()
      fn(s, d).queryExecution.toRdd.count()
      (System.nanoTime() - t0) / 1e9
    }
    val warm = once() // builds the band_index artifact + codegen
    println(f"[q148] warm-up (artifact build): $warm%6.3f s")
    def timeDf(label: String)(df: => org.apache.spark.sql.DataFrame): Unit = {
      val ts = (1 to 3).map { _ =>
        val t0 = System.nanoTime()
        df.queryExecution.toRdd.count()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"[q148]   $label%-22s min=${ts.min}%6.3f  runs=${ts.map(t => f"$t%5.3f").mkString(",")}")
    }
    timeDf("band_index read") {
      graft.operators.DedupQueries.storedBandIndex(s, d) // built by warm-up
    }
    timeDf("banding join") { graft.operators.DedupQueries.q148BandingJoin(s, d) }
    val times = (1 to 8).map { i =>
      val dt = once(); println(f"[q148] iter $i: $dt%6.3f s"); dt
    }
    println(f"[q148] min=${times.min}%6.3f median=${times.sorted.apply(times.size / 2)}%6.3f max=${times.max}%6.3f")
    s.stop()
  }
}
