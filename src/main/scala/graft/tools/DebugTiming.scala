package graft.tools

import graft._
import graft.operators._
import org.apache.spark.sql.functions._

/** Throwaway profiling harness for iterating on slow queries (not part of
  * the driver contract). */
object DebugTiming {
  def main(args: Array[String]): Unit = {
    val d = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val s = GraftSession.get()
    def t[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[debug] $name%-28s ${(System.nanoTime() - t0) / 1e9}%8.2f s"); r
    }
    import DedupQueries._
    val sigs = t("signatures") {
      Tables.documents(s, d)
        .select(col("doc_id"),
          graft.functions.HashFunctions.minhashSignature(
            graft.functions.TextFunctions.wordNgrams(col("text"), 3), MinhashK).as("sig"))
        .persist()
    }
    t("signatures.count")(println("  docs=" + sigs.count()))
    val banded = sigs.select(col("doc_id"), col("sig"),
      explode(graft.functions.HashFunctions.lshBands(col("sig"), MinhashK, MinhashBands)).as("bk"))
      .select(col("doc_id"), col("sig"), col("bk.band").as("band"), col("bk.bh").as("bh"))
    val l = banded.select(col("band"), col("bh"), col("doc_id").as("src"), col("sig").as("sig_a"))
    val r = banded.select(col("band"), col("bh"), col("doc_id").as("id_b"), col("sig").as("sig_b"))
    val edges = l.join(r, Seq("band", "bh")).filter(col("src") < col("id_b"))
      .select(col("src"), col("id_b").as("dst"),
        graft.functions.HashFunctions.minhashJaccard(col("sig_a"), col("sig_b")).as("j"))
      .distinct()
      .filter(col("j") >= 0.5)
      .select(col("src"), col("dst"))
    val edgesP = t("edges.persist+count") { val e = edges.persist(); println("  edges=" + e.count()); e }
    val vertices = Tables.documents(s, d).select(col("doc_id").as("id"))
    val comp = t("connectedComponents") {
      val c = Components.connectedComponents(vertices, edgesP); c.count(); c
    }
    t("sizes+join") {
      val sizes = comp.groupBy("component").agg(count(lit(1)).as("cluster_size"))
      comp.join(sizes, "component").count()
    }
    s.stop()
  }
}
