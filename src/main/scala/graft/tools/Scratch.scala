package graft.tools
import org.apache.spark.sql.functions._
object Scratch {
  def main(args: Array[String]): Unit = {
    val s = graft.GraftSession.get()
    val d = "/root/testdata/sf0.1"
    val df = graft.SparkEntry.queries("q310_deletion_neighborhood_join")(s, d)
    df.explain("formatted")
    var t0 = System.nanoTime
    println("ROWS " + df.count() + " in " + (System.nanoTime-t0)/1e9 + "s")
    // stage timings: candidates without distinct, then with, then verify
    val names = graft.Tables.customer(s, d).select(col("c_custkey").as("k"), col("c_name").as("nm"))
    val vars = names.select(col("k"), col("nm"),
      explode(expr("array_distinct(array_append(transform(sequence(1, length(nm)), i -> concat(substr(nm, 1, i - 1), substr(nm, i + 1, length(nm)))), nm))")).as("v"))
    t0 = System.nanoTime
    println("VARS " + vars.count() + " in " + (System.nanoTime-t0)/1e9 + "s")
    val cand = vars.alias("a").join(vars.alias("b"), col("a.v") === col("b.v") && col("a.nm") < col("b.nm"))
      .select(col("a.nm").as("name_a"), col("b.nm").as("name_b"), col("a.k").as("key_a"), col("b.k").as("key_b"))
    t0 = System.nanoTime
    println("CAND " + cand.count() + " in " + (System.nanoTime-t0)/1e9 + "s")
    t0 = System.nanoTime
    println("DIST " + cand.distinct().count() + " in " + (System.nanoTime-t0)/1e9 + "s")
    s.stop()
  }
}
