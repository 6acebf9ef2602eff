package graft

import graft.functions.VectorFunctions._
import org.apache.spark.sql.functions._

class VectorFunctionsSpec extends SparkSpec {
  import spark.implicits._

  private val df = Seq(
    (Seq(1.0f, 2.0f, 3.0f), Seq(4.0f, 5.0f, 6.0f), Seq(0.0f, 0.0f, 0.0f))
  ).toDF("a", "b", "z")

  test("dot product widens to double and is exact on small ints") {
    assert(df.select(dot(col("a"), col("b")).as("v")).collect().head.getDouble(0) == 32.0)
  }

  test("l2 norm") {
    val v = df.select(l2Norm(col("b")).as("v")).collect().head.getDouble(0)
    assert(math.abs(v - math.sqrt(77.0)) < 1e-9)
  }

  test("cosine of a vector with itself is 1; with zero vector is null") {
    val row = df.select(
      cosine(col("a"), col("a")).as("self"),
      cosine(col("a"), col("z")).as("zero")).collect().head
    assert(math.abs(row.getDouble(0) - 1.0) < 1e-12)
    assert(row.isNullAt(1))
  }

  test("l2DistSq") {
    assert(df.select(l2DistSq(col("a"), col("b")).as("v")).collect().head.getDouble(0) == 27.0)
  }

  test("signBucket maps sign pattern to bits, first dim = high bit") {
    val d2 = Seq((Seq(1.0f, -1.0f, 2.0f, -0.5f), Seq(-1.0f, -1.0f, -1.0f, -1.0f)))
      .toDF("v", "neg")
    val row = d2.select(signBucket(col("v"), 4).as("b"), signBucket(col("neg"), 4).as("n"))
      .collect().head
    assert(row.getLong(0) == 0xAL) // 1010
    assert(row.getLong(1) == 0L)
  }
}
