package graft

import org.apache.spark.sql.types.{ArrayType, DataType, DecimalType, MapType, StructType}
import org.scalatest.funsuite.AnyFunSuite

/** Wire-format regression guard (VERDICT r9 task 6): no declared query
  * may ship DecimalType in its FINAL schema.
  *
  * The driver's hasher renders DuckDB DECIMAL columns as float64 (via
  * `.df()`) while Spark's parquet output keeps fixed-point — the same
  * value stringifies differently and the hash comparison fails even
  * when the math is exact (first documented at q149, then violated by
  * q192/q204 in round 9). The repo convention: do ALL exact math in
  * DECIMAL internally, but ship such columns as VARCHAR — the digit
  * string is identical on both engines.
  *
  * This spec analyzes (not executes) every declared query at sf0.001
  * and fails with the offending (query, column) list if any final
  * schema contains a decimal anywhere, including nested in arrays /
  * maps / structs. Queries whose construction itself runs jobs (stored
  * artifacts, power iteration) do that work once here — acceptable at
  * sf0.001.
  */
class DecimalWireGuardSpec extends SparkSpec {

  private val d = "/root/testdata/sf0.001"

  private def decimalPaths(t: DataType, path: String): Seq[String] = t match {
    case _: DecimalType => Seq(path)
    case s: StructType =>
      s.fields.toSeq.flatMap(f => decimalPaths(f.dataType, s"$path.${f.name}"))
    case a: ArrayType => decimalPaths(a.elementType, s"$path[]")
    case m: MapType =>
      decimalPaths(m.keyType, s"$path<key>") ++
        decimalPaths(m.valueType, s"$path<value>")
    case _ => Seq.empty
  }

  test("no declared query ships DecimalType in its final schema") {
    val offenders = SparkEntry.allDefs.flatMap { q =>
      val schema = q.fn(spark, d).schema
      decimalPaths(schema, q.name)
    }
    assert(offenders.isEmpty,
      s"DECIMAL on the wire (cast to string per the q149 convention): " +
        offenders.mkString(", "))
  }
}
