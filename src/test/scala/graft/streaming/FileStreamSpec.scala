package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** File-source streaming: the events table consumed as an arriving-file
  * stream (the production shape of the sales-feed ingestion), windowed,
  * written via foreachBatch — results must converge to the batch answer.
  */
class FileStreamSpec extends SparkSpec {

  test("parquet file stream through tumbling windows converges to the batch result") {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val src = java.nio.file.Files.createTempDirectory("graft-stream-src")
    // stage the sf0.001 events file as "arriving" input
    java.nio.file.Files.copy(
      java.nio.file.Paths.get("/root/testdata/sf0.001/events.parquet"),
      src.resolve("batch0.parquet"))

    val schema = spark.read.parquet(src.toString).schema
    val stream = graft.Tables.normalizeEventTs(
      spark.readStream.schema(schema).parquet(src.toString))

    val results = scala.collection.mutable.Map[(java.sql.Timestamp, String), (Long, Long)]()
    val q = EventStreams.tumbling(stream)
      .writeStream.outputMode("complete")
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        batch.collect().foreach { r =>
          results((r.getTimestamp(0), r.getString(1))) = (r.getLong(2), r.getLong(3))
        }
      }
      .start()
    try q.processAllAvailable() finally q.stop()

    val expected = EventStreams.tumbling(
        graft.Tables.events(spark, "/root/testdata/sf0.001"))
      .collect().map(r => (r.getTimestamp(0), r.getString(1)) -> ((r.getLong(2), r.getLong(3))))
      .toMap
    assert(results.toMap == expected)
    assert(expected.nonEmpty)
  }
}
