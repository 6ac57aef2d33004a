package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode

import graft.llm.PipelineOps

/** The sketch family is STREAMING-NATIVE by construction: HLL is
  * groupBy(register).max and CMS is groupBy(r,bucket).count — both
  * run unchanged as Structured Streaming stateful aggregations (no
  * custom state machine), so the always-on distinct counter /
  * frequency summary falls out of the same code path as batch.
  * Cross-batch contract: after any number of micro-batches the
  * streamed sketch equals the batch sketch over the concatenated
  * input (sketches are pure functions of the value multiset). */
class StreamingSketchSpec extends SparkSpecBase {
  import spark.implicits._

  test("streaming HLL sketch equals batch sketch across micro-batches") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[String]
    val sk = PipelineOps.hllSketch(
      input.toDF().withColumnRenamed("value", "v"), "v", p = 6)
    val q = sk.writeStream.format("memory").queryName("hll_stream_t")
      .outputMode(OutputMode.Complete()).start()
    try {
      input.addData((1 to 800).map(i => s"u$i"): _*)
      q.processAllAvailable()
      input.addData((601 to 1500).map(i => s"u$i"): _*) // overlap
      q.processAllAvailable()
      input.addData((1501 to 2000).map(i => s"u$i"): _*)
      q.processAllAvailable()

      val streamed = spark.table("hll_stream_t")
      val batch = PipelineOps.hllSketch(
        (1 to 2000).map(i => s"u$i").toDF("v"), "v", p = 6)
      streamed.exceptAll(batch).count() shouldBe 0
      batch.exceptAll(streamed).count() shouldBe 0

      // and therefore identical estimates, to the last bit
      PipelineOps.hllEstimate(streamed, 6).head() shouldBe
        PipelineOps.hllEstimate(batch, 6).head()
    } finally q.stop()
  }

  test("streaming CMS sketch equals batch sketch across micro-batches") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[String]
    val sk = PipelineOps.countMinSketch(
      input.toDF().withColumnRenamed("value", "k"), "k",
      depth = 4, width = 32)
    val q = sk.writeStream.format("memory").queryName("cms_stream_t")
      .outputMode(OutputMode.Complete()).start()
    try {
      val b1 = (1 to 600).map(i => s"key${1 + (600.0 / i).toInt}")
      val b2 = (1 to 400).map(i => s"key${1 + i % 7}")
      input.addData(b1: _*)
      q.processAllAvailable()
      input.addData(b2: _*)
      q.processAllAvailable()

      val streamed = spark.table("cms_stream_t")
      val batch = PipelineOps.countMinSketch(
        (b1 ++ b2).toDF("k"), "k", depth = 4, width = 32)
      streamed.exceptAll(batch).count() shouldBe 0
      batch.exceptAll(streamed).count() shouldBe 0
    } finally q.stop()
  }
}
