package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode

/** Streaming-throughput probe: drives the stateful monitors
  * (flatMapGroupsWithState sketches/folds) with a micro-batch loop
  * of deterministic synthetic rows and reports sustained rows/sec —
  * the evidence line for "would the monitor keep up with a 100 TB
  * pipeline's event feed". MemoryStream input (so the number is the
  * ENGINE's cost, not a source's), noop sink, per-monitor timing
  * over the whole feed loop including every micro-batch barrier.
  * A passthrough (no stateful op) run calibrates harness overhead.
  *
  * Usage: runMain graft.StreamBench [batches] [rowsPerBatch]
  * Prints one JSON line: {"stream_bench":{name: rows_per_sec,...},
  * "batches":B,"rows_per_batch":R,"keys":K}.
  */
object StreamBench {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.local(
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt)
    import spark.implicits._
    implicit val sq = spark.sqlContext
    spark.sparkContext.setLogLevel("ERROR")
    val batches = args.headOption.map(_.toInt).getOrElse(10)
    val rowsPerBatch =
      args.drop(1).headOption.map(_.toInt).getOrElse(200000)
    val keys = 64
    def key(i: Long): String = "k" + (i % keys)
    val results =
      scala.collection.mutable.LinkedHashMap[String, Long]()

    def run(name: String)(body: => Long): Unit = {
      val t0 = System.nanoTime()
      val fed = body
      val dt = (System.nanoTime() - t0) / 1e9
      results(name) = math.rint(fed / dt).toLong
    }

    // harness floor: same feed loop, no stateful operator
    run("passthrough") {
      val in = MemoryStream[(String, String)]
      val q = in.toDS().writeStream.format("noop")
        .outputMode(OutputMode.Append()).start()
      var fed = 0L
      (0 until batches).foreach { b =>
        in.addData((0 until rowsPerBatch).map { i =>
          val g = b.toLong * rowsPerBatch + i
          (key(g), "v" + (g % 100000))
        }: _*)
        fed += rowsPerBatch
        q.processAllAvailable()
      }
      q.stop(); fed
    }

    run("hll_distinct_monitor") {
      val in = MemoryStream[(String, String)]
      val q = graft.streaming.StreamOps.hllStream(in.toDS(), p = 6)
        .writeStream.format("noop")
        .outputMode(OutputMode.Append()).start()
      var fed = 0L
      (0 until batches).foreach { b =>
        in.addData((0 until rowsPerBatch).map { i =>
          val g = b.toLong * rowsPerBatch + i
          (key(g), "v" + (g % 100000))
        }: _*)
        fed += rowsPerBatch
        q.processAllAvailable()
      }
      q.stop(); fed
    }

    run("cms_count_monitor") {
      val in = MemoryStream[(String, Long, String)]
      val q = graft.streaming.StreamOps.cmsStream(in.toDS())
        .writeStream.format("noop")
        .outputMode(OutputMode.Append()).start()
      var fed = 0L
      (0 until batches).foreach { b =>
        in.addData((0 until rowsPerBatch).map { i =>
          val g = b.toLong * rowsPerBatch + i
          (key(g), g, "item" + (g % 10000))
        }: _*)
        fed += rowsPerBatch
        q.processAllAvailable()
      }
      q.stop(); fed
    }

    run("ewm_mean_monitor") {
      val in = MemoryStream[(String, Long, Option[Double])]
      val q = graft.streaming.StreamOps
        .ewmStream(in.toDS(), alpha = 0.2)
        .writeStream.format("noop")
        .outputMode(OutputMode.Append()).start()
      var fed = 0L
      (0 until batches).foreach { b =>
        in.addData((0 until rowsPerBatch).map { i =>
          val g = b.toLong * rowsPerBatch + i
          (key(g), g, Some((g % 997).toDouble))
        }: _*)
        fed += rowsPerBatch
        q.processAllAvailable()
      }
      q.stop(); fed
    }

    val inner = results
      .map { case (k, v) => "\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    println(s"""{"stream_bench":$inner,"batches":$batches,"rows_per_batch":$rowsPerBatch,"keys":$keys}""")
    spark.stop()
  }
}
