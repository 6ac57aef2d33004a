package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode

import graft.ml.MlMetrics
import graft.streaming.StreamOps

/** Cross-batch contract for the streaming fairness monitor: after
  * any number of micro-batches, each group's CUMULATIVE confusion
  * cells and ppm rates equal the batch
  * [[graft.ml.MlMetrics.fairnessReport]] on the concatenated input
  * (exact integer state — no float drift across batches). */
class StreamingFairnessSpec extends SparkSpecBase {
  import spark.implicits._

  test("streamed cumulative fairness cells == batch report") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(String, Boolean, Boolean)]
    val out = StreamOps.fairnessStream(input.toDS())
    val q = out.writeStream.format("memory")
      .queryName("fair_stream_t")
      .outputMode(OutputMode.Append()).start()
    val b1 = Seq(("A", true, true), ("A", false, true),
      ("B", true, false), ("B", false, false))
    val b2 = Seq(("A", true, false), ("A", false, false),
      ("B", true, true), ("B", false, true), ("B", true, true))
    val b3 = Seq(("A", true, true), ("B", false, false))
    try {
      input.addData(b1: _*); q.processAllAvailable()
      input.addData(b2: _*); q.processAllAvailable()
      input.addData(b3: _*); q.processAllAvailable()

      // last emission per group = cumulative state
      val streamed = spark.table("fair_stream_t")
        .orderBy("n").collect()
        .groupBy(_.getString(0)).map { case (g, rows) =>
          val r = rows.maxBy(_.getAs[Long]("n"))
          g -> (r.getAs[Long]("n"), r.getAs[Long]("tp"),
            r.getAs[Long]("fp"), r.getAs[Long]("fn"),
            r.getAs[Long]("tn"), r.getAs[Long]("posRatePpm"),
            Option(r.getAs[java.lang.Long]("tprPpm")).map(_.toLong))
        }

      val batch = MlMetrics.fairnessReport(
        (b1 ++ b2 ++ b3).toDF("grp", "y", "pred"),
        "grp", "y", "pred")
        .collect().map { r =>
          r.getString(0) -> (r.getAs[Long]("n"), r.getAs[Long]("tp"),
            r.getAs[Long]("fp"), r.getAs[Long]("fn"),
            r.getAs[Long]("tn"), r.getAs[Long]("pos_rate_ppm"),
            r.getAs[Long]("tpr_ppm"))
        }.toMap

      streamed.keySet shouldBe batch.keySet
      streamed.foreach { case (g, (n, tp, fp, fn, tn, ppr, tpr)) =>
        val (bn, btp, bfp, bfn, btn, bppr, btpr) = batch(g)
        (n, tp, fp, fn, tn, ppr) shouldBe
          ((bn, btp, bfp, bfn, btn, bppr))
        tpr shouldBe Some(btpr)
      }

      // every batch emitted one row per group seen in that batch
      spark.table("fair_stream_t")
        .groupBy("grp").count().collect()
        .map(r => r.getString(0) -> r.getLong(1)).toMap shouldBe
        Map("A" -> 3L, "B" -> 3L)
    } finally q.stop()
  }

  test("streamed cumulative uplift cells == batch upliftCurve") {
    import org.apache.spark.sql.functions._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Int, Boolean, Boolean)]
    val out = StreamOps.upliftStream(input.toDS())
    val q = out.writeStream.format("memory")
      .queryName("uplift_stream_t")
      .outputMode(OutputMode.Append()).start()
    // bucket k corresponds to score (9 - k + 0.5) / 10 in the batch
    // op's bucket = 9 - floor(p * 10) convention
    val b1 = Seq((0, true, true), (0, false, false),
      (3, true, false), (3, false, true))
    val b2 = Seq((0, true, true), (0, true, false),
      (0, false, true), (3, true, true))
    try {
      input.addData(b1: _*); q.processAllAvailable()
      input.addData(b2: _*); q.processAllAvailable()

      val streamed = spark.table("uplift_stream_t").collect()
        .groupBy(_.getInt(0)).map { case (b, rows) =>
          val r = rows.maxBy(r => r.getAs[Long]("nt") +
            r.getAs[Long]("nc"))
          b -> (r.getAs[Long]("nt"), r.getAs[Long]("nc"),
            r.getAs[Long]("rt"), r.getAs[Long]("rc"))
        }

      val batchRows = (b1 ++ b2).map { case (b, t, y) =>
        (t, y, (9 - b) / 10.0 + 0.05) }
      val batch = graft.ml.MlMetrics.upliftCurve(
          batchRows.toDF("t", "y", "p"), "t", "y", "p")
        .collect().map { r =>
          r.getInt(0) -> (r.getAs[Long]("nt"), r.getAs[Long]("nc"),
            r.getAs[Long]("rt"), r.getAs[Long]("rc"))
        }.toMap

      streamed.keySet shouldBe batch.keySet
      streamed.foreach { case (b, cells) =>
        cells shouldBe batch(b)
      }
    } finally q.stop()
  }
}
