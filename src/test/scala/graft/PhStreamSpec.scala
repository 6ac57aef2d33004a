package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode
import org.apache.spark.sql.functions._

/** Streaming Page–Hinkley drift detector: cross-batch equality with
  * the batch window computation. */
class PhStreamSpec extends SparkSpecBase {
  import spark.implicits._
  import graft.streaming.StreamOps

  // level shift at t=60: mean 10 -> 18 (integer values, exact sums)
  private val series: Seq[(String, Long, Double)] =
    (1 to 100).map { t =>
      val v = if (t <= 60) (10 + (t % 3)).toDouble
              else (18 + (t % 3)).toDouble
      ("k1", t.toLong, v)
    }

  test("streamed PH walk across micro-batches equals the batch " +
      "pageHinkley summary on the concatenated input") {
    implicit val sqlCtx = spark.sqlContext
    val (b1, b2, b3) = (series.take(40), series.slice(40, 75),
      series.drop(75))
    val input = MemoryStream[(String, Long, Double)]
    val out = StreamOps.phStream(input.toDS(), delta = 0.5,
      lambda = 30.0)
    val q = out.writeStream.format("memory").queryName("ph_fmgws")
      .outputMode(OutputMode.Append()).start()
    try {
      input.addData(b1: _*); q.processAllAvailable()
      input.addData(b2: _*); q.processAllAvailable()
      input.addData(b3: _*); q.processAllAvailable()
    } finally q.stop()
    val rows = spark.table("ph_fmgws")
      .as[StreamOps.PhStreamOut].collect().sortBy(_.ord)
    rows.length shouldBe 100

    val batch = graft.timeseries.TimeSeriesOps.pageHinkley(
      series.toDF("k", "t", "v"), "v", "t", delta = 0.5,
      lambda = 30.0, keyCols = Seq("k")).head()
    // streamed running max equals the batch max (batch rounds at 6)
    val streamedMax = rows.map(_.maxPh).max
    approx(math.rint(streamedMax * 1e6) / 1e6,
      batch.getAs[Double]("max_ph"), 0.0)
    // first drift order matches
    val streamedDriftAt = rows.find(_.drift).map(_.ord)
    streamedDriftAt shouldBe Option(batch.getAs[Long]("drift_at"))
    batch.getAs[Boolean]("drift") shouldBe true
    // drift fires after the level shift, not before
    streamedDriftAt.get should be > 60L
    // driftAt latches: every row after the first drift carries it
    val at = streamedDriftAt.get
    rows.filter(_.ord >= at).foreach(r =>
      r.driftAt shouldBe Some(at))
    rows.filter(_.ord < at).foreach(r => r.driftAt shouldBe None)
  }

  test("no drift on a stationary stream and PH stays small") {
    implicit val sqlCtx = spark.sqlContext
    val flat = (1 to 80).map(t => ("k2", t.toLong,
      (10 + (t % 3)).toDouble))
    val input = MemoryStream[(String, Long, Double)]
    val out = StreamOps.phStream(input.toDS(), delta = 0.5,
      lambda = 30.0)
    val q = out.writeStream.format("memory").queryName("ph_flat")
      .outputMode(OutputMode.Append()).start()
    try {
      input.addData(flat.take(40): _*); q.processAllAvailable()
      input.addData(flat.drop(40): _*); q.processAllAvailable()
    } finally q.stop()
    val rows = spark.table("ph_flat")
      .as[StreamOps.PhStreamOut].collect()
    rows.exists(_.drift) shouldBe false
    all(rows.map(_.ph)) should be < 30.0
  }
}
