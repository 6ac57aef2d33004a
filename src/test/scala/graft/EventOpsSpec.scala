package graft

import java.sql.Timestamp
import org.apache.spark.sql.functions._
import graft.analytics.EventOps

/** Specs for the event-analytics operators: funnel ordering
  * semantics, cohort offsets, Markov row-stochasticity, RFM
  * segmentation thresholds. */
class EventOpsSpec extends SparkSpecBase {
  import spark.implicits._

  private def ts(m: Int) = new Timestamp(m * 60000L)

  test("funnel requires strictly ordered steps per user") {
    // u1 completes view->click->purchase in order; u2 clicks BEFORE
    // viewing (so never reaches click); u3 only views
    val ev = Seq(
      (1L, ts(1), "view"), (1L, ts(2), "click"), (1L, ts(3), "purchase"),
      (2L, ts(1), "click"), (2L, ts(2), "view"),
      (3L, ts(5), "view")
    ).toDF("user_id", "ts", "event_type")
    val out = EventOps.funnel(ev, "user_id", "ts", "event_type",
      Seq("view", "click", "purchase"))
      .orderBy("step").collect()
    out.map(_.getLong(2)).toSeq shouldBe Seq(3L, 1L, 1L)
    out.map(_.getLong(3)).toSeq shouldBe Seq(1000000L, 333333L, 333333L)
  }

  test("funnel re-entry: a later qualifying event still counts") {
    // click at t2 is before view? no: view t1, click t0 ignored,
    // click t3 counts
    val ev = Seq(
      (1L, ts(0), "click"), (1L, ts(1), "view"), (1L, ts(3), "click")
    ).toDF("user_id", "ts", "event_type")
    val out = EventOps.funnel(ev, "user_id", "ts", "event_type",
      Seq("view", "click")).orderBy("step").collect()
    out.map(_.getLong(2)).toSeq shouldBe Seq(1L, 1L)
  }

  test("retentionCohorts offsets are whole periods from first activity") {
    val jan = Timestamp.valueOf("2024-01-05 00:00:00")
    val feb = Timestamp.valueOf("2024-02-20 00:00:00")
    val mar = Timestamp.valueOf("2024-03-01 00:00:00")
    val ev = Seq((1L, jan), (1L, feb), (1L, feb), (2L, feb), (2L, mar))
      .toDF("user_id", "ts")
    val out = EventOps.retentionCohorts(ev, "user_id", "ts", "month")
      .orderBy("cohort", "offset")
      .select(date_format(col("cohort"), "yyyy-MM").as("c"),
        col("offset"), col("n_users"))
      .as[(String, Long, Long)].collect().toSeq
    out shouldBe Seq(("2024-01", 0L, 1L), ("2024-01", 1L, 1L),
      ("2024-02", 0L, 1L), ("2024-02", 1L, 1L))
  }

  test("markovTransitions rows are per-from-type probabilities summing to 1") {
    val ev = Seq(
      (1L, ts(1), 1L, "a"), (1L, ts(2), 2L, "b"), (1L, ts(3), 3L, "a"),
      (1L, ts(4), 4L, "c"), (2L, ts(1), 5L, "a"), (2L, ts(2), 6L, "b")
    ).toDF("user_id", "ts", "event_id", "event_type")
    val out = EventOps.markovTransitions(ev, "user_id", "ts",
      "event_type", "event_id")
    val sums = out.groupBy("from_type").agg(sum("p").as("s"))
      .as[(String, Double)].collect().toMap
    sums("a") shouldBe 1.0 +- 1e-6
    sums("b") shouldBe 1.0 +- 1e-6
    // a -> b twice of 3 a-transitions
    out.filter(col("from_type") === "a" && col("to_type") === "b")
      .select("n").as[Long].head() shouldBe 2L
  }

  test("changeIntervals collapses runs and chains validity ranges") {
    val ev = Seq(
      (1L, ts(1), 1L, "gold"), (1L, ts(2), 2L, "gold"),
      (1L, ts(3), 3L, "silver"), (1L, ts(4), 4L, "gold"),
      (2L, ts(1), 5L, "bronze")
    ).toDF("k", "t", "id", "tier")
    val out = EventOps.changeIntervals(ev, Seq("k"), "tier", "t", "id")
      .orderBy("k", "valid_from")
      .select("k", "tier", "valid_from", "valid_to").collect()
    out.length shouldBe 4
    out(0).getString(1) shouldBe "gold"
    out(0).getTimestamp(3) shouldBe ts(3) // closed by the silver run
    out(1).getString(1) shouldBe "silver"
    out(1).getTimestamp(3) shouldBe ts(4)
    out(2).getString(1) shouldBe "gold"
    out(2).isNullAt(3) shouldBe true // current run open-ended
    out(3).getString(1) shouldBe "bronze"
    out(3).isNullAt(3) shouldBe true
  }

  test("pinballLoss known values at q=0.5 equal half the MAE") {
    val df = Seq((10L, 12L), (20L, 15L), (30L, 30L)).toDF("y", "yhat")
    val out = graft.ml.MlMetrics.pinballLoss(df, "y", "yhat",
      Seq(0.25, 0.5, 0.75))
      .select("q", "pinball").as[(Double, Double)].collect().toMap
    // diffs: -2, +5, 0 -> MAE/2 = 7/3/2 ≈ 1.166667
    out(0.5) shouldBe (7.0 / 3 / 2 +- 1e-6)
    // q=0.25: 0.25*max over (d,0)... loss = max(.25*d, -.75*d):
    // (1.5, 1.25, 0)/3
    out(0.25) shouldBe ((1.5 + 1.25 + 0.0) / 3 +- 1e-6)
    out(0.75) shouldBe ((0.5 + 3.75 + 0.0) / 3 +- 1e-6)
  }

  test("sequenceNgrams counts contiguous per-user trigrams") {
    val t0 = Timestamp.valueOf("2024-06-01 00:00:00")
    // user 1: a b c a b c -> abc x2, bca, cab; user 2: a b c -> abc
    val rows = Seq("a", "b", "c", "a", "b", "c").zipWithIndex
      .map { case (t, i) => (1L, t0, i, t) } ++
      Seq("a", "b", "c").zipWithIndex.map { case (t, i) => (2L, t0, i, t) }
    val out = EventOps.sequenceNgrams(rows.toDF("u", "ts", "id", "et"),
        "u", "ts", "et", "id", n = 3, minCount = 1L)
      .as[(String, Long)].collect().toMap
    out shouldBe Map("a>b>c" -> 3L, "b>c>a" -> 1L, "c>a>b" -> 1L)
    // minCount prunes the singletons
    EventOps.sequenceNgrams(rows.toDF("u", "ts", "id", "et"),
        "u", "ts", "et", "id", n = 3, minCount = 2L)
      .as[(String, Long)].collect().toMap shouldBe Map("a>b>c" -> 3L)
  }

  test("rfm segments by the fixed thresholds") {
    val d0 = Timestamp.valueOf("2024-06-01 00:00:00")
    val dOld = Timestamp.valueOf("2022-01-01 00:00:00")
    val rows = Seq.tabulate(12)(i => (1L, d0, 50000.0)) ++ // champion
      Seq((2L, d0, 10.0)) ++                               // recent
      Seq.tabulate(11)(i => (3L, dOld, 1.0)) ++            // loyal_lapsed
      Seq((4L, dOld, 5.0))                                 // hibernating
    val out = EventOps.rfm(rows.toDF("cust", "ts", "amt"), "cust", "ts",
      "amt", recencyCut = 365, freqCut = 10,
      monetaryCutCents = 100000L * 100)
      .select("cust", "segment").as[(Long, String)].collect().toMap
    out shouldBe Map(1L -> "champion", 2L -> "recent",
      3L -> "loyal_lapsed", 4L -> "hibernating")
  }
}
