package graft

import org.apache.spark.sql.functions._
import graft.analytics.AlertOps
import graft.versioning.VersionOps

/** Versioning / alerting layer (reference src/versioning,
  * src/analytics/alerts.rs): snapshot diff statuses, fingerprint
  * order/partitioning invariance, change-log time travel, CDC merge
  * semantics, schema diff, and alert labeling. */
class VersioningSpec extends SparkSpecBase {
  import spark.implicits._

  test("versionDiff labels added/removed/changed/unchanged") {
    val old = Seq((1L, Some(10L)), (2L, Some(20L)), (3L, Some(30L)),
      (4L, None)).toDF("k", "v")
    val nw = Seq((2L, 20L), (3L, 99L), (4L, 40L), (5L, 50L))
      .toDF("k", "v")
    val d = VersionOps.versionDiff(old, nw, Seq("k"), Seq("v"))
    val m = d.select("k", "status").as[(Long, String)].collect().toMap
    m shouldBe Map(1L -> "removed", 2L -> "unchanged", 3L -> "changed",
      4L -> "changed", 5L -> "added")
    // old/new payloads ride along
    d.filter(col("k") === 3L).select("old_v", "new_v")
      .as[(Long, Long)].head() shouldBe ((30L, 99L))
    VersionOps.diffSummary(d).filter(col("status") === "changed")
      .select("n").as[Long].head() shouldBe 2L
  }

  test("tableFingerprint is invariant to row order and partitioning") {
    val df = (1L to 500L).map(i => (i, s"name_$i", i % 7)).toDF("k", "s", "g")
    val a = VersionOps.tableFingerprint(df, Seq("k", "s", "g"))
      .as[(Long, Long)].head()
    val b = VersionOps.tableFingerprint(
      df.orderBy(col("s").desc).repartition(13), Seq("k", "s", "g"))
      .as[(Long, Long)].head()
    a shouldBe b
    a._1 shouldBe 500L
    // any content change moves it
    val c = VersionOps.tableFingerprint(
      df.withColumn("g", when(col("k") === 250L, lit(8L)).otherwise(col("g"))),
      Seq("k", "s", "g")).as[(Long, Long)].head()
    c._2 should not be a._2
    // NULL is distinct from empty string under the canonical rowKey
    val withNull = Seq((1L, null.asInstanceOf[String])).toDF("k", "s")
    val withEmpty = Seq((1L, "")).toDF("k", "s")
    VersionOps.tableFingerprint(withNull, Seq("k", "s"))
      .as[(Long, Long)].head()._2 should not be
      VersionOps.tableFingerprint(withEmpty, Seq("k", "s"))
        .as[(Long, Long)].head()._2
  }

  test("asOfSnapshot replays the change log at each version") {
    val log = Seq(
      (1L, 1, "u", 100L), (1L, 2, "u", 150L), (1L, 3, "d", 0L),
      (2L, 1, "u", 200L), (2L, 3, "u", 250L),
      (3L, 2, "u", 300L)).toDF("k", "version", "op", "v")
    def snap(v: Int) = VersionOps.asOfSnapshot(log, Seq("k"),
      "version", "op", lit(v)).select("k", "v").as[(Long, Long)]
      .collect().toMap
    snap(1) shouldBe Map(1L -> 100L, 2L -> 200L)
    snap(2) shouldBe Map(1L -> 150L, 2L -> 200L, 3L -> 300L)
    snap(3) shouldBe Map(2L -> 250L, 3L -> 300L) // key 1 deleted at v3
  }

  test("applyChanges merges upserts, deletes, inserts") {
    val base = Seq((1L, 10L), (2L, 20L), (3L, 30L)).toDF("k", "v")
    val changes = Seq((2L, 21L, "u"), (3L, 0L, "d"), (4L, 40L, "i"))
      .toDF("k", "v", "op")
    val merged = VersionOps.applyChanges(base, changes, Seq("k"), "op")
      .as[(Long, Long)].collect().toMap
    merged shouldBe Map(1L -> 10L, 2L -> 21L, 4L -> 40L)
  }

  test("schemaDiff reports added/removed/retyped columns") {
    val old = Seq((1L, "a", 1.0)).toDF("k", "s", "x")
    val nw = Seq((1L, 1L, true)).toDF("k", "s", "b")
    VersionOps.schemaDiff(old, nw).toSet shouldBe Set(
      ("b", "added", "", "boolean"),
      ("x", "removed", "double", ""),
      ("s", "retyped", "string", "bigint"))
  }

  test("thresholdAlerts labels severities from broadcast rules") {
    val events = Seq(
      ("a", "2024-01-01", 100L), ("a", "2024-01-01", 200L), // avg 150
      ("a", "2024-01-02", 900L),                            // avg 900
      ("b", "2024-01-01", 450L)                             // avg 450
    ).toDF("key", "day", "v")
    val rules = Seq(("a", 140.0, 800.0), ("b", 500.0, 900.0))
      .toDF("key", "warn", "crit")
    val out = AlertOps.thresholdAlerts(events, Seq("key"),
      to_date(col("day")), col("v"), rules)
      .select("key", "bucket", "severity")
      .as[(String, java.sql.Date, String)].collect()
      .map(r => (r._1, r._2.toString, r._3)).toSet
    out shouldBe Set(("a", "2024-01-01", "warning"),
      ("a", "2024-01-02", "critical"))
  }

  test("driftAlerts flags a spike against its trailing baseline") {
    // key "a": stable baseline 100±1 then a spike; key "b" flat (var 0
    // -> never alerts)
    val rows = (1 to 9).map(i => ("a", f"2024-01-$i%02d",
        100L + (i % 2))) :+ ("a", "2024-01-10", 500L)
    val flat = (1 to 10).map(i => ("b", f"2024-01-$i%02d", 100L))
    val daily = (rows ++ flat).toDF("key", "day", "vc")
      .withColumn("day", to_date(col("day")))
    val out = AlertOps.driftAlerts(daily, Seq("key"), "day", "vc",
      lookback = 7, zThresh = 2.0, minBaseline = 4)
    val hits = out.select("key", "day").as[(String, java.sql.Date)]
      .collect().map(r => (r._1, r._2.toString))
    hits should contain(("a", "2024-01-10"))
    hits.map(_._1) should not contain "b"
  }

  test("streaming thresholdAlerts emits one alert per closed window") {
    import java.sql.Timestamp
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import org.apache.spark.sql.streaming.OutputMode
    implicit val sqlCtx = spark.sqlContext
    def ts(m: Int): Timestamp =
      Timestamp.valueOf(f"2024-01-01 00:$m%02d:00")
    val rules = Seq(("a", 10.0, 100.0)).toDF("key", "warn", "crit")
    val input = MemoryStream[(Timestamp, String, Long)]
    val out = graft.streaming.StreamOps.thresholdAlerts(
      input.toDF().toDF("ts", "key", "v"), "ts", Seq("key"), "v",
      rules, "10 minutes", "5 minutes")
    val q = out.writeStream.format("memory").queryName("alerts_t")
      .outputMode(OutputMode.Append()).start()
    try {
      // window [00,10): avg 50 -> warning; [10,20): avg 150 -> critical;
      // [20,30): avg 5 -> silent
      input.addData((ts(1), "a", 40L), (ts(2), "a", 60L),
        (ts(11), "a", 150L), (ts(21), "a", 5L))
      q.processAllAvailable()
      input.addData((ts(45), "a", 1L)) // advance watermark, close all
      q.processAllAvailable()
      val got = spark.table("alerts_t")
        .select(col("window.start").cast("string"), col("metric"),
          col("severity"))
        .as[(String, Double, String)].collect().toSet
      got shouldBe Set(
        ("2024-01-01 00:00:00", 50.0, "warning"),
        ("2024-01-01 00:10:00", 150.0, "critical"))
    } finally q.stop()
  }
}
