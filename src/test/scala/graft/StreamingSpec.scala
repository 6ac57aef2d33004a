package graft

import java.sql.Timestamp
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode
import graft.streaming.StreamOps

/** Structured Streaming windows + watermark semantics (reference
  * src/streaming/window.rs; FIXTURES §B.9): events fed through
  * MemoryStream in ts order with late arrivals. */
class StreamingSpec extends SparkSpecBase {
  import spark.implicits._

  private def ts(m: Int, s: Int = 0): Timestamp =
    Timestamp.valueOf(f"2024-01-01 00:$m%02d:$s%02d")

  test("tumbling window aggregates with watermark drop of late data") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Timestamp, String, Double)]
    val agg = StreamOps.tumbling(
      input.toDF().toDF("ts", "k", "v"), "ts", "10 minutes",
      "5 minutes", Seq("k"), Seq(sum($"v").as("s"), count(lit(1)).as("n")))
    val q = agg.writeStream.format("memory").queryName("tumbling_t")
      .outputMode(OutputMode.Append()).start()
    try {
      input.addData((ts(1), "a", 1.0), (ts(4), "a", 2.0), (ts(11), "a", 4.0))
      q.processAllAvailable()
      // advance watermark past 00:10 + 5min so the first window closes
      input.addData((ts(21), "a", 8.0))
      q.processAllAvailable()
      // late event for the closed [00:00,00:10) window must be dropped
      input.addData((ts(2), "a", 100.0))
      q.processAllAvailable()
      input.addData((ts(40), "a", 16.0)) // close remaining windows
      q.processAllAvailable()
      val out = spark.table("tumbling_t")
        .select(col("window.start").as("w"), $"s", $"n")
        .as[(Timestamp, Double, Long)].collect()
        .map { case (w, sv, n) => (w.toString, sv, n) }.toSet
      out should contain(("2024-01-01 00:00:00.0", 3.0, 2L))
      out should contain(("2024-01-01 00:10:00.0", 4.0, 1L))
      out should contain(("2024-01-01 00:20:00.0", 8.0, 1L))
      // the late 100.0 never appears
      out.map(_._2) should not contain 103.0
    } finally q.stop()
  }

  test("session window groups events within the gap") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Timestamp, String, Double)]
    val agg = StreamOps.session(
      input.toDF().toDF("ts", "k", "v"), "ts", "5 minutes",
      "1 minute", Seq("k"), Seq(count(lit(1)).as("n")))
    val q = agg.writeStream.format("memory").queryName("session_t")
      .outputMode(OutputMode.Append()).start()
    try {
      input.addData((ts(1), "a", 1.0), (ts(3), "a", 1.0),
        (ts(20), "a", 1.0))
      q.processAllAvailable()
      input.addData((ts(40), "a", 1.0)) // push watermark, close sessions
      q.processAllAvailable()
      val ns = spark.table("session_t").select("n").as[Long]
        .collect().sorted
      ns.toSeq should contain(2L) // the two close events fused
    } finally q.stop()
  }

  test("sliding windows emit overlapping aggregates") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Timestamp, String, Double)]
    val agg = StreamOps.sliding(
      input.toDF().toDF("ts", "k", "v"), "ts", "10 minutes",
      "5 minutes", "1 minute", Seq("k"),
      Seq(sum($"v").as("s")))
    val q = agg.writeStream.format("memory").queryName("sliding_t")
      .outputMode(OutputMode.Append()).start()
    try {
      input.addData((ts(7), "a", 1.0))
      q.processAllAvailable()
      input.addData((ts(40), "a", 2.0)) // advance watermark, close
      q.processAllAvailable()
      val starts = spark.table("sliding_t")
        .select(col("window.start").cast("string")).as[String]
        .collect().toSet
      // an event at 00:07 belongs to windows starting 00:00 and 00:05
      starts should contain("2024-01-01 00:00:00")
      starts should contain("2024-01-01 00:05:00")
    } finally q.stop()
  }

  test("sessionWithCap closes sessions on gap AND on max duration") {
    implicit val sqlCtx = spark.sqlContext
    import org.apache.spark.sql.Encoders
    implicit val outEnc = Encoders.product[StreamOps.SessionCapOut]
    implicit val stEnc = Encoders.product[StreamOps.SessionCapState]
    val input = MemoryStream[(String, Timestamp, Double)]
    def m(mins: Int): Long = mins * 60000L
    val out = StreamOps.sessionWithCap(
      input.toDF().toDF("k", "ts", "v"), "k", "ts", "v",
      watermark = "1 minute", gapMs = m(5), maxDurationMs = m(15))
    val q = out.writeStream.format("memory").queryName("cap_t")
      .outputMode(OutputMode.Append()).start()
    try {
      // one key: events every 4 min — within gap but total > 15 min
      input.addData((1 to 6).map(i =>
        ("a", new Timestamp(m(4 * i)), 1.0)): _*)
      q.processAllAvailable()
      // second batch far later → gap close of the trailing session
      input.addData(("a", new Timestamp(m(120)), 9.0))
      q.processAllAvailable()
      val res = spark.table("cap_t")
        .select("key", "n", "closedBy")
        .as[(String, Long, String)].collect()
      // capped session emitted with reason max_duration
      res.map(_._3) should contain("max_duration")
      res.map(_._3) should contain("gap")
      res.map(_._2).sum should be <= 6L // all first-batch events
    } finally q.stop()
  }

  test("count-based windows emit every n records per key") {
    implicit val sqlCtx = spark.sqlContext
    import org.apache.spark.sql.Encoders
    implicit val outEnc = Encoders.product[StreamOps.CountWindowOut]
    implicit val stEnc = Encoders.product[StreamOps.CountWindowState]
    val input = MemoryStream[(String, Double)]
    val out = StreamOps.countWindow(input.toDS(), 2)
    val q = out.writeStream.format("memory").queryName("count_t")
      .outputMode(OutputMode.Append()).start()
    try {
      input.addData(("a", 1.0), ("a", 2.0), ("a", 3.0), ("b", 5.0),
        ("b", 7.0))
      q.processAllAvailable()
      val rows = spark.table("count_t")
        .select("key", "sum").as[(String, Double)].collect().toSet
      rows should contain(("a", 3.0))
      rows should contain(("b", 12.0))
      // the dangling third "a" record stays buffered (no emission)
      spark.table("count_t").count() shouldBe 2
      // next micro-batch: buffered 3.0 pairs with 9.0, windowSeq
      // continues from persisted state (2, not restarting at 1)
      input.addData(("a", 9.0))
      q.processAllAvailable()
      spark.table("count_t")
        .filter($"key" === "a" && $"windowSeq" === 2)
        .select("sum").as[Double].collect() shouldBe Array(12.0)
    } finally q.stop()
  }

  test("stream-static dimension join enriches each micro-batch") {
    implicit val sqlCtx = spark.sqlContext
    val dim = Seq(("a", "alpha"), ("b", "beta")).toDF("k", "name")
    val input = MemoryStream[(Timestamp, String, Double)]
    // static side broadcast: the standard enrichment shape — no
    // stream state, dimension re-read per micro-batch
    val joined = input.toDF().toDF("ts", "k", "v")
      .join(broadcast(dim), Seq("k"), "left")
    val q = joined.writeStream.format("memory").queryName("ss_join_t")
      .outputMode(OutputMode.Append()).start()
    try {
      input.addData((ts(1), "a", 1.0), (ts(2), "b", 2.0),
        (ts(3), "zz", 3.0))
      q.processAllAvailable()
      val out = spark.table("ss_join_t")
        .select("k", "name", "v")
        .as[(String, Option[String], Double)].collect().toSet
      out shouldBe Set(("a", Some("alpha"), 1.0),
        ("b", Some("beta"), 2.0), ("zz", None, 3.0))
    } finally q.stop()
  }

  test("stream-stream interval join matches clicks within the band") {
    implicit val sqlCtx = spark.sqlContext
    val imps = MemoryStream[(Timestamp, Long)]
    val clicks = MemoryStream[(Timestamp, Long)]
    val joined = StreamOps.intervalJoin(
      imps.toDF().toDF("imp_ts", "imp_id"),
      clicks.toDF().toDF("clk_ts", "clk_id"),
      "imp_id", "clk_id", "imp_ts", "clk_ts",
      "10 minutes", "10 minutes", within = "5 MINUTES")
    val q = joined.writeStream.format("memory").queryName("ssj_t")
      .outputMode(OutputMode.Append()).start()
    try {
      imps.addData((ts(1), 1L), (ts(2), 2L), (ts(3), 3L))
      clicks.addData((ts(4), 1L), (ts(9), 2L), (ts(2), 3L))
      q.processAllAvailable()
      // id 1: click 3min after imp -> match; id 2: 7min -> out of band;
      // id 3: click BEFORE imp -> out of band
      val out = spark.table("ssj_t").select("imp_id").as[Long]
        .collect().toSet
      out shouldBe Set(1L)
    } finally q.stop()
  }

  test("dedupeStream drops exact duplicates, state bounded by watermark") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Timestamp, String)]
    val deduped = StreamOps.dedupeStream(
      input.toDF().toDF("ts", "fp"), "ts", "5 minutes", Seq("fp"))
    val q = deduped.writeStream.format("memory").queryName("dedup_t")
      .outputMode(OutputMode.Append()).start()
    try {
      input.addData((ts(1), "docA"), (ts(1), "docA"), (ts(2), "docB"))
      q.processAllAvailable()
      input.addData((ts(1), "docA")) // same (fp, ts) again
      q.processAllAvailable()
      spark.table("dedup_t").count() shouldBe 2
    } finally q.stop()
  }

  test("dedupeStreamWithinWatermark collapses re-stamped duplicates") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Timestamp, String)]
    val deduped = StreamOps.dedupeStreamWithinWatermark(
      input.toDF().toDF("ts", "fp"), "ts", "10 minutes", Seq("fp"))
    val q = deduped.writeStream.format("memory").queryName("dedupw_t")
      .outputMode(OutputMode.Append()).start()
    try {
      // same fingerprint, three DIFFERENT event times within the delay
      input.addData((ts(1), "docA"), (ts(3), "docA"), (ts(5), "docA"),
        (ts(2), "docB"))
      q.processAllAvailable()
      spark.table("dedupw_t").count() shouldBe 2
    } finally q.stop()
  }

  test("streaming paragraph dedup keeps first arrival per paragraph") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Long, Timestamp, String)]
    val out = StreamOps.streamingParagraphDedup(
      input.toDF().toDF("id", "ts", "text"), "text", "id", "ts",
      "10 minutes")
    val q = out.writeStream.format("memory").queryName("paradedup_t")
      .outputMode(OutputMode.Append()).start()
    try {
      input.addData((1L, ts(1), "alpha\nbeta\n\n"))
      q.processAllAvailable()
      // beta is a duplicate across documents/batches; gamma is new;
      // blank paragraphs never surface
      input.addData((2L, ts(2), "beta\ngamma"))
      q.processAllAvailable()
      val kept = spark.table("paradedup_t")
        .select("doc_id", "pos", "paragraph")
        .as[(Long, Int, String)].collect().toSet
      kept shouldBe Set((1L, 0, "alpha"), (1L, 1, "beta"),
        (2L, 1, "gamma"))
    } finally q.stop()
  }

  test("streamingCdcFold maintains the MERGE target across batches") {
    implicit val sqlCtx = spark.sqlContext
    // (op, id, val, seq)
    val input = MemoryStream[(String, Long, String, Long)]
    val base = Seq((1L, "one"), (2L, "two")).toDF("id", "v")
    val store = new java.util.concurrent.atomic.AtomicReference(base)
    val q = StreamOps.streamingCdcFold(
      input.toDF().toDF("op", "id", "v", "seq"),
      Seq("id"), "op", "seq", store)
    try {
      // batch 1: update id=1, insert id=3
      input.addData(("u", 1L, "ONE", 1L), ("u", 3L, "three", 2L))
      q.processAllAvailable()
      store.get().orderBy("id").as[(Long, String)].collect().toSeq shouldBe
        Seq((1L, "ONE"), (2L, "two"), (3L, "three"))
      // batch 2: delete id=2; same-batch later change wins for id=3
      input.addData(("d", 2L, "x", 3L), ("u", 3L, "iii", 4L),
        ("u", 3L, "III", 5L))
      q.processAllAvailable()
      store.get().orderBy("id").as[(Long, String)].collect().toSeq shouldBe
        Seq((1L, "ONE"), (3L, "III"))
      // equivalence with ONE batch applyChanges of the collapsed log
      val allChanges = Seq(("u", 1L, "ONE"), ("d", 2L, "x"),
        ("u", 3L, "III")).toDF("op", "id", "v")
        .select(col("id"), col("v"), col("op"))
      val batchResult = graft.versioning.VersionOps.applyChanges(
        base, allChanges, Seq("id"), "op")
      store.get().orderBy("id").collect().toSeq shouldBe
        batchResult.orderBy("id").collect().toSeq
    } finally q.stop()
  }

  test("adaptiveConformalStream carries the radius across batches, " +
      "bit-equal to the batch fold") {
    implicit val sqlCtx = spark.sqlContext
    val batch1 = Seq(("a", 1L, 5.0), ("b", 1L, 2.0), ("a", 2L, 0.2))
    val batch2 = Seq(("a", 3L, 10.0), ("b", 2L, 0.1), ("b", 3L, 7.0))
    val input = MemoryStream[(String, Long, Double)]
    val out = StreamOps.adaptiveConformalStream(input.toDS(),
      alpha = 0.5, gamma = 1.0)
    val q = out.writeStream.format("memory").queryName("aci_stream")
      .outputMode(OutputMode.Append()).start()
    try {
      input.addData(batch1: _*); q.processAllAvailable()
      input.addData(batch2: _*); q.processAllAvailable()
    } finally q.stop()
    val streamed = spark.table("aci_stream")
      .as[StreamOps.AciStreamOut].collect()
    // hand walk, key a (gamma 1, alpha .5, q0 0):
    // r=5 miss -> q .5; r=.2 hit -> q 0; r=10 miss -> q .5
    val qa = streamed.filter(_.key == "a").sortBy(_.ord).map(_.q)
    qa.toSeq shouldBe Seq(0.5, 0.0, 0.5)
    // batch fold over the concatenated input agrees on the final q
    val all = (batch1 ++ batch2)
      .map { case (k, o, r) => (k, o, r, 0.0) }
      .toDF("k", "t", "y", "yhat")
    val fold = graft.ml.Conformal.adaptiveConformal(all, Seq("k"),
      "y", "yhat", "t", alpha = 0.5, gamma = 1.0)
      .collect().map(r => r.getString(0) ->
        (r.getAs[Double]("q_final"), r.getAs[Long]("n_miss"))).toMap
    for ((k, rows) <- streamed.groupBy(_.key)) {
      val last = rows.maxBy(_.ord)
      last.q shouldBe fold(k)._1
      rows.count(_.miss).toLong shouldBe fold(k)._2
    }
  }

  test("ewmStream carries per-key EWM state across micro-batches, " +
      "bit-equal to the batch fold on the concatenated input") {
    implicit val sqlCtx = spark.sqlContext
    val batch1 = Seq(("a", 1L, Some(3.0)), ("a", 2L, Option.empty[Double]),
      ("b", 1L, Some(5.0)), ("a", 3L, Some(7.0)))
    val batch2 = Seq(("a", 4L, Some(2.0)), ("b", 2L, Some(1.5)),
      ("a", 5L, Some(9.5)), ("b", 3L, Option.empty[Double]))
    val batch3 = Seq(("b", 4L, Some(4.25)), ("a", 6L, Some(0.5)))
    val batchDf = (batch1 ++ batch2 ++ batch3).toDF("k", "ord", "v")
    for ((stat, adjust, ina) <- Seq(("var", true, true),
        ("mean", false, false), ("std", true, false))) {
      val input = MemoryStream[(String, Long, Option[Double])]
      val out = StreamOps.ewmStream(input.toDS(), alpha = 0.35,
        stat = stat, adjust = adjust, ignoreNa = ina)
      val name = s"ewm_stream_${stat}_$adjust$ina"
      val q = out.writeStream.format("memory").queryName(name)
        .outputMode(OutputMode.Append()).start()
      try {
        input.addData(batch1: _*); q.processAllAvailable()
        input.addData(batch2: _*); q.processAllAvailable()
        input.addData(batch3: _*); q.processAllAvailable()
      } finally q.stop()
      val streamed = spark.table(name)
        .as[StreamOps.EwmStreamOut].collect()
        .map(o => (o.key, o.ord) -> o.ewm).toMap
      val fold = (if (stat == "mean")
          graft.window.RollingOps.ewmMean(batchDf, "v", "ord",
            Seq("k"), 0.35, adjust = adjust, ignoreNa = ina,
            outName = "e")
        else if (stat == "var")
          graft.window.RollingOps.ewmVar(batchDf, "v", "ord",
            Seq("k"), 0.35, ignoreNa = ina, outName = "e")
        else
          graft.window.RollingOps.ewmStd(batchDf, "v", "ord",
            Seq("k"), 0.35, ignoreNa = ina, outName = "e"))
        .orderBy("k", "ord").select("k", "ord", "e")
        .as[(String, Long, Option[Double])].collect()
      streamed.size shouldBe fold.length
      fold.foreach { case (k, ord, e) =>
        withClue(s"$stat adjust=$adjust ignoreNa=$ina ($k,$ord): ") {
          streamed((k, ord)) shouldBe e // bit-equal, shared machine
        }
      }
    }
  }

  test("ewmTimeStream carries time-decayed EWM state across " +
      "batches, bit-equal to the batch scalable pass") {
    implicit val sqlCtx = spark.sqlContext
    val batch1 = Seq(("a", 1L, Some(10.0), Some(3.0)),
      ("a", 2L, Some(130.0), Option.empty[Double]),
      ("b", 1L, Some(50.0), Some(5.0)),
      ("a", 3L, Some(310.0), Some(7.0)))
    val batch2 = Seq(("a", 4L, Some(400.0), Some(2.0)),
      ("b", 2L, Some(777.0), Some(1.5)),
      ("a", 5L, Option.empty[Double], Some(9.5)),
      ("a", 6L, Some(912.0), Some(4.0)))
    val batchDf = (batch1 ++ batch2).toDF("k", "ord", "tm", "v")
    for (stat <- Seq("mean", "var")) {
      val input = MemoryStream[(String, Long, Option[Double],
        Option[Double])]
      val out = StreamOps.ewmTimeStream(input.toDS(),
        halflife = 300.0, stat = stat)
      val name = s"ewm_time_stream_$stat"
      val q = out.writeStream.format("memory").queryName(name)
        .outputMode(OutputMode.Append()).start()
      try {
        input.addData(batch1: _*); q.processAllAvailable()
        input.addData(batch2: _*); q.processAllAvailable()
      } finally q.stop()
      val streamed = spark.table(name)
        .as[StreamOps.EwmTimeStreamOut].collect()
        .map(o => (o.key, o.ord) -> o.ewm).toMap
      val batch = graft.window.RollingOps.ewmTimeScalable(batchDf,
          "v", "tm", "ord", Seq("k"), halflife = 300.0, stat = stat,
          outName = "e")
        .orderBy("k", "ord").select("k", "ord", "e")
        .as[(String, Long, Option[Double])].collect()
      streamed.size shouldBe batch.length
      batch.foreach { case (k, ord, e) =>
        withClue(s"$stat ($k,$ord): ") {
          streamed((k, ord)) shouldBe e
        }
      }
    }
  }

  test("ewmCovTimeStream carries time-decayed pairwise state " +
      "across batches, bit-equal to the batch scalable pass") {
    implicit val sqlCtx = spark.sqlContext
    val batch1 = Seq(
      ("a", 1L, Some(10.0), Some(3.0), Some(1.0)),
      ("a", 2L, Some(130.0), Option.empty[Double], Some(2.0)),
      ("b", 1L, Some(50.0), Some(5.0), Some(4.0)),
      ("a", 3L, Some(310.0), Some(7.0), Some(0.5)))
    val batch2 = Seq(
      ("a", 4L, Some(400.0), Some(2.0), Some(6.0)),
      ("b", 2L, Some(777.0), Some(1.5), Some(2.5)),
      ("a", 5L, Some(912.0), Some(9.5), Some(3.25)))
    val batchDf = (batch1 ++ batch2).toDF("k", "ord", "tm", "x", "y")
    val input = MemoryStream[(String, Long, Option[Double],
      Option[Double], Option[Double])]
    val out = StreamOps.ewmCovTimeStream(input.toDS(),
      halflife = 300.0)
    val q = out.writeStream.format("memory")
      .queryName("ewmcovtime_stream")
      .outputMode(OutputMode.Append()).start()
    try {
      input.addData(batch1: _*); q.processAllAvailable()
      input.addData(batch2: _*); q.processAllAvailable()
    } finally q.stop()
    val streamed = spark.table("ewmcovtime_stream")
      .as[StreamOps.EwmCovStreamOut].collect()
      .map(o => (o.key, o.ord) -> o.ewm).toMap
    val batch = graft.window.RollingOps.ewmCovTimeScalable(batchDf,
        "x", "y", "tm", "ord", Seq("k"), halflife = 300.0,
        outName = "e")
      .orderBy("k", "ord").select("k", "ord", "e")
      .as[(String, Long, Option[Double])].collect()
    streamed.size shouldBe batch.length
    batch.foreach { case (k, ord, e) =>
      withClue(s"($k,$ord): ") { streamed((k, ord)) shouldBe e }
    }
  }

  test("ewmCovStream carries pairwise EWM state across batches, " +
      "bit-equal to the batch fold") {
    implicit val sqlCtx = spark.sqlContext
    val batch1 = Seq(("a", 1L, Some(3.0), Some(1.0)),
      ("a", 2L, Option.empty[Double], Some(2.0)),
      ("b", 1L, Some(5.0), Some(4.0)),
      ("a", 3L, Some(7.0), Some(0.5)))
    val batch2 = Seq(("a", 4L, Some(2.0), Some(6.0)),
      ("b", 2L, Some(1.5), Some(2.5)),
      ("a", 5L, Some(9.5), Some(3.25)),
      ("b", 3L, Some(4.0), Option.empty[Double]))
    val batchDf = (batch1 ++ batch2).toDF("k", "ord", "x", "y")
    for ((corr, ina) <- Seq((false, true), (true, false))) {
      val input = MemoryStream[(String, Long, Option[Double],
        Option[Double])]
      val out = StreamOps.ewmCovStream(input.toDS(), alpha = 0.4,
        corr = corr, ignoreNa = ina)
      val name = s"ewmcov_stream_$corr$ina"
      val q = out.writeStream.format("memory").queryName(name)
        .outputMode(OutputMode.Append()).start()
      try {
        input.addData(batch1: _*); q.processAllAvailable()
        input.addData(batch2: _*); q.processAllAvailable()
      } finally q.stop()
      val streamed = spark.table(name)
        .as[StreamOps.EwmCovStreamOut].collect()
        .map(o => (o.key, o.ord) -> o.ewm).toMap
      val fold = graft.window.RollingOps.ewmCov(batchDf, "x", "y",
          "ord", Seq("k"), 0.4, corr = corr, ignoreNa = ina,
          outName = "e")
        .orderBy("k", "ord").select("k", "ord", "e")
        .as[(String, Long, Option[Double])].collect()
      streamed.size shouldBe fold.length
      fold.foreach { case (k, ord, e) =>
        withClue(s"corr=$corr ignoreNa=$ina ($k,$ord): ") {
          streamed((k, ord)) shouldBe e
        }
      }
    }
  }
}
