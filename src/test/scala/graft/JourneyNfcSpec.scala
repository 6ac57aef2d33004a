package graft

import org.apache.spark.sql.functions._
import graft.analytics.EventOps

/** Journey-string sequence mining (q463) + NFC normalization (q464). */
class JourneyNfcSpec extends SparkSpecBase {
  import spark.implicits._

  test("journeyPatterns orders by (ts, tie) and counts " +
      "non-overlapping regex matches on the initial string") {
    val ev = Seq(
      ("u1", 1L, 1L, "view"), ("u1", 2L, 2L, "view"),
      ("u1", 3L, 3L, "purchase"), ("u1", 4L, 4L, "view"),
      ("u1", 5L, 5L, "purchase"), ("u1", 6L, 6L, "error"),
      ("u1", 7L, 7L, "error"),
      // same ts -> tie column decides: signup(8,1) before view(8,2)
      ("u2", 8L, 1L, "signup"), ("u2", 8L, 2L, "view")
    ).toDF("user_id", "ts", "event_id", "event_type")
    val r = EventOps.journeyPatterns(ev, "user_id", "ts",
      "event_type", "event_id", Seq(
        "n_browse_buy" -> "v+p", "n_error_streak" -> "e{2,}",
        "n_signup_view" -> "sv"))
      .collect().map(x => x.getString(0) -> x).toMap
    r("u1").getAs[String]("journey") shouldBe "vvpvpee"
    r("u1").getAs[Long]("n_browse_buy") shouldBe 2L
    r("u1").getAs[Long]("n_error_streak") shouldBe 1L
    r("u2").getAs[String]("journey") shouldBe "sv"
    r("u2").getAs[Long]("n_signup_view") shouldBe 1L
  }

  test("journeyStream accumulated across micro-batches equals the " +
      "batch journeyPatterns on the concatenated input") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import org.apache.spark.sql.streaming.OutputMode
    implicit val sqlCtx = spark.sqlContext
    val evs = Seq(
      ("u1", 1L, "view"), ("u1", 2L, "view"), ("u1", 3L, "purchase"),
      ("u1", 4L, "error"), ("u1", 5L, "error"), ("u2", 1L, "signup"),
      ("u2", 2L, "view"), ("u1", 6L, "view"), ("u1", 7L, "purchase"))
    val input = MemoryStream[(String, Long, String)]
    val out = graft.streaming.StreamOps.journeyStream(input.toDS(),
      Seq("np" -> "v+p", "ne" -> "e{2,}"))
    val q = out.writeStream.format("memory").queryName("jrn_fmgws")
      .outputMode(OutputMode.Append()).start()
    try {
      input.addData(evs.take(4): _*); q.processAllAvailable()
      input.addData(evs.drop(4): _*); q.processAllAvailable()
    } finally q.stop()
    import graft.streaming.StreamOps.JourneyStreamOut
    val rows = spark.table("jrn_fmgws").as[JourneyStreamOut]
      .collect()
    val last = rows.groupBy(_.key)
      .map { case (k, rs) => k -> rs.maxBy(_.nEvents) }
    // batch reference over the same events with ord as tiebreak
    val batch = graft.analytics.EventOps.journeyPatterns(
      evs.toDF("u", "ts", "ty").withColumn("id", col("ts")),
      "u", "ts", "ty", "id", Seq("np" -> "v+p", "ne" -> "e{2,}"))
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getString(2), r.getLong(3), r.getLong(4)))
      .toMap
    last("u1").journey shouldBe batch("u1")._2
    last("u1").nEvents shouldBe batch("u1")._1
    last("u1").patternCounts("np") shouldBe batch("u1")._3
    last("u1").patternCounts("ne") shouldBe batch("u1")._4
    last("u2").journey shouldBe batch("u2")._2
  }

  test("nfc composes decomposed accents, is idempotent, and leaves " +
      "ASCII untouched") {
    import graft.sqlext.NfcNormalize.nfc
    val decomposed = "Cafe\u0301"   // e + combining acute
    val composed = "Caf\u00e9"      // precomposed e-acute
    val df = Seq(decomposed, composed, "plain ascii").toDF("s")
      .select(col("s"), nfc(col("s")).as("n"),
        nfc(nfc(col("s"))).as("nn"), org.apache.spark.sql.functions.length(col("s")).as("l"),
        org.apache.spark.sql.functions.length(nfc(col("s"))).as("ln"))
    val rows = df.collect()
    rows(0).getString(1) shouldBe composed
    rows(0).getInt(3) shouldBe 5
    rows(0).getInt(4) shouldBe 4
    // already-composed input unchanged
    rows(1).getString(1) shouldBe composed
    rows(2).getString(1) shouldBe "plain ascii"
    // idempotent
    rows.foreach(r => r.getString(2) shouldBe r.getString(1))
    // SQL registration through the injector
    val ext = new org.apache.spark.sql.SparkSessionExtensions
    new graft.sqlext.GraftExtensions().apply(ext)
    org.apache.spark.sql.GraftSqlBridge
      .applyInjectedFunctions(ext, spark)
    spark.sql("select nfc_normalize('Cafe\u0301')")
      .head().getString(0) shouldBe composed
  }
}
