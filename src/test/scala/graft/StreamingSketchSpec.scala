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

  // ---- keyed flatMapGroupsWithState forms: the sketch lives as
  // per-key GroupState and emits append-mode estimates, the shape
  // for maintaining rolling estimates next to other keyed state ----

  test("hllStream keyed state: final estimate bit-equal to batch hllEstimate over concatenated input") {
    import graft.streaming.StreamOps
    implicit val sqlCtx = spark.sqlContext
    val b1 = (1 to 700).map(i => ("s1", s"u$i")) ++
      (1 to 50).map(i => ("s2", s"v$i"))
    val b2 = (500 to 1400).map(i => ("s1", s"u$i")) // overlap
    val input = MemoryStream[(String, String)]
    val out = StreamOps.hllStream(input.toDS(), p = 6)
    val q = out.writeStream.format("memory").queryName("hll_fmgws")
      .outputMode(OutputMode.Append()).start()
    try {
      input.addData(b1: _*); q.processAllAvailable()
      input.addData(b2: _*); q.processAllAvailable()
    } finally q.stop()
    val rows = spark.table("hll_fmgws")
      .as[StreamOps.HllStreamOut].collect()
    // last emission per key vs the batch estimate on everything
    val lastS1 = rows.filter(_.key == "s1").maxBy(_.totalRows)
    lastS1.totalRows shouldBe (700 + 901).toLong
    val batchEst = PipelineOps.hllEstimate(
      PipelineOps.hllSketch(
        (b1 ++ b2).filter(_._1 == "s1").map(_._2).toDF("v"), "v", 6), 6)
      .head().getAs[Double]("hll_estimate")
    lastS1.hllEstimate shouldBe batchEst
    // the second key's state is independent
    val lastS2 = rows.filter(_.key == "s2").maxBy(_.totalRows)
    val batchEst2 = PipelineOps.hllEstimate(
      PipelineOps.hllSketch(
        (1 to 50).map(i => s"v$i").toDF("v"), "v", 6), 6)
      .head().getAs[Double]("hll_estimate")
    lastS2.hllEstimate shouldBe batchEst2
  }

  test("kmvStream keyed state: final estimate bit-equal to batch kmvDistinct over concatenated input") {
    import graft.streaming.StreamOps
    implicit val sqlCtx = spark.sqlContext
    val b1 = (1 to 300).map(i => ("k", s"x$i"))
    val b2 = (200 to 900).map(i => ("k", s"x$i"))
    val input = MemoryStream[(String, String)]
    val out = StreamOps.kmvStream(input.toDS(), k = 64)
    val q = out.writeStream.format("memory").queryName("kmv_fmgws")
      .outputMode(OutputMode.Append()).start()
    try {
      input.addData(b1: _*); q.processAllAvailable()
      input.addData(b2: _*); q.processAllAvailable()
    } finally q.stop()
    val rows = spark.table("kmv_fmgws")
      .as[StreamOps.KmvStreamOut].collect()
    rows.length shouldBe 2 // one emission per batch
    val batch = PipelineOps.kmvDistinct(
      (b1 ++ b2).map(_._2).toDF("v"), "v", k = 64).head()
    val last = rows.last
    last.kSeen shouldBe batch.getAs[Long]("k_seen")
    last.distinctEstimate shouldBe
      batch.getAs[Double]("distinct_estimate")
    // first batch alone also matches its own prefix
    val batch1 = PipelineOps.kmvDistinct(
      b1.map(_._2).toDF("v"), "v", k = 64).head()
    rows.head.distinctEstimate shouldBe
      batch1.getAs[Double]("distinct_estimate")
  }

  test("cmsStream keyed state: per-item rolling estimates equal batch CMS over the prefix seen so far") {
    import graft.streaming.StreamOps
    implicit val sqlCtx = spark.sqlContext
    val items1 = (1 to 200).map(i => s"key${1 + (200.0 / i).toInt}")
    val items2 = (1 to 150).map(i => s"key${1 + i % 5}")
    val b1 = items1.zipWithIndex.map { case (it, i) =>
      ("c", i.toLong, it) }
    val b2 = items2.zipWithIndex.map { case (it, i) =>
      ("c", (1000 + i).toLong, it) }
    val input = MemoryStream[(String, Long, String)]
    val out = StreamOps.cmsStream(input.toDS(), depth = 4, width = 32)
    val q = out.writeStream.format("memory").queryName("cms_fmgws")
      .outputMode(OutputMode.Append()).start()
    try {
      input.addData(b1: _*); q.processAllAvailable()
      input.addData(b2: _*); q.processAllAvailable()
    } finally q.stop()
    val rows = spark.table("cms_fmgws")
      .as[StreamOps.CmsStreamOut].collect()
    rows.length shouldBe 350
    // the streamed estimate at row i is the batch CMS estimate over
    // the PREFIX up to and including that row — check a spread of
    // prefixes plus the final row (whose prefix is the full input)
    val ordered = rows.sortBy(_.ord)
    val allItems = items1 ++ items2
    val byOrd = ordered.map(_.ord)
    val checkIdx = Seq(0, 1, 49, 199, 200, 260, 349)
    checkIdx.foreach { i =>
      val prefix = allItems.take(i + 1).toDF("k")
      val sketch = PipelineOps.countMinSketch(prefix, "k",
        depth = 4, width = 32)
      val it = ordered(i).item
      val est = PipelineOps.cmsEstimate(sketch,
        Seq(it).toDF("k"), "k", depth = 4, width = 32)
        .head().getLong(1)
      withClue(s"row $i (ord ${byOrd(i)}, item $it): ") {
        ordered(i).cmsCount shouldBe est
      }
    }
  }

  test("psiStream: accumulated streamed PSI equals batch psi on the concatenated input") {
    import graft.streaming.StreamOps
    implicit val sqlCtx = spark.sqlContext
    val breaks = Seq(10.0, 20.0, 30.0)
    // baseline: roughly uniform across the 4 bins
    val baseVals = (1 to 400).map(i => (i % 40).toDouble)
    val baseCounts = baseVals.groupBy(v =>
      breaks.count(v > _)).view.mapValues(_.size.toLong).toMap
    val baseline = Map("f1" ->
      (0 to 3).map(b => baseCounts.getOrElse(b, 0L)))
    // drifted stream: mass concentrated high
    val b1 = (1 to 150).map(i => ("f1", (25 + i % 15).toDouble))
    val b2 = (1 to 100).map(i => ("f1", (5 + i % 30).toDouble))
    val input = MemoryStream[(String, Double)]
    val out = StreamOps.psiStream(input.toDS(), breaks, baseline)
    val q = out.writeStream.format("memory").queryName("psi_fmgws")
      .outputMode(OutputMode.Append()).start()
    try {
      input.addData(b1: _*); q.processAllAvailable()
      input.addData(b2: _*); q.processAllAvailable()
    } finally q.stop()
    val rows = spark.table("psi_fmgws")
      .as[StreamOps.PsiStreamOut].collect().sortBy(_.totalRows)
    rows.length shouldBe 2
    rows.last.totalRows shouldBe 250L
    // batch reference: cohort A = full stream, cohort B = baseline
    val batchDf = ((b1 ++ b2).map(x => ("obs", x._2)) ++
      baseVals.map(v => ("base", v))).toDF("g", "v")
    val batchPsi = graft.stats.StatsOps
      .psi(batchDf, "v", "g", "obs", "base", breaks)
      .head().getAs[Double]("psi")
    math.abs(rows.last.psi - batchPsi) should be <= 1e-6
    // drift direction sanity: batch-1 (concentrated) drifts more
    // than the fuller mix
    rows.head.psi should be > rows.last.psi
  }

  test("heavyHittersStream: per-batch emitted hot set equals the " +
      "batch CMS heavy-hitter computation over the prefix") {
    import graft.streaming.StreamOps
    implicit val sqlCtx = spark.sqlContext
    val b1items = Seq.fill(120)("hot") ++
      (1 to 40).flatMap(i => Seq.fill(2)(s"f$i"))
    val b2items = Seq.fill(30)("warm") ++ Seq.fill(10)("hot") ++
      (1 to 30).map(i => s"g$i")
    val b1 = b1items.zipWithIndex.map { case (it, i) =>
      ("m", i.toLong, it) }
    val b2 = b2items.zipWithIndex.map { case (it, i) =>
      ("m", (1000 + i).toLong, it) }
    val input = MemoryStream[(String, Long, String)]
    val out = StreamOps.heavyHittersStream(input.toDS(), k = 10,
      depth = 4, width = 32, maxCandidates = 1024)
    val q = out.writeStream.format("memory").queryName("hh_fmgws")
      .outputMode(OutputMode.Append()).start()
    try {
      input.addData(b1: _*); q.processAllAvailable()
      input.addData(b2: _*); q.processAllAvailable()
    } finally q.stop()
    val rows = spark.table("hh_fmgws")
      .as[StreamOps.HhStreamOut].collect()
    // reference: the batch countMinSketch/cmsEstimate pair over the
    // prefix, thresholded at est*k > total (q102's phi = 1/k rule)
    def ref(prefix: Seq[String]): Map[String, (Long, Long)] = {
      val df = prefix.toDF("k")
      val sketch = PipelineOps.countMinSketch(df, "k",
        depth = 4, width = 32)
      val est = PipelineOps.cmsEstimate(sketch, df, "k",
        depth = 4, width = 32).collect()
        .map(r => r.getString(0) -> r.getLong(1)).toMap
      val total = prefix.size.toLong
      est.collect { case (i, e) if e * 10 > total =>
        i -> (e, total) }.toMap
    }
    def emitted(asof: Long) = rows.filter(_.asof == asof)
      .map(o => o.item -> (o.est, o.total)).toMap
    emitted(b1.map(_._2).max) shouldBe ref(b1items)
    emitted(b2.map(_._2).max) shouldBe ref(b1items ++ b2items)
  }

  test("quantileStream: per-batch interpolated quantiles equal the " +
      "fixed-edge histogram computation over the accumulated prefix") {
    import graft.streaming.StreamOps
    implicit val sqlCtx = spark.sqlContext
    val edges = Seq(0.0, 10.0, 20.0, 30.0, 40.0)
    val qs = Seq(0.5, 0.95)
    val b1vals = (1 to 200).map(i => (i % 40).toDouble)
    val b2vals = (1 to 100).map(i => 35.0 + (i % 5)) // shift right
    val b1 = b1vals.map(("lat", _))
    val b2 = b2vals.map(("lat", _))
    val input = MemoryStream[(String, Double)]
    val out = StreamOps.quantileStream(input.toDS(), edges, qs)
    val q = out.writeStream.format("memory").queryName("quant_fmgws")
      .outputMode(OutputMode.Append()).start()
    try {
      input.addData(b1: _*); q.processAllAvailable()
      input.addData(b2: _*); q.processAllAvailable()
    } finally q.stop()
    val rows = spark.table("quant_fmgws")
      .as[StreamOps.QuantStreamOut].collect()
    rows should have size 4 // 2 batches x 2 quantiles
    // reference: same fixed-edge binning + interpolation, plain fold
    def ref(vals: Seq[Double], qq: Double): Double = {
      val nBins = edges.length - 1
      val counts = new Array[Long](nBins)
      vals.foreach { v =>
        val b = (1 until nBins).count(i => v >= edges(i))
        counts(b) += 1
      }
      val cum = counts.scanLeft(0L)(_ + _).tail
      val rank = qq * vals.size
      var bin = 0
      while (bin < nBins - 1 && cum(bin) < rank) bin += 1
      val before = if (bin == 0) 0L else cum(bin - 1)
      val est =
        if (counts(bin) == 0L) edges(bin)
        else edges(bin) + (edges(bin + 1) - edges(bin)) *
          ((rank - before) / counts(bin))
      math.rint(est * 1e9) / 1e9
    }
    for (qq <- qs) {
      rows.find(r => r.totalRows == 200L && r.q == qq).get
        .quantileEst shouldBe ref(b1vals, qq)
      rows.find(r => r.totalRows == 300L && r.q == qq).get
        .quantileEst shouldBe ref(b1vals ++ b2vals, qq)
    }
    // drift direction sanity: the right-shifted batch pulls p95 up
    val p95s = rows.filter(_.q == 0.95).sortBy(_.totalRows)
    p95s.last.quantileEst should be > p95s.head.quantileEst
  }

  test("heavyHittersStream: a tight candidate budget still finds " +
      "the persistent heavy hitter with its exact CMS estimate") {
    import graft.streaming.StreamOps
    implicit val sqlCtx = spark.sqlContext
    // 300 distinct one-off cold items swamp a 10-slot candidate
    // set; 'hot' keeps arriving, so pruning can never lose it
    val items = (1 to 300).flatMap(i => Seq(s"cold$i", "hot"))
    val batch = items.zipWithIndex.map { case (it, i) =>
      ("m", i.toLong, it) }
    val input = MemoryStream[(String, Long, String)]
    val out = StreamOps.heavyHittersStream(input.toDS(), k = 10,
      depth = 4, width = 64, maxCandidates = 10)
    val q = out.writeStream.format("memory").queryName("hh_prune")
      .outputMode(OutputMode.Append()).start()
    try { input.addData(batch: _*); q.processAllAvailable() }
    finally q.stop()
    val rows = spark.table("hh_prune")
      .as[StreamOps.HhStreamOut].collect()
    val hot = rows.filter(_.item == "hot")
    hot should have size 1
    val sketch = PipelineOps.countMinSketch(items.toDF("k"), "k",
      depth = 4, width = 64)
    val hotEst = PipelineOps.cmsEstimate(sketch, Seq("hot").toDF("k"),
      "k", depth = 4, width = 64).head().getLong(1)
    hot.head.est shouldBe hotEst
    hot.head.total shouldBe 600L
  }
}
