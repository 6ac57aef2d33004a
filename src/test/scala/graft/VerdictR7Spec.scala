package graft

import org.apache.spark.sql.functions._

/** Round-7 verdict follow-ups: q375 ICC partition-order determinism,
  * record-linkage scale honesty, entity-resolution fixpoint. */
class VerdictR7Spec extends SparkSpecBase {
  import spark.implicits._

  test("iccOneWay: bit-identical under repartition(1) vs repartition(32)") {
    // Many groups with values large enough that a naive double sum of
    // si^2/ni is partition-order-sensitive at the last ulp.
    val rng = new scala.util.Random(7)
    val data = (0 until 5000).flatMap { g =>
      (0 until (1 + g % 5)).map(_ => (s"g$g", 50000L + rng.nextInt(100000)))
    }
    val df = data.toDF("g", "x")
    val r1 = graft.stats.StatsOps
      .iccOneWay(df.repartition(1), "g", "x").head()
    val r32 = graft.stats.StatsOps
      .iccOneWay(df.repartition(32), "g", "x").head()
    for (c <- Seq("msb", "msw", "k0", "icc")) {
      java.lang.Double.doubleToLongBits(r1.getAs[Double](c)) shouldBe
        java.lang.Double.doubleToLongBits(r32.getAs[Double](c))
    }
    r1.getAs[Long]("n_groups") shouldBe 5000L
  }

  test("blockPairsMulti: union of passes, each pair from its first pass only") {
    import graft.analytics.RecordLinkage
    // city pass and zip pass overlap on (1,2); (3,4) only via zip;
    // (1,3)/(2,3) only via city
    val df = Seq(
      (1L, "nyc", "10001"), (2L, "nyc", "10001"), (3L, "nyc", "99999"),
      (4L, "sfo", "99999"), (5L, "chi", "60601")
    ).toDF("id", "city", "zip")
    val pairs = RecordLinkage.blockPairsMulti(df, "id",
      Seq(Seq("city"), Seq("zip")))
      .select("l_id", "r_id", "block_pass").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).sorted
    pairs.toSeq shouldBe Seq(
      (1L, 2L, 0), (1L, 3L, 0), (2L, 3L, 0), (3L, 4L, 1))
    // no pair appears twice across passes
    pairs.map(p => (p._1, p._2)).distinct.length shouldBe pairs.length
  }

  test("blockPairsMulti: null block key pairs nowhere but row survives other passes") {
    import graft.analytics.RecordLinkage
    val df = Seq(
      (1L, null.asInstanceOf[String], "z1"),
      (2L, null.asInstanceOf[String], "z1"),
      (3L, "c1", "z2"), (4L, "c1", "z3")
    ).toDF("id", "city", "zip")
    val pairs = RecordLinkage.blockPairsMulti(df, "id",
      Seq(Seq("city"), Seq("zip")))
      .select("l_id", "r_id", "block_pass").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).sorted
    // nulls never equality-pair on city; rows 1,2 still pair via zip
    pairs.toSeq shouldBe Seq((1L, 2L, 1), (3L, 4L, 0))
  }

  test("blockPairsMulti + blockAudit: oversized block dropped in one pass, recalled by the other, loudly counted") {
    import graft.analytics.RecordLinkage
    val hot = (1L to 5L).map(i => (i, "hot", s"z$i"))
    val df = (hot :+ ((6L, "cold", "z1"))).toDF("id", "city", "zip")
    // city pass: 'hot' block size 5 > maxBlock=4 -> dropped; zip
    // pass recalls (1,6) which shares z1
    val pairs = RecordLinkage.blockPairsMulti(df, "id",
      Seq(Seq("city"), Seq("zip")), maxBlock = 4)
      .select("l_id", "r_id", "block_pass").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).sorted
    pairs.toSeq shouldBe Seq((1L, 6L, 1))
    val audit = RecordLinkage.blockAudit(df,
      Seq(Seq("city"), Seq("zip")), maxBlock = 4)
      .orderBy("block_pass").collect()
    audit(0).getLong(1) shouldBe 2L // city blocks: hot, cold
    audit(0).getLong(2) shouldBe 1L // hot dropped
    audit(0).getLong(3) shouldBe 5L // 5 rows lost to the drop
    audit(0).getLong(4) shouldBe 5L // max block
    audit(1).getLong(2) shouldBe 0L // zip pass drops nothing
  }

  test("entityIds: chain of 5 under-merges at rounds=3, fixpoint rounds=-1 converges") {
    import graft.analytics.RecordLinkage
    // path 1-2-3-4-5: diameter 4 > 3 unrolled rounds
    val pairs = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L))
      .toDF("a", "b")
    val unrolled = RecordLinkage.entityIds(pairs, "a", "b", rounds = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    unrolled(5L) should be > 1L // vertex 5 has not yet heard from 1
    val fix = RecordLinkage.entityIds(pairs, "a", "b", rounds = -1)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    fix.values.toSet shouldBe Set(1L) // one entity, min label
    fix.keySet shouldBe Set(1L, 2L, 3L, 4L, 5L)
  }

  test("bleu smoothing methods 2 and 3: hand-computed Chen-Cherry values") {
    // cand 'the cat sat on mat' vs ref 'the cat is on the mat':
    // raw p = 4/5, 1/4, 0, 0; clen=5, rlen=6 -> bp = e^(1-6/5)
    val pairs = Seq((1L, "the cat sat on mat", "the cat is on the mat"))
      .toDF("pid", "cand", "ref")
    val bp = math.exp(1.0 - 6.0 / 5.0)
    // method 2: add-one for n>=2 -> p2 = 2/5, p3 = 1/4, p4 = 1/3
    val m2 = graft.llm.TextEval
      .bleu(pairs, "pid", "cand", "ref", smoothing = 2).head()
    approx(m2.getAs[Double]("p1"), 0.8, 1e-6)
    approx(m2.getAs[Double]("p2"), 0.4, 1e-6)
    approx(m2.getAs[Double]("p3"), 0.25, 1e-6)
    approx(m2.getAs[Double]("p4"), 0.333333, 1e-6)
    approx(m2.getAs[Double]("bleu"),
      bp * math.pow(0.8 * 0.4 * 0.25 / 3.0, 0.25), 1e-6)
    // method 3: first zero (n=3) -> 1/(2*3), second (n=4) -> 1/(4*2)
    val m3 = graft.llm.TextEval
      .bleu(pairs, "pid", "cand", "ref", smoothing = 3).head()
    approx(m3.getAs[Double]("p1"), 0.8, 1e-6)
    approx(m3.getAs[Double]("p2"), 0.25, 1e-6)
    approx(m3.getAs[Double]("p3"), 1.0 / 6, 1e-6)
    approx(m3.getAs[Double]("p4"), 0.125, 1e-6)
    approx(m3.getAs[Double]("bleu"),
      bp * math.pow(0.8 * 0.25 / 48.0, 0.25), 1e-6)
    // method 2 keeps the raw-p1 zero -> whole score 0
    val miss = Seq((1L, "aa bb cc dd ee", "xx yy zz ww vv"))
      .toDF("pid", "cand", "ref")
    graft.llm.TextEval.bleu(miss, "pid", "cand", "ref", smoothing = 2)
      .head().getAs[Double]("bleu") shouldBe 0.0
    // while method 3 floors it positive
    graft.llm.TextEval.bleu(miss, "pid", "cand", "ref", smoothing = 3)
      .head().getAs[Double]("bleu") should be > 0.0
  }

  test("xlsx multi-sheet: 3-sheet round trip, listSheets order, read by name and index") {
    import graft.sources.Excel
    val path = java.nio.file.Files.createTempDirectory("graft_xlsx_ms")
      .toString + "/wb.xlsx"
    val s1 = Seq((1L, "a"), (2L, "b")).toDF("id", "s")
    val s2 = Seq((10.5, true), (11.5, false)).toDF("x", "flag")
    val s3 = Seq(("only", 7L)).toDF("k", "v")
    Excel.writeXlsxSheets(
      Seq("first" -> s1, "second sheet" -> s2, "third" -> s3), path)
    Excel.listSheets(path) shouldBe Seq("first", "second sheet", "third")
    val b2 = Excel.readXlsxSheet(spark, path, "second sheet")
      .orderBy("x")
    b2.columns shouldBe Array("x", "flag")
    b2.select("flag").collect().map(_.getBoolean(0)).toSeq shouldBe
      Seq(true, false)
    val b3 = Excel.readXlsxSheet(spark, path, 2)
    b3.columns shouldBe Array("k", "v")
    b3.head().getString(0) shouldBe "only"
    // first sheet is the default read
    Excel.readXlsx(spark, path).columns shouldBe Array("id", "s")
    // unknown name fails loudly with the available names
    val err = intercept[IllegalArgumentException] {
      Excel.readXlsxSheet(spark, path, "nope")
    }
    err.getMessage should include("second sheet")
    // duplicate names rejected at write time
    intercept[IllegalArgumentException] {
      Excel.writeXlsxSheets(Seq("d" -> s1, "d" -> s2), path)
    }
  }

  test("xlsx multi-sheet: r:id indirection resolved when workbook order differs from sheetN numbering") {
    import java.util.zip.{ZipEntry, ZipOutputStream}
    val path = java.nio.file.Files.createTempDirectory("graft_xlsx_rid")
      .toString + "/wb.xlsx"
    val zos = new ZipOutputStream(new java.io.FileOutputStream(path))
    def put(name: String, content: String): Unit = {
      zos.putNextEntry(new ZipEntry(name))
      zos.write(content.getBytes("UTF-8")); zos.closeEntry()
    }
    // workbook lists 'zeta' FIRST but its part is sheet2.xml; shared
    // strings exercised on both sheets
    put("xl/workbook.xml",
      """<?xml version="1.0"?><workbook xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main" xmlns:r="http://schemas.openxmlformats.org/officeDocument/2006/relationships"><sheets><sheet name="zeta" sheetId="1" r:id="rA"/><sheet name="alpha" sheetId="2" r:id="rB"/></sheets></workbook>""")
    put("xl/_rels/workbook.xml.rels",
      """<?xml version="1.0"?><Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships"><Relationship Id="rA" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/worksheet" Target="worksheets/sheet2.xml"/><Relationship Id="rB" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/worksheet" Target="worksheets/sheet1.xml"/></Relationships>""")
    put("xl/sharedStrings.xml",
      """<?xml version="1.0"?><sst xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main" count="3" uniqueCount="3"><si><t>col</t></si><si><t>from_sheet2</t></si><si><t>from_sheet1</t></si></sst>""")
    def sheet(v: Int) =
      s"""<?xml version="1.0"?><worksheet xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main"><sheetData><row r="1"><c r="A1" t="s"><v>0</v></c></row><row r="2"><c r="A2" t="s"><v>$v</v></c></row></sheetData></worksheet>"""
    put("xl/worksheets/sheet1.xml", sheet(2))
    put("xl/worksheets/sheet2.xml", sheet(1))
    zos.close()
    graft.sources.Excel.listSheets(path) shouldBe Seq("zeta", "alpha")
    graft.sources.Excel.readXlsxSheet(spark, path, "zeta")
      .head().getString(0) shouldBe "from_sheet2"
    graft.sources.Excel.readXlsxSheet(spark, path, "alpha")
      .head().getString(0) shouldBe "from_sheet1"
  }

  test("adamicAdar: hand-computed scores on a 4-vertex graph") {
    // degs: 1:2, 2:2, 3:3, 4:1; common-neighbor pairs:
    // (2,3) via 1, (1,3) via 2 -> 1/ln2; (1,2),(1,4),(2,4) via 3 -> 1/ln3
    val edges = Seq((1L, 2L), (1L, 3L), (2L, 3L), (3L, 4L))
      .toDF("src", "dst")
    val r = graft.graphops.GraphOps.adamicAdar(edges)
      .collect()
      .map(x => (x.getLong(0), x.getLong(1)) ->
        (x.getLong(2), x.getDouble(3))).toMap
    r.size shouldBe 5
    approx(r((2L, 3L))._2, 1.0 / math.log(2), 1e-9)
    approx(r((1L, 3L))._2, 1.0 / math.log(2), 1e-9)
    approx(r((1L, 2L))._2, 1.0 / math.log(3), 1e-9)
    approx(r((1L, 4L))._2, 1.0 / math.log(3), 1e-9)
    approx(r((2L, 4L))._2, 1.0 / math.log(3), 1e-9)
    r((1L, 2L))._1 shouldBe 1L
    // hub cap: maxDeg = 2 drops vertex 3 as a shared neighbor
    val capped = graft.graphops.GraphOps.adamicAdar(edges, maxDeg = 2)
      .collect().map(x => (x.getLong(0), x.getLong(1))).toSet
    capped shouldBe Set((2L, 3L), (1L, 3L))
  }

  test("hits: exact integer 2-round values on a tiny bipartite graph") {
    val e = Seq(("c1", "s1"), ("c1", "s2"), ("c2", "s1"))
      .toDF("src", "dst")
    val r = graft.graphops.GraphOps.hits(e, rounds = 2)
      .collect()
      .map(x => x.getString(0) -> (x.getLong(1), x.getLong(2))).toMap
    r("s1") shouldBe ((5L, 0L))
    r("s2") shouldBe ((3L, 0L))
    r("c1") shouldBe ((0L, 8L))
    r("c2") shouldBe ((0L, 5L))
  }

  test("brierDecomposition: Murphy identity BS = REL - RES + UNC on a hand case") {
    val df = Seq((0.2, false), (0.2, true), (0.8, true), (0.8, true))
      .toDF("p", "y")
    val r = graft.ml.MlMetrics.brierDecomposition(df, "p", "y").head()
    approx(r.getAs[Double]("brier"), 0.19, 1e-12)
    approx(r.getAs[Double]("reliability"), 0.065, 1e-12)
    approx(r.getAs[Double]("resolution"), 0.0625, 1e-12)
    approx(r.getAs[Double]("uncertainty"), 0.1875, 1e-12)
  }

  test("jsDivergence: hand-computed, zero on identical, ln2 on disjoint") {
    import graft.llm.CorpusOps
    // P = {a:.5, b:.5}, Q = {a:.5, c:.5} -> JSD = ln2 / 2
    val df = Seq(("s0", "a b"), ("s1", "a c")).toDF("src", "text")
    val r = CorpusOps.jsDivergence(df, "text", "src", "s0", "s1").head()
    r.getAs[Long]("n_vocab") shouldBe 3L
    approx(r.getAs[Double]("jsd"), math.log(2) / 2, 1e-9)
    approx(r.getAs[Double]("kl_pm"), math.log(2) / 2, 1e-9)
    val same = Seq(("s0", "x y z"), ("s1", "x y z")).toDF("src", "text")
    approx(CorpusOps.jsDivergence(same, "text", "src", "s0", "s1")
      .head().getAs[Double]("jsd"), 0.0, 1e-12)
    val disj = Seq(("s0", "x x"), ("s1", "y y")).toDF("src", "text")
    approx(CorpusOps.jsDivergence(disj, "text", "src", "s0", "s1")
      .head().getAs[Double]("jsd"), math.log(2), 1e-9)
  }

  test("temperatureScaling: overconfident scores pick T > 1, calibrated pick T = 1") {
    import graft.ml.MlMetrics
    // p = 0.9 but only 60% correct -> optimal pt = 0.6 -> T* ~ 5.4,
    // grid argmin is 4.0
    val over = ((1 to 6).map(_ => (0.9, true)) ++
      (1 to 4).map(_ => (0.9, false))).toDF("p", "y")
    val bestOver = MlMetrics.temperatureScaling(over, "p", "y")
      .filter(col("is_best")).head().getDouble(0)
    bestOver shouldBe 4.0
    // p = 0.9 and 90% correct -> already calibrated -> T = 1
    val cal = ((1 to 9).map(_ => (0.9, true)) :+ ((0.9, false)))
      .toDF("p", "y")
    val bestCal = MlMetrics.temperatureScaling(cal, "p", "y")
      .filter(col("is_best")).head().getDouble(0)
    bestCal shouldBe 1.0
  }

  test("negativeSample: k draws per id minus self-collisions, pool membership, salt independence") {
    import graft.llm.PipelineOps
    val df = (1L to 200L).toDF("id")
    val s1 = PipelineOps.negativeSample(df, "id", k = 3,
      poolSize = 50, salt = "a").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2)))
    // every id yields 3 draws except when a draw hit itself
    val byId = s1.groupBy(_._1).view.mapValues(_.length).toMap
    byId.values.foreach(n => n should (be >= 2 and be <= 3))
    s1.count(_._2 == 1) should be >= 190 // few self-collisions
    // no self-negatives
    s1.foreach { case (id, _, neg) => neg should not be id }
    // negatives all come from the 50-id lottery pool
    s1.map(_._3).distinct.length should be <= 50
    // deterministic: identical second run
    val s2 = PipelineOps.negativeSample(df, "id", k = 3,
      poolSize = 50, salt = "a").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2)))
    s1.sorted.toSeq shouldBe s2.sorted.toSeq
    // a different salt draws a different sample
    val s3 = PipelineOps.negativeSample(df, "id", k = 3,
      poolSize = 50, salt = "b").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2)))
    s1.sorted.toSeq should not be s3.sorted.toSeq
  }

  test("pipelineFunnel: cumulative stage counts, ppm, token budget in one scan") {
    val df = Seq(
      (1L, 6L, true),  // passes both stages
      (2L, 3L, true),  // fails length band
      (3L, 10L, false), // fails flag stage
      (4L, 7L, true)   // passes both
    ).toDF("id", "tok", "flag")
    val rows = graft.llm.PipelineOps.pipelineFunnel(df, Seq(
      ("len", col("tok") >= 5L), ("flag", col("flag"))), col("tok"))
      .orderBy("stage_idx").collect()
    rows(0).getLong(2) shouldBe 4L // docs_in
    rows(0).getLong(3) shouldBe 3L // docs_out (len >= 5)
    rows(0).getLong(4) shouldBe 750000L
    rows(0).getLong(5) shouldBe 23L // 6+10+7
    rows(1).getLong(2) shouldBe 3L
    rows(1).getLong(3) shouldBe 2L
    rows(1).getLong(4) shouldBe 666666L // floor div
    rows(1).getLong(5) shouldBe 13L // 6+7
  }
}
