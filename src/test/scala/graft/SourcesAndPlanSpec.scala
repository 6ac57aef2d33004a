package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import graft.sources.{Excel, Sources}

/** IO round-trips (§2.1) and physical-plan properties that carry the
  * 100 TB story: predicate pushdown, column pruning, broadcast joins.
  * Plan assertions keep refactors honest — if a change stops filters
  * reaching the parquet scan, these fail. */
class SourcesAndPlanSpec extends SparkSpecBase {
  import spark.implicits._

  private def tmp(prefix: String): String =
    Files.createTempDirectory(prefix).toString

  private val df3 = Seq((1L, "a", 1.5), (2L, "b", 2.5), (3L, "c", 3.5))
    .toDF("id", "s", "v")

  test("csv round-trip with header and inferred schema") {
    val dir = tmp("graft_csv")
    Sources.writeCsv(df3, dir)
    val back = Sources.readCsv(spark, dir)
    back.columns shouldBe Array("id", "s", "v")
    back.count() shouldBe 3
    back.schema("id").dataType.typeName shouldBe "integer" // inferred
    back.filter($"s" === "b").select("v").as[Double].head() shouldBe 2.5
  }

  test("json-records round-trip") {
    val dir = tmp("graft_json")
    Sources.writeJsonRecords(df3, dir)
    val back = Sources.readJsonRecords(spark, dir)
    back.count() shouldBe 3
    back.filter($"id" === 3).select("s").as[String].head() shouldBe "c"
  }

  test("json-columns orientation round-trip") {
    val dir = tmp("graft_json_cols")
    val df = Seq((0L, 1.5, "a"), (1L, 2.5, "b"), (2L, 3.5, "c"))
      .toDF("idx", "x", "s")
    Sources.writeJsonColumns(df, dir, "idx", Seq("x", "s"))
    val back = Sources.readJsonColumns(spark, dir)
      .orderBy("__idx__")
    back.columns.sorted shouldBe Array("__idx__", "s", "x")
    back.count() shouldBe 3
    back.filter($"__idx__" === 1).select("x").as[Double].head() shouldBe 2.5
    back.filter($"__idx__" === 2).select("s").as[String].head() shouldBe "c"
  }

  test("xlsx round-trip: types, nulls, escaping, shared-string read") {
    val path = tmp("graft_xlsx") + ".xlsx"
    val df = Seq(
      (1L, Some(1.5), "plain"),
      (2L, None, "needs <escaping> & \"quotes\""),
      (3L, Some(-2.25), "third")
    ).toDF("id", "x", "s")
    Excel.writeXlsx(df, path)
    val back = Excel.readXlsx(spark, path).orderBy("id")
    back.columns shouldBe Array("id", "x", "s")
    back.count() shouldBe 3
    back.schema("id").dataType shouldBe
      org.apache.spark.sql.types.DoubleType // xlsx numbers are doubles
    val r2 = back.filter($"id" === 2.0).head()
    r2.isNullAt(1) shouldBe true
    r2.getString(2) shouldBe "needs <escaping> & \"quotes\""
    back.filter($"id" === 3.0).select("x").as[Double].head() shouldBe -2.25

    // shared-strings variant (what real Excel emits): craft one by hand
    val ssPath = tmp("graft_xlsx_ss") + ".xlsx"
    writeSharedStringXlsx(ssPath)
    val ss = Excel.readXlsx(spark, ssPath).orderBy("v")
    ss.columns shouldBe Array("name", "v")
    ss.select("name").as[String].collect() shouldBe Array("alpha", "beta")
  }

  test("xlsx edge cases: empty frame and >26 columns") {
    import org.apache.spark.sql.types._
    // header-only round trip
    val empty = spark.createDataFrame(
      spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
      StructType(Seq(StructField("a", LongType), StructField("b", StringType))))
    val p1 = tmp("graft_xlsx_empty") + ".xlsx"
    Excel.writeXlsx(empty, p1)
    val backEmpty = Excel.readXlsx(spark, p1)
    backEmpty.columns shouldBe Array("a", "b")
    backEmpty.count() shouldBe 0
    // 30 columns crosses the Z -> AA boundary
    val wide = spark.range(1).select(
      (0 until 30).map(i => lit(i.toDouble).as(s"c$i")): _*)
    val p2 = tmp("graft_xlsx_wide") + ".xlsx"
    Excel.writeXlsx(wide, p2)
    val backWide = Excel.readXlsx(spark, p2)
    backWide.columns.length shouldBe 30
    backWide.head().getDouble(29) shouldBe 29.0
  }

  private def writeSharedStringXlsx(path: String): Unit = {
    import java.util.zip.{ZipEntry, ZipOutputStream}
    val zos = new ZipOutputStream(new java.io.FileOutputStream(path))
    def put(name: String, content: String): Unit = {
      zos.putNextEntry(new ZipEntry(name)); zos.write(content.getBytes("UTF-8")); zos.closeEntry()
    }
    put("[Content_Types].xml",
      """<?xml version="1.0"?><Types xmlns="http://schemas.openxmlformats.org/package/2006/content-types"><Default Extension="rels" ContentType="application/vnd.openxmlformats-package.relationships+xml"/><Default Extension="xml" ContentType="application/xml"/><Override PartName="/xl/workbook.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.sheet.main+xml"/><Override PartName="/xl/worksheets/sheet1.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.worksheet+xml"/></Types>""")
    put("_rels/.rels",
      """<?xml version="1.0"?><Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships"><Relationship Id="rId1" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/officeDocument" Target="xl/workbook.xml"/></Relationships>""")
    put("xl/workbook.xml",
      """<?xml version="1.0"?><workbook xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main"><sheets><sheet name="S" sheetId="1"/></sheets></workbook>""")
    put("xl/sharedStrings.xml",
      """<?xml version="1.0"?><sst xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main" count="4" uniqueCount="4"><si><t>name</t></si><si><t>v</t></si><si><t>alpha</t></si><si><t>beta</t></si></sst>""")
    put("xl/worksheets/sheet1.xml",
      """<?xml version="1.0"?><worksheet xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main"><sheetData><row r="1"><c r="A1" t="s"><v>0</v></c><c r="B1" t="s"><v>1</v></c></row><row r="2"><c r="A2" t="s"><v>2</v></c><c r="B2"><v>1</v></c></row><row r="3"><c r="A3" t="s"><v>3</v></c><c r="B3"><v>2</v></c></row></sheetData></worksheet>""")
    zos.close()
  }

  test("parquet round-trip with compression codecs") {
    for (codec <- Seq("snappy", "gzip", "zstd")) {
      val dir = tmp(s"graft_pq_$codec")
      Sources.writeParquet(df3, dir, codec)
      Sources.readParquet(spark, dir).count() shouldBe 3
    }
  }

  test("orc round-trip with pushdown reaching the scan") {
    val dir = tmp("graft_orc")
    Sources.writeOrc(df3, dir)
    val back = Sources.readOrc(spark, dir)
    back.count() shouldBe 3
    val plan = back.filter($"id" > 1).select("id")
      .queryExecution.executedPlan.toString
    plan should include("PushedFilters")
    plan should include("ReadSchema: struct<id:")
  }

  test("parquetStats computes row count and column min/max/nulls") {
    val dir = tmp("graft_pqstats")
    Sources.writeParquet(df3, dir)
    val r = Sources.parquetStats(spark, dir, Seq("id", "v")).head()
    r.getAs[Long]("row_count") shouldBe 3L
    r.getAs[Long]("id_min") shouldBe 1L
    r.getAs[Long]("id_max") shouldBe 3L
    r.getAs[Long]("id_nulls") shouldBe 0L
  }

  test("filters and projections are pushed to the parquet scan") {
    val plan = queries.Q.t(spark, "/root/testdata/sf0.001", "lineitem")
      .filter($"l_quantity" < 10 && $"l_shipdate" > lit("1995-06-01"))
      .select("l_orderkey", "l_quantity")
      .queryExecution.executedPlan.toString
    plan should include("PushedFilters")
    plan should include("LessThan(l_quantity,10.0)")
    // column pruning: scan schema limited to referenced columns
    plan should include("l_orderkey")
    (plan should not).include("l_extendedprice")
  }

  test("jsonNormalize flattens nested structs to dotted columns") {
    import org.apache.spark.sql.types._
    val df = Seq(
      (1L, """{"a": 7, "b": {"c": "x", "d": {"e": 2.5}}}"""),
      (2L, """{"a": 9, "b": {"c": "y", "d": {"e": -1.0}}}"""),
      (3L, """not json""")).toDF("id", "payload")
    val schema = StructType(Seq(
      StructField("a", LongType),
      StructField("b", StructType(Seq(
        StructField("c", StringType),
        StructField("d", StructType(Seq(StructField("e", DoubleType)))))))))
    val out = Sources.jsonNormalize(df, "payload", schema)
    out.columns.toSeq shouldBe Seq("id", "a", "b.c", "b.d.e")
    val r = out.orderBy("id").collect()
    r(0).toSeq shouldBe Seq(1L, 7L, "x", 2.5)
    r(1).toSeq shouldBe Seq(2L, 9L, "y", -1.0)
    // malformed JSON yields nulls, not a failure
    r(2).isNullAt(1) shouldBe true
  }

  test("partitioned writes prune to the matching directories on read") {
    val dir = s"/tmp/graft_part_${System.nanoTime()}"
    val df = queries.Q.t(spark, "/root/testdata/sf0.001", "documents")
      .select($"doc_id", $"source", $"n_chars")
    Sources.writePartitioned(df, dir, Seq("source"))
    val back = spark.read.parquet(dir).filter($"source" === "src0")
    // partition pruning happens at the scan: the predicate moves into
    // PartitionFilters (directory elimination), not PushedFilters
    val scan = back.queryExecution.executedPlan.toString
    scan should include("PartitionFilters")
    scan should include("(source")
    // and the pruned read is still correct
    back.count() shouldBe df.filter($"source" === "src0").count()
    val expected = df.filter($"source" === "src0")
      .agg(org.apache.spark.sql.functions.sum("n_chars"))
      .collect()(0).getLong(0)
    back.agg(org.apache.spark.sql.functions.sum("n_chars"))
      .collect()(0).getLong(0) shouldBe expected
  }

  test("bucketed tables join without a shuffle exchange") {
    val a = (1 to 1000).map(i => (i.toLong, i * 2.0)).toDF("k", "va")
    val b = (1 to 1000).map(i => (i.toLong, i * 3.0)).toDF("k", "vb")
    Sources.writeBucketed(a, "graft_bucket_a", Seq("k"), 8)
    Sources.writeBucketed(b, "graft_bucket_b", Seq("k"), 8)
    val joined = spark.table("graft_bucket_a")
      .join(spark.table("graft_bucket_b"), "k")
    // disable broadcast so the co-located path is what gets planned
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val plan = joined.queryExecution.executedPlan.toString
      plan should include("SortMergeJoin")
      (plan should not).include("Exchange hashpartitioning")
      joined.count() shouldBe 1000
    } finally {
      spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
      spark.sql("DROP TABLE IF EXISTS graft_bucket_a")
      spark.sql("DROP TABLE IF EXISTS graft_bucket_b")
    }
  }

  test("dbscan / knn-lof candidate joins are equi-joins, never cross") {
    import org.apache.spark.sql.catalyst.plans.Cross
    import org.apache.spark.sql.catalyst.plans.logical.Join
    def crossJoins(df: org.apache.spark.sql.DataFrame) =
      df.queryExecution.optimizedPlan.collect {
        case j: Join if j.joinType == Cross => j
      }
    val pts = (1L to 60L).map(i =>
      (i, (i % 10) * 1.0, (i % 7) * 1.0)).toDF("id", "x", "y")
    crossJoins(graft.ml.Clustering.dbscan(pts, Seq("x", "y"), "id",
      eps = 0.5, minPts = 3)) shouldBe empty
    val vecs = (1L to 40L).map(i =>
      (i, Seq.tabulate(4)(d => ((i + d) % 5).toFloat))).toDF("id", "v")
    // LSH-bucketed kNN graph: the pair join carries the bucket
    // equi-condition, so no cross product even before filtering
    crossJoins(graft.llm.Similarity.lof(vecs, "v", "id", k = 3,
      planes = 4)) shouldBe empty
  }

  test("small dimension joins plan as broadcast") {
    val plan = queries.QueriesCore
      .queries("q03_join_revenue_by_nation")(spark, "/root/testdata/sf0.001")
      .queryExecution.executedPlan.toString
    plan should include("BroadcastHashJoin")
  }

  test("top-k plans as TakeOrderedAndProject, not a global sort") {
    import graft.ops.PandasOps._
    val plan = queries.Q.t(spark, "/root/testdata/sf0.001", "orders")
      .nlargest(10, "o_totalprice", "o_orderkey")
      .queryExecution.executedPlan.toString
    plan should include("TakeOrderedAndProject")
  }

  test("aucRoc windows run per range bucket, never globally") {
    import org.apache.spark.sql.execution.window.WindowExec
    val df = (1L to 200L).map(i => (i % 37, i % 3 == 0))
      .toDF("score", "y")
    val plan = graft.ml.MlMetrics.aucRoc(df, "score", "y")
      .queryExecution.executedPlan
    // every window operator must be partitioned (the range-bucket
    // key) — an empty partitionSpec would be a global single-
    // partition sort over the distinct-score table
    plan.collect { case w: WindowExec => w }
      .foreach(w => w.partitionSpec should not be empty)
  }

  test("dsirWeights broadcasts the bucket log-ratio table") {
    val docs = (1L to 50L).map(i =>
      (i, s"alpha beta gamma doc$i word${i % 7}", i % 5 == 0))
      .toDF("id", "text", "is_t")
    val plan = graft.llm.CorpusOps
      .dsirWeights(docs, "text", "id", "is_t")
      .queryExecution.executedPlan.toString
    plan should include("BroadcastHashJoin")
  }

  test("jdbc round-trip against embedded Derby (write, read, " +
      "partitioned parallel read)") {
    // Derby ships in the Spark jars dir, so the JDBC source is
    // testable with zero extra dependencies: write -> read back ->
    // partitioned read with a split column
    // keep Derby's derby.log out of the repo root
    System.setProperty("derby.stream.error.file", "target/derby.log")
    val dbDir = tmp("graft_derby") + "/db"
    val url = s"jdbc:derby:$dbDir;create=true"
    val props = new java.util.Properties()
    props.setProperty("driver", "org.apache.derby.jdbc.EmbeddedDriver")
    val df = (1L to 100L).map(i => (i, s"name_$i", i * 2.5))
      .toDF("id", "s", "v")
    Sources.writeJdbc(df, url, "t1", props)
    val back = Sources.readJdbc(spark, url, "t1", props)
    back.count() shouldBe 100
    back.filter($"id" === 42L).select("s").as[String].head() shouldBe
      "name_42"
    // partitioned read: 4 parallel range splits over id
    val part = Sources.readJdbc(spark, url, "t1", props,
      partitionCol = Some(("id", 1L, 100L, 4)))
    part.rdd.getNumPartitions shouldBe 4
    part.agg(org.apache.spark.sql.functions.sum($"v"))
      .as[Double].head() shouldBe (2.5 * 5050.0 +- 1e-6)
    // append mode accumulates
    Sources.writeJdbc(df.limit(5), url, "t1", props)
    Sources.readJdbc(spark, url, "t1", props).count() shouldBe 105
  }

  test("zipfFit top-K plans as TakeOrderedAndProject") {
    val docs = Seq("a b c a b a", "c d e a b").toDF("text")
    val plan = graft.llm.CorpusOps.zipfFit(docs, "text", topK = 3)
      .queryExecution.executedPlan.toString
    plan should include("TakeOrderedAndProject")
  }
}
