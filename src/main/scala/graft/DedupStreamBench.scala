package graft

import org.apache.spark.sql.functions._

/** Per-batch-cost probe for the streaming incremental corpus dedup
  * (StreamOps.streamingIncrementalDedup): feeds K batches of N
  * synthetic docs (deterministic word soup (collision-free mod-1000003 positional values), ~10% planted exact dups
  * and ~5% near-dups of EARLIER docs) through the file-source +
  * foreachBatch pipeline and prints each micro-batch's wall seconds.
  *
  * The claim under test is the 100 TB shape: because each batch
  * consults the corpus through its persisted hash/band side tables
  * (partition-pruned `batch < current` reads) and only bands ITSELF,
  * per-batch cost must stay ~FLAT as the corpus grows — a drifting
  * upward slope would mean an O(corpus)-per-batch term (the
  * quadratic trap). Prints one JSON line:
  * {"dedup_stream_bench":{"batch_secs":[...],"kept":n,"fed":n,...}}.
  *
  * Usage: runMain graft.DedupStreamBench [batches] [docsPerBatch]
  */
object DedupStreamBench {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.local(
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt)
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    val batches = args.headOption.map(_.toInt).getOrElse(10)
    val perBatch = args.drop(1).headOption.map(_.toInt).getOrElse(20000)

    val root = java.nio.file.Files
      .createTempDirectory("graft_dedup_stream_").toString
    val inDir = s"$root/in"
    val corpusDir = s"$root/corpus"; val ckpt = s"$root/ckpt"

    // deterministic 30-word docs; doc i: ~10% exact copy of an
    // earlier doc (i-7 % earlier), ~5% near-dup (last word changed)
    // of an earlier doc, rest unique
    def docsDf(b: Int) = {
      val base = b.toLong * perBatch
      spark.range(base, base + perBatch).select(
        col("id").as("doc_id"),
        {
          // FLAT concat_ws, not a nested concat fold: a 30-deep
          // nested expression tree made Catalyst's transformDown /
          // orderCommutative passes the bottleneck (100+ s of DRIVER
          // time per batch, caught by --phases + jstack)
          val uniqOf = (c: org.apache.spark.sql.Column) =>
            concat_ws(" ", (0 until 30).map(w =>
              concat(lit("w"), pmod(c * (w * 2 + 3) + w,
                lit(1000003)).cast("string"))): _*)
          val uniq = uniqOf(col("id"))
          val src = greatest(col("id") - 7 - pmod(col("id"), lit(13)), lit(0L))
          when(pmod(col("id"), lit(10)) === 0, uniqOf(src))
            .when(pmod(col("id"), lit(20)) === 1,
              concat(uniqOf(src), lit(" neartail")))
            .otherwise(uniq).as("text")
        })
    }

    val timings = scala.collection.mutable.ArrayBuffer[Double]()
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("doc_id",
        org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("text",
        org.apache.spark.sql.types.StringType)))

    def writeBatch(b: Int): Unit =
      docsDf(b).coalesce(4).write.mode("append").parquet(inDir)

    // --phases: run the same per-batch fold WITHOUT the streaming
    // machinery and print per-phase seconds — the tool that located
    // the capBuckets O(corpus) window (see SCALE.md round 10)
    if (args.contains("--phases")) {
      def now() = System.nanoTime()
      def secs(t0: Long) = f"${(System.nanoTime() - t0) / 1e9}%.2f"
      (0 until batches).foreach { b =>
        def prior(name: String): Option[org.apache.spark.sql.DataFrame] = {
          val p = new org.apache.hadoop.fs.Path(s"$corpusDir/$name")
          val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
          if (fs.exists(p)) Some(spark.read.parquet(p.toString)) else None
        }
        var t0 = now()
        val ph = prior("hashes"); val pb = prior("bands")
        val tPrior = secs(t0)
        t0 = now()
        val (kept, _, _) = graft.llm.Dedup.incrementalDedupStep(
          docsDf(b), "text", "doc_id", ph, pb)
        kept.write.mode("overwrite").parquet(s"$corpusDir/docs/batch=$b")
        val tStep = secs(t0)
        t0 = now()
        val keptR = spark.read.parquet(s"$corpusDir/docs/batch=$b")
        keptR.select(md5(col("text")).as("text_md5"))
          .write.mode("overwrite").parquet(s"$corpusDir/hashes/batch=$b")
        val tHash = secs(t0)
        t0 = now()
        graft.llm.Dedup.bandedSignatures(keptR, "text", "doc_id")
          .write.mode("overwrite").parquet(s"$corpusDir/bands/batch=$b")
        val tBand = secs(t0)
        println(s"PHASES b=$b prior=$tPrior step=$tStep " +
          s"hashes=$tHash bands=$tBand")
      }
      val kept = spark.read.parquet(s"$corpusDir/docs").count()
      println(s"PHASES kept=$kept")
      org.apache.commons.io.FileUtils
        .deleteDirectory(new java.io.File(root))
      spark.stop(); return
    }

    // --bucketed: side tables as bucketed catalog tables (the
    // billion-hash deployment shape) — same harness, same data, so
    // the per-batch traces compare directly against the parquet path
    val bucketed = args.contains("--bucketed")
    writeBatch(0)
    val q = graft.streaming.StreamOps.streamingIncrementalDedup(
      spark.readStream.schema(schema).parquet(inDir),
      "text", "doc_id", corpusDir, ckpt,
      bucketSideTables = if (bucketed) Some(32) else None,
      tablePrefix = "dedup_bench")
    try {
      var b = 0
      while (b < batches) {
        if (b > 0) writeBatch(b)
        val t0 = System.nanoTime()
        q.processAllAvailable()
        timings += (System.nanoTime() - t0) / 1e9
        b += 1
      }
    } finally q.stop()

    val kept = spark.read.parquet(s"$corpusDir/docs").count()
    val secs = timings.map(t => f"$t%.2f").mkString("[", ",", "]")
    println(s"""{"dedup_stream_bench":{"batch_secs":$secs,""" +
      s""""kept":$kept,"fed":${batches.toLong * perBatch},""" +
      s""""batches":$batches,"docs_per_batch":$perBatch,""" +
      s""""bucketed":$bucketed}}""")
    if (bucketed) {
      spark.sql("DROP TABLE IF EXISTS dedup_bench_hashes")
      spark.sql("DROP TABLE IF EXISTS dedup_bench_bands")
    }
    org.apache.commons.io.FileUtils
      .deleteDirectory(new java.io.File(root))
    spark.stop()
  }
}
