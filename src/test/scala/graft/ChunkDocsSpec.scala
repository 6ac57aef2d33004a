package graft

import graft.llm.CorpusOps

/** Context-window chunking with overlap (training-data prep; the
  * splitting dual of sequence packing). */
class ChunkDocsSpec extends SparkSpecBase {
  import spark.implicits._

  private def doc(n: Int) =
    Seq((1L, (1 to n).map(i => s"w$i").mkString(" "))).toDF("id", "text")

  test("short document yields a single whole chunk") {
    val out = CorpusOps.chunkDocs(doc(5), "text", "id", 8, 2).collect()
    out.length shouldBe 1
    out(0).getAs[Long]("start_tok") shouldBe 0L
    out(0).getAs[Long]("n_tokens") shouldBe 5L
    out(0).getAs[String]("chunk") shouldBe "w1 w2 w3 w4 w5"
  }

  test("chunks step by size minus overlap and cover every token") {
    // 20 tokens, chunk 8, overlap 2 -> starts 0, 6, 12 (12+8 = 20
    // covers the tail exactly; no fourth chunk)
    val out = CorpusOps.chunkDocs(doc(20), "text", "id", 8, 2)
      .orderBy("chunk_id").collect()
    out.map(_.getAs[Long]("start_tok")).toSeq shouldBe Seq(0L, 6L, 12L)
    out.map(_.getAs[Long]("n_tokens")).toSeq shouldBe Seq(8L, 8L, 8L)
    out(1).getAs[String]("chunk") shouldBe
      "w7 w8 w9 w10 w11 w12 w13 w14"
    out(2).getAs[String]("chunk") shouldBe
      "w13 w14 w15 w16 w17 w18 w19 w20"
    // 21 tokens -> a short tail chunk appears at start 18
    val out2 = CorpusOps.chunkDocs(doc(21), "text", "id", 8, 2)
      .orderBy("chunk_id").collect()
    out2.map(_.getAs[Long]("start_tok")).toSeq shouldBe
      Seq(0L, 6L, 12L, 18L)
    out2(3).getAs[Long]("n_tokens") shouldBe 3L
    out2(3).getAs[String]("chunk") shouldBe "w19 w20 w21"
  }

  test("consecutive chunks share exactly the overlap tokens") {
    val out = CorpusOps.chunkDocs(doc(14), "text", "id", 8, 4)
      .orderBy("chunk_id").collect()
    val c0 = out(0).getAs[String]("chunk").split(" ")
    val c1 = out(1).getAs[String]("chunk").split(" ")
    c0.takeRight(4).toSeq shouldBe c1.take(4).toSeq
  }

  test("boundary: exact-size document stays one chunk") {
    val out = CorpusOps.chunkDocs(doc(8), "text", "id", 8, 2).collect()
    out.length shouldBe 1
    // one more token spills a second chunk
    val out2 = CorpusOps.chunkDocs(doc(9), "text", "id", 8, 2).collect()
    out2.length shouldBe 2
  }
}
