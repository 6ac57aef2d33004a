package graft

import org.apache.spark.sql.functions._
import graft.llm.Similarity

/** Int8 scalar quantization + asymmetric-distance ANN. */
class QuantizeSpec extends SparkSpecBase {
  import spark.implicits._

  // deterministic synthetic embeddings: 8 dims, varied scales per dim
  private def vecs(n: Int): Seq[(Long, Seq[Float])] =
    (0 until n).map { i =>
      (i.toLong, (0 until 8).map { d =>
        val raw = math.sin(i * 0.7 + d * 1.3) * (d + 1)
        raw.toFloat
      })
    }

  test("quantizeInt8: codes bounded, dims preserved, constant dim -> 0") {
    val df = vecs(50).toDF("id", "v")
      .withColumn("v", concat(col("v"), array(lit(2.5f)))) // constant dim
    val q = Similarity.quantizeInt8(df, "v", "id")
    val rows = q.select("id", "codes").collect()
    rows.length shouldBe 50
    rows.foreach { r =>
      val codes = r.getSeq[Int](1)
      codes.length shouldBe 9
      all(codes) should be >= 0
      all(codes) should be <= 255
      codes.last shouldBe 0 // constant dimension
    }
    // extremes hit the rails: some dim reaches 0 and 255 over the set
    val flat = rows.flatMap(_.getSeq[Int](1).dropRight(1))
    flat.min shouldBe 0
    flat.max shouldBe 255
  }

  test("quantizedTopK approximates brute-force cosine top-k") {
    val data = vecs(200)
    val df = data.toDF("id", "v")
    val query = data(7)._2
    val exact = Similarity.bruteForceTopK(df.filter(col("id") =!= 7),
      "v", "id", query, 10).collect().map(_.getLong(0)).toSet
    val approx = Similarity.quantizedTopK(df.filter(col("id") =!= 7),
      "v", "id", query, 10).collect()
    val approxIds = approx.map(_.getLong(0)).toSet
    // 8-bit quantization on 8 dims: recall@10 should be high
    (exact intersect approxIds).size should be >= 7
    // scores are valid cosines
    approx.foreach { r =>
      val c = r.getAs[Double]("qcosine")
      c should be <= 1.000001
      c should be >= -1.000001
    }
  }
}
