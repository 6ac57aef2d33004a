package graft

import org.apache.spark.sql.functions._
import graft.sqlext.JaroWinkler

/** Jaro-Winkler expression: known values (cross-checked bit-exact
  * against DuckDB's jaro_winkler_similarity), null/empty handling,
  * interpreted-vs-codegen parity, SQL registration. */
class JaroWinklerSpec extends SparkSpecBase {
  import spark.implicits._

  test("known values match the DuckDB-shared definition") {
    JaroWinkler.sim("martha".getBytes, "marhta".getBytes) shouldBe
      0.9611111111111111
    JaroWinkler.sim("dixon".getBytes, "dicksonx".getBytes) shouldBe
      0.8133333333333332 +- 1e-15
    JaroWinkler.sim("crate".getBytes, "trace".getBytes) shouldBe
      0.7333333333333333 +- 1e-15
    // below the 0.7 boost threshold: raw jaro, no prefix bonus
    JaroWinkler.sim("abcde".getBytes, "edcba".getBytes) shouldBe
      0.4666666666666666 +- 1e-15
    // DuckDB convention: empty side scores 0, even both-empty
    JaroWinkler.sim("".getBytes, "".getBytes) shouldBe 0.0
    JaroWinkler.sim("a".getBytes, "".getBytes) shouldBe 0.0
    JaroWinkler.sim("same".getBytes, "same".getBytes) shouldBe 1.0
  }

  test("column path matches the reference impl and handles nulls") {
    val df = Seq(("martha", "marhta"), ("dwayne", "duane"),
      (null, "x"), ("x", null)).toDF("a", "b")
    val got = df.select(JaroWinkler.jaro_winkler($"a", $"b")).collect()
    got(0).getDouble(0) shouldBe 0.9611111111111111
    got(1).getDouble(0) shouldBe 0.84 +- 1e-15
    got(2).isNullAt(0) shouldBe true
    got(3).isNullAt(0) shouldBe true
  }

  test("interpreted eval equals codegen over random strings") {
    val rnd = new scala.util.Random(7)
    val rows = Seq.fill(200)((rnd.alphanumeric.take(rnd.nextInt(12)).mkString,
      rnd.alphanumeric.take(rnd.nextInt(12)).mkString))
    val df = rows.toDF("a", "b")
    // codegen path (projection)
    val gen = df.select(JaroWinkler.jaro_winkler($"a", $"b"))
      .as[Double].collect()
    // reference scalar path
    val ref = rows.map { case (a, b) =>
      JaroWinkler.sim(a.getBytes, b.getBytes) }
    gen.toSeq shouldBe ref
  }

  test("SQL registration works") {
    JaroWinkler.register(spark)
    spark.sql("SELECT jaro_winkler('martha', 'marhta') AS jw")
      .as[Double].head() shouldBe 0.9611111111111111
  }
}
