package graft

import org.scalacheck.{Gen, Properties}
import org.scalacheck.Prop.forAll

import graft.llm.CorpusOps
import graft.ml.{MlOps, ModelSelection}
import graft.stats.StatsOps

/** ScalaCheck invariants for the round-4 operators: laws that must
  * hold for any input regardless of partitioning. */
object PropertiesR4Spec extends Properties("graft-r4") {

  private lazy val spark = TestSpark.spark
  import spark.implicits._
  import org.apache.spark.sql.functions._

  property("chunkDocs covers every token contiguously, no gaps") =
    forAll(Gen.chooseNum(1, 120), Gen.chooseNum(2, 16),
      Gen.chooseNum(0, 8)) { (n, ct, ov0) =>
      val ov = math.min(ov0, ct - 1)
      val text = (1 to n).map(i => s"t$i").mkString(" ")
      val chunks = CorpusOps.chunkDocs(Seq((1L, text)).toDF("id", "t"),
          "t", "id", ct, ov)
        .orderBy("chunk_id")
        .select("start_tok", "n_tokens").collect()
        .map(r => (r.getLong(0), r.getLong(1)))
      val step = ct - ov
      val starts = chunks.map(_._1)
      val covered = chunks.flatMap { case (s, len) => s until (s + len) }
        .toSet
      starts.head == 0L &&
        starts.zip(starts.tail).forall { case (a, b) => b - a == step } &&
        covered == (0L until n).toSet &&
        chunks.forall { case (s, len) => len == math.min(ct, n - s) }
    }

  property("foldOf is deterministic and lands in [0, k)") =
    forAll(Gen.listOfN(40, Gen.alphaNumStr.suchThat(_.nonEmpty)),
      Gen.chooseNum(2, 10)) { (keys, k) =>
      val df = keys.distinct.toDF("key")
      val folds = df.select(ModelSelection.foldOf(col("key"), k, "s")
        .as("f")).collect().map(_.getInt(0))
      val again = df.select(ModelSelection.foldOf(col("key"), k, "s")
        .as("f")).collect().map(_.getInt(0))
      folds.forall(f => f >= 0 && f < k) && folds.sameElements(again)
    }

  property("trimmedMean lies within [min, max] and k = floor(frac*n)") =
    forAll(Gen.listOfN(30, Gen.chooseNum(-500L, 500L)),
      Gen.chooseNum(0.0, 0.45)) { (vs, frac) =>
      val r = StatsOps.trimmedMean(vs.toDF("v"), "v", frac).collect()(0)
      val tm = r.getAs[Double]("trimmed_mean")
      r.getAs[Long]("n") == vs.size &&
        r.getAs[Long]("k_each") == math.floor(frac * vs.size).toLong &&
        tm >= vs.min.toDouble && tm <= vs.max.toDouble
    }

  property("jsonNormalize inverts to_json(struct) exactly") =
    forAll(Gen.listOfN(15, for {
      a <- Gen.chooseNum(-1000L, 1000L)
      c <- Gen.alphaNumStr.map(_.take(8))
      e <- Gen.chooseNum(-100, 100).map(_ / 4.0)
    } yield (a, c, e))) { rows =>
      import org.apache.spark.sql.types._
      val df = rows.toDF("a", "c", "e")
      val js = df.select(to_json(struct(col("a"),
        struct(col("c"), col("e")).as("b"))).as("payload"))
      val schema = StructType(Seq(
        StructField("a", LongType),
        StructField("b", StructType(Seq(
          StructField("c", StringType),
          StructField("e", DoubleType))))))
      val back = graft.sources.Sources.jsonNormalize(js, "payload",
          schema)
        .select(col("a"), col("`b.c`").as("c"), col("`b.e`").as("e"))
        .collect().map(r => (r.getLong(0), r.getString(1),
          r.getDouble(2))).sorted
      back.toSeq == rows.sorted
    }

  property("betweenTime range and its complement partition the rows") =
    forAll(Gen.listOfN(25, Gen.chooseNum(0, 86399)),
      Gen.chooseNum(0, 86398), Gen.chooseNum(0, 86398)) {
      (secsOfDay, s0, e0) =>
      val fmt = (s: Int) => f"${s / 3600}%02d:${s % 3600 / 60}%02d:${s % 60}%02d"
      val df = secsOfDay.map(s =>
        java.sql.Timestamp.valueOf(s"2024-05-05 ${fmt(s)}")).toDF("ts")
      val (s, e) = (s0, e0)
      // degenerate: when e = s-1 (mod day) the range is the whole day
      // and the "complement" is too — skip that single configuration
      if ((e + 1) % 86400 == s) true
      else {
        // complement of [s, e] in seconds-of-day is [e+1, s-1] (wrap)
        val inRange = df.filter(graft.functions.DtOps.betweenTime(
          col("ts"), fmt(s), fmt(e))).count()
        val comp = df.filter(graft.functions.DtOps.betweenTime(
          col("ts"), fmt((e + 1) % 86400), fmt((s + 86399) % 86400)))
          .count()
        inRange + comp == secsOfDay.size
      }
    }

  property("imputeByGroup preserves rows and leaves no nulls behind") =
    forAll(Gen.listOfN(30, for {
      k <- Gen.oneOf("a", "b", "c")
      v <- Gen.option(Gen.chooseNum(-100L, 100L))
    } yield (k, v)).suchThat(_.exists(_._2.isDefined))) { rows =>
      val df = rows.toDF("k", "v")
      val out = MlOps.imputeByGroup(df, "v", Seq("k"))
      out.count() == rows.size &&
        out.filter(col("v").isNull).count() == 0L
    }
}
