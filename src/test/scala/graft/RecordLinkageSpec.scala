package graft

import graft.analytics.RecordLinkage

/** Fellegi-Sunter linkage pinned against exact hand-computed weights
  * (m/u chosen so the log2 weights are exact integers). */
class RecordLinkageSpec extends SparkSpecBase {
  import spark.implicits._

  test("blockPairs: ordered within-block pairs; hot block dropped") {
    val df = (Seq((1, "x"), (2, "x"), (3, "x")) ++
      (4 to 9).map(i => (i, "y"))).toDF("id", "blk")
    val pairs = RecordLinkage.blockPairs(df, "id", Seq("blk"),
      maxBlock = 5)
    val got = pairs.select("l_id", "r_id").as[(Int, Int)]
      .collect().sorted.toSeq
    got shouldBe Seq((1, 2), (1, 3), (2, 3)) // block y (6 rows) gone
  }

  test("fellegiSunter: exact weights, decision bands, null=0") {
    // m=0.8, u=0.2 -> agree log2(4) = +2, disagree log2(1/4) = -2
    val fields = Seq(("f1", 0.8, 0.2), ("f2", 0.8, 0.2))
    val pairs = Seq(
      (1, Some(true), Some(true)),   // +4 -> match
      (2, Some(true), Some(false)),  //  0 -> possible
      (3, Some(false), Some(false)), // -4 -> non_match
      (4, None, Some(true))          // +2 -> possible
    ).toDF("id", "f1", "f2")
    val out = RecordLinkage.fellegiSunter(pairs, fields,
        upper = 3.0, lower = -1.0)
      .select("id", "fs_score", "fs_class")
      .as[(Int, Double, String)].collect().sortBy(_._1).toSeq
    val want = Seq((1, 4.0, "match"), (2, 0.0, "possible"),
      (3, -4.0, "non_match"), (4, 2.0, "possible"))
    out.map(_._1) shouldBe want.map(_._1)
    out.map(_._3) shouldBe want.map(_._3)
    // log(4)/log(2) is 2.0 only to ~1 ulp — tolerance, not equality
    for ((g, w) <- out.map(_._2).zip(want.map(_._2)))
      g shouldBe w +- 1e-12
  }

  test("entityIds: min-label clustering over match pairs") {
    val pairs = Seq((2, 1), (2, 3), (10, 11), (3, 4))
      .toDF("a", "b")
    val got = RecordLinkage.entityIds(pairs, "a", "b", rounds = 3)
      .as[(Int, Int)].collect().toMap
    got shouldBe Map(1 -> 1, 2 -> 1, 3 -> 1, 4 -> 1, 10 -> 10,
      11 -> 10)
  }

  test("weight helpers match the closed forms") {
    RecordLinkage.agreeWeight(0.9, 0.1) shouldBe
      (math.log(9.0) / math.log(2.0)) +- 1e-15
    RecordLinkage.disagreeWeight(0.9, 0.1) shouldBe
      (math.log(0.1 / 0.9) / math.log(2.0)) +- 1e-15
    an[IllegalArgumentException] should be thrownBy
      RecordLinkage.fellegiSunter(Seq((1, true)).toDF("id", "f"),
        Seq(("f", 0.2, 0.8)), 1.0, 0.0) // m <= u rejected
  }
}
