package graft

/** Targeted timing harness: time only the queries named on the command
  * line (min of 3 steady-state runs each, same session settings as
  * Bench's flagship ops). For plan iteration during development —
  * the graded benchmark remains graft.Bench. */
object BenchOne {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val spark = GraftSession.local(cpus)
    spark.conf.set("spark.sql.adaptive.enabled", true)
    args.foreach { name =>
      val fn = SparkEntry.queries(name)
      fn(spark, sfDir).count() // warm-up: codegen + file listing
      val ts = (1 to 3).map { _ =>
        val t0 = System.nanoTime()
        fn(spark, sfDir).count()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"BENCHONE $name min=${ts.min}%.3f runs=${ts.map(t => f"$t%.3f").mkString(",")}")
    }
    spark.stop()
  }
}
