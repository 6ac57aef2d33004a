package graft

import org.apache.spark.sql.SparkSession

/** Plan-audit utility: prints the executed physical plan of the named
  * `SparkEntry.queries` (all flagship bench queries if none given) so
  * shuffle/broadcast/pushdown shape can be reviewed per SCALE.md.
  * Usage: runMain graft.Explain [sfDir] q01_groupby_agg ...
  */
object Explain {
  def main(args: Array[String]): Unit = {
    val (dir, names) =
      if (args.nonEmpty && args.head.startsWith("/"))
        (args.head, args.tail.toSeq)
      else ("/root/testdata/sf0.01", args.toSeq)
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .appName("graft-explain").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val qs = if (names.nonEmpty) names else SparkEntry.queries.keys.toSeq.sorted
    qs.foreach { q =>
      println(s"===== $q")
      println(SparkEntry.queries(q)(spark, dir).queryExecution.executedPlan)
    }
    spark.stop()
  }
}
