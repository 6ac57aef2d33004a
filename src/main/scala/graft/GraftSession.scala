package graft

import org.apache.spark.sql.SparkSession

/** One place for the session settings the library depends on, so
  * user code, the mains, and the specs cannot drift:
  *
  *  - `spark.sql.legacy.parquet.nanosAsLong` — required to read
  *    TIMESTAMP(NANOS) parquet (`Tables.load` rebuilds micros);
  *  - UTC session timezone — all datetime semantics and the DuckDB
  *    oracle comparisons assume it;
  *  - shuffle partitions sized to the core count, not the 200
  *    default — on a real cluster size to ~2-3× total cores and let
  *    AQE coalesce (see SCALE.md);
  *  - AQE on — runtime re-planning (skew splits, broadcast demotion)
  *    is part of the 100 TB design.
  */
object GraftSession {

  def builder(master: String, shufflePartitions: Int,
      extensions: Boolean = false): SparkSession.Builder = {
    val b = SparkSession.builder()
      .master(master)
      .config("spark.sql.shuffle.partitions", shufflePartitions.toString)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.warehouse.dir", "target/spark-warehouse")
      .config("spark.ui.enabled", "false")
      // scan-parallelism FLOOR tied to the session's core count
      // (guide §6): a table that fits in one <128 MB parquet file
      // arrives as ONE scan split, so every map-heavy plan over it
      // (regex URL parses, md5 lotteries, codecs) runs on one core
      // regardless of cluster width. minPartitionNum makes the scan
      // split such files; at real scale the floor is inert (inputs
      // already carry more splits than cores). Scale-adaptive by
      // construction — derived from the requested parallelism, not a
      // constant tuned to this box.
      .config("spark.sql.files.minPartitionNum",
        shufflePartitions.toString)
    if (extensions)
      b.config("spark.sql.extensions",
        classOf[graft.sqlext.GraftExtensions].getName)
    else b
  }

  /** local[cores] session for the mains and ad-hoc use. */
  def local(cores: Int, extensions: Boolean = false): SparkSession = {
    val s = builder(s"local[$cores]", cores, extensions).getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
}
