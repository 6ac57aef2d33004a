package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}

/** Loads the driver-provided parquet tables (TESTDATA.md). At cluster
  * scale the same call works on a directory of many files; Spark
  * parallelizes the scan over row-groups, so nothing here changes at
  * 100 TB — only the path does.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  /** Normalizes the `ts` column to TimestampType regardless of how the
    * driver generated it:
    *  - Parquet TIMESTAMP(NANOS) is rejected by Spark's vectorized
    *    reader; with spark.sql.legacy.parquet.nanosAsLong=true (set in
    *    Verify/Bench sessions) it surfaces as epoch-nanos LongType and
    *    is truncated to micros (integer div — exact on long).
    *  - Parquet TIMESTAMP(MICROS, isAdjustedToUTC=false) surfaces as
    *    TimestampNTZType, which rejects unix_micros/numeric casts; the
    *    session timezone is pinned to UTC, so a cast to TimestampType
    *    is value-preserving.
    */
  def load(spark: SparkSession, dir: String, name: String): DataFrame = {
    val df = spark.read.parquet(s"$dir/$name.parquet")
    df.schema.fields.filter(_.name == "ts").foldLeft(df) { (d, f) =>
      f.dataType match {
        case LongType =>
          d.withColumn(f.name, timestamp_micros(expr(s"${f.name} div 1000")))
        case TimestampNTZType =>
          d.withColumn(f.name, col(f.name).cast(TimestampType))
        case _ => d
      }
    }
  }
}
