package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Loads the driver-provided parquet tables (TESTDATA.md). At cluster
  * scale the same call works on a directory of many files; Spark
  * parallelizes the scan over row-groups, so nothing here changes at
  * 100 TB — only the path does.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  /** Parquet TIMESTAMP(NANOS) is rejected by Spark's vectorized
    * reader; with spark.sql.legacy.parquet.nanosAsLong=true (set in
    * Verify/Bench sessions) it surfaces as epoch-nanos LongType. We
    * truncate to micros (integer div — exact on long) to restore
    * TimestampType, matching engines that read nanos natively and
    * then operate at micro precision. */
  def load(spark: SparkSession, dir: String, name: String): DataFrame = {
    val df = spark.read.parquet(s"$dir/$name.parquet")
    df.schema.fields.filter(f => f.name == "ts" &&
        f.dataType == LongType)
      .foldLeft(df)((d, f) =>
        d.withColumn(f.name, timestamp_micros(expr(s"${f.name} div 1000"))))
  }
}
