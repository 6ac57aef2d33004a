package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Shared helpers for the driver-verified query suite.
  *
  * Oracle-determinism rules (DuckDB hash-match, see SURVEY §7.5):
  *  - money aggregates go through per-row scaled integers
  *    (`cents`) so sums are exact and independent of FP summation
  *    order in either engine;
  *  - integer-ish outputs are cast to BIGINT on both sides;
  *  - derived doubles are computed from exact integer aggregates with
  *    the identical formula (same association order) on both sides.
  */
object Q {
  type QueryFn = (SparkSession, String) => DataFrame

  def t(s: SparkSession, dir: String, name: String): DataFrame =
    graft.Tables.load(s, dir, name)

  /** per-row exact scaled-integer money: round(x*100) as long. */
  def cents(c: Column): Column = round(c * 100).cast("long")

  def dbl(c: Column): Column = c.cast("double")
}
