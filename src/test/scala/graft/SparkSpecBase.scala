package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

/** One SparkSession shared by every spec in the forked test JVM. */
object TestSpark {
  lazy val spark: SparkSession = {
    val s = SparkSession.builder()
      .master("local[4]")
      .appName("graft-test")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      // the SQL-only deployment path under test in VerdictR8Spec:
      // the injector class name in the session config, exactly as
      // --conf spark.sql.extensions=... would set it
      .config("spark.sql.extensions",
        "graft.sqlext.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    s
  }
}

abstract class SparkSpecBase extends AnyFunSuite with Matchers {
  lazy val spark: SparkSession = TestSpark.spark
  import org.apache.spark.sql.DataFrame

  def approx(a: Double, b: Double, tol: Double = 1e-9): Unit =
    math.abs(a - b) should be <= tol

  def rows(df: DataFrame): Seq[Seq[Any]] =
    df.collect().toSeq.map(_.toSeq)
}
