package graft.sqlext

import org.apache.spark.sql.{Column, GraftSqlBridge, SparkSession}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression: 64-bit polynomial rolling hash of a
  * string (document fingerprinting, reference north-star text ops).
  * Demonstrates the preferred extension path of SURVEY §7.3 — a
  * codegen'd `Expression` stays inside whole-stage codegen where a
  * Scala UDF would break the pipeline and pay serialization per row.
  *
  * h = fold(h*31 + byte) over UTF-8 bytes, h0 = 1125899906842597.
  */
case class RollingHash64(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType
  override def prettyName: String = "rolling_hash64"

  override def nullSafeEval(input: Any): Any = {
    val bytes = input.asInstanceOf[UTF8String].getBytes
    var h = 1125899906842597L
    var i = 0
    while (i < bytes.length) { h = 31L * h + bytes(i); i += 1 }
    java.lang.Long.valueOf(h)
  }

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val bytes = ctx.freshName("bytes")
      val h = ctx.freshName("h")
      val i = ctx.freshName("i")
      s"""
         |byte[] $bytes = $c.getBytes();
         |long $h = 1125899906842597L;
         |for (int $i = 0; $i < $bytes.length; $i++) {
         |  $h = 31L * $h + $bytes[$i];
         |}
         |${ev.value} = $h;
       """.stripMargin
    })

  override protected def withNewChildInternal(
      newChild: Expression): RollingHash64 = copy(child = newChild)
}

object RollingHash64 {

  /** Column-level entry point. */
  def rolling_hash64(c: Column): Column =
    GraftSqlBridge.toColumn(RollingHash64(GraftSqlBridge.toExpression(c)))

  /** Register for SQL-string use: SELECT rolling_hash64(text) ... */
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "rolling_hash64", exprs => RollingHash64(exprs.head), "built-in")

  /** Reference implementation for tests. */
  def hashOf(s: String): Long = {
    val bytes = s.getBytes("UTF-8")
    var h = 1125899906842597L
    var i = 0
    while (i < bytes.length) { h = 31L * h + bytes(i); i += 1 }
    h
  }
}
