package graft.sqlext

import org.apache.spark.sql.{Column, GraftSqlBridge, SparkSession}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{DataType, IntegerType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression: Levenshtein edit distance over TOKEN
  * sequences (two array<string> columns) — the word-level distance
  * behind WER/TER-style generation metrics (the reference's text
  * distance utilities, `src/text/distance.rs`, operate on chars;
  * ASR/MT evaluation needs the word-level form and Spark's built-in
  * `levenshtein` is char-only).
  *
  * Same design as [[JaroWinkler]]: the O(n·m) two-row DP lives in a
  * static helper invoked from generated code, keeping the expression
  * inside whole-stage codegen (no UDF serialization). Token equality
  * is UTF8String equality (byte-exact); null elements compare equal
  * only to null.
  */
case class WordLevenshtein(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = IntegerType
  override def prettyName: String = "word_levenshtein"

  override def nullSafeEval(a: Any, b: Any): Any =
    WordLevenshtein.dist(a.asInstanceOf[ArrayData],
      b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.sqlext.WordLevenshtein.dist($a, $b);")

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): WordLevenshtein =
    copy(left = newLeft, right = newRight)
}

object WordLevenshtein {

  /** Column-level entry point. */
  def word_levenshtein(a: Column, b: Column): Column =
    GraftSqlBridge.toColumn(WordLevenshtein(
      GraftSqlBridge.toExpression(a), GraftSqlBridge.toExpression(b)))

  /** Register for SQL-string use. */
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "word_levenshtein", exprs => WordLevenshtein(exprs(0), exprs(1)),
      "built-in")

  private def tokEq(a: UTF8String, b: UTF8String): Boolean =
    if (a == null || b == null) a == null && b == null else a.equals(b)

  /** Two-row DP; called from generated code. */
  def dist(a: ArrayData, b: ArrayData): Int = {
    val n = a.numElements(); val m = b.numElements()
    if (n == 0) return m
    if (m == 0) return n
    val bs = new Array[UTF8String](m)
    var j = 0
    while (j < m) {
      bs(j) = if (b.isNullAt(j)) null else b.getUTF8String(j)
      j += 1
    }
    var prev = Array.tabulate(m + 1)(identity)
    var cur = new Array[Int](m + 1)
    var i = 1
    while (i <= n) {
      cur(0) = i
      val ai = if (a.isNullAt(i - 1)) null else a.getUTF8String(i - 1)
      j = 1
      while (j <= m) {
        val cost = if (tokEq(ai, bs(j - 1))) 0 else 1
        var best = prev(j - 1) + cost
        if (prev(j) + 1 < best) best = prev(j) + 1
        if (cur(j - 1) + 1 < best) best = cur(j - 1) + 1
        cur(j) = best
        j += 1
      }
      val t = prev; prev = cur; cur = t
      i += 1
    }
    prev(m)
  }
}
