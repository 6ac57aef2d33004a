package graft.sqlext

import org.apache.spark.sql.{Column, GraftSqlBridge, SparkSession}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{DataType, IntegerType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression: longest common subsequence length
  * over TOKEN sequences (two array<string> columns) — the kernel of
  * ROUGE-L (Lin 2004), the standard summarization-eval metric the
  * n-gram ROUGE/BLEU family can't express (it rewards in-order
  * coverage at any gap). Same design as [[WordLevenshtein]]: the
  * O(n·m) two-row DP lives in a static helper invoked from generated
  * code — inside whole-stage codegen, no UDF serialization. Token
  * equality is UTF8String equality; null tokens match only null.
  */
case class WordLcs(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = IntegerType
  override def prettyName: String = "word_lcs"

  override def nullSafeEval(a: Any, b: Any): Any =
    WordLcs.lcs(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.sqlext.WordLcs.lcs($a, $b);")

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): WordLcs =
    copy(left = newLeft, right = newRight)
}

object WordLcs {

  def word_lcs(a: Column, b: Column): Column =
    GraftSqlBridge.toColumn(WordLcs(
      GraftSqlBridge.toExpression(a), GraftSqlBridge.toExpression(b)))

  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "word_lcs", exprs => WordLcs(exprs(0), exprs(1)), "built-in")

  private def tokEq(a: UTF8String, b: UTF8String): Boolean =
    if (a == null || b == null) a == null && b == null else a.equals(b)

  /** Two-row LCS DP; called from generated code. */
  def lcs(a: ArrayData, b: ArrayData): Int = {
    val n = a.numElements(); val m = b.numElements()
    if (n == 0 || m == 0) return 0
    val bs = new Array[UTF8String](m)
    var j = 0
    while (j < m) {
      bs(j) = if (b.isNullAt(j)) null else b.getUTF8String(j)
      j += 1
    }
    var prev = new Array[Int](m + 1)
    var cur = new Array[Int](m + 1)
    var i = 1
    while (i <= n) {
      val ai = if (a.isNullAt(i - 1)) null else a.getUTF8String(i - 1)
      j = 1
      while (j <= m) {
        cur(j) =
          if (tokEq(ai, bs(j - 1))) prev(j - 1) + 1
          else math.max(prev(j), cur(j - 1))
        j += 1
      }
      val t = prev; prev = cur; cur = t
      java.util.Arrays.fill(cur, 0)
      i += 1
    }
    prev(m)
  }

  /** Reference implementation for tests. */
  def lcsOf(a: Seq[String], b: Seq[String]): Int = {
    val dp = Array.ofDim[Int](a.length + 1, b.length + 1)
    for (i <- 1 to a.length; j <- 1 to b.length)
      dp(i)(j) =
        if (a(i - 1) == b(j - 1)) dp(i - 1)(j - 1) + 1
        else math.max(dp(i - 1)(j), dp(i)(j - 1))
    dp(a.length)(b.length)
  }
}
