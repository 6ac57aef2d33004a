package graft.sqlext

import org.apache.spark.sql.{Column, GraftSqlBridge, SparkSession}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, DoubleType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression: Jaro-Winkler similarity of two strings
  * (fuzzy entity matching / record linkage — the reference's string
  * distance utilities, `src/text/distance.rs`). Classic definition:
  * Jaro similarity with the Winkler common-prefix boost (scale 0.1,
  * max prefix 4) applied when the Jaro score exceeds 0.7 — the same
  * variant DuckDB ships, which is what makes the q219 oracle an exact
  * hash-match.
  *
  * The O(len1·len2/w) matching loop lives in a static helper invoked
  * from generated code — a single static call keeps the expression
  * inside whole-stage codegen (no UDF serialization, no iterator
  * break). Operates on UTF-8 bytes; exact for ASCII corpora, and any
  * consistent byte-level view agrees with itself on both sides of a
  * join.
  */
case class JaroWinkler(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def prettyName: String = "jaro_winkler"

  override def nullSafeEval(a: Any, b: Any): Any =
    JaroWinkler.sim(a.asInstanceOf[UTF8String].getBytes,
      b.asInstanceOf[UTF8String].getBytes)

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.sqlext.JaroWinkler.sim(" +
        s"$a.getBytes(), $b.getBytes());")

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): JaroWinkler =
    copy(left = newLeft, right = newRight)
}

object JaroWinkler {

  /** Column-level entry point. */
  def jaro_winkler(a: Column, b: Column): Column =
    GraftSqlBridge.toColumn(JaroWinkler(
      GraftSqlBridge.toExpression(a), GraftSqlBridge.toExpression(b)))

  /** Register for SQL-string use: SELECT jaro_winkler(a, b) ... */
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "jaro_winkler", exprs => JaroWinkler(exprs(0), exprs(1)),
      "built-in")

  /** Jaro-Winkler over byte arrays; called from generated code. */
  def sim(s1: Array[Byte], s2: Array[Byte]): Double = {
    val l1 = s1.length
    val l2 = s2.length
    // DuckDB convention: any empty side (incl. both) scores 0.0
    if (l1 == 0 || l2 == 0) return 0.0
    val window = math.max(0, math.max(l1, l2) / 2 - 1)
    val m1 = new Array[Boolean](l1)
    val m2 = new Array[Boolean](l2)
    var matches = 0
    var i = 0
    while (i < l1) {
      val lo = math.max(0, i - window)
      val hi = math.min(l2 - 1, i + window)
      var j = lo
      var done = false
      while (j <= hi && !done) {
        if (!m2(j) && s1(i) == s2(j)) {
          m1(i) = true; m2(j) = true; matches += 1; done = true
        }
        j += 1
      }
      i += 1
    }
    if (matches == 0) return 0.0
    // transpositions: matched chars out of relative order, halved
    var t = 0
    var k = 0
    i = 0
    while (i < l1) {
      if (m1(i)) {
        while (!m2(k)) k += 1
        if (s1(i) != s2(k)) t += 1
        k += 1
      }
      i += 1
    }
    val m = matches.toDouble
    val jaro = (m / l1 + m / l2 + (m - t / 2) / m) / 3.0
    if (jaro <= 0.7) return jaro
    var prefix = 0
    val maxPrefix = math.min(4, math.min(l1, l2))
    while (prefix < maxPrefix && s1(prefix) == s2(prefix)) prefix += 1
    jaro + prefix * 0.1 * (1.0 - jaro)
  }
}
