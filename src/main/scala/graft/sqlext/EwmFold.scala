package graft.sqlext

import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression: the EWM sorted-array fold — the
  * compiled fast path of `graft.window.RollingOps`' exact EWM family
  * (the same relationship CdcCuts has to the portable chunk chain).
  *
  * Semantics are BIT-EQUAL to the portable SQL `aggregate(...)` folds
  * those operators previously evaluated (and which the DuckDB
  * recursive-CTE oracles replay): identical accumulator updates in
  * identical IEEE evaluation order, null points under
  * ignore_na=false decaying without adding, emitted values computed
  * from the POST-update accumulators, and Spark's NaN-is-largest
  * comparison semantics inside the CASE guards (a NaN product under
  * a leading-null prefix passes a `> 0` test in Spark SQL — the
  * kernel preserves that). The interpreted HigherOrderFunction walk
  * cost O(Σ n_i²) array copies (one `outp || array(e)` append per
  * element) plus per-element lambda dispatch; this kernel is a
  * compiled O(n) loop per group.
  *
  * Input layouts by mode family (all sorted upstream):
  *   mean/var:   array<struct<o: ANY, v: double>>
  *   cov/corr:   array<struct<o: ANY, x: double, y: double>>
  *   time m/v:   array<struct<t: double, o: ANY, v: double>>
  *   time cov:   array<struct<t: double, o: ANY, x: double, y: double>>
  * Output: array<struct<o, e: double>> in input order, e nullable.
  * `param` is alpha for positional modes, halflife for time modes.
  */
case class EwmFold(child: Expression, param: Double, mode: Int)
    extends UnaryExpression {

  import EwmFold._

  require(mode >= MeanAdj && mode <= TimeCorr,
    s"unknown EwmFold mode $mode")
  require(if (mode >= TimeMean) param > 0
          else param > 0 && param < 1,
    s"param out of range for mode $mode: $param")

  private lazy val inStruct: StructType = child.dataType
    .asInstanceOf[ArrayType].elementType.asInstanceOf[StructType]

  private lazy val oIdx: Int =
    if (mode >= TimeMean) 1 else 0 // time layouts lead with t

  private lazy val oField: StructField = inStruct.fields(oIdx)

  private lazy val nFields: Int = inStruct.fields.length

  override def dataType: DataType = ArrayType(
    StructType(Seq(StructField("o", oField.dataType, oField.nullable),
      StructField("e", DoubleType, nullable = true))),
    containsNull = false)

  override def prettyName: String = "ewm_fold"

  // Spark SQL `> 0.0d` under NaN-is-largest ordering
  @inline private def gtZeroSql(x: Double): Boolean =
    java.lang.Double.isNaN(x) || x > 0.0

  def compute(arr: ArrayData): ArrayData = {
    val n = arr.numElements()
    val oType = oField.dataType
    val out = new Array[Any](n)
    val a = param
    val hl = param
    var num = 0.0; var den = 0.0; var num2 = 0.0; var den2 = 0.0
    var prev = 0.0; var prevSet = false; var ow = 0.0
    var sx = 0.0; var sy = 0.0; var sxy = 0.0; var sxx = 0.0
    var syy = 0.0
    var pt = 0.0; var ptSet = false
    // (helper closes over the accumulators)
    def covEmit(m: Int): java.lang.Double = {
      val covB = sxy / den - (sx / den) * (sy / den)
      if (m == CorrPos || m == CorrPosKeepNa || m == TimeCorr) {
        val varxB = sxx / den - (sx / den) * (sx / den)
        val varyB = syy / den - (sy / den) * (sy / den)
        if (gtZeroSql(varxB * varyB))
          covB / math.sqrt(varxB * varyB)
        else null
      } else if (m == CovPosBiased || m == CovPosBiasedKeepNa ||
          m == TimeCovBiased) covB
      else {
        val dd = den * den - den2
        if (gtZeroSql(dd)) covB * (den * den) / dd else null
      }
    }
    var i = 0
    while (i < n) {
      val row = arr.getStruct(i, nFields)
      var e: java.lang.Double = null
      mode match {
        case MeanAdj =>
          val v = row.getDouble(1)
          num = (1.0 - a) * num + v
          den = (1.0 - a) * den + 1.0
          e = num / den
        case MeanAdjKeepNa =>
          if (row.isNullAt(1)) {
            num = (1.0 - a) * num; den = (1.0 - a) * den
          } else {
            num = (1.0 - a) * num + row.getDouble(1)
            den = (1.0 - a) * den + 1.0
          }
          if (gtZeroSql(den)) e = num / den
        case MeanRec =>
          val v = row.getDouble(1)
          val nv = if (prevSet) (1.0 - a) * prev + a * v else v
          prev = nv; prevSet = true
          e = nv
        case MeanRecKeepNa =>
          if (row.isNullAt(1)) {
            if (prevSet) e = prev
            ow = (1.0 - a) * ow
          } else if (!prevSet) {
            prev = row.getDouble(1); prevSet = true; ow = 1.0
            e = prev
          } else {
            val v = row.getDouble(1)
            val nv = ((1.0 - a) * ow * prev + a * v) /
              ((1.0 - a) * ow + a)
            prev = nv; ow = 1.0
            e = nv
          }
        case Var | VarBiased | VarKeepNa | VarBiasedKeepNa =>
          val keepNa = mode == VarKeepNa || mode == VarBiasedKeepNa
          if (keepNa && row.isNullAt(1)) {
            den = (1.0 - a) * den
            num = (1.0 - a) * num
            num2 = (1.0 - a) * num2
            den2 = (1.0 - a) * (1.0 - a) * den2
          } else {
            val v = row.getDouble(1)
            den = (1.0 - a) * den + 1.0
            num = (1.0 - a) * num + v
            num2 = (1.0 - a) * num2 + v * v
            den2 = (1.0 - a) * (1.0 - a) * den2 + 1.0
          }
          val biasedDefined = !keepNa || gtZeroSql(den)
          if (mode == VarBiased || mode == VarBiasedKeepNa) {
            if (biasedDefined)
              e = num2 / den - (num / den) * (num / den)
          } else {
            val dd = den * den - den2
            if (gtZeroSql(dd) && biasedDefined)
              e = (num2 / den - (num / den) * (num / den)) *
                (den * den) / dd
          }
        case CovPos | CovPosBiased | CorrPos | CovPosKeepNa |
            CovPosBiasedKeepNa | CorrPosKeepNa =>
          val keepNa = mode >= CovPosKeepNa
          val xNull = row.isNullAt(1); val yNull = row.isNullAt(2)
          if (keepNa && (xNull || yNull)) {
            den = (1.0 - a) * den
            den2 = (1.0 - a) * (1.0 - a) * den2
            sx = (1.0 - a) * sx; sy = (1.0 - a) * sy
            sxy = (1.0 - a) * sxy; sxx = (1.0 - a) * sxx
            syy = (1.0 - a) * syy
          } else {
            val x = row.getDouble(1); val y = row.getDouble(2)
            den = (1.0 - a) * den + 1.0
            den2 = (1.0 - a) * (1.0 - a) * den2 + 1.0
            sx = (1.0 - a) * sx + x
            sy = (1.0 - a) * sy + y
            sxy = (1.0 - a) * sxy + x * y
            sxx = (1.0 - a) * sxx + x * x
            syy = (1.0 - a) * syy + y * y
          }
          // the replaced SQL fold guarded EVERY biased moment with
          // CASE WHEN den > 0 (and EwmPairMachine.emit returns null
          // when den <= 0): a keepNa leading pairwise-incomplete
          // prefix decays den from 0 to 0, where covB = 0/0 = NaN
          // must NOT leak out as a value — mirror the Var branch's
          // biasedDefined guard
          if (!keepNa || gtZeroSql(den)) e = covEmit(mode)
        case TimeMean =>
          val t = row.getDouble(0); val v = row.getDouble(2)
          val dec =
            if (ptSet) java.lang.StrictMath.pow(0.5, (t - pt) / hl) else 1.0
          num = dec * num + v
          den = dec * den + 1.0
          pt = t; ptSet = true
          e = num / den
        case TimeVar | TimeVarBiased =>
          val t = row.getDouble(0); val v = row.getDouble(2)
          val dec =
            if (ptSet) java.lang.StrictMath.pow(0.5, (t - pt) / hl) else 1.0
          num = dec * num + v
          den = dec * den + 1.0
          num2 = dec * num2 + v * v
          den2 = dec * dec * den2 + 1.0
          pt = t; ptSet = true
          if (mode == TimeVarBiased)
            e = num2 / den - (num / den) * (num / den)
          else {
            val dd = den * den - den2
            if (gtZeroSql(dd))
              e = (num2 / den - (num / den) * (num / den)) *
                (den * den) / dd
          }
        case TimeCov | TimeCovBiased | TimeCorr =>
          val t = row.getDouble(0)
          val x = row.getDouble(2); val y = row.getDouble(3)
          val dec =
            if (ptSet) java.lang.StrictMath.pow(0.5, (t - pt) / hl) else 1.0
          den = dec * den + 1.0
          den2 = dec * dec * den2 + 1.0
          sx = dec * sx + x
          sy = dec * sy + y
          sxy = dec * sxy + x * y
          sxx = dec * sxx + x * x
          syy = dec * syy + y * y
          pt = t; ptSet = true
          e = covEmit(mode)
      }
      var o = if (row.isNullAt(oIdx)) null else row.get(oIdx, oType)
      o match {
        case s: UTF8String => o = s.copy()
        case _ => ()
      }
      out(i) = new GenericInternalRow(Array[Any](o, e))
      i += 1
    }
    new GenericArrayData(out)
  }

  override def nullSafeEval(input: Any): Any =
    compute(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode = {
    val ref =
      ctx.addReferenceObj("ewmFold", this, classOf[EwmFold].getName)
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = $ref.compute($c);")
  }

  override protected def withNewChildInternal(
      newChild: Expression): EwmFold = copy(child = newChild)
}

object EwmFold {
  // positional mean: adjust=true (num/den) / adjust=false recursive,
  // each with ignore_na=true (nulls pre-filtered) or =false (null
  // decays without adding)
  val MeanAdj = 0
  val MeanAdjKeepNa = 1
  val MeanRec = 2
  val MeanRecKeepNa = 3
  // positional variance: debiased (den²/(den²−den2)) / biased
  val Var = 4
  val VarKeepNa = 5
  val VarBiased = 6
  val VarBiasedKeepNa = 7
  // positional pairwise: cov debiased / biased / corr (biased ratio);
  // KeepNa variants decay on a null in EITHER column
  val CovPos = 8
  val CovPosBiased = 9
  val CorrPos = 10
  val CovPosKeepNa = 11
  val CovPosBiasedKeepNa = 12
  val CorrPosKeepNa = 13
  // time-decayed family (param = halflife, weight 0.5^(Δt/halflife))
  val TimeMean = 14
  val TimeVar = 15
  val TimeVarBiased = 16
  val TimeCov = 17
  val TimeCovBiased = 18
  val TimeCorr = 19

  import org.apache.spark.sql.{Column, GraftSqlBridge}

  def ewm_fold(pts: Column, param: Double, mode: Int): Column =
    GraftSqlBridge.toColumn(
      EwmFold(GraftSqlBridge.toExpression(pts), param, mode))
}
