package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Datetime accessor parity (reference
  * src/series/datetime_accessor.rs:20-683): calendar fields,
  * arithmetic, business days, tz conversion — all built-in
  * compositions, codegen'd.
  */
object DtOps {

  def year(c: Column): Column = org.apache.spark.sql.functions.year(c)
  def month(c: Column): Column = org.apache.spark.sql.functions.month(c)
  def day(c: Column): Column = dayofmonth(c)
  def hour(c: Column): Column = org.apache.spark.sql.functions.hour(c)
  def minute(c: Column): Column = org.apache.spark.sql.functions.minute(c)
  def second(c: Column): Column = org.apache.spark.sql.functions.second(c)

  /** weekday: Monday=0..Sunday=6 (datetime_accessor.rs weekday,
    * chrono convention). */
  def weekday(c: Column): Column = org.apache.spark.sql.functions.weekday(c)

  def dayofyear(c: Column): Column =
    org.apache.spark.sql.functions.dayofyear(c)
  def quarter(c: Column): Column =
    org.apache.spark.sql.functions.quarter(c)
  def week(c: Column): Column = weekofyear(c)

  /** is_weekend (datetime_accessor.rs is_weekend). */
  def isWeekend(c: Column): Column = dayofweek(c).isin(1, 7)

  def date(c: Column): Column = to_date(c)
  def strftime(c: Column, fmt: String): Column = date_format(c, fmt)
  def epochSeconds(c: Column): Column = unix_timestamp(c)

  def addDays(c: Column, n: Int): Column = date_add(c.cast("date"), n)
  def addHours(c: Column, n: Int): Column =
    c + expr(s"INTERVAL $n HOURS")
  def addMonths(c: Column, n: Int): Column =
    add_months(c.cast("date"), n)
  def addYears(c: Column, n: Int): Column =
    add_months(c.cast("date"), n * 12)

  /** normalize: truncate to midnight. */
  def normalize(c: Column): Column = date_trunc("day", c)

  /** round to a frequency (datetime_accessor.rs round(freq)):
    * freq ∈ second/minute/hour/day — truncate + half-unit carry. */
  def roundTo(c: Column, freq: String): Column = {
    val unitSecs = freq match {
      case "second" => 1L
      case "minute" => 60L
      case "hour" => 3600L
      case "day" => 86400L
    }
    timestamp_seconds(
      (round(c.cast("double") / unitSecs) * unitSecs).cast("long"))
  }

  def daysInMonth(c: Column): Column = dayofmonth(last_day(c))

  def isLeapYear(c: Column): Column = {
    val y = org.apache.spark.sql.functions.year(c)
    (y % 4 === 0 && y % 100 =!= 0) || (y % 400 === 0)
  }

  /** is_business_day: Mon-Fri (datetime_accessor.rs is_business_day
    * has no calendar either). */
  def isBusinessDay(c: Column): Column = !isWeekend(c)

  /** is_business_day with an explicit holiday calendar: Mon-Fri and
    * not one of `holidays` ("yyyy-MM-dd"). Calendars are small by
    * nature, so the list compiles into a literal array predicate —
    * map-side, no join. For multi-thousand-entry calendars prefer a
    * broadcast join against a holiday table. */
  def isBusinessDay(c: Column, holidays: Seq[String]): Column =
    !isWeekend(c) && (if (holidays.isEmpty) lit(true)
      else !c.cast("date").isin(holidays.map(h =>
        java.sql.Date.valueOf(h)): _*))

  /** business_day_count between two dates (inclusive-exclusive),
    * closed form — no row explosion. */
  def businessDayCount(start: Column, end: Column): Column = {
    val d0 = datediff(end.cast("date"), start.cast("date"))
    val fullWeeks = floor(d0 / 7) * 5
    // remainder days walked from the start weekday (Mon=0)
    val startWd = org.apache.spark.sql.functions.weekday(start)
    val rem = d0 % 7
    val seq = sequence(lit(0), greatest(rem - 1, lit(0)))
    val remBiz = when(rem === 0, 0).otherwise(
      size(filter(seq, i => (startWd + i) % 7 < 5)))
    (fullWeeks + remBiz).cast("long")
  }

  /** tz conversion (datetime_accessor.rs:573-608): timestamps are
    * UTC instants; render/shift via from/to_utc_timestamp. */
  def tzConvert(c: Column, tz: String): Column = from_utc_timestamp(c, tz)
  def tzLocalize(c: Column, tz: String): Column = to_utc_timestamp(c, tz)

  /** pandas between_time predicate: true where the TIME-OF-DAY of `c`
    * lies in [start, end] (inclusive both ends, matching pandas
    * defaults). Wrapping ranges (start > end, e.g. 22:00–02:00) select
    * across midnight. Times are "HH:mm" or "HH:mm:ss". Seconds-of-day
    * comparison — a pure map-side expression. */
  def betweenTime(c: Column, start: String, end: String): Column = {
    def secs(t: String): Int = {
      val p = t.split(":").map(_.toInt)
      p(0) * 3600 + p(1) * 60 + (if (p.length > 2) p(2) else 0)
    }
    val sod = hour(c) * 3600 + minute(c) * 60 + second(c)
    val (s, e) = (secs(start), secs(end))
    if (s <= e) sod >= s && sod <= e
    else sod >= s || sod <= e
  }

  /** pandas at_time predicate: exact time-of-day match. */
  def atTime(c: Column, time: String): Column =
    betweenTime(c, time, time)

  /** date_range as a DataFrame — see TimeSeriesOps.dateRange. */
}
