package graft.analytics

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Event-stream / behavioral analytics: funnel conversion, cohort
  * retention, Markov transition matrices, RFM segmentation.
  *
  * Reference analogue: pandrs groupby + window compositions
  * (`src/dataframe/group_by.rs`, `src/series/window.rs`) — the
  * reference has no dedicated funnel/cohort module, so these are the
  * standard analytical formulations expressed Spark-first.
  *
  * Scale notes: every op here is a bounded number of key-partitioned
  * shuffles (per-user aggregates or lag windows partitioned by user);
  * nothing is a global window or a driver-side loop. Funnel iterates
  * once per STEP (k joins for a k-step funnel), not per row.
  */
object EventOps {

  /** Journey-string sequence mining — the MATCH_RECOGNIZE-lite: per
    * entity, the chronologically ordered event-type initials become
    * one string (the "journey"), and each named regex pattern is
    * counted over it with non-overlapping left-to-right semantics
    * (identical in Java regex and RE2). `browse→buy = "v+p"`,
    * `error streaks = "e{2,}"` — sequence questions become one-line
    * regexes instead of k-way self-joins.
    *
    * Determinism: event order is (ts, tieCol) — supply a unique
    * tiebreaker. Scale: ONE groupBy; the journey lives in executor
    * memory and is bounded by the entity's event count (cap activity
    * upstream for adversarially hot entities — this is per-group
    * state, never a driver collect). */
  def journeyPatterns(df: DataFrame, userCol: String, tsCol: String,
      typeCol: String, tieCol: String,
      patterns: Seq[(String, String)]): DataFrame = {
    require(patterns.nonEmpty, "journeyPatterns needs >= 1 pattern")
    val ini = substring(col(typeCol), 1, 1)
    val base = df.groupBy(col(userCol))
      .agg(count(lit(1)).as("n_events"),
        array_join(transform(
          array_sort(collect_list(struct(col(tsCol).as("ts"),
            col(tieCol).as("tie"), ini.as("ini")))),
          x => x.getField("ini")), "").as("journey"))
    patterns.foldLeft(base) { case (acc, (name, pat)) =>
      acc.withColumn(name,
        size(regexp_extract_all(col("journey"), lit(pat), lit(0)))
          .cast("long"))
    }
  }

  /** Ordered-funnel conversion: for the step sequence `steps`, a user
    * reaches step k at the EARLIEST event of type `steps(k)` that is
    * strictly after their step-(k−1) time (classic "ordered funnel",
    * window unlimited). Emits one row per step with the number of
    * users reaching it and the conversion vs step 1 in exact integer
    * parts-per-million (floor), so the ratio is engine-independent.
    *
    * Plan: one hash-agg per step on `userCol` (min-timestamp), each
    * followed by a user-keyed join — k bounded shuffles total; the
    * events scan is filtered to the funnel's types first so only
    * relevant rows ever shuffle. */
  def funnel(df: DataFrame, userCol: String, tsCol: String,
      typeCol: String, steps: Seq[String]): DataFrame = {
    require(steps.nonEmpty, "funnel needs at least one step")
    val spark = df.sparkSession
    import spark.implicits._
    val ev = df.select(col(userCol).as("u"), col(tsCol).as("ts"),
        col(typeCol).as("et"))
      .filter(col("u").isNotNull && col("ts").isNotNull &&
        col("et").isin(steps: _*))
    // reached(k): DataFrame[u, t_k] — earliest qualifying time
    var reached = ev.filter(col("et") === steps.head)
      .groupBy("u").agg(min(col("ts")).as("t"))
    var counts = Vector(reached.count())
    steps.tail.foreach { st =>
      reached = ev.filter(col("et") === st).join(reached, "u")
        .filter(col("ts") > col("t"))
        .groupBy("u").agg(min(col("ts")).as("t"))
      counts = counts :+ reached.count()
    }
    val base = counts.head
    steps.zipWithIndex.map { case (st, i) =>
      (i + 1L, st, counts(i),
        if (base == 0L) 0L else counts(i) * 1000000L / base)
    }.toDF("step", "event_type", "n_users", "conversion_ppm")
  }

  /** Cohort retention: cohort = the `period`-truncated timestamp of a
    * user's FIRST event; for every (cohort, offset) the number of
    * distinct users from that cohort active `offset` periods later.
    * `period` is a Spark/DuckDB `date_trunc` unit ("month", "week",
    * "day"). Offset is measured in truncated-unit steps.
    *
    * Two shuffles: first-seen per user, then the distinct-count — both
    * keyed, both partial-aggregated map-side. */
  def retentionCohorts(df: DataFrame, userCol: String, tsCol: String,
      period: String = "month"): DataFrame = {
    val ev = df.select(col(userCol).as("u"),
        date_trunc(period, col(tsCol)).as("p"))
      .filter(col("u").isNotNull && col("p").isNotNull)
    val firstSeen = ev.groupBy("u").agg(min(col("p")).as("cohort"))
    val offsetExpr = period match {
      case "month" => months_between(col("p"), col("cohort")).cast("long")
      case "day"   => datediff(col("p"), col("cohort")).cast("long")
      case "week"  => (datediff(col("p"), col("cohort")) / 7).cast("long")
      case other => throw new IllegalArgumentException(
        s"unsupported period: $other")
    }
    ev.join(firstSeen, "u")
      .select(col("cohort"), offsetExpr.as("offset"), col("u"))
      .distinct()
      .groupBy("cohort", "offset")
      .agg(count(lit(1)).as("n_users"))
  }

  /** First-order Markov transition matrix over per-user event
    * sequences: P(next=to | cur=from), estimated from adjacent pairs
    * in each user's timeline. Ordering ties broken by `tieCol` so the
    * sequence is deterministic. Probabilities round 6.
    *
    * One lag window partitioned by user (no global window), then a
    * keyed count — scales with users × events/user. */
  def markovTransitions(df: DataFrame, userCol: String, tsCol: String,
      typeCol: String, tieCol: String): DataFrame = {
    val w = Window.partitionBy(col(userCol))
      .orderBy(col(tsCol), col(tieCol))
    val pairs = df
      .filter(col(userCol).isNotNull && col(typeCol).isNotNull)
      .select(col(userCol), col(typeCol).as("from_type"),
        lead(col(typeCol), 1).over(w).as("to_type"))
      .filter(col("to_type").isNotNull)
    val cnt = pairs.groupBy("from_type", "to_type")
      .agg(count(lit(1)).as("n"))
    val tot = cnt.groupBy("from_type").agg(sum(col("n")).as("__tot__"))
    cnt.join(tot, "from_type")
      .select(col("from_type"), col("to_type"), col("n"),
        round(col("n").cast("double") / col("__tot__"), 6).as("p"))
  }

  /** Frequent sequential patterns: the n-grams of consecutive
    * `typeCol` values along each key's (tsCol, tieCol)-ordered
    * timeline, counted across all keys and filtered to
    * `minCount` support — PrefixSpan-style contiguous-sequence
    * mining for session/behavior analysis.
    *
    * One key-partitioned lead window producing every n-gram in place
    * (no per-key collect_list, so a key with millions of events never
    * materializes its whole timeline) and one hash aggregate. */
  def sequenceNgrams(df: DataFrame, userCol: String, tsCol: String,
      typeCol: String, tieCol: String, n: Int = 3,
      minCount: Long = 1L): DataFrame = {
    require(n >= 2, "sequenceNgrams needs n >= 2")
    val w = Window.partitionBy(col(userCol))
      .orderBy(col(tsCol), col(tieCol))
    val base = df.filter(col(userCol).isNotNull && col(typeCol).isNotNull)
    val steps = (0 until n).map {
      case 0 => col(typeCol)
      case i => lead(col(typeCol), i).over(w)
    }
    base.select(concat_ws(">", steps: _*).as("ngram"),
        steps.map(_.isNotNull).reduce(_ && _).as("__full__"))
      .filter(col("__full__"))
      .groupBy("ngram").agg(count(lit(1)).as("cnt"))
      .filter(col("cnt") >= minCount)
  }

  /** SCD-2 style change intervals: collapse a keyed, timestamped
    * value stream into validity ranges [valid_from, valid_to) — one
    * row per run of consecutive equal values per key, `valid_to` null
    * for the current run (slowly-changing-dimension history build).
    * Null-safe value comparison; `tieCol` totalizes the order.
    *
    * Two key-partitioned windows (change flag + next-run lookahead)
    * and one keyed aggregate — no global state, scales with keys. */
  def changeIntervals(df: DataFrame, keyCols: Seq[String],
      valueCol: String, tsCol: String, tieCol: String): DataFrame = {
    val w = Window.partitionBy(keyCols.map(col): _*)
      .orderBy(col(tsCol), col(tieCol))
    val flagged = df.select(keyCols.map(col) ++
      Seq(col(valueCol), col(tsCol), col(tieCol),
        when(lag(col(valueCol), 1).over(w) <=> col(valueCol), 0)
          .otherwise(1).as("__chg__")): _*)
    val grouped = flagged.withColumn("__grp__",
      sum(col("__chg__")).over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    val runs = grouped.groupBy(keyCols.map(col) :+ col("__grp__"): _*)
      .agg(min(col(valueCol)).as(valueCol),
        min(col(tsCol)).as("valid_from"))
    val wk = Window.partitionBy(keyCols.map(col): _*)
      .orderBy(col("__grp__"))
    runs.withColumn("valid_to", lead(col("valid_from"), 1).over(wk))
      .drop("__grp__")
  }

  /** RFM (recency / frequency / monetary) per entity, with fixed
    * threshold segmentation: recency = days from the entity's last
    * event to the dataset's max date (one tiny scalar broadcast),
    * frequency = event count, monetary = exact cents sum.
    * `segment` uses caller-supplied fixed cutoffs — a pure map-side
    * CASE after the single per-entity aggregate (the scalable
    * alternative to global ntile scoring).
    *
    * Returns (entity, recency_days, frequency, monetary_cents,
    * segment). */
  def rfm(df: DataFrame, entityCol: String, tsCol: String,
      amountCol: String, recencyCut: Int, freqCut: Long,
      monetaryCutCents: Long): DataFrame = {
    val agg = df.filter(col(entityCol).isNotNull)
      .groupBy(col(entityCol))
      .agg(max(col(tsCol)).as("__last__"),
        count(lit(1)).as("frequency"),
        sum(round(col(amountCol) * 100).cast("long"))
          .as("monetary_cents"))
    val maxDate = agg.agg(max(col("__last__")).as("__maxd__"))
    agg.crossJoin(broadcast(maxDate))
      .select(col(entityCol),
        datediff(col("__maxd__"), col("__last__")).cast("long")
          .as("recency_days"),
        col("frequency"), col("monetary_cents"))
      .withColumn("segment",
        when(col("recency_days") <= recencyCut &&
            col("frequency") >= freqCut &&
            col("monetary_cents") >= monetaryCutCents, "champion")
          .when(col("recency_days") <= recencyCut, "recent")
          .when(col("frequency") >= freqCut ||
            col("monetary_cents") >= monetaryCutCents, "loyal_lapsed")
          .otherwise("hibernating"))
  }

  /** Multi-touch attribution: for every conversion event (type ==
    * `convType`, carrying `valueCol`), credit the user's PRIOR
    * non-conversion touches under three standard models —
    * last-touch (full value to the latest prior touch channel),
    * first-touch (full value to the earliest), and linear (value
    * split equally over all prior touches, so channel c receives
    * value·n_c/k). Conversions with no prior touch are dropped (no
    * channel to credit). Returns one row per channel with the three
    * credited totals in cents (exact integer cents for last/first;
    * linear is rounded per-conversion before summing so the split is
    * engine-independent).
    *
    * Plan: a single user-partitioned time-ordered window computes
    * running per-channel touch counts and running first/last touch
    * labels; one hash-aggregate by channel finalizes. No self-joins,
    * no per-conversion scans — 100 TB-safe (one shuffle on user, one
    * on channel). Ordering ties break on `idCol`. */
  def attribution(df: DataFrame, userCol: String, tsCol: String,
      typeCol: String, valueCol: String, convType: String,
      idCol: String, maxTypes: Int = 1000): DataFrame = {
    val w = Window.partitionBy(col(userCol))
      .orderBy(col(tsCol), col(idCol))
      .rowsBetween(Window.unboundedPreceding, -1)
    val isTouch = col(typeCol) =!= convType
    // the channel domain is collected to the driver to pivot into
    // per-channel running counts — bounded by nature (channels are
    // an enum), but a miskeyed call (URL or user-id as typeCol)
    // would ship the whole domain here: limit BEFORE fetch + a loud
    // require (the repo's collectSeries convention)
    val touchTypes = df.filter(col(typeCol).isNotNull && isTouch)
      .select(col(typeCol)).distinct().limit(maxTypes + 1)
      .collect().map(_.getString(0)).sorted.toSeq
    require(touchTypes.length <= maxTypes,
      s"attribution: more than $maxTypes distinct touch types in " +
        s"'$typeCol' — is this really a channel column? Raise " +
        "maxTypes explicitly if so.")
    val withState = df
      .filter(col(userCol).isNotNull && col(tsCol).isNotNull)
      .withColumn("__last__",
        last(when(isTouch, col(typeCol)), ignoreNulls = true).over(w))
      .withColumn("__first__",
        first(when(isTouch, col(typeCol)), ignoreNulls = true).over(w))
      .withColumns(touchTypes.map(t => s"__n_$t" ->
        sum(when(isTouch && col(typeCol) === t, 1L)
          .otherwise(0L)).over(w)).toMap)
    val conv = withState
      .filter(col(typeCol) === convType && col("__last__").isNotNull)
      .withColumn("__cents__", round(col(valueCol) * 100).cast("long"))
      .withColumn("__k__",
        touchTypes.map(t => col(s"__n_$t")).reduce(_ + _))
    val perModel = touchTypes.map { t =>
      conv.select(lit(t).as("channel"),
        when(col("__last__") === t, col("__cents__")).otherwise(0L)
          .as("__lt__"),
        when(col("__first__") === t, col("__cents__")).otherwise(0L)
          .as("__ft__"),
        round(col("__cents__") * col(s"__n_$t") / col("__k__"))
          .cast("long").as("__ln__"))
    }.reduce(_ unionByName _)
    perModel.groupBy("channel")
      .agg(sum(col("__lt__")).as("last_touch_cents"),
        sum(col("__ft__")).as("first_touch_cents"),
        sum(col("__ln__")).as("linear_cents"))
  }
}
