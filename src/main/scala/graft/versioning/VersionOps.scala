package graft.versioning

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Data versioning and change tracking, Spark-first.
  *
  * Reference: `/root/reference/src/versioning/{mod,core,tracker}.rs` —
  * the reference keeps a driver-side `LineageTracker` of versions,
  * operation history and snapshot diffs for a single-node frame. At
  * 100 TB the version store is a data problem, not a metadata problem,
  * so the equivalents here are table-level operators, each a single
  * keyed shuffle (or none):
  *
  *  - [[versionDiff]] — row-level added/removed/changed between two
  *    snapshots (one full-outer sort-merge join on the key);
  *  - [[tableFingerprint]] — an order- and partitioning-insensitive
  *    content hash (commutative 48-bit md5 sum, map-side + one scalar
  *    aggregate) for cheap version-equality checks;
  *  - [[asOfSnapshot]] — time travel over an append-only change log
  *    (per-key window, partitioned by key — never a global sort);
  *  - [[applyChanges]] — CDC merge of an upsert/delete changeset into
  *    a base snapshot (anti-join + union, the MERGE INTO shape);
  *  - [[schemaDiff]] — driver-side schema comparison (metadata is the
  *    one thing that IS small enough for the driver).
  */
object VersionOps {

  private val Two48 = 281474976710656L // 2^48

  /** 48-bit md5 hash of a pre-serialized string column as an exact
    * integer — the same engine-portable primitive as
    * [[graft.llm.PipelineOps.hash48Unit]] but kept integral so sums
    * over it stay exact (DECIMAL(38,0) holds 2^48 · 10^22 rows). */
  private def h48(c: Column): Column =
    conv(substring(md5(c), 1, 12), 16, 10).cast(DecimalType(38, 0))

  /** Canonical row serialization for hashing/compare: each column cast
    * to string with a \\u0001 sentinel for NULL (so NULL never collides
    * with the empty string), joined with '|'. Callers hashing doubles
    * or timestamps across engines should pre-cast to integral/string
    * columns first (see SURVEY §7.5 oracle-determinism rules). */
  def rowKey(cols: Seq[Column]): Column =
    concat_ws("|", cols.map(c =>
      coalesce(c.cast("string"), lit("\u0001"))): _*)

  /** Row-level diff between two versions of a table keyed by
    * `keyCols`: full-outer join on the key, then per-row status
    *  - "added"     — key present only in `newDf`
    *  - "removed"   — key present only in `oldDf`
    *  - "changed"   — key in both, any `compareCols` differ
    *    (null-safe: NULL vs value counts as a change)
    *  - "unchanged" — key in both, all compared columns equal.
    *
    * Output: keyCols, status, old_<c>/new_<c> for each compare col.
    * One shuffle per side on the key (sort-merge join; AQE handles
    * skew). No collect, no window — scales to any snapshot pair. Keys
    * must be non-null and unique per side (usual primary-key rules;
    * duplicate keys produce join multiplication, same as SQL MERGE). */
  def versionDiff(oldDf: DataFrame, newDf: DataFrame,
      keyCols: Seq[String], compareCols: Seq[String]): DataFrame = {
    require(keyCols.nonEmpty, "versionDiff needs at least one key column")
    val o = oldDf.select(
      keyCols.map(col) ++ compareCols.map(c => col(c).as(s"old_$c")): _*)
    val n = newDf.select(
      keyCols.map(col) ++ compareCols.map(c => col(c).as(s"new_$c")): _*)
    val joined = o.as("o").join(n.as("n"),
      keyCols.map(k => col(s"o.$k") === col(s"n.$k")).reduce(_ && _),
      "full_outer")
    val inOld = col(s"o.${keyCols.head}").isNotNull
    val inNew = col(s"n.${keyCols.head}").isNotNull
    val anyChanged =
      if (compareCols.isEmpty) lit(false)
      else compareCols.map(c => !(col(s"old_$c") <=> col(s"new_$c")))
        .reduce(_ || _)
    val status = when(!inOld, lit("added"))
      .when(!inNew, lit("removed"))
      .when(anyChanged, lit("changed"))
      .otherwise(lit("unchanged"))
    joined.select(
      keyCols.map(k => coalesce(col(s"o.$k"), col(s"n.$k")).as(k)) ++
        Seq(status.as("status")) ++
        compareCols.flatMap(c => Seq(col(s"old_$c"), col(s"new_$c"))): _*)
  }

  /** Per-status row counts of a [[versionDiff]] result — the version
    * summary the reference's tracker reports per snapshot pair. */
  def diffSummary(diff: DataFrame): DataFrame =
    diff.groupBy("status").agg(count(lit(1)).as("n"))

  /** Order- and partitioning-insensitive content fingerprint: the sum
    * of each row's 48-bit md5 over a canonical serialization, reduced
    * mod 2^48, plus the exact row count. Two versions with equal
    * (n_rows, fingerprint) are content-equal up to md5-sum collision
    * (~2^-48 per comparison against adversary-free data).
    *
    * Map-side hash + a single scalar aggregate — no shuffle beyond the
    * final reduce; the cheapest possible "did this 100 TB table
    * change?" probe. Engine-portable: DuckDB reproduces it with
    * md5/substr/conv arithmetic (see the q266 oracle). */
  def tableFingerprint(df: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.nonEmpty, "tableFingerprint needs at least one column")
    df.select(h48(rowKey(cols.map(col))).as("h"))
      .agg(count(lit(1)).cast("long").as("n_rows"),
        pmod(sum(col("h")), lit(Two48).cast(DecimalType(38, 0)))
          .cast("long").as("fingerprint"))
  }

  /** Time travel over an append-only change log. `log` holds one row
    * per (key, version) with `opCol` in {"u" upsert, "d" delete} and
    * the row payload; the snapshot as of `asOf` is the latest
    * version <= asOf per key, dropped if that latest op is a delete.
    *
    * One window partitioned by key (never global) — the standard
    * lakehouse time-travel shape; (key, version) pairs must be unique,
    * as in any change log. */
  def asOfSnapshot(log: DataFrame, keyCols: Seq[String],
      versionCol: String, opCol: String, asOf: Column): DataFrame = {
    val w = Window.partitionBy(keyCols.map(col): _*)
      .orderBy(col(versionCol).desc)
    log.filter(col(versionCol) <= asOf)
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1 && col(opCol) =!= "d")
      .drop("__rn", opCol)
  }

  /** CDC merge: apply an upsert/delete changeset to a base snapshot.
    * `changes` carries the base schema plus `opCol` in {"i","u","d"}
    * (i and u both upsert — last-writer-wins is the caller's dedup
    * job, e.g. via [[asOfSnapshot]] on the raw stream). Rows of `base`
    * whose key appears in `changes` are dropped (left-anti join), then
    * non-delete change rows are unioned in — exactly SQL
    * `MERGE INTO ... WHEN MATCHED UPDATE/DELETE WHEN NOT MATCHED
    * INSERT`. Two keyed shuffles, no windows, no collect. */
  def applyChanges(base: DataFrame, changes: DataFrame,
      keyCols: Seq[String], opCol: String): DataFrame = {
    val touched = changes.select(keyCols.map(col): _*).distinct()
    base.join(touched, keyCols, "left_anti")
      .unionByName(
        changes.filter(col(opCol) =!= "d").drop(opCol))
  }

  /** Driver-side schema diff (reference `versioning/core.rs` tracks
    * schema per version): columns added, removed, or retyped between
    * two snapshots. Metadata-only — no job is run. */
  def schemaDiff(oldDf: DataFrame, newDf: DataFrame)
      : Seq[(String, String, String, String)] = {
    val o = oldDf.schema.map(f => f.name -> f.dataType.simpleString).toMap
    val n = newDf.schema.map(f => f.name -> f.dataType.simpleString).toMap
    val added = (n.keySet -- o.keySet).toSeq.sorted
      .map(c => (c, "added", "", n(c)))
    val removed = (o.keySet -- n.keySet).toSeq.sorted
      .map(c => (c, "removed", o(c), ""))
    val retyped = (o.keySet & n.keySet).toSeq.sorted
      .filter(c => o(c) != n(c)).map(c => (c, "retyped", o(c), n(c)))
    added ++ removed ++ retyped
  }
}
