package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Scalar coercion / conversion functions (SURVEY.md §2.4, C1–C12; §1.2).
  *
  * Re-expresses the reference's per-row Python coercers
  * (fetch_clickup_data.py:782-801, 815-825, 846, 552-558, 596-598, 743-748)
  * as pure Spark column expressions — zero UDFs, so every one of these stays
  * inside whole-stage codegen and is usable at 100 TB scale.
  *
  * NOTE: these rely on lenient cast semantics (`spark.sql.ansi.enabled=false`)
  * to mirror Python's "return None instead of raising" behavior. Engine
  * sessions are created with ANSI off (see [[graft.GraftSession]]).
  */
object Coercers {

  /** C1 — epoch milliseconds (number or numeric string) → UTC timestamp.
    * Mirrors `pd.to_datetime(ms, unit='ms', utc=True)` guarded by safe_int
    * (fetch_clickup_data.py:815-817). Invalid input → null.
    */
  def epochMsToTs(c: Column): Column = timestamp_millis(safeInt(c))

  /** C2 — UTC timestamp → Oslo civil date (DST-correct).
    * Mirrors `ts.tz_convert('Europe/Oslo').date()` (fetch_clickup_data.py:822-825).
    */
  def osloDate(ts: Column): Column = to_date(from_utc_timestamp(ts, "Europe/Oslo"))

  /** C3 — duration ms → hours, defaulting 0.0 (fetch_clickup_data.py:819-820). */
  def msToHours(c: Column): Column =
    coalesce(safeFloat(c) / lit(3600000.0), lit(0.0))

  /** C4 — duration ms → hours rounded to 2 decimals, null preserved
    * (fetch_clickup_data.py:433-436: `round(ms/1000/3600, 2)`).
    */
  def msToRoundedHours(c: Column): Column =
    round(safeFloat(c) / lit(3600000.0), 2)

  /** C5 — SHA-256 hex digest of a UTF-8 string; null for null/empty input
    * (fetch_clickup_data.py:846).
    */
  def sha256OrNull(c: Column): Column =
    when(c.isNotNull && length(c) > 0, sha2(c, 256))

  /** C6 — safe_bool over a STRING column: trimmed, case-insensitive member of
    * {"true","1","yes","on"} → true, anything else (incl. null) → false
    * (fetch_clickup_data.py:782-791, string branch).
    */
  def safeBoolStr(c: Column): Column =
    coalesce(lower(trim(c)).isin("true", "1", "yes", "on"), lit(false))

  /** C6 — safe_bool over a NUMERIC column: nonzero → true, null → false. */
  def safeBoolNum(c: Column): Column =
    coalesce(c.cast("double") =!= 0.0, lit(false))

  /** C7 — safe_int: Python `int(float(x))` (truncation toward zero), null on
    * unparseable/NaN/infinite input (fetch_clickup_data.py:793-801 —
    * `int(float('inf'))` raises in Python, so infinities coerce to None;
    * without the magnitude guard Spark's cast would clamp to Long.MaxValue).
    */
  def safeInt(c: Column): Column = {
    val d = c.cast("double")
    when(d.isNotNull && !isnan(d) && abs(d) < lit(9.223372036854776e18),
      d.cast("long"))
  }

  /** C8 — safe_float: `float(x)` or null (arr, fetch_clickup_data.py:575-580). */
  def safeFloat(c: Column): Column = {
    val d = c.cast("double")
    when(d.isNotNull && !isnan(d), d)
  }

  /** C8 — safe_float with a default (hours_discount → 0.0,
    * fetch_clickup_data.py:561-569).
    */
  def safeFloatDefault(c: Column, default: Double): Column =
    coalesce(safeFloat(c), lit(default))

  /** C9 — checkbox string → bool: exactly "true" → true, else false
    * (fetch_clickup_data.py:738-740).
    */
  def checkboxBool(c: Column): Column =
    coalesce(c === "true", lit(false))

  /** C10 — split on ',', trim each token, drop empties; an input that yields
    * no tokens (null/empty/only-commas) produces the single-element sentinel
    * `[""]` so downstream explode still emits exactly one row
    * (fetch_clickup_data.py:552-558).
    */
  def splitTrimDropEmpty(c: Column): Column = {
    val cleaned = filter(
      transform(split(coalesce(c.cast("string"), lit("")), ","), t => trim(t)),
      t => length(t) > 0)
    when(size(cleaned) === 0, array(lit(""))).otherwise(cleaned)
  }

  /** C11 — array of structs with an `id` field → `", "`-joined id string;
    * falsy ids are dropped, missing/non-array input → ""
    * (fetch_clickup_data.py:743-748: `[str(x.get('id')) for x in v if x.get('id')]`).
    */
  def joinIds(c: Column): Column = {
    val ids = transform(
      filter(c, x => x.getField("id").isNotNull &&
        length(x.getField("id").cast("string")) > 0),
      x => x.getField("id").cast("string"))
    coalesce(array_join(ids, ", "), lit(""))
  }

  /** C12 — array of assignee structs → `", "`-joined username string;
    * missing usernames join as "" (fetch_clickup_data.py:596-598:
    * `', '.join([a.get('username', '') for a in assignees])`).
    */
  def joinNames(c: Column, field: String = "username"): Column =
    coalesce(
      array_join(transform(c, x => coalesce(x.getField(field).cast("string"), lit(""))), ", "),
      lit(""))

  /** T2 — stringify-or-null: cast to string, map empty string → null
    * (fetch_clickup_data.py:829, 843, 853-855, 868).
    */
  def strOrNull(c: Column): Column = {
    val s = c.cast("string")
    when(s.isNotNull && length(s) > 0, s)
  }
}
