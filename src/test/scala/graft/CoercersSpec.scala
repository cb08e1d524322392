package graft

import org.apache.spark.sql.functions._
import org.scalatest.prop.TableDrivenPropertyChecks

import graft.functions.Coercers._

/** Truth tables for the scalar coercers (SURVEY.md §2.4), asserting the
  * exact Python edge semantics of fetch_clickup_data.py:782-801, 552-558,
  * 815-825, 846.
  */
class CoercersSpec extends SparkSpec with TableDrivenPropertyChecks {
  import spark.implicits._

  private def one[T](c: org.apache.spark.sql.Column): Any =
    Seq(1).toDF("x").select(c).collect()(0).get(0)

  test("C7 safe_int: int(float(x)) truncation, null on junk/NaN (ref :793-801)") {
    val cases = Table(("in", "out"),
      ("3.7", 3L), ("-2.9", -2L), ("42", 42L), ("1e3", 1000L), (" 5 ", 5L))
    forAll(cases) { (in, out) => assert(one(safeInt(lit(in))) == out) }
    for (bad <- Seq("abc", "", "NaN", "nan", "Infinity", "-Infinity", "1e300")) {
      assert(one(safeInt(lit(bad))) == null, s"safe_int($bad)")
    }
    assert(one(safeInt(lit(null).cast("string"))) == null)
  }

  test("C8 safe_float: float(x) or null; default variant returns 0.0 (ref :561-580)") {
    assert(one(safeFloat(lit("3.7"))) == 3.7)
    assert(one(safeFloat(lit("junk"))) == null)
    assert(one(safeFloatDefault(lit("junk"), 0.0)) == 0.0)
    assert(one(safeFloatDefault(lit(null).cast("string"), 0.0)) == 0.0)
    assert(one(safeFloatDefault(lit("2.5"), 0.0)) == 2.5)
  }

  test("C6 safe_bool: string branch accepts true/1/yes/on case-insensitively (ref :782-791)") {
    for (t <- Seq("true", "TRUE", " 1 ", "yes", "ON", "On")) {
      assert(one(safeBoolStr(lit(t))) == true, s"safe_bool($t)")
    }
    // numeric-looking strings are NOT truthy in the string branch
    for (f <- Seq("false", "0", "2.5", "no", "", "junk")) {
      assert(one(safeBoolStr(lit(f))) == false, s"safe_bool($f)")
    }
    assert(one(safeBoolStr(lit(null).cast("string"))) == false)
    // numeric branch: nonzero → true
    assert(one(safeBoolNum(lit(2.5))) == true)
    assert(one(safeBoolNum(lit(0.0))) == false)
    assert(one(safeBoolNum(lit(null).cast("double"))) == false)
  }

  test("C9 checkbox: exactly 'true' (ref :738-740)") {
    assert(one(checkboxBool(lit("true"))) == true)
    for (f <- Seq("false", "True", "1", ""))
      assert(one(checkboxBool(lit(f))) == false)
    assert(one(checkboxBool(lit(null).cast("string"))) == false)
  }

  test("C10 split-trim-dropEmpty keeps the [''] sentinel (ref :552-558)") {
    def arr(s: String): Seq[String] =
      one(splitTrimDropEmpty(lit(s))).asInstanceOf[scala.collection.Seq[String]].toSeq
    assert(arr("a, b ,c,") == Seq("a", "b", "c"))
    assert(arr("901501, 901502, ") == Seq("901501", "901502"))
    assert(arr("") == Seq(""))     // sentinel: empty input still yields one row
    assert(arr(",,,") == Seq("")) // only-commas → sentinel too
    assert(one(splitTrimDropEmpty(lit(null).cast("string")))
      .asInstanceOf[scala.collection.Seq[String]].toSeq == Seq(""))
  }

  test("C11 joinIds drops falsy ids; C12 joinNames keeps '' for missing (ref :743-748, :596-598)") {
    val df = Seq(1).toDF("x").select(
      joinIds(expr("array(named_struct('id','a1'), named_struct('id',''), named_struct('id','a2'))")).as("ids"),
      joinNames(expr("array(named_struct('username','jane'), named_struct('username',cast(null as string)))")).as("nm"))
    val r = df.collect()(0)
    assert(r.getString(0) == "a1, a2")
    assert(r.getString(1) == "jane, ")
  }

  test("C5 sha256: hex digest, null for empty/null email (ref :846)") {
    assert(one(sha256OrNull(lit("jane@example.com"))) ==
      java.security.MessageDigest.getInstance("SHA-256")
        .digest("jane@example.com".getBytes("UTF-8"))
        .map("%02x".format(_)).mkString)
    assert(one(sha256OrNull(lit(""))) == null)
    assert(one(sha256OrNull(lit(null).cast("string"))) == null)
  }

  test("C1 epoch-ms → UTC timestamp, null-safe on junk (ref :815-817)") {
    assert(one(epochMsToTs(lit("1717426800000"))).toString == "2024-06-03 15:00:00.0")
    assert(one(epochMsToTs(lit("junk"))) == null)
    assert(one(epochMsToTs(lit(null).cast("string"))) == null)
  }

  test("C2 Oslo civil date is DST-correct (ref :822-825)") {
    val cases = Table(("utc", "osloDate"),
      // winter (+1), year boundary
      ("2024-12-31 23:30:00", "2025-01-01"),
      // spring-forward day: 2024-03-31 02:00+01 → 03:00+02
      ("2024-03-30 23:30:00", "2024-03-31"),
      ("2024-03-31 01:30:00", "2024-03-31"),
      // fall-back day: 2024-10-27 03:00+02 → 02:00+01
      ("2024-10-26 22:30:00", "2024-10-27"),
      ("2024-10-27 00:30:00", "2024-10-27"),
      // summer (+2): 23:30Z rolls to next civil day
      ("2024-06-15 22:30:00", "2024-06-16"))
    forAll(cases) { (utc, d) =>
      assert(one(osloDate(lit(utc).cast("timestamp"))).toString == d)
    }
  }

  test("C3/C4 ms → hours: default vs null-preserving round (ref :819-820, :433-436)") {
    assert(one(msToHours(lit(7200000L))) == 2.0)
    assert(one(msToHours(lit(null).cast("long"))) == 0.0)
    assert(one(msToRoundedHours(lit(5000000L))) == 1.39)
    assert(one(msToRoundedHours(lit(null).cast("long"))) == null)
  }

  test("T2 strOrNull maps empty string to null (ref :829, :843)") {
    assert(one(strOrNull(lit(""))) == null)
    assert(one(strOrNull(lit("x"))) == "x")
    assert(one(strOrNull(lit(null).cast("string"))) == null)
    assert(one(strOrNull(lit(42))) == "42")
  }
}
