package graft

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.functions.Coercers._

/** Property-style checks: ScalaCheck-generated inputs evaluated in one
  * Spark pass against a Scala reference implementation of the Python
  * coercer semantics (fetch_clickup_data.py:782-801).
  */
class PropertiesSpec extends SparkSpec {
  import spark.implicits._

  private def samples[A](g: Gen[A], n: Int): Seq[A] =
    (0 until n).flatMap(i => g.apply(Gen.Parameters.default, Seed(i.toLong)))

  test("safe_int property: matches int(float(x)) over generated numeric strings") {
    val gen = Gen.oneOf(
      Gen.chooseNum(-1e9, 1e9).map(d => f"$d%.3f"),
      Gen.chooseNum(-100000L, 100000L).map(_.toString),
      Gen.alphaStr.map(_.take(8)),
      Gen.const(""), Gen.const("NaN"))
    val in = samples(gen, 300)
    def ref(s: String): Option[Long] =
      try {
        val d = s.trim.toDouble
        if (d.isNaN) None else Some(d.toLong)
      } catch { case _: Throwable => None }
    val got = in.toDF("x").select(safeInt(col("x")).as("i")).collect()
      .map(r => if (r.isNullAt(0)) None else Some(r.getLong(0)))
    in.zip(got).foreach { case (s, g) =>
      assert(g == ref(s), s"safe_int('$s')")
    }
  }

  test("safe_float property: matches float(x)-or-default semantics") {
    val gen = Gen.oneOf(
      Gen.chooseNum(-1e12, 1e12).map(_.toString),
      Gen.alphaStr.map(_.take(6)), Gen.const(""))
    val in = samples(gen, 300)
    def ref(s: String): Option[Double] =
      try {
        val d = s.trim.toDouble
        if (d.isNaN) None else Some(d)
      } catch { case _: Throwable => None }
    val got = in.toDF("x")
      .select(safeFloat(col("x")).as("f"), safeFloatDefault(col("x"), 0.0).as("fd"))
      .collect()
    in.zip(got).foreach { case (s, r) =>
      val exp = ref(s)
      assert((if (r.isNullAt(0)) None else Some(r.getDouble(0))) == exp, s"safe_float('$s')")
      assert(r.getDouble(1) == exp.getOrElse(0.0), s"safe_float_default('$s')")
    }
  }

  test("split-trim sentinel property: output is never empty, tokens never blank unless sentinel") {
    val gen = Gen.listOf(Gen.oneOf("a", " b ", "", "c,d", ",", " ")).map(_.mkString(","))
    val in = samples(gen, 200)
    val got = in.toDF("x").select(splitTrimDropEmpty(col("x")).as("a")).collect()
      .map(_.getSeq[String](0).toSeq)
    in.zip(got).foreach { case (s, arr) =>
      val ref0 = s.split(",", -1).map(_.trim).filter(_.nonEmpty).toSeq
      val ref = if (ref0.isEmpty) Seq("") else ref0
      assert(arr == ref, s"split('$s')")
    }
  }

  test("jaccard bounds property: pair scores are in (0,1] and symmetric under id swap") {
    val docs = samples(Gen.listOfN(12,
      Gen.oneOf("alpha", "beta", "gamma", "delta", "epsilon")).map(_.mkString(" ")), 30)
      .zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text").withColumn("blk", lit(1))
    val out = graft.operators.DedupOps
      .ngramJaccardPairs(docs, "doc_id", "text", "blk", 2, 0.01).collect()
    out.foreach { r =>
      val j = r.getDouble(2)
      assert(j > 0.0 && j <= 1.0)
      assert(r.getLong(0) < r.getLong(1))
    }
  }
}
