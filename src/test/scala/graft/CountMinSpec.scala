package graft

import org.apache.spark.sql.functions._

import graft.functions.CountMinSketch
import graft.operators.ScaleOps

/** Count–Min sketch: JVM/column hash agreement, one-sided error, and the
  * exact-output guarantee of the heavy-hitter composition.
  */
class CountMinSpec extends SparkSpec {
  import spark.implicits._

  private def keysDf(keys: Seq[Long]) = keys.toDF("k")

  test("column-side estimate equals the JVM twin for every key (hash parity)") {
    val keys = Seq(0L, 1L, -1L, 42L, Long.MaxValue, Long.MinValue, 123456789L)
    val df = keysDf(keys)
    val sketch = CountMinSketch.build(df, "k", depth = 4, width = 64)
    val got = df.select($"k",
      CountMinSketch.estimate($"k", sketch, 4, 64).as("e"))
      .as[(Long, Long)].collect().toMap
    keys.foreach { k =>
      assert(got(k) == CountMinSketch.estimateJvm(k, sketch, 4, 64),
        s"column/JVM estimate mismatch for key $k")
    }
  }

  test("estimates never undercount (one-sided error), exact when uncrowded") {
    val keys = (1L to 50L).flatMap(k => Seq.fill(k.toInt % 5 + 1)(k))
    val sketch = CountMinSketch.build(keysDf(keys), "k", 4, 1024)
    val truth = keys.groupBy(identity).view.mapValues(_.size.toLong)
    truth.foreach { case (k, n) =>
      val e = CountMinSketch.estimateJvm(k, sketch, 4, 1024)
      assert(e >= n, s"undercount for $k: $e < $n")
    }
    // wide sketch, 50 keys → collisions vanish: estimates are exact
    assert(truth.forall { case (k, n) =>
      CountMinSketch.estimateJvm(k, sketch, 4, 1024) == n })
  }

  test("heavyHitters output is exact even with a deliberately crowded sketch") {
    val rows = (1L to 30L).flatMap(k => Seq.fill(if (k <= 3) 20 else 2)(k))
    val df = keysDf(rows)
    // width 4 → massive collisions → many false candidates, zero misses
    val got = ScaleOps.heavyHitters(df, "k", threshold = 20L,
      depth = 2, width = 4)
      .orderBy("k").as[(Long, Long)].collect().toSeq
    assert(got == Seq((1L, 20L), (2L, 20L), (3L, 20L)))
  }

  test("null keys form a group (SQL GROUP BY semantics, r6 VERDICT item 8) " +
    "even though the sketch itself skips them") {
    val df = (Seq.fill(25)(Some(7L)) ++ Seq.fill(30)(Option.empty[Long]))
      .toDF("k")
    val got = ScaleOps.heavyHitters(df, "k", threshold = 20L)
      .as[(Option[Long], Long)].collect().toSeq.sortBy(_._1)
    // the 30-row null group clears the threshold and is reported, exactly
    // like GROUP BY; below-threshold null groups are still dropped by the
    // exact HAVING
    assert(got == Seq((None, 30L), (Some(7L), 25L)))
    val below = ScaleOps.heavyHitters(df, "k", threshold = 28L)
      .as[(Option[Long], Long)].collect().toSeq
    assert(below == Seq((None, 30L)))
  }

  test("heavyHitters equals plain GROUP BY/HAVING on real-ish data") {
    val rows = (1L to 500L).map(i => i % 37)
    val df = keysDf(rows)
    val got = ScaleOps.heavyHitters(df, "k", threshold = 14L)
      .orderBy("k").as[(Long, Long)].collect().toSeq
    val want = df.groupBy("k").agg(count(lit(1)).as("n"))
      .filter($"n" >= 14).orderBy("k").as[(Long, Long)].collect().toSeq
    assert(got == want)
  }
}
