package graft

import org.apache.spark.sql.functions._

/** [[graft.plans.IntervalJoinRule]]: the optimizer extension that rewrites
  * naive abs-tolerance joins into the bucketed equi-join shape.
  */
class ExtensionRuleSpec extends SparkSpec {
  import spark.implicits._

  private def left = Seq((1L, 100L), (2L, 250L), (3L, -40L), (4L, 1000L))
    .toDF("lid", "lk")
  private def right = Seq((10L, 120L), (20L, 260L), (30L, -35L),
    (40L, 400L), (50L, 100L)).toDF("rid", "rk")

  private def absJoin(delta: Long) =
    left.join(right, abs($"lk" - $"rk") <= lit(delta))

  test("abs-tolerance join is rewritten: no nested-loop/cartesian, " +
    "bucket equi-join + explode in the plan") {
    val plan = absJoin(25L).queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan)
    assert(!plan.contains("CartesianProduct"), plan)
    assert(plan.contains("Generate explode"), plan)
  }

  test("rewritten join returns exactly the brute-force pairs " +
    "(boundary inclusive, negatives, zero-straddling buckets)") {
    val got = absJoin(25L).select("lid", "rid")
      .as[(Long, Long)].collect().toSet
    val l = left.as[(Long, Long)].collect()
    val r = right.as[(Long, Long)].collect()
    val want = (for {
      (lid, lk) <- l; (rid, rk) <- r if math.abs(lk - rk) <= 25L
    } yield (lid, rid)).toSet
    // sanity on the fixture: boundary (100 vs 120 at delta 25 -> in;
    // 250 vs 260 in; -40 vs -35 in; 100 vs 100 exact; 1000 matches none)
    assert(want == Set((1L, 10L), (1L, 50L), (2L, 20L), (3L, 30L)))
    assert(got == want)
  }

  test("orientation and delta=0 edge: lit >= abs(...) matches too; " +
    "delta 0 keeps only exact equality") {
    val got = left.join(right, lit(0L) >= abs($"lk" - $"rk"))
      .select("lid", "rid").as[(Long, Long)].collect().toSet
    assert(got == Set((1L, 50L))) // 100 == 100 only
  }

  test("ordinary equi joins are untouched (no Generate injected)") {
    val plan = left.join(right, $"lk" === $"rk").queryExecution
      .executedPlan.toString
    assert(!plan.contains("Generate"), plan)
  }

  test("non-canonical tolerance conditions fall through unrewritten " +
    "but still produce correct results") {
    // extra conjunct -> v1 scope leaves it alone (top node is And)
    val df = left.join(right,
      abs($"lk" - $"rk") <= lit(25L) && $"lid" =!= $"rid")
    assert(df.select("lid", "rid").as[(Long, Long)].collect().toSet ==
      Set((1L, 10L), (1L, 50L), (2L, 20L), (3L, 30L)))
  }
}
