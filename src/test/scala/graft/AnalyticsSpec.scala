package graft

import org.apache.spark.sql.functions._

import graft.operators.Analytics

/** Warehouse-analytics operators: profiling, histogram, cohorts, funnel. */
class AnalyticsSpec extends SparkSpec {
  import spark.implicits._

  test("profileColumns: nulls, exact distinct, lexical min/max per column") {
    val df = Seq(
      (Some("b"), Some(10L)), (Some("a"), Some(9L)),
      (None, Some(10L)), (Some("a"), None)
    ).toDF("s", "n")
    val out = Analytics.profileColumns(df, Seq("s", "n")).orderBy("col_name")
      .as[(String, Long, Long, Option[String], Option[String])]
      .collect().toSeq
    assert(out == Seq(
      ("n", 1L, 2L, Some("10"), Some("9")), // lexical: "10" < "9"
      ("s", 1L, 2L, Some("a"), Some("b")))) // distinct excludes nulls
  }

  test("profileColumns rejects an empty column list") {
    intercept[IllegalArgumentException] {
      Analytics.profileColumns(Seq(1).toDF("a"), Seq.empty)
    }
  }

  test("histogram: exact-cent bin edges, clamped under/overflow bins, " +
    "empty bins absent") {
    val df = Seq(-5.0, 0.0, 9.99, 10.0, 10.01, 25.0, 999.0).toDF("v")
    val out = Analytics.histogram(df, "v", lo = 0.0, width = 10.0, nBins = 3)
      .orderBy("bin").as[(Long, Double, Long)].collect().toSeq
    assert(out == Seq(
      (0L, 0.0, 3L),   // -5 clamps up, 0.0, 9.99
      (1L, 10.0, 2L),  // 10.0 lands on its edge, 10.01
      (2L, 20.0, 1L),  // 25.0; bin 3 would be empty -> absent? no: 999 -> top
      (3L, 30.0, 1L))) // overflow clamps into the open top bin
  }

  test("cohortRetention: month-offset triangle over a two-cohort fixture") {
    val df = Seq(
      (1L, "2024-01-05"), (1L, "2024-01-20"), (1L, "2024-03-09"), // u1: 0, 2
      (2L, "2024-02-11"),                                         // u2: 0
      (3L, "2024-01-02"), (3L, "2024-02-28")                      // u3: 0, 1
    ).toDF("u", "d").withColumn("ts", col("d").cast("timestamp"))
    val out = Analytics.cohortRetention(df, "u", "ts")
      .orderBy("cohort_month", "month_offset")
      .as[(String, Long, Long)].collect().toSeq
    assert(out == Seq(
      ("2024-01-01", 0L, 2L), // u1, u3 active in their cohort month
      ("2024-01-01", 1L, 1L), // u3 in Feb
      ("2024-01-01", 2L, 1L), // u1 in Mar
      ("2024-02-01", 0L, 1L))) // u2
  }

  test("cohortRetention: year boundary offsets are (Δyear)·12 + Δmonth") {
    val df = Seq((1L, "2023-11-15"), (1L, "2024-02-01"))
      .toDF("u", "d").withColumn("ts", col("d").cast("timestamp"))
    val out = Analytics.cohortRetention(df, "u", "ts")
      .orderBy("month_offset").as[(String, Long, Long)].collect().toSeq
    assert(out == Seq(("2023-11-01", 0L, 1L), ("2023-11-01", 3L, 1L)))
  }

  test("funnel: strict ordering against FIRST qualifying event per stage") {
    val df = Seq(
      // u1 completes: view@1, click@2, buy@3
      (1L, 1, "view"), (1L, 2, "click"), (1L, 3, "buy"),
      // u2: click BEFORE first view only → stops at view stage
      (2L, 2, "click"), (2L, 5, "view"),
      // u3: view then buy, no click → stops after view
      (3L, 1, "view"), (3L, 4, "buy"),
      // u4: anchored on FIRST view (t=1); click at 2 counts even though a
      // later view (t=9) exists; buy at 3 follows the first click
      (4L, 1, "view"), (4L, 9, "view"), (4L, 2, "click"), (4L, 3, "buy"),
      // u5: never views → excluded everywhere
      (5L, 1, "click"), (5L, 2, "buy")
    ).toDF("u", "t", "typ")
      .withColumn("ts", col("t").cast("timestamp"))
    val out = Analytics.funnel(df, "u", "ts", "typ",
      Seq("view", "click", "buy"))
      .orderBy("stage_idx").as[(Long, String, Long)].collect().toSeq
    assert(out == Seq(
      (1L, "view", 4L),   // u1 u2 u3 u4
      (2L, "click", 2L),  // u1 u4 (u2's click precedes their first view)
      (3L, "buy", 2L)))   // u1 u4 (u3 never clicked)
  }

  test("funnel: ties at the anchor do not count (strictly after)") {
    val df = Seq((1L, 1, "view"), (1L, 1, "click")).toDF("u", "t", "typ")
      .withColumn("ts", col("t").cast("timestamp"))
    val out = Analytics.funnel(df, "u", "ts", "typ", Seq("view", "click"))
      .orderBy("stage_idx").as[(Long, String, Long)].collect().toSeq
    assert(out == Seq((1L, "view", 1L), (2L, "click", 0L)))
  }

  test("hllDistinct: estimate within HLL error bounds, duplicate-invariant") {
    // 4000 distinct values in group a (each duplicated 3x), 3000 in group
    // b — both above the ~2.5m small-range floor (m=512) where the raw
    // estimate is valid; standard error 1.04/sqrt(512) ~ 4.6%, assert 4
    // sigma
    val rows = (0 until 4000).flatMap(i => Seq.fill(3)(("a", s"v$i"))) ++
      (0 until 3000).map(i => ("b", s"w$i"))
    val df = rows.toDF("g", "v")
    val got = Analytics.hllDistinct(df, Seq("g"), "v")
      .orderBy("g").as[(String, Double)].collect().toMap
    assert(math.abs(got("a") - 4000) / 4000.0 < 0.19, s"a=${got("a")}")
    assert(math.abs(got("b") - 3000) / 3000.0 < 0.19, s"b=${got("b")}")
    // duplicates cannot move a register max: dedup'd input gives the
    // exact same estimate
    val dedup = Analytics.hllDistinct(df.distinct(), Seq("g"), "v")
      .orderBy("g").as[(String, Double)].collect().toMap
    assert(got == dedup)
    // nulls are ignored
    val withNull = df.union(Seq(("a", null.asInstanceOf[String])).toDF("g", "v"))
    val gotN = Analytics.hllDistinct(withNull, Seq("g"), "v")
      .orderBy("g").as[(String, Double)].collect().toMap
    assert(gotN == got)
  }

  test("approxPercentilesBinned: within one bin width of exact, all-integer") {
    // group a: 1..10000 (uniform), group b: constant 42
    val rows = (1 to 10000).map(i => ("a", i.toLong)) ++
      Seq.fill(100)(("b", 42L))
    val df = rows.toDF("g", "cents")
    val out = Analytics.approxPercentilesBinned(df, Seq("g"), col("cents"),
      nBins = 256, ps = Seq(("p50", 0.5), ("p95", 0.95)))
      .orderBy("g").collect()
    val a = out(0); val b = out(1)
    assert(a.getLong(1) == 10000L && b.getLong(1) == 100L)
    // domain [1, 10000] in 256 bins -> width 40; approx within one width
    assert(math.abs(a.getLong(2) - 5000L) <= 40, s"p50=${a.getLong(2)}")
    assert(math.abs(a.getLong(3) - 9500L) <= 40, s"p95=${a.getLong(3)}")
    // a constant group: every value sits in one bin, so any percentile
    // lands inside that bin (the interpolation spreads WITHIN the bin —
    // still inside the one-bin-width error contract)
    assert(math.abs(b.getLong(2) - 42L) <= 40)
    assert(math.abs(b.getLong(3) - 42L) <= 40)
    // deterministic across reruns
    val again = Analytics.approxPercentilesBinned(df, Seq("g"), col("cents"),
      nBins = 256, ps = Seq(("p50", 0.5), ("p95", 0.95)))
      .orderBy("g").collect()
    assert(out.map(_.toSeq).toSeq == again.map(_.toSeq).toSeq)
  }

  test("hllDistinct rejects out-of-range precision") {
    val df = Seq(("a", "x")).toDF("g", "v")
    intercept[IllegalArgumentException] { Analytics.hllDistinct(df, Seq("g"), "v", p = 3) }
    intercept[IllegalArgumentException] { Analytics.hllDistinct(df, Seq("g"), "v", p = 13) }
  }

  test("frequentPairs: supports, threshold, lift; A-Priori prune is " +
    "lossless when minItemSupport <= minPairSupport") {
    val baskets = Seq(
      (1L, 1L), (1L, 2L), (1L, 3L),
      (2L, 1L), (2L, 2L),
      (3L, 1L), (3L, 2L), (3L, 4L), (3L, 4L), // dup (3,4) row dedupes
      (4L, 3L), (4L, 4L)
    ).toDF("bk", "it")
    val got = Analytics.frequentPairs(baskets, "bk", "it", 2L, 2L)
      .orderBy("item_a", "item_b")
      .as[(Long, Long, Long, Long, Long, Double)].collect().toSeq
    // only (1,2) reaches pair support 2 (it has 3); lift = 3·4/(3·3)
    assert(got == Seq((1L, 2L, 3L, 3L, 3L,
      BigDecimal(3.0 * 4 / 9).setScale(6,
        BigDecimal.RoundingMode.HALF_UP).toDouble)))
    // prune losslessness: minItemSupport 1 (no prune) = minItemSupport 2
    val unpruned = Analytics.frequentPairs(baskets, "bk", "it", 1L, 2L)
      .select("item_a", "item_b", "support")
      .as[(Long, Long, Long)].collect().toSeq.sorted
    val pruned = Analytics.frequentPairs(baskets, "bk", "it", 2L, 2L)
      .select("item_a", "item_b", "support")
      .as[(Long, Long, Long)].collect().toSeq.sorted
    assert(unpruned == pruned)
    // null basket/item rows are ignored
    val withNull = baskets.union(
      Seq((Option.empty[Long], Option(9L))).toDF("bk", "it"))
    assert(Analytics.frequentPairs(withNull, "bk", "it", 2L, 2L)
      .count() == 1L)
  }

  test("skyline: dominance on (max, min) dims; exact-tie rows all " +
    "survive; null dims excluded; multi-partition merge correct") {
    import graft.operators.SkylineOps
    val pts = Seq(
      (1L, 5.0, 5L), (2L, 3.0, 1L), (3L, 5.0, 7L),
      (4L, 2.0, 1L), (5L, 5.0, 5L))
      .toDF("id", "gain", "cost")
    val got = SkylineOps.skyline(pts.repartition(3), Seq("gain"), Seq("cost"))
      .select("id").as[Long].collect().toSeq.sorted
    // 1 dominates 3 (same gain, lower cost); 2 dominates 4; 1 and 5 tie
    assert(got == Seq(1L, 2L, 5L))
    // a row with a null dim is excluded, everything else unaffected
    val withNull = Seq((6L, Option.empty[Double], Option(1L)))
      .toDF("id", "gain", "cost")
    val got2 = SkylineOps.skyline(
      pts.select(col("id"), col("gain").cast("double").as("gain"),
        col("cost")).unionByName(
        withNull.select(col("id"), col("gain").cast("double").as("gain"),
          col("cost"))),
      Seq("gain"), Seq("cost"))
      .select("id").as[Long].collect().toSeq.sorted
    assert(got2 == Seq(1L, 2L, 5L))
    // single-objective degenerates to argmax (all ties kept)
    val one = SkylineOps.skyline(pts, Seq("gain"), Nil)
      .select("id").as[Long].collect().toSeq.sorted
    assert(one == Seq(1L, 3L, 5L))
    intercept[IllegalArgumentException] { SkylineOps.skyline(pts, Nil, Nil) }
  }

  test("transitionMatrix: per-entity lag adjacency, ties break by id, " +
    "row-normalized p") {
    import java.sql.Timestamp
    def ts(s: String) = Timestamp.valueOf(s)
    val ev = Seq(
      (1L, ts("2024-01-01 00:00:01"), 1L, "A"),
      (1L, ts("2024-01-01 00:00:02"), 2L, "B"),
      (1L, ts("2024-01-01 00:00:03"), 3L, "A"),
      (2L, ts("2024-01-01 00:00:01"), 4L, "A"),
      (2L, ts("2024-01-01 00:00:02"), 5L, "B"),
      // u3: identical ts — order must fall back to event_id (C before D)
      (3L, ts("2024-01-01 00:00:09"), 6L, "C"),
      (3L, ts("2024-01-01 00:00:09"), 7L, "D")
    ).toDF("user_id", "ts", "event_id", "event_type")
    val got = Analytics.transitionMatrix(ev, "user_id", "ts", "event_id",
      "event_type").orderBy("from_state", "to_state")
      .as[(String, String, Long, Double)].collect().toSeq
    assert(got == Seq(("A", "B", 2L, 1.0), ("B", "A", 1L, 1.0),
      ("C", "D", 1L, 1.0)))
  }

  test("madOutliers: doubled-unit integer medians, .5-median groups, " +
    "heavy tail flagged") {
    val df = Seq(
      ("g1", 1.0), ("g1", 1.0), ("g1", 1.0), ("g1", 1.0), ("g1", 100.0),
      ("g2", 1.0), ("g2", 2.0)
    ).toDF("g", "v")
    val got = Analytics.madOutliers(df, "g", "v").orderBy("g")
      .as[(String, Long, Long, Long, Long)].collect().toSeq
    // g1: med2 = 2·100c = 200, devs (half-cents) [0,0,0,0,19800] →
    //     mad2 = 0, outlier = the 100.0 row only
    // g2: med = 150c → med2 = 300; devs [100, 100] → mad2 = 200;
    //     200 > 600 false → 0 outliers
    assert(got == Seq(("g1", 5L, 1L, 200L, 0L), ("g2", 2L, 0L, 300L, 200L)))
  }

  test("groupedTrend: exact integer sufficient statistics; slope in " +
    "cents/min; degenerate groups carry NULL") {
    import java.sql.Timestamp
    def ts(s: String) = Timestamp.valueOf(s)
    val df = Seq(
      ("a", ts("2024-01-01 00:00:00"), 1.0),
      ("a", ts("2024-01-01 00:10:00"), 2.0),   // +100 cents over 10 min
      ("b", ts("2024-01-01 00:05:00"), 7.0),   // single event
      ("c", ts("2024-01-01 00:07:01"), 1.0),   // same minute twice
      ("c", ts("2024-01-01 00:07:59"), 9.0)
    ).toDF("u", "ts", "v")
    val got = Analytics.groupedTrend(df, "u", "ts", "v",
      anchor = "2024-01-01 00:00:00").orderBy("u")
      .collect().map(r => (r.getString(0), r.getLong(1),
        if (r.isNullAt(2)) None else Some(r.getDouble(2)))).toSeq
    assert(got == Seq(("a", 2L, Some(10.0)), ("b", 1L, None),
      ("c", 2L, None)))
  }

  test("cusumAlarms: window form equals the sequential recursion; gap " +
    "days count as zero; surge and drop alarms fire where expected") {
    import java.sql.Timestamp
    def ts(s: String) = Timestamp.valueOf(s)
    // group g: days 1,2 quiet (3 events), day 3 MISSING (gap -> 0),
    // days 4,5 surge (12 each); target 5, threshold 8
    val rows =
      (1 to 3).map(i => ("g", ts(f"2024-01-01 0$i:00:00"))) ++
      (1 to 3).map(i => ("g", ts(f"2024-01-02 0$i:00:00"))) ++
      (1 to 12).map(i => ("g", ts(f"2024-01-04 ${i}%02d:00:00"))) ++
      (1 to 12).map(i => ("g", ts(f"2024-01-05 ${i}%02d:00:00")))
    val got = Analytics.cusumAlarms(rows.toDF("g", "ts"), "g", "ts",
      target = 5L, threshold = 8L)
      .orderBy("day").collect()
      .map(r => (r.getString(1),
        (r.getLong(2), r.getLong(3), r.getLong(4),
          r.getBoolean(5), r.getBoolean(6))))
    // sequential reference: S=max(0,S+(x-5)), T=max(0,T+(5-x))
    var s = 0L; var t = 0L
    val ref = Seq(("2024-01-01", 3L), ("2024-01-02", 3L), ("2024-01-03", 0L),
      ("2024-01-04", 12L), ("2024-01-05", 12L)).map { case (d, x) =>
      s = math.max(0L, s + (x - 5)); t = math.max(0L, t + (5 - x))
      (d, (x, s, t, s > 8, t > 8))
    }
    assert(got.toSeq == ref)
    // day 3 (the gap) drives the drop statistic to 2+2+5=9 -> drop alarm
    assert(ref(2)._2._3 == 9L && ref(2)._2._5)
    // the surge side crosses after the second surge day: 7 then 14
    assert(!ref(3)._2._4 && ref(4)._2._4)
  }

  test("seasonalAnomalies: integer cross-multiplied gate; unseen bucket " +
    "on trained dow flags; untrained dow does not; null ts excluded") {
    import java.sql.Timestamp
    def ts(s: String) = Timestamp.valueOf(s)
    // train (before Jan 15): two Mondays at 10h with 2 events each →
    // base_n=4, n_days=2 (mean 2/h); one Monday 11h event → base_n=1
    val rows = Seq(
      ts("2024-01-01 10:00:00"), ts("2024-01-01 10:30:00"),
      ts("2024-01-08 10:00:00"), ts("2024-01-08 10:30:00"),
      ts("2024-01-08 11:00:00"),
      // eval: Monday Jan 15 10h ×5 (5·2 > 2·4 → anomaly),
      // Monday 11h ×1 (1·2 ≤ 2·1 → fine),
      // Monday 9h ×1 (unseen bucket, trained dow: 1·2 > 0 → anomaly),
      // Tuesday Jan 16 10h ×9 (dow never trained: 9·0 > 0 false)
      ts("2024-01-15 10:01:00"), ts("2024-01-15 10:02:00"),
      ts("2024-01-15 10:03:00"), ts("2024-01-15 10:04:00"),
      ts("2024-01-15 10:05:00"),
      ts("2024-01-15 11:01:00"),
      ts("2024-01-15 09:01:00"),
      ts("2024-01-16 10:01:00"), ts("2024-01-16 10:02:00"),
      ts("2024-01-16 10:03:00"), ts("2024-01-16 10:04:00"),
      ts("2024-01-16 10:05:00"), ts("2024-01-16 10:06:00"),
      ts("2024-01-16 10:07:00"), ts("2024-01-16 10:08:00"),
      ts("2024-01-16 10:09:00")
    ).map(Option(_)) :+ Option.empty[Timestamp]
    val df = rows.toDF("ts")
    val got = Analytics.seasonalAnomalies(df, "ts", "2024-01-15 00:00:00")
      .orderBy("dt", "hr")
      .collect().map(r => (r.getString(0), r.getInt(2),
        r.getLong(3), r.getLong(4), r.getLong(5), r.getBoolean(6))).toSeq
    assert(got == Seq(
      ("2024-01-15", 9, 1L, 0L, 2L, true),
      ("2024-01-15", 10, 5L, 4L, 2L, true),
      ("2024-01-15", 11, 1L, 1L, 2L, false),
      ("2024-01-16", 10, 9L, 0L, 0L, false)))
  }

  test("distributionStats: hand-computed entropy/HHI/top-share; uniform " +
    "maxes entropy; nulls counted apart") {
    val df = Seq("a", "a", "a", "b", null).toDF("k")
    val r = Analytics.distributionStats(df, "k").collect().head
    // census a=3, b=1: N=4, H = ln4 − (3ln3 + 1ln1)/4
    val h = BigDecimal(math.log(4.0) - 3.0 * math.log(3.0) / 4.0)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert((r.getLong(0), r.getLong(1), r.getLong(2)) == ((4L, 2L, 1L)))
    assert(r.getDouble(3) == h)
    assert(r.getDouble(4) == (9.0 + 1.0) / 16.0)  // HHI = (9+1)/16
    assert(r.getDouble(5) == 0.75)
    // two equally-likely classes → entropy = ln 2 exactly
    val u = Analytics.distributionStats(
      Seq("x", "y").toDF("k"), "k").collect().head
    assert(u.getDouble(3) == BigDecimal(math.log(2.0))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
  }

  test("chiSquareIndependence: independent 2x2 scores zero; " +
    "hand-computed dependent table; dof; nulls excluded") {
    // perfectly independent: o == e everywhere → chi2 = 0
    val ind = Seq(("a", "x"), ("a", "y"), ("b", "x"), ("b", "y"),
      (null, "x"), ("a", null)).toDF("u", "v")
    val ri = Analytics.chiSquareIndependence(ind, "u", "v").collect().head
    assert((ri.getLong(0), ri.getLong(1), ri.getLong(2), ri.getLong(3),
      ri.getDouble(4)) == ((4L, 2L, 2L, 1L, 0.0)))
    // dependent 2x2: cells (a,x)=3 (a,y)=1 (b,x)=1 (b,y)=3 → N=8,
    // every e=2, chi2 = 4·(1²/2) = 2
    val dep = (Seq.fill(3)(("a", "x")) ++ Seq(("a", "y"), ("b", "x")) ++
      Seq.fill(3)(("b", "y"))).toDF("u", "v")
    val rd = Analytics.chiSquareIndependence(dep, "u", "v").collect().head
    assert(rd.getDouble(4) == 2.0 && rd.getLong(3) == 1L)
    // structural zero: cell (b,y) never observed. The Σo²/e − N identity
    // still charges its (0−e)²/e = e term; a sum over observed cells
    // would understate. Hand: e = (1.5, .5, 1.5, .5) → χ² = 4/3
    val sz = Seq(("a", "x"), ("a", "y"), ("b", "x"), ("b", "x"))
      .toDF("u", "v")
    val rz = Analytics.chiSquareIndependence(sz, "u", "v").collect().head
    assert(rz.getDouble(4) == 1.333333)
  }

  test("mutualInformation: independent table scores 0/0/0; perfect " +
    "dependence scores ln2/1/1; degenerate margin NULLs nmi and V; " +
    "nulls excluded") {
    // independent 2x2 (+ null rows that must be excluded): every cell
    // o = e → MI = 0, NMI = 0, V = 0
    val ind = Seq(("a", "x"), ("a", "y"), ("b", "x"), ("b", "y"),
      (null, "x"), ("a", null)).toDF("u", "v")
    val ri = Analytics.mutualInformation(ind, "u", "v").collect().head
    assert((ri.getLong(0), ri.getLong(1), ri.getLong(2)) == ((4L, 2L, 2L)))
    assert((ri.getDouble(3), ri.getDouble(4), ri.getDouble(5)) ==
      ((0.0, 0.0, 0.0)))
    // perfect dependence: (a,x)=2, (b,y)=2 → MI = ln 2, H(A) = H(B) =
    // ln 2 → NMI = 1; chi2 = n·min(r−1) → V = 1
    val dep = Seq(("a", "x"), ("a", "x"), ("b", "y"), ("b", "y"))
      .toDF("u", "v")
    val rdp = Analytics.mutualInformation(dep, "u", "v").collect().head
    assert((rdp.getDouble(3), rdp.getDouble(4), rdp.getDouble(5)) ==
      ((0.693147, 1.0, 1.0)))
    // degenerate B margin (one category): zero entropy / zero dof sides
    // carry NULL, MI is 0 by construction
    val deg = Seq(("a", "x"), ("b", "x"), ("a", "x")).toDF("u", "v")
    val rg = Analytics.mutualInformation(deg, "u", "v").collect().head
    assert(rg.getLong(2) == 1L && rg.getDouble(3) == 0.0 &&
      rg.isNullAt(4) && rg.isNullAt(5))
  }

  test("groupedOls2: exact plane recovered with r2=1; collinear " +
    "regressors carry NULL coefficients; nulls excluded") {
    // group a lies exactly on y = 2 + 3·x1 − x2 (integer points, so
    // the float solve is exact); group b has x2 = x1 (singular)
    val rows = Seq(
      ("a", 0L, 0L, 2L), ("a", 1L, 0L, 5L), ("a", 0L, 1L, 1L),
      ("a", 1L, 1L, 4L), ("a", 2L, 1L, 7L),
      ("b", 0L, 0L, 1L), ("b", 1L, 1L, 2L), ("b", 2L, 2L, 3L))
    val df = rows.toDF("g", "x1", "x2", "y")
      .unionByName(Seq(("a", Option(9L), Option.empty[Long], Option(9L)))
        .toDF("g", "x1", "x2", "y"))
    val got = Analytics.groupedOls2(df, "g", "x1", "x2", "y")
      .orderBy("g").collect()
    val a = got(0)
    assert((a.getString(0), a.getLong(1)) == (("a", 5L)))
    assert((a.getDouble(2), a.getDouble(3), a.getDouble(4),
      a.getDouble(5)) == ((2.0, 3.0, -1.0, 1.0)))
    val b = got(1)
    assert(b.getLong(1) == 3L && b.isNullAt(2) && b.isNullAt(3) &&
      b.isNullAt(4) && b.isNullAt(5))
  }

  test("groupedPartialCorr: independent control keeps the association " +
    "(partial 1 for y=x+z); collinear control zeroes the denominator " +
    "to NULL; constant control NULLs the control correlations") {
    // a: y = x + z over the x⊥z grid → r_xy = r_yz = 1/√2, r_xz = 0,
    // partial = 1. b: x = y = z → both control r's are 1, den = 0.
    // c: constant z → zero variance, control r's NULL.
    val a = Seq((0L, 0L, 0L), (0L, 1L, 1L), (1L, 0L, 1L), (1L, 1L, 2L))
      .map { case (x, z, y) => ("a", x, y, z) }
    val b = Seq(0L, 1L, 2L).map(v => ("b", v, v, v))
    val c = Seq((0L, 5L, 0L), (1L, 5L, 1L), (2L, 5L, 2L))
      .map { case (x, z, y) => ("c", x, y, z) }
    val got = Analytics.groupedPartialCorr((a ++ b ++ c)
        .toDF("g", "x", "y", "z"), "g", "x", "y", "z")
      .orderBy("g").collect()
    val ra = got(0)
    assert((ra.getDouble(2), ra.getDouble(3), ra.getDouble(4),
      ra.getDouble(5)) == ((0.70710678, 0.0, 0.70710678, 1.0)))
    val rb = got(1)
    assert(rb.getDouble(2) == 1.0 && rb.getDouble(3) == 1.0 &&
      rb.getDouble(4) == 1.0 && rb.isNullAt(5))
    val rc = got(2)
    assert(rc.getDouble(2) == 1.0 && rc.isNullAt(3) && rc.isNullAt(4) &&
      rc.isNullAt(5))
  }

  test("oneWayAnova: hand-computed F and eta2; zero within-variance " +
    "NULLs F but keeps eta2=1; single group NULLs F with eta2=0; " +
    "nulls excluded") {
    // a = {0,2}, b = {4,6}: SSB = 16, SSW = 4, F = (16/1)/(4/2) = 8,
    // eta2 = 16/20 = 0.8
    val df = Seq(("a", 0L), ("a", 2L), ("b", 4L), ("b", 6L))
      .toDF("g", "v")
      .unionByName(Seq(("a", Option.empty[Long])).toDF("g", "v"))
    val r = Analytics.oneWayAnova(df, "g", "v").collect().head
    assert((r.getLong(0), r.getLong(1), r.getDouble(2), r.getDouble(3)) ==
      ((4L, 2L, 8.0, 0.8)))
    // perfectly separated constants: SSW = 0 → F undefined, eta2 = 1
    val sep = Seq(("a", 1L), ("a", 1L), ("b", 5L), ("b", 5L)).toDF("g", "v")
    val rs = Analytics.oneWayAnova(sep, "g", "v").collect().head
    assert(rs.isNullAt(2) && rs.getDouble(3) == 1.0)
    // one group: no between-variance to test
    val one = Seq(("a", 1L), ("a", 3L)).toDF("g", "v")
    val ro = Analytics.oneWayAnova(one, "g", "v").collect().head
    assert(ro.getLong(1) == 1L && ro.isNullAt(2) && ro.getDouble(3) == 0.0)
  }

  test("kruskalWallis: hand H without and with midrank ties; all-tied " +
    "panel zeroes H and NULLs the tie correction; single group NULL") {
    // no ties: ranks 1..4, R_a=3, R_b=7 → H = 0.6·29 − 15 = 2.4, C = 1
    val plain = Seq(("a", 1L), ("a", 2L), ("b", 3L), ("b", 4L))
      .toDF("g", "v")
    val rp = Analytics.kruskalWallis(plain, "g", "v").collect().head
    assert((rp.getLong(0), rp.getLong(1), rp.getDouble(2),
      rp.getDouble(3)) == ((4L, 2L, 2.4, 2.4)))
    // tied pairs: midranks 1.5/3.5 give the same rank sums, H = 2.4,
    // but C = 1 − 12/60 = 0.8 → H' = 3.0
    val tied = Seq(("a", 1L), ("a", 1L), ("b", 2L), ("b", 2L))
      .toDF("g", "v")
    val rt = Analytics.kruskalWallis(tied, "g", "v").collect().head
    assert((rt.getDouble(2), rt.getDouble(3)) == ((2.4, 3.0)))
    // every row the same value: H = 0 and the tie correction vanishes
    val flat = Seq(("a", 5L), ("a", 5L), ("b", 5L), ("b", 5L))
      .toDF("g", "v")
    val rf = Analytics.kruskalWallis(flat, "g", "v").collect().head
    assert(rf.getDouble(2) == 0.0 && rf.isNullAt(3))
    // one group: nothing to compare
    val one = Seq(("a", 1L), ("a", 2L)).toDF("g", "v")
    val ro1 = Analytics.kruskalWallis(one, "g", "v").collect().head
    assert(ro1.getLong(1) == 1L && ro1.isNullAt(2) && ro1.isNullAt(3))
  }

  test("brownForsythe: hand F for odd and even group medians; " +
    "internally-constant groups NULL; single group NULL") {
    // medians 2 and 5; doubled deviations z=[2,0,14],[2,0,2] →
    // F = (24/1)/(117.333/4) = 0.818182
    val odd = Seq(("a", 1L), ("a", 2L), ("a", 9L),
      ("b", 4L), ("b", 5L), ("b", 6L)).toDF("g", "v")
    val ro = Analytics.brownForsythe(odd, "g", "v").collect().head
    assert((ro.getLong(0), ro.getLong(1), ro.getDouble(2)) ==
      ((6L, 2L, 0.818182)))
    // even group a=[1,3]: 2m=4, z=[2,2]; b=[10,10,14]: 2m=20, z=[0,0,8]
    // → F = 0.0375
    val even = Seq(("a", 1L), ("a", 3L),
      ("b", 10L), ("b", 10L), ("b", 14L)).toDF("g", "v")
    assert(Analytics.brownForsythe(even, "g", "v")
      .collect().head.getDouble(2) == 0.0375)
    // every group internally constant: SSW = 0, no spread to compare
    val flat = Seq(("a", 5L), ("a", 5L), ("b", 7L), ("b", 7L))
      .toDF("g", "v")
    assert(Analytics.brownForsythe(flat, "g", "v").collect().head.isNullAt(2))
    // one group
    val one2 = Seq(("a", 1L), ("a", 9L)).toDF("g", "v")
    assert(Analytics.brownForsythe(one2, "g", "v").collect().head.isNullAt(2))
  }

  test("kendallTau: +1 / -1 on monotone data, hand tau-b under x ties, " +
    "all-x-tied NULL, census cap enforced") {
    val up = Seq((1L, 1L), (2L, 2L), (3L, 3L)).toDF("x", "y")
    val ru = Analytics.kendallTau(up, "x", "y").collect().head
    assert((ru.getLong(0), ru.getLong(1), ru.getLong(2), ru.getLong(3),
      ru.getDouble(4)) == ((3L, 3L, 3L, 0L, 1.0)))
    val down = Seq((1L, 3L), (2L, 2L), (3L, 1L)).toDF("x", "y")
    assert(Analytics.kendallTau(down, "x", "y")
      .collect().head.getDouble(4) == -1.0)
    // x ties: C=2, D=0, dx=(6-2)/2=2, dy=3 → tau = 2/sqrt(6) = 0.816497
    val tied = Seq((1L, 1L), (1L, 2L), (2L, 3L)).toDF("x", "y")
    assert(Analytics.kendallTau(tied, "x", "y")
      .collect().head.getDouble(4) == 0.816497)
    // all x tied: no orderable pair on x
    val flatx = Seq((1L, 1L), (1L, 2L)).toDF("x", "y")
    assert(Analytics.kendallTau(flatx, "x", "y").collect().head.isNullAt(4))
    // the quadratic-join guard is enforced, not advisory
    intercept[IllegalArgumentException] {
      Analytics.kendallTau(up, "x", "y", maxCells = 2).collect()
    }
  }

  test("associationRules: hand support/confidence/lift, deterministic " +
    "order, duplicate membership counted once, oversized basket excluded") {
    val rows = Seq(
      ("b1", "A"), ("b1", "A"), ("b1", "B"), ("b1", "C"),
      ("b2", "A"), ("b2", "B"), ("b3", "A"), ("b3", "C"),
      ("b4", "B"), ("b4", "C"), ("b5", "A"), ("b5", "B"),
      // a 4-item basket: excluded entirely under maxBasketSize = 3
      ("b6", "A"), ("b6", "B"), ("b6", "C"), ("b6", "D"))
      .toDF("bk", "it")
    val got = Analytics.associationRules(rows, "bk", "it",
      minPairCount = 1L, maxBasketSize = 3, topK = 10)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2),
        r.getDouble(6), r.getDouble(7), r.getDouble(8)))
    assert(got.toSeq == Seq(
      ("A", "B", 3L, 0.6, 0.75, 0.9375),
      ("B", "A", 3L, 0.6, 0.75, 0.9375),
      ("C", "A", 2L, 0.4, 0.666667, 0.833333),
      ("C", "B", 2L, 0.4, 0.666667, 0.833333),
      ("A", "C", 2L, 0.4, 0.5, 0.833333),
      ("B", "C", 2L, 0.4, 0.5, 0.833333)))
    assert(!got.exists(r => r._1 == "D" || r._2 == "D"))
  }

  test("groupedPearson: perfect +/-1 lines, zero-variance and single-row " +
    "groups NULL, null coords excluded") {
    val df = Seq(
      ("a", Some(0L), Some(0L)), ("a", Some(1L), Some(2L)),
      ("a", Some(2L), Some(4L)),
      ("b", Some(0L), Some(1L)), ("b", Some(1L), Some(1L)),
      ("c", Some(0L), Some(0L)), ("c", Some(1L), Some(-1L)),
      ("d", Some(5L), Some(5L)),
      ("a", None, Some(9L)), ("a", Some(9L), None)
    ).toDF("g", "x", "y")
    val got = Analytics.groupedPearson(df, "g", "x", "y").orderBy("g")
      .collect().map(r => (r.getString(0), r.getLong(1),
        if (r.isNullAt(2)) None else Some(r.getDouble(2)))).toSeq
    assert(got == Seq(("a", 3L, Some(1.0)), ("b", 2L, None),
      ("c", 2L, Some(-1.0)), ("d", 1L, None)))
  }

  test("psi: identical slices score 0; hand-computed shifted mix; " +
    "one-sided bins skipped and counted, not epsilon-fudged") {
    val ref = Seq(10.0, 10.0, 10.0, 30.0).toDF("v")   // bins 0×3, 1×1
    val same = Analytics.psi(ref, ref, "v", lo = 0.0, width = 20.0,
      nBins = 5).collect().head
    assert((same.getLong(0), same.getLong(1), same.getLong(2),
      same.getLong(3), same.getDouble(4)) == ((4L, 4L, 2L, 0L, 0.0)))
    // cur: bins 0×1, 1×3  → psi = (.75−.25)ln3 + (.25−.75)ln(1/3) = ln3
    val cur = Seq(10.0, 30.0, 30.0, 30.0).toDF("v")
    val drift = Analytics.psi(ref, cur, "v", 0.0, 20.0, 5).collect().head
    val ln3 = BigDecimal(0.5 * math.log(3.0) - 0.5 * math.log(1.0 / 3.0))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(drift.getDouble(4) == ln3)
    // one-sided bin: cur2 adds bin 2 (50.0) absent from ref → skipped=1
    val cur2 = Seq(10.0, 30.0, 50.0).toDF("v")
    val sk = Analytics.psi(ref, cur2, "v", 0.0, 20.0, 5).collect().head
    assert(sk.getLong(2) == 2L && sk.getLong(3) == 1L)
  }

  test("interArrivalStats: hand gaps, .5 median in doubled units, exact " +
    "p90 rank, single-event entities absent, ts tiebreak by id") {
    import java.sql.Timestamp
    def ts(s: String) = Timestamp.valueOf(s)
    val ev = Seq(
      // u1 gaps: 10, 20, 30, 40 s → med2 = 50 (25.0·2), p90 rank
      // ceil(3.6)=4 → 40; min 10 max 40
      (1L, 1L, ts("2024-01-01 00:00:00")),
      (1L, 2L, ts("2024-01-01 00:00:10")),
      (1L, 3L, ts("2024-01-01 00:00:30")),
      (1L, 4L, ts("2024-01-01 00:01:00")),
      (1L, 5L, ts("2024-01-01 00:01:40")),
      // u2: equal ts — id order makes gaps (0, 5)
      (2L, 6L, ts("2024-01-01 00:00:00")),
      (2L, 7L, ts("2024-01-01 00:00:00")),
      (2L, 8L, ts("2024-01-01 00:00:05")),
      // u3: single event → no gaps → absent
      (3L, 9L, ts("2024-01-01 00:00:00"))
    ).toDF("user_id", "event_id", "ts")
    val got = Analytics.interArrivalStats(ev, "user_id", "ts", "event_id")
      .orderBy("user_id")
      .as[(Long, Long, Long, Long, Long, Long)].collect().toSeq
    assert(got == Seq((1L, 4L, 10L, 40L, 50L, 40L),
      (2L, 2L, 0L, 5L, 5L, 5L)))
  }

  test("hllSetAlgebra: identical segments give inter = a = union; exact " +
    "counts right; disjointish segments keep jaccard in [0,1]") {
    val a = (1L to 200L).toDF("u")
    val same = Analytics.hllSetAlgebra(a, a, "u", p = 5).collect().head
    // identical registers: union == a == b, inclusion-exclusion == a
    assert(same.getDouble(0) == same.getDouble(2))
    assert(same.getDouble(3) == same.getDouble(0))
    assert(same.getDouble(4) == 1.0)
    assert(same.getLong(5) == 200L && same.getLong(6) == 200L)
    // overlapping halves: A = 1..200, B = 101..300 → inter 100, union 300
    val b = (101L to 300L).toDF("u")
    val ov = Analytics.hllSetAlgebra(a, b, "u", p = 5).collect().head
    assert(ov.getLong(5) == 300L && ov.getLong(6) == 100L)
    assert(ov.getDouble(4) >= 0.0 && ov.getDouble(4) <= 1.0)
    assert(ov.getDouble(2) >= ov.getDouble(0) - 0.01)  // union est ≥ max side
  }

  test("ksStatistic: identical slices 0; hand-computed shifted sample; " +
    "disjoint supports reach 1; nulls excluded") {
    val a = Seq(Some(1.0), Some(2.0), Some(3.0), Some(4.0), None).toDF("v")
    val same = Analytics.ksStatistic(a, a, "v").collect().head
    assert((same.getLong(0), same.getLong(1), same.getDouble(2)) ==
      ((4L, 4L, 0.0)))
    // b shifted by +2: sup|F| = 1/2 at v in {2,3,4}
    val b = Seq(3.0, 4.0, 5.0, 6.0).toDF("v")
    val sh = Analytics.ksStatistic(a, b, "v").collect().head
    assert(sh.getDouble(2) == 0.5)
    // disjoint supports: D = 1
    val c = Seq(100.0, 101.0).toDF("v")
    assert(Analytics.ksStatistic(a, c, "v").collect().head.getDouble(2)
      == 1.0)
  }

  test("ksStatisticByGroup: per-group sup independent; one-sided group " +
    "carries 1.0; null group excluded") {
    val a = Seq(("g1", 1.0), ("g1", 2.0), ("g2", 5.0), ("only_a", 7.0),
      (null.asInstanceOf[String], 9.0)).toDF("g", "v")
    val b = Seq(("g1", 1.0), ("g1", 2.0), ("g2", 6.0)).toDF("g", "v")
    val got = Analytics.ksStatisticByGroup(a, b, "g", "v").orderBy("g")
      .as[(String, Long, Long, Double)].collect().toSeq
    assert(got == Seq(("g1", 2L, 2L, 0.0), ("g2", 1L, 1L, 1.0),
      ("only_a", 1L, 0L, 1.0)))
  }

  test("mannWhitneyU: exchangeable 0; complete separation ±1; ties get " +
    "exact midranks in doubled units") {
    val a = Seq(1.0, 2.0).toDF("v")
    val b = Seq(3.0, 4.0).toDF("v")
    // a entirely below b: U_a = 0 → u2 = 0, r = −1
    val lo = Analytics.mannWhitneyU(a, b, "v").collect().head
    assert((lo.getLong(2), lo.getDouble(3)) == ((0L, -1.0)))
    val hi = Analytics.mannWhitneyU(b, a, "v").collect().head
    assert((hi.getLong(2), hi.getDouble(3)) == ((8L, 1.0)))
    // identical → exchangeable: r = 0, U_a = na·nb/2 → u2 = na·nb
    val same = Analytics.mannWhitneyU(a, a, "v").collect().head
    assert((same.getLong(2), same.getDouble(3)) == ((4L, 0.0)))
    // ties: a=[1,1], b=[1,3] → pooled ranks of the three 1s are midrank
    // 2 (mr2=4): R_a = 4, U_a = 4−3 = 1 → u2 = 2, r = 2·1/4−1 = −0.5
    val ta = Seq(1.0, 1.0).toDF("v")
    val tb = Seq(1.0, 3.0).toDF("v")
    val tied = Analytics.mannWhitneyU(ta, tb, "v").collect().head
    assert((tied.getLong(2), tied.getDouble(3)) == ((2L, -0.5)))
  }

  test("benfordDigits: digits from the cents string; nonpositive/null " +
    "excluded; shares sum to 1; benford column exact") {
    val df = Seq(Some(1.23), Some(19.99), Some(2.5), Some(0.009),
      Some(-5.0), None, Some(900.0)).toDF("v")
    // cents: 123→1, 1999→1, 250→2, 0 (excluded), -500 (excluded), 90000→9
    val got = Analytics.benfordDigits(df, "v").orderBy("digit")
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getDouble(2)))
      .toSeq
    assert(got == Seq((1, 2L, 0.5), (2, 1L, 0.25), (9, 1L, 0.25)))
    val ben = Analytics.benfordDigits(df, "v").orderBy("digit")
      .collect().map(_.getDouble(3)).toSeq
    assert(ben.head == BigDecimal(math.log(2.0) / math.log(10.0))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
  }

  test("centroidDrift: identical sets cosine 1 / shift 0; hand-computed " +
    "orthogonal shift; counts per side") {
    val a = Seq((1L, Array(1.0f, 0.0f)), (2L, Array(1.0f, 0.0f)))
      .toDF("id", "vec")
    val same = Analytics.centroidDrift(a, a, "vec").collect().head
    assert((same.getLong(0), same.getLong(1)) == ((2L, 2L)))
    assert(same.getDouble(2) == 1.0 && same.getDouble(3) == 0.0)
    // b centroid (0,1): cosine 0, l2 = √2
    val b = Seq((3L, Array(0.0f, 1.0f))).toDF("id", "vec")
    val ortho = Analytics.centroidDrift(a, b, "vec").collect().head
    assert(ortho.getDouble(2) == 0.0)
    assert(ortho.getDouble(3) == BigDecimal(math.sqrt(2.0))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
  }

  test("groupDispersion: hand-computed cohesion; singleton group is " +
    "perfectly tight; null group/vec excluded") {
    val df = Seq(
      ("g1", Array(1.0f, 0.0f)), ("g1", Array(0.0f, 1.0f)),
      ("g2", Array(3.0f, 4.0f)),
      (null.asInstanceOf[String], Array(9.0f, 9.0f)),
      ("g3", null.asInstanceOf[Array[Float]])
    ).toDF("g", "vec")
    val got = Analytics.groupDispersion(df, "g", "vec").orderBy("g")
      .as[(String, Long, Double, Double)].collect().toSeq
    // g1 centroid (.5,.5): each member's cos dist = 1 − 1/√2 → 0.292893
    assert(got == Seq(("g1", 2L, 0.292893, 0.292893), ("g2", 1L, 0.0, 0.0)))
  }

  test("rfmScores: integer metrics; quintile split with id tiebreak; " +
    "recency flipped so 5 = most recent") {
    import java.sql.Timestamp
    def ts(s: String) = Timestamp.valueOf(s)
    val ev = (1L to 5L).flatMap { u =>
      // user u: u events, last on Jan u*2, value u each
      (1L to u).map(i => (u, ts(f"2024-01-${u * 2}%02d 10:00:00"),
        u.toDouble))
    }.toDF("user_id", "ts", "value")
    val got = Analytics.rfmScores(ev, "user_id", "ts", "value",
      anchor = "2024-02-01").orderBy("user_id")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6))).toSeq
    // user 5: most recent (Jan 10), most frequent, top monetary → 5/5/5
    assert(got.map(_._1) == Seq(1L, 2L, 3L, 4L, 5L))
    assert(got(4) == ((5L, 22L, 5L, 2500L, 5L, 5L, 5L)))
    // user 1: oldest/least → 1/1/1
    assert(got(0) == ((1L, 30L, 1L, 100L, 1L, 1L, 1L)))
  }

  test("timeDecayedSum: exact power-of-two weights; >=20 half-lives and " +
    "future events weigh zero; one division at the end") {
    import java.sql.Timestamp
    def ts(s: String) = Timestamp.valueOf(s)
    val ev = Seq(
      ("g", ts("2024-02-01 09:00:00"), 1.0),   // age 0  → w 1
      ("g", ts("2024-01-25 09:00:00"), 1.0),   // age 7  → w 1/2
      ("g", ts("2024-01-18 09:00:00"), 1.0),   // age 14 → w 1/4
      ("g", ts("2023-01-01 09:00:00"), 1.0),   // 56 half-lives → 0
      ("g", ts("2024-03-01 09:00:00"), 1.0)    // future → 0
    ).toDF("g", "ts", "v")
    val got = Analytics.timeDecayedSum(ev, "g", "ts", "v",
      halfLifeDays = 7, anchor = "2024-02-01").collect().head
    assert(got.getLong(1) == 5L)
    assert(got.getDouble(2) == 100.0 + 50.0 + 25.0)
  }

  test("giniByGroup: uniform 0; hand-computed concentration; all-one-" +
    "owner approaches (n-1)/n; zero-total NULL; tie-proof") {
    val df = Seq(
      ("eq", 5.0), ("eq", 5.0), ("eq", 5.0), ("eq", 5.0),
      ("cc", 0.0), ("cc", 0.0), ("cc", 0.0), ("cc", 10.0),
      ("z", 0.0)
    ).toDF("g", "v")
    val got = Analytics.giniByGroup(df, "g", "v").orderBy("g")
      .collect().map(r => (r.getString(0), r.getLong(1),
        if (r.isNullAt(2)) None else Some(r.getDouble(2)))).toSeq
    // eq: equal shares → G = 0; cc: one owner of 4 → G = (n−1)/n = .75
    // z: total 0 → NULL
    assert(got == Seq(("cc", 4L, Some(0.75)), ("eq", 4L, Some(0.0)),
      ("z", 1L, None)))
  }

  test("cohortLtv: cumulative per-user curve; cohort sized by entities " +
    "not events; offsets cross year boundaries") {
    import java.sql.Timestamp
    def ts(s: String) = Timestamp.valueOf(s)
    val ev = Seq(
      (1L, ts("2023-12-05 00:00:00"), 1.0),   // u1 cohort 2023-12
      (1L, ts("2024-01-20 00:00:00"), 2.0),   // offset 1 (year crossed)
      (2L, ts("2023-12-15 00:00:00"), 3.0),   // u2 same cohort
      (3L, ts("2024-02-01 00:00:00"), 10.0)   // own cohort
    ).toDF("u", "ts", "v")
    val got = Analytics.cohortLtv(ev, "u", "ts", "v")
      .orderBy("cohort_month", "month_offset")
      .as[(String, Long, Long, Long, Long, Double)].collect().toSeq
    assert(got == Seq(
      ("2023-12-01", 0L, 2L, 400L, 2L, 2.0),
      ("2023-12-01", 1L, 1L, 600L, 2L, 3.0),
      ("2024-02-01", 0L, 1L, 1000L, 1L, 10.0)))
  }

  test("integrityAudit: orphans, childless dims, per-row and joined " +
    "checks each counted; clean data reports zeros") {
    val fact = Seq((1L, 5.0, 10), (1L, -2.0, 10), (9L, 1.0, 3))
      .toDF("fk", "amount", "q")
    val dim = Seq((1L, 5), (2L, 99)).toDF("dk", "lim")
    val got = Analytics.integrityAudit(fact, dim, "fk", "dk",
      factChecks = Seq(("neg_amount", col("amount") < 0)),
      joinedChecks = Seq(("q_over_lim", col("q") > col("lim"))))
      .orderBy("check")
      .as[(String, Long)].collect().toSeq
    assert(got == Seq(
      ("childless_dim_rows", 1L),   // dk=2
      ("neg_amount", 1L),
      ("orphan_fact_rows", 1L),     // fk=9
      ("q_over_lim", 2L)))          // both fk=1 rows: 10 > 5
  }

  test("rollingActiveUsers: trailing window dedups entities, window " +
    "slides off, inactive days absent") {
    import java.sql.Timestamp
    def ts(s: String) = Timestamp.valueOf(s)
    val ev = Seq(
      (1L, ts("2024-01-01 10:00:00")),
      (1L, ts("2024-01-01 11:00:00")),   // same user same day: dedup
      (2L, ts("2024-01-02 10:00:00")),
      (1L, ts("2024-01-09 10:00:00"))    // day 1 outside 7d of day 9
    ).toDF("u", "ts")
    val got = Analytics.rollingActiveUsers(ev, "u", "ts", 7)
      .orderBy("day").as[(String, Long)].collect().toSeq
    // day 1: {1}; day 2: {1,2}; day 9: window 3-9 → {2?} no — day 2 is
    // 2024-01-02, 9−6=3 → day 2 excluded → {1}
    assert(got == Seq(("2024-01-01", 1L), ("2024-01-02", 2L),
      ("2024-01-09", 1L)))
  }

  test("rollupMultiGrain: three grains from one pass, '(all)' sentinel, " +
    "exact cents, null groups excluded") {
    import java.sql.Timestamp
    def ts(s: String) = Timestamp.valueOf(s)
    val ev = Seq(
      (Some("a"), Some(ts("2024-01-01 10:00:00")), 1.01),
      (Some("a"), Some(ts("2024-01-01 11:00:00")), 2.0),
      (Some("a"), Some(ts("2024-01-02 10:00:00")), 3.0),
      (Some("b"), Some(ts("2024-01-01 10:00:00")), 4.0),
      (None, Some(ts("2024-01-01 10:00:00")), 100.0),      // excluded
      (Some("a"), None, 100.0)                             // excluded
    ).toDF("g", "ts", "v")
    val got = Analytics.rollupMultiGrain(ev, "g", "ts", "v")
      .orderBy("grain", "g", "day")
      .as[(String, String, Long, Long, Double)].collect().toSeq
    assert(got == Seq(
      ("a", "2024-01-01", 0L, 2L, 3.01),
      ("a", "2024-01-02", 0L, 1L, 3.0),
      ("b", "2024-01-01", 0L, 1L, 4.0),
      ("a", "(all)", 1L, 3L, 6.01),
      ("b", "(all)", 1L, 1L, 4.0),
      ("(all)", "(all)", 3L, 4L, 10.01)))
  }

  test("pivotWide: declared types only, dense 0-cells, absent type " +
    "columns present, cents exact") {
    val ev = Seq(
      (1L, "x", 1.5), (1L, "x", 2.5), (1L, "y", 3.0),
      (2L, "y", 4.0), (2L, "z", 99.0) // z not declared: dropped
    ).toDF("k", "t", "v")
    val got = Analytics.pivotWide(ev, "k", "t", "v", Seq("x", "y", "w"))
      .orderBy("k")
      .as[(Long, Double, Long, Double, Long, Double, Long)].collect().toSeq
    assert(got == Seq(
      (1L, 4.0, 2L, 3.0, 1L, 0.0, 0L),
      (2L, 0.0, 0L, 4.0, 1L, 0.0, 0L)))
  }

  test("tableChecksum: order/partitioning-invariant; a single changed " +
    "row flips exactly its bucket; null vs empty-string rows differ") {
    val a = Seq((1L, Some("x")), (2L, Some("y")), (3L, Some("z")),
      (17L, Some("w"))).toDF("k", "s")
    val cs = Analytics.tableChecksum(a, "k", Seq("k", "s"), 16)
    val csShuffled = Analytics.tableChecksum(
      a.orderBy(desc("k")).repartition(7), "k", Seq("k", "s"), 16)
    assert(cs.orderBy("bucket").collect().toSeq ==
      csShuffled.orderBy("bucket").collect().toSeq)
    // change one row (k=2): only bucket 2 differs
    val b = Seq((1L, Some("x")), (2L, Some("Y")), (3L, Some("z")),
      (17L, Some("w"))).toDF("k", "s")
    val diff = Analytics.tableChecksum(b, "k", Seq("k", "s"), 16)
      .withColumnRenamed("checksum", "c2").withColumnRenamed("n_rows", "n2")
      .join(cs, "bucket")
      .filter(col("c2") =!= col("checksum")).select("bucket")
      .as[Long].collect().toSeq
    assert(diff == Seq(2L))
    // NULL cell is not the same row as empty string
    val n1 = Analytics.tableChecksum(
      Seq((1L, None: Option[String])).toDF("k", "s"), "k", Seq("k", "s"), 4)
    val n2 = Analytics.tableChecksum(
      Seq((1L, Some(""))).toDF("k", "s"), "k", Seq("k", "s"), 4)
    assert(n1.select("checksum").as[Long].head() !=
      n2.select("checksum").as[Long].head())
  }

  test("fdViolations: held FD reports 0/true, violated FD counts keys " +
    "and minimum rows-to-fix, nulls excluded") {
    val df = Seq(
      (Some("k1"), Some("a")), (Some("k1"), Some("a")), (Some("k1"), Some("b")),
      (Some("k2"), Some("c")),
      (None, Some("zz")), (Some("k3"), None)
    ).toDF("l", "r")
    val got = Analytics.fdViolations(df, Seq(("l", "r"), ("r", "r")))
      .orderBy("fd").as[(String, Long, Long, Long, Boolean)].collect().toSeq
    // l->r: keys {k1 (2 distinct r, 3 rows, majority 2 -> fix 1), k2};
    // r->r is reflexive (trivially holds) over keys {a, b, c, zz} — the
    // null-l row still counts, because ITS lhs is column r
    assert(got == Seq(
      ("l->r", 2L, 1L, 1L, false),
      ("r->r", 4L, 0L, 0L, true)))
  }

  test("lagAutocorr: perfectly periodic series correlates 1.0 at its " +
    "period; gap days count as explicit zeros") {
    import java.sql.Timestamp
    // period-2 series over 8 days, counts 2,1,2,1,…: exactly periodic, so
    // the integer-sum Pearson gives num == den → r is EXACTLY ±1.0
    val rows = (0 until 8).flatMap { i =>
      val day = f"2024-01-${i + 1}%02d"
      val n = if (i % 2 == 0) 2 else 1
      (0 until n).map(_ => ("g", Timestamp.valueOf(s"$day 10:00:00")))
    }
    val got = Analytics.lagAutocorr(rows.toDF("g", "ts"), "g", "ts", 2)
      .as[(String, Long, Double)].collect().toSeq
    assert(got == Seq(("g", 6L, 1.0)))
    // with lag 1 the same series anti-correlates
    val got1 = Analytics.lagAutocorr(rows.toDF("g", "ts"), "g", "ts", 1)
      .as[(String, Long, Double)].collect().toSeq
    assert(got1.head._3 == -1.0)
  }

  test("weightedMedianByGroup: weight moves the median, lower-median " +
    "crossing is exact, zero/negative weights excluded") {
    val df = Seq(
      ("g1", 1.0, 1.0), ("g1", 2.0, 1.0), ("g1", 3.0, 10.0),
      ("g2", 1.0, 1.0), ("g2", 2.0, 1.0),      // even split → lower = 1.0
      ("g2", 9.0, 0.0), ("g2", 99.0, -5.0)     // excluded weights
    ).toDF("g", "v", "w")
    val got = Analytics.weightedMedianByGroup(df, "g", "v", "w")
      .orderBy("g").as[(String, Long, Double)].collect().toSeq
    // g1: cum at v=3 is 12 ≥ 12/2 first at v=3 (1,2 cum to 2 < 6)
    assert(got == Seq(("g1", 12L, 3.0), ("g2", 2L, 1.0)))
  }

  test("topPaths: trigram counts respect per-entity time order with id " +
    "tiebreak; share sums the census; topK truncates") {
    import java.sql.Timestamp
    def ts(s: String) = Timestamp.valueOf(s)
    val ev = Seq(
      (1L, 1L, ts("2024-01-01 10:00:00"), "a"),
      (1L, 2L, ts("2024-01-01 10:01:00"), "b"),
      (1L, 3L, ts("2024-01-01 10:02:00"), "c"),
      (1L, 4L, ts("2024-01-01 10:03:00"), "a"),
      // user 2: same ts — order by event_id: b, a, c
      (2L, 5L, ts("2024-01-01 10:00:00"), "b"),
      (2L, 6L, ts("2024-01-01 10:00:00"), "a"),
      (2L, 7L, ts("2024-01-01 10:00:00"), "c")
    ).toDF("u", "eid", "ts", "s")
    val got = Analytics.topPaths(ev, "u", "ts", "eid", "s", topK = 2)
      .as[(String, String, String, Long, Double)].collect().toSeq
    // census: u1 → (a,b,c), (b,c,a); u2 → (b,a,c); 3 trigrams, all n=1
    // → top-2 by path order: (a,b,c), (b,a,c)
    assert(got == Seq(("a", "b", "c", 1L, 0.333333),
      ("b", "a", "c", 1L, 0.333333)))
  }

  test("kAnonymity: under-k classes and rows counted, single-sensitive " +
    "and all-null-sensitive classes read low-diversity, NULL QI groups") {
    val df = Seq(
      // class (n1, s1): 3 rows, 2 sensitive values → fine at k=3
      ("n1", "s1", Some("a")), ("n1", "s1", Some("b")), ("n1", "s1", Some("a")),
      // class (n1, s2): 2 rows (< 3), single sensitive → both risks
      ("n1", "s2", Some("a")), ("n1", "s2", Some("a")),
      // class (NULL, s1): 1 row, null sensitive → low diversity too
      (null.asInstanceOf[String], "s1", None: Option[String])
    ).toDF("qi1", "qi2", "sv")
    val got = Analytics.kAnonymity(df, Seq("qi1", "qi2"), "sv", k = 3)
      .as[(Long, Long, Long, Long, Long, Long)].collect().toSeq
    assert(got == Seq((6L, 3L, 1L, 2L, 3L, 2L)))
  }

  test("kaplanMeier: immediate converters, a later converter, and a " +
    "censored survivor produce the textbook product-limit curve") {
    import java.sql.Timestamp
    def ts(s: String) = Timestamp.valueOf(s + " 10:00:00")
    // 4 users; horizon = 2024-01-11 (u4's last event).
    // u1: first touch d1, purchase d1 → event at day 0
    // u2: first touch d1, purchase d3 → event at day 2
    // u3: first touch d1, no purchase → censored at day 10
    // u4: first touch d11 (purchase!) → event at day 0
    val ev = Seq(
      (1L, ts("2024-01-01"), "view"), (1L, ts("2024-01-01"), "purchase"),
      (2L, ts("2024-01-01"), "view"), (2L, ts("2024-01-03"), "purchase"),
      (3L, ts("2024-01-01"), "view"),
      (4L, ts("2024-01-11"), "purchase")
    ).toDF("u", "ts", "et")
    val got = Analytics.kaplanMeier(ev, "u", "ts", "et", "purchase")
      .orderBy("day").as[(Long, Long, Long, Long, Double)].collect().toSeq
    // day 0: risk 4, events 2 → S = 0.5
    // day 2: risk 2, events 1 → S = 0.5 · 0.5 = 0.25
    // day 10: risk 1, censored 1 → S stays 0.25
    assert(got == Seq(
      (0L, 4L, 2L, 0L, 0.5),
      (2L, 2L, 1L, 0L, 0.25),
      (10L, 1L, 0L, 1L, 0.25)))
    // exhausted risk set pins survival to exactly 0.0
    val ev2 = Seq((1L, ts("2024-01-01"), "purchase"),
      (2L, ts("2024-01-01"), "view"), (2L, ts("2024-01-02"), "purchase"))
      .toDF("u", "ts", "et")
    val got2 = Analytics.kaplanMeier(ev2, "u", "ts", "et", "purchase")
      .orderBy("day").as[(Long, Long, Long, Long, Double)].collect().toSeq
    assert(got2 == Seq((0L, 2L, 1L, 0L, 0.5), (1L, 1L, 1L, 0L, 0.0)))
  }

  test("groupedAuc: perfect separation 1.0, all-tied 0.5 via midranks, " +
    "single-class group NULL") {
    val df = Seq(
      ("g1", 1L, 1.0, false), ("g1", 2L, 2.0, false),
      ("g1", 3L, 3.0, true), ("g1", 4L, 4.0, true),
      ("g2", 5L, 5.0, true), ("g2", 6L, 5.0, false),
      ("g3", 7L, 1.0, true), ("g3", 8L, 2.0, true)
    ).toDF("g", "id", "s", "p")
    val got = Analytics.groupedAuc(df, "g", "id", "s", "p")
      .orderBy("g").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        if (r.isNullAt(3)) None else Some(r.getDouble(3)))).toSeq
    assert(got == Seq(
      ("g1", 2L, 2L, Some(1.0)),
      ("g2", 1L, 1L, Some(0.5)),
      ("g3", 2L, 0L, None)))
  }

  test("funnelSteps: ordered chaining from earliest prefix completion, " +
    "equal timestamps do not chain, shares are exact") {
    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    val ev = Seq(
      (1L, ts("2024-01-01 00:00:01"), "view"),
      (1L, ts("2024-01-01 00:00:02"), "click"),
      (1L, ts("2024-01-01 00:00:03"), "purchase"),
      (2L, ts("2024-01-01 00:00:01"), "view"),
      (2L, ts("2024-01-01 00:00:01"), "click"),    // same ts: no chain
      (2L, ts("2024-01-01 00:00:05"), "purchase"), // click never reached
      (3L, ts("2024-01-01 00:00:01"), "click"),    // click before view
      (3L, ts("2024-01-01 00:00:02"), "view"),
      (3L, ts("2024-01-01 00:00:03"), "click"),
      (4L, ts("2024-01-01 00:00:01"), "purchase")  // never entered
    ).toDF("u", "ts", "et")
    val got = Analytics.funnelSteps(ev, "u", "ts", "et",
        Seq("view", "click", "purchase"))
      .orderBy("step")
      .as[(Long, String, Long, Double, Double)].collect().toSeq
    assert(got == Seq(
      (1L, "view", 3L, 1.0, 1.0),
      (2L, "click", 2L, 0.666667, 0.666667),
      (3L, "purchase", 1L, 0.333333, 0.5)))
  }

  test("changepoint: a clean step splits exactly at the step, constant " +
    "series scores 0 at the earliest split, singleton groups emit nothing") {
    val pts = Seq(
      ("a", "t1", 1L), ("a", "t2", 1L), ("a", "t3", 1L),
      ("a", "t4", 9L), ("a", "t5", 9L), ("a", "t6", 9L),
      ("b", "t1", 7L),
      ("c", "t1", 5L), ("c", "t2", 5L)
    ).toDF("g", "t", "v")
    val got = Analytics.changepoint(pts, "g", "t", "v")
      .orderBy("g")
      .as[(String, Long, String, Double, Double, Double)].collect().toSeq
    assert(got == Seq(
      ("a", 6L, "t3", 1.0, 9.0, 96.0),
      ("c", 2L, "t1", 5.0, 5.0, 0.0)))
  }

  test("classificationReport: exact tp/fp/fn per class, NULL recall for " +
    "a predicted-only class, F1 via the single-division identity") {
    val df = Seq(("a", "a"), ("a", "b"), ("b", "c")).toDF("l", "p")
    val got = Analytics.classificationReport(df, "l", "p")
      .orderBy("clazz").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5),
        if (r.isNullAt(6)) None else Some(r.getDouble(6)),
        if (r.isNullAt(7)) None else Some(r.getDouble(7)),
        if (r.isNullAt(8)) None else Some(r.getDouble(8)))).toSeq
    assert(got == Seq(
      ("a", 2L, 1L, 1L, 0L, 1L, Some(1.0), Some(0.5), Some(0.666667)),
      ("b", 1L, 1L, 0L, 1L, 1L, Some(0.0), Some(0.0), Some(0.0)),
      ("c", 0L, 1L, 0L, 1L, 0L, Some(0.0), None, Some(0.0))))
  }

  test("cohensKappa: hand-computed kappa, null labels excluded, " +
    "degenerate constant raters yield NULL") {
    // 10 items: a/b agree on 6; margins a: x=5,y=5; b: x=6,y=4
    // po = 0.6, pe = (5*6 + 5*4)/100 = 0.5, kappa = 0.2
    val df = Seq(
      ("x","x"),("x","x"),("x","x"),("x","y"),("x","y"),
      ("y","y"),("y","y"),("y","y"),("y","x"),("y","x"),
      (null.asInstanceOf[String], "x")
    ).toDF("a", "b")
    val r = Analytics.cohensKappa(df, "a", "b").collect().head
    assert(r.getLong(0) == 10L && r.getLong(1) == 6L)
    assert(r.getDouble(2) == 0.6 && r.getDouble(3) == 0.5)
    assert(r.getDouble(4) == 0.2)
    val const = Seq(("x","x"),("x","x")).toDF("a", "b")
    assert(Analytics.cohensKappa(const, "a", "b").collect().head.isNullAt(4))
  }

  test("calibrationCurve: exact bins via integer division, p=1.0 clamps " +
    "into the last bin, gap and sq_err are exact") {
    val df = Seq(
      (0.05, false), (0.05, false),      // bin 0: mean 0.05, obs 0
      (0.25, true),                      // bin 2: mean 0.25, obs 1
      (1.0, true)                        // p=1.0 -> bin 9, perfect
    ).toDF("p", "y")
    val got = Analytics.calibrationCurve(df, "p", "y", nBins = 10)
      .orderBy("bin")
      .as[(Long, Long, Long, Double, Double, Double, Double)]
      .collect().toSeq
    assert(got == Seq(
      (0L, 2L, 0L, 0.05, 0.0, -0.05, 0.005),   // 2·(500-0)²/1e8
      (2L, 1L, 1L, 0.25, 1.0, 0.75, 0.5625),   // (2500-10000)²/1e8
      (9L, 1L, 1L, 1.0, 1.0, 0.0, 0.0)))
  }

  test("fleissKappa: hand-computed 4-item 3-rater panel; ragged panels " +
    "and single-rater panels rejected; null ratings excluded") {
    // i1 aaa (s2=9), i2 aab (5), i3 bbb (9), i4 abc (3): S=26, N=4, R=3
    // c_a=6 c_b=5 c_c=1 -> sum c^2 = 62
    // p_bar = 14/24; p_e = 62/144; kappa = 44/164 = 0.268293
    val df = Seq(
      (1L, "x", "a"), (1L, "y", "a"), (1L, "z", "a"),
      (2L, "x", "a"), (2L, "y", "a"), (2L, "z", "b"),
      (3L, "x", "b"), (3L, "y", "b"), (3L, "z", "b"),
      (4L, "x", "a"), (4L, "y", "b"), (4L, "z", "c")
    ).toDF("item", "rater", "cat")
    val r = Analytics.fleissKappa(df, "item", "rater", "cat").collect().head
    assert(r.getLong(0) == 4L && r.getLong(1) == 3L)
    assert(r.getDouble(2) == 0.583333) // p_bar
    assert(r.getDouble(3) == 0.430556) // p_expected
    assert(r.getDouble(4) == 0.268293) // kappa via the BIGINT identity
    // a null category row is excluded and makes the panel ragged -> loud
    val ragged = df.unionByName(Seq((5L, "x", "a")).toDF("item", "rater", "cat"))
    val e = intercept[IllegalArgumentException] {
      Analytics.fleissKappa(ragged, "item", "rater", "cat").collect()
    }
    assert(e.getMessage.contains("same number of times"))
    val solo = Seq((1L, "x", "a"), (2L, "x", "b")).toDF("item", "rater", "cat")
    val e2 = intercept[IllegalArgumentException] {
      Analytics.fleissKappa(solo, "item", "rater", "cat").collect()
    }
    assert(e2.getMessage.contains(">= 2 raters"))
  }

  test("bhFdr: textbook battery — k = max rank passing i*q/m, adjusted " +
    "p is the reverse cummin of m*p/i clipped at 1, out-of-range p " +
    "excluded") {
    val df = Seq(
      (1L, 0.001), (2L, 0.008), (3L, 0.039), (4L, 0.041), (5L, 0.27),
      (6L, 0.6), (7L, Double.NaN), (8L, 1.5), (9L, -0.1)
    ).toDF("test_id", "p")
      .withColumn("p", when(isnan(col("p")), lit(null)).otherwise(col("p")))
    val got = Analytics.bhFdr(df, "test_id", "p", q = 0.05)
      .orderBy("p_rank")
      .as[(Long, Double, Long, Double, Boolean)].collect().toSeq
    // m = 6 valid tests; thresholds i*0.05/6; p(2)=.008 <= .016667 is the
    // last pass -> k=2; adjusted = reverse cummin of 6p/i
    assert(got == Seq(
      (1L, 0.001, 1L, 0.006, true),
      (2L, 0.008, 2L, 0.024, true),
      (3L, 0.039, 3L, 0.0615, false),
      (4L, 0.041, 4L, 0.0615, false),
      (5L, 0.27, 5L, 0.324, false),
      (6L, 0.6, 6L, 0.6, false)))
  }

  test("quantileBin: equal-frequency bins (sizes differ <= 1, edges " +
    "ordered); kfoldAssign: per-stratum fold sizes differ <= 1, " +
    "deterministic, folds in [0, k)") {
    import graft.operators.ScaleOps
    val df = spark.range(0, 103).select(col("id"),
      ((col("id") * 37) % 41).as("v"))
    val binned = ScaleOps.quantileBin(df, "v", "id", 8)
    val sizes = binned.groupBy("bin").count().orderBy("bin")
      .as[(Long, Long)].collect().toSeq
    assert(sizes.map(_._1) == (0L until 8L))
    assert(sizes.map(_._2).sum == 103L)
    assert(sizes.map(_._2).max - sizes.map(_._2).min <= 1)
    // bins are ordered by value: every bin's max <= next bin's min under
    // the (v, id) total order — check via value edges
    val edges = binned.groupBy("bin")
      .agg(min(col("v")).as("lo"), max(col("v")).as("hi"))
      .orderBy("bin").as[(Long, Long, Long)].collect().toSeq
    edges.sliding(2).foreach {
      case Seq((_, _, hi1), (_, lo2, _)) => assert(hi1 <= lo2)
      case _ =>
    }
    val strat = spark.range(0, 101).select(col("id"),
      concat(lit("s"), (col("id") % 3).cast("string")).as("g"))
    val folds = ScaleOps.kfoldAssign(strat, "id", "g", 4, "t:")
    val perFold = folds.groupBy("g", "fold").count()
      .as[(String, Int, Long)].collect().toSeq
    assert(perFold.forall { case (_, f, _) => f >= 0 && f < 4 })
    perFold.groupBy(_._1).foreach { case (_, fs) =>
      assert(fs.map(_._3).max - fs.map(_._3).min <= 1)
      assert(fs.size == 4)
    }
    val again = ScaleOps.kfoldAssign(strat, "id", "g", 4, "t:")
      .orderBy("id").as[(Long, String, Int)].collect().toSeq
    assert(again == folds.orderBy("id")
      .as[(Long, String, Int)].collect().toSeq)
  }

  test("theilSen: lower-median pairwise slope, outlier-immune where OLS " +
    "is not; duplicate time points rejected loudly") {
    // series g1: (0,0) (1,10) (2,20) (3,1000) — 6 slopes: 10,10,10,
    // 495,333.33,980 sorted -> lower median (rank 3) = 10: the wild
    // day moves OLS but not Theil-Sen
    val df = Seq(("g1", 0L, 0L), ("g1", 1L, 10L), ("g1", 2L, 20L),
      ("g1", 3L, 1000L), ("g2", 5L, 7L)).toDF("g", "t", "v")
    val out = Analytics.theilSen(df, "g", "t", "v").orderBy("grp")
      .collect()
    assert(out.length == 2)
    val g1 = out.head
    assert(g1.getString(0) == "g1" && g1.getLong(1) == 4L &&
      g1.getLong(2) == 6L && g1.getDouble(3) == 10.0)
    // a single-point group has no pairs: slope NULL, not 0
    val g2 = out(1)
    assert(g2.getString(0) == "g2" && g2.getLong(1) == 1L &&
      g2.getLong(2) == 0L && g2.isNullAt(3))
    val dup = Seq(("g", 1L, 1L), ("g", 1L, 2L)).toDF("g", "t", "v")
    val e = intercept[IllegalArgumentException] {
      Analytics.theilSen(dup, "g", "t", "v").collect()
    }
    assert(e.getMessage.contains("duplicate"))
  }

  test("welchT: t, Welch-Satterthwaite df, Cohen's d and Hedges' g " +
    "match hand-computed values; zero-variance pair gives NULL t") {
    // A: 1,2,3 (m=2, var=1); B: 10,14 (m=12, var=8)
    val df = Seq(("a", 1L), ("a", 2L), ("a", 3L), ("b", 10L), ("b", 14L))
      .toDF("lvl", "v")
    val r = Analytics.welchT(df, "lvl", "v", "a", "b").collect().head
    assert(r.getLong(0) == 3L && r.getLong(1) == 2L)
    assert(r.getDouble(2) == 2.0 && r.getDouble(3) == 12.0)
    // se2 = 1/3 + 8/2 = 13/3; t = -10/sqrt(13/3)
    val se2 = 1.0 / 3 + 4.0
    assert(r.getDouble(4) ==
      BigDecimal(-10.0 / math.sqrt(se2))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
    // df = se2^2 / ((1/3)^2/2 + 4^2/1)
    assert(r.getDouble(5) ==
      BigDecimal(se2 * se2 / ((1.0 / 9) / 2 + 16.0))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
    // pooled sd = sqrt((2*1 + 1*8)/3); d = -10/sp; g = d*(1 - 3/11)
    val sp = math.sqrt(10.0 / 3)
    assert(r.getDouble(6) ==
      BigDecimal(-10.0 / sp).setScale(6,
        BigDecimal.RoundingMode.HALF_UP).toDouble)
    assert(r.getDouble(7) ==
      BigDecimal(-10.0 / sp * (1.0 - 3.0 / 11.0)).setScale(6,
        BigDecimal.RoundingMode.HALF_UP).toDouble)
    // both sides constant: se2 = 0 -> NULL t/df, NULL d
    val const = Seq(("a", 5L), ("a", 5L), ("b", 7L), ("b", 7L))
      .toDF("lvl", "v")
    val rc = Analytics.welchT(const, "lvl", "v", "a", "b").collect().head
    assert(rc.isNullAt(4) && rc.isNullAt(5) && rc.isNullAt(6))
  }

  test("mcnemar: discordant-cell chi2 with continuity correction; no " +
    "disagreement gives NULL, not zero") {
    // b (a-only) = 6, c (b-only) = 2: chi2_cc = (|6-2|-1)^2/8 = 9/8
    val rows = Seq.fill(10)((true, true)) ++ Seq.fill(6)((true, false)) ++
      Seq.fill(2)((false, true)) ++ Seq.fill(3)((false, false))
    val r = Analytics.mcnemar(rows.toDF("a", "b"), "a", "b")
      .collect().head
    assert((r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)) ==
      ((10L, 6L, 2L, 3L)))
    assert(r.getDouble(4) == 1.125)
    val agree = Seq((true, true), (false, false)).toDF("a", "b")
    val ra = Analytics.mcnemar(agree, "a", "b").collect().head
    assert(ra.isNullAt(4))
  }

  test("wilcoxonSignedRank: doubled-midrank W+ and z over the |d| " +
    "census; zero diffs counted in n_pairs but not ranked; all-tie " +
    "gives NULL z") {
    // d = a-b: [1, -2, 3, 3, 0] -> ranks |1|=1, |2|=2, |3|,|3|=3.5
    // W+ = 1 + 3.5 + 3.5 = 8; mean = 5; Var = 4*5*9/24 - 6/48 = 7.375
    val df = Seq((11L, 10L), (8L, 10L), (13L, 10L), (13L, 10L),
      (10L, 10L)).toDF("a", "b")
    val r = Analytics.wilcoxonSignedRank(df, "a", "b").collect().head
    assert((r.getLong(0), r.getLong(1), r.getDouble(2)) == ((5L, 4L, 8.0)))
    assert(r.getDouble(3) ==
      BigDecimal(12.0 / 4.0 / math.sqrt(354.0 / 48.0))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
    // every pair ties: n_nonzero = 0, z NULL (not 0/0 NaN)
    val tied = Seq((5L, 5L), (7L, 7L)).toDF("a", "b")
    val rt = Analytics.wilcoxonSignedRank(tied, "a", "b").collect().head
    assert((rt.getLong(0), rt.getLong(1), rt.getDouble(2)) ==
      ((2L, 0L, 0.0)))
    assert(rt.isNullAt(3))
  }

  test("jonckheereTerpstra: exact-BIGINT 2J with tie half-credit and " +
    "Hollander-Wolfe tie-corrected variance; NULL on one group and on " +
    "all-tie input") {
    // g1 = [1, 2], g2 = [2, 3, 3]: J = 5 strict + 0.5 tie = 5.5
    // E = (25 - 13)/4 = 3; A = 300 - 84 - 36 = 180;
    // Var = 180/72 + 0 + (8*4)/(8*20) = 2.7; z = 2.5/sqrt(2.7)
    val df = Seq((1L, 1L), (1L, 2L), (2L, 2L), (2L, 3L), (2L, 3L))
      .toDF("g", "v")
    val r = Analytics.jonckheereTerpstra(df, "g", "v").collect().head
    assert((r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)) ==
      ((5L, 2L, 4L, 5.5)))
    assert(r.getDouble(4) ==
      BigDecimal(2.5 / math.sqrt(2.7))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
    // one group: k = 1 -> NULL z
    val one = Seq((7L, 1L), (7L, 2L)).toDF("g", "v")
    assert(Analytics.jonckheereTerpstra(one, "g", "v")
      .collect().head.isNullAt(4))
    // every value identical: Var = 0 -> NULL z
    val tied = Seq((1L, 5L), (1L, 5L), (2L, 5L)).toDF("g", "v")
    assert(Analytics.jonckheereTerpstra(tied, "g", "v")
      .collect().head.isNullAt(4))
  }

  test("friedman: within-block doubled midranks over cell means, " +
    "incomplete blocks dropped, replicates averaged; NULL when every " +
    "block ties throughout") {
    // b1/b2: A=1 B=2 C=3 (2r = 2,4,6); b3: A=2 B=2 C=1 (2r = 5,5,2)
    // R2 = (9,13,14), num = 14, den = 166 - 144 = 22, chi2 = 28/22
    // b1's A arrives as replicates (0, 2) -> mean 1; b4 incomplete
    val df = Seq(
      ("b1", "A", 0L), ("b1", "A", 2L), ("b1", "B", 2L), ("b1", "C", 3L),
      ("b2", "A", 1L), ("b2", "B", 2L), ("b2", "C", 3L),
      ("b3", "A", 2L), ("b3", "B", 2L), ("b3", "C", 1L),
      ("b4", "A", 5L)).toDF("bl", "tr", "v")
    val r = Analytics.friedman(df, "bl", "tr", "v").collect().head
    assert((r.getLong(0), r.getLong(1)) == ((3L, 3L)))
    assert(r.getDouble(2) ==
      BigDecimal(2.0 * 14.0 / 22.0)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
    // all values tie within every block: denominator 0 -> NULL
    val flat = Seq(("b1", "A", 1L), ("b1", "B", 1L),
      ("b2", "A", 2L), ("b2", "B", 2L)).toDF("bl", "tr", "v")
    assert(Analytics.friedman(flat, "bl", "tr", "v")
      .collect().head.isNullAt(2))
    // no complete block: n_blocks 0, NULL chi2
    val inc = Seq(("b1", "A", 1L), ("b2", "B", 2L)).toDF("bl", "tr", "v")
    val ri = Analytics.friedman(inc, "bl", "tr", "v").collect().head
    assert(ri.getLong(0) == 0L && ri.isNullAt(2))
  }

  test("cramerVonMises: exact decimal census numerator over the pooled " +
    "ECDFs; identical samples give 0, empty side gives NULL") {
    // a = [1,2], b = [2,3]: d = 2A-2B = (2,2,0), T = 12/64 = 0.1875
    val a = Seq(1L, 2L).toDF("v")
    val b = Seq(2L, 3L).toDF("v")
    val r = Analytics.cramerVonMises(a, b, "v").collect().head
    assert((r.getLong(0), r.getLong(1), r.getDouble(2)) ==
      ((2L, 2L, 0.1875)))
    // identical samples: every cumulative difference 0
    val same = Analytics.cramerVonMises(a, a, "v").collect().head
    assert(same.getDouble(2) == 0.0)
    // an empty side: NULL statistic, zero count reported
    val empty = a.filter(col("v") > 100L)
    val re = Analytics.cramerVonMises(a, empty, "v").collect().head
    assert(re.getLong(1) == 0L && re.isNullAt(2))
  }

  test("effectSizes: exact-moment Cohen's d / Hedges' g and census " +
    "dominance Cliff's delta; degenerate inputs NULL") {
    // a = [1,2], b = [2,3]: d = -1/sqrt(.5), g = d*4/7, delta = -3/4
    val a = Seq(1L, 2L).toDF("v")
    val b = Seq(2L, 3L).toDF("v")
    val r = Analytics.effectSizes(a, b, "v").collect().head
    def r6(x: Double) = BigDecimal(x)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val d = -1.0 / math.sqrt(0.5)
    assert((r.getLong(0), r.getLong(1)) == ((2L, 2L)))
    assert(r.getDouble(2) == r6(d))
    assert(r.getDouble(3) == r6(d * (1.0 - 3.0 / 7.0)))
    assert(r.getDouble(4) == -0.75)
    // constant samples: zero pooled variance -> NULL d/g, delta 0
    val flat = Seq(5L, 5L).toDF("v")
    val rf = Analytics.effectSizes(flat, flat, "v").collect().head
    assert(rf.isNullAt(2) && rf.isNullAt(3) && rf.getDouble(4) == 0.0)
    // empty side: everything NULL
    val re = Analytics.effectSizes(a, a.filter(col("v") > 99L), "v")
      .collect().head
    assert(re.isNullAt(2) && re.isNullAt(3) && re.isNullAt(4))
  }

  test("brunnerMunzel: doubled pooled/within midranks give the exact " +
    "rank-variance statistic; all-tie and tiny inputs NULL") {
    // x = [1,2], y = [2,3]: mx = 1.75, my = 3.25, Sx = Sy = 0.125
    // W = 4*1.5/(4*sqrt(0.5)) = 2.121320, p_hat = (3.25-1.5)/2 = 0.875
    val x = Seq(1L, 2L).toDF("v")
    val y = Seq(2L, 3L).toDF("v")
    val r = Analytics.brunnerMunzel(x, y, "v").collect().head
    def r6(d: Double) = BigDecimal(d)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert((r.getLong(0), r.getLong(1)) == ((2L, 2L)))
    assert(r.getDouble(2) == 0.875)
    assert(r.getDouble(3) == r6(6.0 / (4.0 * math.sqrt(0.5))))
    // every value tied: rank variance 0 -> NULL W, p_hat = 0.5
    val flat = Seq(7L, 7L).toDF("v")
    val rf = Analytics.brunnerMunzel(flat, flat, "v").collect().head
    assert(rf.getDouble(2) == 0.5 && rf.isNullAt(3))
    // a 1-row side: variance undefined -> NULL W
    assert(Analytics.brunnerMunzel(Seq(1L).toDF("v"), y, "v")
      .collect().head.isNullAt(3))
  }

  test("logRank: risk-set-weighted observed-vs-expected over the time " +
    "census with picopoint term sums; censoring leaves the risk set " +
    "after same-time deaths; no-events input NULL") {
    // A(false): 1(event), 3(censored); B(true): 2(event), 4(event)
    // t=1: E1 = .5, V = .25; t=2: E1 = 2/3, V = 2/9; t=4: O=E, V=0
    val df = Seq((1L, true, false), (3L, false, false),
      (2L, true, true), (4L, true, true)).toDF("t", "e", "g")
    val r = Analytics.logRank(df, "t", "e", "g").collect().head
    assert((r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)) ==
      ((2L, 2L, 1L, 2L)))
    def pico(x: Double): Long = BigDecimal(x)
      .setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong
    val so = pico(-0.5e12) + pico((1.0 - 2.0 / 3.0) * 1e12)
    val sv = pico(0.25e12) +
      pico(1.0 * 2.0 * 1.0 * 2.0 / (3.0 * 3.0 * 2.0) * 1e12)
    val z = (so.toDouble / 1e12) / math.sqrt(sv.toDouble / 1e12)
    def r6(x: Double) = BigDecimal(x)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(r.getDouble(4) == r6(z))
    assert(r.getDouble(5) == r6(z * z))
    // all censored: no event time contributes -> NULL
    val cen = Seq((1L, false, false), (2L, false, true)).toDF("t", "e", "g")
    assert(Analytics.logRank(cen, "t", "e", "g").collect().head.isNullAt(4))
  }

  test("moodMedian: pooled lower-median dichotomization with exact " +
    "2x2 Pearson; degenerate margins NULL") {
    // a = [1,2,3], b = [4,5]: median = 3, above = (0, 2),
    // chi2 = 5*36/(3*2*2*3) = 5.0
    val a = Seq(1L, 2L, 3L).toDF("v")
    val b = Seq(4L, 5L).toDF("v")
    val r = Analytics.moodMedian(a, b, "v").collect().head
    assert((r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
      r.getLong(4)) == ((3L, 2L, 3L, 0L, 2L)))
    assert(r.getDouble(5) == 5.0)
    // all values equal: nothing above the median -> NULL
    val flat = Seq(5L, 5L).toDF("v")
    assert(Analytics.moodMedian(flat, flat, "v").collect().head.isNullAt(5))
    // empty side -> NULL
    assert(Analytics.moodMedian(a, a.filter(col("v") > 9L), "v")
      .collect().head.isNullAt(5))
  }

  test("cochranArmitage: cross-multiplied BIGINT trend z; NULL on " +
    "no-contrast and single-dose inputs") {
    // doses 0,1,2 with (n,r) = (10,1),(10,5),(10,9): N=30, R=15,
    // T*N = 240, Var*N^2 = R(N-R)B/N = 15*15*600/30 = 4500
    val rows = (Seq.fill(1)((0L, true)) ++ Seq.fill(9)((0L, false)) ++
      Seq.fill(5)((1L, true)) ++ Seq.fill(5)((1L, false)) ++
      Seq.fill(9)((2L, true)) ++ Seq.fill(1)((2L, false)))
      .toDF("dose", "ok")
    val r = Analytics.cochranArmitage(rows, "dose", "ok").collect().head
    assert((r.getLong(0), r.getLong(1), r.getLong(2)) == ((30L, 3L, 15L)))
    assert(r.getDouble(3) ==
      BigDecimal(240.0 / math.sqrt(4500.0))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
    // all successes: R = N, no contrast -> NULL z
    val allOk = Seq((0L, true), (1L, true)).toDF("dose", "ok")
    assert(Analytics.cochranArmitage(allOk, "dose", "ok")
      .collect().head.isNullAt(3))
    // single dose level: k = 1 -> NULL z
    val oneDose = Seq((3L, true), (3L, false)).toDF("dose", "ok")
    assert(Analytics.cochranArmitage(oneDose, "dose", "ok")
      .collect().head.isNullAt(3))
  }

  test("kendallTau / associationRules leave ZERO cached blocks across a " +
    "100-iteration loop (r12 #2: no persist to leak, no eager " +
    "checkpoint to tax), and associationRules' four census consumers " +
    "share ONE exchange via reuse") {
    val kt = Seq((1L, 2L), (2L, 1L), (3L, 3L), (4L, 4L), (1L, 2L))
      .toDF("x", "y")
    val baskets = Seq(("b1", "a"), ("b1", "b"), ("b2", "a"), ("b2", "b"),
      ("b3", "a"), ("b3", "c"), ("b4", "b")).toDF("bk", "it")
    val before = spark.sparkContext.getPersistentRDDs.keySet
    val tau0 = Analytics.kendallTau(kt, "x", "y").collect().head.get(4)
    val ar0 = Analytics.associationRules(baskets, "bk", "it",
      minPairCount = 1, maxBasketSize = 10, topK = 10).collect().toSeq
    (1 to 100).foreach { _ =>
      assert(Analytics.kendallTau(kt, "x", "y").collect().head.get(4)
        == tau0)
      assert(Analytics.associationRules(baskets, "bk", "it",
        minPairCount = 1, maxBasketSize = 10, topK = 10).collect().toSeq
        == ar0)
    }
    val leaked = spark.sparkContext.getPersistentRDDs.keySet -- before
    assert(leaked.isEmpty,
      s"loop accumulated ${leaked.size} cached RDDs: $leaked")
    // the shared membership prefix must be computed once: the executed
    // plan carries reused stages/exchanges for the diamond consumers
    val ar = Analytics.associationRules(baskets, "bk", "it",
      minPairCount = 1, maxBasketSize = 10, topK = 10)
    ar.collect()
    def planStr(p: org.apache.spark.sql.execution.SparkPlan): String =
      p match {
        case a: org.apache.spark.sql.execution.adaptive
            .AdaptiveSparkPlanExec => a.executedPlan.toString
        case o => o.toString
      }
    val s = planStr(ar.queryExecution.executedPlan)
    assert(s.contains("ReusedExchange") || s.contains("ReusedQueryStage")
      || s.contains("TableCacheQueryStage"),
      s"no exchange reuse in the association plan:\n$s")
  }
}
