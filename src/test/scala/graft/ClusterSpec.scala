package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.operators.{ClusterOps, GraphOps, SimilarityOps}

/** ClusterOps: Lloyd's k-means fit + SemDeDup semantic dedup. */
class ClusterSpec extends SparkSpec {

  private def vecDf(rows: Seq[(Long, Seq[Float])]) = {
    val schema = StructType(Seq(
      StructField("id", LongType, nullable = false),
      StructField("v", ArrayType(FloatType), nullable = false)))
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows.map { case (i, v) => Row(i, v) }, 2),
      schema)
  }

  // two tight direction bundles around +x and +y, plus init vectors inside
  private val corpus = vecDf(Seq(
    0L -> Seq(1.0f, 0.05f, 0.0f),
    1L -> Seq(0.05f, 1.0f, 0.0f),
    2L -> Seq(1.0f, 0.1f, 0.02f),
    3L -> Seq(0.9f, 0.0f, 0.05f),
    4L -> Seq(0.1f, 0.9f, 0.0f),
    5L -> Seq(0.0f, 1.1f, 0.04f),
    6L -> Seq(2.0f, 0.1f, 0.0f)))

  private def init = corpus.filter(col("id") < 2)
    .select(col("id").as("cid"), col("v").as("cvec"))

  test("kmeansFit converges to the two direction bundles") {
    val cents = ClusterOps.kmeansFit(corpus, "id", "v", init, "cid", "cvec",
      iters = 2)
    val assigned = SimilarityOps.ivfAssign(corpus, "id", "v", cents, "cid", "cvec")
      .select("id", "centroid").collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(Set(0L, 2L, 3L, 6L).map(assigned) == Set(0L))
    assert(Set(1L, 4L, 5L).map(assigned) == Set(1L))
    // centroid of the +x bundle points dominantly along x
    val c0 = cents.filter(col("cid") === 0).head.getSeq[Double](1)
    assert(c0.head > 5 * math.abs(c0(1)))
  }

  test("kmeansFit is deterministic across reruns and rounds components") {
    val a = ClusterOps.kmeansFit(corpus, "id", "v", init, "cid", "cvec", iters = 2)
      .orderBy("cid").collect().map(_.getSeq[Double](1))
    val b = ClusterOps.kmeansFit(corpus, "id", "v", init, "cid", "cvec", iters = 2)
      .orderBy("cid").collect().map(_.getSeq[Double](1))
    assert(a.map(_.toList).toList == b.map(_.toList).toList)
    // every component carries at most 6 decimals (the cross-engine contract)
    a.flatten.foreach { x =>
      assert((BigDecimal(x) * BigDecimal(1000000)).isWhole, s"unrounded $x")
    }
  }

  test("kmeansFit drops a cluster that loses all members") {
    // both corpus points sit on +x; the +y init centroid empties out
    val lopsided = vecDf(Seq(0L -> Seq(1.0f, 0.0f), 1L -> Seq(0.9f, 0.01f)))
    val init2 = vecDf(Seq(0L -> Seq(1.0f, 0.0f), 1L -> Seq(0.0f, 1.0f)))
      .select(col("id").as("cid"), col("v").as("cvec"))
    val cents = ClusterOps.kmeansFit(lopsided, "id", "v", init2, "cid", "cvec",
      iters = 1)
    assert(cents.select("cid").collect().map(_.getLong(0)).toSeq == Seq(0L))
  }

  test("linearProbeTrain separates a linearly separable set; deterministic") {
    val data = vecDf(Seq(
      0L -> Seq(1.0f, 0.2f, 0.0f), 1L -> Seq(0.9f, 0.1f, 0.1f),
      2L -> Seq(1.1f, 0.0f, 0.2f),
      3L -> Seq(-1.0f, 0.1f, 0.0f), 4L -> Seq(-0.8f, 0.2f, 0.1f),
      5L -> Seq(-1.2f, 0.0f, 0.1f)))
    val y = when(col("id") < 3, lit(1.0)).otherwise(lit(-1.0))
    val (w, errs) = ClusterOps.linearProbeTrain(data, "v", y,
      dims = 3, epochs = 2)
    // epoch 1 from w=0 misclassifies exactly the positives (sign(0) = -1)
    assert(errs.head == 3L)
    // the positive-mean direction separates this set -> epoch 2 clean
    assert(errs(1) == 0L)
    val margin = ClusterOps.linearMargin(col("v"), w)
    val preds = data.select(col("id"), when(margin > 0, 1.0).otherwise(-1.0))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert((0L to 2L).forall(preds(_) == 1.0))
    assert((3L to 5L).forall(preds(_) == -1.0))
    // weights carry at most 6 decimals and reruns are identical
    w.foreach(x => assert((BigDecimal(x) * BigDecimal(1000000)).isWhole))
    val (w2, errs2) = ClusterOps.linearProbeTrain(data, "v", y,
      dims = 3, epochs = 2)
    assert(w.toSeq == w2.toSeq && errs == errs2)
  }

  test("semanticDedup keeps lowest id per near-dup group, within cluster only") {
    val cents = ClusterOps.kmeansFit(corpus, "id", "v", init, "cid", "cvec",
      iters = 2)
    val out = ClusterOps.semanticDedup(corpus, "id", "v", cents, "cid", "cvec",
      tau = 0.98)
      .orderBy("id")
      .collect().map(r => (r.getLong(0), r.getBoolean(2),
        Option(r.get(3)).map(_.asInstanceOf[Long])))
    val byId = out.map(t => t._1 -> t).toMap
    // 0,2,6 are mutually ~parallel (+x): 0 kept, 2 and 6 shadowed by 0
    assert(byId(0L) == ((0L, true, None)))
    assert(byId(2L) == ((2L, false, Some(0L))))
    assert(byId(6L) == ((6L, false, Some(0L))))
    // 3 is +x but ~8.5 deg off: below tau=0.98? cos(0,3) = .9*1/(norm) ~ 0.996 → shadowed
    assert(!byId(3L)._2)
    // +y bundle: 1 kept; 5 is ~parallel to 1 → shadowed by 1
    assert(byId(1L) == ((1L, true, None)))
    assert(byId(5L)._3.contains(1L))
    // every vector appears exactly once
    assert(out.length == 7)
  }

  /** Driver-side replica of pageRank's exact arithmetic contract
    * (10¹²-scaled fixed-point BIGINT chain: truncating-div
    * contributions, order-independent integer in-sums, integer damping
    * (850000·m) div 10⁶, one final /10¹²) — the operator must match it
    * BITWISE, not approximately. */
  private def refPageRank(edges: Seq[(String, String)],
                          iters: Int): Map[String, Double] = {
    val nodes = (edges.map(_._1) ++ edges.map(_._2)).distinct
    val n = nodes.size
    val deg = edges.groupBy(_._1).view.mapValues(_.size).toMap
    val base12 = math.round((1.0 - 0.85) / n * 1e12)
    var pr = nodes.map(_ -> math.round(1e12 / n)).toMap
    for (_ <- 1 to iters) {
      val in = edges.groupBy(_._2).map { case (t, es) =>
        t -> es.map(e => pr(e._1) / deg(e._1)).sum
      }
      pr = nodes.map(v =>
        v -> (850000L * in.getOrElse(v, 0L) / 1000000L + base12)).toMap
    }
    pr.view.mapValues(_.toDouble / 1e12).toMap
  }

  test("pageRank: cycle is uniform; star concentrates on the hub; " +
    "bitwise equal to the reference chain; mass conserved w/o dangling") {
    import spark.implicits._
    // 3-cycle: symmetric — stays uniform at 1/3 every iteration
    val cyc = Seq(("a", "b"), ("b", "c"), ("c", "a"))
    val gotCyc = GraphOps.pageRank(cyc.toDF("s", "t"), "s", "t", 4)
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(gotCyc == refPageRank(cyc, 4))
    assert(gotCyc.values.toSet.size == 1)
    // undirected star (hub h, leaves l1..l4, both directions → no
    // dangling): hub outranks every leaf, total mass stays 1
    val star = Seq("l1", "l2", "l3", "l4").flatMap(l =>
      Seq(("h", l), (l, "h")))
    val gotStar = GraphOps.pageRank(star.toDF("s", "t"), "s", "t", 5)
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(gotStar == refPageRank(star, 5))
    assert(gotStar("h") > gotStar("l1"))
    assert(math.abs(gotStar.values.sum - 1.0) < 1e-9)
    // dangling sink (a→b, nothing out of b): b's mass leaks — documented
    val dang = Seq(("a", "b"))
    val gotDang = GraphOps.pageRank(dang.toDF("s", "t"), "s", "t", 3)
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(gotDang == refPageRank(dang, 3))
    assert(gotDang.values.sum < 1.0)
  }

  test("triangleCounts: K4 has 3 per node; canonicalization kills dupes/" +
    "loops/direction; open wedge and hub-star count zero") {
    import spark.implicits._
    def tri(edges: Seq[(String, String)]): Map[String, Long] =
      GraphOps.triangleCounts(edges.toDF("s", "t"), "s", "t")
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // K4: every node sits in C(3,2)=3 triangles; 4 triangles total
    val k4 = for {
      a <- Seq("a", "b", "c", "d"); b <- Seq("a", "b", "c", "d")
      if a < b
    } yield (a, b)
    val gotK4 = tri(k4)
    assert(gotK4 == Map("a" -> 3L, "b" -> 3L, "c" -> 3L, "d" -> 3L))
    // duplicates, reversed direction, and self-loops change nothing
    assert(tri(k4 ++ k4.map(_.swap) ++ Seq(("a", "a"))) == gotK4)
    // open wedge a-b-c (no closing edge) and a hub star have no
    // triangles → empty result, not zero rows per node
    assert(tri(Seq(("a", "b"), ("b", "c"))).isEmpty)
    assert(tri(Seq("h" -> "x", "h" -> "y", "h" -> "z")).isEmpty)
    // triangle + pendant: pendant node absent, triangle nodes count 1
    assert(tri(Seq(("a", "b"), ("b", "c"), ("a", "c"), ("c", "d"))) ==
      Map("a" -> 1L, "b" -> 1L, "c" -> 1L))
  }

  test("labelPropagation: two cliques joined by a bridge resolve to two " +
    "communities; min-label tiebreak is deterministic; isolated-source " +
    "node keeps its label") {
    import spark.implicits._
    def lp(edges: Seq[(String, String)], iters: Int): Map[String, String] =
      GraphOps.labelPropagation(
        (edges ++ edges.map(_.swap)).toDF("s", "t"), "s", "t", iters)
        .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    // K3 {a1,a2,a3} — K3 {b1,b2,b3} with one bridge a3-b1: each clique
    // collapses onto its smallest label
    val twoCliques = Seq(("a1", "a2"), ("a1", "a3"), ("a2", "a3"),
      ("b1", "b2"), ("b1", "b3"), ("b2", "b3"), ("a3", "b1"))
    val got = lp(twoCliques, 4)
    assert(got("a1") == "a1" && got("a2") == "a1")
    assert(got("b2") == got("b3") && got("b2") == got("b1"))
    assert(Set(got("a1"), got("b2")).size == 2)
    // tiebreak: node t with equally-frequent neighbor labels x and y
    // takes the smaller ("x") — and repeated runs agree bitwise
    val tie = Seq(("x", "t"), ("y", "t"))
    assert(lp(tie, 1)("t") == "x")
    assert(lp(tie, 3) == lp(tie, 3))
    // directed edge only: source has no in-edges → keeps its own label
    val directed = GraphOps.labelPropagation(
      Seq(("a", "b")).toDF("s", "t"), "s", "t", 2)
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(directed == Map("a" -> "a", "b" -> "a"))
  }

  test("kCore: K4 with a pendant tail peels to the clique at k=3; " +
    "cascade removal needs the extra round; k above max degree empties") {
    import spark.implicits._
    def core(edges: Seq[(String, String)], k: Int, rounds: Int) =
      GraphOps.kCore(edges.toDF("s", "t"), "s", "t", k, rounds)
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val k4 = for {
      a <- Seq("a", "b", "c", "d"); b <- Seq("a", "b", "c", "d")
      if a < b
    } yield (a, b)
    // tail d-e-f: e,f die round 1-2 (cascade), K4 survives with deg 3
    val g = k4 ++ Seq(("d", "e"), ("e", "f"))
    assert(core(g, 3, 4) ==
      Map("a" -> 3L, "b" -> 3L, "c" -> 3L, "d" -> 3L))
    // after ONE round the cascade hasn't reached e yet (f gone, e stays)
    assert(core(g, 2, 1).contains("e"))
    assert(!core(g, 2, 3).contains("f"))
    // k larger than any degree → empty graph
    assert(core(k4, 5, 3).isEmpty)
  }

  test("silhouetteByCentroid: aligned vectors score ~1, boundary vector " +
    "scores 0, assignment ties to smallest centroid id") {
    import spark.implicits._
    import graft.operators.SimilarityOps
    val cents = Seq((0L, Seq(1.0f, 0.0f)), (1L, Seq(0.0f, 1.0f)))
      .toDF("cid", "cvec")
    val vecs = Seq(
      (10L, Seq(5.0f, 0.0f)),  // c0: s1=1, s2=0 → sil (1-0)/(1-0) = 1.0
      (11L, Seq(0.0f, 3.0f)),  // c1: sil 1.0
      (12L, Seq(1.0f, 1.0f))   // tie 0.7071/0.7071 → c0, sil 0.0
    ).toDF("vec_id", "embedding")
    val got = SimilarityOps.silhouetteByCentroid(vecs, "vec_id",
      "embedding", cents, "cid", "cvec")
      .orderBy("centroid_id").as[(Long, Long, Double)].collect().toSeq
    // c0 mean: (1.0 + 0.0)/2 = 0.5
    assert(got == Seq((0L, 2L, 0.5), (1L, 1L, 1.0)))
    // duplicate centroids: every vector's s2 == s1 → silhouette 0
    val dup = Seq((0L, Seq(1.0f, 0.0f)), (1L, Seq(1.0f, 0.0f)))
      .toDF("cid", "cvec")
    val got2 = SimilarityOps.silhouetteByCentroid(
      Seq((10L, Seq(2.0f, 0.0f))).toDF("vec_id", "embedding"),
      "vec_id", "embedding", dup, "cid", "cvec")
      .as[(Long, Long, Double)].collect().toSeq
    assert(got2 == Seq((0L, 1L, 0.0)))
  }

  test("embeddingOutliers: the far vector ranks first in its label; " +
    "topK truncates; scores are deterministic fixed-point sums") {
    import spark.implicits._
    import graft.operators.SimilarityOps
    // label 0: three near-identical vectors + one far outlier
    val vecs = Seq(
      (1L, 0, Seq(1.0f, 0.0f)), (2L, 0, Seq(1.1f, 0.0f)),
      (3L, 0, Seq(0.9f, 0.0f)), (4L, 0, Seq(10.0f, 5.0f)),
      (5L, 1, Seq(0.0f, 1.0f)), (6L, 1, Seq(0.0f, -1.0f))
    ).toDF("vec_id", "label", "embedding")
    val got = SimilarityOps.embeddingOutliers(vecs, "vec_id", "embedding",
      "label", topK = 2)
      .orderBy("label", "rnk")
      .as[(Long, Long, Double, Long)].collect().toSeq
    // the big outlier drags dim0's mean to ~3.25, so 0.9 (vec 3) sits
    // farther from it than 1.1 (vec 2) → vec 3 ranks second
    assert(got.map(r => (r._1, r._2, r._4)) ==
      Seq((0L, 4L, 1L), (0L, 3L, 2L), (1L, 5L, 1L), (1L, 6L, 2L)))
    // the outlier's score dwarfs the inliers' (z² is bounded near n in a
    // tiny sample — the outlier inflates its own variance — so 5×, not ∞)
    assert(got.head._3 > 5 * got(1)._3)
    // deterministic across reruns
    val again = SimilarityOps.embeddingOutliers(vecs.repartition(5),
      "vec_id", "embedding", "label", topK = 2)
      .orderBy("label", "rnk")
      .as[(Long, Long, Double, Long)].collect().toSeq
    assert(again == got)
  }
}
