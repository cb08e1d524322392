package graft

import org.apache.spark.sql.functions._

import graft.operators.{Analytics, DedupOps, ScaleOps, SimilarityOps, TextOps}

/** Round-9 pipeline-audit operators: attribution, record linkage, shard
  * balance, padding efficiency, key-skew audit, variance spectrum, Heaps'
  * law.
  */
class PipelineAuditSpec extends SparkSpec {
  import spark.implicits._

  test("touchAttribution: first/last credit split, (direct) fallback, " +
    "exact cents") {
    val df = Seq(
      (1L, "2024-01-01 00:00:01", 1L, "ad", Some(0.0)),
      (1L, "2024-01-01 00:00:02", 2L, "email", Some(0.0)),
      (1L, "2024-01-01 00:00:03", 3L, "purchase", Some(2.5)),
      (2L, "2024-01-01 00:00:01", 4L, "purchase", Some(1.0)), // no touch
      (3L, "2024-01-01 00:00:01", 5L, "ad", Some(0.0)),
      (3L, "2024-01-01 00:00:02", 6L, "purchase", None) // null value -> 0
    ).toDF("u", "d", "id", "et", "v")
      .withColumn("ts", col("d").cast("timestamp"))
    val out = Analytics.touchAttribution(df, "u", "ts", "id", "et", "v",
      "purchase").orderBy("channel")
      .as[(String, Long, Long, Long, Long, Double, Double)]
      .collect().toSeq
    // total cents = 250 + 100 + 0 = 350
    assert(out == Seq(
      ("(direct)", 1L, 100L, 1L, 100L, 0.285714, 0.285714),
      ("ad", 2L, 250L, 1L, 0L, 0.714286, 0.0),
      ("email", 0L, 0L, 1L, 250L, 0.0, 0.714286)))
  }

  test("Contracts.validate: all five constraint types, violations " +
    "counted exactly, null-share tolerance honored") {
    import graft.operators.Contracts
    val df = Seq(
      (1L, Some(10L), "A", 5.0),
      (1L, Some(20L), "A", 50.0),   // dup key
      (2L, None, "B", -1.0),        // null fk, below range
      (3L, Some(99L), "C", 5.0)     // orphan fk, bad status
    ).toDF("k", "fk", "st", "v")
    val dim = Seq(10L, 20L).toDF("dk")
    val out = Contracts.validate(df, Seq(
        Contracts.Unique(Seq("k")),
        Contracts.NotNull("fk", maxNullShare = 0.5),
        Contracts.NotNull("fk"),
        Contracts.InSet("st", Seq("A", "B")),
        Contracts.InRange("v", 0.0, 10.0),
        Contracts.RefIntegrity("fk", dim, "dk")))
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        ((r.getLong(2), r.getLong(3), r.getDouble(4), r.getBoolean(5))))
      .toMap
    assert(out(("unique", "k")) == ((4L, 1L, 0.25, false)))
    assert(out(("not_null", "fk nullShare<=0.5")) == ((4L, 1L, 0.25, true)))
    assert(out(("not_null", "fk nullShare<=0.0")) == ((4L, 1L, 0.25, false)))
    assert(out(("in_set", "st in(A,B)")) == ((4L, 1L, 0.25, false)))
    assert(out(("in_range", "v in[0.0,10.0]")) == ((4L, 2L, 0.5, false)))
    assert(out(("ref_integrity", "fk->dk")) == ((4L, 1L, 0.25, false)))
  }

  test("auditAll: every audit contributes its row and the hand-checkable " +
    "numbers are right") {
    import graft.operators.PipelineAudit
    val docs = Seq(
      (1L, "a b c d", "web", "en", 7L),
      (2L, "a b c d", "web", "en", 7L),   // exact dup of 1
      (3L, "x y", "books", "en", 3L),
      (4L, null.asInstanceOf[String], "web", "en", 0L)
    ).toDF("doc_id", "text", "source", "lang", "n_chars")
    val emb = Seq((1L, Array(3.0f, 4.0f)), (2L, Array(0.0f, 0.0f)))
      .toDF("vec_id", "embedding")
    val pairs = Seq((1L, 2L), (1L, 3L)).toDF("id_a", "id_b")
    val splits = Seq((1L, "train"), (2L, "train"), (3L, "val"))
      .toDF("doc_id", "split")
    val out = PipelineAudit.auditAll(docs, "doc_id", "text", "source",
        "n_chars", emb, "embedding", pairs, "id_a", "id_b",
        splits, "doc_id", "split", nShards = 2, bucketStep = 4)
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getDouble(2))
      .toMap
    assert(out(("corpus", "n_docs")) == 4.0)
    assert(out(("corpus", "total_tokens")) == 10.0)
    assert(out(("corpus", "null_text_share")) == 0.25)
    // docs 1,2 collapse -> 2 distinct among 3 non-null
    assert(out(("exact_dup", "dup_doc_share")) == 0.333333)
    // pairs: (1,2) train-train, (1,3) train-val -> 1 cross pair
    assert(out(("split_leakage", "cross_pairs")) == 1.0)
    // tokens 4,4,2 at step 4 -> caps 4,4,4 -> 10/12
    assert(out(("padding", "global_efficiency")) == 0.833333)
    // source census web=3, books=1 -> skew 3/(4/2)=1.5, top1 3/4
    assert(out(("key_skew", "skew_factor")) == 1.5)
    assert(out(("key_skew", "top1_share")) == 0.75)
    // norms 5 and 0 -> mean 2.5
    assert(out(("embeddings", "mean_norm")) == 2.5)
    assert(out(("embeddings", "n_vectors")) == 2.0)
    assert(out.contains(("shard_balance", "max_byte_share")))
    assert(out.size == 11)
  }

  test("touchAttribution: a prior conversion is NOT a touch — a " +
    "[buy, view, buy] history credits the second buy to view, and a " +
    "conversion whose only predecessors are conversions goes (direct)") {
    val df = Seq(
      (1L, "2024-01-01 00:00:01", 1L, "purchase", Some(1.0)),
      (1L, "2024-01-01 00:00:02", 2L, "view", Some(0.0)),
      (1L, "2024-01-01 00:00:03", 3L, "purchase", Some(1.0)),
      (2L, "2024-01-01 00:00:01", 4L, "purchase", Some(1.0)),
      (2L, "2024-01-01 00:00:02", 5L, "purchase", Some(1.0)) // conv-only prefix
    ).toDF("u", "d", "id", "et", "v")
      .withColumn("ts", col("d").cast("timestamp"))
    val out = Analytics.touchAttribution(df, "u", "ts", "id", "et", "v",
      "purchase").orderBy("channel")
      .as[(String, Long, Long, Long, Long, Double, Double)]
      .collect().toSeq
    // 4 conversions, 100c each: user 1's second buy -> view (both models);
    // the three others have no non-conversion predecessor -> (direct)
    assert(out == Seq(
      ("(direct)", 3L, 300L, 3L, 300L, 0.75, 0.75),
      ("view", 1L, 100L, 1L, 100L, 0.25, 0.25)))
  }

  test("blockedLinkage: pairs only within blocks at maxDist; hot blocks " +
    "dropped whole") {
    val df = Seq(
      (1L, "alpha1", "b1"), (2L, "alpha2", "b1"), // dist 1, same block
      (3L, "alpha1", "b2"),                       // same name, other block
      (4L, "gamma", "b3"), (5L, "delta", "b3")    // dist > 1
    ).toDF("id", "nm", "blk")
    val out = DedupOps.blockedLinkage(df, "id", "nm", Seq("blk"), maxDist = 1)
      .as[(Long, Long, String, String, Long)].collect().toSeq
    assert(out == Seq((1L, 2L, "alpha1", "alpha2", 1L)))
    // a cap of 1 drops the (1,2) block entirely — no pairs survive
    val capped = DedupOps.blockedLinkage(df, "id", "nm", Seq("blk"),
      maxDist = 1, maxBlockSize = 1)
    assert(capped.count() == 0L)
  }

  test("hashShardBalance: every row routed, byte shares sum to 1, route " +
    "is stable across calls") {
    val df = (0L until 100L).map(i => (i, 10L + i)).toDF("id", "sz")
    val out = ScaleOps.hashShardBalance(df, "id", "sz", "s:", 4)
      .orderBy("shard").collect()
    assert(out.map(_.getLong(1)).sum == 100L)
    assert(out.map(_.getLong(2)).sum == (0L until 100L).map(10L + _).sum)
    assert(math.abs(out.map(_.getDouble(3)).sum - 1.0) < 1e-4)
    val again = ScaleOps.hashShardBalance(df, "id", "sz", "s:", 4)
      .orderBy("shard").collect()
    assert(out.map(_.toSeq.toList).toList == again.map(_.toSeq.toList).toList)
  }

  test("paddingEfficiency: caps are exact 64-multiples incl. the " +
    "boundary, efficiency = real/padded") {
    val df = Seq(1, 64, 65, 0).toDF("tok") // 0 tokens excluded
    val out = ScaleOps.paddingEfficiency(df, "tok", 64)
      .orderBy("bucket_cap").as[(Long, Long, Long, Long, Double)]
      .collect().toSeq
    assert(out == Seq(
      (64L, 2L, 65L, 128L, 0.507813), // 1 + 64 share the first bucket
      (128L, 1L, 65L, 128L, 0.507813)))
  }

  test("keySkewAudit: exact order-statistic percentiles and max/mean " +
    "skew factor") {
    val rows = Seq.fill(1)("a") ++ Seq.fill(2)("b") ++ Seq.fill(3)("c") ++
      Seq.fill(10)("d") ++ Seq(null.asInstanceOf[String])
    val out = ScaleOps.keySkewAudit(rows.toDF("k"), "k")
      .as[(Long, Long, Long, Long, Long, Long, Double, Double)]
      .collect().head
    // count census sorted: [1, 2, 3, 10]; p50 -> r=2 (2), p90/p99 -> r=4
    assert(out == (4L, 16L, 10L, 2L, 10L, 10L, 2.5, 0.625))
    // r12 directive: the audit must not gather the distinct-key census
    // into one task — the row_number rides GlobalRankRewrite's native
    // exec (no Window) and the census totals ride a broadcast one-row
    // agg. The only SinglePartition exchanges left are the final-merge
    // of PARTIAL aggregate rows (≤ one row per map partition — metadata
    // scale), never census rows: assert every SinglePartition sits
    // directly above a partial HashAggregate.
    val plan = ScaleOps.keySkewAudit(rows.toDF("k"), "k")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Window"),
      s"keySkewAudit must not plan a census-wide window:\n$plan")
    val lines = plan.linesIterator.toIndexedSeq
    lines.zipWithIndex.filter(_._1.contains("Exchange SinglePartition"))
      .foreach { case (_, i) =>
        assert(i + 1 < lines.size &&
          lines(i + 1).contains("HashAggregate") &&
          lines(i + 1).contains("partial_"),
          s"SinglePartition at plan line $i is not a partial-agg " +
            s"final merge:\n$plan")
      }
  }

  test("vocabularyRichness: Chao1 floor and Good-Turing unseen mass " +
    "from the token census; saturated corpus reports zero unseen mass") {
    // census: a×3, b×2, c×1, d×1 -> N=7, V=4, f1=2, f2=1,
    // chao1 = 4 + 2*1/(2*2) = 4.5, P0 = 2/7
    val docs = Seq("a b c", "a b d", "a").toDF("text")
    val r = graft.operators.TextOps.vocabularyRichness(docs, "text")
      .collect().head
    assert((r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)) ==
      ((7L, 4L, 2L, 1L)))
    assert(r.getDouble(4) == 4.5)
    assert(r.getDouble(5) == BigDecimal(2.0 / 7)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
    // every type seen >= 3 times: f1 = 0 -> chao1 = V, unseen mass 0
    val sat = Seq("x y", "x y", "x y").toDF("text")
    val rs = graft.operators.TextOps.vocabularyRichness(sat, "text")
      .collect().head
    assert(rs.getDouble(4) == 2.0 && rs.getDouble(5) == 0.0)
  }

  test("rangeSplitPoints: exact balanced bounds, a dominant key covers " +
    "consecutive split indices (the honest can't-balance signal)") {
    // keys (string order): a x 2, b x 6, c x 2; N=10, P=4, targets
    // ceil(i*10/4) = 3, 5, 8. cum: a=2, b=8, c=10 -> splits 1,2,3 all
    // land on b (covers targets 3..8): range partitioning cannot split b
    val df = (Seq.fill(2)("a") ++ Seq.fill(6)("b") ++ Seq.fill(2)("c"))
      .toDF("k")
    val out = ScaleOps.rangeSplitPoints(df, "k", 4)
      .as[(Long, String, Long, Long)].collect().toSeq
    assert(out == Seq((1L, "b", 8L, 3L), (2L, "b", 8L, 5L),
      (3L, "b", 8L, 8L)))
    // balanced keys: each split point falls on a distinct key
    val bal = (1 to 8).map(i => f"k$i%02d").toDF("k")
    val ob = ScaleOps.rangeSplitPoints(bal, "k", 4)
      .as[(Long, String, Long, Long)].collect().toSeq
    assert(ob == Seq((1L, "k02", 2L, 2L), (2L, "k04", 4L, 4L),
      (3L, "k06", 6L, 6L)))
  }

  test("temperatureSample: T=1 reproduces natural rates, T -> inf " +
    "approaches uniform weights, saturated domains cap at rate 1 with " +
    "the shortfall visible") {
    val df = (Seq.fill(80)("big") ++ Seq.fill(20)("small"))
      .zipWithIndex.map { case (g, i) => (g, i.toLong) }.toDF("g", "id")
    // T=1: weights are the natural shares 0.8/0.2
    val nat = ScaleOps.temperatureSample(df, "g", "id",
      temperature = 1.0, budget = 50L, salt = "t:")
      .orderBy("g").collect()
    assert(nat.map(_.getDouble(2)).toSeq == Seq(0.8, 0.2))
    assert(nat.map(_.getLong(3)).toSeq == Seq(40L, 10L))
    // high T: weights near-uniform -> the small domain is upsampled
    val hot = ScaleOps.temperatureSample(df, "g", "id",
      temperature = 1000.0, budget = 50L, salt = "t:")
      .orderBy("g").collect()
    assert(math.abs(hot.head.getDouble(2) - 0.5) < 0.01)
    // budget beyond the population: acceptance saturates at 1, n_after
    // = n_before, and the unmet target stays VISIBLE in n_target
    val sat = ScaleOps.temperatureSample(df, "g", "id",
      temperature = 1.0, budget = 1000L, salt = "t:")
      .orderBy("g").collect()
    assert(sat.forall(r => r.getDouble(4) == 1.0 &&
      r.getLong(5) == r.getLong(1)))
    assert(sat.head.getLong(3) == 800L) // asked for 800, only 80 exist
  }

  test("epochsPlan: repetition factors, the data-constrained flag and " +
    "capped effective tokens against a temperature mixture") {
    val df = Seq(("en", 900L), ("no", 100L)).toDF("g", "tok")
    // T=2 (alpha=.5): weights 30/(30+10)=0.75, 0.25; budget 4000 ->
    // requested 3000/1000; epochs 3000/900=3.33, 1000/100=10 (> 4 cap)
    val out = ScaleOps.epochsPlan(df, "g", "tok", temperature = 2.0,
      budget = 4000L, maxEpochs = 4.0).orderBy("g").collect()
    val en = out.head
    assert(en.getString(0) == "en" && en.getLong(1) == 900L &&
      en.getDouble(2) == 0.75 && en.getLong(3) == 3000L &&
      !en.getBoolean(5) && en.getLong(6) == 3000L)
    val no = out(1)
    assert(no.getLong(3) == 1000L && no.getDouble(4) == 10.0 &&
      no.getBoolean(5) && no.getLong(6) == 400L) // capped at 4 epochs
  }

  test("bloomFilterAudit: zero false negatives by construction, a " +
    "saturated filter forces false positives, cell counts consistent") {
    val build = (1 to 50).map(i => s"k$i").toDF("k")
    val probe = (26 to 100).map(i => s"k$i").toDF("k") // 25 hit, 50 miss
    val r = ScaleOps.bloomFilterAudit(build, "k", probe, "k",
      mBits = 64, numHashes = 3).collect().head
    assert(r.getLong(2) == 50L)                  // build keys
    assert(r.getLong(5) == 75L && r.getLong(6) == 25L)
    // Bloom filters never miss a present key: every present probe key
    // passes, so maybe = present + false positives exactly
    assert(r.getLong(7) >= 25L)
    assert(r.getLong(8) == r.getLong(7) - 25L)
    // 50 keys x 3 hashes into 64 bits saturates the filter: false
    // positives are structurally certain
    assert(r.getLong(8) > 0L)
    assert(r.getDouble(9) == BigDecimal(r.getLong(8).toDouble / 50.0)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
    assert(r.getLong(3) <= 64L && r.getDouble(4) ==
      BigDecimal(r.getLong(3).toDouble / 64.0)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
  }

  test("varianceSpectrum: dead dim ranks last, cumulative share ends " +
    "at 1") {
    val df = Seq(Seq(1.0f, 0.0f), Seq(1.0f, 4.0f), Seq(1.0f, 8.0f))
      .toDF("vec")
    val out = SimilarityOps.varianceSpectrum(df, "vec").orderBy("rnk")
      .as[(Long, Long, Double, Long, Double)].collect().toSeq
    assert(out.head._1 == 1L && out.head._4 == 1L) // varying dim ranks 1st
    assert(out.last._3 == 0.0)                     // constant dim: var 0
    assert(out.last._5 == 1.0)                     // cum share closes at 1
  }

  test("clusterSizeDistribution: histogram + removable counts, " +
    "singletons as the size-1 row") {
    // pairs: {1,2,3} via chain, {5,6}; universe adds singletons 4, 7
    val pairs = Seq((1L, 2L), (2L, 3L), (5L, 6L)).toDF("id_a", "id_b")
    val universe = (1L to 7L).toDF("doc_id")
    val out = graft.operators.DedupOps.clusterSizeDistribution(
      pairs, "id_a", "id_b", universe, "doc_id")
      .orderBy("cluster_size").as[(Long, Long, Long, Long)].collect().toSeq
    assert(out == Seq(
      (1L, 2L, 2L, 0L),  // 4 and 7
      (2L, 1L, 2L, 1L),  // {5,6}
      (3L, 1L, 3L, 2L))) // {1,2,3}
  }

  test("vocabCoverage: top-k occurrence shares at the checkpoints, " +
    "k beyond the vocab covers everything") {
    val df = Seq("a a a a b b c", "a b c d").toDF("text")
    val out = TextOps.vocabCoverage(df, "text", ks = Seq(1, 2, 100))
      .as[(Long, Long, Double, Double, Double)].collect().head
    // counts: a=5, b=3, c=2, d=1 (total 11)
    assert(out == (4L, 11L, 0.454545, 0.727273, 1.0))
  }

  test("ngramNovelty: grams shared with another doc are not novel; " +
    "wholly-copied docs score 0") {
    val df = Seq(
      (1L, "a b c d e"),   // grams: "a b c", "b c d", "c d e"
      (2L, "a b c d e"),   // exact copy -> nothing novel in either
      (3L, "x y z w v")    // entirely unique -> novelty 1
    ).toDF("doc_id", "text")
    val out = TextOps.ngramNovelty(df, "doc_id", "text", gramWords = 3)
      .orderBy("doc_id").as[(Long, Long, Long, Double)].collect().toSeq
    assert(out == Seq((1L, 3L, 0L, 0.0), (2L, 3L, 0L, 0.0),
      (3L, 3L, 3L, 1.0)))
  }

  test("groupedSpearman: monotone-nonlinear = 1, reversed = -1, ties " +
    "via midranks") {
    val df = Seq(
      ("m", 1L, 1L), ("m", 2L, 8L), ("m", 3L, 27L), ("m", 4L, 1000L),
      ("r", 1L, 40L), ("r", 2L, 30L), ("r", 3L, 20L), ("r", 4L, 10L)
    ).toDF("g", "x", "y")
    val out = Analytics.groupedSpearman(df, "g", "x", "y").orderBy("g")
      .as[(String, Long, Double)].collect().toSeq
    assert(out == Seq(("m", 4L, 1.0), ("r", 4L, -1.0)))
  }

  test("letArray-bound shingles/charNgrams equal a driver-side sliding " +
    "reference on randomized text") {
    val rnd = new scala.util.Random(11)
    val texts = (1 to 25).map { i =>
      val words = (0 until rnd.nextInt(8)).map(_ =>
        ('a' + rnd.nextInt(3)).toChar.toString * (1 + rnd.nextInt(2)))
      (i.toLong, words.mkString(" ") + (if (i % 5 == 0) "  " else ""))
    }
    val df = texts.toDF("id", "text")
    val got = df.select(col("id"),
      TextOps.shingles(col("text"), 3).as("sh")).orderBy("id")
      .as[(Long, Seq[String])].collect().toMap
    texts.foreach { case (id, t) =>
      val toks = t.trim.split("\\s+").filter(_.nonEmpty).toSeq
      val want = if (toks.length < 3) Seq.empty
        else toks.sliding(3).map(_.mkString(" ")).toSeq
      assert(got(id) == want, s"id=$id text='$t'")
    }
  }

  test("cdcChunks plans map-side: no Exchange before the chunk rows") {
    val df = Seq((1L, "abcdefghijklmnop")).toDF("id", "text")
    val plan = TextOps.cdcChunks(df, "id", "text")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"),
      s"CDC chunking must not shuffle:\n$plan")
  }

  test("fairTopK: per-group exposure capped before the global cut") {
    val df = Seq(
      (1L, "a", 9.0), (2L, "a", 8.0), (3L, "a", 7.0), // a's 3rd best capped
      (4L, "b", 6.0), (5L, "b", 5.0), (6L, "c", 1.0)
    ).toDF("id", "g", "s")
    val out = ScaleOps.fairTopK(df, "g", "id", "s", perGroup = 2, k = 4)
      .orderBy("rank").as[(Long, String, Double, Long, Long)]
      .collect().toSeq
    // id 3 (a's rank 3) is excluded even though its score beats b's 2nd
    assert(out.map(_._1) == Seq(1L, 2L, 4L, 5L))
    assert(out.map(_._5) == Seq(1L, 2L, 3L, 4L))
  }

  test("aucExact: perfect separation = 1, reversed = 0, all-tied = 0.5") {
    val perfect = Seq((1L, 3.0, true), (2L, 2.0, true), (3L, 1.0, false),
      (4L, 0.5, false)).toDF("id", "s", "p")
    assert(Analytics.aucExact(perfect, "id", "s", "p")
      .as[(Long, Long, Double)].collect().head == (2L, 2L, 1.0))
    val reversed = perfect.withColumn("p", !col("p"))
    assert(Analytics.aucExact(reversed, "id", "s", "p")
      .as[(Long, Long, Double)].collect().head == (2L, 2L, 0.0))
    val tied = Seq((1L, 1.0, true), (2L, 1.0, false)).toDF("id", "s", "p")
    assert(Analytics.aucExact(tied, "id", "s", "p")
      .as[(Long, Long, Double)].collect().head == (1L, 1L, 0.5))
  }

  test("liftCurve: a perfect score puts all positives in the top " +
    "buckets; lifts are exact rationals, capture closes at 1") {
    // 20 rows, 4 positives with the 4 highest scores -> 5 buckets of 4
    val df = (1L to 20L).map(i => (i, 21.0 - i, i <= 4)).toDF("id", "s", "p")
    val out = Analytics.liftCurve(df, "id", "s", "p", nBuckets = 5)
      .orderBy("bucket").as[(Long, Long, Long, Double, Double, Double)]
      .collect().toSeq
    assert(out.head == (1L, 4L, 4L, 1.0, 5.0, 1.0)) // all positives, lift 5
    assert(out.tail.forall(r => r._3 == 0L && r._5 == 0.0))
    assert(out.forall(_._6 == 1.0) == false || out.last._6 == 1.0)
    assert(out.last._6 == 1.0)
  }

  test("permutationTest: fully separated groups hit the add-one floor " +
    "p = 1/(B+1); exact counts and means") {
    val rows = (1L to 50L).map(i => (i, "A", 100.0)) ++
      (51L to 100L).map(i => (i, "B", 1.0))
    val df = rows.toDF("id", "g", "v")
    val out = Analytics.permutationTest(df, "g", "id", "v", "A", "B", "s:")
      .as[(Long, Long, Double, Double, Double, Double)].collect().head
    assert(out == (50L, 50L, 100.0, 1.0, 99.0,
      math.rint(1.0 / 65.0 * 1e6) / 1e6))
    // the size-adaptive rank strategies must be bit-identical: force the
    // scale kernel (threshold 0) and compare against the window form
    val scaled = Analytics.permutationTest(df, "g", "id", "v", "A", "B",
        "s:", scaleRankThreshold = 0L)
      .as[(Long, Long, Double, Double, Double, Double)].collect().head
    assert(scaled == out)
  }

  test("bootstrapMeanCi: interval brackets the mean, all replicas " +
    "survive, rerun is bit-identical") {
    val df = (1L to 200L).map(i => ("g", i, (i % 50).toDouble + 1.0))
      .toDF("grp", "id", "v")
    val out = Analytics.bootstrapMeanCi(df, "grp", "id", "v", "t:")
      .as[(String, Long, Double, Double, Double, Long)].collect().head
    assert(out._2 == 200L && out._6 == 32L)
    assert(out._4 <= out._3 && out._3 <= out._5,
      s"CI [${out._4}, ${out._5}] must bracket mean ${out._3}")
    assert(out._4 < out._5)
    val again = Analytics.bootstrapMeanCi(df, "grp", "id", "v", "t:")
      .as[(String, Long, Double, Double, Double, Long)].collect().head
    assert(out == again)
  }

  test("cdcChunks: chunks reconstruct the document, and boundaries " +
    "re-synchronize after an insertion (the CDC property)") {
    // deterministic pseudo-random text so mask-6 boundaries exist
    val rnd = new scala.util.Random(7)
    val base = (1 to 400).map(_ => ('a' + rnd.nextInt(26)).toChar).mkString
    val edited = base.substring(0, 10) + "INSERT" + base.substring(10)
    val df = Seq((1L, base), (2L, edited)).toDF("id", "text")
    val chunks = TextOps.cdcChunks(df, "id", "text")
      .orderBy("id", "chunk_idx")
      .as[(Long, Long, Long, Long, String)].collect().toSeq
    val (a, b) = (chunks.filter(_._1 == 1L), chunks.filter(_._1 == 2L))
    assert(a.map(_._5).mkString == base)    // lossless reconstruction
    assert(b.map(_._5).mkString == edited)
    assert(a.forall(c => c._4 == c._5.length))
    // every boundary is content-local: chunks after the edit realign, so
    // the two versions SHARE their tail chunks (fixed-stride would not)
    val shared = a.map(_._5).toSet intersect b.map(_._5).toSet
    assert(shared.contains(a.last._5),
      s"tail chunk did not re-sync: a=${a.map(_._4)} b=${b.map(_._4)}")
  }

  test("assortativity: a star graph is perfectly disassortative (r = -1)") {
    val edges = Seq(("h", "a"), ("h", "b"), ("h", "c")).toDF("s", "t")
    val out = graft.operators.GraphOps.assortativity(edges, "s", "t")
      .as[(Long, Double)].collect().head
    assert(out == (6L, -1.0)) // 3 undirected edges -> 6 directed
  }

  test("mutualNearestNeighbors: reciprocal pairs only, self-match " +
    "discarded, each pair emitted once") {
    val vecs = Seq(
      (16L, Seq(1.0f, 0.10f)), (17L, Seq(1.0f, 0.11f)), // mutual pair
      (18L, Seq(0.10f, 1.0f)), (19L, Seq(0.12f, 1.0f)), // mutual pair
      (20L, Seq(-1.0f, -1.0f))                           // nobody's best
    ).toDF("vec_id", "embedding")
    val cents = Seq((0L, Seq(1.0f, 0.0f)), (1L, Seq(0.0f, 1.0f)))
      .toDF("cid", "cvec")
    val out = SimilarityOps.mutualNearestNeighbors(vecs, "vec_id",
      "embedding", cents, "cid", "cvec", nprobe = 2)
      .orderBy("id_a").as[(Long, Long, Double)].collect().toSeq
    assert(out.map(r => (r._1, r._2)) == Seq((16L, 17L), (18L, 19L)))
  }

  test("uniformRejectionSample: over-represented buckets thin toward " +
    "C/k, rare buckets survive whole, rerun-deterministic") {
    val df = ((1L to 90L).map(i => (i, "big")) ++
      Seq((91L, "small"), (92L, "small"))).toDF("id", "b")
    val out = ScaleOps.uniformRejectionSample(df, "b", "id", "s:")
      .orderBy("b").as[(String, Long, Double, Long)].collect().toSeq
    // C=92, k=2 -> target 46/bucket: big accepts at 46/90, small at 1.0
    assert(out.map(r => (r._1, r._2, r._3)) ==
      Seq(("big", 90L, 0.511111), ("small", 2L, 1.0)))
    assert(out(1)._4 == 2L)                  // rare bucket kept whole
    assert(out(0)._4 > 20L && out(0)._4 < 70L) // thinned near 46
    val again = ScaleOps.uniformRejectionSample(df, "b", "id", "s:")
      .orderBy("b").as[(String, Long, Double, Long)].collect().toSeq
    assert(out == again)
  }

  test("plan shapes: shard/padding audits are pure aggregations (one " +
    "exchange, no join); attribution joins its censuses via broadcast") {
    val docs = (0L until 200L).map(i => (i, s"w$i", 10L + i))
      .toDF("id", "txt", "sz")
    val shardPlan = ScaleOps.hashShardBalance(docs, "id", "sz", "s:", 4)
      .queryExecution.executedPlan.toString
    // one hashpartitioning exchange for the shard census; the totals side
    // reaches the cross join as a broadcast, never a shuffle join
    assert(shardPlan.contains("Exchange hashpartitioning"))
    assert(!shardPlan.contains("SortMergeJoin"),
      s"shard balance must not sort-merge join:\n$shardPlan")
    val padPlan = ScaleOps.paddingEfficiency(
      docs.select(col("sz").as("tok")), "tok", 64)
      .queryExecution.executedPlan.toString
    assert(!padPlan.contains("Join"),
      s"padding audit is join-free:\n$padPlan")
    val ev = Seq((1L, "2024-01-01 00:00:01", 1L, "a", 1.0))
      .toDF("u", "d", "id", "et", "v")
      .withColumn("ts", col("d").cast("timestamp"))
    val attrPlan = Analytics.touchAttribution(ev, "u", "ts", "id", "et",
      "v", "a").queryExecution.executedPlan.toString
    assert(attrPlan.contains("BroadcastNestedLoopJoin") ||
      attrPlan.contains("BroadcastExchange"),
      s"attribution totals must broadcast:\n$attrPlan")
    assert(attrPlan.contains("Window"),
      s"attribution reads touches from one window pass:\n$attrPlan")
  }

  test("profileDrift: null/distinct deltas per column, range_moved only " +
    "when the lexical domain shifts") {
    val before = Seq((Some("a"), 1L), (Some("b"), 2L), (None, 2L))
      .toDF("s", "n")
    val after = Seq((Some("a"), 1L), (Some("b"), 2L), (None, 2L),
      (None, 9L)).toDF("s", "n")
    val out = Analytics.profileDrift(before, after, Seq("s", "n"))
      .orderBy("col_name")
      .as[(String, Long, Long, Long, Long, Long, Long, Boolean)]
      .collect().toSeq
    assert(out == Seq(
      ("n", 0L, 0L, 0L, 2L, 3L, 1L, true),   // max "2" -> "9"
      ("s", 1L, 2L, 1L, 2L, 2L, 0L, false))) // domain {a,b} unchanged
  }

  test("jaccardThresholdCurve: monotone counts from one pass, zero row " +
    "for a tau above every pair") {
    val docs = Seq(
      (1L, "a b c d", "x"), (2L, "a b c d", "x"), // jaccard 1.0
      (3L, "a b c z", "x"),                       // vs 1/2: j = 0.333 (2-grams)
      (4L, "p q r s", "x")                        // no overlap
    ).toDF("doc_id", "text", "lang")
    val out = graft.operators.DedupOps.jaccardThresholdCurve(docs,
      "doc_id", "text", "lang", shingleWords = 2,
      taus = Seq(0.2, 0.8, 0.99))
      .orderBy("tau").as[(Double, Long)].collect().toSeq
    // 2-gram sets: {ab,bc,cd} ×2, {ab,bc,cz}; j(1,2)=1.0, j(1,3)=j(2,3)=0.5
    assert(out == Seq((0.2, 3L), (0.8, 1L), (0.99, 1L)))
    intercept[IllegalArgumentException] {
      graft.operators.DedupOps.jaccardThresholdCurve(docs, "doc_id",
        "text", "lang", 2, Seq(0.0))
    }
  }

  test("splitLeakage: canonical cell keys, cross-split cells flagged, " +
    "orientation-invariant") {
    val pairs = Seq((1L, 2L), (3L, 4L), (6L, 5L)).toDF("id_a", "id_b")
    val asg = Seq((1L, "train"), (2L, "val"), (3L, "train"), (4L, "train"),
      (5L, "val"), (6L, "train")).toDF("doc_id", "split")
    val out = DedupOps.splitLeakage(pairs, "id_a", "id_b", asg, "doc_id",
      "split").orderBy("split_a", "split_b")
      .as[(String, String, Long, Boolean)].collect().toSeq
    // (1,2) and (6,5) both land in the same (train,val) cell despite
    // opposite orientation; (3,4) is a clean within-train pair
    assert(out == Seq(("train", "train", 1L, false),
      ("train", "val", 2L, true)))
  }

  test("joinCardinalityAudit: exact Σ a·b vs the independence estimate, " +
    "top-key share") {
    val left = Seq("a", "a", "b", "c", null).toDF("jk")
    val right = Seq("a", "a", "a", "b", "d").toDF("jk")
    val out = ScaleOps.joinCardinalityAudit(left, right, "jk")
      .as[(Long, Long, Long, Long, Long, Long, Double, Double, Double)]
      .collect().head
    // exact = 2·3 (a) + 1·1 (b) = 7; est = 4·5/max(3,3) = 6.6667
    assert(out == (4L, 5L, 3L, 3L, 7L, 6L, 6.6667, 1.05, 0.857143))
  }

  test("ndcgAtK: ideal-order run scores 1.0, swapped run scores the " +
    "hand-computed ratio, no positive judgment gives NULL") {
    import graft.operators.SimilarityOps
    val judg = Seq((1L, 10L, 2L), (1L, 11L, 1L),
      (2L, 10L, 2L), (2L, 11L, 1L)).toDF("q", "d", "rel")
    val run = Seq(
      (1L, 10L, 1L), (1L, 11L, 2L),   // ideal order
      (2L, 11L, 1L), (2L, 10L, 2L),   // swapped
      (3L, 10L, 1L)                   // no judgments for q=3
    ).toDF("q", "d", "rk")
    val got = SimilarityOps.ndcgAtK(run, "q", "d", "rk",
        judg, "q", "d", "rel", k = 2)
      .orderBy("q").collect()
      .map(r => (r.getLong(0), r.getDouble(1), r.getDouble(2),
        if (r.isNullAt(3)) None else Some(r.getDouble(3)))).toSeq
    assert(got == Seq(
      (1L, 2.63093, 2.63093, Some(1.0)),
      (2L, 2.26186, 2.63093, Some(0.859719)),
      (3L, 0.0, 0.0, None)))
  }

  test("rrfFusion: rank-only fusion, inner-join universe, score-desc " +
    "id-asc tiebreak") {
    val lex = Seq((1L, 9.0), (2L, 5.0), (3L, 5.0), (4L, 1.0))
      .toDF("id", "s1") // ranks: 1->1, 2->2, 3->3 (id tiebreak), 4->4
    val sem = Seq((2L, 0.9), (1L, 0.8), (3L, 0.7)).toDF("id", "s2")
    val out = SimilarityOps.rrfFusion(lex, sem, "id", "s1", "s2",
      k = 60, topK = 2).as[(Long, Long, Long, Double)].collect().toSeq
    // id 4 dropped (absent from sem); 1: 1/61+1/62; 2: 1/62+1/61 — tie,
    // id asc puts 1 first; topK=2 cuts id 3
    assert(out.map(r => (r._1, r._2, r._3)) == Seq((1L, 1L, 2L), (2L, 2L, 1L)))
    assert(out(0)._4 == out(1)._4)
  }

  test("heapsLaw: cumulative curve sums and OLS slope match the " +
    "hand-rolled fit") {
    val df = Seq((1L, "a b"), (2L, "a c"), (3L, "a d"))
      .map { case (i, t) => ("s", i, t) }.toDF("src", "id", "text")
    val out = TextOps.heapsLaw(df, "src", "id", "text")
      .as[(String, Long, Long, Long, Double)].collect().head
    // T = [2, 4, 6], V = [2, 3, 4]
    assert((out._1, out._2, out._3, out._4) == ("s", 3L, 6L, 4L))
    val (xs, ys) = (Seq(2.0, 4.0, 6.0).map(math.log),
      Seq(2.0, 3.0, 4.0).map(math.log))
    val (sx, sy) = (xs.sum, ys.sum)
    val sxy = xs.zip(ys).map { case (a, b) => a * b }.sum
    val sxx = xs.map(a => a * a).sum
    val beta = (3.0 * sxy - sx * sy) / (3.0 * sxx - sx * sx)
    assert(out._5 == math.rint(beta * 1e4) / 1e4 ||
      math.abs(out._5 - beta) < 5e-5)
  }
}
