package graft

import org.apache.spark.sql.functions._

import graft.operators.{DedupOps, SimilarityOps, TextOps}

/** LLM-pipeline operators: text stats, fingerprints, exact + fuzzy dedup
  * (MinHash-LSH, SimHash, n-gram Jaccard), similarity search.
  */
class TextDedupSpec extends SparkSpec {
  import spark.implicits._

  private val base = "the quick brown fox jumps over the lazy dog and then " +
    "runs far away into the deep green forest tonight"
  private val nearDup = base + " quietly"           // one appended word
  private val distinct1 = "completely different words appear here with no overlap " +
    "whatsoever in any shingle of this sentence at all today"

  private def docs = Seq(
    (1L, base), (2L, nearDup), (3L, distinct1), (4L, base)
  ).toDF("doc_id", "text")

  test("TextOps.tokens / shingles handle short and empty inputs") {
    def sh(s: String, n: Int): Seq[String] =
      Seq(s).toDF("t").select(TextOps.shingles(col("t"), n).as("s"))
        .collect()(0).getSeq[String](0).toSeq
    assert(sh("a b c d", 3) == Seq("a b c", "b c d"))
    assert(sh("a b", 3) == Seq.empty)
    assert(sh("", 3) == Seq.empty)
    assert(sh("  a   b  ", 2) == Seq("a b"))
  }

  test("rollingHash matches a reference implementation") {
    def ref(s: String): Long =
      s.foldLeft(0L)((a, c) => (a * 31 + c.toInt) % 1000000007L)
    val got = Seq("abc", "hello world", "").toDF("t")
      .select(TextOps.rollingHash(col("t")).as("h")).collect().map(_.getLong(0))
    assert(got(0) == ref("abc"))
    assert(got(1) == ref("hello world"))
    assert(got(2) == 0L)
  }

  test("exact dedup keeps min-id doc and counts duplicates") {
    val out = DedupOps.exactDedup(docs, "doc_id", "text")
      .select("doc_id", "dup_count").orderBy("doc_id").collect()
    assert(out.map(_.getLong(0)).toSeq == Seq(1L, 2L, 3L)) // doc 4 == doc 1
    assert(out(0).getLong(1) == 2L)
  }

  test("MinHash-LSH finds the planted near-dup pair and nothing else") {
    val pairs = DedupOps.minhashLshPairs(docs.filter($"doc_id" =!= 4),
      "doc_id", "text", shingleWords = 3, numHashes = 16, bands = 8,
      threshold = 0.5)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(pairs == Set((1L, 2L)))
  }

  test("n-gram Jaccard (prefix-filtered) finds the same pair with the exact score") {
    val blocked = docs.filter($"doc_id" =!= 4).withColumn("blk", lit("x"))
    val out = DedupOps.ngramJaccardPairs(blocked, "doc_id", "text", "blk", 3, 0.5)
      .collect()
    assert(out.length == 1)
    assert((out(0).getLong(0), out(0).getLong(1)) == ((1L, 2L)))
    // base has 18 distinct 3-gram shingles... verify against brute force
    val a = base.split("\\s+").sliding(3).map(_.mkString(" ")).toSet
    val b = nearDup.split("\\s+").sliding(3).map(_.mkString(" ")).toSet
    val expected = BigDecimal(a.intersect(b).size.toDouble / a.union(b).size)
      .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(out(0).getDouble(2) == expected)
  }

  test("winnowing fingerprints match a driver-side replica; pairs find the dups") {
    // driver-side replica of the algorithm: position-ordered k-gram hashes
    // (60-bit md5 prefix), window-min over full windows, short-doc fallback
    def h60(s: String): Long = {
      val md = java.security.MessageDigest.getInstance("MD5")
      val hex = md.digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
      java.lang.Long.parseLong(hex.take(15), 16)
    }
    def replica(text: String, k: Int, w: Int): Set[Long] = {
      val hs = text.trim.split("\\s+").toSeq.sliding(k)
        .filter(_.size == k).map(g => h60(g.mkString(" "))).toVector
      if (hs.isEmpty) Set.empty
      else if (hs.size <= w) Set(hs.min)
      else hs.sliding(w).filter(_.size == w).map(_.min).toSet
    }
    val fp = DedupOps.winnowingFingerprints(docs, "doc_id", "text", 4, 4)
      .as[(Long, Long)].collect().groupBy(_._1).map { case (k, v) =>
        k -> v.map(_._2).toSet }
    for (id <- Seq(1L, 2L, 3L, 4L))
      assert(fp(id) == replica(docs.filter($"doc_id" === id)
        .select("text").as[String].head(), 4, 4), s"doc $id")
    // short doc (< one full window of shingles) still fingerprints
    val short = Seq((9L, "a b c d e")).toDF("doc_id", "text")
    val sfp = DedupOps.winnowingFingerprints(short, "doc_id", "text", 4, 4)
      .as[(Long, Long)].collect()
    assert(sfp.map(_._2).toSet == replica("a b c d e", 4, 4) && sfp.length == 1)
    // pairing: exact dup (1,4) fully overlaps, near-dup (1,2)/(2,4) high
    // overlap, distinct doc 3 appears in no pair
    val pairs = DedupOps.winnowingPairs(docs, "doc_id", "text", 4, 4, 3)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(3)).toMap
    assert(pairs.keySet == Set((1L, 2L), (1L, 4L), (2L, 4L)))
    assert(pairs((1L, 4L)) == 1.0)
    assert(pairs((1L, 2L)) >= 0.8)
    // hot-shingle guard: with maxDocFreq = 1 every shared fingerprint is
    // "boilerplate" and no pair can form — the cap gates candidate
    // generation itself, not just scoring
    val gated = DedupOps.winnowingPairs(docs, "doc_id", "text", 4, 4, 3,
      maxDocFreq = 1)
    assert(gated.isEmpty)
  }

  test("gopherQualityFlags: each gate trips on its own pathology; blank " +
    "fails all; integer thresholds are exact at the boundary") {
    val good = (1 to 60).map(i => s"word$i").mkString(" ") + "."
    val cases = Seq(
      (1L, good),                                    // passes everything
      (2L, "too short."),                            // word_count
      (3L, (1 to 60).map(_ => "a").mkString(" ")),   // mean word len < 3
      (4L, (1 to 60).map(i => s"#w$i").mkString(" ") + "."), // symbols
      (5L, (1 to 60).map(i => s"$i").mkString(" ") + "."),   // no alpha
      (6L, (1 to 60).map(i => s"line$i ...").mkString("\n")), // ellipsis ends
      (7L, good.dropRight(1)),                       // no terminal punct
      (8L, "   ")                                    // blank: all gates fail
    ).toDF("doc_id", "text")
    val got = TextOps.gopherQualityFlags(cases, "doc_id", "text",
      minWords = 50).collect()
      .map(r => r.getLong(0) -> r).toMap
    assert(got(1L).getBoolean(10))                   // pass_all
    assert(!got(2L).getBoolean(3) && got(2L).getBoolean(9)) // wc fails, punct ok
    assert(!got(3L).getBoolean(4))                   // mean_word_len
    assert(!got(4L).getBoolean(5) && got(4L).getBoolean(3)) // symbol
    assert(!got(5L).getBoolean(6))                   // alpha
    assert(!got(6L).getBoolean(8))                   // ellipsis
    assert(!got(7L).getBoolean(9) && got(7L).getBoolean(3)) // terminal punct
    assert((3 to 10).forall(i => !got(8L).getBoolean(i)))   // blank
    // boundary exactness: exactly 50 words passes, 49 fails
    val b = Seq((1L, (1 to 50).map(i => s"w$i").mkString(" ") + "."),
      (2L, (1 to 49).map(i => s"w$i").mkString(" ") + "."))
      .toDF("doc_id", "text")
    val gb = TextOps.gopherQualityFlags(b, "doc_id", "text", minWords = 50)
      .collect().map(r => r.getLong(0) -> r.getBoolean(3)).toMap
    assert(gb(1L) && !gb(2L))
  }

  test("topDuplicatedPassages: counts occurrences and distinct docs, " +
    "orders by count then passage, singleton grams absent") {
    val boiler = "all rights reserved by the example corp inc"  // 8 words
    val docs = Seq(
      (1L, s"alpha beta $boiler gamma"),
      (2L, s"$boiler delta"),
      (3L, s"$boiler $boiler"),   // two occurrences in one doc
      (4L, "nothing shared here at all in this one")
    ).toDF("doc_id", "text")
    val got = TextOps.topDuplicatedPassages(docs, "doc_id", "text",
      gramWords = 8, k = 10).collect()
    val byP = got.map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(byP(boiler) == ((3L, 4L))) // 3 docs; 1+1+2 occurrences
    // top row is the most frequent gram
    assert(got.head.getString(0) == boiler)
    // doc 4's unique grams never appear (n_occurrences >= 2 filter)
    assert(got.forall(_.getLong(2) >= 2L))
  }

  test("dedupResolution: multi-hop cluster keeps the best score (tie -> " +
    "min id); singletons survive; canonical provenance points at the " +
    "survivor") {
    // chain 1-2, 2-3 (multi-hop); pair 10-11; 20 is a singleton
    val pairs = Seq((1L, 2L), (2L, 3L), (10L, 11L)).toDF("id_a", "id_b")
    val uni = Seq((1L, 5.0), (2L, 9.0), (3L, 9.0), (10L, 1.0), (11L, 7.0),
      (20L, 0.5)).toDF("doc_id", "q")
    val got = DedupOps.dedupResolution(pairs, "id_a", "id_b", uni,
      "doc_id", "q").collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getBoolean(3)))
      .toMap
    // cluster {1,2,3}: root = min id 1; survivor = 2 (score 9 tie, min id)
    assert(got(1L) == ((1L, 2L, false)))
    assert(got(2L) == ((1L, 2L, true)))
    assert(got(3L) == ((1L, 2L, false)))
    // cluster {10,11}: survivor 11 (higher score)
    assert(got(10L) == ((10L, 11L, false)))
    assert(got(11L) == ((10L, 11L, true)))
    // singleton keeps itself
    assert(got(20L) == ((20L, 20L, true)))
  }

  test("crossSourceContamination: shared grams counted distinct, " +
    "containment vs the smaller inventory, disjoint pairs absent") {
    val shared = "a b c d e"                   // one shared 5-gram
    val docs = Seq(
      ("s1", s"$shared x1 x2 x3 x4"),          // 5 grams total
      ("s2", s"$shared y1"),                   // 2 grams total
      ("s2", s"$shared y1"),                   // duplicate doc: still distinct grams
      ("s3", "p q r s t u")                    // 2 grams, disjoint
    ).toDF("source", "text")
    val got = TextOps.crossSourceContamination(docs, "source", "text",
      gramWords = 5).collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getDouble(3))).toMap
    // s1: grams {abcde, bcdex1, ...} = 5; s2: {abcde, bcdey1} = 2
    // shared = 1; containment = 1/min(5,2) = 0.5
    assert(got(("s1", "s2")) == ((1L, 0.5)))
    assert(!got.contains(("s1", "s3")) && !got.contains(("s2", "s3")))
  }

  test("sourceDivergence: source matching the corpus mix scores 0; " +
    "a skewed source scores the hand-computed positive KL") {
    // two sources, same word mix -> both KL 0
    val even = Seq(("a", "x x y"), ("b", "x x y")).toDF("source", "text")
    val g0 = TextOps.sourceDivergence(even, "source", "text").collect()
      .map(r => r.getString(0) -> r.getDouble(3)).toMap
    assert(g0 == Map("a" -> 0.0, "b" -> 0.0))
    // skew: corpus = {x:3, y:1}; source a = {x:2}, b = {x:1, y:1}
    val skew = Seq(("a", "x x"), ("b", "x y")).toDF("source", "text")
    val g1 = TextOps.sourceDivergence(skew, "source", "text").collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getDouble(3)))
      .toMap
    def fx(t: Double): Long = BigDecimal(t * 1e10)
      .setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong
    val klA = BigDecimal(fx(1.0 * math.log(1.0 / 0.75)).toDouble / 1e10)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val klB = BigDecimal((fx(0.5 * math.log(0.5 / 0.75)) +
      fx(0.5 * math.log(0.5 / 0.25))).toDouble / 1e10)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(g1("a") == ((2L, 1L, klA)))
    assert(g1("b") == ((2L, 2L, klB)))
  }

  test("SimHash pairs the planted near-dup with small Hamming distance") {
    val pairs = DedupOps.simhashPairs(docs.filter($"doc_id" =!= 4),
      "doc_id", "text", shingleWords = 3, maxHamming = 8)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(pairs.contains((1L, 2L)))
    assert(!pairs.contains((1L, 3L)))
  }

  test("TopKByScore aggregator: bounded buffer, deterministic ties") {
    import graft.functions.{ScoredId, TopKByScore}
    val agg = new TopKByScore(2)
    val fromReduce = Seq(ScoredId(1, 0.5), ScoredId(2, 0.9), ScoredId(3, 0.9),
      ScoredId(4, 0.1)).foldLeft(agg.zero)(agg.reduce)
    assert(fromReduce == Seq(ScoredId(2, 0.9), ScoredId(3, 0.9)))
    // merge of partial buffers preserves the same global result
    val m = agg.merge(Seq(ScoredId(3, 0.9), ScoredId(4, 0.1)),
      Seq(ScoredId(2, 0.9), ScoredId(1, 0.5)))
    assert(m == Seq(ScoredId(2, 0.9), ScoredId(3, 0.9)))
  }

  test("large-star/small-star CC equals hash-to-min CC (deep chain + random graph)") {
    import graft.operators.DedupOps
    def run(df: org.apache.spark.sql.DataFrame,
            f: (org.apache.spark.sql.DataFrame, String, String, Int) => org.apache.spark.sql.DataFrame,
            iters: Int) =
      f(df, "a", "b", iters).orderBy("id").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2))).toSeq
    // a 40-node chain: diameter is the hash-to-min worst case (one hop
    // per round — 40 rounds here); large-star/small-star must agree while
    // converging in O(log n) rounds
    val chain = (1 to 40).map(i => (i.toLong, i.toLong + 1)).toDF("a", "b")
    assert(run(chain, DedupOps.connectedComponents, 64) ==
      run(chain, DedupOps.connectedComponentsStar, 64))
    // fixed-seed random multigraph with many components
    val rnd = new scala.util.Random(7)
    val edges = Seq.fill(300)((rnd.nextInt(150).toLong, rnd.nextInt(150).toLong))
      .filter { case (x, y) => x != y }.toDF("a", "b")
    assert(run(edges, DedupOps.connectedComponents, 64) ==
      run(edges, DedupOps.connectedComponentsStar, 64))
  }

  test("connected components: chain merges into one cluster with min-id root") {
    val pairs = Seq((5L, 3L), (3L, 9L), (20L, 21L)).toDF("id_a", "id_b")
    val cc = DedupOps.connectedComponents(pairs, "id_a", "id_b")
      .orderBy("id")
      .select($"id", $"cluster_root", $"is_canonical")
      .as[(Long, Long, Boolean)].collect().toSeq
    assert(cc == Seq((3L, 3L, true), (5L, 3L, false), (9L, 3L, false),
      (20L, 20L, true), (21L, 20L, false)))
  }

  test("cosine and brute-force top-k") {
    val vecs = Seq(
      (1L, Array(1.0f, 0.0f, 0.0f)),
      (2L, Array(0.9f, 0.1f, 0.0f)),
      (3L, Array(0.0f, 1.0f, 0.0f)),
      (4L, Array(-1.0f, 0.0f, 0.0f))
    ).toDF("vec_id", "embedding")
    val cos = vecs.filter($"vec_id" === 2)
      .select(SimilarityOps.cosine(col("embedding"), lit(Array(1.0f, 0.0f, 0.0f))))
      .collect()(0).getDouble(0)
    assert(math.abs(cos - 0.9 / math.sqrt(0.82)) < 1e-9)
    val top = SimilarityOps.bruteForceTopK(vecs.filter($"vec_id" =!= 1),
      "vec_id", "embedding", Seq(1.0f, 0.0f, 0.0f), 2)
      .select("vec_id").as[Long].collect().toSeq
    assert(top == Seq(2L, 3L))
  }

  test("IVF assignment routes vectors to the nearest centroid; zero-vector guard") {
    val cents = Seq((0L, Array(1.0f, 0.0f)), (1L, Array(0.0f, 1.0f)))
      .toDF("cid", "cvec")
    val vecs = Seq(
      (10L, Array(0.9f, 0.1f)), (11L, Array(0.2f, 0.8f)),
      (12L, Array(0.0f, 0.0f))) // zero vector → cosine 0 everywhere
      .toDF("vec_id", "embedding")
    val assigned = SimilarityOps.ivfAssign(vecs, "vec_id", "embedding",
      cents, "cid", "cvec")
      .select("vec_id", "centroid").as[(Long, Long)].collect().toMap
    assert(assigned(10L) == 0L)
    assert(assigned(11L) == 1L)
    assert(assigned(12L) == 0L) // tie on 0.0 → lowest cid (deterministic)
  }

  test("IVF at rest: probe scan prunes to exactly nprobe partitions and " +
    "matches the in-memory probe") {
    import org.apache.spark.sql.execution.{FileSourceScanExec, SparkPlan}
    import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
    val cents = Seq((0L, Array(1f, 0f)), (1L, Array(0f, 1f)),
      (2L, Array(-1f, 0f)), (3L, Array(0f, -1f))).toDF("cid", "cvec")
    // three vectors in each centroid's cone → 4 non-empty partitions
    val vecs = (0 until 12).map { i =>
      val b = Seq(Array(1f, 0f), Array(0f, 1f), Array(-1f, 0f),
        Array(0f, -1f))(i % 4)
      (100L + i, Array(b(0) * 0.9f + (i / 4) * 0.01f, b(1) * 0.9f))
    }.toDF("vec_id", "embedding")
    val assigned = SimilarityOps.ivfAssign(vecs, "vec_id", "embedding",
      cents, "cid", "cvec")
    val dir = java.nio.file.Files.createTempDirectory("graft_ivf_rest_t").toString
    val schema = SimilarityOps.ivfWritePartitioned(assigned, dir)
    val q = Seq(0.9f, 0.2f)
    val atRest = SimilarityOps.ivfProbeAtRest(spark, dir, schema, "vec_id",
      "embedding", cents, "cid", "cvec", q, k = 6, nprobe = 2)
    val inMem = SimilarityOps.ivfTopK(assigned, "vec_id", "embedding",
      cents, "cid", "cvec", q, k = 6, nprobe = 2)
    val a = atRest.select("vec_id", "centroid", "score")
      .as[(Long, Long, Double)].collect().toSeq
    val b = inMem.select("vec_id", "centroid", "score")
      .as[(Long, Long, Double)].collect().toSeq
    assert(a == b)
    assert(a.size == 6) // 2 probed partitions × 3 vectors
    // plan audit: the probe must reach the scan as a PARTITION filter that
    // prunes 4 directories down to nprobe = 2 — I/O elimination, not a
    // post-scan filter
    def scans(p: SparkPlan): Seq[FileSourceScanExec] = p match {
      case a: AdaptiveSparkPlanExec => scans(a.executedPlan)
      case other => other.collect { case f: FileSourceScanExec => f }
    }
    val scan = scans(atRest.queryExecution.executedPlan)
      .find(_.relation.location.rootPaths.exists(_.toString.contains(dir)))
      .getOrElse(fail("no FileSourceScan over the at-rest table in the plan"))
    assert(scan.partitionFilters.exists(_.references.exists(_.name == "centroid")))
    assert(scan.selectedPartitions.partitionCount == 2,
      s"expected pruning to 2 partitions, scanned ${scan.selectedPartitions.partitionCount}")
    val p = new org.apache.hadoop.fs.Path(dir)
    p.getFileSystem(spark.sparkContext.hadoopConfiguration).delete(p, true)
  }

  test("ivfAppend leaves every base file byte-identical and equals a full rebuild") {
    import java.nio.file.{Files, Paths}
    val cents = Seq((0L, Array(1f, 0f)), (1L, Array(0f, 1f)),
      (2L, Array(-1f, 0f)), (3L, Array(0f, -1f))).toDF("cid", "cvec")
    val mk = (ids: Seq[Int]) => ids.map { i =>
      val b = Seq(Array(1f, 0f), Array(0f, 1f), Array(-1f, 0f),
        Array(0f, -1f))(i % 4)
      (100L + i, Array(b(0) * 0.9f + (i / 4) * 0.01f, b(1) * 0.9f))
    }.toDF("vec_id", "embedding")
    val base = mk((0 until 12).filter(_ % 4 != 1)) // never hits centroid 1
    val delta = mk((0 until 12).filter(_ % 4 == 1))
    val dir = java.nio.file.Files.createTempDirectory("graft_ivf_app_t").toString
    val schema = SimilarityOps.ivfWritePartitioned(
      SimilarityOps.ivfAssign(base, "vec_id", "embedding", cents, "cid", "cvec"), dir)
    def snapshot(): Map[String, Seq[Byte]] = {
      val root = Paths.get(dir)
      val it = Files.walk(root).iterator()
      val out = scala.collection.mutable.Map[String, Seq[Byte]]()
      while (it.hasNext) {
        val f = it.next()
        if (Files.isRegularFile(f) && !f.getFileName.toString.startsWith("_") &&
            !f.getFileName.toString.startsWith("."))
          out(root.relativize(f).toString) = Files.readAllBytes(f).toSeq
      }
      out.toMap
    }
    val before = snapshot()
    SimilarityOps.ivfAppend(
      SimilarityOps.ivfAssign(delta, "vec_id", "embedding", cents, "cid", "cvec"), dir)
    val after = snapshot()
    // every pre-append file survives untouched — append is O(delta), not a rewrite
    before.foreach { case (name, bytes) =>
      assert(after.get(name).contains(bytes), s"base file $name changed")
    }
    // new files land ONLY under the centroid dirs the delta hits (cid 1)
    val newFiles = (after.keySet -- before.keySet).toSeq
    assert(newFiles.nonEmpty)
    assert(newFiles.forall(_.startsWith("centroid=1/")), newFiles.toString)
    // bucket observability: metadata listing sees all 4 buckets, with the
    // appended bucket now holding more than one file
    val sizes = SimilarityOps.ivfBucketSizes(spark, dir)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(sizes.map(_._1).sorted.toSeq == Seq("0", "1", "2", "3"))
    assert(sizes.forall(_._3 > 0))
    assert(sizes.find(_._1 == "1").get._2 == newFiles.length.toLong)
    // probe equality vs a from-scratch index over base+delta
    val dirFull = java.nio.file.Files.createTempDirectory("graft_ivf_app_f").toString
    val schemaF = SimilarityOps.ivfWritePartitioned(
      SimilarityOps.ivfAssign(base.unionByName(delta), "vec_id", "embedding",
        cents, "cid", "cvec"), dirFull)
    val q = Seq(0.2f, 0.9f)
    val inc = SimilarityOps.ivfProbeAtRest(spark, dir, schema, "vec_id",
      "embedding", cents, "cid", "cvec", q, k = 6, nprobe = 2)
      .as[(Long, Long, Double)].collect().toSeq
    val full = SimilarityOps.ivfProbeAtRest(spark, dirFull, schemaF, "vec_id",
      "embedding", cents, "cid", "cvec", q, k = 6, nprobe = 2)
      .as[(Long, Long, Double)].collect().toSeq
    assert(inc == full)
    Seq(dir, dirFull).foreach { d0 =>
      val p = new org.apache.hadoop.fs.Path(d0)
      p.getFileSystem(spark.sparkContext.hadoopConfiguration).delete(p, true)
    }
  }

  test("contaminationHits counts distinct shared shingles, broadcast bench side") {
    val bench = Seq((100L, "alpha beta gamma delta epsilon")).toDF("doc_id", "text")
    val corpus = Seq(
      (1L, "alpha beta gamma delta unrelated words here"),   // 2 shared 3-grams
      (2L, "alpha beta gamma delta alpha beta gamma delta"), // dups count once
      (3L, "nothing in common at all today friends")
    ).toDF("doc_id", "text")
    val out = TextOps.contaminationHits(corpus, bench, "doc_id", "text", 3)
      .orderBy("doc_id").as[(Long, Long)].collect().toSeq
    // doc 1 shares "alpha beta gamma" + "beta gamma delta"; doc 2 shares the
    // same two, each counted once despite repeating; doc 3 absent
    assert(out == Seq((1L, 2L), (2L, 2L)))
  }

  test("repetitionSignals: duplicate-gram fraction and top-gram share") {
    val docs = Seq(
      (1L, "a b a b a b"),     // 2-grams: ab,ba,ab,ba,ab → total 5, distinct 2, top 3
      (2L, "w x y z")          // 3 distinct 2-grams, no repeats
    ).toDF("doc_id", "text")
    val out = TextOps.repetitionSignals(docs, "doc_id", "text", 2)
      .orderBy("doc_id").as[(Long, Long, Double, Double)].collect().toSeq
    assert(out == Seq(
      (1L, 5L, BigDecimal(1 - 2.0 / 5).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble, 0.6),
      (2L, 3L, 0.0, BigDecimal(1.0 / 3).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble)))
  }

  test("tfidfTopTerms ranks rare repeated terms first, deterministic ties") {
    val docs = Seq(
      (1L, "rare rare common common common"),
      (2L, "common common other"),
      (3L, "common zebra")
    ).toDF("doc_id", "text")
    val out = TextOps.tfidfTopTerms(docs, "doc_id", "text", k = 2)
      .orderBy("doc_id", "rank")
      .select("doc_id", "term", "rank").as[(Long, String, Int)].collect().toSeq
    // doc 1: "rare" tf=2 df=1 → 2·4/2=4.0 beats "common" tf=3 df=3 → 3·4/4=3.0
    assert(out.take(2) == Seq((1L, "rare", 1), (1L, "common", 2)))
    // doc 3: zebra (1·4/2=2.0) beats common (1·4/4=1.0)
    assert(out.drop(4) == Seq((3L, "zebra", 1), (3L, "common", 2)))
  }

  test("redactPii replaces emails and phones with tags; piiCounts audits") {
    val df = Seq(
      (1L, "reach me at jo.doe+x@mail-svc.example.org or +47-555-1234 ok"),
      (2L, "no pii here"),
      (3L, "two mails a@b.co c@d.org and +1-555-0000")
    ).toDF("doc_id", "text")
    val (ne, np) = TextOps.piiCounts(col("text"))
    val out = df.select(col("doc_id"), TextOps.redactPii(col("text")).as("r"),
        ne.as("ne"), np.as("np"))
      .orderBy("doc_id").as[(Long, String, Int, Int)].collect().toSeq
    assert(out(0)._2 == "reach me at [EMAIL] or [PHONE] ok")
    assert((out(0)._3, out(0)._4) == ((1, 1)))
    assert(out(1)._2 == "no pii here" && out(1)._3 == 0 && out(1)._4 == 0)
    assert(out(2)._2 == "two mails [EMAIL] [EMAIL] and [PHONE]")
  }

  test("char n-grams + n-gram language-ID heuristic") {
    def grams(s: String, n: Int): Seq[String] =
      Seq(s).toDF("t").select(TextOps.charNgrams(col("t"), n).as("g"))
        .collect()(0).getSeq[String](0).toSeq
    assert(grams("abcd", 3) == Seq("abc", "bcd"))
    assert(grams("ab", 3) == Seq.empty)
    assert(grams("a  b", 2) == Seq("a ", " b")) // whitespace normalized first
    val profiles = Seq(
      "en" -> Seq("the", "ing", "and"),
      "de" -> Seq("der", "sch", "ung"))
    val out = Seq("the thing and the rest", "der schlange der achtung")
      .toDF("t").select(TextOps.langIdNgram(col("t"), profiles).as("l"))
      .collect().map(_.getString(0)).toSeq
    assert(out == Seq("en", "de"))
  }

  test("langId picks argmax profile with deterministic ties") {
    val out = Seq("table row table scan", "join merge join hash", "nothing here")
      .toDF("t").select(TextOps.langId(col("t"), Seq(
        "alpha" -> Seq("table", "row", "scan"),
        "beta" -> Seq("join", "merge", "hash"))).as("l"))
      .collect().map(_.getString(0))
    assert(out(0) == "alpha")
    assert(out(1) == "beta")
    assert(out(2) == "beta") // 0-0 tie → lexicographically last profile
  }

  test("bm25 matches a driver-side reference computation (same formula)") {
    val corpus = Seq(
      (1L, "spark merge spark row"),   // dl=4, spark tf=2, merge tf=1
      (2L, "table row scan filter"),   // dl=4, no hits
      (3L, "merge merge merge spark table join") // dl=6
    ).toDF("doc_id", "text")
    val got = TextOps.bm25(corpus, "doc_id", "text", Seq("spark", "merge"))
      .orderBy("doc_id")
      .as[(Long, Double, Long)].collect().toSeq
    // reference: N=3, avgdl=14/3; df(spark)=2, df(merge)=2
    val n = 3.0; val avgdl = 14.0 / 3.0
    def idf(df: Double) = math.log((n - df + 0.5) / (df + 0.5) + 1.0)
    def term(tf: Double, dl: Double, df: Double) =
      idf(df) * (tf * 2.2) / (tf + 1.2 * (0.25 + 0.75 * dl / avgdl))
    def r4(x: Double) = BigDecimal(x).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(got == Seq(
      (1L, r4(term(1, 4, 2) + term(2, 4, 2)), 2L),  // merge + spark (term order)
      (2L, 0.0, 0L),                                // no hits → explicit zero row
      (3L, r4(term(3, 6, 2) + term(1, 6, 2)), 2L)))
  }

  test("bm25 empty/blank docs count in N and avgdl and score zero") {
    val corpus = Seq((1L, "spark"), (2L, ""), (3L, "  ")).toDF("doc_id", "text")
    val got = TextOps.bm25(corpus, "doc_id", "text", Seq("spark"))
      .orderBy("doc_id").as[(Long, Double, Long)].collect().toSeq
    // every doc emits a row (ADVICE r6); the no-hit docs score exactly 0
    assert(got.map(_._1) == Seq(1L, 2L, 3L))
    assert(got.filter(_._1 != 1L).forall(r => r._2 == 0.0 && r._3 == 0L))
    assert(got.head._2 > 0.0)
  }

  test("chunkText: stride grid, short tails, exact offsets, empty docs dropped") {
    val docs = Seq(
      (1L, "abcdefghij"), // len 10: starts 0,4,8 at stride 4
      (2L, ""),           // no chunks
      (3L, "xyz")         // one short chunk
    ).toDF("doc_id", "text")
    val got = TextOps.chunkText(docs, "doc_id", "text",
      chunkChars = 5, strideChars = 4)
      .orderBy("doc_id", "chunk_idx")
      .as[(Long, Long, Long, String, Long)].collect().toSeq
    assert(got == Seq(
      (1L, 0L, 0L, "abcde", 5L),
      (1L, 1L, 4L, "efghi", 5L),  // overlap of 1 char with chunk 0
      (1L, 2L, 8L, "ij", 2L),     // tail shorter than chunkChars
      (3L, 0L, 0L, "xyz", 3L)))
  }

  test("chunkText rejects non-positive sizes") {
    val docs = Seq((1L, "abc")).toDF("doc_id", "text")
    intercept[IllegalArgumentException] {
      TextOps.chunkText(docs, "doc_id", "text", 0, 4)
    }
    intercept[IllegalArgumentException] {
      TextOps.chunkText(docs, "doc_id", "text", 5, -1)
    }
  }

  test("editDistancePairs: blocked join == brute force, short strings included") {
    // exercises every blocking path: near-identical long strings (prefix
    // gram collision), a pair sharing ZERO grams at d=2 ("ab"/"cd" — only
    // the short-string fallback block can find it), length-filter kills,
    // and an empty string
    val docs = Seq(
      (1L, "warehouse pallet 07"), (2L, "warehouse pallet 17"),
      (3L, "warehouse pallet 0"), (4L, "completely different row"),
      (5L, "ab"), (6L, "cd"), (7L, "abx"), (8L, ""),
      (9L, "warehouse pallet 078")
    ).toDF("id", "s")
    for (d <- Seq(1, 2)) {
      val got = DedupOps.editDistancePairs(docs, "id", "s", maxDist = d)
        .orderBy("id_a", "id_b")
        .as[(Long, Long, Long)].collect().toSeq
      val brute = docs.as("a").join(docs.as("b"),
          col("a.id") < col("b.id") &&
            abs(length(col("a.s")) - length(col("b.s"))) <= d &&
            levenshtein(col("a.s"), col("b.s")) <= d)
        .select(col("a.id"), col("b.id"),
          levenshtein(col("a.s"), col("b.s")).cast("long"))
        .orderBy("a.id", "b.id")
        .as[(Long, Long, Long)].collect().toSeq
      assert(got == brute, s"maxDist=$d")
      if (d == 2) {
        // the zero-shared-gram pair is present — the fallback block works
        assert(got.contains((5L, 6L, 2L)))
        assert(got.contains((1L, 2L, 1L)))
      }
    }
  }

  test("bigramLmScore: add-one bigram LM matches hand computation; " +
    "short/empty docs carry (0, NULL)") {
    // corpus: bigrams (a,b)×3, (b,a)×1, (b,c)×1; prefixes a:3, b:2;
    // vocab {a,b,c,x} → V=4
    val corpus = Seq(
      (1L, "a b a b"), (2L, "a b c"), (3L, "x"), (4L, "")
    ).toDF("doc_id", "text")
    val got = TextOps.bigramLmScore(corpus, "doc_id", "text")
      .orderBy("doc_id")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1),
        if (r.isNullAt(2)) None else Some(r.getDouble(2))))
      .toSeq
    val lnAB = math.log((3.0 + 1.0) / (3.0 + 4.0)) // P(b|a) = 4/7
    val lnBA = math.log((1.0 + 1.0) / (2.0 + 4.0)) // P(a|b) = 2/6
    val lnBC = math.log((1.0 + 1.0) / (2.0 + 4.0)) // P(c|b) = 2/6
    def r4(x: Double): Double =
      BigDecimal(x).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(got == Seq(
      (1L, 3L, Some(r4((lnAB + lnBA + lnAB) / 3.0))),
      (2L, 2L, Some(r4((lnAB + lnBC) / 2.0))),
      (3L, 0L, None),
      (4L, 0L, None)))
    // the planted-near-dup corpus scores its duplicate pair identically
    val same = TextOps.bigramLmScore(docs, "doc_id", "text")
      .filter(col("doc_id").isin(1L, 4L))
      .select("lm_score").distinct().count()
    assert(same == 1L)
  }

  test("sortedNeighborhoodPairs: window pairs over the blocking-key total " +
    "order, Levenshtein-verified — matches a driver-side replica") {
    def lev(a: String, b: String): Int = {
      val d = Array.tabulate(a.length + 1, b.length + 1)((i, j) =>
        if (i == 0) j else if (j == 0) i else 0)
      for (i <- 1 to a.length; j <- 1 to b.length)
        d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
          d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
      d(a.length)(b.length)
    }
    val corpus = Seq(
      (1L, "apple pie recipe with cinnamon"),
      (2L, "apple pie recipe with cinnamon!"),
      (3L, "zebra crossing rules for town planners"),
      (4L, "apple pie recipe and sugar"),
      (5L, "mango chutney"))
    val (kc, w, pc, md) = (10, 3, 40, 10)
    // replica: sort by (lower 10-char key, id), pair rank-distance < w,
    // verify lev over 40-char prefixes
    val ranked = corpus
      .map { case (id, t) => (id, t, t.trim.take(kc).toLowerCase) }
      .sortBy { case (id, _, k) => (k, id) }
    val expected = (for {
      i <- ranked.indices; j <- (i + 1) until math.min(i + w, ranked.size)
      d = lev(ranked(i)._2.take(pc), ranked(j)._2.take(pc)) if d <= md
    } yield (ranked(i)._1, ranked(j)._1, d.toLong)).sortBy(p => (p._1, p._2))
    val got = DedupOps.sortedNeighborhoodPairs(
      corpus.toDF("doc_id", "text"), "doc_id", "text", kc, w, pc, md)
      .orderBy("id_a", "id_b")
      .as[(Long, Long, Long)].collect().toSeq
    assert(got == expected)
    // the adjacent planted pair (1,2) is found with distance 1
    assert(got.contains((1L, 2L, 1L)))
    // null text folds to '' and never crashes the sort or the verify
    val withNull = (corpus :+ (6L, null: String)).toDF("doc_id", "text")
    val gn = DedupOps.sortedNeighborhoodPairs(
      withNull, "doc_id", "text", kc, w, pc, md).collect()
    assert(gn.nonEmpty)
  }

  test("pmiCollocations: hand-computed PMI, minCount prune, " +
    "empty/short docs ignored") {
    import spark.implicits._
    // corpus of bigram slots: "a b" ×3, "a c" ×1 → N=4;
    // left(a)=4, right(b)=3, right(c)=1
    val docs = Seq("a b", "a b", "a b", "a c", "", "solo")
      .toDF("text")
    val got = TextOps.pmiCollocations(docs, "text", minCount = 1L)
      .orderBy("w1", "w2")
      .as[(String, String, Long, Double)].collect().toSeq
    def pmi(c12: Long, cl: Long, cr: Long, nn: Long) =
      BigDecimal(math.log((c12.toDouble * nn.toDouble) /
        (cl.toDouble * cr.toDouble)))
        .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(got == Seq(("a", "b", 3L, pmi(3, 4, 3, 4)),
      ("a", "c", 1L, pmi(1, 4, 1, 4))))
    // minCount prunes the rare pair before any margin join
    val pruned = TextOps.pmiCollocations(docs, "text", minCount = 2L)
      .as[(String, String, Long, Double)].collect().toSeq
    assert(pruned == Seq(("a", "b", 3L, pmi(3, 4, 3, 4))))
  }

  test("vocabJaccard: distinct-token sets, disjoint pairs absent, " +
    "dup tokens counted once, null group/text excluded") {
    import spark.implicits._
    val docs = Seq(
      ("s1", "a b c"), ("s1", "a a b"),       // V(s1) = {a,b,c}
      ("s2", "b c d"),                        // V(s2) = {b,c,d}
      ("s3", "x"),                            // disjoint from both
      (null.asInstanceOf[String], "a b"), ("s1", null.asInstanceOf[String])
    ).toDF("src", "text")
    val got = TextOps.vocabJaccard(docs, "src", "text")
      .orderBy("g_a", "g_b")
      .as[(String, String, Long, Double)].collect().toSeq
    assert(got == Seq(("s1", "s2", 2L, 0.5)))
  }

  test("minhashVocabSimilarity: identical vocab matches k/k; duplicate " +
    "tokens are signature-invariant; estimates bounded; empty group absent") {
    import spark.implicits._
    val docs = Seq(
      ("s1", "alpha beta gamma"), ("s2", "alpha alpha beta beta gamma"),
      ("s3", "zeta eta theta iota kappa"),
      ("s4", "")  // no tokens → no signature
    ).toDF("src", "text")
    val got = TextOps.minhashVocabSimilarity(docs, "src", "text", 16)
      .orderBy("g_a", "g_b")
      .as[(String, String, Long, Double)].collect().toSeq
    val bySrc = got.map(r => (r._1, r._2) -> r).toMap
    // s1 and s2 have the SAME vocabulary → all 16 minima agree
    assert(bySrc(("s1", "s2"))._3 == 16L &&
      bySrc(("s1", "s2"))._4 == 1.0)
    // only pairs among s1..s3 exist (s4 absent): 3 pairs
    assert(got.size == 3)
    assert(got.forall(r => r._3 >= 0L && r._3 <= 16L &&
      r._4 >= 0.0 && r._4 <= 1.0))
  }

  test("zipfSlope: known rank/freq profile gives the OLS slope; topN " +
    "truncates the fit; single-term sources are excluded") {
    import spark.implicits._
    // s1: a×8 b×4 c×2 d×1 (halving = slope −1.459 over ln-rank 1..4);
    // ties impossible (all counts distinct). s2 has ONE term → no fit.
    val s1Text = (Seq.fill(8)("a") ++ Seq.fill(4)("b") ++
      Seq.fill(2)("c") ++ Seq("d")).mkString(" ")
    val docs = Seq(("s1", s1Text), ("s2", "only only only"))
      .toDF("src", "text")
    val got = TextOps.zipfSlope(docs, "src", "text", topN = 300)
      .as[(String, Long, Double)].collect().toSeq
    assert(got == Seq(("s1", 4L, -1.459)))
    // truncating to the top 2 terms fits only (r1,8),(r2,4): exact −1.0
    val got2 = TextOps.zipfSlope(docs, "src", "text", topN = 2)
      .as[(String, Long, Double)].collect().toSeq
    assert(got2 == Seq(("s1", 2L, -1.0)))
  }

  test("labelConfusion: cells count label×prediction pairs, shares " +
    "row-normalize per label, nulls excluded") {
    import spark.implicits._
    val df = Seq(
      (Some("en"), Some("en")), (Some("en"), Some("en")),
      (Some("en"), Some("de")), (Some("de"), Some("de")),
      (None, Some("en")), (Some("fr"), None)
    ).toDF("lab", "pred")
    val got = TextOps.labelConfusion(df, "lab", "pred")
      .orderBy("label", "predicted")
      .as[(String, String, Long, Double)].collect().toSeq
    assert(got == Seq(
      ("de", "de", 1L, 1.0),
      ("en", "de", 1L, 0.333333),
      ("en", "en", 2L, 0.666667)))
  }

  test("containmentPairs: a fully-quoted snippet scores containment 1.0 " +
    "where Jaccard stays tiny; blocks respected; both directions reported") {
    val docs = Seq(
      (1L, "a b c d e f g h i j", "en"),   // 8 3-shingles
      (2L, "a b c d", "en"),               // 2 3-shingles, both inside doc 1
      (3L, "p q r s t u", "en"),           // disjoint
      (4L, "a b c d", "de")                // same text, other block
    ).toDF("doc_id", "text", "lang")
    val got = DedupOps.containmentPairs(docs, "doc_id", "text",
        blockCol = "lang", shingleWords = 3, threshold = 0.9)
      .as[(Long, Long, Double, Double, Double)].collect().toSeq
    assert(got == Seq((1L, 2L, 0.25, 1.0, 0.25)))
    // the same pair is invisible to resemblance at any usable threshold
    assert(DedupOps.ngramJaccardPairs(docs, "doc_id", "text",
      "lang", 3, 0.5).count() == 0L)
  }

  test("containmentPairs hot-shingle guard: one viral shingle in every " +
    "doc of a block cannot square the candidate join; true pairs backed " +
    "by non-boilerplate shingles survive the cap") {
    val n = 200
    val base = (1 to n).map { i =>
      (i.toLong, s"the quick fox u$i v$i w$i x$i y$i z$i", "en")
    }
    // doc 1000 is a verbatim snippet of doc 1's UNIQUE tail — its
    // containment evidence never touches the viral shingle
    val docs = (base :+ ((1000L, "u1 v1 w1 x1 y1", "en")))
      .toDF("doc_id", "text", "lang")
    val tau = 0.5
    val sh = DedupOps.containmentShingleTable(docs, "doc_id", "text",
      "lang", 3)
    // unguarded (cap above the viral df): "the quick fox" lives in all n
    // docs and in the PREFIX of a ~(1−t) fraction of them, so the
    // candidate join really goes quadratic in the block (Θ(n²) pairs)
    val unguarded = DedupOps.containmentCandidates(sh, tau,
      maxDocFreq = n + 1L).count()
    assert(unguarded >= n.toLong * n / 16,
      s"expected the viral shingle to square the block, got $unguarded")
    // guarded: candidates obey the winnowing-style f·|prefix postings|
    // bound, far below n²/2
    val f = 8L
    val tPrefix = tau - 0.001
    val prefixPostings = sh
      .select((col("n") - ceil(lit(tPrefix) * col("n")) + 1)
        .cast("long").as("p"))
      .agg(sum("p")).as[Long].head()
    val guarded = DedupOps.containmentCandidates(sh, tau, maxDocFreq = f)
      .count()
    assert(guarded <= f * prefixPostings,
      s"guarded candidates $guarded exceed bound ${f * prefixPostings}")
    // with the boilerplate gone, only genuinely-shared shingles generate
    // candidates — the planted snippet pair and nothing else
    assert(guarded <= 8, s"guard failed to break the square: $guarded")
    // end-to-end with the small cap: the snippet pair is still found with
    // exact containment values (verification is uncapped)
    val got = DedupOps.containmentPairs(docs, "doc_id", "text", "lang",
        shingleWords = 3, threshold = tau, maxDocFreq = f)
      .as[(Long, Long, Double, Double, Double)].collect().toSeq
    assert(got == Seq((1L, 1000L, 0.4286, 1.0, 0.4286)))
  }

  test("lineDedup removes lines shared by >= minDocs documents, keeps " +
    "order, drops blank lines, and emits one row per input doc") {
    val pages = Seq(
      (1L, "HEADER\nalpha beta\nbody one\nFOOTER"),
      (2L, "HEADER\n\n  body two  \nFOOTER"),
      (3L, "HEADER\nbody three\nFOOTER"),
      (4L, "HEADER\nFOOTER"),           // everything boilerplate
      (5L, null.asInstanceOf[String]),  // null text survives as a row
      (6L, "solo page with unique lines\nalpha beta")
    ).toDF("doc_id", "text")
    val out = TextOps.lineDedup(pages, "doc_id", "text", minDocs = 3)
      .orderBy("doc_id")
      .as[(Long, String, Long, Long)].collect().toSeq
    // HEADER df=4, FOOTER df=4 -> removed; "alpha beta" df=2 < 3 kept
    assert(out == Seq(
      (1L, "alpha beta\nbody one", 4L, 2L),
      (2L, "body two", 3L, 2L),       // trimmed line, blank line dropped
      (3L, "body three", 3L, 2L),
      (4L, "", 2L, 2L),               // fully-boilerplate doc -> empty
      (5L, "", 0L, 0L),
      (6L, "solo page with unique lines\nalpha beta", 2L, 0L)))
  }

  test("jsdPairwise: identical sources diverge 0, disjoint-vocabulary " +
    "sources diverge ln 2, and the matrix covers every unordered pair") {
    val docs = Seq(
      ("a", "x x y"), ("a", "z"),
      ("b", "x x y z"),               // identical distribution to a
      ("c", "p q p q")                // disjoint vocabulary
    ).toDF("source", "text")
    val out = TextOps.jsdPairwise(docs, "source", "text")
      .orderBy("source_a", "source_b")
      .as[(String, String, Long, Double)].collect().toSeq
    assert(out.map(r => (r._1, r._2)) ==
      Seq(("a", "b"), ("a", "c"), ("b", "c")))
    val m = out.map(r => (r._1, r._2) -> r).toMap
    assert(m(("a", "b"))._4 == 0.0)               // same distribution
    assert(m(("a", "b"))._3 == 3L)                // union vocab x,y,z
    assert(m(("a", "c"))._4 == 0.693147)          // ln 2: no shared mass
    assert(m(("a", "c"))._3 == 5L)
    assert(m(("b", "c"))._4 == 0.693147)
  }
}
