package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.operators.TextOps.{normalized, shingles, tokens}

/** Document-deduplication operators for training-data pipelines: exact,
  * MinHash+LSH, SimHash, and n-gram-Jaccard near-dup. Scale invariants:
  *  - no stage is O(n²) over the corpus — candidate generation is always
  *    band/bucket-blocked (LSH) or inverted-index joins on shared tokens;
  *  - the only shuffles are hash-partitioned groupBys/joins on
  *    bucket/shingle keys;
  *  - verification (exact Jaccard) runs only on candidate pairs.
  */
object DedupOps {

  /** Exact dedup: group by normalized content hash, keep the lowest id.
    * One shuffle on the (high-entropy) md5 key — no skew. 100 TB note:
    * group on the 128-bit digest, never the full text.
    */
  def exactDedup(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val w = Window.partitionBy(md5(normalized(col(textCol)))).orderBy(col(idCol))
    docs.withColumn("__rn", row_number().over(w))
      .withColumn("dup_count", count(lit(1)).over(
        Window.partitionBy(md5(normalized(col(textCol))))))
      .filter(col("__rn") === 1).drop("__rn")
  }

  /** MinHash signature: for each of `numHashes` hash functions, the min of
    * xxhash64(seed_j, shingle) over the document's shingle set. Pure
    * column expression — signatures computed map-side in one pass.
    */
  def minhashSignature(textCol: Column, shingleWords: Int, numHashes: Int): Column = {
    val sh = array_distinct(shingles(textCol, shingleWords))
    array((0 until numHashes).map { j =>
      coalesce(array_min(transform(sh, s => xxhash64(lit(j), s))), lit(Long.MaxValue))
    }: _*)
  }

  /** MinHash+LSH candidate pairs: band the signature (`bands` bands of
    * rows/band), bucket-join on (band index, band hash), emit each pair
    * once, then verify with exact shingle-set Jaccard ≥ `threshold`.
    *
    * Plan: explode to n·bands rows → self-join on the band key (hash
    * shuffle, bucket sizes are tiny for honest thresholds) → pairwise
    * verify. No cartesian product anywhere; at 100 TB the band-key join is
    * the only shuffle and AQE handles hot buckets.
    */
  def minhashLshPairs(docs: DataFrame, idCol: String, textCol: String,
                      shingleWords: Int = 5, numHashes: Int = 16,
                      bands: Int = 4, threshold: Double = 0.5): DataFrame = {
    val rows = numHashes / bands
    val sig = docs.select(col(idCol).as("id"),
      minhashSignature(col(textCol), shingleWords, numHashes).as("sig"))
    val banded = sig.select(col("id"), explode(
      transform(sequence(lit(0), lit(bands - 1)),
        b => struct(b.as("band"),
          xxhash64(b, slice(col("sig"), b * rows + 1, lit(rows))).as("bkey")))
      ).as("bb"))
      .select(col("id"), col("bb.band").as("band"), col("bb.bkey").as("bkey"))
    val cands = banded.as("l").join(banded.as("r"),
        col("l.band") === col("r.band") && col("l.bkey") === col("r.bkey") &&
          col("l.id") < col("r.id"))
      .select(col("l.id").as("id_a"), col("r.id").as("id_b")).distinct()
    verifyJaccard(cands, docs, idCol, textCol, shingleWords, threshold)
  }

  /** Exact shingle-set Jaccard for candidate pairs (verification step). */
  private def verifyJaccard(cands: DataFrame, docs: DataFrame, idCol: String,
                            textCol: String, shingleWords: Int,
                            threshold: Double): DataFrame = {
    val sh = docs.select(col(idCol).as("id"),
      array_distinct(shingles(col(textCol), shingleWords)).as("sh"))
    cands
      .join(sh.withColumnRenamed("id", "id_a").withColumnRenamed("sh", "sh_a"), "id_a")
      .join(sh.withColumnRenamed("id", "id_b").withColumnRenamed("sh", "sh_b"), "id_b")
      .withColumn("inter", size(array_intersect(col("sh_a"), col("sh_b"))).cast("double"))
      .withColumn("uni",
        (size(col("sh_a")) + size(col("sh_b"))).cast("double") - col("inter"))
      .withColumn("jaccard", round(when(col("uni") > 0, col("inter") / col("uni"))
        .otherwise(lit(1.0)), 4))
      .filter(col("jaccard") >= threshold)
      .select(col("id_a"), col("id_b"), col("jaccard"))
  }

  /** Exact n-gram-Jaccard near-dup pairs via an inverted-index join:
    * explode distinct shingles → self-join on (block, shingle) → count
    * intersections per pair → Jaccard from |A|+|B|-∩. This is the exact
    * (non-approximate) baseline: work is Σ_shingle df(shingle)², bounded by
    * blocking (`blockCol`, e.g. language) and by the natural rarity of long
    * shingles — never O(n²) over documents.
    */
  def ngramJaccardPairs(docs: DataFrame, idCol: String, textCol: String,
                        blockCol: String, shingleWords: Int,
                        threshold: Double): DataFrame = {
    val sh = docs.select(col(idCol).as("id"), col(blockCol).as("blk"),
      array_distinct(shingles(col(textCol), shingleWords)).as("sh"))
    val inv = sh.select(col("id"), col("blk"), explode(col("sh")).as("tok"))
    val sizes = sh.select(col("id"), size(col("sh")).as("n"))
    val inter = inv.as("l").join(inv.as("r"),
        col("l.blk") === col("r.blk") && col("l.tok") === col("r.tok") &&
          col("l.id") < col("r.id"))
      .groupBy(col("l.id").as("id_a"), col("r.id").as("id_b"))
      .agg(count(lit(1)).as("inter"))
    inter
      .join(broadcast(sizes.withColumnRenamed("id", "id_a").withColumnRenamed("n", "n_a")), "id_a")
      .join(broadcast(sizes.withColumnRenamed("id", "id_b").withColumnRenamed("n", "n_b")), "id_b")
      .withColumn("jaccard", round(col("inter").cast("double") /
        (col("n_a") + col("n_b") - col("inter")).cast("double"), 4))
      .filter(col("jaccard") >= threshold)
      .select(col("id_a"), col("id_b"), col("jaccard"))
  }

  /** SimHash signatures: 64-bit signature where bit k is set when the
    * majority of the document's shingle hashes have bit k set. Near-dups
    * differ in few bits (small Hamming distance). Computed map-side in two
    * codegen'd steps: per-bit counts via a single array-aggregate pass over
    * the shingle hashes, then the majority vote per bit.
    */
  def simhashSignatures(docs: DataFrame, idCol: String, textCol: String,
                        shingleWords: Int = 3): DataFrame = {
    val sh = array_distinct(shingles(col(textCol), shingleWords))
    val hashes = transform(sh, s => xxhash64(s))
    val zero = array((0 until 64).map(_ => lit(0L)): _*)
    val bitCounts = aggregate(hashes, zero, (acc, h) =>
      zip_with(acc, array((0 until 64).map(b =>
        shiftright(h, b).bitwiseAND(1L)): _*), (x, y) => x + y))
    docs.select(col(idCol).as("id"), size(hashes).as("__n"),
        bitCounts.as("__bc"))
      .select(col("id"),
        (0 until 64).map(b =>
          when(element_at(col("__bc"), b + 1) * 2 >= col("__n"),
            lit(1L << b)).otherwise(lit(0L)))
          .reduce((a, b) => a.bitwiseOR(b)).as("sig"))
  }

  /** SimHash near-dup pairs, blocked by 16-bit signature chunks (a
    * Hamming-distance ≤ 3 pair must share at least one of 4 chunks —
    * pigeonhole), verified by popcount of XOR. No O(n²) stage.
    */
  def simhashPairs(docs: DataFrame, idCol: String, textCol: String,
                   shingleWords: Int = 3, maxHamming: Int = 3): DataFrame = {
    val sigs = simhashSignatures(docs, idCol, textCol, shingleWords)
    val chunked = sigs.select(col("id"), col("sig"), explode(
      array((0 until 4).map(c => struct(lit(c).as("chunk"),
        shiftright(col("sig"), c * 16).bitwiseAND(0xFFFFL).as("ckey"))): _*))
      .as("cc"))
      .select(col("id"), col("sig"), col("cc.chunk").as("chunk"), col("cc.ckey").as("ckey"))
    val popcountXor = (a: Column, b: Column) => {
      val x = a.bitwiseXOR(b)
      (0 until 64).map(i => shiftright(x, i).bitwiseAND(1L))
        .reduce(_ + _).cast("int")
    }
    chunked.as("l").join(chunked.as("r"),
        col("l.chunk") === col("r.chunk") && col("l.ckey") === col("r.ckey") &&
          col("l.id") < col("r.id"))
      .select(col("l.id").as("id_a"), col("r.id").as("id_b"),
        col("l.sig").as("sig_a"), col("r.sig").as("sig_b")).distinct()
      .withColumn("hamming", popcountXor(col("sig_a"), col("sig_b")))
      .filter(col("hamming") <= maxHamming)
      .select(col("id_a"), col("id_b"), col("hamming"))
  }
}
