package graft.functions

import org.apache.spark.sql.{Column, Encoder}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** Count–Min sketch over LONG keys (Cormode–Muthukrishnan): a depth×width
  * counter matrix where each row hashes the key independently; the
  * estimate is the MIN over rows, always ≥ the true count (one-sided
  * error). The sketch is a few KB regardless of key cardinality — the
  * right shape for heavy-hitter candidate generation at 100 TB, where an
  * exact per-key count would shuffle billions of distinct keys.
  *
  * The hash is splitmix64, implemented TWICE on purpose: once in JVM
  * arithmetic (sketch building, [[CountMinSketch.Agg]]) and once as
  * native Spark column expressions ([[CountMinSketch.estimate]] — long
  * multiply/xor/shift wrap identically in non-ANSI Spark SQL and Java).
  * CountMinSpec asserts the two produce identical bucket indices, so a
  * sketch built by the aggregator can be queried map-side from a
  * broadcast literal with zero UDFs.
  */
object CountMinSketch {

  private val Golden = 0x9E3779B97F4A7C15L
  private val Mix1 = 0xBF58476D1CE4E5B9L
  private val Mix2 = 0x94D049BB133111EBL

  /** splitmix64 finalizer (JVM side). */
  private def mixJvm(x0: Long): Long = {
    var z = x0 + Golden
    z = (z ^ (z >>> 30)) * Mix1
    z = (z ^ (z >>> 27)) * Mix2
    z ^ (z >>> 33)
  }

  /** Bucket of `key` in hash row `d` (JVM side). */
  private def bucketJvm(key: Long, d: Int, width: Int): Int = {
    val h = mixJvm(key + d * Golden)
    ((h % width) + width).toInt % width
  }

  /** splitmix64 finalizer as column expressions — identical wrap-around
    * arithmetic to [[mixJvm]] (Spark long ops overflow like Java with
    * ANSI off, which GraftSession pins).
    */
  private def mixCol(x0: Column): Column = {
    val z0 = x0 + lit(Golden)
    val z1 = (z0.bitwiseXOR(shiftrightunsigned(z0, 30))) * lit(Mix1)
    val z2 = (z1.bitwiseXOR(shiftrightunsigned(z1, 27))) * lit(Mix2)
    z2.bitwiseXOR(shiftrightunsigned(z2, 33))
  }

  /** Distributive sketch builder: per-partition sketches merge by
    * elementwise add (counting is linear — merge order irrelevant, so the
    * aggregation is shuffle-safe and deterministic).
    */
  class Agg(depth: Int, width: Int)
      extends Aggregator[Long, Array[Long], Array[Long]] {
    override def zero: Array[Long] = Array.fill(depth * width)(0L)
    override def reduce(buf: Array[Long], key: Long): Array[Long] = {
      var d = 0
      while (d < depth) {
        buf(d * width + bucketJvm(key, d, width)) += 1L
        d += 1
      }
      buf
    }
    override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
      var i = 0
      while (i < a.length) { a(i) += b(i); i += 1 }
      a
    }
    override def finish(r: Array[Long]): Array[Long] = r
    override def bufferEncoder: Encoder[Array[Long]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder()
    override def outputEncoder: Encoder[Array[Long]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder()
  }

  /** Build the sketch of `keys` (a Dataset-able LONG column is extracted
    * by the caller); returns the flattened depth×width counters. NULL
    * keys are excluded — a null can't be a sketch key (deserializing one
    * into a primitive would also crash the aggregator), so null-keyed
    * rows are invisible to [[graft.operators.ScaleOps.heavyHitters]];
    * callers who need SQL's "NULL is a group" semantics must coalesce a
    * sentinel first.
    */
  def build(keys: org.apache.spark.sql.DataFrame, keyCol: String,
            depth: Int, width: Int): Array[Long] = {
    val spark = keys.sparkSession
    import spark.implicits._
    keys.select(col(keyCol).cast("long"))
      .filter(col(keyCol).isNotNull).as[Long]
      .select(new Agg(depth, width).toColumn).head()
  }

  /** Column estimating the sketch count of `key`: MIN over the depth rows
    * of the broadcast sketch literal. Pure expressions — runs map-side at
    * scan speed inside codegen.
    */
  def estimate(key: Column, sketch: Array[Long], depth: Int,
               width: Int): Column = {
    val litSketch = typedlit(sketch.toSeq)
    val perRow = (0 until depth).map { d =>
      val idx = pmod(mixCol(key.cast("long") + lit(d.toLong * Golden)),
        lit(width.toLong))
      // element_at is 1-based
      element_at(litSketch, (lit(d.toLong * width) + idx + 1L).cast("int"))
    }
    least(perRow: _*)
  }

  /** JVM twin of [[estimate]] for tests. */
  private[graft] def estimateJvm(key: Long, sketch: Array[Long], depth: Int,
                                 width: Int): Long =
    (0 until depth).map(d => sketch(d * width + bucketJvm(key, d, width))).min
}
