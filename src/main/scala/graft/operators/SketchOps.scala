package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Sketch aggregates for corpus-scale profiling — the operations a
  * 100 TB pipeline uses where exact answers would need unbounded
  * memory: HLL++ cardinality (how many distinct users/documents/
  * n-grams) and t-digest-style quantiles (latency/length/score
  * distributions). Both are partial-aggregable Spark built-ins, so the
  * shuffle carries one small sketch per group, never the raw values —
  * the map-side combine IS the sketch merge.
  *
  * Not oracle-checked: a sketch's exact output depends on its hash
  * seeds, which DuckDB cannot replicate; SketchSpec bounds the error
  * against exact answers instead (rsd for HLL, rank error for
  * percentile_approx).
  */
object SketchOps {

  /** Distinct-cardinality estimate per group (HLL++, relative standard
    * deviation `rsd`). */
  def distinctEstimate(df: DataFrame, groupCols: Seq[String],
      target: String, rsd: Double = 0.05): DataFrame =
    df.groupBy(groupCols.map(col): _*)
      .agg(approx_count_distinct(col(target), rsd).as("approx_distinct"))

  /** Approximate quantiles per group (percentile_approx with
    * `accuracy` — error bound is 1/accuracy in rank space). */
  def quantileEstimate(df: DataFrame, groupCols: Seq[String],
      target: String, probs: Seq[Double],
      accuracy: Int = 10000): DataFrame = {
    val parr: Column = array(probs.map(lit): _*)
    df.groupBy(groupCols.map(col): _*)
      .agg(percentile_approx(col(target), parr, lit(accuracy))
        .as("quantiles"))
  }

  /** Count-min frequency estimates for a set of probe values: builds
    * ONE mergeable sketch over the whole column (the shuffle carries
    * `d×w` counters, never rows) and reads the probes out of it.
    * Count-min guarantees `true ≤ estimate ≤ true + eps·N` with
    * probability `confidence` — the one-sided bound SketchSpec asserts
    * against exact counts. Spark's `confidence` is the SUCCESS
    * probability and sizes the sketch as w = ⌈2/eps⌉,
    * d = ⌈−log₂(1−confidence)⌉ — so the 0.99 default builds depth 7;
    * a low value like 0.01 would build a depth-1 sketch whose bound
    * holds only 1% of the time. */
  def freqEstimate(df: DataFrame, target: String, probes: Seq[String],
      eps: Double = 0.001, confidence: Double = 0.99): Map[String, Long] = {
    val sketchBytes = df
      .agg(count_min_sketch(col(target), lit(eps), lit(confidence),
        lit(42)).as("s"))
      .head().getAs[Array[Byte]](0)
    val cms = org.apache.spark.util.sketch.CountMinSketch.readFrom(
      new java.io.ByteArrayInputStream(sketchBytes))
    probes.map(p => p -> cms.estimateCount(p)).toMap
  }
}
