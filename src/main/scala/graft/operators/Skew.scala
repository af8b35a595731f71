package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation for hot join keys (SURVEY §7.4: protocol-sized
  * partitions vary by orders of magnitude).
  *
  * AQE's skew-join handles sort-merge cases at runtime; explicit
  * salting is the plan-level tool when one key dominates a
  * shuffle-hash join: the big side's hot keys are split across
  * `saltN` sub-keys (deterministically, from a unique column — no
  * rand(), results stay reproducible), and the small side is
  * replicated `saltN`× so every sub-key still finds its match.
  */
object Skew {

  /** Equi-join `big ⋈ small` on `key`, with the big side salted into
    * `saltN` sub-partitions per key. `uniqueCol` is any unique big-side
    * column (drives the deterministic salt). */
  def saltedJoin(big: DataFrame, small: DataFrame, key: String,
      uniqueCol: String, saltN: Int): DataFrame = {
    val salted = big.withColumn("__salt",
      pmod(xxhash64(col(uniqueCol)), lit(saltN)).cast("int"))
    val replicated = small.withColumn("__salt",
      explode(sequence(lit(0), lit(saltN - 1))))
    salted.join(replicated, Seq(key, "__salt")).drop("__salt")
  }
}
