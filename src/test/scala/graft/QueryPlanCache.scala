package graft

import org.apache.spark.sql.execution.QueryExecution

/** ONE QueryExecution per SparkEntry query at sf0.001, built lazily on
  * first touch and shared by every suite-wide plan audit (PlanSpec's
  * cartesian sweep and per-query pins, both HofPredicateAuditSpec
  * sweeps). Before this cache each sweep rebuilt all 151 plans itself
  * — three ~32 s passes of identical analysis/optimization (and, for
  * the eager dedup queries, identical side execution) dominated the
  * default suite's wall clock. Both the optimized and the executed
  * plan derive lazily from the same QueryExecution, so the audits stay
  * bit-identical to what they asserted before; they just stop paying
  * for the build three times.
  *
  * Read-only by contract: suites that test CONF-SENSITIVE planning
  * (broadcast thresholds, AQE toggles) must build their own frames —
  * a cached plan reflects the session confs at first touch.
  *
  * Each plan is built and FORCED (executedPlan) against a CLEARED
  * session cache — the bench's between-queries contract. Two reasons:
  * a leftover InMemoryRelation from another suite (or from an earlier
  * query in this very loop — several dedup queries cache feature
  * tables) would substitute an InMemoryTableScan for the parquet scan
  * and silently blind the pushdown/pruning pins that read these plans;
  * and QueryExecution plans lazily, so without the eager force the
  * cache-substitution would happen at whatever later moment a test
  * first reads the plan, under whatever cache state happens to be
  * live then — nondeterministic audits. */
object QueryPlanCache {
  private val sfDir = "/root/testdata/sf0.001"

  /** Conf keys that change plan shape and that OTHER suites mutate
    * (BucketedJoinSpec / SortedIntersectSpec / AqeSkewSpec toggle
    * broadcast thresholds and AQE knobs). The cache freezes all plans
    * at first lazy touch, so a mid-test failure in one of those suites
    * — or an unlucky order under parallel execution — could otherwise
    * bake non-default confs into every suite-wide plan pin. The
    * builder UNSETS each key (falling back to the session's
    * builder-config / Spark default, the canonical planning state the
    * pins were written against) for the duration of the build, then
    * restores whatever was live, in a finally. */
  private val planConfKeys = Seq(
    "spark.sql.autoBroadcastJoinThreshold",
    "spark.sql.adaptive.enabled",
    "spark.sql.adaptive.coalescePartitions.enabled",
    "spark.sql.adaptive.skewJoin.skewedPartitionFactor",
    "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
    "spark.sql.adaptive.advisoryPartitionSizeInBytes",
    "spark.sql.shuffle.partitions",
    "spark.sql.join.preferSortMergeJoin")

  private def withCanonicalConfs[T](
      spark: org.apache.spark.sql.SparkSession)(body: => T): T = {
    val saved = planConfKeys.map(k => k -> spark.conf.getOption(k))
    // unset = fall back to the SparkConf/builder value, which IS the
    // canonical default (SharedSpark sets shuffle.partitions=4 at
    // builder time, so unset lands back on 4, not 200)
    saved.foreach { case (k, _) =>
      try spark.conf.unset(k)
      catch { case _: org.apache.spark.sql.AnalysisException => () }
    }
    try body
    finally saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) =>
        try spark.conf.unset(k)
        catch { case _: org.apache.spark.sql.AnalysisException => () }
    }
  }

  lazy val all: Map[String, QueryExecution] = withCanonicalConfs(
      SharedSpark.spark) {
    val spark = SharedSpark.spark
    GraftFunctions.register(spark)
    val built = SparkEntry.queries.toSeq.sortBy(_._1).map {
      case (name, fn) =>
        spark.catalog.clearCache()
        val qe =
          try {
            val q = fn(spark, sfDir).queryExecution
            q.executedPlan // force analyze→cache-substitute→optimize→plan NOW
            q
          } catch { case e: Throwable =>
            throw new IllegalStateException(s"$name failed to plan", e) }
        name -> qe
    }.toMap
    spark.catalog.clearCache() // leave the shared session clean
    built
  }

  /** LAZY twins of the queries whose GRADED form materializes
    * internally (an eager `localCheckpoint` return is a checkpoint
    * scan — the suite-wide cartesian/HOF sweeps would pass vacuously
    * over it while the verify-join internals regress unseen). Keyed
    * with an `audit_` prefix so they can never collide with a graded
    * query name; swept alongside [[all]] by every suite-wide audit.
    * d2's lazy chain covers the `lshVerifiedPairs`/`strataVerified`
    * machinery d12/d15 embed too; the semanticDedup lazy form covers
    * the library API's verify join (the graded d9 is an inline lazy
    * chain, already visible in [[all]]). */
  lazy val auditOnly: Map[String, QueryExecution] = withCanonicalConfs(
      SharedSpark.spark) {
    val spark = SharedSpark.spark
    GraftFunctions.register(spark)
    import org.apache.spark.sql.functions._
    val builders: Seq[(String, () => org.apache.spark.sql.DataFrame)] =
      Seq(
        "audit_d2_lazy_verify" -> (() =>
          graft.operators.DedupOps.d2Chain(spark, sfDir,
            materialize = false)),
        "audit_d9_semantic_lazy" -> (() =>
          graft.operators.SimilarityOps.semanticDedup(
            spark.read.parquet(s"$sfDir/embeddings.parquet")
              .select(col("vec_id"), col("embedding")),
            "vec_id", "embedding", simThreshold = 0.99,
            materialize = false)))
    val built = builders.map { case (name, mk) =>
      spark.catalog.clearCache()
      val qe =
        try { val q = mk().queryExecution; q.executedPlan; q }
        catch { case e: Throwable =>
          throw new IllegalStateException(s"$name failed to plan", e) }
      name -> qe
    }.toMap
    spark.catalog.clearCache()
    built
  }

  def executed(name: String): String = all(name).executedPlan.toString
}
