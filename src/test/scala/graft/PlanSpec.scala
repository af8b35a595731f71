package graft

import org.scalatest.funsuite.AnyFunSuite

/** Physical-plan audits: the properties that make these queries survive
  * a 100× scale-up, asserted against explain() output so a regression
  * (lost broadcast, lost pushdown, an accidental cartesian) fails CI.
  */
class PlanSpec extends AnyFunSuite {
  private lazy val spark = SharedSpark.spark
  private val sfDir = "/root/testdata/sf0.001"

  // all per-name plans come from the shared build (one analysis+
  // optimization pass per query for the whole suite run — see
  // QueryPlanCache); conf-sensitive cases below build their own frames
  private def plan(name: String): String = QueryPlanCache.executed(name)

  test("no query plans a cartesian product") {
    // auditOnly adds the LAZY twins of internally-materializing
    // queries — their graded plans are checkpoint scans this sweep
    // would pass vacuously
    (QueryPlanCache.all ++ QueryPlanCache.auditOnly).foreach {
      case (name, qe) =>
        val p = qe.executedPlan.toString
        assert(!p.contains("CartesianProduct") ||
          name == "v1_ann_bruteforce",
          s"$name plans a cartesian product")
    }
  }

  test("j1: dimension side is broadcast") {
    assert(plan("j1_examseries_join").contains("BroadcastHashJoin"))
  }

  test("j4/j7: semi/anti probes are broadcast hash joins") {
    assert(plan("j4_semi_probe").contains("BroadcastHashJoin"))
    assert(plan("j7_resume_anti_join").contains("BroadcastHashJoin"))
  }

  test("q1: filter is pushed to the parquet scan") {
    val p = plan("q1_pricing_summary")
    assert(p.contains("PushedFilters: [IsNotNull(l_shipdate)"),
      s"no pushed filter in:\n${p.take(2000)}")
  }

  test("q1: scan is pruned to the referenced columns") {
    val p = plan("q1_pricing_summary")
    // 11-column table, 6 referenced
    assert(p.contains("ReadSchema") && !p.contains("l_comment"))
    assert(!p.contains("l_partkey"), "scan reads unreferenced columns")
  }

  test("p3: predicate reaches the events scan") {
    val p = plan("p3_predicate_filters")
    assert(p.contains("PushedFilters") &&
      p.contains("StringStartsWith(event_type,c"),
      s"event_type prefix filter not pushed:\n${p.take(2000)}")
  }

  test("aggregates are partial+final hash aggregates") {
    val p = plan("a1_dup_exam_groups")
    assert(p.contains("HashAggregate"))
    assert("HashAggregate".r.findAllIn(p).length >= 2, "no partial agg")
  }

  test("q4: EXISTS runs as a semi join, not a row-multiplying join") {
    assert(plan("q4_priority_exists").contains("LeftSemi"))
  }

  test("q16: complaint exclusion is a broadcast anti join") {
    val p = plan("q16_supplier_cnt")
    assert(p.contains("LeftAnti") && p.contains("BroadcastHashJoin"))
  }

  test("q21: both existence probes are semi/anti joins") {
    val p = plan("q21_waiting_supplier")
    assert(p.contains("LeftSemi") && p.contains("LeftAnti"))
  }

  test("q6: every predicate reaches the parquet scan, columns pruned") {
    val p = plan("q6_forecast_revenue")
    // the PushedFilters list is elided in toString past ~100 chars, so
    // assert on the leading entries (the full list was inspected once:
    // all five range predicates reach the scan)
    assert(p.contains("PushedFilters: [IsNotNull(l_shipdate), " +
      "IsNotNull(l_discount), IsNotNull(l_quantity)"),
      s"q6 predicates not pushed:\n${p.take(2000)}")
    assert(!p.contains("l_partkey"), "q6 scan reads unreferenced columns")
  }

  test("q2/q9: dimension slivers are broadcast") {
    assert(plan("q2_best_supplier").contains("BroadcastHashJoin"))
    assert(plan("q9_product_profit").contains("BroadcastHashJoin"))
  }

  test("q11/q15/q22: scalar subqueries are one-row broadcasts") {
    // a 1-row aggregate joined with no key planes as a broadcast
    // nested-loop (1 probe row), never a shuffle or a rescan
    Seq("q11_important_parts", "q15_top_supplier", "q22_global_sales")
      .foreach { name =>
        val p = plan(name)
        assert(p.contains("BroadcastNestedLoopJoin") ||
          p.contains("BroadcastHashJoin"),
          s"$name scalar subquery is not broadcast")
      }
  }

  test("q13: both aggregate levels are partial+final") {
    val p = plan("q13_count_distribution")
    assert("HashAggregate".r.findAllIn(p).length >= 4,
      "q13 histogram lost its partial aggregation")
  }

  test("q20/q22: existence probes are semi/anti joins") {
    assert(plan("q20_excess_share").contains("LeftSemi"))
    assert(plan("q22_global_sales").contains("LeftAnti"))
  }

  test("p10: the day-bucket prefix filter becomes a pushed ts range") {
    val p = plan("p10_day_bucket_prune")
    assert(p.contains("GreaterThanOrEqual(o_orderdate") &&
      p.contains("LessThan(o_orderdate"),
      s"TimeBucketPruneRule range not pushed to the scan:\n${p.take(3000)}")
  }

  test("dedup signatures use the native codegen expressions, not HOFs") {
    // the graded d2 materializes internally since r13 (its returned
    // frame is a checkpoint scan) — pin ITS OWN chain in lazy form,
    // through the builder the graded query itself calls, so a drift
    // in the graded artifact can't hide behind a spec-local replica
    val d2 = graft.operators.DedupOps
      .d2Chain(spark, sfDir, materialize = false)
      .queryExecution.optimizedPlan.toString
    spark.catalog.clearCache() // the lazy form's caches are caller-owned
    assert(d2.contains("minhash_sig") && d2.contains("md5_shingle60"),
      "native signature expressions missing from the optimized plan")
    val d3 = SparkEntry.queries("d3_simhash_hamming")(spark, sfDir)
      .queryExecution.optimizedPlan.toString
    assert(d3.contains("simhash60"))
  }

  test("d7: benchmark gram table is broadcast; corpus side never shuffles " +
      "before the probe") {
    val p = plan("d7_decontaminate")
    assert(p.contains("BroadcastHashJoin"),
      s"bench grams not broadcast:\n${p.take(2000)}")
  }

  test("d4: the PPJoin length bound prunes below the shingle join-back") {
    // the round-8 trim: candidates must be length-filtered with the
    // two-int joins BEFORE paying the shingle-array join + intersect;
    // executedPlan prints top-down, so the bound's multiply must
    // appear AFTER (= deeper than) the exact-verify projection
    val p = plan("d4_ngram_jaccard")
    val verifyIdx = p.indexOf("sorted_intersect_count")
    val boundIdx = math.max(p.indexOf("* 10)"), p.indexOf("* 7)"))
    assert(verifyIdx >= 0, s"verify join missing:\n${p.take(2000)}")
    assert(boundIdx >= 0, s"length bound missing:\n${p.take(2000)}")
    assert(boundIdx > verifyIdx,
      "PPJoin length bound must sit BELOW the exact-verify join")
  }

  test("j12: bloom probe filters the fact scan before the join") {
    val p = plan("j12_bloom_prune")
    val probeAt = p.indexOf("bloom_contains")
    val joinAt = p.indexOf("BroadcastHashJoin")
    assert(probeAt >= 0, "bloom_contains missing from the physical plan")
    assert(joinAt >= 0 && probeAt > joinAt,
      // executedPlan prints top-down: the probe must appear BELOW (after)
      // the join node, i.e. on the scan side, not above the join output
      s"bloom probe is not below the join:\n${p.take(2000)}")
  }

  test("d8: incoming band list broadcasts into the corpus band scan") {
    val p = plan("d8_incremental_dedup")
    assert(p.contains("BroadcastHashJoin"),
      s"incoming bands not broadcast:\n${p.take(2000)}")
  }

  test("w8: all three rank functions share one window (single sort)") {
    val p = plan("w8_rank_distribution")
    assert("\\bWindow\\b".r.findAllIn(p).size >= 1)
    // one Window operator computes ntile+percent_rank+cume_dist together
    assert("ntile".r.findAllIn(p).nonEmpty)
    val windowOps = "Window ".r.findAllIn(p).size
    assert(windowOps <= 1, s"expected a single Window operator, got $windowOps")
  }

  test("t18: df and corpus stats broadcast into the scored stream") {
    val p = plan("t18_bm25")
    assert(p.contains("BroadcastHashJoin"),
      s"query-term df table not broadcast:\n${p.take(2000)}")
    // the final top-20 is a distributed TakeOrdered, not a global sort
    assert(p.contains("TakeOrderedAndProject"),
      s"top-k is not TakeOrdered:\n${p.take(2000)}")
  }

  test("v7: both ranking sides cut to top-k via distributed TakeOrdered") {
    val p = plan("v7_hybrid_rrf")
    // three TakeOrdered nodes: lexical top-100, vector top-100, fused
    // top-15 — the corpus never funnels through a single global sort
    assert("TakeOrderedAndProject".r.findAllIn(p).size >= 3,
      s"expected 3 TakeOrdered cuts:\n${p.take(3000)}")
  }

  test("m4: codebook broadcasts; chunk rows never shuffle for the argmin") {
    val p = plan("m4_chunk_quantize")
    assert(p.contains("BroadcastNestedLoopJoin") ||
      p.contains("BroadcastHashJoin"),
      s"centroid codebook not broadcast:\n${p.take(2000)}")
  }

  test("s6: native session_window plans one aggregate exchange on user_id") {
    val p = plan("s6_session_window")
    assert(p.contains("session_window") || p.contains("SessionWindow"),
      s"native session operator missing:\n${p.take(2000)}")
  }

  test("k13: SCD2 is one full-outer join and one explode, no second join") {
    val p = plan("k13_scd2_history")
    assert(p.contains("FullOuter"), "missing full-outer join")
    assert("Generate explode".r.findAllIn(p).size == 1,
      "version fan-out must be a single explode")
    val joins = "Join ".r.findAllIn(p).size +
      "SortMergeJoin".r.findAllIn(p).size +
      "BroadcastHashJoin".r.findAllIn(p).size
    assert(joins <= 2, s"expected a single join, plan has $joins")
  }

  test("t20: vocab weights broadcast onto the token stream (DSIR pass)") {
    val p = plan("t20_domain_affinity")
    // the per-token weight table and its totals are vocabulary-sized;
    // both must reach the exploded corpus stream as broadcasts — a
    // sort-merge join here would shuffle every token of the corpus
    assert("BroadcastHashJoin".r.findAllIn(p).size >= 1,
      s"vocab weight join not broadcast:\n${p.take(3000)}")
    // the one-row totals crossJoin must plan as a broadcast nested
    // loop, never a cartesian/shuffle
    assert(p.contains("BroadcastNestedLoopJoin"),
      s"totals not broadcast:\n${p.take(3000)}")
  }

  test("s7: rank window runs over aggregated rows, after the count agg") {
    val p = plan("s7_windowed_topk")
    // exactly one Window (the rank), and it must sit ABOVE the hash
    // aggregate — ranking raw events would sort event-cardinality rows
    val win = p.indexOf("Window")
    val agg = p.lastIndexOf("HashAggregate")
    assert("Window ".r.findAllIn(p).size == 1, "expected a single Window")
    assert(win >= 0 && agg > win,
      "rank window must consume the aggregate, not raw events")
  }

  test("v8: query sub-vectors broadcast; corpus scores in one projection") {
    val p = plan("v8_maxsim")
    assert(p.contains("BroadcastNestedLoopJoin"),
      s"8-query side not broadcast:\n${p.take(2000)}")
    // all 16 pair cosines must sit in ONE projection (a join per pair
    // would rescan the corpus 16 times)
    assert("cosine_sim".r.findAllIn(p).size >= 16,
      "pair cosines not fused into a single projection")
  }

  test("j13: salted join carries the salt in its join key") {
    val p = plan("j13_salted_skew_join")
    assert(p.contains("__salt"),
      s"salt column missing from the join:\n${p.take(2000)}")
  }

  test("k14: keep-latest rank and op count share one key exchange") {
    val p = plan("k14_cdc_apply")
    val lines = p.linesIterator.toVector
    val winIdx = lines.zipWithIndex.collect {
      case (l, i) if l.contains("Window ") => i
    }
    assert(winIdx.size == 2, s"expected 2 Window nodes, got ${winIdx.size}")
    // no exchange between the two windows: same partitioning reused
    assert(!lines.slice(winIdx.min + 1, winIdx.max)
      .exists(_.contains("Exchange")),
      "second window re-shuffles instead of reusing the key exchange")
  }

  test("t22: counter table broadcasts; top-k is a distributed cut") {
    val p = plan("t22_heavy_hitters")
    assert(p.contains("BroadcastHashJoin"),
      s"256-row counter table not broadcast:\n${p.take(2000)}")
    assert(p.contains("TakeOrderedAndProject"),
      "exact top-20 is not a distributed TakeOrdered")
    assert(p.contains("InMemoryRelation"),
      "token stream not cached — corpus re-tokenized per branch")
  }

  test("d14: chunk assembly windows partition by doc_id only") {
    val p = plan("d14_cdc_chunks")
    // the running anchor count and the ordered rebuild are per-doc —
    // any corpus-wide (empty partitionBy) window would serialize the
    // whole corpus through one task
    assert(!p.contains("Window [") ||
      !"""Window \[[^\]]*\], \[\]""".r.findFirstIn(p).isDefined,
      s"corpus-wide window detected:\n${p.take(3000)}")
    assert(p.contains("HashAggregate"), "chunk-hash groupBy missing")
  }

  test("v9: metadata predicate is pushed to the candidate parquet scan " +
      "(pre-filter, not post-top-k filter)") {
    // QueryPlanCache builds every plan against a CLEARED session cache
    // (an InMemoryTableScan left by another query would hide the
    // parquet scan's PushedFilters from this audit)
    val p = plan("v9_filtered_ann")
    assert(p.contains("PushedFilters: [IsNotNull(label), EqualTo(label,3)]")
      || p.contains("EqualTo(label,3)"),
      s"label predicate not pushed:\n${p.take(3000)}")
  }

  test("g1: the edge list is persisted and re-read per iteration, not " +
      "recomputed from the join") {
    val p = plan("g1_pagerank")
    assert(p.contains("InMemoryTableScan") || p.contains("TableCacheQueryStage"),
      s"edges not cached:\n${p.take(3000)}")
  }

  test("g2: pair generation joins on the container key with the s1<s2 " +
      "dedup in the join itself, and top-k is a distributed cut") {
    val p = plan("g2_supplier_affinity")
    assert(p.contains("TakeOrderedAndProject"),
      "final top-50 is not a distributed TakeOrdered cut")
    assert("(?s)Join.*s1.* < .*s2".r.findFirstIn(p).isDefined ||
      p.contains("(s1#"), s"pair dedup not in the join:\n${p.take(3000)}")
  }

  test("t24: the rule breakdown is one scan-speed projection — no " +
      "joins, no aggregates, only the final sort shuffles") {
    val p = plan("t24_gopher_rules")
    assert(!p.contains("Join"), s"unexpected join:\n${p.take(2000)}")
    assert(!p.contains("HashAggregate"),
      s"unexpected aggregate — rules should be array lambdas:\n${p.take(2000)}")
    assert("Exchange".r.findAllIn(p).size == 1,
      s"more than the final-sort exchange:\n${p.take(2000)}")
  }

  test("t25: chunking is generate-over-scan — the text never shuffles " +
      "(only hashes and offsets pass the sort exchange)") {
    val p = plan("t25_rag_chunks")
    assert(p.contains("Generate"), "posexplode missing from the plan")
    assert(!p.contains("Join") && !p.contains("HashAggregate"),
      s"chunking should be a pure fan-out:\n${p.take(2000)}")
    // the sort's exchange carries (doc_id, chunk_id, start_tok,
    // n_tokens, chunk_hash) — the Project feeding the shuffle (first
    // Project line below the Exchange line) must not carry the raw
    // text or the split word array
    val lines = p.linesIterator.toSeq
    val exIdx = lines.indexWhere(_.contains("Exchange"))
    val feed = lines.drop(exIdx + 1).find(_.contains("Project ["))
    assert(feed.exists(l => !l.contains("text#") && !l.contains("w#")),
      s"raw text/words cross the shuffle:\n${p.take(3000)}")
  }

  test("a18: funnel stage anchors are partial+final min aggregates " +
      "(map-side combine before the user_id shuffle)") {
    val p = plan("a18_funnel")
    assert(p.contains("partial_min"),
      s"stage mins not partial aggregates:\n${p.take(3000)}")
  }

  test("x8: each side reduces to bucket summaries BEFORE the join — " +
      "the only row-shuffle keys are the 64 buckets") {
    val p = plan("x8_table_checksum")
    // partial+final per side: map-side combine absorbs the fact rows,
    // 64 summary rows per side cross the wire
    assert(p.contains("partial_count"),
      s"side summaries are not partial aggregates:\n${p.take(3000)}")
    assert(p.contains("hashpartitioning(bucket"),
      s"summary exchange not keyed on bucket:\n${p.take(3000)}")
  }

  test("t26: the epoch-shuffle sort is per-(epoch, shard), not global") {
    val p = plan("t26_epoch_shuffle")
    assert(p.contains("windowspecdefinition(epoch"),
      s"shuffle positions not computed per shard window:\n${p.take(3000)}")
  }

  test("d15: the shingle table is cached once and reused across " +
      "banding, verify, and the truth join") {
    val p = plan("d15_lsh_recall")
    assert(p.contains("InMemoryTableScan"),
      s"shingle cache not reused:\n${p.take(3000)}")
  }
}
