package graft.bench

import org.scalatest.funsuite.AnyFunSuite

import graft.Bench
import AnchorArbiter.Row

/** Gates the cross-attempt-disagreement arbiter (r16 verdict ask #2)
  * on the RECORDED round-16 counterexample shapes (BENCH_NOTES
  * "sf10 re-anchor"): the three zero-retry, both-cals-in-band rows
  * that sat 17–87% above neighboring retry-rescued mins must come out
  * `disputed`, the retry-rescued and flagged rows `best-effort`, and
  * an uncontradicted minimum `clean`. */
class AnchorArbiterSpec extends AnyFunSuite {

  test("the r16 d15 shape: a formally-clean 44.71 against a " +
      "retry-rescued 23.94 is disputed; the rescued row itself is " +
      "best-effort") {
    // pass 4 (44.71, cals 5.33/1.37, zero retries), pass 5 (27.95,
    // 4.84/1.63 — in-band under the r16 ceilings, so recorded
    // flag-free), pass 7 (23.94, post 3.35 FLAGGED, 2 retries)
    val rows = Seq(
      Row(4, "d15_lsh_recall", 44.71, contended = false,
        indeterminate = false, retries = 0),
      Row(5, "d15_lsh_recall", 27.95, contended = false,
        indeterminate = false, retries = 0),
      Row(7, "d15_lsh_recall", 23.94, contended = true,
        indeterminate = false, retries = 2))
    val judged = AnchorArbiter.arbitrate(rows)
    val verdicts = judged.map { case (r, v, _) => r.attempt -> v }.toMap
    assert(verdicts(4) == "disputed") // 44.71 > 1.15 × 23.94
    assert(verdicts(5) == "disputed") // 27.95 > 27.53 — barely, and rightly
    assert(verdicts(7) == "best-effort")
    // the judged-against bound is the min of the OTHER attempts
    assert(judged.collectFirst {
      case (r, _, m) if r.attempt == 4 => m
    }.flatten.contains(23.94))
  }

  test("the r16 d4 shape: clean 20.57 vs retry-rescued 16.23 is " +
      "disputed; the rescued min is best-effort; and a clean MINIMUM " +
      "is clean (the arbiter must not dispute the best evidence)") {
    val rows = Seq(
      Row(2, "d4_ngram_jaccard", 16.23, contended = false,
        indeterminate = false, retries = 2),
      Row(8, "d4_ngram_jaccard", 20.57, contended = false,
        indeterminate = false, retries = 0))
    val verdicts = AnchorArbiter.arbitrate(rows)
      .map { case (r, v, _) => r.attempt -> v }.toMap
    assert(verdicts(8) == "disputed")
    assert(verdicts(2) == "best-effort")

    // a formally-clean row that IS the min — or within 15% of every
    // other attempt — keeps its clean verdict
    val quiet = Seq(
      Row(1, "d12_dedup_pipeline", 18.68, contended = false,
        indeterminate = false, retries = 0),
      Row(2, "d12_dedup_pipeline", 19.90, contended = false,
        indeterminate = false, retries = 0))
    val qv = AnchorArbiter.arbitrate(quiet)
      .map { case (r, v, _) => r.attempt -> v }.toMap
    assert(qv(1) == "clean" && qv(2) == "clean") // 19.90 < 1.15 × 18.68
    // a single attempt has no disagreement evidence either way
    assert(AnchorArbiter.arbitrate(Seq(quiet.head.copy(query = "solo")))
      .head._2 == "clean")
    // a cal_indeterminate row is best-effort even with zero retries
    assert(AnchorArbiter.verdict(Row(1, "q", 10.0, contended = false,
      indeterminate = true, retries = 0), Seq(9.0))._1 == "best-effort")
  }

  test("end-to-end over real writer lines: parseRows reads values, " +
      "flags, and retry counts back out of Bench's own artifacts, and " +
      "the arbitrated/summary lines are machine-readable") {
    // reconstruct the r16 shape from the artifact writer itself
    val clean = Bench.fullJson(Seq("d15_lsh_recall" -> 44.71), Nil,
      "/tmp/sf10", 0, 0, filtered = true,
      calibration = Map("cal_cpu" -> 5.33, "cal_cpu_post" -> 1.37))
    val rescued = Bench.fullJson(Seq("d15_lsh_recall" -> 23.94), Nil,
      "/tmp/sf10", 0, 0, filtered = true,
      calibration = Map("cal_cpu" -> 4.86, "cal_cpu_post" -> 3.35),
      noiseRetries = Map("d15_lsh_recall" -> 2))
    val rows = AnchorArbiter.parseRows(1, clean) ++
      AnchorArbiter.parseRows(2, rescued)
    assert(rows.map(_.value) == Seq(44.71, 23.94))
    assert(rows.map(_.retries) == Seq(0, 2))
    assert(rows.map(_.contended) == Seq(false, true)) // 3.35 ≥ warm floor
    val judged = AnchorArbiter.arbitrate(rows)
    assert(judged.map(_._2) == Seq("disputed", "best-effort"))
    // row lines carry the verdict and the judged-against bound
    val line = AnchorArbiter.rowJson(judged.head._1, judged.head._2,
      judged.head._3)
    assert(line.contains(""""verdict":"disputed""""))
    assert(line.contains(""""vs_min":23.940"""))
    assert(line.contains(""""value":44.710"""))
    // summary: the overall min survives as the upper bound, and with
    // no clean rows clean_min is explicitly null, never silently the
    // disputed value
    val summary = AnchorArbiter.summaryJson("d15_lsh_recall", judged)
    assert(summary.contains(""""min":23.940"""))
    assert(summary.contains(""""clean_min":null"""))
    assert(summary.contains(""""disputed":1"""))
    assert(summary.contains(""""best-effort":1"""))
  }
}
