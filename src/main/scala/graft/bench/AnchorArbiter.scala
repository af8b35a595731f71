package graft.bench

import java.nio.file.{Files, Paths}

import graft.Bench

/** Cross-attempt-disagreement arbiter for anchor sessions (r16
  * verdict ask #2).
  *
  * The protocol it automates: BENCH_NOTES' round-15 amendment (re-run
  * in round 16) declared cross-attempt disagreement the FINAL arbiter
  * of whether a formally-clean anchor row is actually quiet — steady
  * moderate contention can hold both calibration readings inside
  * their bands while slowing a query 1.2–1.9×, and the only remaining
  * signature is other attempts of the SAME query reading much lower.
  * Round 16 produced three such rows (d15 44.71 and 27.95, d4 20.57 —
  * each zero-retry, both-cals-in-band, 17–87% above neighboring
  * retry-rescued mins), and the verdict until now lived in hand-read
  * tables. This post-pass makes it an artifact field.
  *
  * Verdict per ROW (the ask's vocabulary):
  *  - `best-effort`: the row carries its own contamination evidence —
  *    a contended or cal_indeterminate calibration flag, or noise
  *    retries (a >2× spread observed mid-measurement). Its value is a
  *    valid UPPER bound on the quiet cost (contention only slows a
  *    run, never speeds it) but not a quiet anchor.
  *  - `disputed`: the row is FORMALLY clean (no flag, zero retries)
  *    but its value exceeds the minimum of the query's OTHER attempts
  *    by more than [[DisputeFactor]] — some other attempt, even a
  *    contaminated one, proved the query runs ≥15% faster, so the
  *    "clean" certification is contradicted and the row must not be
  *    recorded as a quiet anchor. Any attempt's min serves as the
  *    contradiction bound for the same reason best-effort values are
  *    upper bounds.
  *  - `clean`: formally clean and within the dispute factor of every
  *    other attempt (or the only attempt — no evidence either way).
  *
  * Run as a main over an anchor `history.jsonl`
  * (`tools/anchor_sf10.sh` invokes it after its passes): writes
  * `<history>.arbitrated.jsonl` with one row per (attempt, query)
  * carrying the verdict, and prints a per-query machine-readable
  * summary line to stdout. Pure classification lives in [[verdict]] /
  * [[arbitrate]] so AnchorArbiterSpec can gate it on the recorded
  * round-16 counterexample shapes. */
object AnchorArbiter {

  /** A formally-clean value this far above the best other attempt is
    * disputed: >15% is the ask's threshold, sitting well below the
    * smallest recorded contradiction (d4 20.57 vs 16.23 = 1.27×) and
    * above same-box quiet rerun jitter (BENCH_NOTES quiet-box spreads
    * run under 10%). Env-overridable like the bench band ceilings
    * (`ANCHOR_DISPUTE_FACTOR`) — a noisier box class may need a wider
    * factor, derived the same way: above its quiet rerun jitter,
    * below its smallest recorded contradiction. */
  val DisputeFactor: Double =
    sys.env.getOrElse("ANCHOR_DISPUTE_FACTOR", "1.15").toDouble

  /** One (attempt, query) measurement with its self-reported
    * contamination evidence. */
  final case class Row(attempt: Int, query: String, value: Double,
      contended: Boolean, indeterminate: Boolean, retries: Int) {
    def formallyClean: Boolean = !contended && !indeterminate &&
      retries == 0
  }

  /** The row's verdict against the other attempts' values, plus the
    * bound it was judged against (None when there is no other
    * attempt). */
  def verdict(row: Row, others: Seq[Double],
      factor: Double = DisputeFactor): (String, Option[Double]) = {
    val bound = others.minOption
    if (!row.formallyClean) ("best-effort", bound)
    else bound match {
      case Some(m) if row.value > factor * m => ("disputed", Some(m))
      case _ => ("clean", bound)
    }
  }

  /** Verdicts for every row, grouped per query: each row is judged
    * against the minimum of the SAME query's other attempts. Returns
    * rows in input order with (verdict, vsMin). */
  def arbitrate(rows: Seq[Row], factor: Double = DisputeFactor)
      : Seq[(Row, String, Option[Double])] = {
    val byQuery = rows.groupBy(_.query)
    rows.map { r =>
      val others = byQuery(r.query)
        .filter(o => !(o eq r)).map(_.value)
      val (v, m) = verdict(r, others, factor)
      (r, v, m)
    }
  }

  /** Parse one anchor-history line into its rows (a solo anchor line
    * carries one query; the parse is general). `attempt` is the
    * 1-based line number within the history. */
  def parseRows(attempt: Int, line: String): Seq[Row] = {
    val contended = line.contains(""""contended":true""")
    val indeterminate = line.contains(""""cal_indeterminate":true""")
    val retries = Bench.parseHistoryNoiseRetries(line)
    Bench.parseHistoryLine(line).toSeq.flatMap { case (_, _, queries) =>
      queries.map { case (q, v) =>
        Row(attempt, q, v, contended, indeterminate,
          retries.getOrElse(q, 0))
      }
    }
  }

  private def jq(s: String): String = "\"" + s + "\""

  /** The arbitrated per-row line (strict flat JSON, same writer
    * discipline as Bench's artifacts). */
  def rowJson(r: Row, verdict: String, vsMin: Option[Double]): String =
    s"""{"attempt":${r.attempt},"query":${jq(r.query)},""" +
      s""""value":${Bench.num3(r.value)},""" +
      s""""verdict":${jq(verdict)},""" +
      vsMin.fold("")(m => s""""vs_min":${Bench.num3(m)},""") +
      s""""retries":${r.retries},"contended":${r.contended},""" +
      s""""cal_indeterminate":${r.indeterminate}}"""

  /** One machine-readable summary line per query: attempt count, the
    * overall min (a valid upper bound on quiet cost regardless of
    * verdicts), the min over CLEAN rows if any survived arbitration,
    * and the per-verdict counts. */
  def summaryJson(query: String,
      rows: Seq[(Row, String, Option[Double])]): String = {
    val mine = rows.filter(_._1.query == query)
    val counts = mine.groupBy(_._2).view.mapValues(_.size).toSeq.sortBy(_._1)
      .map { case (v, n) => s"${jq(v)}:$n" }.mkString("{", ",", "}")
    val cleanMin = mine.collect { case (r, "clean", _) => r.value }
      .minOption
    s"""{"query":${jq(query)},"attempts":${mine.size},""" +
      s""""min":${Bench.num3(mine.map(_._1.value).min)},""" +
      cleanMin.fold(""""clean_min":null,""")(m =>
        s""""clean_min":${Bench.num3(m)},""") +
      s""""verdicts":$counts}"""
  }

  def main(args: Array[String]): Unit = {
    val histPath = args.headOption.getOrElse("history.jsonl")
    val lines = Files.readAllLines(Paths.get(histPath)).toArray
      .toSeq.map(_.toString).filter(_.nonEmpty)
    val rows = lines.zipWithIndex.flatMap { case (l, i) =>
      parseRows(i + 1, l)
    }
    val judged = arbitrate(rows)
    val out = Paths.get(histPath + ".arbitrated.jsonl")
    Files.write(out, judged.map { case (r, v, m) => rowJson(r, v, m) }
      .mkString("", "\n", "\n").getBytes("UTF-8"))
    judged.map(_._1.query).distinct.sorted
      .foreach(q => println(summaryJson(q, judged)))
    System.err.println(s"arbitrated ${judged.size} rows from " +
      s"${lines.size} history lines -> $out")
  }
}
