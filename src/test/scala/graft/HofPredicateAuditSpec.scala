package graft

import org.apache.spark.sql.catalyst.expressions.{Expression, HigherOrderFunction}
import org.apache.spark.sql.catalyst.plans.logical.{Filter, Generate, Join, LogicalPlan, Project}
import org.scalatest.funsuite.AnyFunSuite

/** Suite-wide audit for the round-6 scale-killer class: a filter or
  * join predicate whose expression tree embeds a higher-order function
  * (transform/filter/aggregate/...). When Catalyst pushes a predicate
  * through the projection that derived it, the HOF chain is inlined
  * into the condition; references inside CaseWhen branches are excluded
  * from codegen subexpression elimination, and an inlined
  * `element_at(split(text), i)` pattern re-evaluates its child per
  * element — the t16 gate paid O(words²) per row this way (12.1 s vs
  * 0.8 s at sf0.1) until it was rewritten as a let-bound struct.
  *
  * The audit walks every SparkEntry query's OPTIMIZED plan (what
  * actually executes, post-pushdown) and requires each query whose
  * Filter/Join condition contains a HOF to carry an explicit
  * justification here. A new filter-on-derived-HOF shape fails this
  * spec until reviewed: either rewrite with the let-binding idiom
  * (`transform(array(x), v -> body)` pins `x` as a evaluated-once
  * lambda value — see TextOps.qualityGate) or justify why the
  * condition stays linear.
  */
class HofPredicateAuditSpec extends AnyFunSuite {

  /** Queries allowed to keep a HOF inside a predicate, with why the
    * shape is linear-safe at scale. */
  private val justified: Map[String, String] = Map(
    // t16's filter(keep) now inlines the NATIVE text_quality_gate
    // expression (not a HOF) — it left this list when the gate went
    // native; the SQL fallback form stays let-bound (TextQualitySpec).
    // d11's zip_with lane estimate left in round 9: the NATIVE
    // lane_matches expression replaced the HOF chain.
  )

  private def hofs(e: Expression): Seq[HigherOrderFunction] =
    e.collect { case h: HigherOrderFunction => h }

  private def offenders(plan: LogicalPlan): Seq[String] =
    plan.collect {
      case f: Filter if hofs(f.condition).nonEmpty =>
        s"Filter[${hofs(f.condition).map(_.prettyName).distinct.mkString(",")}]"
      case j: Join if j.condition.exists(c => hofs(c).nonEmpty) =>
        s"Join[${hofs(j.condition.get).map(_.prettyName).distinct.mkString(",")}]"
    }

  test("every filter/join predicate containing a HOF is justified") {
    // plans come from the shared one-pass build (QueryPlanCache) —
    // jdbc/ingest side work and the eager dedup executions run once
    // per suite run, not once per sweep; auditOnly adds the lazy
    // twins of internally-materializing queries (their graded plans
    // are checkpoint scans)
    val flagged = (QueryPlanCache.all ++ QueryPlanCache.auditOnly)
      .toSeq.sortBy(_._1).flatMap {
      case (name, qe) =>
        val where = offenders(qe.optimizedPlan)
        if (where.isEmpty) None else Some(name -> where.mkString("; "))
    }
    val unjustified = flagged.filterNot { case (n, _) => justified.contains(n) }
    assert(unjustified.isEmpty,
      s"\nHOF inside a predicate without a justification:\n" +
        unjustified.map { case (n, w) => s"  $n: $w" }.mkString("\n") +
        "\nEither rewrite with the let-binding idiom (TextOps.qualityGate) " +
        "or add a justified entry with the linearity argument.")
    // keep the allowlist honest: drop entries that no longer apply
    val stale = justified.keySet -- flagged.map(_._1).toSet
    assert(stale.isEmpty, s"stale justifications (no HOF predicate anymore): $stale")
  }

  /** The round-8 sibling of the predicate class: a Project sitting
    * DIRECTLY ABOVE a Generate evaluates its expressions once per
    * OUTPUT (exploded) row. A HOF there that reads only pre-explosion
    * columns is invariant across the group yet re-runs per generated
    * row — KMeans.fit paid the k·d-op distance 64× per vector this way
    * (v11 benched 35 s for a 2 000-vector fit) until the expression
    * moved into its own projection BELOW the generator, where it runs
    * once per input row (CollapseProject cannot merge across a
    * Generate). HOFs that reference the GENERATED column are fine —
    * their work is genuinely per-output-row. */
  private def generatorOffenders(plan: LogicalPlan): Seq[String] =
    plan.collect {
      case Project(list, g: Generate) =>
        val childOut = g.child.outputSet
        list.flatMap(hofs)
          .filter(_.references.subsetOf(childOut))
          .map(h => s"Project-over-Generate[${h.prettyName}]")
    }.flatten

  test("no group-invariant HOF is evaluated per generated row") {
    val flagged = (QueryPlanCache.all ++ QueryPlanCache.auditOnly)
      .toSeq.sortBy(_._1).flatMap {
      case (name, qe) =>
        val where = generatorOffenders(qe.optimizedPlan)
        if (where.isEmpty) None else Some(name -> where.mkString("; "))
    }
    assert(flagged.isEmpty,
      s"\nGroup-invariant HOF above a Generate (re-evaluated per " +
        s"exploded row — the v11/KMeans bug class):\n" +
        flagged.map { case (n, w) => s"  $n: $w" }.mkString("\n") +
        "\nMaterialize it in its own projection BELOW the generator.")
  }
}
