package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LogicalPlan}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.catalyst.util.DateTimeUtils
import org.apache.spark.sql.internal.SQLConf
import org.apache.spark.sql.types.{DataType, IntegerType, StringType, TimestampNTZType, TimestampType}
import org.apache.spark.unsafe.types.UTF8String

/** Optimizer rule: derive a pushable timestamp range from the
  * reference's string-prefix time buckets.
  *
  * The reference buckets time by truncating the rendered timestamp
  * (`substr(ts, 1, N)`, Cenir_DB.py:453 — our `Fns.hourBucket` /
  * `Fns.dayBucket`). As a filter, `substring(cast(ts as string), 1, N)
  * = 'literal'` is opaque to parquet: the scan reads every row group.
  * This rule spots the pattern and AND-injects the equivalent range
  * `ts >= bucketStart && ts < bucketEnd`, which the file source
  * translates into PushedFilters — row groups outside the bucket are
  * skipped by min/max stats, and at lake scale date-partitioned tables
  * get partition pruning. The original predicate is kept (the
  * injection only narrows), so the rewrite is correct even if a
  * malformed literal makes the bucket empty.
  *
  * Applied only when the session timezone is UTC: elsewhere a DST
  * fall-back hour renders the same wall-clock prefix twice and a
  * single instant range would under-cover it.
  *
  * Registered by [[graft.GraftFunctions.register]] (live session,
  * `spark.experimental.extraOptimizations` — these run after the main
  * optimizer batches but before physical planning, so the derived
  * conjunct still reaches the scan) and by [[graft.GraftExtensions]]
  * (`injectOptimizerRule`).
  */
object TimeBucketPruneRule extends Rule[LogicalPlan] {

  private val HourRe = """^\d{4}-\d{2}-\d{2} \d{2}$""".r
  private val DayRe = """^\d{4}-\d{2}-\d{2}$""".r

  /** [start, end) micros of the bucket, when the literal is a
    * well-formed hour (len 13) or day (len 10) prefix.
    *
    * TIMESTAMP_NTZ is pure wall-clock — prefix ⇔ range always holds.
    * TIMESTAMP (instant) renders through the session zone, so the
    * range is only derived under UTC (a DST fall-back hour repeats a
    * wall-clock prefix and one instant range would under-cover it). */
  private def bounds(dt: DataType, prefix: String): Option[(Long, Long)] = {
    def parse(s: String): Option[Long] = dt match {
      case TimestampNTZType =>
        DateTimeUtils.stringToTimestampWithoutTimeZone(
          UTF8String.fromString(s))
      case TimestampType =>
        val zoneStr = SQLConf.get.sessionLocalTimeZone
        if (zoneStr != "UTC" && zoneStr != "Etc/UTC") None
        else DateTimeUtils.stringToTimestamp(UTF8String.fromString(s),
          DateTimeUtils.getZoneId(zoneStr))
      case _ => None
    }
    prefix match {
      case HourRe() =>
        parse(s"$prefix:00:00").map(lo => (lo, lo + 3600L * 1000000L))
      case DayRe() =>
        parse(s"$prefix 00:00:00").map(lo => (lo, lo + 86400L * 1000000L))
      case _ => None
    }
  }

  /** `substring(cast(ts as string), 1, 13|10) = 'literal'` (either
    * argument order), with the literal length matching the slice. */
  private object BucketEq {
    private def slice(e: Expression): Option[(Expression, Int)] = e match {
      case Substring(Cast(ts, StringType, _, _),
          Literal(1, IntegerType), Literal(len: Int, IntegerType))
          if (ts.dataType == TimestampType ||
            ts.dataType == TimestampNTZType) &&
            (len == 13 || len == 10) =>
        Some((ts, len))
      case _ => None
    }
    def unapply(e: Expression): Option[(Expression, String)] = e match {
      case EqualTo(l, Literal(s: UTF8String, StringType)) =>
        slice(l).collect { case (ts, len) if s.numChars == len =>
          (ts, s.toString) }
      case EqualTo(Literal(s: UTF8String, StringType), r) =>
        slice(r).collect { case (ts, len) if s.numChars == len =>
          (ts, s.toString) }
      case _ => None
    }
  }

  private def conjuncts(e: Expression): Seq[Expression] = e match {
    case And(l, r) => conjuncts(l) ++ conjuncts(r)
    case other => Seq(other)
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    case f @ Filter(cond, _) =>
      val existing = conjuncts(cond)
      val derived = existing.flatMap {
        case BucketEq(ts, prefix) =>
          bounds(ts.dataType, prefix).toSeq.flatMap { case (lo, hi) =>
            Seq(GreaterThanOrEqual(ts, Literal(lo, ts.dataType)),
              LessThan(ts, Literal(hi, ts.dataType)))
          }
        case _ => Nil
      // idempotence: transform runs to fixpoint, so never re-add a
      // conjunct that is already present
      }.filterNot(d => existing.exists(_.semanticEquals(d)))
      if (derived.isEmpty) f
      else f.copy(condition = derived.foldLeft(cond)(And(_, _)))
  }
}
