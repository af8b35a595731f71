package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Shared column helpers used across operator modules.
  *
  * Determinism discipline (the driver hash-compares values against a
  * DuckDB oracle after stringifying):
  *  - float aggregates go through an exact DECIMAL(30,6) cast so the sum
  *    is order-independent and bit-identical between engines;
  *  - ordering keys built from doubles are converted to exact integers
  *    (the data has 2-decimal values) so min_by/max_by/arg_min ties are
  *    impossible;
  *  - epoch seconds are floored (Spark `unix_timestamp` truncates; the
  *    oracle uses `floor(epoch(ts))` to match);
  *  - dates are emitted as strings (pandas renders Spark date32 and
  *    DuckDB DATE differently otherwise).
  */
object Fns {

  /** Order-independent exact sum of a double column (DECIMAL path). */
  def decSum(c: Column): Column = sum(c.cast("decimal(30,6)"))

  /** decSum cast back to double — bit-identical across engines. */
  def decSumD(c: Column): Column = decSum(c).cast("double")

  /** Epoch seconds, truncated (matches DuckDB floor(epoch(ts))). */
  def epochSec(c: Column): Column = unix_timestamp(c)

  /** Seconds since midnight of a timestamp (UTC session). */
  def secOfDay(c: Column): Column = epochSec(c) % 86400

  /** Unique bigint ordering key from a 2-decimal double plus a unique id:
    * round(value*100) is exact; ids up to 1e10 disambiguate ties (the
    * sf0.1 id domain already reached the previous 1e5 capacity). */
  def uniqKey(value: Column, id: Column): Column =
    round(value * 100).cast("long") * 10000000000L + id

  /** Hour-truncation bucket over a timestamp's string form (the
    * reference's substr(ts, 1, N) time bucketing, Cenir_DB.py:453) —
    * shared by a1 and j9 so the two can never drift. */
  def hourBucket(ts: Column): Column =
    substring(ts.cast("string"), 1, 13)

  /** Day-truncation bucket (substr(ts, 1, 10)). As a filter, both
    * bucket forms are rewritten to pushable timestamp ranges by
    * [[graft.plans.TimeBucketPruneRule]]. */
  def dayBucket(ts: Column): Column =
    substring(ts.cast("string"), 1, 10)

  /** Ceil(seconds/60) minutes via integer arithmetic (no float div). */
  def ceilMinutes(seconds: Column): Column =
    ((seconds + 59L) / 60L).cast("long")

  /** Deterministic cross-engine hash bucket: md5 of the string, first
    * 15 hex chars as a bigint, mod `m`. ONE definition shared by the
    * t8/t15 split, d14's CDC anchors, and t20's DSIR buckets — the
    * DuckDB twin is `('0x' || substr(md5(x), 1, 15))::BIGINT % m`, and
    * a prefix-width change in one copy but not the others would
    * silently desynchronize an oracle pair. */
  def md5Bucket(c: Column, m: Int): Column =
    conv(substring(md5(c), 1, 15), 16, 10).cast("bigint") % m

}
