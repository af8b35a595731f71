package graft.bench

import graft.Bench

/** Classify standalone [[graft.CalProbe]] readings into the bench's
  * three-state calibration verdict and print it as a JSON fragment —
  * so artifacts built OUTSIDE the bench main (the SlowTest tier's
  * bracketing readings in `tools/tier.sh`) carry the same
  * machine-readable quiet/indeterminate/contended stamp as bench
  * history lines instead of raw seconds a reader must band by hand.
  *
  * Every CalProbe invocation is a FRESH JVM, so every reading it
  * produces sits on the COLD ruler (first Spark job: no codegen
  * cache, C2 cold) — including a "post" reading taken after a tier
  * run. All values are therefore classified against the cold bands
  * ([[Bench.CalCpuQuietCeiling]] / [[Bench.CalCpuContendedFloor]]),
  * never the warm post bands, which only apply to re-readings inside
  * a live bench JVM. Worst reading wins, same as [[Bench.calState]].
  *
  * Usage: `CalVerdict 4.38 1.24 …` (any number of readings; non-JSON
  * "null"/empty args are skipped so tier.sh can pass its possibly-null
  * captures verbatim). Prints one line, e.g.
  * `{"cal_verdict":"quiet"}` or
  * `{"cal_verdict":"contended","contended":true}`. */
object CalVerdict {

  /** The verdict line for cold-ruler readings (None args skipped). */
  def line(readings: Seq[Option[Double]]): String = {
    val states = readings.flatten.map(v =>
      Bench.classifyReading(v, Bench.CalCpuQuietCeiling,
        Bench.CalCpuContendedFloor))
    val worst = states.foldLeft(Bench.CalQuiet: Bench.CalState)(
      (a, b) => if (b > a) b else a)
    worst match {
      case Bench.CalContended =>
        """{"cal_verdict":"contended","contended":true}"""
      case Bench.CalIndeterminate =>
        """{"cal_verdict":"indeterminate","cal_indeterminate":true}"""
      case _ => """{"cal_verdict":"quiet"}"""
    }
  }

  def main(args: Array[String]): Unit =
    println(line(args.toSeq.map(a =>
      scala.util.Try(a.trim.toDouble).toOption)))
}
