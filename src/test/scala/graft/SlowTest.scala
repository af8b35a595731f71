package graft

/** The bench-window test tier (VERDICT r11 ask #6): tests carrying
  * this tag are EXCLUDED from the default `sbt test` (the build
  * filters `-l graft.SlowTest` unless `GRAFT_SLOW_TESTS` is set) and
  * run in the per-round bench window instead:
  *
  * {{{
  * GRAFT_SLOW_TESTS=1 sbt "Test/testOnly graft.catalog.LakeCrashFuzzSpec graft.bench.ProbeGuardSpec"
  * }}}
  *
  * Tag a test only when it is (a) minutes-scale by construction
  * (kill-point fuzzing, multi-store builds) and (b) guarding
  * slow-moving machinery a per-commit suite run would not touch —
  * never to hide a failing or flaky test. Zero assertion loss: the
  * tagged tests keep their full scale and tolerances.
  */
object SlowTest extends org.scalatest.Tag("graft.SlowTest")
