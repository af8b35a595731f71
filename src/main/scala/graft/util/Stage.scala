package graft.util

/** The single definition of the driver-local staging root shared by
  * every query that stages an artifact for the DuckDB oracle to read
  * (the ingest kv tables, v11's fitted centroids, the k15 lake). Read
  * once at class-init: the query side and the oracle SQL are built
  * from the same value in the same JVM, so the compare always points
  * where the query staged. Overridable so concurrent users/CI runs
  * don't collide — and defined exactly once so a path change cannot
  * leave one consumer reading stale artifacts from the old location.
  */
object Stage {
  val root: String =
    sys.env.getOrElse("GRAFT_STAGE_DIR", "/tmp/graft_stage")
}
