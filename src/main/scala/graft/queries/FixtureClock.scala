package graft.queries

/** Wall-clock ledger for FIXTURE GENERATION inside queries — the q31/q56/
  * q71-class gates synthesize their own input files (PDFs, WARC segments,
  * codec tars, mbox dumps) before the read path under test runs, and a
  * single per-query bench number hides a regression in either half
  * (q71's headline cost is mostly its compressors). Fixture-build actions
  * wrap in [[timed]]; [[graft.Bench]] [[drain]]s the ledger around each
  * measured run and reports `fixture_sec` / `query_sec` per query
  * alongside the unchanged wall number.
  *
  * Thread-confined by construction (build actions are driver-blocking
  * statements inside the query function); the atomic is only so a stray
  * concurrent streaming thread can't corrupt the ledger.
  */
object FixtureClock {
  private val nanos = new java.util.concurrent.atomic.AtomicLong(0L)

  def timed[A](f: => A): A = {
    val t0 = System.nanoTime()
    try f finally nanos.addAndGet(System.nanoTime() - t0)
  }

  /** Seconds accumulated since the last drain, and reset. */
  def drain(): Double = nanos.getAndSet(0L) / 1e9
}
