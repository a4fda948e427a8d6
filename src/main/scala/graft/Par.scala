package graft

/** Run INDEPENDENT Spark actions concurrently from a bounded driver
  * pool — the guide's overlap-independent-jobs pattern (§2.6): Spark's
  * scheduler happily runs several jobs at once inside one application,
  * and actions are only sequential because driver code calls them
  * sequentially. The index sinks write 2–5 independent relations per
  * call; issuing those writes concurrently lets each job's tasks
  * back-fill the slots freed by the others' straggler tails instead of
  * paying every job's full scheduling latency end-to-end. Shared
  * tracked caches stay safe under concurrency: the BlockManager's
  * per-block locks make the first computing task store the partition
  * and the racing ones wait for it, so a cached intermediate is still
  * computed once.
  */
object Par {
  /** Execute the thunks concurrently; block until all complete.
    * Propagates the first failure (remaining jobs are not cancelled —
    * sink writes are idempotent per path and callers treat any
    * failure as the write having failed). */
  def jobs(thunks: (() => Unit)*): Unit = {
    if (thunks.lengthCompare(1) <= 0) { thunks.foreach(_.apply()); return }
    val pool = java.util.concurrent.Executors.newFixedThreadPool(thunks.size)
    try {
      val futures = thunks.map(t => pool.submit(new Runnable {
        def run(): Unit = t()
      }))
      // get() rethrows the thunk's exception wrapped in ExecutionException
      futures.foreach { f =>
        try f.get()
        catch {
          case e: java.util.concurrent.ExecutionException =>
            throw Option(e.getCause).getOrElse(e)
        }
      }
    } finally pool.shutdown()
  }
}
