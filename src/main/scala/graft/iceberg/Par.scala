package graft.iceberg

/** Driver-side parallelism for independent metadata I/O and job
  * submission: scan planning opens many KB-scale manifests and
  * maintenance submits many independent rewrite jobs — both are
  * latency-bound, not CPU-bound, so wall-clock should track the slowest
  * item, not the item count. At 10⁴–10⁶ manifests a serial planning loop
  * is minutes of driver I/O before the first task launches; a bounded
  * pool keeps planning proportional to (items / slots) round trips.
  * Results keep `items` order; the pool dies with the call. */
private[graft] object Par {

  def inParallel[A, B](items: Seq[A], slots: Int = 16)(f: A => B): Seq[B] =
    if (items.size <= 1) items.map(f)
    else {
      val pool = java.util.concurrent.Executors.newFixedThreadPool(
        math.min(slots, items.size))
      implicit val ec: scala.concurrent.ExecutionContext =
        scala.concurrent.ExecutionContext.fromExecutorService(pool)
      try scala.concurrent.Await.result(
        scala.concurrent.Future.sequence(items.map(i => scala.concurrent.Future(f(i)))),
        scala.concurrent.duration.Duration.Inf)
      finally pool.shutdown()
    }
}
