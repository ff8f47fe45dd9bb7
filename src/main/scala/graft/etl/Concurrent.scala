package graft.etl

/** Run INDEPENDENT Spark actions from a small driver-side pool
  * (optimization guide §2.6: actions are only sequential because the
  * driver calls them sequentially — Spark's scheduler happily runs
  * several jobs at once, so the next store write's tasks back-fill the
  * executors a finishing write's commit tail leaves idle).
  *
  * Scope: actions must be independent — no shared sink path, no writer
  * fence between them, no ordering contract. The callers here overlap
  * sibling STORE WRITES fed by one cached upstream (the five reference
  * tables + the document projection; the two bucketed join sides).
  * Per-job time is unchanged; only the dead air between jobs goes.
  * FIFO scheduling (Spark's default) keeps the earlier job's tasks
  * first, which is exactly the back-fill behavior wanted.
  *
  * A few jobs in flight is plenty (enough to hide each job's
  * driver-side commit/plan tail, not so many that tiny local jobs fight
  * for task slots); failures propagate — the first thrown action fails
  * the whole batch, matching the sequential contract. */
object Concurrent {
  def awaitAll(parallelism: Int)(actions: Seq[() => Unit]): Unit = {
    require(parallelism >= 1, "parallelism must be >= 1")
    if (actions.size <= 1 || parallelism == 1) actions.foreach(_.apply())
    else {
      val pool = java.util.concurrent.Executors.newFixedThreadPool(
        math.min(parallelism, actions.size))
      try {
        import scala.jdk.CollectionConverters._
        val tasks = actions.map { a =>
          new java.util.concurrent.Callable[Unit] { def call(): Unit = a() }
        }
        // invokeAll waits for every task; surface the FIRST failure (get
        // rethrows the wrapped cause) so error behavior matches the
        // sequential form
        pool.invokeAll(tasks.asJava).asScala.foreach { f =>
          try f.get()
          catch {
            case e: java.util.concurrent.ExecutionException =>
              throw e.getCause
          }
        }
      } finally { pool.shutdown(); () }
    }
  }
}
