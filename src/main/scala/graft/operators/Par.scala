package graft.operators

/** Driver-side overlap of INDEPENDENT branch construction
  * (spark_optimization_guide §2.6): Spark's scheduler runs several
  * jobs at once inside one application — actions are only sequential
  * because driver code calls them sequentially. A sweep query whose
  * per-config branches each pay a chain of blocking
  * [[Materialize.eager]] jobs serializes idle stage tails
  * back-to-back; building the branches from a small thread pool lets
  * the next branch's tasks back-fill executors freed by the current
  * branch's stragglers.
  *
  * Semantics: `f` must be a pure frame-builder over immutable inputs
  * (every graft branch is — parquet dirs + deterministic plans), so
  * the returned frames are bit-identical to sequential construction;
  * only their materialization JOBS overlap. Results return in input
  * order. The first branch failure is rethrown with its original
  * exception type after every branch settles (no half-built branch
  * left running when the caller unwinds).
  *
  * Scale note: this is DRIVER thread-count, not data parallelism —
  * 2-4 in flight is the guide's recommendation (enough to fill stage
  * tails, not enough to thrash executor memory), independent of
  * cluster size. Jobs submitted from these threads schedule FIFO, so
  * earlier branches keep priority and later ones use leftover slots.
  */
object Par {
  def map[A, B](items: Seq[A], maxConcurrency: Int = 4)(f: A => B): Seq[B] = {
    if (items.size <= 1) return items.map(f)
    val n = math.max(1, math.min(maxConcurrency, items.size))
    val pool = java.util.concurrent.Executors.newFixedThreadPool(n)
    try {
      val futs = items.map { a =>
        pool.submit(new java.util.concurrent.Callable[B] {
          def call(): B = f(a)
        })
      }
      // settle ALL branches before rethrowing: collect results or the
      // first failure, never abandon an in-flight Spark job silently
      val settled = futs.map { fut =>
        try Right(fut.get())
        catch {
          case e: java.util.concurrent.ExecutionException =>
            Left(if (e.getCause != null) e.getCause else e)
          case e: Throwable => Left(e)
        }
      }
      settled.collectFirst { case Left(e) => throw e }
      settled.collect { case Right(b) => b }
    } finally pool.shutdown()
  }

  /** Two independent builder chains, overlapped — for a pipeline whose
    * middle stages fork into parallel branches (e.g. near-dup
    * survivorship vs decontamination in pipeline_corpus_build: both
    * depend only on earlier materialized frames, not on each other). */
  def join2[A, B](fa: => A, fb: => B): (A, B) = {
    val out = map[() => Any, Any](Seq(() => fa, () => fb), 2)(f => f())
    (out(0).asInstanceOf[A], out(1).asInstanceOf[B])
  }
}
