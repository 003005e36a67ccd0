package graft.pipeline

/** Overlap INDEPENDENT eager materializations (guide §2.6: Spark's scheduler
  * happily runs several jobs at once inside one application — actions are only
  * sequential because driver code calls them sequentially). The card
  * composites build multiple independent arms whose internal collect /
  * emptiness-probe / checkpoint points otherwise serialize on the driver;
  * running each arm's CONSTRUCTION in its own thread lets the later arm's
  * jobs back-fill executors freed by the earlier arm's tail. Results are
  * unchanged: each arm's plan is deterministic and thread-confined — only the
  * job-submission interleaving moves.
  *
  * A small fixed pool per call site (the guide's "2-3 jobs in flight is
  * plenty"); exceptions propagate to the caller like the sequential form.
  */
private[graft] object Par {
  def join2[A, B](a: => A, b: => B): (A, B) = {
    val fb = pooled(() => b)
    val ra = a
    (ra, await(fb))
  }

  def join3[A, B, C](a: => A, b: => B, c: => C): (A, B, C) = {
    val fb = pooled(() => b)
    val fc = pooled(() => c)
    val ra = a
    (ra, await(fb), await(fc))
  }

  /** Run every thunk concurrently (the caller's thread takes the first). */
  def seq[A](thunks: Seq[() => A]): Seq[A] = thunks match {
    case Seq() => Seq.empty
    case Seq(one) => Seq(one())
    case head +: tail =>
      val fs = tail.map(t => pooled(t))
      head() +: fs.map(await)
  }

  private def pooled[A](t: () => A): java.util.concurrent.FutureTask[A] = {
    val ft = new java.util.concurrent.FutureTask[A](() => t())
    val th = new Thread(ft, s"graft-par-${ft.hashCode()}")
    th.setDaemon(true)
    th.start()
    ft
  }

  private def await[A](f: java.util.concurrent.FutureTask[A]): A =
    try f.get()
    catch {
      case e: java.util.concurrent.ExecutionException =>
        throw Option(e.getCause).getOrElse(e)
    }
}
