package graft.operators

/** Overlap INDEPENDENT Spark actions inside one operator (guide §2.6:
  * "Overlap independent jobs — Spark's scheduler happily runs several
  * jobs at once inside one application; actions are only sequential
  * because your driver code calls them sequentially").
  *
  * The lifecycle gates run pairs of independent actions back to back —
  * a stored-index probe and its in-memory reference lane, or two
  * staged writes of disjoint outputs. Each such action is a short fan
  * of small tasks that leaves most cores idle on its tail; running the
  * pair concurrently lets the second job's tasks back-fill the first
  * job's stragglers. Results are identical by construction (the two
  * sides share no mutable state — that independence is the caller's
  * contract), and at a LOW core count the scheduler simply interleaves
  * the two jobs FIFO, so scaling measurements stay honest.
  *
  * One extra thread per call (daemon, named, unpooled): these run a
  * handful of times per query, never per row. Exceptions from either
  * side propagate to the caller — the helper unwraps the
  * ExecutionException so failure behavior matches sequential code. */
private[graft] object Par {

  def two[A, B](a: => A, b: => B): (A, B) = {
    val fb = new java.util.concurrent.FutureTask[B](() => b)
    val t = new Thread(fb, "graft-par")
    t.setDaemon(true)
    t.start()
    val ra = a // caller's thread does the first side
    val rb =
      try fb.get()
      catch {
        case e: java.util.concurrent.ExecutionException =>
          throw Option(e.getCause).getOrElse(e)
      }
    (ra, rb)
  }
}
