package graft.ext

/** Fan independent store commits out as concurrent Spark jobs — the
  * documented x217/x242 orchestrator shape (guide §2.6: actions are only
  * sequential because driver code calls them sequentially; concurrent
  * jobs back-fill the tail of each other's stages).
  *
  * ONLY for steps with no commit-order contract between them: disjoint
  * tables (DedupStores' fp/idx pair, DataCard's four subtotal tables)
  * whose replay converges from any interleaving — never for fenced
  * sequences (ViewStore's correction→view→base order, hh totals→summary)
  * where a crash-window spec pins the order.
  */
private[graft] object Par {
  def all(steps: (() => Unit)*): Unit = {
    import scala.concurrent.{Await, Future}
    import scala.concurrent.ExecutionContext.Implicits.global
    Await.result(
      Future.sequence(steps.map(st => Future(st()))),
      scala.concurrent.duration.Duration(20, "min"))
    ()
  }
}
