package graft.operators

import java.util.concurrent.{Executors, ThreadFactory}
import java.util.concurrent.atomic.AtomicInteger
import scala.concurrent.ExecutionContext

/** The ONE bounded driver-side pool for concurrent k-means sub-fits —
  * shared by [[IvfIndex.buildTwoLevel]], the build's oversized-leaf
  * split rounds, and
  * [[graft.streaming.IndexMaintenance.rebalanceOverflow]].
  *
  * Why bounded and shared: each sub-fit is a BLOCKING Spark action
  * (sample-collect + Lloyd's iterations), so a Future per leaf on the
  * global ForkJoinPool turns a mass-overflow round — 10³+ overflowed
  * leaves after a hot-keyed ingest — into 10³ simultaneous Spark jobs
  * from one driver: scheduler contention, task-set starvation, and an
  * unbounded queue of managed-blocker threads. A fixed pool of one
  * thread per core (capped at 64 — see [[Size]] for the measured
  * sizing) keeps exactly that many jobs in flight and turns the rest
  * into a FIFO queue — the round degrades to a queue, never a driver
  * flood. One pool across both build and maintenance paths means a
  * build racing a rebalance shares the same bound instead of
  * doubling it.
  *
  * The thread bound alone does not bound MEMORY: each local fit
  * collects its sample to the driver, so Size concurrent fits of
  * 100k high-dim vectors could hold tens of GB of samples at once.
  * [[withSampleBudget]] adds the aggregate-bytes bound: a fit
  * acquires its estimated sample footprint from a shared budget
  * (driver heap / 4) before collecting and releases it after, so
  * mass-overflow rounds degrade to a (memory-)queue too.
  *
  * Threads are daemons: an exiting driver never hangs on the pool.
  */
private[graft] object FitPool {

  /** One in-flight fit per core, capped at 64. MEASURED, not guessed:
    * at 2× cores (64 threads on the local[32] box) the 12 288-leaf
    * two-level build's ~111 sub-fits interleave 64 concurrent
    * multi-stage jobs on 32 task slots — per-stage task-binary
    * rebroadcast (3.4 MB each, 18k+ broadcasts observed) and
    * scheduler churn stretched a 399 s build past 25 min. At 1× cores
    * the same build runs in minutes: enough jobs to keep every slot
    * busy, no oversubscription.
    */
  val Size: Int =
    math.min(64, math.max(2, Runtime.getRuntime.availableProcessors()))

  /** Aggregate in-flight fit-sample budget: a quarter of the driver
    * heap (floored at 256 MB so tiny test JVMs still make progress).
    * Granularity is MB — a java Semaphore holds int permits.
    */
  private[graft] val SampleBudgetMb: Int =
    math.max(256L, (Runtime.getRuntime.maxMemory() / 4) >> 20)
      .min(Int.MaxValue.toLong).toInt

  private val sampleBudget =
    new java.util.concurrent.Semaphore(SampleBudgetMb, true)

  /** Run `body` (a sample-collect + fit) holding `estBytes` of the
    * shared sample budget. A single fit larger than the whole budget
    * clamps to it (it runs alone rather than deadlocking); fits that
    * would overflow the aggregate bound WAIT — the 'driver-safe'
    * per-fit bound becomes a driver-safe aggregate bound.
    */
  def withSampleBudget[T](estBytes: Long)(body: => T): T = {
    val mb = math.min(SampleBudgetMb.toLong,
      math.max(1L, estBytes >> 20)).toInt
    sampleBudget.acquire(mb)
    try body finally sampleBudget.release(mb)
  }

  private val counter = new AtomicInteger(0)

  implicit lazy val ec: ExecutionContext =
    ExecutionContext.fromExecutorService(
      Executors.newFixedThreadPool(Size, new ThreadFactory {
        override def newThread(r: Runnable): Thread = {
          val t = new Thread(r, s"graft-fit-${counter.incrementAndGet()}")
          t.setDaemon(true)
          t
        }
      }))
}
