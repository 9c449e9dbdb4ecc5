package graft

import org.scalatest.funsuite.AnyFunSuite

/** The shared sub-fit pool is actually BOUNDED: a mass-overflow round
  * (thousands of queued sub-fits) must degrade to a queue of at most
  * [[graft.operators.FitPool.Size]] in-flight tasks, never a driver
  * flood. Exercised at 2048 concurrent submissions — the ≥10³ shape a
  * hot-keyed ingest can produce.
  */
class FitPoolSpec extends AnyFunSuite {

  test("2048 queued tasks: high-water concurrency stays at the bound") {
    import graft.operators.FitPool
    import scala.concurrent.{Await, Future}
    import scala.concurrent.duration._
    import java.util.concurrent.atomic.AtomicInteger
    import FitPool.ec

    val inFlight = new AtomicInteger(0)
    val highWater = new AtomicInteger(0)
    val done = new AtomicInteger(0)
    val fs = (1 to 2048).map { i =>
      Future {
        val n = inFlight.incrementAndGet()
        highWater.accumulateAndGet(n, math.max _)
        // long enough that a burst would overlap if unbounded
        Thread.sleep(1)
        inFlight.decrementAndGet()
        done.incrementAndGet()
        i
      }
    }
    val out = Await.result(Future.sequence(fs), 120.seconds)
    assert(done.get() == 2048, "every queued task must complete")
    assert(out.sum == (1 to 2048).sum, "results must all arrive")
    assert(highWater.get() <= FitPool.Size,
      s"in-flight high water ${highWater.get()} exceeded the bound " +
        s"${FitPool.Size} — the pool is not bounded")
    assert(highWater.get() >= math.min(2, FitPool.Size),
      "the pool must actually run tasks concurrently")
  }

  test("sample budget bounds AGGREGATE in-flight fit memory") {
    import graft.operators.FitPool
    import scala.concurrent.{Await, Future}
    import scala.concurrent.duration._
    import java.util.concurrent.atomic.AtomicInteger
    import FitPool.ec

    // each claim takes just over half the budget: the thread pool
    // alone would run Size of these at once, the memory gate must
    // serialize them to exactly one holder at a time
    val overHalf = ((FitPool.SampleBudgetMb.toLong / 2) + 1) << 20
    val holding = new AtomicInteger(0)
    val highWater = new AtomicInteger(0)
    val fs = (1 to 8).map { _ =>
      Future {
        FitPool.withSampleBudget(overHalf) {
          val n = holding.incrementAndGet()
          highWater.accumulateAndGet(n, math.max _)
          Thread.sleep(5)
          holding.decrementAndGet()
        }
      }
    }
    Await.result(Future.sequence(fs), 60.seconds)
    assert(highWater.get() == 1,
      s"two over-half-budget fits held samples concurrently " +
        s"(high water ${highWater.get()}) — the aggregate bound leaks")

    // a single fit larger than the whole budget clamps instead of
    // deadlocking: it runs (alone), it does not wait forever
    val out = Await.result(
      Future(FitPool.withSampleBudget(
        FitPool.SampleBudgetMb.toLong << 22)(42)), 60.seconds)
    assert(out == 42)
  }
}
