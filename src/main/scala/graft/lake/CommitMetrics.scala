package graft.lake

import java.util.concurrent.ConcurrentHashMap
import java.util.concurrent.atomic.LongAdder

/** Process-wide, per-table counters for the snapshot-commit tail
  * (manifest write + manifest-list chain + pointer CAS): the metadata
  * cost a 100×-scale adopter of the streaming CDC path asks about
  * first, since it is paid once per micro-batch regardless of batch
  * size. Keyed by table dir so a bench can attribute commit time to
  * the destination while the source keeps committing deltas in the
  * same window. Observability only — two `nanoTime` reads per commit;
  * [[graft.Bench]] resets before and reads after its streaming-CDC
  * measurement to split per-trigger wall time into planning /
  * execution / commit.
  */
object CommitMetrics {
  private final class Cell { val nanos = new LongAdder; val count = new LongAdder }
  private val cells = new ConcurrentHashMap[String, Cell]
  private def cell(key: String): Cell =
    cells.computeIfAbsent(key, _ => new Cell)

  def reset(): Unit = cells.clear()

  private[lake] def timed[A](key: String)(body: => A): A = {
    val t0 = System.nanoTime()
    try body finally {
      val c = cell(key)
      c.nanos.add(System.nanoTime() - t0)
      c.count.add(1L)
    }
  }

  def totalSec(key: String): Double =
    Option(cells.get(key)).map(_.nanos.sum / 1e9).getOrElse(0.0)
  def commits(key: String): Long =
    Option(cells.get(key)).map(_.count.sum).getOrElse(0L)
}
