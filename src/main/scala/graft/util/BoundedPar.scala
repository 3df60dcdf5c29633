package graft.util

import java.util.concurrent.{Callable, ExecutionException, Executors}

/** Bounded-parallel map for DRIVER-side per-file metadata work (parquet
  * footer opens, checksums, staged-file renames). These are I/O-bound
  * round trips that batched ingest otherwise serializes on the driver —
  * at millions of small files a sequential footer loop re-creates the
  * per-file driver bottleneck batched mode exists to kill. NOT for data
  * processing (that belongs in Spark jobs); the cap keeps the driver
  * from opening unbounded connections against an object store.
  */
object BoundedPar {

  /** Order-preserving parallel map over `items` with at most
    * `parallelism` threads. The first failing element's ORIGINAL
    * exception propagates (unwrapped from ExecutionException), so
    * callers' error handling is identical to the sequential loop they
    * replaced. Serial fast-path for 0/1 items — no pool churn on the
    * common single-file append.
    */
  def map[A, B](items: Seq[A], parallelism: Int = 16)(f: A => B): Seq[B] =
    if (items.lengthCompare(1) <= 0) items.map(f)
    else {
      val pool = Executors.newFixedThreadPool(math.min(parallelism, items.size))
      try {
        val futures = items.map(a => pool.submit(new Callable[B] { def call(): B = f(a) }))
        futures.map { fut =>
          try fut.get()
          catch { case e: ExecutionException => throw e.getCause }
        }
      } finally pool.shutdownNow()
    }
}
