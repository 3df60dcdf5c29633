package graft.util

/** Scoped log-level suppression for EXPECTED warnings. One user today:
  * releasing a locally-checkpointed RDD makes Spark warn "lineage has
  * been truncated and cannot be recomputed after unpersisting" — which
  * is precisely the point of the release (the blocks are superseded,
  * nothing will recompute them; argued and spec-asserted at the call
  * sites), but dozens of them per run read as data loss to an operator
  * scanning the logs (VERDICT r6 #7). Level is restored on exit;
  * no-ops gracefully if log4j2 isn't the active backend.
  */
object QuietLogs {

  // serializes overlapping quietly() scopes: log4j2 config is
  // process-global, so an unsynchronized second caller would capture
  // the first caller's clamped ERROR as "previous" and restore it
  // permanently. The lock also means the clamp window covers another
  // thread's unrelated warnings — accepted and documented: scopes are
  // microseconds (an unpersist call), and the clamped package logs
  // nothing actionable at WARN besides the expected message.
  private val lock = new Object

  /** Run `body` with `loggerName` (a logger or package) clamped to
    * ERROR, restoring the previous effective level afterwards.
    * Process-global and serialized; keep scopes tight.
    */
  def quietly[T](loggerName: String)(body: => T): T = lock.synchronized {
    val restore: Option[() => Unit] =
      try {
        val prev = org.apache.logging.log4j.LogManager.getLogger(loggerName).getLevel
        org.apache.logging.log4j.core.config.Configurator.setLevel(
          loggerName, org.apache.logging.log4j.Level.ERROR)
        Some(() => org.apache.logging.log4j.core.config.Configurator.setLevel(loggerName, prev))
      } catch {
        case _: LinkageError => None // not the log4j2 backend: nothing to clamp
        case scala.util.control.NonFatal(_) => None
      }
    try body finally restore.foreach(_.apply())
  }

  /** The package whose loggers carry the expected-unpersist warning
    * (RDD subclasses log under their own class names).
    */
  val SparkRddPackage = "org.apache.spark.rdd"
}
