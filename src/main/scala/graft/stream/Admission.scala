package graft.stream

import graft.lake.DataFile

/** Streaming admission control (round 18, VERDICT r17 #2): the shared
  * budget arithmetic behind `maxFilesPerTrigger` / `maxBytesPerTrigger`
  * on [[GraftTableSource]] and `maxFilesPerBatch` / `maxBytesPerBatch`
  * on [[TableStream]]. Without caps, a consumer attaching to a 100 TB
  * table (or resuming after long downtime) gets the entire backlog as
  * ONE micro-batch on its first trigger — the caps split it into
  * bounded steps while both exactly-once contracts hold unchanged:
  * every admitted unit is still delivered exactly once, only the
  * trigger boundaries move.
  *
  * Two granularities, both greedy-prefix with a progress guarantee:
  *
  *   - [[admitFiles]] walks a single deterministic file list (the
  *     batch-0 image) and returns the chunk end position — at least
  *     one file per trigger, so a single over-cap file still ships
  *     (alone) instead of stalling the query;
  *   - [[admitSnapshots]] walks a pending snapshot chain (the delta
  *     backlog) by per-commit (files, bytes) totals and returns how
  *     many whole snapshots fit — at least one per trigger. Delta
  *     admission is SNAPSHOT-granular: a commit is the atomic unit of
  *     change-feed semantics (its upserts/deletes must land together
  *     for the by-key fold to see a consistent prefix), so one
  *     over-cap commit ships alone rather than split.
  *
  * Byte sizes come from the manifest entries ([[DataFile.bytes]],
  * recorded at write/import time from the footer open the stats pass
  * already pays) — admission never stats a file. Entries without a
  * recorded size (pre-round-18 metadata) count 0 toward the byte
  * budget; the file cap still bounds them.
  */
object Admission {

  final case class Caps(maxFiles: Option[Long], maxBytes: Option[Long]) {
    require(maxFiles.forall(_ > 0L), s"maxFiles cap must be positive, got $maxFiles")
    require(maxBytes.forall(_ > 0L), s"maxBytes cap must be positive, got $maxBytes")
    def unlimited: Boolean = maxFiles.isEmpty && maxBytes.isEmpty
    /** Would a cumulative total of (files, bytes) still fit? */
    def fits(files: Long, bytes: Long): Boolean =
      maxFiles.forall(files <= _) && maxBytes.forall(bytes <= _)
  }

  object Caps {
    val Unlimited: Caps = Caps(None, None)

    /** Parse the two options off a parameter map (key names differ per
      * surface). Values are plain positive longs; bytes additionally
      * accept a k/m/g suffix (binary multiples).
      */
    def fromOptions(
        params: Map[String, String], filesKey: String, bytesKey: String): Caps =
      Caps(
        params.get(filesKey).map(v => parsePositive(filesKey, v, suffixed = false)),
        params.get(bytesKey).map(v => parsePositive(bytesKey, v, suffixed = true)))

    private def parsePositive(key: String, raw: String, suffixed: Boolean): Long = {
      val t = raw.trim.toLowerCase
      val (num, mult) =
        if (!suffixed) (t, 1L)
        else if (t.endsWith("k")) (t.dropRight(1), 1L << 10)
        else if (t.endsWith("m")) (t.dropRight(1), 1L << 20)
        else if (t.endsWith("g")) (t.dropRight(1), 1L << 30)
        else (t, 1L)
      val v =
        try math.multiplyExact(num.toLong, mult)
        catch {
          // ArithmeticException: a suffixed value overflowing Long in
          // multiplyExact must name the option too, not escape raw
          case e @ (_: NumberFormatException | _: ArithmeticException) =>
            throw new IllegalArgumentException(
              s"option '$key' must be a positive long" +
                (if (suffixed) " (k/m/g suffix allowed)" else "") +
                s", got '$raw'", e)
        }
      require(v > 0L, s"option '$key' must be positive, got '$raw'")
      v
    }
  }

  /** Next chunk end over `files` starting at `from`: the largest
    * `until` such that files[from, until) fits the caps — at least
    * `from + 1` (progress guarantee), at most `files.size`.
    */
  def admitFiles(files: Seq[DataFile], from: Int, caps: Caps): Int = {
    var i = from
    var nf = 0L
    var nb = 0L
    while (i < files.size) {
      val f = files(i)
      val nf2 = nf + 1L
      val nb2 = nb + f.bytes.getOrElse(0L)
      if (!caps.fits(nf2, nb2))
        return if (nf == 0L) i + 1 else i
      nf = nf2; nb = nb2; i += 1
    }
    files.size
  }

  /** How many whole snapshots of `pending` (oldest first) fit the
    * caps: the largest prefix whose cumulative per-snapshot (files,
    * bytes) — from `sizeOf` — fits; at least 1 when non-empty.
    */
  def admitSnapshots[A](pending: Seq[A], caps: Caps, sizeOf: A => (Long, Long)): Int = {
    var n = 0
    var nf = 0L
    var nb = 0L
    val it = pending.iterator
    while (it.hasNext) {
      val (f, b) = sizeOf(it.next())
      val nf2 = nf + f
      val nb2 = nb + b
      if (!caps.fits(nf2, nb2))
        return math.max(n, 1)
      nf = nf2; nb = nb2; n += 1
    }
    n
  }
}
