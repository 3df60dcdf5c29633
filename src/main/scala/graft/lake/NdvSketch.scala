package graft.lake

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.util.HyperLogLogPlusPlusHelper
import org.apache.spark.sql.types.DataType

/** Per-file HyperLogLog++ register sketches — the NDV analog of
  * `write.sum-columns` (round 18).
  *
  * The load-bearing fact: Spark's `approx_count_distinct`
  * ([[org.apache.spark.sql.catalyst.expressions.aggregate
  * .HyperLogLogPlusPlus]]) is a PURE FUNCTION of its final register
  * state. Registers combine by per-register max — associative,
  * commutative, idempotent — and Spark's own distributed execution
  * already computes per-partition register arrays and merges them in
  * arbitrary tree order. So a sketch recorded per data file at write
  * time, merged across any subset of files with the SAME helper code
  * Spark's aggregate uses, reproduces the register state a scan of
  * those files would reach — and therefore the scan's estimate,
  * bit-for-bit, in any execution order. (Contrast DataSketches HLL,
  * whose direct-built sketches answer through the HIP estimator — a
  * function of the register-CHANGE history, not the final state — so
  * merged sketches there answer differently than a direct scan.)
  *
  * Everything here delegates to Spark's own
  * [[HyperLogLogPlusPlusHelper]] for update / merge / query, so the
  * equality is by construction, never a re-implementation: the same
  * XxHash64 of the same Catalyst-internal value at the same declared
  * [[DataType]], the same packed 6-bit registers, the same
  * bias-corrected estimator.
  *
  * Encoding: `p:typeTag:base64(words)` — `p` the sketch precision the
  * serving side must match against the query's own helper, `typeTag`
  * the column's `catalogString` AT WRITE TIME (the hash input includes
  * the data type, so a later int→long widen makes old sketches hash-
  * incompatible with the widened scan — the tag mismatch bails serving
  * until compaction re-records), and the register words big-endian.
  * Base64 and `catalogString` for every recordable (atomic) type are
  * colon-free, so the grammar splits unambiguously.
  */
object NdvSketch {

  /** Minimal mutable [[InternalRow]] view over a bare `Array[Long]` —
    * the buffer shape [[HyperLogLogPlusPlusHelper]] reads and writes
    * (`getLong`/`setLong` only). Unboxed on the hot update path.
    */
  private[graft] final class WordsRow(val words: Array[Long]) extends InternalRow {
    override def numFields: Int = words.length
    override def getLong(i: Int): Long = words(i)
    override def setLong(i: Int, v: Long): Unit = words(i) = v
    override def isNullAt(i: Int): Boolean = false
    override def copy(): InternalRow = new WordsRow(words.clone())
    private def no: Nothing =
      throw new UnsupportedOperationException("WordsRow is long-only")
    override def setNullAt(i: Int): Unit = no
    override def update(i: Int, v: Any): Unit = no
    override def getBoolean(i: Int): Boolean = no
    override def getByte(i: Int): Byte = no
    override def getShort(i: Int): Short = no
    override def getInt(i: Int): Int = no
    override def getFloat(i: Int): Float = no
    override def getDouble(i: Int): Double = no
    override def getDecimal(i: Int, p: Int, s: Int) = no
    override def getUTF8String(i: Int) = no
    override def getBinary(i: Int): Array[Byte] = no
    override def getGeography(i: Int) = no
    override def getGeometry(i: Int) = no
    override def getInterval(i: Int) = no
    override def getVariant(i: Int) = no
    override def getStruct(i: Int, n: Int): InternalRow = no
    override def getArray(i: Int) = no
    override def getMap(i: Int) = no
    override def get(i: Int, dt: DataType): AnyRef = no
  }

  /** Helper at exactly precision `p`: Spark derives
    * `p = ceil(2·log₂(1.106/rsd))`, so `rsd = 1.106 / 2^((p−0.5)/2)`
    * lands strictly inside the band that ceils to `p` (the −0.5 keeps
    * floating rounding from tipping into `p+1`).
    */
  def helperFor(p: Int): HyperLogLogPlusPlusHelper =
    new HyperLogLogPlusPlusHelper(1.106 / math.pow(2.0, (p - 0.5) / 2.0))

  /** The supported precision band. 4 is Spark's own floor; 24 (16 M
    * registers, ~10 MB of words) is the ceiling past which a sketch
    * stops being a metadata-sized object — and past ~30 the helper's
    * Int register math would overflow outright, so the band is a
    * correctness fence for user-supplied precisions too.
    */
  val MinP = 4
  val MaxP = 24

  /** The declared sketch rsd for a table's properties — `write.ndv-rsd`
    * (default 0.05, Spark's own `approx_count_distinct` default).
    * Callers that ACCEPT the property must validate through
    * [[declaredP]] (a valid-looking rsd can still demand p > MaxP).
    */
  def declaredRsd(props: Map[String, String]): Double =
    props.get("write.ndv-rsd").flatMap(_.toDoubleOption)
      .filter(r => r > 0.0 && r < 1.0).getOrElse(0.05)

  /** The precision the table's declared rsd records at. */
  def declaredP(props: Map[String, String]): Option[Int] =
    pOf(new HyperLogLogPlusPlusHelper(declaredRsd(props)))

  /** The precision of the 0.05 default — what a bare
    * `approx_count_distinct(c)` asks for.
    */
  lazy val DefaultP: Int = declaredP(Map.empty).get

  /** The serving verdict for one column's fold — ONE implementation of
    * the gate ladder shared by `ndv_coverage`, `ndv_coverage_groups`
    * and (transitively, by construction of the same gates) the serving
    * sites: (servable, estimate when servable, reason naming the first
    * failing gate). Callers prepend context-specific reasons
    * (live_mask, sentinel_dir, missing_dir_level, the empty table).
    */
  private[graft] def verdict(
      merged: Option[String], missing: Int, renamed: Boolean,
      currentTag: Option[String], wantP: Option[Int])
      : (Boolean, Option[Long], String) = {
    val decoded = merged.flatMap(decode)
    val tagOk = currentTag.exists(t => decoded.exists(_._2 == t))
    val pOk = wantP.isDefined && decoded.map(_._1) == wantP
    val servable = !renamed && currentTag.isDefined && tagOk && pOk
    val reason =
      if (renamed || currentTag.isEmpty) "renamed_or_missing_column"
      else if (missing > 0) s"missing_ndv:$missing"
      else if (merged.isEmpty) "mixed_sketches"
      else if (!tagOk) "stale_type"
      else if (!pOk) "precision_mismatch"
      else "ok"
    (servable, if (servable) merged.flatMap(estimate) else None, reason)
  }

  /** Invert a helper back to its precision via the register-word count
    * (m = 2^p is injective in ceil(m/REGISTERS_PER_WORD) for p ≥ 4).
    * The P range mirrors Spark's own validation (4 ≤ p; rsd ≥ minimum
    * keeps p ≤ 24 in practice).
    */
  def pOf(h: HyperLogLogPlusPlusHelper): Option[Int] =
    (MinP to MaxP).find(q => helperFor(q).numWords == h.numWords)

  /** The recordable column types. Atomic, hash-stable, and read back
    * from parquet under an EXPLICIT schema at write time so the
    * recorded hash input is the table-schema-typed value — the same
    * internal value a scan-side aggregate sees. Nested/variant types
    * are refused at declaration.
    */
  def recordableType(dt: DataType): Boolean = dt match {
    case org.apache.spark.sql.types.BooleanType | org.apache.spark.sql.types.ByteType |
         org.apache.spark.sql.types.ShortType | org.apache.spark.sql.types.IntegerType |
         org.apache.spark.sql.types.LongType | org.apache.spark.sql.types.FloatType |
         org.apache.spark.sql.types.DoubleType | org.apache.spark.sql.types.StringType |
         org.apache.spark.sql.types.BinaryType | org.apache.spark.sql.types.DateType |
         org.apache.spark.sql.types.TimestampType |
         org.apache.spark.sql.types.TimestampNTZType => true
    case _: org.apache.spark.sql.types.DecimalType => true
    case _ => false
  }

  def typeTag(dt: DataType): String = dt.catalogString

  def emptyWords(p: Int): Array[Long] = new Array[Long](helperFor(p).numWords)

  private def packWords(words: Array[Long]): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(words.length * 8)
    words.foreach(bb.putLong)
    bb.array()
  }

  private def unpackWords(bytes: Array[Byte]): Array[Long] = {
    require(bytes.length % 8 == 0, "corrupt ndv sketch: length not word-aligned")
    val bb = java.nio.ByteBuffer.wrap(bytes)
    Array.fill(bytes.length / 8)(bb.getLong)
  }

  private[graft] def packedBytesToWords(bytes: Array[Byte]): Array[Long] =
    unpackWords(bytes)

  private[graft] def wordsToPackedBytes(words: Array[Long]): Array[Byte] =
    packWords(words)

  def encode(p: Int, tag: String, words: Array[Long]): String = {
    require(words.length == helperFor(p).numWords,
      s"ndv sketch word count ${words.length} does not match p=$p")
    s"$p:$tag:" + java.util.Base64.getEncoder.encodeToString(packWords(words))
  }

  /** None ⇔ corrupt (a manifest carrying garbage must read as "no
    * sketch", the never-serve direction, not throw planning over).
    */
  def decode(s: String): Option[(Int, String, Array[Long])] = {
    val parts = s.split(":", 3)
    if (parts.length != 3) return None
    for {
      p <- parts(0).toIntOption
      if p >= MinP && p <= MaxP
      bytes <- scala.util.Try(
        java.util.Base64.getDecoder.decode(parts(2))).toOption
      if bytes.length == helperFor(p).numWords * 8
    } yield (p, parts(1), unpackWords(bytes))
  }

  /** Merge encoded sketches — None unless every member decodes to the
    * SAME precision and the SAME write-time type tag (a p or type
    * mismatch means the register states are not unionable: different
    * m, or different hash inputs for equal values).
    */
  def mergeEncoded(encs: Seq[String]): Option[String] = {
    if (encs.isEmpty) return None
    val decoded = encs.map(decode)
    if (decoded.exists(_.isEmpty)) return None
    val all = decoded.flatten
    val (p, tag, _) = all.head
    if (!all.forall(d => d._1 == p && d._2 == tag)) return None
    val h = helperFor(p)
    val acc = new WordsRow(all.head._3.clone())
    all.tail.foreach(d => h.merge(acc, new WordsRow(d._3), 0, 0))
    Some(encode(p, tag, acc.words))
  }

  /** The estimate of one encoded sketch — Spark's own estimator over
    * the merged register state.
    */
  def estimate(enc: String): Option[Long] = decode(enc).map { case (p, _, words) =>
    helperFor(p).query(new WordsRow(words), 0)
  }

  /** The estimate of bare register words at a known precision. */
  def estimateWords(words: Array[Long], p: Int): Long =
    helperFor(p).query(new WordsRow(words), 0)
}
