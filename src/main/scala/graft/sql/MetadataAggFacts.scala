package graft.sql

import org.apache.spark.sql.catalyst.expressions.Literal
import org.apache.spark.sql.types.{StructType, TimestampNTZType, TimestampType}

/** Typed-answer core shared by the TWO metadata-aggregate surfaces —
  * [[GraftRelationExpansion]]'s analysis-time rewrite (SQL text and,
  * since round 16, DataFrame chains over the bare relation) and the
  * DSv2 `SupportsPushDownAggregates` path on [[GraftScanBuilder]]
  * (catalog users without the extension rule). Both serve
  * count/min/max from the SAME [[graft.lake.MetadataAggInfo]] roll-ups
  * with the SAME provable-or-bail typing:
  *
  *   - `count(*)` ⇔ the roll-up row total (the info itself is None —
  *     caller bails — under live merge-on-read masks or missing key
  *     roll-ups… see [[graft.lake.LakehouseTable.metadataAggInfo]]).
  *   - `count(c)` ⇔ rows − complete null roll-up; renamed columns bail
  *     (pre-rename entries roll up under the historical name).
  *   - `min/max(c)` ⇔ exact extremes for the partition-source key and
  *     integral/timestamp stats columns (manifest long encoding →
  *     the column's own literal type), for DOUBLE stats columns from
  *     the exact PROVEN pair only, and for STRING stats columns from
  *     exactness-marked roll-ups only — widened longs and truncated
  *     string bounds are never served as extremes.
  *
  * Answers are Catalyst [[Literal]]s: the rewrite splices them into
  * the plan directly, the DSv2 scan reads `literal.value` as the
  * already-internal row value (UTF8String included — exactness-marked
  * short-string extremes serve through both surfaces).
  */
private[sql] final class MetadataAggFacts(
    val info: graft.lake.MetadataAggInfo,
    meta: graft.lake.TableMetadata) {
  private val schema = StructType.fromDDL(meta.schemaDdl)
  private val keyCol = meta.statsSource

  /** A renamed column's roll-ups may be split across its historical
    * physical names — not provably complete under the current name.
    */
  def renamed(name: String): Boolean = meta.aliasMap.contains(name)

  private def minMaxUs(name: String): Option[(Long, Long)] =
    if (renamed(name)) None
    else if (keyCol.contains(name)) info.keyBoundsUs
    else info.colBounds.get(name)

  /** Manifest long encoding → a literal of the column's own type; None
    * for types whose encoding is widened or truncated (strings; doubles
    * are served from their exact pair in [[extreme]], never from the
    * widened longs) — those must never be served as exact extremes.
    */
  private def exactLiteral(name: String, v: Long): Option[Literal] = {
    if (!schema.fieldNames.contains(name)) return None
    schema(name).dataType match {
      case dt @ (TimestampType | TimestampNTZType) => Some(Literal(v, dt))
      case org.apache.spark.sql.types.LongType => Some(Literal(v))
      case org.apache.spark.sql.types.IntegerType
          if v >= Int.MinValue && v <= Int.MaxValue => Some(Literal(v.toInt))
      case _ => None
    }
  }

  def countStar: Long = info.rows

  /** `count(name)` — None ⇔ not provable. */
  def countCol(name: String): Option[Long] =
    if (info.rows == 0L) Some(0L)
    else if (renamed(name)) None
    else info.colNulls.get(name).map(info.rows - _)

  /** `sum(name)` as a typed literal (round 16, VERDICT r15 #7) — the
    * recorded total is EXACT (per-file decimal sums, each gated to fit
    * a Long, folded as BigInt with the same gate), so under LEGACY
    * arithmetic it equals any scan's answer outright. Under ANSI/TRY
    * (`requireNoOverflowProof`) a scan may additionally THROW/NULL on
    * an INTERMEDIATE overflow even when the total fits — provable-
    * or-bail demands the metadata answer only when that is impossible:
    * a sign-uniform column ([[graft.lake.MetadataAggInfo.colSumSafe]]:
    * every member all-null, empty, or bounded away from the other
    * sign) has monotone partial sums bounded by the recorded total, in
    * every aggregation order. Integral columns only; doubles'
    * summation is order-dependent and never served.
    */
  def sumCol(name: String, requireNoOverflowProof: Boolean): Option[Literal] = {
    if (renamed(name) || !schema.fieldNames.contains(name)) return None
    val integral = schema(name).dataType match {
      case org.apache.spark.sql.types.LongType |
           org.apache.spark.sql.types.IntegerType => true
      case _ => false
    }
    if (!integral) return None
    if (info.rows == 0L)
      return Some(Literal(null, org.apache.spark.sql.types.LongType))
    for {
      s <- info.colSums.get(name)
      n <- info.colNulls.get(name)
      if !requireNoOverflowProof || info.colSumSafe.contains(name)
    } yield
      if (n == info.rows) Literal(null, org.apache.spark.sql.types.LongType)
      else Literal(s)
  }

  /** `min(name)` / `max(name)` as a typed literal — None ⇔ not
    * provable. An empty table's extreme is the typed NULL.
    */
  def extreme(name: String, wantMin: Boolean): Option[Literal] = {
    if (renamed(name) || !schema.fieldNames.contains(name)) return None
    if (info.rows == 0L) return Some(Literal(null, schema(name).dataType))
    schema(name).dataType match {
      case org.apache.spark.sql.types.DoubleType =>
        info.colBoundsD.get(name)
          .map(b => Literal(if (wantMin) b._1 else b._2))
      case org.apache.spark.sql.types.StringType =>
        // round 16: only exactness-marked short-string roll-ups — a
        // truncated manifest bound is never an extreme. A table whose
        // every non-null value is ≤16 code points answers here; one
        // longer (or imported) file bails to the scan. Code-point
        // roll-up order ≡ UTF8_BINARY, the order min/max uses.
        (if (wantMin) info.colMinS.get(name) else info.colMaxS.get(name))
          .map(Literal(_))
      case _ => minMaxUs(name)
        .flatMap(b => exactLiteral(name, if (wantMin) b._1 else b._2))
    }
  }
}
