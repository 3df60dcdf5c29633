package graft.lake

import org.apache.spark.sql.catalyst.expressions.{And, AttributeReference, EqualTo, Expression, GreaterThan, GreaterThanOrEqual, LessThan, LessThanOrEqual, Literal}
import org.apache.spark.sql.types.{TimestampNTZType, TimestampType}

/** Conservative [lo, hi] epoch-micros bounds a predicate imposes on a
  * named time column — ONLY conjuncts of the shape
  * `ts <cmp> timestamp-literal` contribute; anything else (disjunctions,
  * casts, other columns) is ignored, which can only WIDEN the range, so
  * manifest pruning with these bounds is always an over-approximation
  * and the exact predicate re-applies on top. Shared by the SQL
  * expansion rule's hidden-partitioning pushdown and the COW
  * delete/update discovery scan.
  */
object PredicateBounds {

  def timeBounds(cond: Expression, timeCol: String): (Option[Long], Option[Long]) = {
    def micros(l: Literal): Option[Long] = l.dataType match {
      case TimestampType | TimestampNTZType => Some(l.value.asInstanceOf[Long])
      case _ => None
    }
    // resolved attributes only: both callers analyze the condition
    // first (the expansion rule is post-resolution; the COW discovery
    // resolves against a schema probe) — a name-suffix match on
    // unresolved attributes could bind a QUALIFIED other-relation
    // column and narrow the range incorrectly
    def isTime(e: Expression): Boolean = e match {
      case a: AttributeReference => a.name == timeCol
      case _ => false
    }
    def conjuncts(e: Expression): Seq[Expression] = e match {
      case And(l, r) => conjuncts(l) ++ conjuncts(r)
      case other => Seq(other)
    }
    var lo: Option[Long] = None
    var hi: Option[Long] = None
    def tightenLo(v: Long): Unit = lo = Some(lo.fold(v)(math.max(_, v)))
    def tightenHi(v: Long): Unit = hi = Some(hi.fold(v)(math.min(_, v)))
    conjuncts(cond).foreach {
      case GreaterThanOrEqual(t, l: Literal) if isTime(t) => micros(l).foreach(tightenLo)
      case GreaterThan(t, l: Literal) if isTime(t) => micros(l).foreach(v => tightenLo(v + 1))
      case LessThanOrEqual(t, l: Literal) if isTime(t) => micros(l).foreach(tightenHi)
      case LessThan(t, l: Literal) if isTime(t) => micros(l).foreach(v => tightenHi(v - 1))
      case EqualTo(t, l: Literal) if isTime(t) =>
        micros(l).foreach { v => tightenLo(v); tightenHi(v) }
      case GreaterThanOrEqual(l: Literal, t) if isTime(t) => micros(l).foreach(tightenHi)
      case GreaterThan(l: Literal, t) if isTime(t) => micros(l).foreach(v => tightenHi(v - 1))
      case LessThanOrEqual(l: Literal, t) if isTime(t) => micros(l).foreach(tightenLo)
      case LessThan(l: Literal, t) if isTime(t) => micros(l).foreach(v => tightenLo(v + 1))
      case EqualTo(l: Literal, t) if isTime(t) =>
        micros(l).foreach { v => tightenLo(v); tightenHi(v) }
      case _ => ()
    }
    (lo, hi)
  }
}
