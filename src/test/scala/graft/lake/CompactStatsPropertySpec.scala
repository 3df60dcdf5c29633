package graft.lake

import org.scalacheck.{Gen, Properties}
import org.scalacheck.Prop.forAll

/** Property tests for the compact ordinal stats codec (round 15,
  * [[SnapshotLog.encodeSv]]/[[SnapshotLog.decodeSv]]), driver-side (no
  * Spark session): any combination of long bounds, string bounds (any
  * unicode content, including the codec's own delimiters and absent
  * upper bounds), and null counts round-trips losslessly against any
  * header, for any file — the manifest reader must recover exactly the
  * facts the writer recorded, or metadata skipping silently degrades.
  */
object CompactStatsPropertySpec extends Properties("CompactStats") {

  private val boundString: Gen[String] = for {
    n <- Gen.choose(0, 20)
    cs <- Gen.listOfN(n, Gen.frequency(
      6 -> Gen.alphaNumChar.map(_.toString),
      2 -> Gen.oneOf(":", ";", ",", "*", "\n", "\u0000", "\\", "\""),
      1 -> Gen.oneOf("ä", "中", "￿"),
      1 -> Gen.const(new String(Character.toChars(0x1F600)))))
  } yield cs.mkString

  /** One column's recorded facts: optional bounds (long or string) +
    * optional null count.
    */
  private val boundDouble: Gen[Double] = Gen.frequency(
    4 -> Gen.choose(-1.0e9, 1.0e9),
    1 -> Gen.oneOf(0.0, -0.0, 1.0E-300, -2.75, 0.30000000000000004,
      Double.MinPositiveValue, Double.MaxValue,
      Double.PositiveInfinity, Double.NegativeInfinity))

  private val colFacts: Gen[(Option[ColumnBounds], Option[Long], Option[Long])] = for {
    kind <- Gen.choose(0, 4)
    lo <- Gen.choose(Long.MinValue / 2, Long.MaxValue / 2)
    span <- Gen.choose(0L, 1000000L)
    s1 <- boundString
    s2 <- boundString
    d1 <- boundDouble
    d2 <- boundDouble
    hasMax <- Gen.oneOf(true, false)
    nulls <- Gen.option(Gen.choose(0L, 100L))
    // round-16 markers: double provenance, per-side string exactness,
    // and a per-file sum (representable only alongside a null count —
    // the generator mirrors the writer's invariant)
    proven <- Gen.oneOf(true, false)
    minEx <- Gen.oneOf(true, false)
    maxEx <- Gen.oneOf(true, false)
    sumV <- Gen.option(Gen.choose(Long.MinValue / 4, Long.MaxValue / 4))
  } yield kind match {
    case 0 => (None, nulls, nulls.flatMap(_ => sumV)) // nothing or nulls-only(+sum)
    case 1 => (Some(ColumnBounds("", lo, lo + span)), nulls,
      nulls.flatMap(_ => sumV))
    case 4 =>
      // doubles as footerInfo records them: exact pair + derived
      // floor/ceil-widened longs (what decode rebuilds); provenance
      // marker rides the kind letter
      val (dn, dx) = if (d1 <= d2) (d1, d2) else (d2, d1)
      (Some(ColumnBounds("", math.floor(dn).toLong, math.ceil(dx).toLong,
        minD = Some(dn), maxD = Some(dx),
        dPv = if (proven) Some(true) else None)), nulls, None)
    case _ =>
      val (mn, mx) =
        if (ColumnBounds.cpCompare(s1, s2) <= 0) (s1, s2) else (s2, s1)
      (Some(ColumnBounds("", 0L, 0L,
        minS = Some(mn), maxS = if (hasMax) Some(mx) else None,
        minSE = if (minEx) Some(true) else None,
        maxSE = if (maxEx && hasMax) Some(true) else None)), nulls, None)
  }

  private val headerAndFile: Gen[(Seq[String], DataFile)] = for {
    n <- Gen.choose(1, 5)
    facts <- Gen.listOfN(n, colFacts)
  } yield {
    val cols = (0 until n).map(i => s"c$i")
    val bounds = cols.zip(facts).collect {
      case (c, (Some(b), _, _)) => b.copy(column = c)
    }
    val nulls = cols.zip(facts).collect {
      case (c, (_, Some(x), _)) => c -> x
    }.toMap
    val sums = cols.zip(facts).collect {
      case (c, (_, _, Some(s))) => c -> s
    }.toMap
    val f = DataFile("data/p.parquet", 100L, Some(0L), Some(9L),
      extraBounds = if (bounds.isEmpty) None else Some(bounds),
      colNulls = if (nulls.isEmpty) None else Some(nulls),
      colSums = if (sums.isEmpty) None else Some(sums))
    (cols, f)
  }

  property("encode/decode round-trips bounds and null counts exactly") =
    forAll(headerAndFile) { case (cols, f) =>
      SnapshotLog.encodeSv(cols, f) match {
        case None =>
          // encodable to nothing ⇔ nothing was recorded
          f.extraBounds.isEmpty && f.colNulls.isEmpty
        case Some(sv) =>
          val (bounds, nulls, sums) = SnapshotLog.decodeSv(cols, sv)
          val origBounds = f.extraBounds.getOrElse(Nil).sortBy(_.column)
          val gotBounds = bounds.getOrElse(Nil).sortBy(_.column)
          gotBounds == origBounds && nulls == f.colNulls &&
            sums == f.colSums &&
            // grammar safety: the stored string never collides with the
            // group/field delimiters beyond its own structure
            sv.split(";", -1).length == cols.length
      }
    }

  property("decode tolerates a header longer than the stored groups") =
    forAll(headerAndFile) { case (cols, f) =>
      // a manifest written under fewer stats columns than a later
      // reader's header expects must not throw (additive evolution)
      SnapshotLog.encodeSv(cols, f) match {
        case Some(sv) =>
          val (bounds, _, _) = SnapshotLog.decodeSv(cols :+ "extra", sv)
          bounds.getOrElse(Nil).forall(_.column != "extra")
        case None => true
      }
    }
}
