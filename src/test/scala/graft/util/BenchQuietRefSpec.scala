package graft.util

import org.scalatest.funsuite.AnyFunSuite

/** Per-query quiet-reference attribution (round 18, VERDICT r17 #1 and
  * #7): the pure decision logic `Bench.main` keys on — parse the
  * committed quiet record, normalize a recorded min by the box-factor
  * pair, flag past the band. The synthetic case below is BENCH_r17's
  * exact miss: three queries 1.7-4.8× their quiet minima with every
  * per-sample gate in band and `contended_queries` empty.
  */
class BenchQuietRefSpec extends AnyFunSuite {
  import graft.Bench.{parseQuietRef, quietRatio, QuietRatioFlag, QuietRef}

  test("parseQuietRef reads factor, sf, and per-query mins, refuses junk") {
    val src =
      """{"source_commit":"1447702","sf":"sf0.1","canary_1t_factor":1.151,
        |"queries":{"q_text_span_dedup":2.513,"q_text_bpe":0.578,
        |"q_text_dsir":2.536,"q_scan_filter_project":0.322}}""".stripMargin
    val ref = parseQuietRef(src).get
    assert(ref.canary1tFactor === 1.151)
    // the SF gate: attribution engages only on matching runs
    assert(ref.sf.contains("sf0.1"))
    assert(ref.sf.forall("/root/testdata/sf0.1".endsWith))
    assert(!ref.sf.forall("/root/testdata/sf0.001".endsWith))
    assert(ref.mins === Map(
      "q_text_span_dedup" -> 2.513, "q_text_bpe" -> 0.578,
      "q_text_dsir" -> 2.536, "q_scan_filter_project" -> 0.322))
    // no query entries -> no reference (never flag on an empty map)
    assert(parseQuietRef("""{"canary_1t_factor":1.2}""").isEmpty)
    assert(parseQuietRef("not json at all").isEmpty)
    // a zero min would make every later ratio infinite — dropped
    val z = parseQuietRef(
      """{"canary_1t_factor":1.0,"queries":{"q_a":0.0,"q_b":1.5}}""").get
    assert(z.mins === Map("q_b" -> 1.5))
  }

  test("the committed tools/quiet_queries.json parses and covers the bench set") {
    val ref = graft.Bench.loadQuietRef("tools/quiet_queries.json").get
    assert(ref.canary1tFactor > 1.0 && ref.canary1tFactor < 2.0)
    assert(ref.sf.contains("sf0.1"))
    assert(ref.mins.size >= 30)
    assert(ref.mins.contains("q_text_span_dedup"))
    assert(ref.mins.values.forall(_ > 0.0))
  }

  test("normalization: slower box divides, faster box clamps to raw") {
    // run box 1.5x the band, quiet record taken at 1.0x: expected time
    // scales 1.5x, so a 3x raw excess normalizes to 2x
    assert(math.abs(quietRatio(3.0, 1.0, 1.5, 1.0) - 2.0) < 1e-9)
    // run box FASTER than the quiet record's box: correction clamps at
    // 1.0 — compare raw, never deflate the denominator
    assert(math.abs(quietRatio(3.0, 1.0, 1.0, 1.3) - 3.0) < 1e-9)
  }

  test("BENCH_r17-shaped contended record flags span_dedup and bpe, quiet run flags zero") {
    val ref = QuietRef(1.151, Map(
      "q_text_span_dedup" -> 2.513, "q_text_bpe" -> 0.578,
      "q_text_dsir" -> 2.536, "q_text_curation_full" -> 10.13,
      "q_scan_filter_project" -> 0.322))
    // driver BENCH_r17 recorded mins (contended run, canary factor ~1.2)
    val contendedRun = Map(
      "q_text_span_dedup" -> 10.38, "q_text_bpe" -> 2.78,
      "q_text_dsir" -> 4.31, "q_text_curation_full" -> 10.5,
      "q_scan_filter_project" -> 0.35)
    val runFactor = 1.2
    val flagged = contendedRun.collect {
      case (n, v) if ref.mins.contains(n) &&
        quietRatio(v, ref.mins(n), runFactor, ref.canary1tFactor) >
          QuietRatioFlag => n
    }.toSet
    assert(flagged.contains("q_text_span_dedup")) // 4.0x normalized
    assert(flagged.contains("q_text_bpe"))        // 4.6x normalized
    assert(!flagged.contains("q_text_curation_full")) // flat — in band
    assert(!flagged.contains("q_scan_filter_project"))
    // q_text_dsir (1.7x raw) sits UNDER the 2x hard band by design —
    // it rides visibly in the quiet_ratio map instead of the flag list
    assert(quietRatio(4.31, 2.536, runFactor, ref.canary1tFactor) < QuietRatioFlag)
    assert(quietRatio(4.31, 2.536, runFactor, ref.canary1tFactor) > 1.5)
    // and the r17 QUIET record itself (the committed 56.9 s run,
    // drift ≤1.37x vs its own reference after factors) flags nothing
    val quietRun = Map(
      "q_text_span_dedup" -> 2.513, "q_text_bpe" -> 0.578,
      "q_text_dsir" -> 2.536, "q_text_curation_full" -> 10.13,
      "q_scan_filter_project" -> 0.322)
    val quietFlags = quietRun.collect {
      case (n, v) if quietRatio(v, ref.mins(n), 1.15, ref.canary1tFactor) >
        QuietRatioFlag => n
    }
    assert(quietFlags.isEmpty)
  }
}
