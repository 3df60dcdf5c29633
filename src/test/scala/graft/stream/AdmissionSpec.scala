package graft.stream

import graft.lake.DataFile
import org.scalatest.funsuite.AnyFunSuite

/** The admission-control budget arithmetic (round 18, VERDICT r17 #2):
  * greedy prefixes, progress guarantees, option parsing.
  */
class AdmissionSpec extends AnyFunSuite {
  import Admission._

  private def f(i: Int, bytes: Long): DataFile =
    DataFile(s"data/part-$i.parquet", 10L, None, None, bytes = Some(bytes))

  test("admitFiles: greedy file-count prefix, always at least one file") {
    val files = (0 until 7).map(f(_, 100L))
    assert(admitFiles(files, 0, Caps(Some(3L), None)) == 3)
    assert(admitFiles(files, 3, Caps(Some(3L), None)) == 6)
    assert(admitFiles(files, 6, Caps(Some(3L), None)) == 7)
    // unlimited: the whole list in one chunk
    assert(admitFiles(files, 0, Caps.Unlimited) == 7)
    // a cap of 1 advances exactly one file per call
    assert(admitFiles(files, 4, Caps(Some(1L), None)) == 5)
  }

  test("admitFiles: byte budget, over-cap single file still ships alone") {
    val files = Seq(f(0, 400L), f(1, 400L), f(2, 5000L), f(3, 100L))
    // 400+400 fits 1000, file 2 would blow it
    assert(admitFiles(files, 0, Caps(None, Some(1000L))) == 2)
    // file 2 alone exceeds the cap — progress guarantee ships it solo
    assert(admitFiles(files, 2, Caps(None, Some(1000L))) == 3)
    assert(admitFiles(files, 3, Caps(None, Some(1000L))) == 4)
    // both caps bind: whichever is tighter wins
    assert(admitFiles(files, 0, Caps(Some(1L), Some(1000L))) == 1)
  }

  test("admitFiles: entries without a recorded size count 0 toward bytes") {
    val legacy = Seq(
      DataFile("data/old-0.parquet", 10L, None, None),
      DataFile("data/old-1.parquet", 10L, None, None),
      f(2, 100L))
    // pre-r18 entries are invisible to the byte budget; the file cap
    // still bounds them
    assert(admitFiles(legacy, 0, Caps(None, Some(50L))) == 2)
    assert(admitFiles(legacy, 0, Caps(Some(1L), Some(50L))) == 1)
  }

  test("admitSnapshots: greedy snapshot prefix, at least one") {
    val sizes = Seq((2L, 200L), (2L, 200L), (3L, 300L), (1L, 100L))
    def run(caps: Caps): Int = admitSnapshots(sizes, caps, identity[(Long, Long)])
    assert(run(Caps(Some(4L), None)) == 2)
    assert(run(Caps(Some(7L), None)) == 3)
    assert(run(Caps(None, Some(400L))) == 2)
    assert(run(Caps.Unlimited) == 4)
    // one over-cap commit ships alone rather than stalling
    assert(run(Caps(Some(1L), None)) == 1)
    assert(admitSnapshots(Seq.empty[(Long, Long)], Caps(Some(1L), None),
      identity[(Long, Long)]) == 0)
  }

  test("Caps.fromOptions parses counts, byte suffixes, and refuses junk") {
    val c = Caps.fromOptions(
      Map("maxFilesPerTrigger" -> "100", "maxBytesPerTrigger" -> "2m"),
      "maxFilesPerTrigger", "maxBytesPerTrigger")
    assert(c == Caps(Some(100L), Some(2L << 20)))
    assert(Caps.fromOptions(Map("maxBytesPerTrigger" -> "1g"),
      "maxFilesPerTrigger", "maxBytesPerTrigger") == Caps(None, Some(1L << 30)))
    assert(Caps.fromOptions(Map.empty, "a", "b").unlimited)
    intercept[IllegalArgumentException](
      Caps.fromOptions(Map("a" -> "0"), "a", "b"))
    intercept[IllegalArgumentException](
      Caps.fromOptions(Map("b" -> "lots"), "a", "b"))
    intercept[IllegalArgumentException](
      Caps.fromOptions(Map("b" -> "-5k"), "a", "b"))
  }

  test("GraftTableOffset: json round-trip, legacy form, ordering") {
    assert(GraftTableOffset.parse("42") == GraftTableOffset(42L))
    assert(GraftTableOffset.parse("42#7") == GraftTableOffset(42L, Some(7L)))
    assert(GraftTableOffset(42L, Some(7L)).json == "42#7")
    assert(GraftTableOffset(42L).json == "42")
    intercept[IllegalArgumentException](GraftTableOffset.parse("1#2#3"))
    // within one snapshot the complete image sorts after every chunk
    val ks = Seq(GraftTableOffset(5, Some(1L)), GraftTableOffset(5, Some(9L)),
      GraftTableOffset(5), GraftTableOffset(6, Some(0L)))
      .map(GraftTableOffset.ordKey)
    assert(ks == ks.sorted)
  }
}
