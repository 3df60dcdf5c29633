package graft.ops

import org.scalacheck.{Gen, Properties}
import org.scalacheck.Prop.forAll

/** Property tests for the BPE trainer + codec, driver-side (no Spark
  * session needed): reconstruction is byte-exact and deterministic for
  * ANY corpus and merge budget, not just the fixtures.
  */
object BpePropertySpec extends Properties("Bpe") {

  private val word: Gen[String] = for {
    n <- Gen.choose(1, 12)
    cs <- Gen.listOfN(n, Gen.frequency(
      8 -> Gen.alphaLowerChar.map(_.toString),
      1 -> Gen.oneOf("ä", "ß", "é", "中", "文"),
      1 -> Gen.const("😀"))) // astral-plane: two UTF-16 chars, one codepoint
  } yield cs.mkString

  private val corpus: Gen[Array[(String, Long)]] = for {
    n <- Gen.choose(1, 40)
    ws <- Gen.listOfN(n, word)
    cnts <- Gen.listOfN(n, Gen.choose(1L, 50L))
  } yield ws.zip(cnts).toMap.toArray.sortBy(_._1)

  property("encode reconstructs every word byte-exactly") =
    forAll(corpus, Gen.choose(0, 60)) { (types, budget) =>
      val merges = BpeTokenizer.learnFromWordCounts(types, budget)
      val codec = new graft.functions.BpeCodec(
        merges.map { case (l, r) => Array(l, r) }.toArray)
      types.forall { case (w, _) =>
        codec.encodeWord(w).map(_.toString).mkString == w
      }
    }

  property("learning is deterministic and respects the budget") =
    forAll(corpus, Gen.choose(0, 60)) { (types, budget) =>
      val a = BpeTokenizer.learnFromWordCounts(types, budget)
      val b = BpeTokenizer.learnFromWordCounts(types.reverse.reverse, budget)
      a == b && a.size <= budget
    }

  property("every learned merge pair was adjacent in some word") =
    forAll(corpus) { types =>
      val merges = BpeTokenizer.learnFromWordCounts(types, 30)
      // each merged unit must appear as a substring of at least one word
      merges.forall { case (l, r) => types.exists(_._1.contains(l + r)) }
    }
}
