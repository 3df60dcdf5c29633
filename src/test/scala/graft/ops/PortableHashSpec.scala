package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Pins the portable polynomial hash to its documented constants — the
  * DuckDB oracles for q_text_minhash_portable / q_text_simhash_portable
  * re-derive the same fold, so a drift here silently breaks the
  * cross-engine hash agreement.
  */
class PortableHashSpec extends SparkSpec {
  import spark.implicits._

  test("polyHash matches the hand-computed fold (base 31 mod 1e9+7)") {
    val got = Seq("abc", "", "hello world")
      .toDF("s")
      .select(DedupOps.polyHash(col("s")).as("h"))
      .as[Long].collect().toSeq
    // "abc": ((0*31+97)*31+98)*31+99 = 96354 (verified against DuckDB's
    // list_reduce on the same chars); "" folds nothing -> 0
    assert(got === Seq(96354L, 0L, 204910434L))
  }

  test("native poly_hash agrees with its HOF specification") {
    val samples = Seq("abc", "", "hello world", "Ünïcödé BMP", "a b  c", "123!@#")
    val both = samples.toDF("s")
      .select(
        DedupOps.polyHash(col("s")).as("native"),
        DedupOps.polyHashHof(col("s")).as("hof"))
      .as[(Long, Long)].collect()
    both.zip(samples).foreach { case ((n, h), s) => assert(n === h, s"input '$s'") }
  }

  test("poly_gram_hashes is bit-equal to hashing concat_ws grams, nulls included") {
    val cases: Seq[Seq[String]] = Seq(
      Seq("a", "b", "c", "d"),
      Seq("a", null, "b"),          // null skips char AND separator slot
      Seq(null, null, null),
      Seq("hello", "wörld", "x"),
      Seq("a", "b"),                // shorter than k -> empty output
      Nil)
    val df = cases.toDF("toks")
    val native = df.select(
      graft.functions.PolyGramHashes(col("toks"), 3).as("gs"))
      .as[Seq[Long]].collect().toSeq
    val viaStrings = df.select(
      when(size(col("toks")) >= 3,
        transform(
          sequence(lit(0), size(col("toks")) - 3),
          i => DedupOps.polyHash(concat_ws(" ",
            element_at(col("toks"), i + 1),
            element_at(col("toks"), i + 2),
            element_at(col("toks"), i + 3)))))
        .otherwise(array().cast("array<bigint>")).as("gs"))
      .as[Seq[Long]].collect().toSeq
    cases.indices.foreach { i =>
      assert(native(i) == viaStrings(i), s"case $i: ${cases(i)}")
    }
  }

  test("saltedJoin rejects join types that would duplicate small-side rows") {
    val big = Seq((1, "x")).toDF("k", "v")
    val small = Seq((1, "y")).toDF("k", "w")
    val e = intercept[IllegalArgumentException] {
      Skew.saltedJoin(big, small, Seq("k"), saltFactor = 4, joinType = "full_outer")
    }
    assert(e.getMessage.contains("inner/left"))
    // inner and left variants stay accepted
    assert(Skew.saltedJoin(big, small, Seq("k"), 4, "left_outer").count() === 1L)
    assert(Skew.saltedJoin(big, small, Seq("k"), 4, "left_anti").count() === 0L)
  }
}
