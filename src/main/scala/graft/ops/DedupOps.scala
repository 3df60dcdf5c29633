package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Document-level deduplication suite for training-data pipelines:
  * exact (fingerprint group-by), token-n-gram Jaccard, MinHash+LSH, and
  * SimHash. All stages are DataFrame ops: shingling and signatures are
  * per-row projections (no shuffle); candidate generation shuffles ONLY
  * on (band, signature) keys — the classic LSH trick that replaces the
  * O(n²) all-pairs comparison with equality joins, which is exactly what
  * scales to 100 TB corpora (pairs never materialize unless they collide
  * in a band).
  */
object DedupOps {

  /** Exact dedup: group identical texts by md5 fingerprint; keep the
    * lowest doc id as canonical. One shuffle on the 16-byte fingerprint
    * (never on the full text).
    */
  def exactGroups(docs: DataFrame, idCol: String = "doc_id", textCol: String = "text"): DataFrame =
    docs
      .select(col(idCol), TextAnalysis.fingerprint(col(textCol)).as("fp"))
      .groupBy("fp")
      .agg(min(col(idCol)).as("keep_id"), count(lit(1)).as("n_copies"))

  /** Distinct word-k-gram shingles per document (array column, one
    * projection).
    */
  def shingles(text: Column, k: Int = 3): Column = {
    val toks = TextAnalysis.tokens(text)
    array_distinct(transform(
      TextAnalysis.positions(size(toks) - (k - 1)),
      i => concat_ws(" ", (0 until k).map(j => element_at(toks, i + j)): _*)))
  }

  /** Exact Jaccard over shingle sets for candidate pairs blocked by a
    * key column (same-block pairs only — at scale the blocking key IS
    * the partition key, so the self-join is co-partitioned).
    */
  def ngramJaccardPairs(
      docs: DataFrame,
      blockCol: String,
      idCol: String = "doc_id",
      textCol: String = "text",
      k: Int = 3): DataFrame = {
    val withShingles = docs
      .select(col(blockCol).as("block"), col(idCol).as("id"), shingles(col(textCol), k).as("grams"))
      .filter(size(col("grams")) > 0)
    val a = withShingles.select(col("block"), col("id").as("doc_a"), col("grams").as("grams_a"))
    val b = withShingles.select(col("block"), col("id").as("doc_b"), col("grams").as("grams_b"))
    val inter = size(array_intersect(col("grams_a"), col("grams_b"))).cast(LongType)
    val union = (size(col("grams_a")) + size(col("grams_b"))).cast(LongType) - inter
    a.join(b, Seq("block"))
      .filter(col("doc_a") < col("doc_b"))
      .select(
        col("doc_a"), col("doc_b"),
        inter.as("n_common"),
        union.as("n_union"),
        round(inter.cast(DoubleType) / union.cast(DoubleType), 4).as("jaccard"))
  }

  /** MinHash signatures: `numHashes` permutations approximated by
    * murmur3 with distinct seeds (hash(shingle, i) — the extra literal
    * column acts as the seed). One explode + one groupBy(doc) with
    * numHashes `min` partial aggregates: map-side combine keeps the
    * shuffle at |docs| rows.
    */
  def minHashSignatures(
      docs: DataFrame,
      idCol: String = "doc_id",
      textCol: String = "text",
      numHashes: Int = 32,
      shingleK: Int = 3): DataFrame = {
    val exploded = docs
      .select(col(idCol).as("id"), explode(shingles(col(textCol), shingleK)).as("gram"))
    val minCols = (0 until numHashes).map(i => min(hash(col("gram"), lit(i))).as(s"h$i"))
    exploded.groupBy("id").agg(minCols.head, minCols.tail: _*)
  }

  /** LSH banding over a signature frame: (id, band_id, band_sig) rows.
    * Docs sharing any (band_id, band_sig) are candidate duplicates.
    */
  def lshBands(sig: DataFrame, numHashes: Int = 32, bands: Int = 8): DataFrame = {
    require(numHashes % bands == 0, "numHashes must divide into bands")
    val r = numHashes / bands
    val bandStructs = (0 until bands).map { b =>
      struct(lit(b.toLong).as("band_id"),
        hash((b * r until (b + 1) * r).map(i => col(s"h$i")): _*).cast(LongType).as("band_sig"))
    }
    sig.select(col("id"), explode(array(bandStructs: _*)).as("band"))
      .select(col("id"), col("band.band_id").as("band_id"), col("band.band_sig").as("band_sig"))
  }

  /** Candidate pairs from LSH bands: equality self-join on
    * (band_id, band_sig) — the only shuffle of the pipeline — then
    * distinct pairs.
    */
  def minHashCandidates(bandsDf: DataFrame): DataFrame = {
    val a = bandsDf.select(col("band_id"), col("band_sig"), col("id").as("doc_a"))
    val b = bandsDf.select(col("band_id"), col("band_sig"), col("id").as("doc_b"))
    a.join(b, Seq("band_id", "band_sig"))
      .filter(col("doc_a") < col("doc_b"))
      .select("doc_a", "doc_b")
      .distinct()
  }

  /** Full MinHash-LSH near-dup pipeline: signatures → bands → candidate
    * pairs → exact-Jaccard verification ≥ threshold.
    */
  def minHashNearDups(
      docs: DataFrame,
      idCol: String = "doc_id",
      textCol: String = "text",
      numHashes: Int = 32,
      bands: Int = 8,
      shingleK: Int = 3,
      threshold: Double = 0.5): DataFrame = {
    val cands = minHashCandidates(
      lshBands(minHashSignatures(docs, idCol, textCol, numHashes, shingleK), numHashes, bands))
    val grams = docs.select(col(idCol).as("id"), shingles(col(textCol), shingleK).as("grams"))
    val ga = grams.select(col("id").as("doc_a"), col("grams").as("grams_a"))
    val gb = grams.select(col("id").as("doc_b"), col("grams").as("grams_b"))
    val inter = size(array_intersect(col("grams_a"), col("grams_b"))).cast(LongType)
    val union = (size(col("grams_a")) + size(col("grams_b"))).cast(LongType) - inter
    cands
      .join(ga, Seq("doc_a"))
      .join(gb, Seq("doc_b"))
      .select(col("doc_a"), col("doc_b"),
        round(inter.cast(DoubleType) / union.cast(DoubleType), 4).as("jaccard"))
      .filter(col("jaccard") >= threshold)
  }

  /** 64-bit SimHash over token hashes: per token compute xxhash64, then
    * for each bit position vote +1/−1 weighted by term frequency; the
    * sign vector packs into one long. Pure HOF arithmetic — the 64-way
    * bit loop runs as an array fold inside codegen, no UDF.
    */
  def simHash(text: Column): Column = {
    val tokenHashes = transform(TextAnalysis.tokens(text), t => xxhash64(t))
    // shiftright/shiftleft with a Column bit count need call_function —
    // the Scala DSL overloads only take literal Ints
    val votes = transform(
      sequence(lit(0), lit(63)),
      bit => aggregate(
        tokenHashes,
        lit(0L),
        (acc, h) => acc + when(
          call_function("shiftright", h, bit.cast(IntegerType)).bitwiseAND(1L) === 1L,
          1L).otherwise(-1L)))
    aggregate(
      sequence(lit(0), lit(63)),
      lit(0L),
      (acc, bit) => acc + when(
        element_at(votes, bit + 1) > 0L,
        call_function("shiftleft", lit(1L), bit.cast(IntegerType))).otherwise(0L))
  }

  /** Hamming distance between two simhashes (bit_count of xor). */
  def hammingDist(a: Column, b: Column): Column = bit_count(a.bitwiseXOR(b))
}
