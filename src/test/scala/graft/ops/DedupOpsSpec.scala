package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class DedupOpsSpec extends SparkSpec {
  import spark.implicits._

  private val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")

  /** documents plus a near-duplicate of each doc_id < 10 (one token
    * changed) and an exact duplicate of doc 0, under new ids ≥ 10000.
    */
  private lazy val withPlanted = {
    val near = docs.filter($"doc_id" < 10)
      .select(($"doc_id" + 10000).as("doc_id"),
        concat(substring_index($"text", " ", 10), lit(" zzz "),
          substring($"text", length(substring_index($"text", " ", 11)) + 1, lit(1000000))).as("text"),
        $"lang", $"source", $"n_chars")
    val exact = docs.filter($"doc_id" === 0)
      .select(($"doc_id" + 20000).as("doc_id"), $"text", $"lang", $"source", $"n_chars")
    docs.select("doc_id", "text", "lang", "source", "n_chars")
      .unionByName(near).unionByName(exact)
  }

  test("exactGroups finds the planted exact duplicate") {
    val groups = DedupOps.exactGroups(withPlanted)
    val dups = groups.filter($"n_copies" > 1).collect()
    assert(dups.length == 1)
    assert(dups.head.getAs[Long]("keep_id") == 0L)
    assert(dups.head.getAs[Long]("n_copies") == 2L)
  }

  test("minhash LSH surfaces planted near-duplicates with high jaccard") {
    val pairs = DedupOps.minHashNearDups(withPlanted, threshold = 0.5)
      .collect().map(r => (r.getLong(1).min(r.getLong(0)), r.getLong(0).max(r.getLong(1))))
      .toSet
    // every planted near-dup (i, i+10000) shares ~90% of its shingles;
    // with 8 bands × 4 rows, P(collision) at j=0.65 is ~0.84 per pair —
    // require that most are found (LSH is probabilistic by design)
    val expected = (0L until 10L).map(i => (i, i + 10000L)).toSet
    val found = pairs.intersect(expected)
    assert(found.size >= 7, s"found only ${found.size} of 10 planted pairs: $found")
    // the exact duplicate must always collide in every band
    assert(pairs.contains((0L, 20000L)))
  }

  test("minhash signatures are deterministic across runs") {
    val s1 = DedupOps.minHashSignatures(docs).orderBy("id").collect()
    val s2 = DedupOps.minHashSignatures(docs).orderBy("id").collect()
    assert(s1.sameElements(s2))
  }

  test("simhash: near-identical docs are close in hamming distance, random docs far") {
    val hashed = withPlanted.select($"doc_id", DedupOps.simHash($"text").as("sh"))
    val m = hashed.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val nearDists = (0L until 10L).map(i => java.lang.Long.bitCount(m(i) ^ m(i + 10000)))
    val randomDists = (0L until 10L).map(i => java.lang.Long.bitCount(m(i) ^ m(i + 1)))
    assert(m(0L) == m(20000L)) // exact dup: identical simhash
    assert(nearDists.max < 16, s"near-dup hamming too high: $nearDists")
    assert(randomDists.min > 8, s"random-pair hamming too low: $randomDists")
  }

  test("connectedComponents resolves transitive duplicate groups") {
    val edges = Seq((1L, 2L), (2L, 3L), (10L, 11L), (11L, 10L), (7L, 5L))
      .toDF("doc_a", "doc_b")
    val labels = DedupOps.connectedComponents(edges)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(labels == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 10L -> 10L, 11L -> 10L,
      5L -> 5L, 7L -> 5L))
  }

  test("connectedComponents converges on a long chain") {
    val chain = (0 until 30).map(i => (i.toLong, i + 1L)).toDF("doc_a", "doc_b")
    val labels = DedupOps.connectedComponents(chain, maxIter = 40).collect()
    assert(labels.length == 31)
    assert(labels.forall(_.getLong(1) == 0L))
  }

  test("shingles handle degenerate inputs") {
    val df = Seq((1L, "a b"), (2L, ""), (3L, "x y z")).toDF("doc_id", "text")
    val out = df.select($"doc_id", DedupOps.shingles($"text").as("g")).orderBy("doc_id").collect()
    assert(out(0).getSeq[String](1).isEmpty) // 2 tokens < k=3
    assert(out(1).getSeq[String](1).isEmpty)
    assert(out(2).getSeq[String](1) == Seq("x y z"))
  }
}
