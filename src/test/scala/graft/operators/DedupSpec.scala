package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.sources.Tables

/** Pins the near-dup family on the deterministic testdata: the
  * blocked paths (MinHash-LSH, SimHash) must reproduce the exact
  * all-pairs result after verification — no false negatives on data
  * whose planted duplicates (Jaccard ≥ 0.97) sit far from the 0.6
  * threshold. */
class DedupSpec extends SparkSpec {
  private val dir = "/root/testdata/sf0.001"

  private def dupFilter = col("n_common") * 5 >= col("n_union") * 3

  private lazy val exactPairs: Set[(Long, Long)] =
    Dedup.allPairsNgram(Tables.documents(spark, dir), "doc_id", "text")
      .filter(dupFilter)
      .select("idA", "idB").collect().map(r => (r.getLong(0), r.getLong(1))).toSet

  test("testdata has the planted near-dup pairs") {
    assert(exactPairs.size == 28)
  }

  test("MinHash-LSH candidates contain every true pair; verified result == exact") {
    val docs = Tables.documents(spark, dir)
    val cands = Dedup.lshCandidates(docs, "doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(exactPairs.subsetOf(cands), s"LSH missed ${exactPairs -- cands}")
    val verified = Dedup.verifyPairs(
        Dedup.lshCandidates(docs, "doc_id", "text"), docs, "doc_id", "text")
      .filter(dupFilter)
      .select("idA", "idB").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(verified == exactPairs)
  }

  test("SimHash(5-gram) blocking at Hamming<=6 + verify == exact") {
    val docs = Tables.documents(spark, dir)
    val sims = Dedup.simhash(docs, "doc_id", "text", charN = 5)
    val cands = Dedup.simhashNearPairs(sims, maxHamming = 6).select("idA", "idB")
    val verified = Dedup.verifyPairs(cands, docs, "doc_id", "text")
      .filter(dupFilter)
      .select("idA", "idB").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(verified == exactPairs)
  }

  test("banded simhash pair search equals the all-pairs result") {
    val docs = Tables.documents(spark, dir)
    val sims = Dedup.simhash(docs, "doc_id", "text", charN = 5)
    def pairSet(df: org.apache.spark.sql.DataFrame) =
      df.select("idA", "idB").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairSet(Dedup.simhashNearPairsBanded(sims, 6)) ==
      pairSet(Dedup.simhashNearPairs(sims, 6)))
  }

  test("PPJoin prefix filter reproduces the exact result") {
    val docs = Tables.documents(spark, dir)
    val got = Dedup.prefixFilteredNgram(docs, "doc_id", "text")
      .select("idA", "idB").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == exactPairs)
  }

  test("stop-shingle cap (maxDf) leaves the PPJoin result unchanged at the oracle sf") {
    // "verify, don't assume" (VERDICT r1 #6): planted dups must not rely
    // on df-capped shingles for candidate generation at sf0.01, the sf
    // the driver's DuckDB oracle runs at.
    val docs = Tables.documents(spark, "/root/testdata/sf0.01")
    def pairs(maxDf: Int) =
      Dedup.prefixFilteredNgram(docs, "doc_id", "text", maxDf = maxDf)
        .select("idA", "idB").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val uncapped = pairs(0)
    assert(pairs(16) == uncapped) // the default
    assert(pairs(64) == uncapped)
  }

  test("keepRepresentatives: lowest id survives a clique; chains keep local minima only") {
    val s = spark; import s.implicits._
    val docs = Seq(1L, 2L, 3L, 4L, 5L, 6L).toDF("doc_id")
    // clique {1,2,3} + chain 4-5, 5-6 (4 and 6 NOT near-dups of each other)
    val pairs = Seq((1L, 2L), (1L, 3L), (2L, 3L), (4L, 5L), (5L, 6L)).toDF("idA", "idB")
    val kept = Dedup.keepRepresentatives(docs, "doc_id", pairs)
      .collect().map(_.getLong(0)).toSet
    // clique -> min id; chain: 5 AND 6 both dropped (each is some pair's
    // idB) — the documented over-removal of the single-pass form
    assert(kept == Set(1L, 4L))
  }

  test("clusterLabels: transitive components — chain collapses to one cluster") {
    val s = spark; import s.implicits._
    val docs = Seq(1L, 2L, 3L, 4L, 5L, 6L, 7L).toDF("doc_id")
    // clique {1,2,3}; chain 4-5-6 (transitively one component); singleton 7
    val pairs = Seq((1L, 2L), (1L, 3L), (2L, 3L), (4L, 5L), (5L, 6L)).toDF("idA", "idB")
    val got = Dedup.clusterLabels(docs, "doc_id", pairs)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 4L, 5L -> 4L, 6L -> 4L, 7L -> 7L))
  }

  test("wordGrams: short text degrades to a single whole-text shingle") {
    val s = spark; import s.implicits._
    val got = Seq("one two", "a b c d").toDF("t")
      .select(Dedup.wordGrams($"t", 3)).as[Seq[String]].collect()
    assert(got(0) == Seq("one two"))
    assert(got(1) == Seq("a b c", "b c d"))
  }

  test("containment catches doc-inside-doc that symmetric Jaccard misses") {
    val s = spark; import s.implicits._
    val words = (1 to 100).map(i => s"w$i")
    val big = words.mkString(" ")
    val small = words.slice(40, 60).mkString(" ") // contiguous slice of big
    val other = (200 to 260).map(i => s"v$i").mkString(" ")
    val docs = Seq((1L, big), (2L, small), (3L, other)).toDF("doc_id", "text")
    // symmetric threshold 0.6: J(big, small) = 18/98 ≈ 0.18 → invisible
    val sym = Dedup.prefixFilteredNgram(docs, "doc_id", "text", tNum = 3, tDen = 5, maxDf = 0)
      .collect()
    assert(!sym.exists(r => r.getLong(0) == 1L && r.getLong(1) == 2L), "J≈0.18 must not pass 0.6")
    // containment 0.8 on the min side: 18/18 = 1.0 → caught
    val cont = Dedup.containmentPairs(docs, "doc_id", "text", tNum = 4, tDen = 5, maxDf = 0)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(cont.toSeq == Seq((1L, 2L, 18L, 18L)), cont.mkString(","))
  }

  test("simhash is sequence-sensitive: reordered words change the hash") {
    val s = spark; import s.implicits._
    val df = Seq((1L, "alpha beta gamma delta epsilon zeta"),
                 (2L, "zeta epsilon delta gamma beta alpha")).toDF("id", "text")
    val hs = Dedup.simhash(df, "id", "text").orderBy("id")
      .select("simhash").as[Long].collect()
    assert(hs(0) != hs(1))
  }

  test("contamination: every flagged doc is in the eval split with >= 1 train dup") {
    val flagged = graft.queries.DedupQueries.all("x1_contamination")(spark, dir).collect()
    val testIds = Tables.documents(spark, dir)
      .select(col("doc_id"), graft.operators.Sampling.splitColumn(col("text")).as("split"))
      .filter(col("split") === "test")
      .collect().map(_.getLong(0)).toSet
    flagged.foreach { r =>
      assert(testIds.contains(r.getAs[Long]("eval_doc")),
        "a contamination hit must identify an eval-split doc")
      assert(r.getAs[Long]("n_train_dups") >= 1L)
    }
  }
}
