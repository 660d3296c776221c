package graft.operators

import graft.SparkSpec
import graft.functions.TextAnalysis.tokens
import graft.sources.Tables
import org.apache.spark.sql.functions._

import java.nio.file.{Files, Paths}

class TextIndexSpec extends SparkSpec {
  private val dir = "/root/testdata/sf0.001"

  private def freshStore(): TableStore =
    new TableStore(Files.createTempDirectory(Paths.get("target"), "textidx-").toString)

  test("probe over the persisted index equals inline recompute from raw text") {
    val s = spark
    val docs = Tables.documents(s, dir)
    val store = freshStore()
    TextIndex.build(docs, "doc_id", "text", store, "kw")
    val terms = Seq("vector", "stream", "merge")
    val probed = TextIndex.search(s, store, "kw", terms, k = 20).collect().toSeq
    // inline baseline: the pre-index formulation
    val tf = docs.select(col("doc_id"), explode(tokens(col("text"))).as("term"))
      .filter(col("term").isin(terms: _*))
      .groupBy("doc_id", "term").agg(count(lit(1)).as("tf"))
    val dfreq = tf.groupBy("term").agg(countDistinct(col("doc_id")).as("df"))
    val inline = tf.join(broadcast(dfreq), Seq("term"))
      .crossJoin(broadcast(docs.agg(count(lit(1)).as("n_docs"))))
      .withColumn("w", expr("(n_docs * 1000) div df"))
      .groupBy("doc_id")
      .agg(sum(expr("tf * w")).as("score"), count(lit(1)).as("n_terms"))
      .orderBy(col("score").desc, col("doc_id")).limit(20).collect().toSeq
    assert(probed == inline)
  }

  test("probe plan pushes the term filter into the postings scan") {
    val s = spark
    val store = freshStore()
    TextIndex.build(Tables.documents(s, dir), "doc_id", "text", store, "kw")
    val plan = TextIndex.search(s, store, "kw", Seq("vector", "stream"), k = 5)
      .queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters:") && plan.contains("In(term"), plan.take(1500))
  }

  test("bm25 length normalization: same tf, shorter doc ranks higher (tf-idf ties)") {
    val s = spark; import s.implicits._
    val docs = Seq(
      (1L, "x alpha"),
      (2L, "x " + Seq.fill(40)("filler").mkString(" ")),
      (3L, "beta gamma")).toDF("doc_id", "text")
    val store = freshStore()
    TextIndex.build(docs, "doc_id", "text", store, "kw")
    val tfidf = TextIndex.search(s, store, "kw", Seq("x"), k = 5)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(tfidf(1L) == tfidf(2L), "plain tf-idf cannot tell the docs apart")
    val bm25 = TextIndex.bm25Search(s, store, "kw", Seq("x"), k = 5)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(bm25(1L) > bm25(2L), s"shorter doc must outrank at equal tf: $bm25")
  }

  test("postings files carry disjoint term ranges (probe skips files by stats)") {
    val s = spark
    val store = freshStore()
    TextIndex.build(Tables.documents(s, dir), "doc_id", "text", store, "kw", numFiles = 4)
    val base = store.livePath("kw_postings")
    val f = new org.apache.hadoop.fs.Path(base)
      .getFileSystem(s.sparkContext.hadoopConfiguration)
    val ver = f.listStatus(new org.apache.hadoop.fs.Path(base))
      .map(_.getPath.getName).filter(_.startsWith("v-")).head
    val files = new java.io.File(s"$base/$ver").listFiles()
      .filter(_.getName.endsWith(".parquet")).map(_.getAbsolutePath)
    assert(files.length == 4)
    val ranges = files.map { p =>
      val r = s.read.parquet(p).agg(min("term"), max("term")).head
      (r.getString(0), r.getString(1))
    }.sortBy(_._1)
    ranges.sliding(2).foreach {
      case Array(a, b) => assert(a._2 <= b._1, s"term ranges overlap: $a vs $b")
      case _ =>
    }
  }

  test("fold: segmented index answers identically to a one-shot full build") {
    val s = spark
    val docs = Tables.documents(s, dir)
    val full = freshStore()
    TextIndex.build(docs, "doc_id", "text", full, "kw")
    val seg = freshStore()
    TextIndex.build(docs.filter(col("doc_id") % 3 === 0), "doc_id", "text", seg, "kw")
    TextIndex.fold(docs.filter(col("doc_id") % 3 === 1), "doc_id", "text", seg, "kw")
    TextIndex.fold(docs.filter(col("doc_id") % 3 === 2), "doc_id", "text", seg, "kw")
    val terms = Seq("vector", "stream", "merge")
    assert(TextIndex.bm25Search(s, seg, "kw", terms, 20).collect().toSeq ==
      TextIndex.bm25Search(s, full, "kw", terms, 20).collect().toSeq)
    assert(TextIndex.search(s, seg, "kw", terms, 20).collect().toSeq ==
      TextIndex.search(s, full, "kw", terms, 20).collect().toSeq)
  }

  test("bm25SearchBatch == per-query bm25Search, across segments") {
    val s = spark; import s.implicits._
    val docs = Tables.documents(s, dir)
    val store = freshStore()
    // segmented store: the batch probe must read base + segments
    TextIndex.build(docs.filter(col("doc_id") % 2 === 0), "doc_id", "text", store, "kw")
    TextIndex.fold(docs.filter(col("doc_id") % 2 === 1), "doc_id", "text", store, "kw")
    val qs = Map(
      1L -> Seq("vector", "stream", "merge"),
      2L -> Seq("table", "hash"),
      3L -> Seq("merge"))
    val queries = qs.toSeq.flatMap { case (q, ts) => ts.map(t => (q, t)) }
      .toDF("q_id", "term")
    val batch = TextIndex.bm25SearchBatch(s, store, "kw", queries)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSet
    val single = qs.toSeq.flatMap { case (q, ts) =>
      // k large enough to keep every candidate: compare FULL score sets
      TextIndex.bm25Search(s, store, "kw", ts, k = 100000)
        .collect().toSeq.map(r => (q, r.getLong(0), r.getLong(1), r.getLong(2)))
    }.toSet
    assert(batch == single)
  }

  test("phraseSearch: adjacency, order, overlap counting, segment crossing") {
    val s = spark; import s.implicits._
    val docs = Seq(
      (1L, "x a b y a b"),     // 2 occurrences of "a b"
      (2L, "a a a"),            // overlapping "a a" twice; no "a b"
      (3L, "b a"),              // reversed — must NOT match "a b"
      (4L, "a c b"),            // gap — must NOT match
      (5L, "a b c d")).toDF("doc_id", "text")
    val store = freshStore()
    // build on part, fold the rest: phrase legs must cross base+segment
    TextIndex.build(docs.filter(col("doc_id") <= 2), "doc_id", "text", store, "kw")
    TextIndex.fold(docs.filter(col("doc_id") > 2), "doc_id", "text", store, "kw")
    val ab = TextIndex.phraseSearch(s, store, "kw", Seq("a", "b"), 10)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(ab == Map(1L -> 2L, 5L -> 1L), ab)
    val aa = TextIndex.phraseSearch(s, store, "kw", Seq("a", "a"), 10)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(aa == Map(2L -> 2L), s"overlapping occurrences count individually: $aa")
    val abc = TextIndex.phraseSearch(s, store, "kw", Seq("a", "b", "c"), 10)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(abc == Map(5L -> 1L), abc)
  }

  test("fold rejects a batch whose doc ids are already indexed") {
    val s = spark
    val docs = Tables.documents(s, dir)
    val store = freshStore()
    TextIndex.build(docs.filter(col("doc_id") < 50), "doc_id", "text", store, "kw")
    TextIndex.fold(docs.filter(col("doc_id") >= 50 && col("doc_id") < 60),
      "doc_id", "text", store, "kw")
    // overlaps the BASE half
    val e1 = intercept[IllegalArgumentException] {
      TextIndex.fold(docs.filter(col("doc_id") < 10), "doc_id", "text", store, "kw")
    }
    assert(e1.getMessage.contains("already indexed"))
    // overlaps a published SEGMENT
    val e2 = intercept[IllegalArgumentException] {
      TextIndex.fold(docs.filter(col("doc_id") === 55), "doc_id", "text", store, "kw")
    }
    assert(e2.getMessage.contains("already indexed"))
  }

  test("a token-less doc still registers: refolding it is rejected, n_docs counts it once") {
    val s = spark; import s.implicits._
    val store = freshStore()
    // doc 2's text tokenizes to NOTHING — it must still land in the
    // doclen registry (dl=0), or a refold would pass the overlap
    // check and double-count it in n_docs, skewing BM25 idf/avgdl
    TextIndex.build(Seq((1L, "alpha beta"), (2L, "   ")).toDF("doc_id", "text"),
      "doc_id", "text", store, "kw")
    val dl = store.read(s, "kw_doclen").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(dl == Map(1L -> 2L, 2L -> 0L), dl.toString)
    val e = intercept[IllegalArgumentException] {
      TextIndex.fold(Seq((2L, "gamma")).toDF("doc_id", "text"),
        "doc_id", "text", store, "kw")
    }
    assert(e.getMessage.contains("already indexed"))
    // same registry contract through the SEGMENT path
    TextIndex.fold(Seq((3L, " ")).toDF("doc_id", "text"), "doc_id", "text", store, "kw")
    val e2 = intercept[IllegalArgumentException] {
      TextIndex.fold(Seq((3L, "delta")).toDF("doc_id", "text"),
        "doc_id", "text", store, "kw")
    }
    assert(e2.getMessage.contains("already indexed"))
  }

  test("remove: tombstoned index scores exactly like a fresh index on the survivors") {
    import spark.implicits._
    val s = spark
    val docs = Tables.documents(s, dir)
    val erased = docs.filter(col("doc_id") % 5 === 2)
    val survivors = docs.filter(col("doc_id") % 5 =!= 2)
    val terms = Seq("vector", "stream", "merge")

    val tomb = freshStore()
    TextIndex.build(docs, "doc_id", "text", tomb, "kw")
    val n = TextIndex.remove(s, tomb, "kw", erased.select("doc_id"), "doc_id")
    assert(n == erased.count())

    val fresh = freshStore()
    TextIndex.build(survivors, "doc_id", "text", fresh, "kw")

    def canon(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    // BM25 (df, stats, candidates all corrected), tf-idf, phrase, near
    assert(canon(TextIndex.bm25Search(s, tomb, "kw", terms, 20)) ==
      canon(TextIndex.bm25Search(s, fresh, "kw", terms, 20)))
    assert(canon(TextIndex.search(s, tomb, "kw", terms, 20)) ==
      canon(TextIndex.search(s, fresh, "kw", terms, 20)))
    assert(TextIndex.phraseSearch(s, tomb, "kw", Seq("the", "same"), 10).collect().toSeq ==
      TextIndex.phraseSearch(s, fresh, "kw", Seq("the", "same"), 10).collect().toSeq)
    assert(canon(TextIndex.nearSearch(s, tomb, "kw", "vector", "stream", 8, 10)) ==
      canon(TextIndex.nearSearch(s, fresh, "kw", "vector", "stream", 8, 10)))

    // idempotent: re-removing (or removing never-indexed ids) is a no-op
    assert(TextIndex.remove(s, tomb, "kw", erased.select("doc_id"), "doc_id") == 0L)
    assert(TextIndex.remove(s, tomb, "kw",
      Seq(999999L).toDF("doc_id"), "doc_id") == 0L)
    // a tombstoned id cannot be re-folded (registry keeps its row) —
    // rebuild-from-scratch is compaction
    val someErased = erased.select("doc_id").orderBy("doc_id").limit(1)
      .collect()(0).getLong(0)
    val e3 = intercept[IllegalArgumentException] {
      TextIndex.fold(Seq((someErased, "back again")).toDF("doc_id", "text"),
        "doc_id", "text", tomb, "kw")
    }
    assert(e3.getMessage.contains("already indexed"))
  }

  test("remove composes with segments: erase a base doc and a folded doc, scores match survivor build") {
    val s = spark
    val docs = Tables.documents(s, dir)
    val base = docs.filter(col("doc_id") % 10 =!= 9)
    val batch = docs.filter(col("doc_id") % 10 === 9)
    val tomb = freshStore()
    TextIndex.build(base, "doc_id", "text", tomb, "kw")
    TextIndex.fold(batch, "doc_id", "text", tomb, "kw")
    val erased = docs.filter(col("doc_id") % 20 === 9 || col("doc_id") % 20 === 4)
    TextIndex.remove(s, tomb, "kw", erased.select("doc_id"), "doc_id")
    val fresh = freshStore()
    TextIndex.build(docs.join(erased.select("doc_id"), Seq("doc_id"), "left_anti"),
      "doc_id", "text", fresh, "kw")
    val terms = Seq("vector", "stream", "merge")
    assert(TextIndex.bm25Search(s, tomb, "kw", terms, 20).collect().toSeq ==
      TextIndex.bm25Search(s, fresh, "kw", terms, 20).collect().toSeq)
  }
}
