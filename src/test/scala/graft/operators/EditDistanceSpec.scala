package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.sources.Tables

class EditDistanceSpec extends SparkSpec {

  private def bruteForce(tau: Int) = {
    val p = Tables.part(spark, "/root/testdata/sf0.001")
      .select(col("p_partkey"), col("p_brand"), col("p_name"))
    val a = p.toDF("id_a", "p_brand", "s_a")
    val b = p.toDF("id_b", "p_brand", "s_b")
    a.join(b, Seq("p_brand")).filter(col("id_a") < col("id_b"))
      .withColumn("dist", levenshtein(col("s_a"), col("s_b"), tau))
      .filter(col("dist") >= 0)
      .select("p_brand", "id_a", "id_b", "dist")
  }

  test("PassJoin segment filter finds exactly the quadratic baseline's pairs") {
    val got = EditDistance.pairsWithin(
        Tables.part(spark, "/root/testdata/sf0.001"), "p_partkey", "p_name", "p_brand", tau = 2)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getInt(3))).toSet
    val want = bruteForce(2)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getInt(3))).toSet
    assert(got == want)
    assert(want.nonEmpty, "fixture must contain at least one near pair or the test is vacuous")
  }

  test("planted edits at every region of the string are caught (shift window is lossless)") {
    val s = spark; import s.implicits._
    val base = "the quick brown fox jumps over the lazy dog"
    // one edit in each third + an insertion and a deletion (length shifts)
    val rows = Seq(
      (1L, base), (2L, "The quick brown fox jumps over the lazy dog"), // head subst
      (3L, "the quick brXwn fox jumps over the lazy dog"),             // middle subst
      (4L, "the quick brown fox jumps over the lazy doG"),             // tail subst
      (5L, "xthe quick brown fox jumps over the lazy dog"),            // head insert
      (6L, "he quick brown fox jumps over the lazy dog"),              // head delete
      (7L, "the quick brown fox jumps over the lazy"),                 // 4-char cut: out of range
      (8L, "completely different string altogether here")
    ).toDF("id", "s").withColumn("blk", lit("b"))
    val got = EditDistance.pairsWithin(rows, "id", "s", "blk", tau = 2)
      .filter(col("id_a") === 1L)
      .collect().map(_.getLong(2)).toSet
    assert(got == Set(2L, 3L, 4L, 5L, 6L))
  }

  test("short-string residual path: strings below tau+1 chars still pair up") {
    val s = spark; import s.implicits._
    val rows = Seq((1L, "ab"), (2L, "ax"), (3L, "abcd"), (4L, "zzzzzz"))
      .toDF("id", "s").withColumn("blk", lit("b"))
    val got = EditDistance.pairsWithin(rows, "id", "s", "blk", tau = 2)
      .collect().map(r => (r.getLong(1), r.getLong(2))).toSet
    // ed(ab,ax)=1; ed(ab,abcd)=2; ed(ax,abcd)=3 — excluded; zzzzzz far
    assert(got == Set((1L, 2L), (1L, 3L)))
  }
}
