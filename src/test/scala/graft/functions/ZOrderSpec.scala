package graft.functions

import graft.SparkSpec
import graft.operators.Partitioning
import graft.sources.Tables
import org.apache.spark.sql.functions._

import java.nio.file.{Files, Paths}
import scala.util.Random

class ZOrderSpec extends SparkSpec {

  /** Slow reference: interleave bit-by-bit. */
  private def slowInterleave(x: Int, y: Int): Long = {
    val bx = (x ^ 0x80000000).toLong & 0xFFFFFFFFL
    val by = (y ^ 0x80000000).toLong & 0xFFFFFFFFL
    var out = 0L
    for (i <- 0 until 32) {
      out |= ((bx >>> i) & 1L) << (2 * i)
      out |= ((by >>> i) & 1L) << (2 * i + 1)
    }
    out ^ Long.MinValue
  }

  test("interleave matches the bit-loop reference, negatives included") {
    val rnd = new Random(1)
    val cases = Seq((0, 0), (-1, 1), (Int.MinValue, Int.MaxValue), (123, -456)) ++
      Seq.fill(200)((rnd.nextInt(), rnd.nextInt()))
    cases.foreach { case (x, y) =>
      assert(ZOrder.interleave(x, y) == slowInterleave(x, y), s"($x, $y)")
    }
  }

  test("sign bias keeps z-order monotone along each axis") {
    // for fixed y, increasing x must increase the z-value restricted to
    // x's bits — in particular any negative x sorts before any positive x
    assert(ZOrder.interleave(-5, 7) < ZOrder.interleave(5, 7))
    assert(ZOrder.interleave(Int.MinValue, 0) < ZOrder.interleave(0, 0))
    assert(ZOrder.interleave(0, -9) < ZOrder.interleave(0, 9))
  }

  test("zorder layout skips files on BOTH dimensions; single-sort only on its own") {
    val s = spark
    val src = Tables.lineitem(s, "/root/testdata/sf0.001")
      .select(col("l_orderkey"), col("l_partkey"), col("l_quantity"))
    val zDir = Files.createTempDirectory(Paths.get("target").toAbsolutePath, "zorder-").toString
    val sDir = Files.createTempDirectory(Paths.get("target").toAbsolutePath, "singles-").toString
    Partitioning.zorderWrite(src, "l_orderkey", "l_partkey", zDir, numFiles = 16)
    Partitioning.sortedWrite(src, "l_orderkey", sDir, numFiles = 16)

    // rows survive the layout intact
    assert(s.read.parquet(zDir).count() == src.count())

    val (loOrd, hiOrd) = { val r = src.agg(min("l_orderkey"), max("l_orderkey")).head; (r.getLong(0), r.getLong(1)) }
    val (loPart, hiPart) = { val r = src.agg(min("l_partkey"), max("l_partkey")).head; (r.getLong(0), r.getLong(1)) }
    // narrow range predicates: bottom eighth of each key space
    val ordCut = loOrd + (hiOrd - loOrd) / 8
    val partCut = loPart + (hiPart - loPart) / 8

    // files whose [min,max] stats overlap the predicate — exactly the
    // files parquet stats-based skipping would have to read
    def filesTouched(dir: String, key: String, cut: Long): Int = {
      val files = new java.io.File(dir).listFiles()
        .filter(_.getName.endsWith(".parquet")).map(_.getAbsolutePath)
      files.count { f =>
        val r = s.read.parquet(f).agg(min(key)).head
        r.getLong(0) <= cut // min <= cut means the file must be read
      }
    }
    val zOrd = filesTouched(zDir, "l_orderkey", ordCut)
    val zPart = filesTouched(zDir, "l_partkey", partCut)
    val sOrd = filesTouched(sDir, "l_orderkey", ordCut)
    val sPart = filesTouched(sDir, "l_partkey", partCut)

    assert(zOrd < 16, s"z-order must skip some files on l_orderkey, touched $zOrd/16")
    assert(zPart < 16, s"z-order must skip some files on l_partkey, touched $zPart/16")
    assert(sOrd <= zOrd, "single-sort is at least as good on its own key")
    assert(sPart == 16, s"single-sort layout cannot skip on the other key, touched $sPart/16")
  }
}
