package graft.multimodal

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.multimodal.Multimodal.{MediaFeatures, MediaRecord}

class MultimodalSpec extends SparkSpec {

  private val abc = "abc".getBytes("UTF-8")

  test("stub decoder: deterministic byte stats and fnv hash") {
    val out = Multimodal.decodeBatch(Seq(
      MediaRecord(1L, "image", abc, 3, 3, 0),
      MediaRecord(2L, "audio", Array.emptyByteArray, 0, 0, 16000)))
    val f = out.head
    assert(f.nBytes == 3L && math.abs(f.byteMean - (97 + 98 + 99) / 3.0) < 1e-12)
    assert(f.histHead == Seq(0L, 0L, 0L, 0L)) // 'a'..'c' land in bucket 6
    assert(out(1).nBytes == 0L && out(1).byteMean == 0.0)
    // decode twice → identical (deterministic)
    assert(Multimodal.decodeBatch(Seq(MediaRecord(1L, "image", abc, 3, 3, 0))).head == f)
  }

  test("extractFeatures preserves batch boundaries and every row") {
    val s = spark; import s.implicits._
    val ds = (1L to 100L).map(i =>
      MediaRecord(i, "image", s"payload-$i".getBytes("UTF-8"), 1, 1, 0)).toDS.repartition(3)
    val out = Multimodal.extractFeatures(ds, batchSize = 8).collect()
    assert(out.length == 100)
    assert(out.map(_.mediaId).toSet == (1L to 100L).toSet)
  }

  test("sampleFrames: stride arithmetic, tail frame, non-video excluded") {
    val s = spark; import s.implicits._
    val media = Seq(
      MediaRecord(1L, "video", Array.fill[Byte](2100)(7), 0, 0, 0), // frames at 0,1024,2048 → 256,256,52
      MediaRecord(2L, "image", Array.fill[Byte](5000)(7), 0, 0, 0),
      MediaRecord(3L, "video", "tiny".getBytes, 0, 0, 0)
    ).toDS.toDF
    val rows = Multimodal.sampleFrames(media)
      .select(col("mediaId"), col("frame_no"), length(col("frame")).as("len"))
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getInt(2)))
    assert(rows.count(_._1 == 2L) == 0)
    assert(rows.filter(_._1 == 1L).map(_._3).sorted.toSeq == Seq(52, 256, 256))
    assert(rows.filter(_._1 == 3L).toSeq == Seq((3L, 0, 4)))
  }
}
