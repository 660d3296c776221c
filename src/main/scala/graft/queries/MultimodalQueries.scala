package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.multimodal.Multimodal
import graft.sources.Tables

/** Multimodal-column queries (X4). The byte-level stats are exactly
  * SQL-expressible, so the binary plumbing itself is oracle-checked;
  * the stubbed decoder's feature rows get the rows-only gate plus
  * MultimodalSpec. */
object MultimodalQueries {
  type Q = (SparkSession, String) => DataFrame

  val all: Map[String, Q] = Map(
    // ---- binary payload stats per kind (oracle-checked) -------------
    "x4_media_stats" -> ((s, dir) => {
      Multimodal.mediaFromDocuments(Tables.documents(s, dir)).toDF
        .groupBy(col("kind"))
        .agg(
          count(lit(1)).as("n"),
          sum(length(col("payload")).cast("long")).as("total_bytes"),
          max(length(col("payload")).cast("long")).as("max_bytes"))
        .orderBy("kind")
    }),

    // ---- stub-decoded features (rows-only; pinned by MultimodalSpec)
    "x4_media_features" -> ((s, dir) => {
      Multimodal.extractFeatures(
          Multimodal.mediaFromDocuments(Tables.documents(s, dir)))
        .toDF
        .select(col("mediaId").as("media_id"), col("kind"), col("nBytes").as("n_bytes"),
          round(col("byteMean"), 4).as("byte_mean"), col("phash"))
        .orderBy("media_id")
    }),

    // ---- video frame sampling (oracle-checked byte arithmetic) ------
    "x4_frame_sample" -> ((s, dir) => {
      Multimodal.sampleFrames(
          Multimodal.mediaFromDocuments(Tables.documents(s, dir)).toDF)
        .groupBy(col("mediaId").as("media_id"))
        .agg(count(lit(1)).as("n_frames"),
          sum(length(col("frame")).cast("long")).as("sampled_bytes"))
        .orderBy("media_id")
    })
  )

  private val kindExpr =
    "CASE doc_id % 3 WHEN 0 THEN 'image' WHEN 1 THEN 'audio' ELSE 'video' END"

  val oracle: Map[String, String] = Map(
    "x4_media_stats" ->
      s"""SELECT $kindExpr AS kind, COUNT(*) AS n,
         |CAST(SUM(octet_length(encode(text))) AS BIGINT) AS total_bytes,
         |CAST(MAX(octet_length(encode(text))) AS BIGINT) AS max_bytes
         |FROM documents GROUP BY 1 ORDER BY 1""".stripMargin,

    // every 1024-byte stride contributes one 256-byte (or tail) frame;
    // frames start at offsets 0, 1024, 2048, ...
    "x4_frame_sample" ->
      s"""WITH v AS (SELECT doc_id, octet_length(encode(text)) AS nb FROM documents WHERE doc_id % 3 = 2),
         |f AS (SELECT doc_id, nb, i * 1024 AS off
         |      FROM v, range(0, 64) r(i)
         |      WHERE i <= greatest((nb - 1) // 1024, 0) AND i * 1024 < nb)
         |SELECT doc_id AS media_id, COUNT(*) AS n_frames,
         |       CAST(SUM(least(256, nb - off)) AS BIGINT) AS sampled_bytes
         |FROM f GROUP BY doc_id ORDER BY media_id""".stripMargin
  )
}
