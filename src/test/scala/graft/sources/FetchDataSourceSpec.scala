package graft.sources

import java.nio.file.{Files, Paths}

import graft.SparkSpec

class FetchDataSourceSpec extends SparkSpec {

  test("parallel multi-URL fetch via DSv2 (file:// URLs, offline)") {
    val dir = Files.createTempDirectory(Paths.get("target").toAbsolutePath, "fetch-")
    val a = dir.resolve("a.html"); Files.writeString(a, "<html>alpha</html>")
    val b = dir.resolve("b.html"); Files.writeString(b, "<html>beta</html>")
    val df = spark.read.format("graft-fetch")
      .option("urls", s"file://$a, file://$b")
      .load()
    assert(df.schema.fieldNames.toSeq == Seq("url", "status", "content"))
    assert(df.rdd.getNumPartitions == 2) // one partition per URL
    val rows = df.collect().map(r => r.getString(0) -> (r.getInt(1), r.getString(2))).toMap
    assert(rows(s"file://$a") == (200, "<html>alpha</html>"))
    assert(rows(s"file://$b") == (200, "<html>beta</html>"))
  }

  test("fetch failure is a row, not a crash") {
    val df = spark.read.format("graft-fetch")
      .option("urls", "file:///nonexistent/nope.html")
      .load()
    val r = df.collect().head
    assert(r.getInt(1) == -1 && r.getString(2).nonEmpty)
  }

  test("fetched page feeds the ETL parser end-to-end") {
    val fixture = getClass.getResource("/fixtures/report_sample.html")
    val df = spark.read.format("graft-fetch").option("urls", fixture.toString).load()
    val html = df.collect().head.getString(2)
    val batch = graft.etl.AirQualityEtl.batchFromHtml(spark, html)
    assert(batch.cdmx.count() == 4 && batch.edomex.count() == 2)
  }
}
