package graft.sources

import java.io.InputStream
import java.net.{HttpURLConnection, URI}
import java.util.{Map => JMap}

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.sources.DataSourceRegister
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** DataSource V2 URL-fetch source (SURVEY §2 S1): the reference does
  * one blocking GET per batch on the driver
  * (/root/reference/scrapper.py:133-135); this source turns "fetch N
  * pages" into a proper parallel scan — one input partition per URL,
  * fetched on executors, emitted as (url, status, content) rows.
  *
  *   spark.read.format("graft-fetch")
  *     .option("urls", "https://a, https://b")
  *     .option("userAgent", "...")
  *     .load()
  *
  * file:// URLs work identically (that's how tests stay offline), and
  * at 100 TB-of-pages scale the same scan shape applies: the URL list
  * becomes a DataFrame, work distributes by partition, and failures
  * surface per-row (status = -1, content = error) instead of killing
  * the batch — the driver-side validation gate decides what to do. */
class FetchDataSource extends TableProvider with DataSourceRegister {
  override def shortName(): String = "graft-fetch"
  override def inferSchema(options: CaseInsensitiveStringMap): StructType = FetchDataSource.Schema
  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: JMap[String, String]): Table =
    new FetchTable(properties.asScala.toMap)
}

object FetchDataSource {
  val Schema: StructType = StructType(Seq(
    StructField("url", StringType, nullable = false),
    StructField("status", IntegerType, nullable = false),
    StructField("content", StringType, nullable = true)))

  /** Fetch one URL; never throws. HTTP error responses keep their real
    * status code with the error body as content; transport failures
    * (DNS, timeout, refused) become (-1, message). */
  def fetch(url: String, userAgent: String, timeoutMs: Int): (Int, String) =
    try {
      val conn = new URI(url).toURL.openConnection()
      conn.setConnectTimeout(timeoutMs)
      conn.setReadTimeout(timeoutMs)
      conn.setRequestProperty("User-Agent", userAgent)
      def readAll(in: InputStream): String =
        if (in == null) ""
        else try new String(in.readAllBytes(), "UTF-8") finally in.close()
      conn match {
        case h: HttpURLConnection =>
          val status = h.getResponseCode
          val body =
            if (status >= 400) readAll(h.getErrorStream)
            else readAll(h.getInputStream)
          (status, body)
        case c => (200, readAll(c.getInputStream))
      }
    } catch {
      case e: Exception => (-1, s"${e.getClass.getSimpleName}: ${e.getMessage}")
    }
}

final class FetchTable(props: Map[String, String]) extends Table with SupportsRead {
  override def name(): String = "graft_fetch"
  override def schema(): StructType = FetchDataSource.Schema
  override def capabilities(): java.util.Set[TableCapability] =
    java.util.EnumSet.of(TableCapability.BATCH_READ)

  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder = {
    val merged = props ++ options.asScala
    () => new FetchScan(merged)
  }
}

final class FetchScan(props: Map[String, String]) extends Scan with Batch {
  override def readSchema(): StructType = FetchDataSource.Schema
  override def toBatch: Batch = this

  override def planInputPartitions(): Array[InputPartition] = {
    val urls = props.getOrElse("urls",
      throw new IllegalArgumentException("graft-fetch requires option 'urls'"))
    urls.split(",").map(_.trim).filter(_.nonEmpty)
      .map(u => FetchPartition(u): InputPartition)
  }

  override def createReaderFactory(): PartitionReaderFactory = {
    val ua = props.getOrElse("useragent", "graft/0.1")
    val timeout = props.getOrElse("timeoutms", "10000").toInt
    new FetchReaderFactory(ua, timeout)
  }
}

final case class FetchPartition(url: String) extends InputPartition

final class FetchReaderFactory(userAgent: String, timeoutMs: Int)
    extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val url = partition.asInstanceOf[FetchPartition].url
    new PartitionReader[InternalRow] {
      private var done = false
      private var row: InternalRow = _
      override def next(): Boolean =
        if (done) false
        else {
          val (status, content) = FetchDataSource.fetch(url, userAgent, timeoutMs)
          row = InternalRow(
            UTF8String.fromString(url), status, UTF8String.fromString(content))
          done = true
          true
        }
      override def get(): InternalRow = row
      override def close(): Unit = ()
    }
  }
}
