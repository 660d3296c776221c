package graft.operators

import java.util.concurrent.ConcurrentLinkedQueue

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.QueryExecution
import org.apache.spark.sql.util.QueryExecutionListener

/** Run-log sink (SURVEY §2 S8): the reference logs each pipeline
  * step's outcome to file+console (/root/reference/scrapper.py:307-314,
  * launcher.bat:2). The engine equivalent is a QueryExecutionListener:
  * every action's duration, output rows (when the plan reports them)
  * and failure land in the log4j log and an in-memory ring for
  * programmatic inspection. Attach with `Metrics.attach(spark)`. */
final class Metrics extends QueryExecutionListener {
  import Metrics.Entry

  val entries = new ConcurrentLinkedQueue[Entry]()
  private val maxEntries = 1024 // bounded ring — long-lived sessions must not leak driver memory

  private def addBounded(e: Entry): Unit = {
    entries.add(e)
    while (entries.size > maxEntries) entries.poll()
  }

  private def rowsWritten(qe: QueryExecution): Option[Long] =
    qe.executedPlan.metrics.get("numOutputRows").map(_.value)

  override def onSuccess(funcName: String, qe: QueryExecution, durationNs: Long): Unit = {
    val e = Entry(funcName, durationNs / 1000000, rowsWritten(qe), None)
    addBounded(e)
    Metrics.log.info(s"[graft-metrics] $funcName ok ${e.durationMs}ms rows=${e.rows.getOrElse(-1L)}")
  }

  override def onFailure(funcName: String, qe: QueryExecution, exception: Exception): Unit = {
    addBounded(Entry(funcName, -1, None, Some(exception.toString)))
    Metrics.log.warn(s"[graft-metrics] $funcName FAILED: $exception")
  }

  def snapshot: Seq[Entry] = entries.asScala.toSeq
}

object Metrics {
  private val log = org.apache.log4j.Logger.getLogger("graft.metrics")

  final case class Entry(action: String, durationMs: Long, rows: Option[Long], error: Option[String])

  /** Attach a fresh listener to the session and return it. */
  def attach(spark: SparkSession): Metrics = {
    val m = new Metrics
    spark.listenerManager.register(m)
    m
  }
}
