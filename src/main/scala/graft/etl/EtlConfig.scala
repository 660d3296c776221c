package graft.etl

import java.io.InputStream
import java.{util => ju}

import scala.jdk.CollectionConverters._

import org.yaml.snakeyaml.Yaml

/** YAML-backed config source (SURVEY §2 S7) — the engine analogue of
  * the reference's two YAML files (/root/reference/config.yaml,
  * sql_config.yaml), loaded once on the driver. snakeyaml ships with
  * Spark, so no extra dependency.
  */
final case class EtlConfig(
    url: String,
    userAgent: String,
    divIds: Map[String, String],
    headerRow: Int,
    dataFromRow: Int,
    months: Map[String, Int],
    tableKeys: Map[String, Seq[String]])

object EtlConfig {

  def load(in: InputStream): EtlConfig = {
    val root = new Yaml().load[ju.Map[String, AnyRef]](in).asScala
    val report = root("report").asInstanceOf[ju.Map[String, AnyRef]].asScala
    val divIds = report("div_ids").asInstanceOf[ju.Map[String, String]].asScala.toMap
    val months = root("months").asInstanceOf[ju.Map[String, Number]].asScala
      .map { case (k, v) => k -> v.intValue }.toMap
    val tables = root("tables").asInstanceOf[ju.Map[String, AnyRef]].asScala
      .map { case (name, spec) =>
        val keys = spec.asInstanceOf[ju.Map[String, AnyRef]].asScala("keys")
          .asInstanceOf[ju.List[String]].asScala.toSeq
        name -> keys
      }.toMap
    EtlConfig(
      url = report("url").toString,
      userAgent = report("user_agent").toString,
      divIds = divIds,
      headerRow = report("header_row").asInstanceOf[Number].intValue,
      dataFromRow = report("data_from_row").asInstanceOf[Number].intValue,
      months = months,
      tableKeys = tables)
  }

  lazy val default: EtlConfig = {
    val in = getClass.getResourceAsStream("/graft-etl.yaml")
    require(in != null, "graft-etl.yaml not on classpath")
    try load(in) finally in.close()
  }
}
