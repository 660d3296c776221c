package graft.functions

import java.io.ByteArrayInputStream

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.types.{BooleanType, DataType, IntegerType, LongType}
import org.apache.spark.util.sketch.BloomFilter

/** `bloom_might_contain(key, bloomBytes)` — membership probe against a
  * serialized `org.apache.spark.util.sketch.BloomFilter`, as a
  * codegen'd expression (NOT a Scala UDF, so it stays inside
  * whole-stage codegen on the probe side's scan).
  *
  * This is the explicit form of a runtime row filter: build a bloom
  * filter over the join keys of a selective build side (one bounded
  * aggregation job — `DataFrameStatFunctions.bloomFilter` merges
  * per-partition sketches), then prune the probe side BEFORE its
  * shuffle, so the sort-merge exchange moves only rows that can match.
  * Spark's own `InjectRuntimeFilter` does the same transparently when
  * stats allow; the expression makes the technique available
  * unconditionally and to SQL callers.
  *
  * No false negatives (bloom property) — callers that follow the probe
  * with the exact join get exact results; false positives only cost
  * shuffle bytes (fpp-bounded).
  *
  * The filter is deserialized ONCE per executor (keyed by content
  * fingerprint) no matter how many tasks reference it; the serialized
  * bytes ride along in the plan like any literal. */
object BloomMightContainFn {
  private val cache =
    new java.util.concurrent.ConcurrentHashMap[String, BloomFilter]()

  private[graft] def fingerprint(bytes: Array[Byte]): String = {
    val d = java.security.MessageDigest.getInstance("MD5").digest(bytes)
    d.map(b => f"$b%02x").mkString
  }

  def filter(fp: String, bytes: Array[Byte]): BloomFilter =
    cache.computeIfAbsent(fp, _ => BloomFilter.readFrom(new ByteArrayInputStream(bytes)))

  /** Static worker shared by interpreted eval and generated code. */
  def mightContain(fp: String, bytes: Array[Byte], key: Long): Boolean =
    filter(fp, bytes).mightContainLong(key)

  def serialize(bf: BloomFilter): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    bf.writeTo(bos)
    bos.toByteArray
  }
}

case class BloomMightContainExpr(child: Expression, bloomBytes: Array[Byte])
    extends UnaryExpression {

  // Recomputed per JVM (driver + each executor) — cheap relative to
  // deserialization, and keeps the serialized expression small.
  @transient private lazy val fp: String = BloomMightContainFn.fingerprint(bloomBytes)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case LongType | IntegerType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"bloom_might_contain requires an integral key, got ${other.catalogString}")
  }

  override def dataType: DataType = BooleanType
  override def prettyName: String = "bloom_might_contain"

  override def nullSafeEval(input: Any): Any = {
    val key = input match {
      case l: java.lang.Long => l.longValue()
      case i: java.lang.Integer => i.longValue()
      case other => other.asInstanceOf[Long]
    }
    BloomMightContainFn.mightContain(fp, bloomBytes, key)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val bytesRef = ctx.addReferenceObj("bloomBytes", bloomBytes, "byte[]")
    val fpRef = ctx.addReferenceObj("bloomFp", fp, "java.lang.String")
    nullSafeCodeGen(ctx, ev, c => {
      s"${ev.value} = graft.functions.BloomMightContainFn.mightContain($fpRef, $bytesRef, (long) $c);"
    })
  }

  override protected def withNewChildInternal(newChild: Expression): BloomMightContainExpr =
    copy(child = newChild)
}
