package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, DoubleType}

/** graft's scalar/aggregate function surface.
  *
  * Everything here composes codegen'd Spark built-ins (SURVEY §2 P13)
  * except `normalize_text`, which is a native Catalyst expression
  * (NormalizeText.scala). No Scala UDFs in hot paths.
  */
object Functions {

  /** Register SQL-callable custom functions on a session (idempotent:
    * a session that already resolves them — earlier call or
    * GraftExtensions injection — is left untouched, so per-operator
    * registration is warning-free and never shadows injected
    * builders). */
  def register(spark: SparkSession): Unit = {
    if (spark.sessionState.functionRegistry.functionExists(
        org.apache.spark.sql.catalyst.FunctionIdentifier("lsh_buckets"))) return
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "normalize_text", exprs => NormalizeTextExpr(exprs.head), "scala_udf")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "vec_dot", exprs => VecDot(exprs(0), exprs(1)), "scala_udf")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "luhn_sum", exprs => LuhnSumExpr(exprs.head), "scala_udf")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "simhash64", exprs => SimHashExpr(exprs.head,
        if (exprs.length > 1) litInt(exprs(1), "simhash64 charN") else 5,
        if (exprs.length > 2) litInt(exprs(2), "simhash64 bits") else 63), "scala_udf")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "minhash_sig", exprs => MinHashSigExpr(exprs.head,
        if (exprs.length > 1) litInt(exprs(1), "minhash_sig n") else 3,
        if (exprs.length > 2) litInt(exprs(2), "minhash_sig k") else 64), "scala_udf")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "word_ngrams", exprs => WordNgramsExpr(exprs.head,
        if (exprs.length > 1) litInt(exprs(1), "word_ngrams n") else 3), "scala_udf")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "lsh_buckets", exprs => HyperplaneBucketsExpr(exprs.head,
        if (exprs.length > 1) litInt(exprs(1), "lsh_buckets tables") else 96,
        if (exprs.length > 2) litInt(exprs(2), "lsh_buckets bits") else 6,
        if (exprs.length > 3) litInt(exprs(3), "lsh_buckets dim") else 64,
        if (exprs.length > 4) litLong(exprs(4), "lsh_buckets seed") else 42L), "scala_udf")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "bloom_might_contain", exprs => BloomMightContainExpr(exprs(0),
        litBinary(exprs(1), "bloom_might_contain filter bytes")), "scala_udf")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "quantize_i8_stats", exprs => QuantizeInt8Expr(exprs.head), "scala_udf")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "zorder2", exprs => ZOrder2Expr(exprs(0), exprs(1)), "scala_udf")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "jaro_winkler", exprs => JaroWinklerExpr(exprs(0), exprs(1)), "scala_udf")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "kll_quantiles", exprs => KllQuantilesAgg(exprs.head,
        exprs.tail.map(litDouble(_, "kll_quantiles rank"))), "scala_udf")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "kll_sketch", exprs => KllSketchAgg(exprs.head), "scala_udf")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "kll_merge", exprs => KllMergeExpr(exprs(0), exprs(1)), "scala_udf")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "kll_quantile", exprs => KllQuantileExpr(exprs(0), exprs(1)), "scala_udf")
  }

  /** Literal-int argument of a registered function call. Parameters of
    * graft's parameterized expressions MUST be literals (they shape the
    * generated code); a non-literal argument fails analysis loudly
    * instead of silently running with the default. */
  private[graft] def litInt(e: org.apache.spark.sql.catalyst.expressions.Expression,
      what: String): Int =
    e match {
      case org.apache.spark.sql.catalyst.expressions.Literal(v: Int, _) => v
      case other if other.foldable => other.eval() match {
        case v: Int => v
        case v => throw new IllegalArgumentException(s"$what must be an integer literal, got $v")
      }
      case other => throw new IllegalArgumentException(
        s"$what must be a literal, got expression ${other.sql}")
    }

  private[graft] def litLong(e: org.apache.spark.sql.catalyst.expressions.Expression,
      what: String): Long =
    e match {
      case org.apache.spark.sql.catalyst.expressions.Literal(v: Long, _) => v
      case org.apache.spark.sql.catalyst.expressions.Literal(v: Int, _) => v.toLong
      case other if other.foldable => other.eval() match {
        case v: Long => v
        case v: Int => v.toLong
        case v => throw new IllegalArgumentException(s"$what must be an integer literal, got $v")
      }
      case other => throw new IllegalArgumentException(
        s"$what must be a literal, got expression ${other.sql}")
    }

  private[graft] def litDouble(e: org.apache.spark.sql.catalyst.expressions.Expression,
      what: String): Double =
    e match {
      case org.apache.spark.sql.catalyst.expressions.Literal(v: Double, _) => v
      case org.apache.spark.sql.catalyst.expressions.Literal(v: java.math.BigDecimal, _) => v.doubleValue()
      case other if other.foldable => other.eval() match {
        case v: Double => v
        case v: org.apache.spark.sql.types.Decimal => v.toDouble
        case v: Int => v.toDouble
        case v => throw new IllegalArgumentException(s"$what must be a numeric literal, got $v")
      }
      case other => throw new IllegalArgumentException(
        s"$what must be a literal, got expression ${other.sql}")
    }

  private[graft] def litBinary(e: org.apache.spark.sql.catalyst.expressions.Expression,
      what: String): Array[Byte] =
    e match {
      case org.apache.spark.sql.catalyst.expressions.Literal(v: Array[Byte], _) => v
      case other if other.foldable => other.eval() match {
        case v: Array[Byte] => v
        case v => throw new IllegalArgumentException(s"$what must be a binary literal, got $v")
      }
      case other => throw new IllegalArgumentException(
        s"$what must be a literal, got expression ${other.sql}")
    }

  /** normalize_text as a Column function (goes through the registry so
    * we never touch the private Column<->Expression bridge). */
  def normalize_text(c: Column): Column = call_function("normalize_text", c)

  // ---- exact (hash-stable) numeric aggregates -------------------------
  // Double sums are order-dependent and never hash-match another engine.
  // Route sums through DECIMAL(38,6): cast of an IEEE double to decimal
  // is deterministic, decimal addition is exact, and casting the exact
  // total back to double is deterministic — so Spark and DuckDB agree
  // bit-for-bit regardless of partitioning / AQE / row order.
  // Scale 6 ≥ the exact decimal width of any 3-factor product of the
  // 2-decimal testdata columns, so the cast never hits a rounding
  // boundary (Spark rounds the shortest-string repr of a double,
  // DuckDB rounds its binary value — they can disagree AT a boundary).

  /** Exact sum of a double column, returned as double.
    *
    * Precision 18: Spark's Decimal stays in its compact-long
    * representation up to 18 digits, so per-value casts and partial
    * sums avoid BigDecimal allocation (~3× on agg-heavy plans). 12
    * integer digits hold sums to 10^12 at scale 6 — right for the
    * test scale factors; bump toward 38 when the real data's sum
    * magnitude demands it (the oracle side must match the precision). */
  def dsum(c: Column): Column = sum(c.cast(DecimalType(18, 6))).cast(DoubleType)

  /** Exact average: exact decimal sum divided (IEEE, deterministic) by count. */
  def davg(c: Column): Column = dsum(c) / count(c)

  /** DuckDB-side equivalents, for building oracle SQL strings. */
  def dsumSql(expr: String): String = s"CAST(SUM(CAST(($expr) AS DECIMAL(18,6))) AS DOUBLE)"
  def davgSql(expr: String): String = s"(${dsumSql(expr)} / COUNT($expr))"

  // ---- vector ops over array<float>/array<double> ---------------------
  // VecDot is a native codegen'd expression (VectorExpressions.scala);
  // the zip_with/aggregate HOF formulation gives identical results but
  // runs interpreted with per-row allocation — ~100× slower in the
  // pairs×dims hot loop of similarity search. Callers must have run
  // Functions.register(spark) on the session.

  /** Dot product of two numeric arrays, computed in double (native
    * codegen'd expression; index-order accumulation). */
  def dotd(a: Column, b: Column): Column = call_function("vec_dot", a, b)

  /** L2 norm. */
  def l2norm(a: Column): Column = sqrt(dotd(a, a))

  /** Cosine similarity = dot(a,b) / (|a| * |b|). */
  def cosine(a: Column, b: Column): Column = dotd(a, b) / (l2norm(a) * l2norm(b))

  // ---- text metrics (SURVEY §2 X3) ------------------------------------

  /** Whitespace token count (empty/blank string counts 0). */
  def tokenCount(c: Column): Column =
    when(length(trim(c)) === 0, lit(0L))
      .otherwise(size(split(trim(c), "\\s+")).cast("long"))
}
