package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

import graft.functions.{BloomMightContainExpr, Functions, HyperplaneBucketsExpr, JaroWinklerExpr, KllMergeExpr, KllQuantileExpr, KllQuantilesAgg, KllSketchAgg, LuhnSumExpr, MinHashSigExpr, NormalizeTextExpr, QuantizeInt8Expr, SimHashExpr, VecDot, WordNgramsExpr, ZOrder2Expr}

/** SparkSessionExtensions installer — makes graft's native expressions
  * first-class session functions without any per-query registration:
  *
  *   spark.sql.extensions=graft.GraftExtensions
  *
  * (or `.withExtensions(new GraftExtensions)` on the builder). This is
  * the supported injection point for library expressions: they resolve
  * in SQL text, constant-fold, and participate in whole-stage codegen
  * exactly like built-ins. `Functions.register` remains as the
  * programmatic fallback for sessions graft doesn't construct. */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      FunctionIdentifier("normalize_text"),
      new ExpressionInfo(classOf[NormalizeTextExpr].getName, "normalize_text"),
      (children: Seq[Expression]) => NormalizeTextExpr(children.head)))
    ext.injectFunction((
      FunctionIdentifier("vec_dot"),
      new ExpressionInfo(classOf[VecDot].getName, "vec_dot"),
      (children: Seq[Expression]) => VecDot(children(0), children(1))))
    ext.injectFunction((
      FunctionIdentifier("luhn_sum"),
      new ExpressionInfo(classOf[LuhnSumExpr].getName, "luhn_sum"),
      (children: Seq[Expression]) => LuhnSumExpr(children.head)))
    ext.injectFunction((
      FunctionIdentifier("simhash64"),
      new ExpressionInfo(classOf[SimHashExpr].getName, "simhash64"),
      (children: Seq[Expression]) => SimHashExpr(children.head,
        if (children.length > 1) Functions.litInt(children(1), "simhash64 charN") else 5,
        if (children.length > 2) Functions.litInt(children(2), "simhash64 bits") else 63)))
    ext.injectFunction((
      FunctionIdentifier("minhash_sig"),
      new ExpressionInfo(classOf[MinHashSigExpr].getName, "minhash_sig"),
      (children: Seq[Expression]) => MinHashSigExpr(children.head,
        if (children.length > 1) Functions.litInt(children(1), "minhash_sig n") else 3,
        if (children.length > 2) Functions.litInt(children(2), "minhash_sig k") else 64)))
    ext.injectFunction((
      FunctionIdentifier("word_ngrams"),
      new ExpressionInfo(classOf[WordNgramsExpr].getName, "word_ngrams"),
      (children: Seq[Expression]) => WordNgramsExpr(children.head,
        if (children.length > 1) Functions.litInt(children(1), "word_ngrams n") else 3)))
    ext.injectFunction((
      FunctionIdentifier("lsh_buckets"),
      new ExpressionInfo(classOf[HyperplaneBucketsExpr].getName, "lsh_buckets"),
      (children: Seq[Expression]) => HyperplaneBucketsExpr(children.head,
        if (children.length > 1) Functions.litInt(children(1), "lsh_buckets tables") else 96,
        if (children.length > 2) Functions.litInt(children(2), "lsh_buckets bits") else 6,
        if (children.length > 3) Functions.litInt(children(3), "lsh_buckets dim") else 64,
        if (children.length > 4) Functions.litLong(children(4), "lsh_buckets seed") else 42L)))
    ext.injectFunction((
      FunctionIdentifier("bloom_might_contain"),
      new ExpressionInfo(classOf[BloomMightContainExpr].getName, "bloom_might_contain"),
      (children: Seq[Expression]) => BloomMightContainExpr(children(0),
        Functions.litBinary(children(1), "bloom_might_contain filter bytes"))))
    ext.injectFunction((
      FunctionIdentifier("quantize_i8_stats"),
      new ExpressionInfo(classOf[QuantizeInt8Expr].getName, "quantize_i8_stats"),
      (children: Seq[Expression]) => QuantizeInt8Expr(children.head)))
    ext.injectFunction((
      FunctionIdentifier("zorder2"),
      new ExpressionInfo(classOf[ZOrder2Expr].getName, "zorder2"),
      (children: Seq[Expression]) => ZOrder2Expr(children(0), children(1))))
    ext.injectFunction((
      FunctionIdentifier("jaro_winkler"),
      new ExpressionInfo(classOf[JaroWinklerExpr].getName, "jaro_winkler"),
      (children: Seq[Expression]) => JaroWinklerExpr(children(0), children(1))))
    ext.injectFunction((
      FunctionIdentifier("kll_quantiles"),
      new ExpressionInfo(classOf[KllQuantilesAgg].getName, "kll_quantiles"),
      (children: Seq[Expression]) => KllQuantilesAgg(children.head,
        children.tail.map(Functions.litDouble(_, "kll_quantiles rank")))))
    ext.injectFunction((
      FunctionIdentifier("kll_sketch"),
      new ExpressionInfo(classOf[KllSketchAgg].getName, "kll_sketch"),
      (children: Seq[Expression]) => KllSketchAgg(children.head)))
    ext.injectFunction((
      FunctionIdentifier("kll_merge"),
      new ExpressionInfo(classOf[KllMergeExpr].getName, "kll_merge"),
      (children: Seq[Expression]) => KllMergeExpr(children(0), children(1))))
    ext.injectFunction((
      FunctionIdentifier("kll_quantile"),
      new ExpressionInfo(classOf[KllQuantileExpr].getName, "kll_quantile"),
      (children: Seq[Expression]) => KllQuantileExpr(children(0), children(1))))
    // whole-plan rewrites, not functions: every high-threshold
    // jaro_winkler filter gets the provable length-ratio prune, and
    // every levenshtein ≤ k filter the provable length-difference
    // prune, injected ahead of the O(len²) scorers (see JaroPruneRule
    // / LevenshteinPruneRule)
    ext.injectOptimizerRule(_ => graft.plans.JaroPruneRule)
    ext.injectOptimizerRule(_ => graft.plans.LevenshteinPruneRule)
    // DataFrame-path metadata aggregates: an ungrouped, unfiltered
    // COUNT/MIN/MAX directly over a stats-backed store read folds from
    // the commit-time sidecars (the SQL path's V2 aggregate pushdown
    // has no V1 equivalent — this rule closes the asymmetry)
    ext.injectOptimizerRule(_ => org.apache.spark.sql.graft.MetadataAggregateRule)
    // SQL write surface: MERGE INTO <graft catalog>.<table> lowers to
    // the store's keyed upsert (see MergeIntoGraft — parse-time
    // interception, non-graft targets untouched)
    ext.injectParser((session, delegate) => new graft.plans.GraftSqlParser(session, delegate))
  }
}
