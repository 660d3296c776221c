package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Mondrian multidimensional k-anonymization (LeFevre, DeWitt &
  * Ramakrishnan, ICDE'06) — the ENFORCEMENT half of the privacy
  * family (a18_kanonymity audits; this produces a release): greedy
  * recursive median splits over two numeric quasi-identifiers until
  * no partition can split without dropping below k members, then
  * each partition generalizes to its attribute ranges.
  *
  * Deterministic by construction, so the result is oracle-gateable:
  * the split attribute is the wider raw integer range (ties → the
  * first attribute), the split value is the LOWER median (the
  * (n+1)/2-th smallest value of the multiset — well-defined under
  * duplicates regardless of sort-tie order), the left half takes
  * `value ≤ median`, and a split commits only if BOTH halves keep
  * ≥ k rows. Rounds run a FIXED unroll (a round with no eligible
  * split is the identity, so rounds past the fixpoint are no-ops —
  * the a16_communities_full gating discipline) and the DuckDB oracle
  * replays the identical rounds relationally.
  *
  * Scale shape per round: one partition-stats aggregate, ONE grouped
  * lower-median via the distributed rank apparatus
  * (`Percentiles.lowerMedian` — range shuffle + counts, no
  * per-partition sort materialization even when round 1's single
  * partition spans the corpus), one halves aggregate, one relabel
  * join. Rounds needed ≈ log₂(n/k); state is one (pid, a, b) row per
  * record throughout.
  */
object Mondrian {

  /** Largest per-group row count for which the round's lower median is
    * taken from a VALUE HISTOGRAM (one grouped count aggregate — shuffle
    * bytes are distinct (group, value) pairs, map-side combined — plus a
    * cumulative window whose per-group partition holds at most that many
    * DISTINCT values). Above it, a single window partition could no
    * longer be assumed task-sized, so the round falls back to the
    * range-shuffle rank apparatus (`Percentiles.lowerMedian`), which
    * never materializes a per-group sort. Group sizes only shrink as
    * rounds split, so at 100 TB the first O(log(n/T)) rounds take the
    * rank path and the (many) remaining rounds the cheap one. */
  val HistMaxGroup: Long = 4000000L

  /** Split `df`'s (aCol, bCol) integer quasi-identifiers into
    * partitions of ≥ k rows. Output: (mpid, va, vb) — one row per
    * input row with its final partition id. (If the WHOLE corpus has
    * fewer than k rows, the root partition is released as-is — there
    * is no k-anonymous release of such a corpus; suppress upstream.)
    *
    * Round shape (r13 optimization — identical results, pinned by the
    * unchanged a18_mondrian oracle and MondrianSpec):
    *  - per-group stats feed the corpus via a BROADCAST join (group
    *    count ≤ n/k rows), never a shuffled one;
    *  - ONE scalar pass over the stats frame yields the round's group
    *    count (fixpoint detector: a split strictly increases it, so an
    *    unchanged count means the previous round was the identity and
    *    every later round would be too — stop instead of unrolling the
    *    remaining no-ops; the DuckDB oracle's fixed unroll is identical
    *    because identity rounds are no-ops) and the max group size (the
    *    histogram-vs-rank guard above);
    *  - median + left-half count + group count come from ONE histogram
    *    aggregate and ONE cumulative window over it: the lower median
    *    is the unique value whose inclusive cumulative count first
    *    reaches (n+1) div 2, and nleft IS that cumulative count — no
    *    second shuffle, no mid-round materialization of the corpus
    *    (the old form localCheckpoint'ed withSel and paid the rank
    *    apparatus' range shuffle + counts + offsets broadcast every
    *    round: 196 Spark jobs at 14 rounds; this shape plans 3 shuffles
    *    a round and converges early). */
  def partitionIds(df: DataFrame, aCol: String, bCol: String, k: Int,
      rounds: Int, histMaxGroup: Long = HistMaxGroup): DataFrame = {
    require(k >= 2 && rounds >= 1)
    import org.apache.spark.sql.expressions.Window
    var parts = df
      .select(lit(1L).as("mpid"), col(aCol).cast("long").as("va"),
        col(bCol).cast("long").as("vb"))
      .localCheckpoint(true)
    var prevGroups = -1L
    var r = 0
    var fixed = false
    while (r < rounds && !fixed) {
      val stats = parts.groupBy("mpid").agg(count(lit(1)).as("cnt"),
        (max(col("va")) - min(col("va"))).as("ra"),
        (max(col("vb")) - min(col("vb"))).as("rb"))
      val srow = stats.agg(count(lit(1)), max(col("cnt"))).head()
      // empty input: no groups, max(cnt) is NULL — return the (empty)
      // frame instead of reading the null (ADVICE r13: the pre-r13
      // loop handled an empty corpus gracefully; keep that)
      if (srow.getLong(0) == 0L) return parts
      val (nGroups, maxCnt) = (srow.getLong(0), srow.getLong(1))
      if (nGroups == prevGroups) fixed = true
      else {
        prevGroups = nGroups
        val withSel = parts.join(broadcast(stats), "mpid")
          .withColumn("attr_a", col("ra") >= col("rb"))
          .withColumn("valsel", when(col("attr_a"), col("va")).otherwise(col("vb")))
          .withColumn("rng", when(col("attr_a"), col("ra")).otherwise(col("rb")))
        val med =
          if (maxCnt <= histMaxGroup) {
            val hist = withSel.groupBy(col("mpid"), col("valsel"))
              .agg(count(lit(1)).as("c"))
            val wAll = Window.partitionBy(col("mpid"))
            val wCum = Window.partitionBy(col("mpid")).orderBy(col("valsel"))
              .rowsBetween(Window.unboundedPreceding, 0)
            hist
              .withColumn("cum", sum(col("c")).over(wCum))
              .withColumn("n", sum(col("c")).over(wAll))
              // distinct values ⇒ cum strictly increases ⇒ exactly one
              // row straddles the target rank (n+1) div 2
              .filter(expr("cum - c < (n + 1) div 2 and (n + 1) div 2 <= cum"))
              .select(col("mpid"), col("valsel").as("med"), col("cum").as("nleft"))
          } else {
            val m = Percentiles.lowerMedian(withSel, Seq("mpid"), "valsel", "med")
            withSel.join(m, "mpid").groupBy("mpid")
              .agg(max(col("med")).as("med"),
                sum(when(col("valsel") <= col("med"), 1L).otherwise(0L)).as("nleft"))
          }
        parts = withSel.join(broadcast(med), "mpid")
          .withColumn("split",
            col("cnt") >= 2L * k && col("rng") > 0L &&
              col("nleft") >= k.toLong && (col("cnt") - col("nleft")) >= k.toLong)
          .select(
            when(col("split"),
              col("mpid") * 2L + when(col("valsel") > col("med"), 1L).otherwise(0L))
              .otherwise(col("mpid")).as("mpid"),
            col("va"), col("vb"))
          .localCheckpoint(true)
        r += 1
      }
    }
    parts
  }

  /** The released generalization: one row per final partition with
    * its attribute ranges and member count (every count ≥ k by
    * construction). Partition ids are internal — the release orders
    * by the ranges themselves. */
  def anonymize(df: DataFrame, aCol: String, bCol: String, k: Int,
      rounds: Int): DataFrame =
    partitionIds(df, aCol, bCol, k, rounds)
      .groupBy("mpid")
      .agg(count(lit(1)).as("n"),
        min(col("va")).as("a_lo"), max(col("va")).as("a_hi"),
        min(col("vb")).as("b_lo"), max(col("vb")).as("b_hi"))
      .drop("mpid")
      .orderBy(col("a_lo"), col("a_hi"), col("b_lo"), col("b_hi"), col("n"))

  /** DuckDB replay: chained CTEs computing the IDENTICAL `rounds`
    * rounds over a seed CTE named `p0` with columns (pid, va, vb).
    * Every CTE is MATERIALIZED: each round references its
    * predecessor several times, and DuckDB's default inlining would
    * otherwise expand the reference tree exponentially (the first
    * cut exhausted file handles re-opening the source parquet ~3^14
    * times). Returns the fragment to splice after `p0` (starts with
    * a comma); the final state is CTE `p{rounds}`. */
  def oracleCtes(k: Int, rounds: Int): String =
    (1 to rounds).map { r =>
      val p = r - 1
      s"""s$r AS MATERIALIZED (SELECT pid, COUNT(*) AS cnt,
         |    MAX(va) - MIN(va) AS ra, MAX(vb) - MIN(vb) AS rb
         |  FROM p$p GROUP BY 1),
         |w$r AS MATERIALIZED (SELECT p.pid, p.va, p.vb, s.cnt,
         |    CASE WHEN s.ra >= s.rb THEN p.va ELSE p.vb END AS valsel,
         |    CASE WHEN s.ra >= s.rb THEN s.ra ELSE s.rb END AS rng
         |  FROM p$p p JOIN s$r s USING (pid)),
         |m$r AS MATERIALIZED (SELECT pid, valsel AS med FROM (
         |    SELECT pid, valsel, cnt,
         |      row_number() OVER (PARTITION BY pid ORDER BY valsel) AS rk
         |    FROM w$r)
         |  WHERE rk = (cnt + 1) // 2),
         |h$r AS MATERIALIZED (SELECT w.pid,
         |    SUM(CASE WHEN w.valsel <= m.med THEN 1 ELSE 0 END) AS nleft
         |  FROM w$r w JOIN m$r m USING (pid) GROUP BY 1),
         |p$r AS MATERIALIZED (SELECT
         |    CASE WHEN w.cnt >= 2 * $k AND w.rng > 0
         |              AND h.nleft >= $k AND w.cnt - h.nleft >= $k
         |         THEN w.pid * 2 + (CASE WHEN w.valsel > m.med THEN 1 ELSE 0 END)
         |         ELSE w.pid END AS pid, w.va, w.vb
         |  FROM w$r w JOIN m$r m USING (pid) JOIN h$r h USING (pid))""".stripMargin
    }.mkString(",\n", ",\n", "")
}
