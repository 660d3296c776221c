package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.functions.{Functions, VecCentroid}
import graft.sources.Tables

class AnnSpec extends SparkSpec {
  private val dir = "/root/testdata/sf0.001"

  test("ANN top-10 equals brute-force top-10 (recall 1.0 on testdata)") {
    Functions.register(spark)
    val emb = Tables.embeddings(spark, dir)
    val brute = emb.filter(col("vec_id") =!= 0)
      .crossJoin(broadcast(emb.filter(col("vec_id") === 0).select(col("embedding").as("qv"))))
      .select(col("vec_id"), Functions.cosine(col("embedding"), col("qv")).as("sim"))
      .orderBy(col("sim").desc, col("vec_id")).limit(10)
      .collect().map(_.getLong(0)).toSeq
    val ann = Ann.annTopK(emb, "vec_id", "embedding", 0L, 10)
      .collect().map(_.getLong(0)).toSeq
    assert(ann == brute)
  }

  test("batched probe equals per-query probeTopK at every sf (recall 1.0 via the same index)") {
    Functions.register(spark)
    Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01").foreach { d =>
      val emb = Tables.embeddings(spark, d)
      val store = new TableStore(
        java.nio.file.Files.createTempDirectory("annbatch").toString)
      Ann.buildIndex(emb, "vec_id", "embedding", store, "ann")
      val batch = Ann.probeTopKBatch(emb, "vec_id", "embedding", store, "ann",
          queryIds = (0L until 5L), k = 5)
        .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
      (0L until 5L).foreach { q =>
        // brute-force reference, ranked on the same micro-rounded key
        // the batch ranks on — proves per-query recall 1.0 through
        // the index, not just batch == single-probe plumbing
        val brute = emb.filter(col("vec_id") =!= q)
          .crossJoin(broadcast(emb.filter(col("vec_id") === q)
            .select(col("embedding").as("qv"))))
          .select(col("vec_id"),
            round(Functions.cosine(col("embedding"), col("qv")) * 1000000d)
              .cast("long").as("sim6"))
          .orderBy(col("sim6").desc, col("vec_id")).limit(5)
          .collect().map(_.getLong(0)).toSeq
        val got = (1L to 5L).map(rk => batch((q, rk)))
        assert(got == brute, s"sf=$d q=$q: $got vs $brute")
      }
    }
  }

  test("lsh_buckets expression equals the relational explode+groupBy bucket index") {
    Functions.register(spark)
    val emb = Tables.embeddings(spark, dir)
    def asMap(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getInt(1)) -> r.getLong(2)).toMap
    val expr = asMap(Ann.bucketIndex(emb, "vec_id", "embedding"))
    val rel = asMap(Ann.bucketIndexRelational(emb, "vec_id", "embedding",
        Ann.hyperplanes(96, 6, 64))
      .select(col("id"), col("t"), col("b")))
    assert(expr == rel)
  }

  test("candidate set is a strict subset of the corpus (really approximate)") {
    Functions.register(spark)
    val emb = Tables.embeddings(spark, dir)
    val idx = Ann.bucketIndex(emb.filter(col("vec_id") =!= 0), "vec_id", "embedding")
    val probe = Ann.bucketIndex(emb.filter(col("vec_id") === 0), "vec_id", "embedding")
      .select(col("t").as("pt"), col("b").as("pb"))
    val nCand = idx.join(broadcast(probe), col("t") === col("pt") && col("b") === col("pb"))
      .select("id").distinct().count()
    val n = emb.count() - 1
    assert(nCand < n, s"ANN degenerated to brute force: $nCand of $n")
    assert(nCand > 0)
  }

  test("persisted bucket index probe equals the ephemeral annTopK result") {
    Functions.register(spark)
    val emb = Tables.embeddings(spark, dir)
    val store = new TableStore(
      java.nio.file.Files.createTempDirectory("ann-spec").toString)
    Ann.buildIndex(emb, "vec_id", "embedding", store, "ann")
    val probeDf = Ann.probeTopK(emb, "vec_id", "embedding", store, "ann", 0L, 10)
    // the probe's bucket pre-filter reaches the index scan as a pushed
    // IN (row-group skipping over the sorted layout) and the exact
    // (t,b) match is a codegen'd broadcast hash join
    val plan = probeDf.queryExecution.executedPlan.toString
    assert(plan.contains("In(b") || plan.contains("In(B"), plan.take(1500))
    assert(plan.contains("BroadcastHashJoin"), plan.take(1500))
    val probe = probeDf.collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    val ephemeral = Ann.annTopK(emb, "vec_id", "embedding", 0L, 10, dim = Some(64))
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(probe == ephemeral)
  }

  test("deriveBits: floor 6 on small corpora, +1 bit per doubling, capped") {
    assert(Ann.deriveBits(500) == 6)    // testdata sf0.01 — spec-pinned regime
    assert(Ann.deriveBits(2000) == 8)   // testdata sf0.1
    assert(Ann.deriveBits(1) == 6 && Ann.deriveBits(0) == 6)
    assert(Ann.deriveBits(1L << 40) == 28) // capped
    // monotone non-decreasing, never jumps by more than the doubling
    val bs = (1 to 24).map(i => Ann.deriveBits(1L << i))
    assert(bs == bs.sorted && bs.sliding(2).forall(p => p.last - p.head <= 1))
  }

  test("nearDupPairs (LSH-blocked, derived bits) equals the all-pairs top-20 on testdata") {
    Functions.register(spark)
    // sf0.1 matters most: n=2000 derives bits=8 (the other two derive
    // the old pinned 6), so this pins exactness AT the derived width.
    for (d <- Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01", "/root/testdata/sf0.1")) {
      val emb = Tables.embeddings(spark, d)
      val e = emb.select(col("vec_id"), col("embedding"),
        sqrt(Functions.dotd(col("embedding"), col("embedding"))).as("nrm"))
      val a = e.select(col("vec_id").as("idA"), col("embedding").as("ea"), col("nrm").as("na"))
      val b = e.select(col("vec_id").as("idB"), col("embedding").as("eb"), col("nrm").as("nb"))
      val brute = a.join(b, col("idA") < col("idB"))
        .select(col("idA"), col("idB"),
          round(Functions.dotd(col("ea"), col("eb")) / (col("na") * col("nb")), 6).as("sim"))
        .orderBy(col("sim").desc, col("idA"), col("idB")).limit(20)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
      val blocked = Ann.nearDupPairs(emb, "vec_id", "embedding", k = 20)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
      assert(blocked == brute, s"blocked != all-pairs at $d")
    }
  }

  test("candidate-slot volume grows ~linearly with corpus size (derived bits)") {
    Functions.register(spark)
    def slots(d: String): (Long, Long) = {
      val emb = Tables.embeddings(spark, d)
      val n = emb.count()
      val idx = Ann.bucketIndex(emb, "vec_id", "embedding",
        tables = Ann.deriveTables(n), bits = Ann.deriveBits(n))
      val lhs = idx.select(col("id").as("idA"), col("t"), col("b"))
      val rhs = idx.select(col("id").as("idB"), col("t").as("tB"), col("b").as("bB"))
      (n, lhs.join(rhs,
        col("t") === col("tB") && col("b") === col("bB") && col("idA") < col("idB")).count())
    }
    val (n1, c1) = slots("/root/testdata/sf0.01")
    val (n2, c2) = slots("/root/testdata/sf0.1")
    // fixed bits=6 would scale slots by (n2/n1)² = 16×; derived bits
    // must keep growth ~linear in n (2× headroom over proportional
    // for non-uniform bucket occupancy)
    assert(c2.toDouble / c1 <= 2.0 * n2.toDouble / n1,
      s"candidate slots grew super-linearly: n $n1->$n2, slots $c1->$c2")
  }

  test("deriveKnnBits: floor 2 on small groups, +1 bit per doubling, capped") {
    assert(Ann.deriveKnnBits(50) == 2)   // testdata sf0.001/0.01 group size
    assert(Ann.deriveKnnBits(218) == 4)  // testdata sf0.1 group size
    assert(Ann.deriveKnnBits(1) == 2 && Ann.deriveKnnBits(0) == 2)
    assert(Ann.deriveKnnBits(1L << 40) == 28) // capped
    val bs = (1 to 24).map(i => Ann.deriveKnnBits(1L << i))
    assert(bs == bs.sorted && bs.sliding(2).forall(p => p.last - p.head <= 1))
  }

  test("knnWithinLabel (LSH-blocked, derived params) equals the all-pairs top-3 on every sf") {
    Functions.register(spark)
    // sf0.1 matters most: g≈218 derives bits=4 (the small sfs derive
    // 2), so this pins per-vector exactness AT the derived width in
    // the hard regime (3rd-neighbor cosine down to 0.092).
    for (d <- Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01", "/root/testdata/sf0.1")) {
      val emb = Tables.embeddings(spark, d)
      val e = emb.select(col("vec_id"), col("label"), col("embedding"),
        sqrt(Functions.dotd(col("embedding"), col("embedding"))).as("nrm"))
      val a = e.toDF("vec_id", "label", "ea", "na")
      val b = e.toDF("nb_id", "label", "eb", "nb")
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("vec_id")).orderBy(col("sim6").desc, col("nb_id"))
      val brute = a.join(b, Seq("label"))
        .filter(col("vec_id") =!= col("nb_id"))
        .select(col("vec_id"), col("label"), col("nb_id"),
          round(Functions.dotd(col("ea"), col("eb")) / (col("na") * col("nb")) * 1000000d)
            .cast("long").as("sim6"))
        .withColumn("rk", row_number().over(w)).filter(col("rk") <= 3)
        .select(col("vec_id"), col("rk"), col("nb_id"), col("sim6"))
        .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getLong(3))).toSeq.sorted
      val blocked = Ann.knnWithinLabel(emb, "vec_id", "embedding", "label", 3)
        .select(col("vec_id"), col("rk").cast("int"), col("nb_id"), col("sim6"))
        .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getLong(3))).toSeq.sorted
      assert(blocked == brute, s"blocked != all-pairs at $d")
    }
  }

  test("knnWithinLabel recall margin: true top-3 pairs collide in many tables, mean >= 4") {
    // Exactness above is a yes/no gate; this pins the MARGIN: at the
    // derived (tables=128, bits=4) the hardest sf0.1 slot expects
    // ~13 colliding tables, so a mean anywhere near the >=1 cliff
    // would flag a parameter regression long before a miss occurs.
    Functions.register(spark)
    val d = "/root/testdata/sf0.1"
    val emb = Tables.embeddings(spark, d)
    val g = emb.groupBy(col("label")).count().agg(max(col("count"))).head.getLong(0)
    val (t, b) = (Ann.deriveKnnTables(g), Ann.deriveKnnBits(g))
    val idx = Ann.bucketIndex(emb, "vec_id", "embedding", t, b, 64, 42L, carry = Seq("label"))
    val e = emb.select(col("vec_id"), col("label"), col("embedding"),
      sqrt(Functions.dotd(col("embedding"), col("embedding"))).as("nrm"))
    val a = e.toDF("vec_id", "label", "ea", "na")
    val bb = e.toDF("nb_id", "label", "eb", "nb")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("vec_id")).orderBy(col("sim6").desc, col("nb_id"))
    val truePairs = a.join(bb, Seq("label"))
      .filter(col("vec_id") =!= col("nb_id"))
      .select(col("vec_id"), col("nb_id"),
        round(Functions.dotd(col("ea"), col("eb")) / (col("na") * col("nb")) * 1000000d)
          .cast("long").as("sim6"))
      .withColumn("rk", row_number().over(w)).filter(col("rk") <= 3)
      .select(least(col("vec_id"), col("nb_id")).as("idA"),
        greatest(col("vec_id"), col("nb_id")).as("idB"))
      .distinct()
    val collisions = idx.select(col("id").as("idA"), col("t"), col("b"))
      .join(idx.select(col("id").as("idB"), col("t").as("tB"), col("b").as("bB")),
        col("t") === col("tB") && col("b") === col("bB") && col("idA") < col("idB"))
      .groupBy("idA", "idB").agg(count(lit(1)).as("c"))
    val stats = truePairs.join(collisions, Seq("idA", "idB"), "left")
      .agg(min(coalesce(col("c"), lit(0L))).as("mn"),
        avg(coalesce(col("c"), lit(0L))).as("mean")).head
    assert(stats.getLong(0) >= 1, "a true top-3 pair never collides — exactness is luck")
    assert(stats.getDouble(1) >= 4.0, s"mean collision count ${stats.getDouble(1)} too thin")
  }

  test("knnWithinLabel candidate-slot volume grows ~linearly with corpus size (derived bits)") {
    Functions.register(spark)
    def slots(d: String): (Long, Long) = {
      val emb = Tables.embeddings(spark, d)
      val g = emb.groupBy(col("label")).count().agg(max(col("count"))).head.getLong(0)
      val idx = Ann.bucketIndex(emb, "vec_id", "embedding",
        Ann.deriveKnnTables(g), Ann.deriveKnnBits(g), 64, 42L, carry = Seq("label"))
      val n = emb.count()
      (n, idx.select(col("label"), col("id").as("idA"), col("t"), col("b"))
        .join(idx.select(col("label").as("lB"), col("id").as("idB"),
            col("t").as("tB"), col("b").as("bB")),
          col("label") === col("lB") && col("t") === col("tB") &&
            col("b") === col("bB") && col("idA") < col("idB")).count())
    }
    val (n1, c1) = slots("/root/testdata/sf0.01")
    val (n2, c2) = slots("/root/testdata/sf0.1")
    // label-only blocking scales slots by (n2/n1)² = 16×; group-
    // derived bits must keep growth ~linear (2× headroom for
    // non-uniform bucket occupancy)
    assert(c2.toDouble / c1 <= 2.0 * n2.toDouble / n1,
      s"knn candidate slots grew super-linearly: n $n1->$n2, slots $c1->$c2")
  }

  test("VecCentroid aggregator matches the exact decimal centroid within 1e-5") {
    val emb = Tables.embeddings(spark, dir)
    val agg = emb.groupBy(col("label"))
      .agg(VecCentroid.udaf(col("embedding")).as("c"))
      .select(col("label"), posexplode(col("c")).as(Seq("idx", "v")))
      .collect().map(r => (r.getInt(0), r.getInt(1)) -> r.getDouble(2)).toMap
    val exact = emb
      .select(col("label"), posexplode(col("embedding")).as(Seq("idx", "v")))
      .groupBy("label", "idx")
      .agg(Functions.davg(col("v").cast("double")).as("v"))
      .collect().map(r => (r.getInt(0), r.getInt(1)) -> r.getDouble(2)).toMap
    assert(agg.keySet == exact.keySet)
    // 1e-5: the exact path truncates each element at decimal scale 6
    agg.foreach { case (k, v) => assert(math.abs(v - exact(k)) < 1e-5, s"drift at $k") }
  }

  test("VecCentroid handles empty group shape: zero buffer merges are identity") {
    val s = spark; import s.implicits._
    val df = Seq((1, Seq(1.0f, 3.0f)), (1, Seq(3.0f, 5.0f)), (2, Seq(2.0f, 2.0f)))
      .toDF("label", "v").repartition(4)
    val got = df.groupBy("label").agg(VecCentroid.udaf(col("v")).as("c"))
      .collect().map(r => r.getInt(0) -> r.getSeq[Double](1)).toMap
    assert(got(1) == Seq(2.0, 4.0) && got(2) == Seq(2.0, 2.0))
  }
}
