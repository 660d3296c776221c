package graft.queries

import graft.SparkSpec

/** Pins `a6_ind_discovery` semantics on the star schema: the real FK
  * edges must be discovered (IND holds), a key that is NOT a subset
  * must not be, and the overlap counts must be consistent with the
  * per-column distinct counts. */
class IndDiscoverySpec extends SparkSpec {

  test("IND discovery finds the star schema's FK edges and rejects non-edges (sf0.001)") {
    val s = spark
    val out = LifecycleQueries.all("a6_ind_discovery")(s, "/root/testdata/sf0.001")
      .collect()
      .map(r => ((r.getString(0), r.getString(1)),
        (r.getLong(2), r.getLong(3), r.getInt(4)))).toMap

    val mustHold = Seq(
      ("nation.n_regionkey", "region.r_regionkey"),
      ("customer.c_nationkey", "nation.n_nationkey"),
      ("supplier.s_nationkey", "nation.n_nationkey"),
      ("orders.o_custkey", "customer.c_custkey"),
      ("lineitem.l_orderkey", "orders.o_orderkey"),
      ("lineitem.l_partkey", "part.p_partkey"),
      ("lineitem.l_suppkey", "supplier.s_suppkey"))
    for (fk <- mustHold) {
      assert(out.contains(fk), s"$fk missing from the report")
      assert(out(fk)._3 == 1, s"$fk should hold: ${out(fk)}")
    }
    // orderkeys outnumber custkeys — containment the other way is impossible
    val non = ("orders.o_orderkey", "customer.c_custkey")
    assert(!out.contains(non) || out(non)._3 == 0, s"$non must not hold")
    // internal consistency: overlap never exceeds the child's distinct count
    out.foreach { case (pair, (nChild, nOverlap, holds)) =>
      assert(nOverlap <= nChild, s"$pair overlap $nOverlap > distinct $nChild")
      assert((holds == 1) == (nOverlap == nChild), s"$pair holds flag inconsistent")
    }
  }
}
