package graft.etl

import graft.SparkSpec

class DqChecksSpec extends SparkSpec {

  test("dq_checks: one row per check, counts coherent, clean data clean") {
    val rows = Etl.dqChecks(spark, sfDir).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(rows.keySet == Set(
      "orders_pk_unique", "orders_custkey_fk", "lineitem_orderkey_fk",
      "lineitem_qty_positive", "orders_price_nonneg",
      "lineitem_ship_after_order"))
    rows.foreach { case (name, (checked, viol)) =>
      assert(checked > 0, s"$name checked nothing")
      assert(viol >= 0 && viol <= checked, s"$name violations out of range")
    }
    // the synthetic generator emits referentially-intact data: the
    // structural checks must come back clean (domain checks may not)
    assert(rows("orders_pk_unique")._2 == 0)
    assert(rows("orders_custkey_fk")._2 == 0)
    assert(rows("lineitem_orderkey_fk")._2 == 0)
  }
}
