package graft.operators

import graft.SparkSpec
import java.sql.Timestamp

/** [[Constraints.checks]] on corrupted fixtures — the driver corpus is
  * clean, so the nonzero counting paths are certified here.
  */
class ConstraintsSpec extends SparkSpec {
  import spark.implicits._

  test("every violation class is counted, clean checks pass") {
    val customer = Seq(
      (1L, "a"), (2L, "b"), (2L, "dup")) // duplicate key
      .toDF("c_custkey", "c_name")
    val ts = Timestamp.valueOf("2024-01-01 00:00:00")
    val orders = Seq(
      (10L, 1L, "F", Option(ts)),
      (11L, 2L, "X", None),       // bad status + null date
      (12L, 99L, "O", Option(ts))) // orphan customer
      .toDF("o_orderkey", "o_custkey", "o_orderstatus", "o_orderdate")
    val lineitem = Seq(
      (10L, 1.0, 0.05), (10L, -2.0, 0.05), // non-positive quantity
      (99L, 3.0, 1.5))                     // orphan order + bad discount
      .toDF("l_orderkey", "l_quantity", "l_discount")

    val got = Constraints.checks(customer, orders, lineitem)
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getBoolean(2)))
      .toMap
    assert(got("unique_customer_key") == ((1L, false)))
    assert(got("unique_orders_key") == ((0L, true)))
    assert(got("not_null_orders_date") == ((1L, false)))
    assert(got("accepted_values_orders_status") == ((1L, false)))
    assert(got("fk_orders_customer") == ((1L, false)))
    assert(got("fk_lineitem_orders") == ((1L, false)))
    assert(got("domain_lineitem_quantity_positive") == ((1L, false)))
    assert(got("domain_lineitem_discount") == ((1L, false)))
    assert(got.size == 8)
  }
}
