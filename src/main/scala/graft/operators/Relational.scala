package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** The relational generalization (SURVEY §2.4 J-1/J-2, §2.7, M2): the full
  * built-in join surface over the TPC-H-ish star schema.
  *
  * Scale posture (100 TB): dimension tables (region 5, nation 25, customer
  * ≤ 0.15% of lineitem) are explicitly `broadcast()` so the only shuffle
  * is the fact⋈orders equi-join, which AQE handles (skew split + partition
  * coalescing). No driver-side collects; every aggregate is partial+final.
  */
object Relational {

  /** lineitem ⋈ orders ⋈ customer ⋈ nation ⋈ region, dims broadcast.
    * The canonical J-1 star-join surface (reference enrichment is the same
    * left-outer shape, /root/reference/app.py:222-259). */
  def starJoin(s: SparkSession, d: String): DataFrame = {
    val li = Tables.lineitem(s, d)
    val o  = Tables.orders(s, d)
    val c  = Tables.customer(s, d)
    val n  = Tables.nation(s, d)
    val r  = Tables.region(s, d)
    li.join(o, li("l_orderkey") === o("o_orderkey"))
      .join(broadcast(c), o("o_custkey") === c("c_custkey"))
      .join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
      .join(broadcast(r), n("n_regionkey") === r("r_regionkey"))
  }

  /** lineitem enriched with part + supplier dims (both broadcast). */
  def partSupplierJoin(s: SparkSession, d: String): DataFrame = {
    val li = Tables.lineitem(s, d)
    li.join(broadcast(Tables.part(s, d)), li("l_partkey") === col("p_partkey"))
      .join(broadcast(Tables.supplier(s, d)),
        li("l_suppkey") === col("s_suppkey"))
  }
}
