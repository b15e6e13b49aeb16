package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Cross-engine-exact numeric aggregation.
  *
  * The driver's correctness gate hash-compares Spark results against a
  * DuckDB oracle. Summing doubles is order-dependent, and Spark's partial
  * aggregation order differs from DuckDB's — so any `sum(double)` is a
  * flaky hash. All testdata monetary columns are 2-decimal values stored
  * as doubles (FIXTURES.md §2), so we route aggregation through exact
  * DECIMAL arithmetic and cast the final result back to double: both
  * engines compute the identical exact decimal, hence identical double
  * bits, independent of partition/accumulation order.
  *
  * DECIMAL(12,2) inputs keep every intermediate product within DECIMAL(38)
  * in both engines (12+12+1=25 for one product, +12+1=38 for two), so no
  * engine-specific precision-loss rounding kicks in.
  */
object Exact {
  private def dec(c: Column): Column = c.cast("decimal(12,2)")

  /** Exact sum of a 2-decimal double column, returned as double. */
  def decSum(c: Column): Column = sum(dec(c)).cast("double")

  /** Exact mean: exact decimal sum divided by count, in double. */
  def decAvg(c: Column): Column =
    sum(dec(c)).cast("double") / count(c)

  /** TPC-H style discounted revenue: SUM(extprice * (1 - discount)). */
  def revenue(extPrice: Column, discount: Column): Column =
    sum(dec(extPrice) * (lit(1) - dec(discount))).cast("double")

  /** Discounted + taxed charge: SUM(extprice * (1-disc) * (1+tax)). */
  def charge(extPrice: Column, discount: Column, tax: Column): Column =
    sum(dec(extPrice) * (lit(1) - dec(discount)) * (lit(1) + dec(tax)))
      .cast("double")

  /** Exact integer CENTS of a 2-decimal double money column — the
    * fixed-point projection the whole exact-quantile/CDC family keys
    * its arithmetic on. One definition (the suite's cross-engine
    * exactness hinges on this idiom staying identical everywhere); the
    * DuckDB mirror is [[sqlCents]]. */
  def cents(c: Column): Column = (dec(c) * 100).cast("long")

  /** Exact second moments for variance/correlation: Σx² and Σxy as
    * DECIMAL sums cast to double. Spark's stddev_samp/corr accumulate
    * doubles in partition order — nondeterministic under a hash gate —
    * while moments are order-independent, and the closed-form double
    * evaluation on top is a fixed IEEE expression both engines compute
    * bit-identically. */
  def decSumSq(c: Column): Column = sum(dec(c) * dec(c)).cast("double")
  def decSumProd(a: Column, b: Column): Column = sum(dec(a) * dec(b)).cast("double")

  /** DuckDB SQL fragments mirroring the expressions above. */
  def sqlDec(c: String): String = s"CAST($c AS DECIMAL(12,2))"
  def sqlCents(c: String): String =
    s"CAST(${sqlDec(c)} * 100 AS BIGINT)"
  def sqlDecSum(c: String): String = s"CAST(SUM(${sqlDec(c)}) AS DOUBLE)"
  def sqlDecAvg(c: String): String =
    s"CAST(SUM(${sqlDec(c)}) AS DOUBLE) / COUNT($c)"
  def sqlRevenue(ep: String, disc: String): String =
    s"CAST(SUM(${sqlDec(ep)} * (1 - ${sqlDec(disc)})) AS DOUBLE)"
  def sqlCharge(ep: String, disc: String, tax: String): String =
    s"CAST(SUM(${sqlDec(ep)} * (1 - ${sqlDec(disc)}) * (1 + ${sqlDec(tax)})) AS DOUBLE)"
  /** First operand widened to DECIMAL(24,2): DuckDB executes a
    * (12,2)×(12,2) multiply on INT64 storage and OVERFLOWS once both
    * operands pass ~10⁹ (the r11 adversarial 9999999999.99 balances) —
    * the widened operand forces the INT128 path, matching Spark's
    * (25,4) exact product. Same digits, same double. */
  def sqlDecSumSq(c: String): String =
    s"CAST(SUM(CAST($c AS DECIMAL(24,2)) * ${sqlDec(c)}) AS DOUBLE)"
  def sqlDecSumProd(a: String, b: String): String =
    s"CAST(SUM(CAST($a AS DECIMAL(24,2)) * ${sqlDec(b)}) AS DOUBLE)"
}
