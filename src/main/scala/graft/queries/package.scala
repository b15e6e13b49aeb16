package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Query-registry plumbing shared by all operator modules.
  *
  * Each module exposes a [[QueryModule]]: named `(SparkSession, sfDir) =>
  * DataFrame` entries plus, where SQL-expressible, an equivalent DuckDB
  * oracle query over the same parquet tables (driver contract,
  * SparkEntry.scala). SparkEntry concatenates all modules.
  */
package object queries {
  type Q = (SparkSession, String) => DataFrame
}

package queries {
  trait QueryModule {
    def defs: Map[String, Q]
    /** DuckDB SQL per query name; omit entries that aren't SQL-expressible
      * (driver then records a weaker rows-only check). */
    def oracle: Map[String, String]
  }
}
