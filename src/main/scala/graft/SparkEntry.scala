package graft
import org.apache.spark.sql.{SparkSession, DataFrame}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` is the oracle-checked operator inventory (one entry per
  * implemented operator family, graft.queries.Queries); `oracleSql` the
  * equivalent DuckDB SQL (graft.queries.Oracles). Keys must match;
  * column names/types are aligned on both sides for hash-stable compares.
  */
object SparkEntry {

  /** Flagship: the engine's fetch→normalize slice over sf0.001 —
    * ORDERS with ORDERITEMS expanded, normalized into the lowercased,
    * PK-cast parent frame. Driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    queries("p1_parent_projection")(spark, "/root/testdata/sf0.001")

  /** One per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    graft.queries.Queries.all

  /** For each key in `queries`, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted keys get a rows-only check. */
  def oracleSql: Map[String, String] = graft.queries.Oracles.all
}
