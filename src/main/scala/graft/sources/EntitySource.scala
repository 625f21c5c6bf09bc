package graft.sources

import java.sql.Timestamp

import org.apache.spark.sql.DataFrame

/** A source-side fetch with the reference's three pushdowns
  * (SURVEY.md §2.1 S1-S4):
  *
  *   - `filter`: `$filter=<field> ge <ts>` — server-side predicate
  *     (priorityDataSource.py:646-675)
  *   - `expand`: `$expand=<SUB>_SUBFORM,...` — children arrive nested
  *     inline as array-of-struct columns (priorityDataSource.py:687-693)
  *   - `top`: `$top=N` probe (priorityDataSource.py:699-711)
  */
final case class FetchRequest(
    entityId: String,
    filter: Option[(String, Timestamp)] = None,
    expand: Seq[String] = Nil,
    top: Option[Int] = None)

/** Abstraction over where entities come from.
  *
  * Implementations:
  *   - [[ParquetSimSource]] — offline harness over `/root/testdata`
  *     parquet, building nested frames for `expand`.
  *   - Production design: a DataSource V2 `TableProvider` implementing
  *     `SupportsPushDownFilters` / `SupportsPushDownLimit` whose
  *     `PartitionReader`s issue paged OData GETs executor-side, so a
  *     1000-executor cluster fetches key-ranges in parallel instead of
  *     the reference's serial driver loop (priorityDataSource.py:161).
  *     Out of scope offline (zero egress); the interface is the contract.
  */
trait EntitySource {
  def fetch(req: FetchRequest): DataFrame

  /** Connectivity probe — the analog of `$top=1` smoke tests
    * (app.py:65-71). Returns the row count observed (0 or 1). */
  def probe(entityId: String): Long =
    fetch(FetchRequest(entityId, top = Some(1))).count()
}
