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
    top: Option[Int] = None,
    /** Strict `>` instead of `>=` — used for incremental fetches whose
      * watermark is the max(filterField) observed by the previous run,
      * so boundary rows are not re-appended every cycle. */
    exclusive: Boolean = false)

/** One expanded child served FLAT (its own frame) instead of nested:
  * `df` joins to the parent via `parentKey == childKey`. */
final case class FlatChild(df: DataFrame, parentKey: String, childKey: String)

/** Flat fetch result: the parent frame (no subform columns) plus each
  * expanded child as its own frame, keyed by subform name. Children are
  * independent lazy plans — a consumer that only reads the parent never
  * executes (or scans) the child side at all. */
final case class FlatFetch(parent: DataFrame, children: Map[String, FlatChild])

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

  /** Flat-capable sources serve expanded children as separate frames,
    * skipping the nest(collect_list)→explode round-trip entirely — at
    * scale that round-trip is a full child-table shuffle plus a per-key
    * array materialization that OOMs on skewed parents (a nested API
    * artifact, not a semantic requirement). `None` = this source only
    * produces nested frames; callers fall back to fetch + explode. */
  def fetchFlat(req: FetchRequest): Option[FlatFetch] = None

  /** Connectivity probe — the analog of `$top=1` smoke tests
    * (app.py:65-71). Returns the row count observed (0 or 1). */
  def probe(entityId: String): Long =
    fetch(FetchRequest(entityId, top = Some(1))).count()
}
