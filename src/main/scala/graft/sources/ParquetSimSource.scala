package graft.sources

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DataType, LongType, TimestampNTZType, TimestampType}

/** Parquet-backed simulator of the OData entity source, over the driver
  * testdata tables (TESTDATA.md). Plays the role of the reference's HTTP
  * fetch (priorityDataSource.py:629-736) for the offline harness:
  *
  *   - entity scan  → parquet scan (columnar, footer-pruned)
  *   - `$filter`    → `df.filter(col >= ts)` — Catalyst pushes the
  *                    predicate into the parquet reader (`PushedFilters`)
  *   - `$expand`    → children nested as `<SUB>_SUBFORM`
  *                    `array<struct>` columns, built with a sorted
  *                    `collect_list` group + join (deterministic order)
  *   - `$top`       → `df.limit(n)`, applied to parents BEFORE the expand
  *                    join so a probe never scans the child table
  *
  * Scale notes (100 TB): the expand join shuffles both sides on the join
  * key; with the child table bucketed/partitioned by that key it is a
  * co-located join. Probes stay O(top) because the child side is
  * semi-join-pruned by the already-limited parent keys.
  */
object ParquetSimSource {

  /** A child ("subform") relation: child rows attach to the parent via
    * parentKey == childKey, ordered inside the array by `orderCol` so the
    * nested representation is deterministic. */
  final case class Subform(table: String, parentKey: String, childKey: String, orderCol: String)

  /** One simulated entity: backing table, PK columns, available subforms.
    * `nanosTs` lists event-time columns the source normalizes to
    * TIMESTAMP_NTZ regardless of the fixture's physical encoding. The
    * shim is schema-adaptive — it branches on the type the scan
    * actually produced:
    *
    *   - `LongType` — parquet TIMESTAMP(NANOS) read as raw INT64 nanos
    *     (`spark.sql.legacy.parquet.nanosAsLong=true`; Spark has no
    *     nanosecond timestamp type): filter on the raw nanos literal,
    *     then `div 1000 → timestamp_micros → NTZ`.
    *   - `TimestampNTZType` — parquet TIMESTAMP(MICROS,
    *     isAdjustedToUTC=false) read natively: no conversion, filter
    *     with an NTZ literal.
    *   - `TimestampType` — UTC-adjusted micros: filter with a
    *     timestamp literal, then cast to NTZ (identity wall clock
    *     under the blessed UTC session timezone). */
  final case class Relation(
      table: String,
      pk: Seq[String],
      subforms: Map[String, Subform] = Map.empty,
      nanosTs: Seq[String] = Nil)

  /** Naive wall-clock timestamp → epoch nanos (UTC), for pushing
    * predicates onto the raw INT64 nanos column. */
  def tsToNanos(ts: java.sql.Timestamp): Long = {
    val ldt = ts.toLocalDateTime
    ldt.toEpochSecond(java.time.ZoneOffset.UTC) * 1000000000L + ldt.getNano
  }

  /** Default registry mapping FIXTURES.md usage: ORDERS plays the
    * filtered entity with ORDERITEMS_SUBFORM; region/nation/customer play
    * small unfiltered (CTYPE-style) entities; events drives incremental
    * watermark semantics. */
  val defaultRelations: Map[String, Relation] = Map(
    "ORDERS" -> Relation("orders", Seq("o_orderkey"),
      Map("ORDERITEMS" -> Subform("lineitem", "o_orderkey", "l_orderkey", "l_linenumber"))),
    "LINEITEM" -> Relation("lineitem", Seq("l_orderkey", "l_linenumber")),
    "CUSTOMER" -> Relation("customer", Seq("c_custkey")),
    "SUPPLIER" -> Relation("supplier", Seq("s_suppkey")),
    "PART" -> Relation("part", Seq("p_partkey")),
    "NATION" -> Relation("nation", Seq("n_nationkey")),
    "REGION" -> Relation("region", Seq("r_regionkey")),
    "EVENTS" -> Relation("events", Seq("event_id"), nanosTs = Seq("ts")),
    "DOCUMENTS" -> Relation("documents", Seq("doc_id")),
    "EMBEDDINGS" -> Relation("embeddings", Seq("vec_id")))
}

final class ParquetSimSource(
    spark: SparkSession,
    dataDir: String,
    relations: Map[String, ParquetSimSource.Relation] = ParquetSimSource.defaultRelations)
  extends EntitySource {

  import ParquetSimSource._

  private def table(name: String): DataFrame =
    spark.read.parquet(s"$dataDir/$name.parquet")

  def relationOf(entityId: String): Relation =
    relations.getOrElse(entityId.toUpperCase,
      Relation(entityId.toLowerCase, Nil))

  /** The entity scan with filter/top pushdown and the nanos shim —
    * everything except the expand. */
  private def baseScan(rel: Relation, req: FetchRequest): DataFrame = {
    var df = table(rel.table)

    // Predicate pushdown: applied directly on the scan so Catalyst
    // emits it as a parquet PushedFilter (SURVEY.md §4). Event-time
    // columns branch on the physically-scanned type (see Relation
    // scaladoc): raw-nanos fixtures filter on an INT64 literal,
    // native-timestamp fixtures on a timestamp literal — both push
    // into the footer/page index. Column lookups are CASE-INSENSITIVE
    // (matching Spark's own col() resolution): a fixture regen that
    // re-cases a column must not silently skip the event-time branch.
    def scannedType(d: DataFrame, c: String): Option[DataType] =
      d.schema.fields.find(_.name.equalsIgnoreCase(c)).map(_.dataType)
    req.filter.foreach { case (field, ts) =>
      val f = field.toLowerCase
      df = df.filter {
        if (rel.nanosTs.contains(f) && scannedType(df, f).isDefined) {
          // Watermarks are observed from the micros-truncated NTZ view
          // of this column, so strict `>` must mean "past the observed
          // MICROSECOND" — rows inside the watermark's microsecond are
          // already loaded and must not re-fetch. On the raw-nanos
          // branch that is `>= wm + 1000ns`; on the native branches
          // micros IS the storage resolution, so it is exactly `>`.
          scannedType(df, f) match {
            case Some(LongType) =>
              if (req.exclusive) col(f) >= lit(tsToNanos(ts) + 1000L)
              else col(f) >= lit(tsToNanos(ts))
            case Some(TimestampNTZType) =>
              val l = lit(ts.toLocalDateTime)
              if (req.exclusive) col(f) > l else col(f) >= l
            case _ =>
              if (req.exclusive) col(f) > lit(ts) else col(f) >= lit(ts)
          }
        } else {
          if (req.exclusive) col(f) > lit(ts) else col(f) >= lit(ts)
        }
      }
    }

    // Limit pushdown: parents first, so expand below only ever joins
    // against the limited key set.
    req.top.foreach(n => df = df.limit(n))

    // NTZ normalization (after filter/top so both push down). Sessions
    // run with UTC session timezone, so the LTZ→NTZ cast is the
    // identity on the stored naive wall clock.
    rel.nanosTs.foldLeft(df)((d, c) =>
      scannedType(d, c) match {
        case Some(LongType) =>
          d.withColumn(c, timestamp_micros(expr(s"`$c` div 1000")).cast("timestamp_ntz"))
        case Some(TimestampType) =>
          d.withColumn(c, col(c).cast("timestamp_ntz"))
        case _ => d // NTZ already, or the column is absent from this scan
      })
  }

  private def subformOf(rel: Relation, entityId: String, sub: String): Subform =
    rel.subforms.getOrElse(sub.toUpperCase,
      throw new IllegalArgumentException(s"entity $entityId has no subform $sub"))

  override def fetch(req: FetchRequest): DataFrame = {
    val rel = relationOf(req.entityId)
    req.expand.foldLeft(baseScan(rel, req)) { (parent, sub) =>
      nest(parent, subformOf(rel, req.entityId, sub),
        s"${sub.toUpperCase}_SUBFORM", probe = req.top.isDefined)
    }
  }

  /** Flat expand: children served as direct scans joined by key — no
    * collect_list, no array materialization. When the parent fetch is
    * restricted (filter/top), the child scan is semi-join-pruned to the
    * fetched parent keys; an UNRESTRICTED parent fetch trusts the
    * backing store's referential integrity (children without parents
    * cannot arrive via `$expand`, and the warehouse tables are loaded
    * from exactly such fetches), so the child scan runs with no join at
    * all. At 100 TB this turns the engine's biggest shuffle into a
    * linear scan. */
  override def fetchFlat(req: FetchRequest): Option[FlatFetch] = {
    val rel = relationOf(req.entityId)
    val parent = baseScan(rel, req)
    val restricted = req.filter.isDefined || req.top.isDefined
    val children = req.expand.map { sub =>
      val sf = subformOf(rel, req.entityId, sub)
      var child = table(sf.table)
      if (restricted) {
        val keys = parent.select(col(sf.parentKey).as(sf.childKey)).distinct()
        // a probe's key set is tiny — broadcast it; a filtered fetch's
        // key set is data-sized — let AQE pick the join strategy
        child = child.join(
          if (req.top.isDefined) broadcast(keys) else keys,
          Seq(sf.childKey), "left_semi")
      }
      sub.toUpperCase -> FlatChild(child, sf.parentKey, sf.childKey)
    }.toMap
    Some(FlatFetch(parent, children))
  }

  /** Attach child rows as a deterministic array<struct> column. */
  private def nest(parent: DataFrame, sf: Subform, colName: String, probe: Boolean): DataFrame = {
    var child = table(sf.table)
    // A probe (`$top`) fetched only a handful of parents: semi-join-prune
    // the child scan down to those keys (broadcast the tiny parent side)
    // instead of grouping the whole child table.
    if (probe) {
      val keys = broadcast(parent.select(col(sf.parentKey).as(sf.childKey)).distinct())
      child = child.join(keys, Seq(sf.childKey), "left_semi")
    }
    val structCols: Array[Column] =
      (sf.orderCol +: child.columns.filterNot(_ == sf.orderCol).toSeq).map(col(_)).toArray
    val nested = child
      .groupBy(col(sf.childKey))
      // sort_array over struct(orderCol, ...) gives a deterministic
      // in-array order regardless of shuffle arrival order.
      .agg(sort_array(collect_list(struct(structCols.toIndexedSeq: _*))).as(colName))
    parent.join(nested, parent(sf.parentKey) === nested(sf.childKey), "left")
      .drop(nested(sf.childKey))
  }
}
