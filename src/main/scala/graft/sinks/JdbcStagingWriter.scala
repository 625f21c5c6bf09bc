package graft.sinks

import java.util.Properties

import org.apache.spark.sql.{DataFrame, Observation, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

import graft.model.EntityMeta

/** JDBC staging sink — the production load path of the reference
  * (`df.to_sql('stg_'+name, …, dtype=<typed cols>)`,
  * priorityDataSource.py:847-889): `df.write.jdbc` with
  * `createTableColumnTypes` carrying the warehouse column types derived
  * from the metadata catalog, so first-write table creation is TYPED
  * (PK→VARCHAR(255), NUMERIC decimals, TIMESTAMP dates) instead of
  * Spark's lowest-common-denominator inference.
  *
  * Scale notes: `df.write.jdbc` opens one connection per partition and
  * batches inserts (`batchsize` option); `numPartitions` caps the
  * connection fan-in so a 1000-partition frame doesn't open 1000
  * connections against the warehouse. Records written are observed on
  * the write job (no re-count round trip). `insertBatchSize` is the
  * rows-per-executeBatch knob on every write this sink performs —
  * Spark's default is 1,000, which at bulk-load volume spends most of
  * the wall on driver↔warehouse round trips; 10,000 is the
  * conventional bulk setting (r15 measurement on the k14 gate:
  * 3×150k-row staging loads + promote, 5.8 s → 3.6 s). Parameterized,
  * not hard-coded: against a remote warehouse size it to row width ×
  * batch ≪ warehouse packet/transaction limits.
  */
final class JdbcStagingWriter(
    spark: SparkSession,
    url: String,
    props: Properties = new Properties,
    typeOverrides: Map[String, String] = Map.empty,
    maxConnections: Int = 8,
    registry: Option[graft.catalog.SchemaRegistry] = None,
    insertBatchSize: Int = 10000) extends EntityWriter {

  /** Warehouse column type for one catalog field: the reference's
    * dtype-dict semantics (sqlDwh.py:453-466) — PK columns are always
    * VARCHAR(255) (sqlDwh.py:346-350), everything else comes from the
    * type-mapping pass, with audit columns appended by the caller. */
  def columnType(meta: EntityMeta, fieldName: String): String = {
    val f = meta.fields.find(_.fieldName.equalsIgnoreCase(fieldName))
      .getOrElse(throw new IllegalArgumentException(
        s"${meta.id} has no field $fieldName"))
    if (f.keyFlag) "VARCHAR(255)"
    else typeOverrides.getOrElse(f.fieldName.toLowerCase,
      f.targetDataType.map(widen).getOrElse("VARCHAR(255)"))
  }

  /** Bare warehouse names widened to creatable column types (dialects
    * need a length/precision on VARCHAR/NUMERIC). */
  private def widen(t: String): String = t.toUpperCase match {
    case "VARCHAR" => "VARCHAR(255)"
    case "NUMERIC" => "NUMERIC(31,6)"
    case other     => other
  }

  /** The `createTableColumnTypes` DDL fragment for a frame about to be
    * written: catalog-typed columns for catalog fields, audit columns
    * typed per the reference (extractionId TEXT→VARCHAR,
    * extractionTimestampUTC TIMESTAMP; sqlDwh.py:360-365). Non-catalog
    * columns (e.g. propagated parent PKs on a child frame) default to
    * VARCHAR(255) — they are PK propagations by construction. */
  def columnTypes(meta: EntityMeta, df: DataFrame): String =
    df.columns.map { c =>
      val t = c.toLowerCase match {
        case graft.catalog.SchemaRegistry.ExtractionIdCol => "VARCHAR(255)"
        case graft.catalog.SchemaRegistry.ExtractionTsCol => "TIMESTAMP"
        case n if meta.fields.exists(_.fieldName.equalsIgnoreCase(n)) =>
          columnType(meta, n)
        case _ => "VARCHAR(255)"
      }
      s"$c $t"
    }.mkString(", ")

  /** Write one frame to `stg_<entity>`; append=false replaces (the
    * reference's if_exists='replace'). Returns records written. */
  def writeEntity(df: DataFrame, meta: EntityMeta, append: Boolean): Long = {
    // a crashed swap can leave this table's only copy at the backup
    // name; restore BEFORE writing, or an append would silently
    // re-create an empty live table and orphan the history
    recover(stagingName(meta.id))
    val obs = Observation()
    // repartition, not coalesce: coalesce would propagate the reduced
    // parallelism UP through fetch/normalize; a shuffle boundary caps
    // only the write fan-in
    df.observe(obs, count(lit(1)).as("rows"))
      .repartition(maxConnections)
      .write
      .mode(if (append) SaveMode.Append else SaveMode.Overwrite)
      .option("createTableColumnTypes", columnTypes(meta, df))
      .option("truncate", true) // replace keeps the typed table, truncates rows
      .option("batchsize", insertBatchSize)
      .jdbc(url, stagingName(meta.id), props)
    obs.get("rows").asInstanceOf[Long]
  }

  /** EntityWriter contract: resolve the catalog entry by entity name; an
    * uncataloged entity (e.g. a subform with no metadata) still writes,
    * with every column defaulting to VARCHAR(255). */
  override def writeEntity(df: DataFrame, entity: String, append: Boolean): Long = {
    val meta = registry.flatMap(_.get(entity.toUpperCase))
      .getOrElse(EntityMeta(entity, "priority"))
    writeEntity(df, meta, append)
  }

  def read(entity: String): DataFrame =
    spark.read.option("fetchsize", insertBatchSize)
      .jdbc(url, stagingName(entity), props)

  /** IDEMPOTENT per-batch JDBC write — the warehouse sibling of
    * [[StagingWriter.writeBatchPartition]] for streaming `foreachBatch`
    * ticks that land directly in the relational staging layer:
    * delete-then-append keyed on an `ingest_batch` discriminator
    * column, so an at-least-once replay REPLACES its own slice and
    * never duplicates it, and other batches' rows are untouched.
    * DELETE+INSERT rather than a parquet-style partition overwrite
    * because a JDBC table has no partition directories — the
    * discriminator predicate is the partition. First write creates
    * the table (Append creates-if-absent); the write fan-in cap is
    * the [[writeEntity]] contract. */
  def writeBatchIdempotent(df: DataFrame, table: String, batchId: Long): Long = {
    val conn = java.sql.DriverManager.getConnection(url, props)
    try {
      // the Spark JDBC writer creates case-sensitive (quoted) column
      // names; an unquoted predicate folds per the warehouse and
      // misses — quote with the connection's own quote string. The
      // TABLE identifier gets the same treatment, spelled as the
      // warehouse actually stored it (a mixed-case argument may live
      // exact-case or folded depending on who created it).
      resolveInSchema(conn, table).foreach { stored =>
        val qi = conn.getMetaData.getIdentifierQuoteString
        conn.createStatement()
          .executeUpdate(
            s"DELETE FROM $qi$stored$qi WHERE ${qi}ingest_batch$qi = $batchId")
      }
    } finally conn.close()
    val obs = Observation()
    df.withColumn("ingest_batch", lit(batchId))
      .observe(obs, count(lit(1)).as("rows"))
      .repartition(maxConnections)
      .write.mode(SaveMode.Append)
      .option("batchsize", insertBatchSize)
      .jdbc(url, table, props)
    obs.get("rows").asInstanceOf[Long]
  }

  /** Late-data compaction of a standing staging table — JDBC parity
    * with [[StagingWriter.compact]]: keep only the latest extraction
    * per PK, swapped in via [[writeAndSwap]]. */
  def compact(table: String, pk: Seq[String]): Long = {
    recover(table) // the read below must see a restored live table, not fail on a missing one
    writeAndSwap(latestPerPk(spark.read.jdbc(url, table, props), pk), table)
  }

  /** stg→final promotion on the warehouse itself (the reference's
    * roadmap lists final tables in the SAME database the staging sink
    * targets, readme.md:723-731) — closes round-3 "What's missing #3". */
  override def promote(entity: String, pk: Seq[String]): Long = {
    recover(stagingName(entity)) // staging side is read; its crashed swap must restore first
    recover(entity.toLowerCase)
    writeAndSwap(latestPerPk(read(entity), pk), entity.toLowerCase)
  }

  /** Write `df` at `table` with the rename swap: materialize to a side
    * table, then (one JDBC connection) rename live→backup, rename
    * side→live, drop backup. Mirrors the parquet writer's protocol: a
    * crash between the renames leaves the FULL previous table at the
    * backup name — recoverable with one rename — never a half-written
    * or missing table. Readers are only ever exposed to a complete
    * table under the live name; the window with NO live name is the two
    * renames, not the (long) bulk write. Row count observed on the
    * write job itself. */
  private def writeAndSwap(df: DataFrame, table: String): Long = {
    val tmp = s"${table}__swap_tmp"
    val bak = s"${table}__swap_bak"
    val obs = Observation()
    // string columns read back from the warehouse as StringType; without
    // an explicit type they would re-create as the dialect's default
    // (CLOB on some warehouses) — keep the staging layer's VARCHAR shape
    val varchars = df.schema.fields
      .filter(_.dataType == org.apache.spark.sql.types.StringType)
      .map(f => s"${f.name} VARCHAR(255)")
    val writer0 = df.observe(obs, count(lit(1)).as("rows"))
      .repartition(maxConnections)
      .write.mode(SaveMode.Overwrite)
      .option("batchsize", insertBatchSize)
    val writer =
      if (varchars.isEmpty) writer0
      else writer0.option("createTableColumnTypes", varchars.mkString(", "))
    writer.jdbc(url, tmp, props)
    val kept = obs.get("rows").asInstanceOf[Long]
    val conn = java.sql.DriverManager.getConnection(url, props)
    try {
      val st = conn.createStatement()
      recoverOrDropBak(conn, st, table, bak)
      val hadLive = exists(conn, table)
      if (hadLive) st.executeUpdate(s"RENAME TABLE $table TO $bak")
      try st.executeUpdate(s"RENAME TABLE $tmp TO $table")
      catch {
        case e: java.sql.SQLException =>
          if (hadLive) {
            // a failed restore must not mask the original swap failure
            try st.executeUpdate(s"RENAME TABLE $bak TO $table")
            catch { case restore: java.sql.SQLException => e.addSuppressed(restore) }
          }
          throw e
      }
      if (hadLive) st.executeUpdate(s"DROP TABLE $bak")
      kept
    } finally conn.close()
  }

  /** Table-existence probe. Unquoted identifiers fold UP on
    * Derby/Oracle-style warehouses and DOWN on Postgres-style ones —
    * probe both foldings — and `_` is a single-char LIKE wildcard in
    * `DatabaseMetaData.getTables` patterns (every staging name contains
    * one), so pattern metacharacters are escaped or a similarly-named
    * table would fake a hit and derail the swap. */
  private def exists(conn: java.sql.Connection, t: String): Boolean = {
    val md = conn.getMetaData
    val esc = md.getSearchStringEscape
    Seq(t.toUpperCase, t.toLowerCase).distinct.exists { n =>
      val pat = n.replace(esc, esc + esc)
        .replace("_", esc + "_").replace("%", esc + "%")
      val rs = md.getTables(null, null, pat, null)
      try rs.next() finally rs.close()
    }
  }

  /** Resolve `t` to its ACTUAL stored spelling in the connection's
    * CURRENT schema (probing exact case, then both foldings), or None
    * if absent. Unlike [[exists]], the lookup is schema-scoped — a
    * same-named table in another schema must not trigger a DELETE
    * against this one — and it returns the stored name so the caller
    * can build a correctly-quoted statement whichever folding (or
    * quoted exact case) created the table. */
  private def resolveInSchema(
      conn: java.sql.Connection, t: String): Option[String] = {
    val md = conn.getMetaData
    val esc = md.getSearchStringEscape
    val schema = conn.getSchema // null on drivers without a notion — falls back to all-schema search
    Seq(t, t.toUpperCase, t.toLowerCase).distinct.iterator.map { n =>
      val pat = n.replace(esc, esc + esc)
        .replace("_", esc + "_").replace("%", esc + "%")
      val rs = md.getTables(null, schema, pat, null)
      try { if (rs.next()) Some(rs.getString("TABLE_NAME")) else None }
      finally rs.close()
    }.collectFirst { case Some(n) => n }
  }

  /** [[recoverOrDropBak]] on a fresh connection — the preflight every
    * read-or-write of a swappable table runs first. */
  private def recover(table: String): Unit = {
    val conn = java.sql.DriverManager.getConnection(url, props)
    try recoverOrDropBak(conn, conn.createStatement(), table, s"${table}__swap_bak")
    finally conn.close()
  }

  /** Crash recovery for the swap protocol: a backup table WITHOUT a
    * live table means a previous swap died between its two renames and
    * the backup is the ONLY full copy — restore it (dropping it would
    * destroy the staging history). A backup alongside a live table is
    * post-promotion debris and safe to drop. */
  private def recoverOrDropBak(
      conn: java.sql.Connection, st: java.sql.Statement,
      table: String, bak: String): Unit =
    if (exists(conn, bak)) {
      if (exists(conn, table)) st.executeUpdate(s"DROP TABLE $bak")
      else st.executeUpdate(s"RENAME TABLE $bak TO $table")
    }
}
