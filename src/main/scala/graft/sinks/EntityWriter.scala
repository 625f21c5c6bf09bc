package graft.sinks

import org.apache.spark.sql.DataFrame

/** Common contract of the staging sinks (parquet harness, JDBC
  * production): write one normalized frame to `stg_<entity>` and report
  * records written — what RefreshJob orchestrates against, so the same
  * refresh runs unchanged over either backend (SURVEY.md §2.1 K1). */
trait EntityWriter {
  def stagingName(entity: String): String = s"stg_${entity.toLowerCase}"

  /** Write one frame; append=false replaces the standing table.
    * Returns records written in THIS batch. */
  def writeEntity(df: DataFrame, entity: String, append: Boolean): Long
}
