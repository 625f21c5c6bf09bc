package graft.sinks

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Common contract of the staging sinks (parquet harness, JDBC
  * production): write one normalized frame to `stg_<entity>` and report
  * records written — what RefreshJob orchestrates against, so the same
  * refresh runs unchanged over either backend (SURVEY.md §2.1 K1).
  * Promotion (stg→final, the reference's roadmap step readme.md:723-731)
  * is part of the contract too: both backends materialize the
  * latest-extraction-per-PK view with a crash-safe swap. */
trait EntityWriter {
  def stagingName(entity: String): String = s"stg_${entity.toLowerCase}"

  /** Write one frame; append=false replaces the standing table.
    * Returns records written in THIS batch. */
  def writeEntity(df: DataFrame, entity: String, append: Boolean): Long

  /** stg→final promotion: materialize the latest-extraction-per-PK view
    * of `stg_<entity>` as the queryable final table `<entity>`. Staging
    * keeps its full append history, so promotion is repeatable after
    * every incremental batch. Returns rows in the promoted table. */
  def promote(entity: String, pk: Seq[String]): Long

  /** Latest extraction per PK: max extractiontimestamputc, extractionid
    * as the deterministic tiebreak — one window pass, shuffled on the
    * PK only. Shared by both backends' compact/promote. */
  protected final def latestPerPk(df: DataFrame, pk: Seq[String]): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(pk.map(col): _*)
      .orderBy(col(graft.catalog.SchemaRegistry.ExtractionTsCol).desc,
        col(graft.catalog.SchemaRegistry.ExtractionIdCol).desc)
    df.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1).drop("__rn")
  }
}
