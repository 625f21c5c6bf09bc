package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** JSONL document ingest with corrupt-record quarantine — the landing
  * step for raw crawl/export dumps, which arrive as newline-delimited
  * JSON with a tail of malformed lines (truncated uploads, encoding
  * damage, mid-write rotations). The pipeline must neither die on the
  * first bad line (FAILFAST) nor silently null it away (default
  * PERMISSIVE with no corrupt column): every input line lands in
  * exactly one of two frames — parsed documents, or a quarantine of
  * the verbatim bad lines for re-ingest after the producer is fixed.
  *
  * Spark-first shape: `spark.read.schema(...).json` in PERMISSIVE mode
  * with an explicit `_corrupt_record` column; the split is two filters
  * over one scan (predicate pushdown keeps them cheap), never a
  * per-line UDF. The schema is REQUIRED — schema inference reads the
  * whole input once before the real scan, which at 100 TB doubles the
  * ingest; a landing layer always knows its contract schema.
  *
  * Caveat baked into the split: Spark leaves non-corrupt rows' corrupt
  * column NULL, but a line that is VALID JSON while missing every
  * schema field (e.g. `{}`) also parses with all-NULL fields — the
  * quarantine keeps ONLY unparseable lines; contract violations of
  * parseable rows are a quality gate's job (X45), not the parser's. */
object JsonlIngest {

  /** Both sides of one persisted scan. The CALLER owns the cache:
    * after consuming (or durably materializing) both frames, call
    * [[Split.unpersist]]. After release the docs side falls back to
    * re-scanning the input; the quarantine side fails LOUDLY if
    * queried again (Spark refuses corrupt-record-only queries over an
    * uncached scan — the cache is what makes that side legal at all),
    * so release strictly after the quarantine is drained. */
  final case class Split(docs: DataFrame, quarantined: DataFrame,
      private val raw: DataFrame) {
    /** Release the shared cached scan; see ordering contract above. */
    def unpersist(): Unit = raw.unpersist(blocking = false)
  }

  val CorruptCol = "_corrupt_record"

  /** Read `path` as JSONL under `schema`, splitting parsed rows from
    * quarantined raw lines. The corrupt column is dropped from the
    * clean side; the quarantine carries (raw_line). */
  def read(spark: SparkSession, path: String, schema: StructType): Split = {
    require(!schema.fieldNames.contains(CorruptCol),
      s"schema must not declare $CorruptCol — the reader adds it")
    val withCorrupt = schema.add(CorruptCol, org.apache.spark.sql.types.StringType)
    val raw = spark.read
      .schema(withCorrupt)
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", CorruptCol)
      .json(path)
      // one scan, two consumers: the split must not re-read the input
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    Split(
      docs = raw.filter(col(CorruptCol).isNull).drop(CorruptCol),
      quarantined = raw.filter(col(CorruptCol).isNotNull)
        .select(col(CorruptCol).as("raw_line")),
      raw = raw)
  }
}
