package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.run.CorpusPrepJob
import graft.run.CorpusPrepJob.PrepConfig
import graft.sinks.StagingWriter

/** End-to-end composition of the corpus prep pipeline — the x62 gate
  * row pins the funnel counts against the DuckDB oracle; this spec
  * pins the LIFECYCLE: monotone stage counts, exhaustive split,
  * durable artifacts where the incremental loops expect them, the
  * quarantine path, and the optional mixture stage. */
class CorpusPrepJobSpec extends SparkSpec {

  private def docs = spark.read.parquet(s"$sf/documents.parquet")

  private def evalDocs = docs.filter(col("doc_id") % 50 === 0)
    .select(array_join(slice(split(col("text"), " "), 5, 26), " ").as("text"))

  test("run: funnel is monotone, split exhaustive, artifacts durable and probeable") {
    val wh = tmpDir("prepjob")
    val writer = new StagingWriter(spark, wh)
    val report = CorpusPrepJob.run(docs, evalDocs, writer)

    val c = report.stageCounts
    assert(c("1_raw") == docs.count())
    // the funnel only ever narrows
    assert(c("1_raw") >= c("2_gate_passed"))
    assert(c("2_gate_passed") >= c("3_exact_unique"))
    assert(c("3_exact_unique") >= c("4_neardup_kept"))
    assert(c("4_neardup_kept") >= c("5_clean"))
    assert(c("5_clean") > 0, s"pipeline dropped everything: $c")
    // split partitions the clean corpus exactly
    val splits = c.filter(_._1.startsWith("6_split_")).values.sum
    assert(splits == c("5_clean"), s"split not exhaustive: $c")

    // durable deliverable: the clean corpus with its split column
    val corpus = writer.read(CorpusPrepJob.CorpusTable)
    assert(corpus.count() == c("5_clean"))
    assert(corpus.columns.contains("split"))
    // the funnel table matches the report
    val funnelTbl = writer.read(CorpusPrepJob.FunnelTable)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(funnelTbl == c)

    // packed train sequences cover exactly the train split
    val packed = writer.read(CorpusPrepJob.PackedTable)
    assert(packed.count() == c("6_split_train"))
    // curriculum export produced the requested shard files
    val shardFiles = new java.io.File(writer.path(CorpusPrepJob.CurriculumTable))
      .listFiles().count(_.getName.endsWith(".parquet"))
    assert(shardFiles == PrepConfig().curriculumShards,
      s"expected ${PrepConfig().curriculumShards} curriculum shards, got $shardFiles")

    // the MinHash index artifact is live: a mutated copy of a kept doc
    // probes to its original through the incremental-ingest read path
    val keeper = corpus.orderBy(col("doc_id")).limit(1)
      .select(col("doc_id"), col("text")).head()
    val probe = spark.createDataFrame(Seq(
      (9999999L, keeper.getString(1) + " tail tweak")))
      .toDF("doc_id", "text")
    val found = graft.ext.Dedup
      .neardupAgainstIndex(probe, writer, CorpusPrepJob.IndexTable)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(found.contains((keeper.getLong(0), 9999999L)),
      s"index probe missed the planted near-copy: $found")

    // and the incremental loop GROWS that same artifact: append a new
    // batch through the ingest-time writer, then a later probe pairs
    // against the appended doc — the prep job's layout and the
    // streaming tick's layout are one artifact, not two copies
    val newDoc = spark.createDataFrame(Seq(
      (8888888L, "a wholly fresh document about migratory lighthouse maintenance schedules " +
        "and the keepers who follow them across the northern coast every single year")))
      .toDF("doc_id", "text")
    graft.ext.Dedup.appendMinhashIndex(newDoc, writer, CorpusPrepJob.IndexTable)
    val probe2 = spark.createDataFrame(Seq(
      (8888889L, "a wholly fresh document about migratory lighthouse maintenance schedules " +
        "and the keepers who follow them across the northern coast every single year indeed")))
      .toDF("doc_id", "text")
    val found2 = graft.ext.Dedup
      .neardupAgainstIndex(probe2, writer, CorpusPrepJob.IndexTable)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(found2.contains((8888888L, 8888889L)),
      s"appended batch invisible to a later probe: $found2")
  }

  test("runFromJsonl: quarantine is counted and written; parsed side feeds the pipeline") {
    val dir = tmpDir("prepjsonl")
    val lines =
      docs.limit(60).collect().map { r =>
        s"""{"doc_id": ${r.getAs[Long]("doc_id")}, "text": ${jsonStr(r.getAs[String]("text"))}, "lang": "en", "source": "s1"}"""
      } ++ Seq("""{"doc_id": 7, "text": "truncat""", "garbage line")
    java.nio.file.Files.write(
      java.nio.file.Paths.get(dir, "in.jsonl"),
      String.join("\n", lines: _*).getBytes("UTF-8"))
    val schema = StructType(Seq(
      StructField("doc_id", LongType), StructField("text", StringType),
      StructField("lang", StringType), StructField("source", StringType)))
    val wh = tmpDir("prepjsonlwh")
    val writer = new StagingWriter(spark, wh)
    val report = CorpusPrepJob.runFromJsonl(
      spark, s"$dir/in.jsonl", schema, evalDocs, writer)
    assert(report.quarantined == 2)
    assert(report.stageCounts("1_raw") == 60)
    assert(report.artifacts.contains("quarantine"))
    assert(writer.read("quarantine").count() == 2)
  }

  test("mixBudget: the train mixture artifact is written and within budget") {
    val wh = tmpDir("prepmix")
    val writer = new StagingWriter(spark, wh)
    val report = CorpusPrepJob.run(docs, evalDocs, writer,
      PrepConfig(mixBudget = Some(10L)))
    assert(report.artifacts.contains(CorpusPrepJob.MixTable))
    val mixed = writer.read(CorpusPrepJob.MixTable)
    assert(mixed.count() <= 10L)
    assert(mixed.count() > 0L)
  }

  private def jsonStr(s: String): String =
    "\"" + s.replace("\\", "\\\\").replace("\"", "\\\"") + "\""
}
