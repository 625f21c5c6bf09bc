package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.catalog.SchemaRegistry
import graft.ext.SkewJoin
import graft.model.{EntityMeta, FieldMeta}
import graft.sinks.StagingWriter
import graft.sources.odata.ODataAuth

/** Compaction, salted joins, catalog drop, basic-auth — the remaining
  * small operator-inventory rows. */
class UtilitySpec extends SparkSpec {

  import spark.implicits._

  test("bucketed staging tables join with NO Exchange on either side") {
    val wh = tmpDir("whb")
    val writer = new StagingWriter(spark, wh)
    val orders = spark.read.parquet(s"$sf/orders.parquet")
      .select("o_orderkey", "o_totalprice")
    val lineitem = spark.read.parquet(s"$sf/lineitem.parquet")
      .select("l_orderkey", "l_quantity")
    writer.writeBucketed(orders, "bkt_orders", "o_orderkey", 4)
    writer.writeBucketed(lineitem, "bkt_lineitem", "l_orderkey", 4)
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val j = spark.table("bkt_orders")
        .join(spark.table("bkt_lineitem"), col("o_orderkey") === col("l_orderkey"))
      assert(j.count() > 0)
      val plan = j.queryExecution.executedPlan.toString
      // both sides pre-bucketed on the join key: the sort-merge join must
      // consume the bucketing — any Exchange means co-location was lost
      assert(plan.contains("SortMergeJoin"), s"expected SMJ:\n$plan")
      assert(!plan.contains("Exchange"), s"bucketed join still shuffles:\n$plan")
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
      spark.sql("DROP TABLE IF EXISTS bkt_orders")
      spark.sql("DROP TABLE IF EXISTS bkt_lineitem")
    }
  }

  test("jsonl ingest: every line lands in exactly one of parsed/quarantine") {
    val dir = tmpDir("jsonl")
    val lines = Seq(
      """{"doc_id": 1, "text": "good one", "source": "a"}""",
      """{"doc_id": 2, "text": "also fine", "source": "a"}""",
      """{"doc_id": 3, "text": "truncat""", // cut mid-string
      """not json at all""",
      """{}""") // valid JSON, violates the contract — NOT quarantine's job
    java.nio.file.Files.write(java.nio.file.Paths.get(dir, "part0.jsonl"),
      lines.mkString("\n").getBytes("UTF-8"))
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("doc_id", org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("text", org.apache.spark.sql.types.StringType),
      org.apache.spark.sql.types.StructField("source", org.apache.spark.sql.types.StringType)))
    val split = graft.sources.JsonlIngest.read(spark, dir, schema)
    val ids = split.docs.collect().map(r => Option(r.get(0)).map(_.asInstanceOf[Long]))
    // 1, 2 parse; {} parses with all-NULL fields (contract gate's job)
    assert(ids.toSet == Set(Some(1L), Some(2L), None), s"got ${ids.toSet}")
    val bad = split.quarantined.collect().map(_.getString(0)).toSet
    assert(bad == Set("""{"doc_id": 3, "text": "truncat""", "not json at all"), s"got $bad")
    // exhaustive and disjoint: counts add up to the input lines
    assert(split.docs.count() + split.quarantined.count() == lines.size)
    // caller-owned cache release: after unpersist nothing of this scan
    // stays cached; the docs side re-scans, the quarantine side (a
    // corrupt-record-only query, legal only over the cache) fails loudly
    val cachedBefore = spark.sparkContext.getPersistentRDDs.size
    split.unpersist()
    assert(spark.sparkContext.getPersistentRDDs.size < cachedBefore,
      "JsonlIngest scan still cached after Split.unpersist()")
    // a data-column projection re-scans fine (count() would prune to
    // the corrupt-filter column alone and hit the same restriction)
    assert(split.docs.select("text").collect().length == 3)
    intercept[org.apache.spark.sql.AnalysisException](split.quarantined.count())
  }

  test("curriculumExport: shards carry disjoint quality ranges in global order") {
    val wh = tmpDir("whcurr")
    val writer = new StagingWriter(spark, wh)
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    // plan must total-sort via RANGE partitioning, never a single task
    val planned = graft.ext.TextStats.withQuality(docs)
      .select(col("doc_id"), col("source"), col("quality_score"))
      .repartitionByRange(4, col("quality_score").asc, col("doc_id").asc)
    assert(planned.queryExecution.toString.toLowerCase.contains("rangepartitioning"),
      s"no range partitioning in:\n${planned.queryExecution.toString.take(1200)}")
    graft.ext.Assemble.curriculumExport(docs, writer, "curr", shards = 4)
    val parts = new java.io.File(writer.path("curr")).listFiles()
      .filter(_.getName.endsWith(".parquet")).sortBy(_.getName)
    assert(parts.length == 4, s"expected 4 shard files, got ${parts.length}")
    // within-shard sorted, cross-shard ranges strictly ordered on (q, id)
    val perShard = parts.map { f =>
      spark.read.parquet(f.getPath).collect()
        .map(r => (r.getDouble(2), r.getLong(0))).toSeq
    }.filter(_.nonEmpty)
    perShard.foreach { rows =>
      assert(rows == rows.sorted, "shard not internally sorted")
    }
    val ordered = perShard.toSeq.sortBy(_.head)
    val ord = Ordering[(Double, Long)]
    ordered.sliding(2).foreach {
      case Seq(a, b) => assert(ord.lt(a.last, b.head),
        s"shard ranges overlap: ${a.last} vs ${b.head}")
      case _ =>
    }
    assert(perShard.map(_.size).sum == docs.count(), "export lost rows")
  }

  test("partitioned staging: a partition-column predicate prunes at planning time") {
    val wh = tmpDir("whpart")
    val writer = new StagingWriter(spark, wh)
    // events.ts is TIMESTAMP(NANOS): read through the source's NTZ shim
    val events = new graft.sources.ParquetSimSource(spark, sf)
      .fetch(graft.sources.FetchRequest("EVENTS"))
      .withColumn("event_date", to_date(col("ts")))
    writer.writePartitioned(events, "part_events", "event_date")

    val oneDay = writer.read("part_events")
      .filter(col("event_date") === lit("2024-01-05").cast("date"))
    val plan = oneDay.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") &&
      plan.linesIterator.exists(l =>
        l.contains("PartitionFilters") && l.contains("event_date")),
      s"partition predicate not pushed to PartitionFilters:\n$plan")
    // pruned scan must read strictly fewer files than the full table
    def filesRead(df: org.apache.spark.sql.DataFrame): Long = {
      df.collect() // execute THIS plan instance so its scan metrics populate
      val plan = df.queryExecution.executedPlan match {
        case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
          a.executedPlan // metrics live under the AQE wrapper
        case other => other
      }
      plan.collectLeaves().map(_.metrics
        .get("numFiles").map(_.value).getOrElse(0L)).sum
    }
    val all = filesRead(writer.read("part_events"))
    val one = filesRead(writer.read("part_events")
      .filter(col("event_date") === lit("2024-01-05").cast("date")))
    assert(one > 0 && one < all, s"pruning ineffective: $one of $all files")
  }

  test("compact keeps the latest extraction per PK and rewrites atomically") {
    val wh = tmpDir("whc")
    val writer = new StagingWriter(spark, wh)
    def batch(runId: String, ts: String, rows: (String, Double)*) =
      rows.toDF("pk", "v")
        .withColumn("extractionid", lit(runId))
        .withColumn("extractiontimestamputc", lit(Timestamp.valueOf(ts)))

    writer.write(batch("r1", "2024-01-01 00:00:00",
      "a" -> 1.0, "b" -> 2.0), "stg_t", append = false)
    // overlap re-fetch: "a" arrives again with a newer value
    writer.write(batch("r2", "2024-01-02 00:00:00",
      "a" -> 9.0, "c" -> 3.0), "stg_t", append = true)

    assert(writer.read("stg_t").count() == 4)
    val kept = writer.compact("stg_t", Seq("pk"))
    assert(kept == 3)
    val rows = writer.read("stg_t").collect()
      .map(r => r.getAs[String]("pk") -> r.getAs[Double]("v")).toMap
    assert(rows == Map("a" -> 9.0, "b" -> 2.0, "c" -> 3.0))
    assert(!writer.tables.exists(_.contains("__swap_tmp")))
  }

  test("stg→final promotion: latest-per-PK final table, staging history intact, repeatable") {
    val wh = tmpDir("whp")
    val writer = new StagingWriter(spark, wh)
    def batch(runId: String, ts: String, rows: (String, Double)*) =
      rows.toDF("pk", "v")
        .withColumn("extractionid", lit(runId))
        .withColumn("extractiontimestamputc", lit(Timestamp.valueOf(ts)))

    writer.writeEntity(batch("r1", "2024-01-01 00:00:00",
      "a" -> 1.0, "b" -> 2.0), "ORDERS", append = false)
    writer.writeEntity(batch("r2", "2024-01-02 00:00:00",
      "a" -> 9.0), "ORDERS", append = true)

    assert(writer.promote("ORDERS", Seq("pk")) == 2) // first promote: no live table yet
    val fin1 = writer.read("orders").collect()
      .map(r => r.getAs[String]("pk") -> r.getAs[Double]("v")).toMap
    assert(fin1 == Map("a" -> 9.0, "b" -> 2.0))
    assert(writer.read("stg_orders").count() == 3) // history untouched

    // another incremental batch → re-promote refreshes the final table
    writer.writeEntity(batch("r3", "2024-01-03 00:00:00",
      "b" -> 7.0, "c" -> 5.0), "ORDERS", append = true)
    assert(writer.promote("ORDERS", Seq("pk")) == 3)
    val fin2 = writer.read("orders").collect()
      .map(r => r.getAs[String]("pk") -> r.getAs[Double]("v")).toMap
    assert(fin2 == Map("a" -> 9.0, "b" -> 7.0, "c" -> 5.0))
    assert(!writer.tables.exists(_.contains("__swap")))
  }

  test("saltedJoin equals the plain join and spreads the hot key") {
    val left = (1 to 1000).map(i => (if (i % 10 == 0) 1L else i.toLong, i))
      .toDF("k", "payload")
    val right = Seq((1L, "hot"), (2L, "x"), (77L, "y")).toDF("k2", "name")
    val plain = left.join(right, left("k") === right("k2"))
      .select("k", "payload", "name")
    val salted = SkewJoin.saltedJoin(left, right, "k", "k2", salts = 4)
      .select("k", "payload", "name")
    assert(salted.count() == plain.count())
    assert(salted.exceptAll(plain).count() == 0)
    assert(plain.exceptAll(salted).count() == 0)
  }

  test("registry drop clears the catalog and reports the count") {
    val reg = new SchemaRegistry()
    reg.putAll(Seq(
      EntityMeta("A", "priority", fields = Seq(FieldMeta("F", "Edm.String"))),
      EntityMeta("B", "priority")))
    assert(reg.drop() == 2)
    assert(reg.list.isEmpty && reg.drop() == 0)
  }

  test("type mappings load from the reference's JSON collection shape") {
    val p = tmpDir("map") + "/datatypesConvert.json"
    java.nio.file.Files.write(java.nio.file.Paths.get(p),
      """[
        | {"sourceSystem": "priority", "SourceDataType": "Edm.String",
        |  "postgresDatatype": "VARCHAR", "mysqlDatatype": "TEXT(255)"},
        | {"sourceSystem": "priority", "SourceDataType": "Edm.Int64",
        |  "postgresDatatype": "BIGINT"}
        |]""".stripMargin.getBytes("UTF-8"))
    val ms = graft.types.TypeMapper.loadMappings(p)
    assert(ms == Seq(
      graft.model.TypeMapping("priority", "Edm.String", "VARCHAR"),
      graft.model.TypeMapping("priority", "Edm.Int64", "BIGINT")))
    val mapper = graft.types.TypeMapper(ms)
    assert(mapper.sparkType("priority",
      FieldMeta("f", "Edm.Int64")) == org.apache.spark.sql.types.LongType)
  }

  test("RefreshJob takes PKs from the metadata catalog when registered") {
    val reg = new SchemaRegistry()
    reg.put(EntityMeta("REGION", "priority",
      fields = Seq(FieldMeta("R_REGIONKEY", "Edm.Int64", keyFlag = true)),
      entityPk = Seq("R_REGIONKEY")))
    val writer = new StagingWriter(spark, tmpDir("whr"))
    val job = new graft.run.RefreshJob(spark,
      new graft.sources.ParquetSimSource(spark, sf), writer,
      registry = Some(reg))
    val cfg = graft.model.ExtractionConfig("ds", "n", "a",
      entities = Seq(graft.model.EntityConfig("REGION")))
    val (report, _) = job.run(cfg, incremental = false)
    assert(report.errors.isEmpty)
    // catalog PK applied: PK→String cast on the staged frame
    assert(writer.read("stg_region").schema("r_regionkey").dataType ==
      org.apache.spark.sql.types.StringType)
  }

  test("basic-auth header matches RFC 7617 form") {
    assert(ODataAuth.basicAuth("apiuser", "s3cret") ==
      "Basic YXBpdXNlcjpzM2NyZXQ=")
  }

  test("debug CSV dump writes a readable copy off the hot path") {
    val wh = tmpDir("whd")
    val writer = new StagingWriter(spark, wh)
    val df = Seq(("a", 1), ("b", 2)).toDF("k", "v")
    writer.debugCsv(df, "stg_t")
    val back = spark.read.option("header", true).csv(s"$wh/stg_t__debug_csv")
    assert(back.count() == 2 && back.columns.toSeq == Seq("k", "v"))
  }

  test("bench contention probe: /proc/stat busy jiffies parse and advance") {
    // the contention detector must actually read the machine on this
    // platform — a silently-None probe would disable flagging and
    // reproduce the r11 contaminated-artifact failure mode unnoticed
    val b0 = Bench.sysBusyJiffies()
    assert(b0.nonEmpty, "contention probe unreadable on this platform")
    // burn CPU in THIS process: busy jiffies must advance at least as
    // much as our own burn (machine busy ⊇ our burn)
    val deadline = System.nanoTime() + 300000000L // 0.3 s
    var sink = 0L
    while (System.nanoTime() < deadline) sink += sink * 31 + 1
    val b1 = Bench.sysBusyJiffies()
    assert(b1.nonEmpty && b1.get >= b0.get, s"busy went backwards: $b0 -> $b1 ($sink)")
    assert(Bench.loadAvg() >= 0.0)
  }

  test("bench timedRep: own CPU burn is NOT attributed to co-tenants") {
    // burn a large share of the machine from INSIDE this process (8
    // spinning threads): if timedRep failed to subtract process CPU
    // from machine-busy, othersFrac would read ~8/nCpus ≈ 0.25 and the
    // bench would flag (and endlessly re-run) its own work. Correctly
    // subtracted, othersFrac reflects only genuine co-tenants — best
    // of 3 attempts shields the assert from a real external burst.
    def spinRep(): Bench.Rep = Bench.timedRep {
      val threads = (1 to 8).map { _ =>
        new Thread(() => {
          val deadline = System.nanoTime() + 600000000L // 0.6 s — above MinJudgeableWallSec
          var sink = 0L
          while (System.nanoTime() < deadline) sink += sink * 31 + 1
          if (sink == 42) println(sink) // defeat dead-code elimination
        })
      }
      threads.foreach(_.start())
      threads.foreach(_.join())
    }
    val attempts = (1 to 3).map(_ => spinRep())
    assert(attempts.forall(_.wall >= 0.5), s"spin ended early: $attempts")
    val othMin = attempts.map(_.othersFrac).min
    assert(othMin >= 0.0 && othMin < Bench.ContendedFrac,
      s"self-burn misattributed to co-tenants: $attempts")
  }

  test("bench contendedRep: starvation fires on wall-growth WITH share " +
    "collapse; regressions and slow days do not flag") {
    import Bench.{Rep, BaseEntry, contendedRep}
    val base = Some(BaseEntry(wall = 5.0, cpu = 40.0)) // clean share 8.0
    // the r12 contamination shape: unchanged code, wall 5.5x, CPU
    // roughly unchanged -> share collapsed to ~1.3 -> flagged even
    // with others' visible burn under the threshold
    assert(contendedRep(Rep(27.5, 0.05, 36.0), base, None),
      "starved rep must flag")
    // a GENUINE regression: wall 4x because the work is 4x -> share
    // holds -> NOT contention (it must land in drift, not be retried)
    assert(!contendedRep(Rep(20.0, 0.05, 155.0), base, None),
      "real regression must not flag as contention")
    // a uniformly slower machine day (the r11 1.4x drift): wall 1.4x
    // is under the 1.5x gate -> not flagged
    assert(!contendedRep(Rep(7.0, 0.05, 42.0), base, None),
      "machine drift must not flag")
    // others-burn signal alone: 6 of 32 cores = 0.1875 > 0.10 (the
    // r12 threshold missed exactly this co-tenant)
    assert(contendedRep(Rep(2.0, 0.1875, 10.0), None, None),
      "6/32-core co-tenant must flag via the others signal")
    assert(!contendedRep(Rep(2.0, 0.08, 10.0), None, None))
    // sub-judgeable reps never flag (jiffy noise)
    assert(!contendedRep(Rep(0.3, 0.9, 0.1), base, None))
    // within-run signal: no baseline, but the best rep of this run
    // proves the query is fast when unstarved
    val best = Some(Rep(2.0, 0.02, 16.0)) // share 8
    assert(contendedRep(Rep(9.0, 0.05, 18.0), None, best),
      "within-run starvation must flag")
    assert(!contendedRep(Rep(2.2, 0.02, 17.0), None, best))
  }

  test("bench loadBaseline: parses the writer shape, rejects an sf " +
    "mismatch, degrades to empty on garbage") {
    val dir = java.nio.file.Files.createTempDirectory("bl").toString
    val p = s"$dir/BENCH_BASELINE.json"
    java.nio.file.Files.write(java.nio.file.Paths.get(p),
      ("""{"sf":"/data/sf0.1","reps":3,"loadavg_start":0.2,"queries":""" +
        """{"q1_agg":{"wall":1.25,"cpu":9.5},"x68_incr_funnel":""" +
        """{"wall":6.71,"cpu":52.0}}}""").getBytes("UTF-8"))
    val b = Bench.loadBaseline(p, "/data/sf0.1")
    assert(b.keySet == Set("q1_agg", "x68_incr_funnel"), s"got $b")
    assert(b("x68_incr_funnel") == Bench.BaseEntry(6.71, 52.0))
    assert(Bench.loadBaseline(p, "/data/sf0.01").isEmpty,
      "cross-SF baseline must be rejected")
    assert(Bench.loadBaseline(s"$dir/nope.json", "/data/sf0.1").isEmpty)
    java.nio.file.Files.write(java.nio.file.Paths.get(p),
      "not json at all".getBytes("UTF-8"))
    assert(Bench.loadBaseline(p, "/data/sf0.1").isEmpty)
  }

  test("bench assembleHeadline: substitution only for a contaminated " +
    "basis; clean-rep drift is a regression and keeps its median; " +
    "sub-judgeable baselines never flag") {
    import Bench.{HeadKey, assembleHeadline}
    val h = assembleHeadline(Seq(
      // drifted (6 > 2*2) with a CONTAMINATED basis -> substituted,
      // contributes the baseline wall
      HeadKey("contaminated", 6.0, basisContaminated = true, Some(2.0)),
      // drifted with a CLEAN basis -> regression: measured median
      // stays in the total (the ADVICE r14 laundering fix)
      HeadKey("regressed", 6.0, basisContaminated = false, Some(2.0)),
      // not drifted (1.5 <= 2*1.0) -> plain median either way
      HeadKey("steady", 1.5, basisContaminated = true, Some(1.0)),
      // baseline below MinJudgeableWallSec -> never drift-flagged,
      // even at 100x
      HeadKey("tiny", 10.0, basisContaminated = true, Some(0.1)),
      // no baseline at all -> plain median
      HeadKey("unbaselined", 3.0, basisContaminated = true, None)))
    assert(h.substituted == Seq("contaminated" -> 2.0), s"got $h")
    assert(h.regressed == Seq("regressed" -> ((6.0, 2.0))), s"got $h")
    // total = 2.0 (substituted) + 6.0 (regressed median!) + 1.5 + 10 + 3
    assert(math.abs(h.total - 22.5) < 1e-9, s"got ${h.total}")
  }

  test("bench judgeSamples: a starved early rep is excluded from the " +
    "clean basis once faster reps land (the clean-median contract)") {
    import Bench.{Rep, judgeSamples}
    // rep 1 arrived starved (wall 5x the later reps, share collapsed);
    // reps 2-3 are clean — post-hoc judgment vs the best rep must flag
    // rep 1 even with NO baseline on file
    val samples = Seq(
      Rep(10.0, 0.05, 15.0),  // share 1.5 — starved
      Rep(2.0, 0.02, 14.0),   // share 7.0 — clean (the best)
      Rep(2.1, 0.02, 14.5))   // share 6.9 — clean
    val judged = judgeSamples(samples, None)
    assert(judged.map(_._2) == Seq(true, false, false), s"got $judged")
    val cleanWalls = judged.collect { case (r, false) => r.wall }
    assert(cleanWalls == Seq(2.0, 2.1),
      "clean basis must exclude the starved rep")
    // ALL reps starved vs baseline: every rep flags (visible), and the
    // caller falls back to the contended median rather than dropping
    // the query
    val allBad = Seq(Rep(10.0, 0.05, 15.0), Rep(11.0, 0.05, 16.0))
    val vsBase = judgeSamples(allBad, Some(Bench.BaseEntry(2.0, 14.0)))
    assert(vsBase.forall(_._2), s"got $vsBase")
    // empty input keeps the stable JSON shape
    assert(judgeSamples(Nil, None) == Seq((Rep(0.0, 0.0, 0.0), false)))
  }

  test("bench co-tenant integration: an EXTERNAL 6-core burn while a " +
    "parallel job runs is flagged; the same job quiet is not") {
    // the synthetic co-tenant the r12 gate missed (VERDICT task 1):
    // 6 external busy-loop PROCESSES on a 32-CPU box sat under the
    // old 0.20 others threshold while inflating walls 4-8x. Measure
    // the job clean first (the baseline rep), then under the burn.
    def job(): Unit = {
      val threads = (1 to 16).map { _ =>
        new Thread(() => {
          val deadline = System.nanoTime() + 800000000L // 0.8 s
          var sink = 0L
          while (System.nanoTime() < deadline) sink += sink * 31 + 1
          if (sink == 42) println(sink)
        })
      }
      threads.foreach(_.start()); threads.foreach(_.join())
    }
    val clean = Bench.timedRep(job())
    val burners = (1 to 6).map { _ =>
      new ProcessBuilder("bash", "-c",
        "end=$((SECONDS+15)); while [ $SECONDS -lt $end ]; do :; done")
        .start()
    }
    try {
      Thread.sleep(300) // let the burners reach steady state
      val contendedReps = (1 to 3).map(_ => Bench.timedRep(job()))
      // at least one burdened rep must be flagged by SOME signal
      // (others-burn fires at ~6/32 = 0.1875; starvation backs it up
      // if scheduling noise hides part of the burn)
      val flagged = contendedReps.count(r => Bench.contendedRep(
        r, Some(Bench.BaseEntry(clean.wall, clean.procSec)), None))
      assert(flagged >= 1,
        s"no rep flagged under a 6-core external burn: clean=$clean " +
          s"contended=$contendedReps")
    } finally burners.foreach(_.destroyForcibly())
    // and the quiet job itself must NOT read as contended vs its own
    // baseline (guards against a trigger-happy detector)
    val quiet = Bench.timedRep(job())
    assert(!Bench.contendedRep(
      quiet, Some(Bench.BaseEntry(clean.wall, clean.procSec)), None) ||
      quiet.othersFrac > Bench.ContendedFrac, // a real external burst
      s"quiet rep misflagged: $quiet vs clean $clean")
  }
}
