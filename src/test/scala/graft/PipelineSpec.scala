package graft

import java.sql.Timestamp

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.model._
import graft.run.RefreshJob
import graft.sinks.StagingWriter
import graft.sources.{FetchRequest, ParquetSimSource}
import graft.xform.Normalizer

class NormalizerSpec extends SparkSpec {

  def fixture = {
    val schema = StructType(Seq(
      StructField("ORDNAME", StringType),
      StructField("QPRICE", DoubleType),
      StructField("ORDERITEMS_SUBFORM", ArrayType(StructType(Seq(
        StructField("LINE", LongType), StructField("PARTNAME", StringType)))))))
    val rows = Seq(
      Row("SO1", 1200.5, Seq(Row(1L, "P-100"), Row(2L, "P-200"))),
      Row("SO2", 0.0, Seq()),
      Row("SO3", 7.0, null))
    spark.createDataFrame(spark.sparkContext.parallelize(rows), schema)
  }

  val ts = Timestamp.valueOf("2026-01-01 00:00:00")

  test("parent drops subform col, lowercases, stamps audit, casts pk") {
    val n = Normalizer.normalize("ORDERS", fixture, Seq("ORDNAME"), "run-1", ts)
    assert(n.parent.columns.toSeq ==
      Seq("ordname", "qprice", "extractionid", "extractiontimestamputc"))
    assert(n.parent.count() == 3)
    val r = n.parent.filter(col("ordname") === "SO1").collect()(0)
    assert(r.getAs[String]("extractionid") == "run-1")
    assert(r.getAs[Timestamp]("extractiontimestamputc") == ts)
  }

  test("child: exploded rows carry parent PK; empty/null subforms skipped") {
    val n = Normalizer.normalize("ORDERS", fixture, Seq("ORDNAME"), "run-1", ts)
    val child = n.children("orderitems")
    assert(child.columns.toSeq ==
      Seq("ordname", "line", "partname", "extractionid", "extractiontimestamputc"))
    assert(child.count() == 2) // SO2 empty + SO3 null contribute nothing
    assert(child.select("ordname").distinct().collect().map(_.getString(0)).toSet == Set("SO1"))
  }

  test("pk already inside subform struct is not duplicated") {
    val schema = StructType(Seq(
      StructField("ORDNAME", StringType),
      StructField("X_SUBFORM", ArrayType(StructType(Seq(
        StructField("ORDNAME", StringType), StructField("V", LongType)))))))
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(Seq(Row("SO1", Seq(Row("SO1", 5L))))), schema)
    val n = Normalizer.normalize("ORDERS", df, Seq("ORDNAME"), "r", ts)
    assert(n.children("x").columns.count(_ == "ordname") == 1)
  }
}

class ParquetSimSourceSpec extends SparkSpec {

  lazy val src = new ParquetSimSource(spark, sf)

  test("plain scan returns table rows") {
    assert(src.fetch(FetchRequest("REGION")).count() == 5)
  }

  test("filter pushdown reaches the parquet scan") {
    val df = src.fetch(FetchRequest("ORDERS",
      filter = Some("o_orderdate" -> Timestamp.valueOf("1997-01-01 00:00:00"))))
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters") &&
      plan.contains("GreaterThanOrEqual(o_orderdate"), s"no pushdown in:\n$plan")
    assert(df.count() > 0 && df.count() < 1500)
  }

  test("expand nests lineitems as ORDERITEMS_SUBFORM, ordered by linenumber") {
    val df = src.fetch(FetchRequest("ORDERS", expand = Seq("ORDERITEMS")))
    assert(df.columns.contains("ORDERITEMS_SUBFORM"))
    val withItems = df.filter(size(col("ORDERITEMS_SUBFORM")) > 1)
      .select(col("ORDERITEMS_SUBFORM")).limit(5).collect()
    withItems.foreach { r =>
      val lines = r.getSeq[Row](0).map(_.getAs[Int]("l_linenumber"))
      assert(lines == lines.sorted)
    }
    // every lineitem lands in exactly one order's subform
    val total = df.select(explode(col("ORDERITEMS_SUBFORM"))).count()
    assert(total == spark.read.parquet(s"$sf/lineitem.parquet").count())
  }

  test("top probe returns n rows without scanning the child table") {
    val df = src.fetch(FetchRequest("ORDERS", expand = Seq("ORDERITEMS"), top = Some(1)))
    assert(df.count() == 1)
    assert(src.probe("CUSTOMER") == 1)
  }
}

class RefreshJobSpec extends SparkSpec {

  def config = ExtractionConfig(
    id = "ds1", datasourceName = "priority_companyA", accountId = "03445d66",
    systemTimezone = "UTC",
    entities = Seq(
      EntityConfig("ORDERS", filterFlag = true, filterField = "o_orderdate",
        expand = Seq("ORDERITEMS"), dataStartDate = "1990-01-01 00:00:00"),
      EntityConfig("REGION")))

  test("initial full refresh: stg tables, counts, audit, watermark=max(filterField)") {
    val wh = tmpDir("wh")
    val writer = new StagingWriter(spark, wh)
    val job = new RefreshJob(spark, new ParquetSimSource(spark, sf), writer)

    val (report, updated) = job.run(config, incremental = false)
    assert(report.errors.isEmpty)
    val byTable = report.tables.map(t => t.tableName -> t.recordsWritten).toMap
    assert(byTable("stg_orders") == 1500)
    assert(byTable("stg_orderitems") == 6000)
    assert(byTable("stg_region") == 5)

    val orders = writer.read("stg_orders")
    assert(orders.columns.contains("extractionid"))
    assert(!orders.columns.exists(_.toLowerCase.endsWith("_subform")))
    assert(orders.schema("o_orderkey").dataType == StringType) // PK→String

    // watermark advanced to max(o_orderdate), not wall clock
    val maxDate = spark.read.parquet(s"$sf/orders.parquet")
      .agg(max("o_orderdate")).collect()(0).get(0)
    val expected = RefreshJob.formatAny(maxDate, java.time.ZoneId.of("UTC"))
    assert(updated.entities.head.lastRun.contains(expected))
  }

  test("incremental after watermark: strict >, no duplicates, unfiltered overwritten") {
    val wh = tmpDir("wh")
    val writer = new StagingWriter(spark, wh)
    val job = new RefreshJob(spark, new ParquetSimSource(spark, sf), writer)

    val (_, afterFull) = job.run(config, incremental = false)
    val fullCount = writer.read("stg_orders").count()

    // watermark = observed max(filterField); incremental fetches with
    // strict > so the boundary rows are NOT re-appended — an idle
    // incremental run is a no-op on the filtered entity
    val (r2, afterInc) = job.run(afterFull, incremental = true)
    assert(r2.errors.isEmpty)
    val incOrders = r2.tables.find(_.tableName == "stg_orders").get.recordsWritten
    assert(incOrders == 0)
    assert(writer.read("stg_orders").count() == fullCount)
    // empty batch: watermark unchanged, not wall-clocked forward
    assert(afterInc.entities.head.lastRun == afterFull.entities.head.lastRun)
    // unfiltered entity reloaded in full but OVERWRITTEN, not duplicated
    assert(writer.read("stg_region").count() == 5)

    // a lower watermark re-fetches the strictly-newer slice only
    val rewound = afterFull.copy(entities = afterFull.entities.map {
      case e if e.entityId == "ORDERS" => e.copy(lastRun = Some("1997-06-01 00:00:00"))
      case e => e
    })
    val (r3, _) = job.run(rewound, incremental = true)
    val inc3 = r3.tables.find(_.tableName == "stg_orders").get.recordsWritten
    val expected = spark.read.parquet(s"$sf/orders.parquet")
      .filter(col("o_orderdate") > java.sql.Timestamp.valueOf("1997-06-01 00:00:00")).count()
    assert(inc3 == expected && inc3 > 0)
    assert(writer.read("stg_orders").count() == fullCount + inc3)
  }

  test("bucketed staging tables join with no exchange") {
    val wh = tmpDir("whb")
    val writer = new StagingWriter(spark, wh)
    try {
      writer.writeBucketed(spark.read.parquet(s"$sf/orders.parquet"),
        "b_orders", "o_orderkey", 8)
      writer.writeBucketed(
        spark.read.parquet(s"$sf/lineitem.parquet")
          .withColumnRenamed("l_orderkey", "o_orderkey"),
        "b_lineitem", "o_orderkey", 8)
      // hint a sort-merge join: the fixture is small enough to broadcast,
      // which would sidestep the bucketed path this test demonstrates
      val joined = spark.table("b_orders").hint("merge")
        .join(spark.table("b_lineitem"), "o_orderkey")
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"), s"bucketed join still shuffles:\n$plan")
      assert(plan.contains("Bucketed: true"), s"scan not bucketed:\n$plan")
      assert(joined.count() ==
        spark.read.parquet(s"$sf/lineitem.parquet").count())
    } finally {
      spark.sql("DROP TABLE IF EXISTS b_orders")
      spark.sql("DROP TABLE IF EXISTS b_lineitem")
    }
  }

  test("flat child path handles a hot parent key without per-key array state") {
    import org.apache.spark.sql.functions._
    // one parent owns 200k children — the nested path would build a
    // single 200k-element collect_list array inside one task; the flat
    // path streams them as ordinary rows
    val dir = tmpDir("skew")
    spark.range(2).select((col("id") + 1).as("o_orderkey"),
      lit("HOT").as("o_tag")).write.parquet(s"$dir/orders.parquet")
    spark.range(200000)
      .select(lit(1L).as("l_orderkey"), col("id").as("l_linenumber"),
        (col("id") % 97).as("l_qty"))
      .write.parquet(s"$dir/lineitem.parquet")

    val src = new ParquetSimSource(spark, dir)
    val flat = src.fetchFlat(FetchRequest("ORDERS", expand = Seq("ORDERITEMS"))).get
    val norm = Normalizer.normalizeFlat("ORDERS", flat,
      Seq("o_orderkey"), "r", Timestamp.valueOf("2026-01-01 00:00:00"))
    val child = norm.children("orderitems")
    assert(child.count() == 200000)
    val plan = child.queryExecution.executedPlan.toString
    assert(!plan.contains("collect_list"), s"hot-key array state:\n$plan")
    // propagated key is present and correct on every row
    assert(child.filter(col("o_orderkey") === "1").count() == 200000)
  }

  test("flat path plans: parent never scans the child table; child never aggregates") {
    val src = new ParquetSimSource(spark, sf)
    val pq = graft.queries.Queries.p1ParentProjection(spark, sf)
    val pPlan = pq.queryExecution.executedPlan.toString
    assert(!pPlan.contains("lineitem"), s"parent plan scans the child table:\n$pPlan")

    val gq = graft.queries.Queries.g1ExplodeChild(spark, sf)
    val gPlan = gq.queryExecution.executedPlan.toString
    assert(!gPlan.contains("HashAggregate") && !gPlan.contains("collect_list"),
      s"child plan still nests:\n$gPlan")
    assert(!gPlan.contains("orders.parquet"),
      s"unrestricted flat child should not join the parent:\n$gPlan")

    // restricted fetch DOES prune the child to fetched parent keys
    val flat = src.fetchFlat(FetchRequest("ORDERS",
      filter = Some("o_orderdate" -> java.sql.Timestamp.valueOf("1997-06-01 00:00:00")),
      expand = Seq("ORDERITEMS"))).get
    val child = flat.children("ORDERITEMS").df
    assert(child.queryExecution.optimizedPlan.toString.contains("LeftSemi"))
    // pruned child carries only fetched-parent keys (some parents have
    // no children, so subset — not equality)
    val orphan = child.join(flat.parent,
      child("l_orderkey") === flat.parent("o_orderkey"), "left_anti").count()
    assert(orphan == 0)
    assert(child.count() > 0)
  }

  test("EVENTS entity refresh end-to-end: nanos shim + NTZ watermark through the pipeline") {
    val wh = tmpDir("whe")
    val writer = new StagingWriter(spark, wh)
    val job = new RefreshJob(spark, new ParquetSimSource(spark, sf), writer)
    val cfg = ExtractionConfig("ds", "n", "a", systemTimezone = "UTC",
      entities = Seq(EntityConfig("EVENTS", filterFlag = true,
        filterField = "ts", dataStartDate = "2024-01-10 00:00:00")))

    val (r1, updated) = job.run(cfg, incremental = false)
    assert(r1.errors.isEmpty)
    val written = r1.tables.head.recordsWritten
    val expected = graft.queries.Queries.p4IncrementalWindow(spark, sf).count()
    assert(written == expected && written > 0)
    // staged ts is a usable timestamp, not raw INT64 nanos
    assert(writer.read("stg_events").schema("ts").dataType ==
      org.apache.spark.sql.types.TimestampNTZType)
    // watermark = max(ts) observed on the write job, NTZ-formatted
    assert(updated.entities.head.lastRun.exists(_.startsWith("2024-")))

    // idle incremental: strict > past the observed max, zero rows
    val (r2, _) = job.run(updated, incremental = true)
    assert(r2.errors.isEmpty)
    assert(r2.tables.head.recordsWritten == 0)
  }

  test("error isolation: unknown entity logged, rest proceed") {
    val wh = tmpDir("wh")
    val writer = new StagingWriter(spark, wh)
    val job = new RefreshJob(spark, new ParquetSimSource(spark, sf), writer)
    val bad = config.copy(entities =
      EntityConfig("NOPE") +: config.entities)
    val (report, _) = job.run(bad, incremental = false)
    assert(report.errors.map(_.entityId) == Seq("NOPE"))
    assert(report.tables.exists(_.tableName == "stg_orders"))
  }
}
