package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** The DSv2 OData connector: pushdown contract (filter/limit/column),
  * paged partition planning, schema inference, and row-side filter
  * correctness over canned `{"value": [...]}` pages. */
class ODataSourceSpec extends SparkSpec {

  private def writePages(dir: String, pages: Seq[String]): Unit =
    pages.zipWithIndex.foreach { case (body, i) =>
      Files.write(Paths.get(s"$dir/page-$i.json"), body.getBytes("UTF-8"))
    }

  private val schema = StructType(Seq(
    StructField("ordname", StringType),
    StructField("qty", LongType),
    StructField("curdate", TimestampType)))

  private def fixture: String = {
    val dir = tmpDir("odata")
    writePages(dir, Seq(
      """{"value": [
        |  {"ordname": "SO1", "qty": 5, "curdate": "2024-01-01T00:00:00"},
        |  {"ordname": "SO2", "qty": 7, "curdate": "2024-02-01T00:00:00"}]}""".stripMargin,
      """{"value": [
        |  {"ordname": "SO3", "qty": 2, "curdate": "2024-03-01T00:00:00"},
        |  {"ordname": "SO4", "qty": 9, "curdate": "2024-04-01T00:00:00"}]}""".stripMargin))
    dir
  }

  test("reads all pages as partitions; schema inference types columns") {
    val dir = fixture
    val df = spark.read.format("graft-odata").schema(schema)
      .option("path", dir).load()
    assert(df.count() == 4)
    assert(df.rdd.getNumPartitions == 2) // one partition per page

    val inferred = spark.read.format("graft-odata").option("path", dir).load()
    assert(inferred.schema("qty").dataType == LongType)
    assert(inferred.schema("curdate").dataType == TimestampType)
    assert(inferred.schema("ordname").dataType == StringType)
    assert(inferred.count() == 4)
  }

  test("filter + limit + column pushdown land in the scan, results correct") {
    val dir = fixture
    val df = spark.read.format("graft-odata").schema(schema)
      .option("path", dir).load()

    val q = df.filter(col("qty") >= 5).select("ordname", "qty")
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("qty ge 5"), s"filter not compiled into scan:\n$plan")
    assert(plan.contains("$select=ordname,qty"), s"columns not pruned:\n$plan")
    assert(q.collect().map(_.getString(0)).toSet == Set("SO1", "SO2", "SO4"))

    val lim = df.limit(1)
    assert(lim.queryExecution.executedPlan.toString.contains("$top=1"))
    assert(lim.count() == 1)

    // timestamp predicate pushes and evaluates row-side
    val ts = df.filter(col("curdate") >= lit("2024-02-15 00:00:00").cast("timestamp"))
    assert(ts.queryExecution.executedPlan.toString.contains("curdate ge datetime"))
    assert(ts.collect().map(_.getString(0)).toSet == Set("SO3", "SO4"))
  }

  test("unsupported predicates stay as Spark residuals and still apply") {
    val dir = fixture
    val df = spark.read.format("graft-odata").schema(schema)
      .option("path", dir).load()
    val q = df.filter(col("ordname").endsWith("4")) // not OData-pushable
    assert(q.collect().map(_.getString(0)).toSeq == Seq("SO4"))
  }
}
