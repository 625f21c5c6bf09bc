package graft.queries

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

import graft.sources.{FetchRequest, ParquetSimSource}
import graft.xform.Normalizer

/** The oracle-checked query inventory (SURVEY.md §7.3): one named query
  * per operator family of §2, each paired with ANSI SQL for the DuckDB
  * oracle in [[Oracles]]. Conventions for hash-stable comparison:
  *
  *   - every aggregate/computed column is aliased identically in the
  *     DataFrame code and the SQL;
  *   - money sums go through DECIMAL(18,2) and back to DOUBLE so results
  *     are order-independent and bit-exact on both engines;
  *   - counts are cast to BIGINT on the DuckDB side (its COUNT/SUM over
  *     ints widens to HUGEINT, Spark's stays LongType);
  *   - top-k queries carry a full deterministic tiebreak;
  *   - run-dependent audit columns (uuid, wall clock) are excluded from
  *     query outputs (their semantics are ScalaTest-verified instead).
  */
object Queries {

  private def t(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  /** Decimal-exact, order-independent money sum returned as DOUBLE. */
  private def moneySum(c: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    sum(c.cast("decimal(18,2)")).cast("double")

  /** Gate-side PLAN assertions (the s10/s11/s12 pruning pins) execute
    * the query once INSIDE the builder — correct for the correctness
    * gate (Verify proves pruning happened on the gated run itself),
    * wrong for the bench (each timed rep would run the scan job twice
    * and read mutable per-scan state a concurrent execution could
    * race — ADVICE r14). System property `graft.gate.asserts=off`
    * (set by [[graft.Bench]]) skips them; the same assertions are
    * ALSO independently spec-pinned in ODataSourceSpec, so switching
    * them off never un-pins the behavior. Default ON. */
  private[graft] def gateAsserts: Boolean =
    !sys.props.get("graft.gate.asserts").contains("off")

  // ---------------------------------------------------------------- scans

  /** S2: incremental predicate pushed into the parquet scan. */
  def s2FilterPushdown(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "orders")
      .filter(col("o_orderdate") >= lit(Timestamp.valueOf("1997-06-01 00:00:00")))
      .select("o_orderkey", "o_custkey", "o_orderdate", "o_totalprice")

  /** S4: limit pushdown — deterministic via count-over-limit. */
  def s4LimitProbe(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "lineitem").limit(500)
      .agg(count(lit(1)).as("n_rows"))

  /** P4: incremental watermark window over the events stream table.
    * Goes through the source so the TIMESTAMP(NANOS) shim applies: the
    * predicate is pushed on the raw INT64 nanos, the output column is
    * normalized to TIMESTAMP_NTZ micros. */
  def p4IncrementalWindow(spark: SparkSession, dir: String): DataFrame = {
    val src = new ParquetSimSource(spark, dir)
    src.fetch(FetchRequest("EVENTS",
        filter = Some("ts" -> Timestamp.valueOf("2024-01-10 00:00:00"))))
      .select("event_id", "ts", "user_id", "event_type", "value")
  }

  // ------------------------------------------------------- normalization

  /** G1: subform extraction via the FLAT fetch path — the child frame is
    * a direct scan with the parent PK propagated and cast to string
    * (PK→String rule); no collect_list/explode round-trip exists in the
    * plan (EntitySource.fetchFlat). The nested path's semantics are
    * covered by NormalizerSpec/ParquetSimSourceSpec. */
  def g1ExplodeChild(spark: SparkSession, dir: String): DataFrame = {
    val src = new ParquetSimSource(spark, dir)
    val flat = src.fetchFlat(FetchRequest("ORDERS", expand = Seq("ORDERITEMS"))).get
    val n = Normalizer.normalizeFlat("ORDERS", flat, Seq("o_orderkey"),
      "verify", Timestamp.valueOf("2026-01-01 00:00:00"))
    n.children("orderitems")
      .drop("extractionid", "extractiontimestamputc")
  }

  /** P1-P3: parent projection — subform never fetched (flat children are
    * independent lazy plans, and this consumer reads only the parent, so
    * the child table is not even scanned), identifiers lowercased, PK
    * cast to string. (Audit columns excluded: run-dependent.) */
  def p1ParentProjection(spark: SparkSession, dir: String): DataFrame = {
    val src = new ParquetSimSource(spark, dir)
    val flat = src.fetchFlat(FetchRequest("ORDERS", expand = Seq("ORDERITEMS"))).get
    val n = Normalizer.normalizeFlat("ORDERS", flat, Seq("o_orderkey"),
      "verify", Timestamp.valueOf("2026-01-01 00:00:00"))
    n.parent.drop("extractionid", "extractiontimestamputc")
  }

  // --------------------------------------------------------------- joins

  /** J1: the 6-row type-mapping lookup join (broadcast). Materialized as
    * data so the oracle can check it: map each lineitem column's source
    * type. */
  def j1TypeMapJoin(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val fields = Seq(
      ("l_orderkey", "Edm.Int64"), ("l_quantity", "Edm.Decimal"),
      ("l_returnflag", "Edm.String"), ("l_shipdate", "Edm.DateTimeOffset"),
      ("l_comment", "Edm.Guid")).toDF("field_name", "source_type")
    val mapping = graft.types.TypeMapper.defaultMappings
      .map(m => (m.sourceSystem, m.sourceDataType, m.targetDataType))
      .toDF("source_system", "source_type", "target_type")
      .filter(col("source_system") === "priority")
    fields.join(broadcast(mapping), Seq("source_type"), "left_outer")
      .select(col("field_name"), col("source_type"), col("target_type"))
  }

  /** J2 + star schema: fact-dim equi-joins with broadcast dims, grouped
    * revenue per region/nation (drawio mart shape). */
  def q3StarJoin(spark: SparkSession, dir: String): DataFrame = {
    val orders = t(spark, dir, "orders")
    val customer = t(spark, dir, "customer")
    val nation = t(spark, dir, "nation")
    val region = t(spark, dir, "region")
    orders
      .join(customer, orders("o_custkey") === customer("c_custkey"))
      .join(broadcast(nation), customer("c_nationkey") === nation("n_nationkey"))
      .join(broadcast(region), nation("n_regionkey") === region("r_regionkey"))
      .groupBy(col("r_name"), col("n_name"))
      .agg(
        moneySum(col("o_totalprice")).as("revenue"),
        count(lit(1)).as("n_orders"))
  }

  // -------------------------------------------------------- aggregations

  /** TPC-H Q1-shaped pricing summary: the group-by/agg surface. */
  def q1Agg(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "lineitem")
      .filter(col("l_shipdate") <= lit("1998-09-02 00:00:00").cast("timestamp_ntz"))
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        sum(col("l_quantity")).as("sum_qty"),
        moneySum(col("l_extendedprice")).as("sum_base_price"),
        // decimal × decimal keeps the whole sum exact (order-independent)
        sum(col("l_extendedprice").cast("decimal(18,2)") *
          (lit(1) - col("l_discount").cast("decimal(4,2)")))
          .cast("double").as("sum_disc_price"),
        count(lit(1)).as("count_order"))

  /** A2: latest-of (top-1 by sort with full tiebreak) — the reference's
    * latest-config-version read. */
  def a2LatestTop1(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "orders")
      .orderBy(col("o_orderdate").desc, col("o_orderkey").desc)
      .limit(1)
      .select("o_orderkey", "o_custkey", "o_orderdate", "o_totalprice")

  // ------------------------------------------------------------- windows

  /** Ranking window: top-3 orders per customer, deterministic tiebreak. */
  def w1WindowRank(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
    t(spark, dir, "orders")
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 3)
      .select("o_custkey", "o_orderkey", "o_totalprice", "rn")
  }

  /** Windowed event aggregation (the fact_events/events_goals reporting
    * shape): 1-day tumbling windows per event type, via the SAME
    * windowedCounts the streaming path runs (batch = backfill mode). */
  def q5EventWindows(spark: SparkSession, dir: String): DataFrame = {
    val src = new ParquetSimSource(spark, dir)
    graft.streaming.EventsStream.windowedCounts(src.fetch(FetchRequest("EVENTS")))
  }

  /** Hierarchical totals via ROLLUP (region → nation → grand total) —
    * the grouping-sets surface over the star schema. */
  def q6Rollup(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "customer")
      .join(broadcast(t(spark, dir, "nation")),
        col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(t(spark, dir, "region")),
        col("n_regionkey") === col("r_regionkey"))
      .rollup(col("r_name"), col("n_name"))
      .agg(count(lit(1)).as("n_customers"),
        moneySum(col("c_acctbal")).as("total_balance"))

  /** Anti + semi join surface: per-segment counts of customers with and
    * without orders. */
  def q7SemiAnti(spark: SparkSession, dir: String): DataFrame = {
    val customer = t(spark, dir, "customer")
    val orders = t(spark, dir, "orders")
    val withOrders = customer
      .join(orders, customer("c_custkey") === orders("o_custkey"), "left_semi")
      .groupBy(col("c_mktsegment")).agg(count(lit(1)).as("n_active"))
    val withoutOrders = customer
      .join(orders, customer("c_custkey") === orders("o_custkey"), "left_anti")
      .groupBy(col("c_mktsegment")).agg(count(lit(1)).as("n_inactive"))
    withOrders.join(withoutOrders, Seq("c_mktsegment"), "full_outer")
      .select(col("c_mktsegment"),
        coalesce(col("n_active"), lit(0L)).as("n_active"),
        coalesce(col("n_inactive"), lit(0L)).as("n_inactive"))
  }

  /** EXCEPT surface: customers active in 1996 but not in 1997 (set
    * difference over distinct keys). */
  def q8Except(spark: SparkSession, dir: String): DataFrame = {
    val o = t(spark, dir, "orders")
    def activeIn(y: Int) = o
      .filter(col("o_orderdate") >= lit(Timestamp.valueOf(s"$y-01-01 00:00:00")) &&
        col("o_orderdate") < lit(Timestamp.valueOf(s"${y + 1}-01-01 00:00:00")))
      .select(col("o_custkey"))
    activeIn(1996).except(activeIn(1997))
      .agg(count(lit(1)).as("n_churned"))
  }

  /** Correlated scalar subquery (Catalyst decorrelates it to a join):
    * customers whose balance exceeds their nation's average. The average
    * is DECIMAL-sum / count — exact operands, so the derived double is
    * deterministic on both engines. */
  def q9ScalarSubquery(spark: SparkSession, dir: String): DataFrame = {
    val c = t(spark, dir, "customer")
    val natAvg = c.groupBy(col("c_nationkey").as("nk"))
      .agg((sum(col("c_acctbal").cast("decimal(18,2)")) /
        count(lit(1))).cast("double").as("nat_avg"))
    c.join(broadcast(natAvg), col("c_nationkey") === col("nk"))
      .filter(col("c_acctbal").cast("double") > col("nat_avg"))
      .groupBy(col("c_nationkey"))
      .agg(count(lit(1)).as("n_above_avg"))
  }

  /** Pivot surface: order counts per region × order status (static pivot
    * values, so the output schema is fixed). */
  def q10Pivot(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "orders")
      .join(t(spark, dir, "customer"), col("o_custkey") === col("c_custkey"))
      .join(broadcast(t(spark, dir, "nation")), col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(t(spark, dir, "region")), col("n_regionkey") === col("r_regionkey"))
      .groupBy(col("r_name"))
      .pivot("o_orderstatus", Seq("O", "F", "P"))
      .agg(count(lit(1)))
      .select(col("r_name"),
        coalesce(col("O"), lit(0L)).as("n_open"),
        coalesce(col("F"), lit(0L)).as("n_filled"),
        coalesce(col("P"), lit(0L)).as("n_partial"))

  /** UNPIVOT surface — the q10 inverse: the wide region × status
    * count frame melted back to long form via the NATIVE
    * `Dataset.unpivot` (Spark 3.4+ melt), status names restored from
    * the pivot column labels. Zero cells survive the round trip (the
    * pivot coalesced them), so the long frame is the FULL region ×
    * status grid — the oracle rebuilds the same grid by unioning the
    * q10 aggregate's columns. */
  def q17Unpivot(spark: SparkSession, dir: String): DataFrame =
    q10Pivot(spark, dir)
      .unpivot(Array(col("r_name")),
        Array(col("n_open"), col("n_filled"), col("n_partial")),
        "status_col", "n_orders")
      .select(col("r_name"),
        when(col("status_col") === "n_open", "O")
          .when(col("status_col") === "n_filled", "F")
          .otherwise("P").as("o_orderstatus"),
        col("n_orders"))

  /** INTERSECT surface: customers active in BOTH 1996 and 1997. */
  def q11Intersect(spark: SparkSession, dir: String): DataFrame = {
    val o = t(spark, dir, "orders")
    def activeIn(y: Int) = o
      .filter(col("o_orderdate") >= lit(Timestamp.valueOf(s"$y-01-01 00:00:00")) &&
        col("o_orderdate") < lit(Timestamp.valueOf(s"${y + 1}-01-01 00:00:00")))
      .select(col("o_custkey"))
    activeIn(1996).intersect(activeIn(1997))
      .agg(count(lit(1)).as("n_retained"))
  }

  /** CUBE surface: order counts over every subset of
    * {order status, priority} — all four grouping sets in one pass. */
  def q12Cube(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "orders")
      .cube(col("o_orderstatus"), col("o_orderpriority"))
      .agg(count(lit(1)).as("n_orders"))

  /** RANGE frame over a TIMESTAMP ordering with an INTERVAL bound —
    * the time-window analytic surface w1 (row frame) and x31 (integer
    * epoch-day range) don't cover: each order's trailing-7-day
    * revenue for its customer, `RANGE BETWEEN INTERVAL 7 DAYS
    * PRECEDING AND CURRENT ROW`. A RANGE frame is defined by VALUE,
    * so same-timestamp peers land in every peer's frame identically
    * on both engines — no tiebreak column needed (the one window
    * shape where ties are free). Exact cents sums only. */
  def q19IntervalFrame(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "orders")
      .select(col("o_orderkey"), col("o_custkey"),
        col("o_orderdate").cast("timestamp").as("ots"),
        expr("CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)").as("cents"))
      .withColumn("trail7_cents", expr(
        "sum(cents) OVER (PARTITION BY o_custkey ORDER BY ots" +
          " RANGE BETWEEN INTERVAL 7 DAYS PRECEDING AND CURRENT ROW)"))
      .select(col("o_orderkey"), col("cents"), col("trail7_cents"))

  /** Mixed GROUPING SETS — the grouping surface between rollup (q6)
    * and cube (q12): an explicit set list that is NEITHER (both
    * one-dimension margins, no grand total), plus the packed grouping
    * id spelled `grouping(a)·2 + grouping(b)` EXPLICITLY on both
    * engines (native grouping_id bit order is an engine convention —
    * never hash-gate it). grouping() must sit in the agg clause
    * (the x42 lesson). */
  def q18GroupingSets(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "orders")
      .groupingSets(
        Seq(Seq(col("o_orderstatus"), col("o_orderpriority")),
          Seq(col("o_orderstatus")), Seq(col("o_orderpriority"))),
        col("o_orderstatus"), col("o_orderpriority"))
      .agg(count(lit(1)).as("n_orders"),
        sum(expr("CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)"))
          .as("cents"),
        (grouping(col("o_orderstatus")) * 2 +
          grouping(col("o_orderpriority"))).cast("long").as("gid"))

  /** Goals-vs-actuals reporting — the drawio spec's
    * `events_goals{event_type, goal_period, goal}` shape (SURVEY §0):
    * daily actuals per event type ([[q5EventWindows]]) joined to the
    * tiny goal dimension (broadcast — no shuffle of the actuals beyond
    * the window agg they already need). Attainment is a per-row division
    * of exact integers, deterministic under the hash gate. */
  def q13GoalsVsActuals(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val goals = Seq(
      ("view", "day", 40L), ("click", "day", 20L), ("purchase", "day", 10L),
      ("signup", "day", 5L), ("error", "day", 3L))
      .toDF("event_type", "goal_period", "goal")
    q5EventWindows(spark, dir)
      .join(broadcast(goals), Seq("event_type"))
      .select(col("window_start"), col("event_type"), col("goal_period"),
        col("goal"), col("n_events"),
        (col("n_events").cast("double") / col("goal")).as("attainment"),
        (col("n_events") >= col("goal")).as("met"))
  }

  /** S1 through the PRODUCTION connector: the DSv2 `graft-odata` read
    * path — page-file "server" rendered from the orders fixture
    * ([[graft.sources.odata.ODataPages]]), filter + limit pushed into
    * the scan (`$filter=o_custkey ge 50&$top=...` lands in the scan
    * description — plan-asserted in ODataSourceSpec), executor-side
    * per-page partitions. The limit bound exceeds every SF's slice
    * size, so it exercises the pushdown without truncating — a
    * truncating limit would pick nondeterministic rows and can never
    * hash-gate. The sim-source legs of S1 stay gated by s2/g1/p1. */
  def s1ODataScan(spark: SparkSession, dir: String): DataFrame = {
    import graft.sources.odata.ODataPages
    spark.read.format("graft-odata")
      .schema(ODataPages.ordersSchema)
      .option("path", ODataPages.ordersPages(spark, dir))
      .load()
      .filter(col("o_custkey") >= 50)
      .limit(2000000)
  }

  /** S7: the `$skip` (OFFSET) leg — a pushed global offset converts
    * into (first page, in-page skip) from the render-time page-count
    * sidecar at PLAN time, pruning fully-skipped pages before any
    * read (the production transport sends `$skip=n` and the server
    * walks its own `$skiptoken` index). Pages serve rows in
    * o_orderkey order, so the offset slice is the deterministic
    * ORDER BY o_orderkey OFFSET cut the oracle states. COMPLETE
    * pushdown by contract — acceptance is therefore guarded (raw
    * page stream only, sidecar present; see ODataScanBuilder). */
  def s7ODataOffset(spark: SparkSession, dir: String): DataFrame = {
    import graft.sources.odata.ODataPages
    spark.read.format("graft-odata")
      .schema(ODataPages.ordersSchema)
      .option("path", ODataPages.ordersPages(spark, dir))
      .load()
      .offset(37)
  }

  /** S8: the `@odata.nextLink` CONTINUATION-TOKEN leg — the one
    * sliver of the reference's transport loop previously without an
    * engine counterpart (it walks `@odata.nextLink`,
    * `resources/priorityDataSource.py:629-736`, where s7's `$skip` is
    * client-driven): the page "server" here reveals page N+1's opaque
    * token only inside page N, the connector walks the chain from the
    * `_head.meta` entry token, and a DECOY page sitting unlinked in
    * the same directory proves the walk — a directory-listing reader
    * would serve the decoy row and hash-mismatch. The pushed filter
    * still applies row-side; OFFSET pushdown self-declines (no counts
    * sidecar exists for a token server, by construction). */
  def s8ODataNextlink(spark: SparkSession, dir: String): DataFrame = {
    import graft.sources.odata.ODataPages
    spark.read.format("graft-odata")
      .schema(ODataPages.ordersSchema)
      .option("path", ODataPages.ordersLinkedPages(spark, dir))
      .load()
      .filter(col("o_custkey") >= 25)
  }

  /** S9 through the PRODUCTION connector: the STRING-PREDICATE rung of
    * the pushdown ladder — `startsWith`/`endsWith`/`contains` compile
    * to the OData v4 string functions (`startswith(col,'v')`,
    * `endswith`, `contains` — §5.1.1.5 of the protocol) and `isin`
    * compiles to the OData 4.01 `in` operator, so the whole residual
    * lands in `$filter` and the production server would return only
    * matching rows. Row-side evaluation keeps correctness independent
    * of the server (the connector's standing contract); acceptance of
    * `in` requires every member row-side evaluable (a NULL member is
    * declined — SQL IN is three-valued). The compiled request string
    * is plan-pinned in ODataSourceSpec. */
  def s9ODataStrings(spark: SparkSession, dir: String): DataFrame = {
    import graft.sources.odata.ODataPages
    spark.read.format("graft-odata")
      .schema(ODataPages.ordersSchema)
      .option("path", ODataPages.ordersPages(spark, dir))
      .load()
      .filter(col("o_orderpriority").startsWith("1") &&
        col("o_orderpriority").endsWith("GENT") &&
        col("o_orderpriority").contains("-URG") &&
        col("o_orderstatus").isin("F", "P"))
  }

  /** S10: RUNTIME FILTERING through the production connector — the
    * rung above planner statistics (VERDICT r13 task 6). A selective
    * dim (a handful of low order keys from the parquet warehouse)
    * joins the paged OData slice: Spark plans dynamic partition
    * pruning against the scan's `SupportsRuntimeFiltering` face, the
    * dim's build keys arrive at EXECUTION time, and the scan drops
    * every page whose render-time `_ranges.meta` key range can't
    * contain any of them — at 100 TB this is the catalog dim⋈fact
    * join reading only the pages the join can hit. The join result
    * hash-gates against DuckDB (pruning must never change rows); when
    * the slice spans more than one page the gate also REQUIRES that a
    * runtime filter reached the scan and pruned (post-filter pages <
    * directory pages) — plan-pinned in-gate, k8's numFiles
    * convention. Money exact via the shared cents idiom. */
  def s10ODataRuntimePrune(spark: SparkSession, dir: String): DataFrame = {
    import graft.sources.odata.{ODataPages, ODataScan, ODataTableProvider}
    val pagesDir = ODataPages.ordersPages(spark, dir)
    val fact = spark.read.format("graft-odata")
      .schema(ODataPages.ordersSchema)
      .option("path", pagesDir)
      .load()
    val dim = spark.read.parquet(s"$dir/orders.parquet")
      .filter(pmod(col("o_orderkey"), lit(2000)) === 0 &&
        col("o_orderkey") <= 6000)
      .select(col("o_orderkey").as("d_key"),
        expr("CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)").as("d_cents"))
    // explicit broadcast: the dim must be the BUILD side for its keys
    // to flow back into the scan — without the hint the planner may
    // broadcast the (statistically tiny, thanks to S4h) OData slice
    // itself, and a broadcast scan side has no exchange for dynamic
    // pruning to reuse (the runtime filter degrades to `true`)
    val joined = fact.join(broadcast(dim), col("o_orderkey") === col("d_key"))
      .select(col("o_orderkey"), col("o_custkey"), col("o_orderstatus"),
        col("o_orderpriority"), col("d_cents"))
    val nPages = ODataTableProvider.pageFiles(pagesDir).size
    if (nPages > 1 && gateAsserts) {
      // collect() executes THIS dataset's own query execution, so the
      // scan instance the assertion reads is the one that just ran
      // (the join output is a handful of rows — the fact side never
      // reaches the driver)
      joined.collect()
      val scan = ODataScan.scansIn(joined.queryExecution.executedPlan)
        .headOption.getOrElse(
          throw new IllegalStateException("no ODataScan in executed plan"))
      require(scan.runtimeFilterCount > 0,
        "runtime filter never reached the scan (DPP not planned)")
      require(scan.lastPlannedPages < nPages,
        s"no page pruned: planned ${scan.lastPlannedPages} of $nPages")
    }
    joined
  }

  /** S11: STATIC page pruning from PUSHED filters — the plan-time
    * complement of s10's runtime filtering (the parquet-footer
    * analogue for a paged server): a pushed `$filter` range predicate
    * is judged against each page's render-time `_ranges.meta` key
    * range and whole pages with no possible match never become input
    * partitions — at 100 TB an incremental `key >= watermark` catalog
    * query reads only the tail pages instead of every page the entity
    * ever served. Sound for every pushed-operator combination:
    * `$filter` precedes `$skip`/`$top`/`$apply` in OData evaluation
    * order, so a zero-match page contributes nothing to any of them.
    * The selected band sits in page 0 at every SF (9 rows); when the
    * slice spans >1 page the gate REQUIRES pruning (plan-pinned
    * in-gate, the s10 convention). */
  def s11ODataStaticPrune(spark: SparkSession, dir: String): DataFrame = {
    import graft.sources.odata.{ODataPages, ODataScan, ODataTableProvider}
    val pagesDir = ODataPages.ordersPages(spark, dir)
    val q = spark.read.format("graft-odata")
      .schema(ODataPages.ordersSchema)
      .option("path", pagesDir)
      .load()
      .filter(col("o_orderkey") >= 400L && col("o_orderkey") <= 1200L)
    val nPages = ODataTableProvider.pageFiles(pagesDir).size
    if (nPages > 1 && gateAsserts) {
      q.collect()
      val scan = ODataScan.scansIn(q.queryExecution.executedPlan)
        .headOption.getOrElse(
          throw new IllegalStateException("no ODataScan in executed plan"))
      require(scan.lastPlannedPages < nPages,
        s"pushed range filter pruned nothing: " +
          s"${scan.lastPlannedPages} of $nPages pages planned")
    }
    q
  }

  /** S12: TIMESTAMP page pruning — the literal production shape of
    * S11's watermark claim. The reference's ONE incremental predicate
    * is `filterField ge <ISO timestamp>`
    * (`resources/priorityDataSource.py:646-675`); a sidecar that can
    * only bound long keys never prunes it. The events page server
    * (arrival-ordered, `_ranges.meta` carrying tagged epoch-micros
    * `ts` bounds next to plain long `event_id` bounds) takes the
    * pushed `ts >= watermark` and plans only the TAIL pages — at
    * 100 TB the nightly refresh reads the new slice, not every page
    * the entity ever served. Fractional/string literals and
    * kind-mismatched columns stay conservative keeps (spec-pinned).
    * When the slice spans >1 page the gate REQUIRES pruning (the s11
    * convention, behind [[gateAsserts]]). */
  def s12ODataTsPrune(spark: SparkSession, dir: String): DataFrame = {
    import graft.sources.odata.{ODataPages, ODataScan, ODataTableProvider}
    val pagesDir = ODataPages.eventsPages(spark, dir)
    val q = spark.read.format("graft-odata")
      .schema(ODataPages.eventsSchema)
      .option("path", pagesDir)
      .load()
      .filter(col("ts") >=
        lit(Timestamp.valueOf("2024-01-25 00:00:00")))
    val nPages = ODataTableProvider.pageFiles(pagesDir).size
    if (nPages > 1 && gateAsserts) {
      q.collect()
      val scan = ODataScan.scansIn(q.queryExecution.executedPlan)
        .headOption.getOrElse(
          throw new IllegalStateException("no ODataScan in executed plan"))
      require(scan.lastPlannedPages < nPages,
        s"pushed watermark pruned nothing: " +
          s"${scan.lastPlannedPages} of $nPages pages planned")
    }
    q
  }

  /** S5 through the PRODUCTION connector: the `$orderby`+`$top` leg —
    * ORDER BY + LIMIT fuse into the connector's TopN pushdown
    * (partial: each page serves its local top-n under the exact
    * requested ordering, Spark's TakeOrderedAndProject merges). The
    * (o_custkey desc, o_orderkey asc) pair is a total order, so the
    * selected rows hash-gate; the request string in the scan
    * description carries `$orderby` (plan-pinned in ODataSourceSpec). */
  def s5ODataTopN(spark: SparkSession, dir: String): DataFrame = {
    import graft.sources.odata.ODataPages
    spark.read.format("graft-odata")
      .schema(ODataPages.ordersSchema)
      .option("path", ODataPages.ordersPages(spark, dir))
      .load()
      .orderBy(col("o_custkey").desc, col("o_orderkey"))
      .limit(20)
  }

  /** S6 through the PRODUCTION connector: the `$apply` GROUP BY leg —
    * the fifth rung of the pushdown ladder. The aggregate fuses into
    * the scan as a PARTIAL pushdown: each page returns its per-group
    * (count, sum, min, max) cells and Spark's final aggregate merges
    * them, so the exchange moves O(pages · groups) cells instead of
    * every row — the same economy the reference server's `$apply`
    * offers. The compiled `$apply=groupby((o_orderstatus),
    * aggregate(...))` request is plan-pinned in ODataSourceSpec along
    * with a cells-not-rows scan-output assert and an unpushed
    * cross-proof. Hash-safe by construction: count/min/max are exact
    * and the only SUM is over a LONG column (a pushed double sum
    * would merge page partials in nondeterministic order). */
  def s6ODataAgg(spark: SparkSession, dir: String): DataFrame = {
    import graft.sources.odata.ODataPages
    spark.read.format("graft-odata")
      .schema(ODataPages.ordersSchema)
      .option("path", ODataPages.ordersPages(spark, dir))
      .load()
      .filter(col("o_custkey") >= 50)
      .groupBy(col("o_orderstatus"))
      .agg(count(lit(1)).as("n_orders"),
        sum(col("o_custkey")).as("sum_custkey"),
        min(col("o_orderkey")).as("min_orderkey"),
        max(col("o_orderkey")).as("max_orderkey"))
  }

  /** S3 through the PRODUCTION connector: the nested `$expand` leg —
    * page files carry each order's lineitems inline as
    * `ORDERITEMS_SUBFORM: [...]` (the reference's
    * `$expand=ORDERITEMS_SUBFORM` response shape,
    * priorityDataSource.py:680-690), the connector infers the
    * array<struct> column, [[graft.sources.odata.ODataEntitySource]]
    * serves the entity fetch, and the explode flattens parent key +
    * child fields — hash-matched against the DuckDB join over the
    * same parquet slice. The sim-source leg of S3 stays gated by g1. */
  def s3ODataExpand(spark: SparkSession, dir: String): DataFrame = {
    import graft.sources.odata.{ODataEntitySource, ODataPages}
    val src = new ODataEntitySource(spark, ODataPages.ordersExpandRoot(spark, dir))
    src.fetch(FetchRequest("ORDERS", expand = Seq("ORDERITEMS")))
      .select(col("o_orderkey"),
        explode(col("ORDERITEMS_SUBFORM")).as("it"))
      .select(col("o_orderkey"),
        col("it.l_linenumber").as("l_linenumber"),
        col("it.l_partkey").as("l_partkey"),
        col("it.l_suppkey").as("l_suppkey"),
        col("it.l_returnflag").as("l_returnflag"))
  }

  /** Q16: the SQL-catalog front door — a DSv2 `TableCatalog`
    * ([[graft.sources.odata.GraftCatalog]]) registered over the
    * `$expand` page "server", then plain `spark.sql` against
    * `<cat>.ORDERS`: catalog resolution, schema inference (incl. the
    * array<struct> subform column), and the pushdown ladder all ride
    * the same [[graft.sources.odata.ODataTable]] the format reader
    * serves — the reference's `$metadata` catalog re-expressed as the
    * Spark catalog plugin it maps to. The catalog NAME is derived
    * from the root (one immutable root per catalog instance —
    * CatalogManager caches plugins, so a name must never be rebound
    * to a different root within a session). */
  def q16SqlCatalog(spark: SparkSession, dir: String): DataFrame = {
    import graft.sources.odata.{GraftCatalog, ODataPages}
    val root = ODataPages.ordersExpandRoot(spark, dir)
    val cat = s"graft_cat_${math.abs(root.hashCode).toString}"
    spark.conf.set(s"spark.sql.catalog.$cat",
      classOf[GraftCatalog].getName)
    spark.conf.set(s"spark.sql.catalog.$cat.root", root)
    spark.sql(
      s"""SELECT o_orderkey, o_orderstatus,
         |       size(ORDERITEMS_SUBFORM) AS n_items
         |FROM $cat.ORDERS WHERE o_orderkey >= 1000""".stripMargin)
  }

  /** K-series promote: the stg→final path (`StagingWriter.promote`,
    * the reference's readme.md:723-731 roadmap semantics — it lists
    * both `stg_orders` and `orders`) hash-proved end-to-end. An append
    * HISTORY is laid in a scratch warehouse — full extraction e1, an
    * incremental re-extraction e2 over the %7 keys with updated
    * totals, and a SAME-TIMESTAMP re-run e3 over the %14 keys (the
    * extractionid tiebreak is load-bearing, not decorative) — then
    * promoted and read back: one row per PK, latest extraction wins.
    * The oracle replays the identical history through a DuckDB
    * row_number window. Audit timestamps are fixed literals here so
    * they can participate in the hash (the run-dependent audit values
    * are ScalaTest-verified instead, the P3 convention). */
  def k5PromoteLatest(spark: SparkSession, dir: String): DataFrame = {
    val w = new graft.sinks.StagingWriter(spark, graft.util.Scratch.dir("promote_gate"))
    val o = t(spark, dir, "orders")
      .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"))
    def stamp(df: DataFrame, id: String, ts: String) = df
      .withColumn("extractionid", lit(id))
      .withColumn("extractiontimestamputc", lit(Timestamp.valueOf(ts)))
    w.writeEntity(stamp(o, "e1", "2026-01-01 00:00:00"), "ORDERS", append = false)
    w.writeEntity(stamp(
      o.filter(col("o_orderkey") % 7 === 0)
        .withColumn("o_totalprice", col("o_totalprice") + lit(1000.0)),
      "e2", "2026-02-01 00:00:00"), "ORDERS", append = true)
    w.writeEntity(stamp(
      o.filter(col("o_orderkey") % 14 === 0)
        .withColumn("o_totalprice", col("o_totalprice") + lit(2000.0)),
      "e3", "2026-02-01 00:00:00"), "ORDERS", append = true)
    w.promote("ORDERS", Seq("o_orderkey"))
    w.read("orders")
  }

  /** K14: the k5 promote semantics on the JDBC PRODUCTION backend
    * (VERDICT r11 task 5 — the parquet leg was hash-gated, the Derby
    * leg unit-only): the SAME e1/e2/e3 append history lands in a
    * Derby warehouse through [[graft.sinks.JdbcStagingWriter]] with a
    * TYPED catalog entry — the PK crosses as VARCHAR(255) (the
    * reference's PK→String rule, sqlDwh.py:346-350, here hash-VISIBLE:
    * the gate casts the key to string and the oracle mirrors it),
    * money as DOUBLE, the audit timestamp as TIMESTAMP — then
    * stg→final promotion runs ON the warehouse (rename swap) and the
    * gate reads the promoted table back over JDBC. The oracle replays
    * the identical history through the DuckDB latest-per-PK window
    * (timestamp desc, extractionid desc — e3's same-timestamp re-run
    * makes the tiebreak load-bearing, as in k5). In-memory Derby: one
    * DB per JVM, every table rewritten per invocation (reps are
    * deterministic). */
  def k14JdbcPromote(spark: SparkSession, dir: String): DataFrame = {
    import graft.model.{EntityMeta, FieldMeta}
    val url = "jdbc:derby:memory:k14gate;create=true"
    val w = new graft.sinks.JdbcStagingWriter(spark, url)
    val meta = EntityMeta("ORDERS", "priority", fields = Seq(
      FieldMeta("O_ORDERKEY", "Edm.Int64", keyFlag = true),
      FieldMeta("O_CUSTKEY", "Edm.Int64", targetDataType = Some("BIGINT")),
      FieldMeta("O_TOTALPRICE", "Edm.Decimal", targetDataType = Some("DOUBLE"))),
      entityPk = Seq("O_ORDERKEY"))
    val o = t(spark, dir, "orders")
      .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"))
    def stamp(df: DataFrame, id: String, ts: String) = df
      .withColumn("o_orderkey", col("o_orderkey").cast("string"))
      .withColumn("extractionid", lit(id))
      .withColumn("extractiontimestamputc", lit(Timestamp.valueOf(ts)))
    w.writeEntity(stamp(o, "e1", "2026-01-01 00:00:00"), meta, append = false)
    w.writeEntity(stamp(
      o.filter(col("o_orderkey") % 7 === 0)
        .withColumn("o_totalprice", col("o_totalprice") + lit(1000.0)),
      "e2", "2026-02-01 00:00:00"), meta, append = true)
    w.writeEntity(stamp(
      o.filter(col("o_orderkey") % 14 === 0)
        .withColumn("o_totalprice", col("o_totalprice") + lit(2000.0)),
      "e3", "2026-02-01 00:00:00"), meta, append = true)
    w.promote("ORDERS", Seq("o_orderkey"))
    // the PROMOTED final table (JdbcStagingWriter.read targets the
    // stg_ layer; promotion lands at the bare entity name)
    spark.read.jdbc(url, "orders", new java.util.Properties)
  }

  /** K16: JDBC predicate pushdown — the warehouse-READ side of the
    * JDBC leg (k14 proves the write/promote side): the numeric
    * predicates must land in the JDBC scan's `PushedFilters` so the
    * warehouse, not Spark, does the cut — at warehouse scale an
    * unpushed filter ships the whole table over the wire. The filter
    * deliberately touches only numeric columns: Spark's generic JDBC
    * writer maps StringType to CLOB on Derby, and Derby cannot
    * compare CLOBs — the string column rides along unfiltered, which
    * is itself the documented dialect caveat. */
  def k16JdbcPushdown(spark: SparkSession, dir: String): DataFrame = {
    val url = "jdbc:derby:memory:k16gate;create=true"
    t(spark, dir, "customer")
      .select("c_custkey", "c_name", "c_acctbal", "c_mktsegment")
      .write.mode("overwrite").jdbc(url, "customer_src", new java.util.Properties)
    val r = spark.read.jdbc(url, "customer_src", new java.util.Properties)
      .filter(col("c_acctbal") > 1000.0 && col("c_custkey") <= 700L)
    // the rendered plan truncates long PushedFilters lists — read the
    // scan node's UNtruncated metadata instead
    val pushed = r.queryExecution.executedPlan.collectLeaves().collectFirst {
      case s: org.apache.spark.sql.execution.RowDataSourceScanExec =>
        s.metadata.getOrElse("PushedFilters", "")
    }.getOrElse("")
    require(pushed.contains("GreaterThan(c_acctbal,1000.0)") &&
      pushed.contains("LessThanOrEqual(c_custkey,700)"),
      s"JDBC predicates not pushed: $pushed")
    r
  }

  /** K18: PARALLEL partitioned JDBC read — the scale face of the JDBC
    * source next to K2j's predicate pushdown: a plain `spark.read
    * .jdbc` serializes the whole warehouse table through ONE task and
    * one connection; `partitionColumn`/bounds/`numPartitions` split
    * the scan into range-predicate slices read CONCURRENTLY, each
    * task its own connection and `WHERE` stride — the only way a
    * 10⁹-row warehouse table ingests in cluster time. Bounds only
    * steer the stride (rows outside them land in the edge
    * partitions — completeness never depends on the guess, which is
    * what the hash against the full-table oracle proves); the
    * partition count is asserted on the planned RDD. */
  def k18JdbcPartitioned(spark: SparkSession, dir: String): DataFrame = {
    val url = "jdbc:derby:memory:k18gate;create=true"
    t(spark, dir, "customer")
      .select("c_custkey", "c_name", "c_acctbal", "c_mktsegment")
      .write.mode("overwrite")
      .jdbc(url, "customer_src", new java.util.Properties)
    val r = spark.read.jdbc(url, "customer_src", "c_custkey",
      0L, 100000L, 4, new java.util.Properties)
    require(r.rdd.getNumPartitions == 4,
      s"expected 4 range partitions, got ${r.rdd.getNumPartitions}")
    r
  }

  /** K17: corrupt-file tolerance — a landing directory with one
    * garbage `.parquet` alongside the good parts, read under the
    * per-relation `ignoreCorruptFiles` option with an EXPLICIT schema
    * (schema inference would open the corrupt footer before the
    * option can apply). The strict read must FAIL LOUDLY (asserted
    * in-gate) — tolerance is an explicit opt-in, never a default —
    * and the tolerant read must serve exactly the good files' rows,
    * which is what hashes against the oracle. */
  def k17CorruptIgnore(spark: SparkSession, dir: String): DataFrame = {
    val out = s"${graft.util.Scratch.dir("corrupt_gate")}/customer_land"
    val c = t(spark, dir, "customer")
    c.write.mode("overwrite").parquet(out)
    java.nio.file.Files.write(
      java.nio.file.Paths.get(out, "part-99999-corrupt.parquet"),
      "this is not a parquet file".getBytes("UTF-8"))
    // the strict read must fail FOR THE RIGHT REASON: only an error
    // whose chain carries FOOTER-SPECIFIC evidence counts. Bare
    // "parquet"/"corrupt" substrings don't discriminate — the planted
    // file is NAMED part-99999-corrupt.parquet, so any unrelated I/O
    // failure (permissions, FileNotFound) that merely quotes the path
    // would satisfy a path-insensitive substring match (ADVICE r13).
    // Evidence accepted: the reader's footer diagnostics ("not a
    // parquet file", "magic number", "footer"), or a decode-layer
    // exception CLASS in the cause chain.
    val strictFails =
      try { spark.read.schema(c.schema).parquet(out).count(); false }
      catch { case e: Throwable =>
        val chain = Iterator.iterate(e)(_.getCause)
          .takeWhile(_ != null).take(10).toSeq
        val msgs = chain.map(t =>
          String.valueOf(t.getMessage).toLowerCase).mkString(" | ")
        val classes = chain.map(_.getClass.getName.toLowerCase)
        val expected =
          msgs.contains("not a parquet file") ||
            msgs.contains("magic number") ||
            msgs.contains("footer") ||
            classes.exists(cn => cn.contains("parquetdecoding") ||
              cn.contains("parquetcrypto") ||
              cn.endsWith("corruptedparquetfileexception"))
        if (!expected) throw e
        true
      }
    require(strictFails, "strict read of a corrupt landing dir must fail")
    spark.read.schema(c.schema)
      .option("ignoreCorruptFiles", "true").parquet(out)
  }

  /** K2 gate: the reference's debug CSV dump
    * (priorityDataSource.py:879) hash-proved as a ROUND TRIP — the
    * staged customer frame dumped through [[graft.sinks.StagingWriter
    * .debugCsv]] and read back under the original schema must equal
    * the oracle's read of the source table. The frame crosses the
    * type hazards a CSV contract must survive: doubles (Java's
    * `Double.toString` round-trips bit-exactly and Spark's reader
    * parses its own rendering), negative balances, an int32 column
    * whose width the explicit read schema must preserve. Audit
    * columns are omitted (P3: run-dependent values live in
    * ScalaTest, not hash gates). */
  def k6CsvRoundtrip(spark: SparkSession, dir: String): DataFrame = {
    val w = new graft.sinks.StagingWriter(
      spark, graft.util.Scratch.dir("csv_gate"))
    val c = t(spark, dir, "customer")
    w.debugCsv(c, "customer_dump")
    spark.read.schema(c.schema).option("header", true)
      .csv(s"${w.path("customer_dump")}__debug_csv")
  }

  /** K-series CSV ESCAPING leg — k6 proves the happy-path round trip;
    * THIS one proves the hostile path every real CSV export dies on:
    * embedded double quotes, field separators, and NEWLINES inside a
    * value. Every 7th customer name gets the `",\n"x` suffix planted
    * (query AND oracle — the oracle states the expected CONTENT; the
    * CSV file is the Spark side's transport), written with Spark's
    * default quoting/escaping and read back with `multiLine` (a
    * newline inside quotes spans records otherwise). The oracle is
    * the planted projection of the parquet source — the round trip
    * must be byte-identical through the quote/escape/newline
    * machinery. */
  def k12CsvEscaping(spark: SparkSession, dir: String): DataFrame = {
    val out = s"${graft.util.Scratch.dir("csv_esc_gate")}/hostile_csv"
    val planted = t(spark, dir, "customer")
      .select(col("c_custkey"),
        when(col("c_custkey") % 7 === 0,
          concat(col("c_name"), lit("\",\n\"x")))
          .otherwise(col("c_name")).as("c_name"),
        col("c_acctbal"))
    planted.write.mode("overwrite").option("header", true).csv(out)
    spark.read.schema(planted.schema).option("header", true)
      .option("multiLine", true).csv(out)
  }

  /** K-series DYNAMIC PARTITION OVERWRITE leg — the lakehouse write
    * semantics every incremental pipeline depends on (an overwrite
    * must replace ONLY the partitions present in the incoming frame;
    * static overwrite would drop the rest of the table): orders land
    * partitioned by status, then the 'F' slice alone is rewritten
    * with +1.00 on every total — the read-back must show modified 'F'
    * rows next to UNTOUCHED 'O'/'P' rows. The +1.0 is one double add
    * written identically in the oracle (the x40 rule); the partition
    * column comes back from directory names with its values intact. */
  def k13DynamicOverwrite(spark: SparkSession, dir: String): DataFrame = {
    val out = s"${graft.util.Scratch.dir("dynover_gate")}/orders_part"
    val o = t(spark, dir, "orders")
    o.write.mode("overwrite").partitionBy("o_orderstatus").parquet(out)
    o.filter(col("o_orderstatus") === "F")
      .withColumn("o_totalprice", col("o_totalprice") + 1.0)
      .write.mode("overwrite")
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy("o_orderstatus").parquet(out)
    spark.read.parquet(out)
      .select("o_orderkey", "o_orderstatus", "o_totalprice")
  }

  /** K-series ORC leg: the staging sink contract is format-agnostic —
    * the same frame written as ORC (Spark's other first-class columnar
    * format; a warehouse migrating between lakehouse stacks must
    * round-trip it) and read back must be value-identical to the
    * parquet source. Crosses the same type hazards as k6: doubles
    * (ORC stores IEEE bits, no text rendering involved), an int32
    * column whose width the format must preserve, negative balances.
    * The oracle reads the original parquet — the ORC leg is pure
    * transport. */
  def k7OrcRoundtrip(spark: SparkSession, dir: String): DataFrame = {
    val out = s"${graft.util.Scratch.dir("orc_gate")}/customer_orc"
    t(spark, dir, "customer").write.mode("overwrite").orc(out)
    spark.read.orc(out)
  }

  /** K-series CODEC leg: the staging parquet transport under ZSTD —
    * the codec a 100 TB corpus actually ships with (snappy trades
    * ~30% more storage for marginal speed at modern zstd levels; the
    * staging layer must prove the codec CONFIG reaches the files, not
    * just that parquet round-trips). The part-file suffix assert
    * makes a silently-ignored option loud; values then hash against
    * the oracle's direct read like k7. */
  def k15ZstdRoundtrip(spark: SparkSession, dir: String): DataFrame = {
    val out = s"${graft.util.Scratch.dir("zstd_gate")}/customer_zstd"
    t(spark, dir, "customer").write.mode("overwrite")
      .option("compression", "zstd").parquet(out)
    val parts = new java.io.File(out).listFiles
    require(parts != null && parts.exists(_.getName.endsWith(".zstd.parquet")),
      s"no zstd-suffixed part files under $out — codec option ignored")
    spark.read.parquet(out)
  }

  /** K-series JSONL leg: the third transport format — and the one
    * every LLM corpus actually ships as. The staged customer frame
    * dumped as JSON Lines and read back under the original schema
    * must equal the oracle's direct read: doubles survive because
    * Jackson renders the shortest round-trippable decimal (the k6
    * Double.toString argument), the explicit read schema restores the
    * int32 width JSON numbers don't carry, and absent keys (JSON
    * writers omit nulls) come back as NULL under the same schema.
    * `JsonlIngest` covers the PERMISSIVE corrupt-line side; this
    * gate proves the clean-path value contract. */
  def k10JsonlRoundtrip(spark: SparkSession, dir: String): DataFrame = {
    val out = s"${graft.util.Scratch.dir("jsonl_gate")}/customer_jsonl"
    val c = t(spark, dir, "customer")
    c.write.mode("overwrite").json(out)
    spark.read.schema(c.schema).json(out)
  }

  /** K-series schema-evolution leg: a staging layout that GREW a
    * column mid-history must read back as ONE frame without rewriting
    * old files — at 100 TB that is the only viable path (a schema
    * change appends new-schema files; history is immutable). The v1
    * slice is written without `acctbal_cents`, the v2 slice with it,
    * both under a hive `version=` partition; `mergeSchema` unions the
    * parquet footers and back-fills the missing column with NULL. The
    * oracle re-states the same history as an explicit UNION ALL with
    * typed NULLs — the gate proves Spark's footer-merge semantics
    * equal the declarative union (values, the int64 width of the new
    * column, NULL back-fill, and the partition column's int type). */
  def k11SchemaEvolution(spark: SparkSession, dir: String): DataFrame = {
    val out = s"${graft.util.Scratch.dir("evo_gate")}/customer_evo"
    val c = t(spark, dir, "customer")
    c.select(col("c_custkey"), col("c_mktsegment"))
      .write.mode("overwrite").parquet(s"$out/version=1")
    c.select(col("c_custkey"), col("c_mktsegment"),
        expr("CAST(floor(c_acctbal * 100 + 0.5) AS BIGINT)")
          .as("acctbal_cents"))
      .write.mode("overwrite").parquet(s"$out/version=2")
    spark.read.option("mergeSchema", true).parquet(out)
      .select(col("version"), col("c_custkey"), col("c_mktsegment"),
        col("acctbal_cents"))
  }

  /** K/S-series partition-layout leg: a 100 TB table is only usable
    * when a predicate on the partition column prunes the scan to the
    * matching directories — this gate writes ORDERS hive-partitioned
    * by `o_orderstatus`, reads it back filtered to one status, and
    * hash-matches the oracle's plain filtered projection. The PRUNING
    * itself (PartitionFilters in the scan, numFiles = one partition's
    * files) is plan-pinned in PlatformSpec — the hash gate proves the
    * partitioned write+discovery round-trips values and the partition
    * column's string type exactly. */
  def k8PartitionPrune(spark: SparkSession, dir: String): DataFrame = {
    val out = s"${graft.util.Scratch.dir("part_gate")}/orders_by_status"
    t(spark, dir, "orders")
      .write.mode("overwrite").partitionBy("o_orderstatus").parquet(out)
    spark.read.parquet(out).filter(col("o_orderstatus") === "F")
  }

  /** K-series bucketed-layout leg: the co-located join. Both sides are
    * written bucketed on the join key (8 buckets, sorted within), so
    * the fact-dimension join needs NO shuffle exchange on either side
    * — at 100 TB this is the difference between a map-side join over
    * pre-shuffled files and re-shuffling the fact table on every
    * query. Zero-exchange is plan-pinned in PlatformSpec with
    * broadcast disabled (AQE would otherwise hide the proof by
    * broadcasting the small side); this hash gate proves the bucketed
    * write+catalog read computes the same answer as the oracle's
    * plain join. Money exact via the shared floor(p*100+0.5) cents
    * idiom. */
  def k9BucketedJoin(spark: SparkSession, dir: String): DataFrame = {
    k9WriteBucketedTables(spark, dir)
    spark.table("k9_orders_b")
      .join(spark.table("k9_customer_b"), col("o_custkey") === col("c_custkey"))
      .groupBy(col("c_mktsegment"))
      .agg(count(lit(1)).as("n_orders"),
        sum(expr("CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)"))
          .as("total_cents"))
  }

  /** Lays the two bucketed external tables k9 joins — shared with the
    * PlatformSpec zero-exchange plan pin. Overwrite semantics so bench
    * reps and spec runs converge on the latest scratch location. */
  def k9WriteBucketedTables(spark: SparkSession, dir: String): Unit = {
    val base = graft.util.Scratch.dir("bucket_gate")
    t(spark, dir, "orders")
      .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"))
      .write.mode("overwrite").format("parquet")
      .bucketBy(8, "o_custkey").sortBy("o_custkey")
      .option("path", s"$base/orders_b").saveAsTable("k9_orders_b")
    t(spark, dir, "customer")
      .select(col("c_custkey"), col("c_mktsegment"))
      .write.mode("overwrite").format("parquet")
      .bucketBy(8, "c_custkey").sortBy("c_custkey")
      .option("path", s"$base/customer_b").saveAsTable("k9_customer_b")
  }

  /** Q14's SQL text — ONE constant shared verbatim by the Spark entry
    * (`spark.sql`) and the DuckDB oracle: the dialect-shared subset
    * (CTE + window + join + aggregate + integer cents) is the
    * portability contract a SQL user of this engine relies on, and
    * sharing the literal makes drift impossible. */
  val q14Sql: String =
    """WITH r AS (SELECT o_custkey, o_totalprice,
      |                  row_number() OVER (PARTITION BY o_custkey
      |                       ORDER BY o_orderdate DESC, o_orderkey DESC) AS rn
      |           FROM orders)
      |SELECT c_mktsegment,
      |       CAST(count(*) AS BIGINT) AS n_customers,
      |       CAST(sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT))
      |            AS BIGINT) AS latest_cents
      |FROM r JOIN customer ON c_custkey = o_custkey
      |WHERE rn = 1
      |GROUP BY c_mktsegment""".stripMargin

  /** Q14: the SQL ENTRY surface — users run SQL text, not just the
    * DataFrame API. The latest-order-per-customer rollup (window +
    * join + aggregate) executes via `spark.sql` over temp views; the
    * oracle runs the IDENTICAL text. */
  /** Q20: the LATERAL correlated-subquery SQL surface — a per-row
    * dependent subquery in FROM (top-2 nations by customer count per
    * region), the ANSI shape Spark decorrelates into a LateralJoin.
    * Deterministic: the inner ORDER BY carries a full (count desc,
    * name) tiebreak, so the selected rows hash-gate; DuckDB runs the
    * IDENTICAL statement. */
  def q20Lateral(spark: SparkSession, dir: String): DataFrame = {
    t(spark, dir, "region").createOrReplaceTempView("region")
    t(spark, dir, "nation").createOrReplaceTempView("nation")
    t(spark, dir, "customer").createOrReplaceTempView("customer")
    spark.sql(
      """SELECT r.r_name, t.n_name, t.n_customers
        |FROM region r,
        |LATERAL (
        |  SELECT n.n_name, CAST(count(*) AS BIGINT) AS n_customers
        |  FROM nation n JOIN customer c ON c.c_nationkey = n.n_nationkey
        |  WHERE n.n_regionkey = r.r_regionkey
        |  GROUP BY n.n_name
        |  ORDER BY n_customers DESC, n.n_name
        |  LIMIT 2) t""".stripMargin)
  }

  /** Q21: the RECURSIVE CTE surface (Spark 4's WITH RECURSIVE) — a
    * synthetic digit-chain hierarchy over customer keys (node →
    * node DIV 10 until 0), folded to a depth histogram. The loop
    * terminates in ≤ ⌈log₁₀ maxKey⌉ rounds, far inside Spark's
    * recursion-level limit; DuckDB replays the identical recursion
    * with `//` for the integral division (both floors agree on the
    * non-negative keys). */
  def q21Recursive(spark: SparkSession, dir: String): DataFrame = {
    t(spark, dir, "customer").createOrReplaceTempView("customer")
    spark.sql(
      """WITH RECURSIVE chain AS (
        |  SELECT c_custkey AS node, CAST(0 AS BIGINT) AS depth
        |  FROM customer
        |  UNION ALL
        |  SELECT node DIV 10 AS node, depth + 1 AS depth
        |  FROM chain WHERE node > 0
        |)
        |SELECT depth, CAST(count(*) AS BIGINT) AS n_rows
        |FROM chain GROUP BY depth""".stripMargin)
  }

  /** Q22: two modern ANSI surfaces in one statement — `GROUP BY ALL`
    * (group on every non-aggregate select item) and the aggregate
    * `FILTER (WHERE ...)` clause; DuckDB pioneered the former and
    * both engines run the IDENTICAL text. */
  def q22GroupByAll(spark: SparkSession, dir: String): DataFrame = {
    t(spark, dir, "orders").createOrReplaceTempView("orders")
    spark.sql(
      """SELECT o_orderstatus, o_orderpriority,
        |       CAST(count(*) AS BIGINT) AS n_orders,
        |       CAST(count(*) FILTER (WHERE o_totalprice > 100000.0)
        |            AS BIGINT) AS n_big
        |FROM orders GROUP BY ALL""".stripMargin)
  }

  /** Q23: the SQL SET-OPERATION surface with both duplicate
    * semantics — `INTERSECT` (distinct), `INTERSECT ALL` /
    * `EXCEPT ALL` (bag semantics: min / difference of
    * multiplicities) — the pandas `isin`/`merge(indicator)` shapes
    * the reference's report handling composes by hand. The three
    * legs are tagged and unioned into one frame so one gate pins all
    * three semantics; both engines run the IDENTICAL statement text
    * (oracle side), the DataFrame API side uses the typed
    * `intersect`/`intersectAll`/`exceptAll` operators — two
    * independent spellings of the same semantics. */
  def q23SetOps(spark: SparkSession, dir: String): DataFrame = {
    val cust = t(spark, dir, "customer")
      .filter(col("c_acctbal") > 5000.0)
      .select(col("c_custkey").as("k"))
    val ord = t(spark, dir, "orders")
    def keys(status: String) =
      ord.filter(col("o_orderstatus") === status)
        .select(col("o_custkey").as("k"))
    cust.intersect(ord.select(col("o_custkey").as("k")))
      .select(lit("intersect").as("leg"), col("k"))
      .unionByName(keys("F").exceptAll(keys("O"))
        .select(lit("except_all").as("leg"), col("k")))
      .unionByName(keys("F").intersectAll(keys("P"))
        .select(lit("intersect_all").as("leg"), col("k")))
  }

  /** Q24: the SQL PIVOT surface — the relational pivot spoken as the
    * SQL-standard subquery clause (`FROM (...) PIVOT (agg FOR col IN
    * (...))`), which Spark 4 and DuckDB both parse, next to q10's
    * Column-API pivot. Both engines run the IDENTICAL statement (the
    * q22/q23 convention). Naming discipline that makes the identical
    * text work: the grouping column must NOT collide case-insensitively
    * with a pivot value (DuckDB dedupes `P` to `P_1` next to a group
    * column `p`), the aggregate carries NO alias (Spark names value
    * columns bare `F`/`O`/`P`, DuckDB appends `_alias` when one is
    * given), and the outer SELECT re-aliases + COALESCEs every cell so
    * sparse fixtures can't diverge on NULL-vs-0 empty cells. */
  val q24Sql: String =
    """SELECT prio, coalesce(F, 0) AS n_f, coalesce(O, 0) AS n_o,
      |       coalesce(P, 0) AS n_p
      |FROM (SELECT o_orderstatus AS s, o_orderpriority AS prio FROM orders)
      |PIVOT (count(*) FOR s IN ('F', 'O', 'P'))""".stripMargin

  def q24SqlPivot(spark: SparkSession, dir: String): DataFrame = {
    t(spark, dir, "orders").createOrReplaceTempView("orders")
    spark.sql(q24Sql)
  }

  /** Q25: the ordered string-aggregation SQL surface — ANSI
    * `LISTAGG(x, sep) WITHIN GROUP (ORDER BY ...)` (Spark 4 speaks
    * it natively; x95 proves the same SEMANTIC via collect_list +
    * array_join, this proves the SQL spelling). The inner ORDER BY is
    * a total order (nation names are unique within a region), so the
    * concatenated string is deterministic and hash-gates; the oracle
    * spells the identical semantics in DuckDB's dialect
    * (`string_agg(x, sep ORDER BY ...)` — LISTAGG WITHIN GROUP is not
    * its grammar), the standard two-spellings convention. */
  def q25Listagg(spark: SparkSession, dir: String): DataFrame = {
    t(spark, dir, "region").createOrReplaceTempView("region")
    t(spark, dir, "nation").createOrReplaceTempView("nation")
    spark.sql(
      """SELECT r.r_name,
        |       listagg(n.n_name, ',') WITHIN GROUP (ORDER BY n.n_name)
        |         AS nations,
        |       CAST(count(*) AS BIGINT) AS n_nations
        |FROM region r JOIN nation n ON n.n_regionkey = r.r_regionkey
        |GROUP BY r.r_name""".stripMargin)
  }

  def q14SqlEntry(spark: SparkSession, dir: String): DataFrame = {
    t(spark, dir, "orders").createOrReplaceTempView("orders")
    t(spark, dir, "customer").createOrReplaceTempView("customer")
    spark.sql(q14Sql)
  }

  /** Q15: the registered-function SQL surface — the engine's native
    * Catalyst vector expressions (`vec_dot` et al.,
    * `GraftFunctions.register`) are callable from SQL TEXT, not just
    * the Column API: top-5 vectors by squared norm, fixed-pointed
    * through the shared floor(x·1000+0.5) idiom so the double tree
    * hash-compares (the x94 convention), (norm, vec_id) total order.
    * The float→double transform mirrors the x3 oracle's
    * list_transform so both engines dot the same doubles. */
  def q15SqlVector(spark: SparkSession, dir: String): DataFrame = {
    graft.functions.GraftFunctions.register(spark)
    t(spark, dir, "embeddings").createOrReplaceTempView("embeddings")
    spark.sql(
      """SELECT vec_id,
        |       CAST(floor(vec_dot(transform(embedding, x -> CAST(x AS DOUBLE)),
        |                          transform(embedding, x -> CAST(x AS DOUBLE)))
        |                  * 1000 + 0.5) AS BIGINT) AS norm2_x1000
        |FROM embeddings
        |ORDER BY norm2_x1000 DESC, vec_id
        |LIMIT 5""".stripMargin)
  }

  // ------------------------------------------------------------ set ops

  /** T2: append-as-union semantics (UNION ALL of two incremental batches). */
  def t2UnionAppend(spark: SparkSession, dir: String): DataFrame = {
    val o = t(spark, dir, "orders")
    val lo = Timestamp.valueOf("1996-01-01 00:00:00")
    val hi = Timestamp.valueOf("1997-01-01 00:00:00")
    val batch1 = o.filter(col("o_orderdate") < lit(lo))
    val batch2 = o.filter(col("o_orderdate") >= lit(lo) && col("o_orderdate") < lit(hi))
    batch1.unionByName(batch2)
      .agg(count(lit(1)).as("n_rows"),
        countDistinct(col("o_orderkey")).as("n_keys"))
  }

  // ----------------------------------------------------------- inventory

  val all: Map[String, (SparkSession, String) => DataFrame] = Map(
    "s1_odata_scan" -> (s1ODataScan _),
    "s3_odata_expand" -> (s3ODataExpand _),
    "s5_odata_topn" -> (s5ODataTopN _),
    "s7_odata_offset" -> (s7ODataOffset _),
    "s8_odata_nextlink" -> (s8ODataNextlink _),
    "s9_odata_strings" -> (s9ODataStrings _),
    "s10_odata_runtime_prune" -> (s10ODataRuntimePrune _),
    "s11_odata_static_prune" -> (s11ODataStaticPrune _),
    "s12_odata_ts_prune" -> (s12ODataTsPrune _),
    "s6_odata_agg" -> (s6ODataAgg _),
    "q16_sql_catalog" -> (q16SqlCatalog _),
    "q17_unpivot" -> (q17Unpivot _),
    "k5_promote_latest" -> (k5PromoteLatest _),
    "k14_jdbc_promote" -> (k14JdbcPromote _),
    "k16_jdbc_pushdown" -> (k16JdbcPushdown _),
    "k17_corrupt_ignore" -> (k17CorruptIgnore _),
    "k18_jdbc_partitioned" -> (k18JdbcPartitioned _),
    "k6_csv_roundtrip" -> (k6CsvRoundtrip _),
    "k12_csv_escaping" -> (k12CsvEscaping _),
    "k13_dynamic_overwrite" -> (k13DynamicOverwrite _),
    "k7_orc_roundtrip" -> (k7OrcRoundtrip _),
    "k15_zstd_roundtrip" -> (k15ZstdRoundtrip _),
    "k10_jsonl_roundtrip" -> (k10JsonlRoundtrip _),
    "k11_schema_evolution" -> (k11SchemaEvolution _),
    "k8_partition_prune" -> (k8PartitionPrune _),
    "k9_bucketed_join" -> (k9BucketedJoin _),
    "s2_filter_pushdown" -> (s2FilterPushdown _),
    "s4_limit_probe" -> (s4LimitProbe _),
    "p4_incremental_window" -> (p4IncrementalWindow _),
    "g1_explode_child" -> (g1ExplodeChild _),
    "p1_parent_projection" -> (p1ParentProjection _),
    "j1_typemap_join" -> (j1TypeMapJoin _),
    "q3_star_join" -> (q3StarJoin _),
    "q1_agg" -> (q1Agg _),
    "a2_latest_top1" -> (a2LatestTop1 _),
    "w1_window_rank" -> (w1WindowRank _),
    "q5_event_windows" -> (q5EventWindows _),
    "q6_rollup" -> (q6Rollup _),
    "q7_semi_anti" -> (q7SemiAnti _),
    "q8_except" -> (q8Except _),
    "q9_scalar_subquery" -> (q9ScalarSubquery _),
    "q10_pivot" -> (q10Pivot _),
    "q11_intersect" -> (q11Intersect _),
    "q12_cube" -> (q12Cube _),
    "q18_grouping_sets" -> (q18GroupingSets _),
    "q20_lateral" -> (q20Lateral _),
    "q21_recursive" -> (q21Recursive _),
    "q22_group_by_all" -> (q22GroupByAll _),
    "q23_set_ops" -> (q23SetOps _),
    "q24_sql_pivot" -> (q24SqlPivot _),
    "q25_listagg" -> (q25Listagg _),
    "q19_interval_frame" -> (q19IntervalFrame _),
    "q13_goals_vs_actuals" -> (q13GoalsVsActuals _),
    "q14_sql_entry" -> (q14SqlEntry _),
    "q15_sql_vector" -> (q15SqlVector _),
    "t2_union_append" -> (t2UnionAppend _)) ++ ExtQueries.all
}
