package graft.queries

/** DuckDB oracle SQL for every entry in [[Queries.all]] — same column
  * names, same value types (BIGINT counts, DECIMAL→DOUBLE money sums),
  * same deterministic ordering rules (SURVEY.md §5).
  */
object Oracles {

  val all: Map[String, String] = Map(
    // the page "server" holds exactly the o_orderkey % 100 = 0 slice
    // (ODataPages.Modulus); the connector's pushed filter keeps
    // o_custkey >= 50; the pushed limit never truncates by design
    "s1_odata_scan" ->
      """SELECT o_orderkey, o_custkey, o_orderstatus, o_orderpriority
        |FROM orders WHERE o_orderkey % 100 = 0 AND o_custkey >= 50""".stripMargin,

    // the $skip (OFFSET) leg: pages serve o_orderkey order, so the
    // pushed-offset slice is the deterministic ORDER BY ... OFFSET cut.
    "s7_odata_offset" ->
      """SELECT o_orderkey, o_custkey, o_orderstatus, o_orderpriority
        |FROM orders WHERE o_orderkey % 100 = 0
        |ORDER BY o_orderkey OFFSET 37""".stripMargin,

    // the @odata.nextLink continuation-token leg: the linked "server"
    // holds the o_orderkey % 97 = 0 slice (ODataPages.LinkedModulus)
    // behind a token chain; the unlinked decoy page's poisoned row
    // must NOT appear (a directory-listing reader would serve it).
    "s8_odata_nextlink" ->
      """SELECT o_orderkey, o_custkey, o_orderstatus, o_orderpriority
        |FROM orders WHERE o_orderkey % 97 = 0 AND o_custkey >= 25""".stripMargin,

    // the set-operation surface: INTERSECT (distinct) + the bag
    // variants (EXCEPT ALL / INTERSECT ALL) — identical statement.
    "q23_set_ops" ->
      """SELECT 'intersect' AS leg, k FROM (
        |  SELECT c_custkey AS k FROM customer WHERE c_acctbal > 5000.0
        |  INTERSECT SELECT o_custkey FROM orders)
        |UNION ALL
        |SELECT 'except_all' AS leg, k FROM (
        |  SELECT o_custkey AS k FROM orders WHERE o_orderstatus = 'F'
        |  EXCEPT ALL
        |  SELECT o_custkey FROM orders WHERE o_orderstatus = 'O')
        |UNION ALL
        |SELECT 'intersect_all' AS leg, k FROM (
        |  SELECT o_custkey AS k FROM orders WHERE o_orderstatus = 'F'
        |  INTERSECT ALL
        |  SELECT o_custkey FROM orders WHERE o_orderstatus = 'P')""".stripMargin,

    // the SQL PIVOT surface: the identical statement (Queries.q24Sql
    // — one source, so the two sides can never drift).
    "q24_sql_pivot" -> graft.queries.Queries.q24Sql,

    // the ordered string-agg surface: LISTAGG WITHIN GROUP on the
    // engine, DuckDB's string_agg(x, sep ORDER BY ...) dialect here —
    // same semantics, total inner order, deterministic string.
    "q25_listagg" ->
      """SELECT r.r_name,
        |       string_agg(n.n_name, ',' ORDER BY n.n_name) AS nations,
        |       CAST(count(*) AS BIGINT) AS n_nations
        |FROM region r JOIN nation n ON n.n_regionkey = r.r_regionkey
        |GROUP BY r.r_name""".stripMargin,

    // GROUP BY ALL + aggregate FILTER: the identical statement.
    "q22_group_by_all" ->
      """SELECT o_orderstatus, o_orderpriority,
        |       CAST(count(*) AS BIGINT) AS n_orders,
        |       CAST(count(*) FILTER (WHERE o_totalprice > 100000.0)
        |            AS BIGINT) AS n_big
        |FROM orders GROUP BY ALL""".stripMargin,

    // the RECURSIVE CTE surface: identical recursion, `//` for DIV.
    "q21_recursive" ->
      """WITH RECURSIVE chain AS (
        |  SELECT c_custkey AS node, CAST(0 AS BIGINT) AS depth
        |  FROM customer
        |  UNION ALL
        |  SELECT node // 10 AS node, depth + 1 AS depth
        |  FROM chain WHERE node > 0
        |)
        |SELECT depth, CAST(count(*) AS BIGINT) AS n_rows
        |FROM chain GROUP BY depth""".stripMargin,

    // the LATERAL surface: DuckDB runs the identical statement.
    "q20_lateral" ->
      """SELECT r.r_name, t.n_name, t.n_customers
        |FROM region r,
        |LATERAL (
        |  SELECT n.n_name, CAST(count(*) AS BIGINT) AS n_customers
        |  FROM nation n JOIN customer c ON c.c_nationkey = n.n_nationkey
        |  WHERE n.n_regionkey = r.r_regionkey
        |  GROUP BY n.n_name
        |  ORDER BY n_customers DESC, n.n_name
        |  LIMIT 2) t""".stripMargin,

    // the string-predicate rung: startswith/endswith/contains + the
    // OData 4.01 `in` operator, spelled as LIKE/IN on the same slice.
    "s9_odata_strings" ->
      """SELECT o_orderkey, o_custkey, o_orderstatus, o_orderpriority
        |FROM orders WHERE o_orderkey % 100 = 0
        |  AND o_orderpriority LIKE '1%' AND o_orderpriority LIKE '%GENT'
        |  AND o_orderpriority LIKE '%-URG%'
        |  AND o_orderstatus IN ('F', 'P')""".stripMargin,

    // the runtime-filtering leg: a selective low-key dim joined to the
    // paged slice — pruning is a pure optimization, so the join result
    // must equal the plain relational join over the same parquet rows
    "s10_odata_runtime_prune" ->
      """SELECT f.o_orderkey, f.o_custkey, f.o_orderstatus,
        |       f.o_orderpriority, d.d_cents
        |FROM (SELECT o_orderkey, o_custkey, o_orderstatus, o_orderpriority
        |      FROM orders WHERE o_orderkey % 100 = 0) f
        |JOIN (SELECT o_orderkey AS d_key,
        |             CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS d_cents
        |      FROM orders
        |      WHERE o_orderkey % 2000 = 0 AND o_orderkey <= 6000) d
        |  ON f.o_orderkey = d.d_key""".stripMargin,

    // the static plan-time pruning leg: a pushed key band served from
    // the pages whose ranges can contain it — pruning must never
    // change rows, so the result equals the plain filtered projection
    "s11_odata_static_prune" ->
      """SELECT o_orderkey, o_custkey, o_orderstatus, o_orderpriority
        |FROM orders WHERE o_orderkey % 100 = 0
        |  AND o_orderkey >= 400 AND o_orderkey <= 1200""".stripMargin,

    // the TIMESTAMP watermark pruning leg: pruning must never change
    // rows, so the result equals the plain filtered projection of the
    // events slice the page server renders
    "s12_odata_ts_prune" ->
      """SELECT event_id, CAST(ts AS TIMESTAMP) AS ts, user_id, event_type
        |FROM events WHERE event_id % 40 = 0
        |  AND ts >= TIMESTAMP '2024-01-25 00:00:00'""".stripMargin,

    // the $orderby+$top leg over the same page "server": the total
    // order (custkey DESC, orderkey) makes the selected 20 rows exact.
    "s5_odata_topn" ->
      """SELECT o_orderkey, o_custkey, o_orderstatus, o_orderpriority
        |FROM orders WHERE o_orderkey % 100 = 0
        |ORDER BY o_custkey DESC, o_orderkey LIMIT 20""".stripMargin,

    // the SQL-catalog leg: the expand "server" serves only orders
    // WITH lineitems (first-row schema anchoring), so the oracle is
    // the grouped inner join; size() of the subform = item count.
    "q16_sql_catalog" ->
      """SELECT o.o_orderkey, o.o_orderstatus,
        |       CAST(count(*) AS INT) AS n_items
        |FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
        |WHERE o.o_orderkey % 100 = 0 AND o.o_orderkey >= 1000
        |GROUP BY 1, 2""".stripMargin,

    // the $apply GROUP BY leg over the same slice + pushed filter:
    // count/min/max exact, the sum over a LONG column only.
    "s6_odata_agg" ->
      """SELECT o_orderstatus, CAST(count(*) AS BIGINT) AS n_orders,
        |       CAST(sum(o_custkey) AS BIGINT) AS sum_custkey,
        |       min(o_orderkey) AS min_orderkey,
        |       max(o_orderkey) AS max_orderkey
        |FROM orders WHERE o_orderkey % 100 = 0 AND o_custkey >= 50
        |GROUP BY 1""".stripMargin,

    // the expand "server" serves the o_orderkey % 100 = 0 orders WITH
    // their lineitems inline; the gate explodes the subform, so the
    // oracle is the inner join over the same slice — l_linenumber
    // widened to BIGINT to match the pages' long element schema
    "s3_odata_expand" ->
      """SELECT o.o_orderkey, CAST(l.l_linenumber AS BIGINT) AS l_linenumber,
        |       l.l_partkey, l.l_suppkey, l.l_returnflag
        |FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
        |WHERE o.o_orderkey % 100 = 0""".stripMargin,

    // K2 CSV round trip: the dump-and-read-back must be value-equal
    // to reading the source table directly — the CSV leg is pure
    // transport, so the oracle IS the plain projection.
    "k6_csv_roundtrip" ->
      """SELECT c_custkey, c_name, c_nationkey, c_acctbal, c_mktsegment
        |FROM customer""".stripMargin,

    // K-series CSV escaping leg: the oracle states the planted
    // CONTENT; the hostile quoting/newline transport is Spark-side.
    "k12_csv_escaping" ->
      """SELECT c_custkey,
        |       CASE WHEN c_custkey % 7 = 0
        |            THEN c_name || '",' || chr(10) || '"x'
        |            ELSE c_name END AS c_name,
        |       c_acctbal
        |FROM customer""".stripMargin,

    // K-series dynamic partition overwrite: only the rewritten
    // partition's rows change; the oracle states the expected content.
    "k13_dynamic_overwrite" ->
      """SELECT o_orderkey, o_orderstatus,
        |       CASE WHEN o_orderstatus = 'F' THEN o_totalprice + 1.0
        |            ELSE o_totalprice END AS o_totalprice
        |FROM orders""".stripMargin,

    // K-series ORC leg: pure transport, oracle IS the plain projection
    // of the parquet source (same convention as k6).
    "k7_orc_roundtrip" ->
      """SELECT c_custkey, c_name, c_nationkey, c_acctbal, c_mktsegment
        |FROM customer""".stripMargin,

    // K17 corrupt-file tolerance: the good files' rows are the whole
    // table; the corrupt plant and the strict-fail assert live on
    // the Spark side.
    "k17_corrupt_ignore" ->
      """SELECT c_custkey, c_name, c_nationkey, c_acctbal, c_mktsegment
        |FROM customer""".stripMargin,

    // K16 JDBC pushdown: the Derby round trip under pushed numeric
    // predicates; the pushdown proof is the plan require on the
    // Spark side, the values hash here.
    "k16_jdbc_pushdown" ->
      """SELECT c_custkey, c_name, c_acctbal, c_mktsegment
        |FROM customer
        |WHERE c_acctbal > 1000.0 AND c_custkey <= 700""".stripMargin,

    // K18 parallel partitioned JDBC read: the stride is an access
    // plan, not a filter — the hash proves the 4 range slices serve
    // EXACTLY the full table.
    "k18_jdbc_partitioned" ->
      """SELECT c_custkey, c_name, c_acctbal, c_mktsegment
        |FROM customer""".stripMargin,

    // K-series ZSTD codec leg: same value contract as k7; the codec
    // proof is the part-file suffix assert on the Spark side.
    "k15_zstd_roundtrip" ->
      """SELECT c_custkey, c_name, c_nationkey, c_acctbal, c_mktsegment
        |FROM customer""".stripMargin,

    // K-series JSONL leg: same transport convention (k6/k7).
    "k10_jsonl_roundtrip" ->
      """SELECT c_custkey, c_name, c_nationkey, c_acctbal, c_mktsegment
        |FROM customer""".stripMargin,

    // Schema-evolution leg: the declarative restatement of the grown
    // layout — v1 rows carry a typed NULL for the column they predate.
    "k11_schema_evolution" ->
      """SELECT 1 AS version, c_custkey, c_mktsegment,
        |       CAST(NULL AS BIGINT) AS acctbal_cents
        |FROM customer
        |UNION ALL
        |SELECT 2, c_custkey, c_mktsegment,
        |       CAST(floor(c_acctbal * 100 + 0.5) AS BIGINT)
        |FROM customer""".stripMargin,

    // partition-layout leg: the hive-partitioned write+pruned read must
    // equal the plain filtered projection (pruning itself is
    // plan-pinned in PlatformSpec, not hash-visible).
    "k8_partition_prune" ->
      """SELECT o_orderkey, o_custkey, o_totalprice, o_orderdate,
        |       o_orderpriority, o_orderstatus
        |FROM orders WHERE o_orderstatus = 'F'""".stripMargin,

    // bucketed-layout leg: the zero-shuffle co-located join must equal
    // the plain join; money exact via the shared cents idiom.
    "k9_bucketed_join" ->
      """SELECT c_mktsegment, CAST(count(*) AS BIGINT) AS n_orders,
        |       CAST(sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT))
        |            AS BIGINT) AS total_cents
        |FROM orders JOIN customer ON o_custkey = c_custkey
        |GROUP BY c_mktsegment""".stripMargin,

    // replays k5PromoteLatest's append history (e1 full, e2 updated %7
    // keys, e3 same-timestamp re-run over %14 keys) and keeps the
    // latest extraction per PK — timestamp first, extractionid as the
    // tiebreak, exactly EntityWriter.latestPerPk's window
    "k5_promote_latest" ->
      """WITH h AS (
        |  SELECT o_orderkey, o_custkey, o_totalprice,
        |         'e1' AS extractionid,
        |         TIMESTAMP '2026-01-01 00:00:00' AS extractiontimestamputc
        |  FROM orders
        |  UNION ALL
        |  SELECT o_orderkey, o_custkey, o_totalprice + 1000.0, 'e2',
        |         TIMESTAMP '2026-02-01 00:00:00'
        |  FROM orders WHERE o_orderkey % 7 = 0
        |  UNION ALL
        |  SELECT o_orderkey, o_custkey, o_totalprice + 2000.0, 'e3',
        |         TIMESTAMP '2026-02-01 00:00:00'
        |  FROM orders WHERE o_orderkey % 14 = 0)
        |SELECT o_orderkey, o_custkey, o_totalprice, extractionid,
        |       extractiontimestamputc
        |FROM (SELECT *, row_number() OVER (PARTITION BY o_orderkey
        |        ORDER BY extractiontimestamputc DESC, extractionid DESC) AS rn
        |      FROM h)
        |WHERE rn = 1""".stripMargin,

    // k5's history replay on the JDBC (Derby) backend — identical
    // window, plus the PK→VARCHAR staging rule made hash-visible:
    // the key is CAST to a string on both sides.
    "k14_jdbc_promote" ->
      """WITH h AS (
        |  SELECT CAST(o_orderkey AS VARCHAR) AS o_orderkey, o_custkey,
        |         o_totalprice, 'e1' AS extractionid,
        |         TIMESTAMP '2026-01-01 00:00:00' AS extractiontimestamputc
        |  FROM orders
        |  UNION ALL
        |  SELECT CAST(o_orderkey AS VARCHAR), o_custkey,
        |         o_totalprice + 1000.0, 'e2',
        |         TIMESTAMP '2026-02-01 00:00:00'
        |  FROM orders WHERE o_orderkey % 7 = 0
        |  UNION ALL
        |  SELECT CAST(o_orderkey AS VARCHAR), o_custkey,
        |         o_totalprice + 2000.0, 'e3',
        |         TIMESTAMP '2026-02-01 00:00:00'
        |  FROM orders WHERE o_orderkey % 14 = 0)
        |SELECT o_orderkey, o_custkey, o_totalprice, extractionid,
        |       extractiontimestamputc
        |FROM (SELECT *, row_number() OVER (PARTITION BY o_orderkey
        |        ORDER BY extractiontimestamputc DESC, extractionid DESC) AS rn
        |      FROM h)
        |WHERE rn = 1""".stripMargin,

    "s2_filter_pushdown" ->
      """SELECT o_orderkey, o_custkey, o_orderdate, o_totalprice
        |FROM orders WHERE o_orderdate >= TIMESTAMP '1997-06-01 00:00:00'""".stripMargin,

    "s4_limit_probe" ->
      """SELECT CAST(count(*) AS BIGINT) AS n_rows
        |FROM (SELECT * FROM lineitem LIMIT 500)""".stripMargin,

    "p4_incremental_window" ->
      """SELECT event_id, CAST(ts AS TIMESTAMP) AS ts, user_id, event_type, value
        |FROM events WHERE ts >= TIMESTAMP '2024-01-10 00:00:00'""".stripMargin,

    "g1_explode_child" ->
      """SELECT CAST(o.o_orderkey AS VARCHAR) AS o_orderkey,
        |       l.l_linenumber, l.l_orderkey, l.l_partkey, l.l_suppkey,
        |       l.l_quantity, l.l_extendedprice, l.l_discount, l.l_tax,
        |       l.l_returnflag, l.l_linestatus, l.l_shipdate
        |FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey""".stripMargin,

    "p1_parent_projection" ->
      """SELECT CAST(o_orderkey AS VARCHAR) AS o_orderkey, o_custkey,
        |       o_orderstatus, o_totalprice, o_orderdate, o_orderpriority
        |FROM orders""".stripMargin,

    "j1_typemap_join" ->
      """WITH fields(field_name, source_type) AS (VALUES
        |    ('l_orderkey', 'Edm.Int64'), ('l_quantity', 'Edm.Decimal'),
        |    ('l_returnflag', 'Edm.String'), ('l_shipdate', 'Edm.DateTimeOffset'),
        |    ('l_comment', 'Edm.Guid')),
        |  mapping(source_type, target_type) AS (VALUES
        |    ('Edm.String', 'VARCHAR'), ('Edm.Decimal', 'NUMERIC'),
        |    ('Edm.DateTimeOffset', 'TIMESTAMP'), ('Edm.Int64', 'BIGINT'))
        |SELECT field_name, source_type, target_type
        |FROM fields LEFT JOIN mapping USING (source_type)""".stripMargin,

    "q3_star_join" ->
      """SELECT r_name, n_name,
        |       CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue,
        |       CAST(count(*) AS BIGINT) AS n_orders
        |FROM orders
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation ON c_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |GROUP BY r_name, n_name""".stripMargin,

    "q1_agg" ->
      """SELECT l_returnflag, l_linestatus,
        |       sum(l_quantity) AS sum_qty,
        |       CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
        |       CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) *
        |                (1 - CAST(l_discount AS DECIMAL(4,2)))) AS DOUBLE) AS sum_disc_price,
        |       CAST(count(*) AS BIGINT) AS count_order
        |FROM lineitem
        |WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
        |GROUP BY l_returnflag, l_linestatus""".stripMargin,

    "a2_latest_top1" ->
      """SELECT o_orderkey, o_custkey, o_orderdate, o_totalprice
        |FROM orders ORDER BY o_orderdate DESC, o_orderkey DESC LIMIT 1""".stripMargin,

    "w1_window_rank" ->
      """SELECT o_custkey, o_orderkey, o_totalprice, rn FROM (
        |  SELECT o_custkey, o_orderkey, o_totalprice,
        |         CAST(row_number() OVER (PARTITION BY o_custkey
        |              ORDER BY o_totalprice DESC, o_orderkey) AS INT) AS rn
        |  FROM orders) WHERE rn <= 3""".stripMargin,

    "q5_event_windows" ->
      """SELECT date_trunc('day', CAST(ts AS TIMESTAMP)) AS window_start, event_type,
        |       CAST(count(*) AS BIGINT) AS n_events,
        |       CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS total_value
        |FROM events GROUP BY 1, 2""".stripMargin,

    // goal dim inlined as VALUES — same literals as the Spark-side
    // broadcast dimension in Queries.q13GoalsVsActuals
    "q13_goals_vs_actuals" ->
      """WITH actuals AS (
        |  SELECT date_trunc('day', CAST(ts AS TIMESTAMP)) AS window_start,
        |         event_type, CAST(count(*) AS BIGINT) AS n_events
        |  FROM events GROUP BY 1, 2),
        |goals(event_type, goal_period, goal) AS (
        |  VALUES ('view','day',40), ('click','day',20), ('purchase','day',10),
        |         ('signup','day',5), ('error','day',3))
        |SELECT window_start, event_type, goal_period,
        |       CAST(goal AS BIGINT) AS goal, n_events,
        |       CAST(n_events AS DOUBLE) / goal AS attainment,
        |       n_events >= goal AS met
        |FROM actuals JOIN goals USING (event_type)""".stripMargin,

    "q6_rollup" ->
      """SELECT r_name, n_name,
        |       CAST(count(*) AS BIGINT) AS n_customers,
        |       CAST(sum(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS total_balance
        |FROM customer
        |JOIN nation ON c_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |GROUP BY ROLLUP (r_name, n_name)""".stripMargin,

    "q7_semi_anti" ->
      """WITH active AS (
        |  SELECT c_mktsegment, CAST(count(*) AS BIGINT) AS n_active
        |  FROM customer c WHERE EXISTS
        |    (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
        |  GROUP BY c_mktsegment),
        |inactive AS (
        |  SELECT c_mktsegment, CAST(count(*) AS BIGINT) AS n_inactive
        |  FROM customer c WHERE NOT EXISTS
        |    (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
        |  GROUP BY c_mktsegment)
        |SELECT c_mktsegment,
        |       COALESCE(n_active, 0) AS n_active,
        |       COALESCE(n_inactive, 0) AS n_inactive
        |FROM active FULL OUTER JOIN inactive USING (c_mktsegment)""".stripMargin,

    "q8_except" ->
      """SELECT CAST(count(*) AS BIGINT) AS n_churned FROM (
        |  SELECT o_custkey FROM orders
        |  WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
        |    AND o_orderdate <  TIMESTAMP '1997-01-01 00:00:00'
        |  EXCEPT
        |  SELECT o_custkey FROM orders
        |  WHERE o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
        |    AND o_orderdate <  TIMESTAMP '1998-01-01 00:00:00')""".stripMargin,

    "q9_scalar_subquery" ->
      """WITH na AS (
        |  SELECT c_nationkey AS nk,
        |         CAST(sum(CAST(c_acctbal AS DECIMAL(18,2))) / count(*) AS DOUBLE) AS nat_avg
        |  FROM customer GROUP BY c_nationkey)
        |SELECT c_nationkey, CAST(count(*) AS BIGINT) AS n_above_avg
        |FROM customer JOIN na ON c_nationkey = nk
        |WHERE CAST(c_acctbal AS DOUBLE) > nat_avg
        |GROUP BY c_nationkey""".stripMargin,

    "q10_pivot" ->
      """SELECT r_name,
        |       CAST(count(*) FILTER (o_orderstatus = 'O') AS BIGINT) AS n_open,
        |       CAST(count(*) FILTER (o_orderstatus = 'F') AS BIGINT) AS n_filled,
        |       CAST(count(*) FILTER (o_orderstatus = 'P') AS BIGINT) AS n_partial
        |FROM orders
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation ON c_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |GROUP BY r_name""".stripMargin,

    // Unpivot: the q10 wide aggregate's columns unioned back to long
    // form — the same full region x status grid incl. zero cells.
    "q17_unpivot" ->
      """WITH w AS (
        |  SELECT r_name,
        |         CAST(count(*) FILTER (o_orderstatus = 'O') AS BIGINT) AS n_open,
        |         CAST(count(*) FILTER (o_orderstatus = 'F') AS BIGINT) AS n_filled,
        |         CAST(count(*) FILTER (o_orderstatus = 'P') AS BIGINT) AS n_partial
        |  FROM orders
        |  JOIN customer ON o_custkey = c_custkey
        |  JOIN nation ON c_nationkey = n_nationkey
        |  JOIN region ON n_regionkey = r_regionkey
        |  GROUP BY r_name)
        |SELECT r_name, 'O' AS o_orderstatus, n_open AS n_orders FROM w
        |UNION ALL SELECT r_name, 'F', n_filled FROM w
        |UNION ALL SELECT r_name, 'P', n_partial FROM w""".stripMargin,

    "q11_intersect" ->
      """SELECT CAST(count(*) AS BIGINT) AS n_retained FROM (
        |  SELECT o_custkey FROM orders
        |  WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
        |    AND o_orderdate <  TIMESTAMP '1997-01-01 00:00:00'
        |  INTERSECT
        |  SELECT o_custkey FROM orders
        |  WHERE o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
        |    AND o_orderdate <  TIMESTAMP '1998-01-01 00:00:00')""".stripMargin,

    "q12_cube" ->
      """SELECT o_orderstatus, o_orderpriority,
        |       CAST(count(*) AS BIGINT) AS n_orders
        |FROM orders GROUP BY CUBE (o_orderstatus, o_orderpriority)""".stripMargin,

    // Q19: timestamp RANGE frame with an INTERVAL bound — frame by
    // value, so same-timestamp peers need no tiebreak.
    "q19_interval_frame" ->
      """SELECT o_orderkey,
        |       CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS cents,
        |       CAST(sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT))
        |            OVER (PARTITION BY o_custkey
        |                  ORDER BY CAST(o_orderdate AS TIMESTAMP)
        |                  RANGE BETWEEN INTERVAL 7 DAY PRECEDING
        |                  AND CURRENT ROW) AS BIGINT) AS trail7_cents
        |FROM orders""".stripMargin,

    // Q18: mixed grouping sets; the packed grouping id is spelled
    // explicitly (native grouping_id bit order is an engine
    // convention).
    "q18_grouping_sets" ->
      """SELECT o_orderstatus, o_orderpriority,
        |       CAST(count(*) AS BIGINT) AS n_orders,
        |       CAST(sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT))
        |            AS BIGINT) AS cents,
        |       CAST(GROUPING(o_orderstatus) * 2
        |            + GROUPING(o_orderpriority) AS BIGINT) AS gid
        |FROM orders
        |GROUP BY GROUPING SETS ((o_orderstatus, o_orderpriority),
        |                        (o_orderstatus), (o_orderpriority))""".stripMargin,

    // Q14: the SAME SQL text the Spark side executes — shared constant,
    // drift impossible by construction.
    "q14_sql_entry" -> Queries.q14Sql,

    // Q15: the registered-function surface; DuckDB's list_dot_product
    // over the same double-transformed list (the x3 pairing).
    "q15_sql_vector" ->
      """SELECT vec_id,
        |       CAST(floor(list_dot_product(v, v) * 1000 + 0.5) AS BIGINT) AS norm2_x1000
        |FROM (SELECT vec_id, list_transform(embedding, x -> x::DOUBLE) AS v
        |      FROM embeddings)
        |ORDER BY norm2_x1000 DESC, vec_id
        |LIMIT 5""".stripMargin,

    "t2_union_append" ->
      """SELECT CAST(count(*) AS BIGINT) AS n_rows,
        |       CAST(count(DISTINCT o_orderkey) AS BIGINT) AS n_keys
        |FROM (
        |  SELECT * FROM orders WHERE o_orderdate < TIMESTAMP '1996-01-01 00:00:00'
        |  UNION ALL
        |  SELECT * FROM orders WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
        |                         AND o_orderdate < TIMESTAMP '1997-01-01 00:00:00')""".stripMargin) ++
    ExtOracles.all
}
