package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables
import graft.ops.{Sessions, TemporalJoins}

/** SURVEY §2.2–§2.7 relational operator inventory (P/J/A/W/O rows),
  * re-expressed over the driver's synthetic tables by role analogy:
  * customer↔playlists (parent with possibly-empty membership),
  * orders↔videos, lineitem↔playlist_videos memberships,
  * part↔videos catalog, documents↔transcripts, events↔playlist_pings.
  *
  * All plans are declarative DataFrame API — Catalyst owns pushdown,
  * pruning, join selection; no RDDs, no collects, no UDFs.
  *
  * Determinism rules (driver hash-compares vs DuckDB):
  *  - every output is totally ordered (unique trailing sort key);
  *  - no floating-point SUM/AVG across rows — money-like aggregates go
  *    through decimal(18,2) (exact, associative) and only then back to
  *    double, so Spark's nondeterministic partial-agg order can't
  *    change the result;
  *  - timestamps are emitted as formatted strings (Spark writes
  *    UTC-adjusted micros, DuckDB reads naive ns — raw values would
  *    compare tz-aware vs naive).
  */
object RelationalQueries {

  // ---------------------------------------------------------------- P

  /** P1 (display.py:56-60): projection narrow enough that the parquet
    * scan reads only 3 of 16 columns (ReadSchema), with the key range
    * pushed to the scan (PushedFilters). */
  private val p1 = QueryDef(
    "p1_projection_pushdown",
    "column projection + pushed range predicate",
    (s, dir) => Tables.lineitem(s, dir)
      .filter(col("l_orderkey") < 100)
      .select("l_orderkey", "l_linenumber", "l_quantity")
      .orderBy("l_orderkey", "l_linenumber"),
    Some("""SELECT l_orderkey, l_linenumber, l_quantity FROM lineitem
            WHERE l_orderkey < 100 ORDER BY l_orderkey, l_linenumber"""))

  /** P2 (display.py:59,101): equality predicate on a key column —
    * the point-lookup shape; pushed to the scan. */
  private val p2 = QueryDef(
    "p2_key_equality",
    "equality predicate on key (point lookup shape)",
    (s, dir) => Tables.orders(s, dir)
      .filter(col("o_custkey") === 42)
      .select("o_orderkey", "o_orderstatus", "o_totalprice")
      .orderBy("o_orderkey"),
    Some("""SELECT o_orderkey, o_orderstatus, o_totalprice FROM orders
            WHERE o_custkey = 42 ORDER BY o_orderkey"""))

  /** P3+P8 (display.py:553, display.py:418): SQLite LIKE is
    * ASCII-case-insensitive, so the engine form is
    * lower(col).contains(lower(q)) — NOT plain contains. */
  private val p3 = QueryDef(
    "p3_ci_substring_title",
    "case-insensitive substring search on a name column",
    (s, dir) => Tables.part(s, dir)
      .filter(lower(col("p_name")).contains("red"))
      .select("p_partkey", "p_name", "p_brand")
      .orderBy("p_partkey"),
    Some("""SELECT p_partkey, p_name, p_brand FROM part
            WHERE lower(p_name) LIKE '%red%' ORDER BY p_partkey"""))

  /** P4 (display.py:590): same over long free-text (transcript analog).
    * At 100 TB this is the scan-heavy query: substring match stays in
    * whole-stage codegen; only 3 columns are read. */
  private val p4 = QueryDef(
    "p4_ci_substring_text",
    "case-insensitive substring search over long text",
    (s, dir) => Tables.documents(s, dir)
      .filter(lower(col("text")).contains("vector merge"))
      .select("doc_id", "lang", "n_chars")
      .orderBy("doc_id"),
    Some("""SELECT doc_id, lang, n_chars FROM documents
            WHERE lower(text) LIKE '%vector merge%' ORDER BY doc_id"""))

  /** P5 (display.py:175,182): IS NOT NULL predicates. The synthetic
    * tables are null-free, so nulls are manufactured identically on
    * both sides with nullif — the filter semantics are what's tested. */
  private val p5 = QueryDef(
    "p5_null_filter",
    "IS NOT NULL predicate (nulls manufactured via nullif)",
    (s, dir) => Tables.orders(s, dir)
      .withColumn("status_n", nullif(col("o_orderstatus"), lit("O")))
      .filter(col("status_n").isNotNull)
      .groupBy("status_n").agg(count(lit(1)).as("n"))
      .orderBy("status_n"),
    Some("""SELECT nullif(o_orderstatus, 'O') AS status_n, count(*) AS n
            FROM orders WHERE nullif(o_orderstatus, 'O') IS NOT NULL
            GROUP BY 1 ORDER BY status_n"""))

  /** P6 (gui_app.py:62): non-empty-text predicate inside a join
    * condition (transcript != '' analog). */
  private val p6 = QueryDef(
    "p6_nonempty_join_cond",
    "join with extra non-empty-text condition",
    (s, dir) => {
      val d = Tables.documents(s, dir)
      val e = Tables.embeddings(s, dir)
      d.join(e, d("doc_id") === e("vec_id")
          && d("text").isNotNull && d("text") =!= "" && d("n_chars") > 200)
        .groupBy(e("label")).agg(count(lit(1)).as("n"))
        .orderBy("label")
    },
    Some("""SELECT label, count(*) AS n
            FROM documents d JOIN embeddings e
              ON d.doc_id = e.vec_id AND d.text IS NOT NULL
              AND d.text != '' AND d.n_chars > 200
            GROUP BY label ORDER BY label"""))

  /** P7 (display.py:254): existence probe → left-semi join (EXISTS),
    * never a collect-and-check loop. */
  private val p7 = QueryDef(
    "p7_exists_probe",
    "EXISTS probe as left-semi join",
    (s, dir) => {
      val p = Tables.part(s, dir)
      val l = Tables.lineitem(s, dir)
        .filter(col("l_quantity") > 45).select("l_partkey")
      p.join(l, p("p_partkey") === l("l_partkey"), "left_semi")
        .select("p_partkey", "p_name")
        .orderBy("p_partkey")
    },
    Some("""SELECT p_partkey, p_name FROM part
            WHERE EXISTS (SELECT 1 FROM lineitem
                          WHERE l_partkey = p_partkey AND l_quantity > 45)
            ORDER BY p_partkey"""))

  /** P9 (display.py:38-44): table-existence guard via the catalog
    * (sqlite_master probe analog). The Spark side genuinely registers
    * temp views and asks spark.catalog; output is (table, present). */
  private val p9 = QueryDef(
    "p9_catalog_guard",
    "catalog table-existence probe",
    (s, dir) => {
      import s.implicits._
      Tables.all.foreach { t =>
        Tables.load(s, dir, t).createOrReplaceTempView(s"graft_$t")
      }
      val probed = (Tables.all :+ "no_such_table")
        .map(t => (t, s.catalog.tableExists(s"graft_$t")))
      probed.toDF("table_name", "present")
        .filter(col("present"))
        .orderBy("table_name")
    },
    Some("""SELECT * FROM (VALUES
              ('customer', true), ('documents', true), ('embeddings', true),
              ('events', true), ('lineitem', true), ('nation', true),
              ('orders', true), ('part', true), ('region', true),
              ('supplier', true)) AS t(table_name, present)
            ORDER BY table_name"""))

  // ---------------------------------------------------------------- J
  // j1 lives below with the aggregates it demonstrates.

  /** J1 (display.py:74-83): parent ⟕ membership + grouped COUNT(col)
    * keeping empty parents; COUNT(o_orderkey) skips the nulls the LEFT
    * JOIN produces, exactly like COUNT(pv.video_id). Scale: single
    * shuffle on the join key; count partially aggregated map-side. */
  private val j1 = QueryDef(
    "j1_parent_child_counts",
    "LEFT JOIN + grouped count keeping empty parents (playlist summary)",
    (s, dir) => {
      val c = Tables.customer(s, dir).select("c_custkey")
      val o = Tables.orders(s, dir)
        .filter(col("o_totalprice") > 400000.0)
        .select("o_custkey", "o_orderkey")
      c.join(o, c("c_custkey") === o("o_custkey"), "left")
        .groupBy(c("c_custkey"))
        .agg(count(o("o_orderkey")).as("order_count"))
        .orderBy(desc("order_count"), asc("c_custkey"))
    },
    Some("""SELECT c_custkey, count(o_orderkey) AS order_count
            FROM customer LEFT JOIN
              (SELECT * FROM orders WHERE o_totalprice > 400000) o
              ON o_custkey = c_custkey
            GROUP BY c_custkey
            ORDER BY order_count DESC, c_custkey"""))

  /** J2 (display.py:98-99): inner equi-join materializing membership
    * rows; date range is pushed to the orders scan, and only then the
    * (smaller) filtered side joins lineitem. */
  private val j2 = QueryDef(
    "j2_inner_equijoin",
    "inner equi-join (playlist contents shape)",
    (s, dir) => {
      val o = Tables.orders(s, dir)
        .filter(col("o_orderdate").between("1996-01-01", "1996-01-07"))
        .select("o_orderkey", "o_orderdate")
      val l = Tables.lineitem(s, dir)
        .select("l_orderkey", "l_linenumber", "l_extendedprice")
      o.join(l, o("o_orderkey") === l("l_orderkey"))
        .select(o("o_orderkey"), l("l_linenumber"), l("l_extendedprice"))
        .orderBy("o_orderkey", "l_linenumber")
    },
    Some("""SELECT o_orderkey, l_linenumber, l_extendedprice
            FROM orders JOIN lineitem ON o_orderkey = l_orderkey
            WHERE o_orderdate BETWEEN '1996-01-01' AND '1996-01-07'
            ORDER BY o_orderkey, l_linenumber"""))

  /** J3 (display.py:97-100): LEFT JOIN as existence flag — the
    * has_transcript CASE. Built as a left join against the distinct
    * flagged keys so the flag join stays 1:1. */
  private val j3 = QueryDef(
    "j3_left_join_flag",
    "LEFT JOIN existence flag (has_transcript shape)",
    (s, dir) => {
      val o = Tables.orders(s, dir).select("o_orderkey", "o_orderstatus")
      val bulk = Tables.lineitem(s, dir)
        .filter(col("l_quantity") >= 49)
        .select(col("l_orderkey")).distinct()
      o.join(bulk, o("o_orderkey") === bulk("l_orderkey"), "left")
        .select(o("o_orderkey"), o("o_orderstatus"),
          when(bulk("l_orderkey").isNotNull, 1).otherwise(0).as("has_bulk"))
        .orderBy("o_orderkey")
    },
    Some("""SELECT o_orderkey, o_orderstatus,
              CASE WHEN b.l_orderkey IS NOT NULL THEN 1 ELSE 0 END AS has_bulk
            FROM orders LEFT JOIN
              (SELECT DISTINCT l_orderkey FROM lineitem WHERE l_quantity >= 49) b
              ON orders.o_orderkey = b.l_orderkey
            ORDER BY o_orderkey"""))

  /** J4 (display.py:547-557): 3-way join chained on equi-keys with a
    * case-insensitive search predicate on the dimension side. part is
    * filtered before joining, so the big fact join probes a small
    * build side (broadcast at any scale since the filter is selective). */
  private val j4 = QueryDef(
    "j4_three_way_search",
    "three-way join + ci-search (title search across playlists)",
    (s, dir) => {
      val p = Tables.part(s, dir)
        .filter(lower(col("p_name")).contains("blue"))
        .select("p_partkey", "p_name")
      val l = Tables.lineitem(s, dir)
        .select("l_partkey", "l_orderkey", "l_linenumber")
      val o = Tables.orders(s, dir).select("o_orderkey", "o_orderstatus")
      p.join(l, p("p_partkey") === l("l_partkey"))
        .join(o, l("l_orderkey") === o("o_orderkey"))
        .select(p("p_partkey"), o("o_orderkey"), l("l_linenumber"),
          o("o_orderstatus"))
        .orderBy("p_partkey", "o_orderkey", "l_linenumber")
    },
    Some("""SELECT p_partkey, o_orderkey, l_linenumber, o_orderstatus
            FROM part
            JOIN lineitem ON p_partkey = l_partkey
            JOIN orders ON l_orderkey = o_orderkey
            WHERE lower(p_name) LIKE '%blue%'
            ORDER BY p_partkey, o_orderkey, l_linenumber"""))

  /** J5 (display.py:585-593): text search joined to metadata
    * (transcript search with video titles). */
  private val j5 = QueryDef(
    "j5_text_search_join",
    "text search inner-joined to metadata",
    (s, dir) => {
      val d = Tables.documents(s, dir)
        .filter(lower(col("text")).contains("merge batch"))
        .select("doc_id", "source", "n_chars")
      val e = Tables.embeddings(s, dir).select("vec_id", "label")
      d.join(e, d("doc_id") === e("vec_id"))
        .select(d("doc_id"), d("source"), d("n_chars"), e("label"))
        .orderBy("doc_id")
    },
    Some("""SELECT doc_id, source, n_chars, label
            FROM documents JOIN embeddings ON doc_id = vec_id
            WHERE lower(text) LIKE '%merge batch%'
            ORDER BY doc_id"""))

  /** J6 (display.py:114-121): reverse membership — which parents
    * contain this child ("which playlists contain this video"). */
  private val j6 = QueryDef(
    "j6_membership_by_child",
    "reverse membership lookup by child key",
    (s, dir) => {
      val l = Tables.lineitem(s, dir)
        .filter(col("l_partkey") === 7)
        .select("l_orderkey", "l_linenumber")
      val o = Tables.orders(s, dir).select("o_orderkey", "o_orderstatus")
      l.join(o, l("l_orderkey") === o("o_orderkey"))
        .select(o("o_orderkey"), o("o_orderstatus"), l("l_linenumber"))
        .orderBy("o_orderkey", "l_linenumber")
    },
    Some("""SELECT o_orderkey, o_orderstatus, l_linenumber
            FROM lineitem JOIN orders ON l_orderkey = o_orderkey
            WHERE l_partkey = 7
            ORDER BY o_orderkey, l_linenumber"""))

  /** J7 (web_app.py:28-41): three correlated scalar subqueries per
    * parent row, written decorrelated — ONE groupBy over the child then
    * a single left join, instead of three per-row probes. The oracle
    * keeps the literal correlated form to prove equivalence. At scale
    * this is the difference between one shuffle and three. */
  private val j7 = QueryDef(
    "j7_decorrelated_scalar_subqueries",
    "correlated scalar subqueries → decorrelated groupBy + left join",
    (s, dir) => {
      val c = Tables.customer(s, dir).select("c_custkey", "c_mktsegment")
      val o = Tables.orders(s, dir)
      val stats = o.groupBy(col("o_custkey")).agg(
        count(lit(1)).as("n_orders"),
        date_format(min(col("o_orderdate")), "yyyy-MM-dd").as("first_order"),
        max(col("o_totalprice")).as("max_price"))
      c.join(stats, c("c_custkey") === stats("o_custkey"), "left")
        .select(c("c_custkey"), c("c_mktsegment"),
          coalesce(col("n_orders"), lit(0L)).as("n_orders"),
          col("first_order"), col("max_price"))
        .orderBy("c_custkey")
    },
    Some("""SELECT c_custkey, c_mktsegment,
              (SELECT count(*) FROM orders WHERE o_custkey = c_custkey) AS n_orders,
              (SELECT strftime(min(o_orderdate), '%Y-%m-%d') FROM orders
                WHERE o_custkey = c_custkey) AS first_order,
              (SELECT max(o_totalprice) FROM orders
                WHERE o_custkey = c_custkey) AS max_price
            FROM customer ORDER BY c_custkey"""))

  /** J8 (main_scraper.py:151-152): the diff-sync set difference — adds
    * = current − stored, removes = stored − current, as two anti-joins
    * tagged and unioned. */
  private val j8 = QueryDef(
    "j8_set_difference_antijoins",
    "diff-sync membership deltas via two anti-joins",
    (s, dir) => {
      val o = Tables.orders(s, dir)
      val stored = o.filter(col("o_orderdate") < "1998-01-01")
        .select(col("o_custkey")).distinct()
      val current = o.filter(col("o_orderdate") >= "1997-01-01")
        .select(col("o_custkey")).distinct()
      val adds = current.join(stored, Seq("o_custkey"), "left_anti")
        .select(lit("add").as("action"), col("o_custkey"))
      val removes = stored.join(current, Seq("o_custkey"), "left_anti")
        .select(lit("remove").as("action"), col("o_custkey"))
      adds.unionByName(removes).orderBy("action", "o_custkey")
    },
    Some("""WITH stored AS (SELECT DISTINCT o_custkey FROM orders
                            WHERE o_orderdate < '1998-01-01'),
                 current_s AS (SELECT DISTINCT o_custkey FROM orders
                               WHERE o_orderdate >= '1997-01-01')
            SELECT 'add' AS action, o_custkey FROM current_s
            WHERE o_custkey NOT IN (SELECT o_custkey FROM stored)
            UNION ALL
            SELECT 'remove' AS action, o_custkey FROM stored
            WHERE o_custkey NOT IN (SELECT o_custkey FROM current_s)
            ORDER BY action, o_custkey"""))

  /** J9 (scrape_my_channel.py:705-708): not-in-DB work-list filter as a
    * left-anti join (never a collected id set). */
  private val j9 = QueryDef(
    "j9_anti_join_worklist",
    "left-anti join work-list (parts never ordered)",
    (s, dir) => {
      val p = Tables.part(s, dir)
      // Anti-join against a date-restricted child so the "not yet
      // scraped" set is non-empty in the fixture data; the date filter
      // pushes to the lineitem scan.
      val l = Tables.lineitem(s, dir)
        .filter(col("l_shipdate") < "1996-06-01")
        .select("l_partkey")
      p.join(l, p("p_partkey") === l("l_partkey"), "left_anti")
        .select("p_partkey", "p_name")
        .orderBy("p_partkey")
    },
    Some("""SELECT p_partkey, p_name FROM part
            WHERE NOT EXISTS (SELECT 1 FROM lineitem
                              WHERE l_partkey = p_partkey
                                AND l_shipdate < '1996-06-01')
            ORDER BY p_partkey"""))

  /** J10: as-of join — each click attaches the user's most recent
    * prior view within 6 hours ([[graft.ops.TemporalJoins.asOfJoin]]:
    * union+window, one key shuffle, never a range theta-join). The
    * oracle states the same semantics as the textbook ranked
    * range-join — equivalent, but quadratic per key, which is exactly
    * why the operator doesn't plan it that way. */
  private val j10 = QueryDef(
    "j10_asof_join",
    "as-of join: latest prior event per key within tolerance",
    (s, dir) => {
      val ev = Tables.events(s, dir)
      val clicks = ev.filter(col("event_type") === "click")
        .select("event_id", "user_id", "ts")
      val views = ev.filter(col("event_type") === "view")
        .select(col("user_id"), col("ts"), col("event_id").as("view_id"),
          col("value").as("view_value"), col("ts").as("view_ts"))
      TemporalJoins.asOfJoin(clicks, views, Seq("user_id"),
          leftTsCol = "ts", rightTsCol = "ts",
          payload = Seq("view_id", "view_value", "view_ts"),
          tieBreak = "view_id", toleranceUs = Some(6L * 3600 * 1000000))
        .withColumn("gap_us",
          unix_micros(col("ts")) - unix_micros(col("view_ts")))
        .select("event_id", "user_id", "view_id", "view_value", "gap_us")
        .orderBy("event_id")
    },
    Some("""WITH clicks AS (SELECT event_id, user_id, ts FROM events
                            WHERE event_type = 'click'),
                 views AS (SELECT event_id AS view_id, user_id, ts,
                                  value AS view_value FROM events
                           WHERE event_type = 'view'),
                 ranked AS (
                   SELECT c.event_id, c.user_id, v.view_id, v.view_value,
                          epoch_us(c.ts) - epoch_us(v.ts) AS gap_us,
                          row_number() OVER (
                            PARTITION BY c.event_id
                            ORDER BY v.ts DESC, v.view_id DESC) AS rn
                   FROM clicks c LEFT JOIN views v
                     ON c.user_id = v.user_id AND v.ts <= c.ts
                    AND epoch_us(c.ts) - epoch_us(v.ts) <= 21600000000)
            SELECT event_id, user_id, view_id, view_value, gap_us
            FROM ranked WHERE rn = 1 ORDER BY event_id"""))

  /** J11: interval (range) join ([[TemporalJoins.rangeJoin]]) —
    * events landing inside daily 06:00–18:00 windows, counted per
    * window. The engine plans it as a bucketed EQUI-join (intervals
    * exploded into 6-hour buckets, points in exactly one, containment
    * filtered inside buckets — spec-asserted no NestedLoop/Cartesian);
    * the oracle uses the naive BETWEEN theta-join DuckDB can afford
    * at gate scale. Both ends inclusive. */
  private val j11 = QueryDef(
    "j11_range_join",
    "interval containment join via time-bucket banding",
    (s, dir) => {
      val ev = Tables.events(s, dir).select(col("event_id"), col("ts"))
      val windows = Tables.events(s, dir)
        .select(to_date(col("ts")).as("day")).distinct()
        .select(col("day"),
          (col("day").cast("timestamp") + expr("INTERVAL 6 HOURS")).as("lo"),
          (col("day").cast("timestamp") + expr("INTERVAL 18 HOURS")).as("hi"))
      TemporalJoins.rangeJoin(ev, "ts", windows, "lo", "hi",
        bucketSeconds = 21600)
        .groupBy("day").agg(count(lit(1)).as("n_events"))
        .orderBy("day")
    },
    Some("""WITH days AS (SELECT DISTINCT ts::DATE AS day FROM events),
            w AS (SELECT day, day::TIMESTAMP + INTERVAL 6 HOUR AS lo,
                         day::TIMESTAMP + INTERVAL 18 HOUR AS hi
                  FROM days)
            SELECT day, count(*) AS n_events
            FROM w JOIN events e ON e.ts >= w.lo AND e.ts <= w.hi
            GROUP BY day ORDER BY day"""))

  /** J12: Bloom-pruned semi-join ([[graft.ops.BloomJoin]]) — the
    * big-probe-side scan-pruning technique: a fixed-size bit array
    * built from the (too-big-to-broadcast-exactly) build-side key
    * set drops probe rows during the scan; the exact semi-join then
    * removes the false-positive tail, so the result EQUALS the plain
    * semi-join — which is precisely what the oracle states. The
    * bloom arithmetic itself is spec-pinned (deterministic portable
    * hash positions); the gate pins the end-to-end contract. */
  private val j12 = QueryDef(
    "j12_bloom_semi_join",
    "bloom-filter-pruned semi-join (result == exact semi-join)",
    (s, dir) => {
      val big = Tables.lineitem(s, dir)
        .select("l_orderkey", "l_linenumber", "l_quantity")
      val small = Tables.orders(s, dir)
        .filter(col("o_totalprice") > 150000.0)
        .select("o_orderkey")
      graft.ops.BloomJoin.bloomSemiJoin(big, "l_orderkey",
        small, "o_orderkey")
        .orderBy("l_orderkey", "l_linenumber")
    },
    Some("""SELECT l_orderkey, l_linenumber, l_quantity
            FROM lineitem
            WHERE l_orderkey IN (SELECT o_orderkey FROM orders
                                 WHERE o_totalprice > 150000.0)
            ORDER BY l_orderkey, l_linenumber"""))

  /** J13: SALTED hot-key join ([[graft.ops.Skew.saltedJoin]]) — the
    * pathological-skew case AQE's partition splitting doesn't fully
    * fix (one key carrying ~half the probe rows: the viral-video
    * transcript, the boilerplate bucket). The gate manufactures that
    * key (every even order's lineitem collapses onto part 1) and
    * verifies the operator's entire contract: salting splits rows of
    * the SAME key across partitions without changing the join result,
    * so the oracle is the PLAIN join + rollup. The wall-time win at
    * scale is measured by the round-6 skew probe, not gated here. */
  private val j13 = QueryDef(
    "j13_salted_skew_join",
    "salted hot-key join result == plain join (half the rows on one key)",
    (s, dir) => {
      val skewed = Tables.lineitem(s, dir)
        .select(
          when(pmod(col("l_orderkey"), lit(2)) === 0, lit(1L))
            .otherwise(col("l_partkey")).as("p_partkey"),
          col("l_linenumber"))
      val small = Tables.part(s, dir).select(col("p_partkey"), col("p_name"))
      graft.ops.Skew.saltedJoin(skewed, small, "p_partkey", parts = 16)
        .groupBy("p_partkey", "p_name")
        .agg(count(lit(1)).as("n"), sum(col("l_linenumber")).as("sum_ln"))
        .orderBy("p_partkey")
    },
    Some("""WITH li AS (SELECT CASE WHEN l_orderkey % 2 = 0 THEN 1
                               ELSE l_partkey END AS p_partkey,
                               l_linenumber
                        FROM lineitem)
            SELECT li.p_partkey, p.p_name, count(*)::BIGINT AS n,
                   sum(l_linenumber)::BIGINT AS sum_ln
            FROM li JOIN part p USING (p_partkey)
            GROUP BY li.p_partkey, p.p_name
            ORDER BY p_partkey"""))

  // ---------------------------------------------------------------- A

  /** A1 (display.py:153-160): dashboard table totals, one row per
    * table via union of counts. */
  private val a1 = QueryDef(
    "a1_table_totals",
    "COUNT(*) totals across tables",
    (s, dir) => {
      def cnt(name: String) = Tables.load(s, dir, name)
        .agg(count(lit(1)).as("n")).select(lit(name).as("tbl"), col("n"))
      cnt("customer").unionByName(cnt("orders"))
        .unionByName(cnt("lineitem")).unionByName(cnt("documents"))
        .orderBy("tbl")
    },
    Some("""SELECT 'customer' AS tbl, count(*) AS n FROM customer
            UNION ALL SELECT 'orders', count(*) FROM orders
            UNION ALL SELECT 'lineitem', count(*) FROM lineitem
            UNION ALL SELECT 'documents', count(*) FROM documents
            ORDER BY tbl"""))

  /** A2 (display.py:75-81): grouped count (events by type here; the
    * playlist-summary grouped count is j1). */
  private val a2 = QueryDef(
    "a2_grouped_count",
    "grouped count over an event log",
    (s, dir) => Tables.events(s, dir)
      .groupBy("event_type").agg(count(lit(1)).as("n"))
      .orderBy(desc("n"), asc("event_type")),
    Some("""SELECT event_type, count(*) AS n FROM events
            GROUP BY event_type ORDER BY n DESC, event_type"""))

  /** A3 (display.py:131-139): COUNT(DISTINCT) + HAVING — the
    * cross-linked-videos query. Spark plans distinct-agg with a
    * two-stage expand; the HAVING is a post-agg filter. */
  private val a3 = QueryDef(
    "a3_count_distinct_having",
    "COUNT(DISTINCT) + HAVING > n (cross-linked shape)",
    (s, dir) => Tables.lineitem(s, dir)
      .groupBy("l_partkey")
      .agg(countDistinct(col("l_orderkey")).as("n_orders"))
      .filter(col("n_orders") > 40)
      .orderBy(desc("n_orders"), asc("l_partkey")),
    Some("""SELECT l_partkey, count(DISTINCT l_orderkey) AS n_orders
            FROM lineitem GROUP BY l_partkey
            HAVING count(DISTINCT l_orderkey) > 40
            ORDER BY n_orders DESC, l_partkey"""))

  /** A4 (display.py:172-176, web_app.py:31-38): MIN/MAX per group over
    * dates and money. Dates emitted as strings (tz-repr parity). */
  private val a4 = QueryDef(
    "a4_minmax_per_group",
    "MIN/MAX aggregates per group",
    (s, dir) => {
      val c = Tables.customer(s, dir).select("c_custkey", "c_mktsegment")
      val o = Tables.orders(s, dir).select("o_custkey", "o_orderdate", "o_totalprice")
      c.join(o, c("c_custkey") === o("o_custkey"))
        .groupBy("c_mktsegment")
        .agg(
          date_format(min(col("o_orderdate")), "yyyy-MM-dd").as("first_date"),
          date_format(max(col("o_orderdate")), "yyyy-MM-dd").as("last_date"),
          max(col("o_totalprice")).as("max_price"))
        .orderBy("c_mktsegment")
    },
    Some("""SELECT c_mktsegment,
              strftime(min(o_orderdate), '%Y-%m-%d') AS first_date,
              strftime(max(o_orderdate), '%Y-%m-%d') AS last_date,
              max(o_totalprice) AS max_price
            FROM customer JOIN orders ON c_custkey = o_custkey
            GROUP BY c_mktsegment ORDER BY c_mktsegment"""))

  /** A5 (display.py:180-187): top-k grouped count — top channels.
    * Ordered-with-tiebreak before the limit so top-k is deterministic;
    * Spark plans TakeOrderedAndProject (no global sort). */
  private val a5 = QueryDef(
    "a5_topk_grouped_count",
    "top-5 groups by count (top channels shape)",
    (s, dir) => {
      val c = Tables.customer(s, dir).select("c_custkey", "c_nationkey")
      val n = Tables.nation(s, dir).select("n_nationkey", "n_name")
      c.join(n, c("c_nationkey") === n("n_nationkey"))
        .groupBy("n_name").agg(count(lit(1)).as("n_customers"))
        .orderBy(desc("n_customers"), asc("n_name"))
        .limit(5)
    },
    Some("""SELECT n_name, count(*) AS n_customers
            FROM customer JOIN nation ON c_nationkey = n_nationkey
            GROUP BY n_name ORDER BY n_customers DESC, n_name LIMIT 5"""))

  /** A6 (display.py:547-556): SQLite bare-column GROUP BY — the
    * non-aggregated column rides along. Legal here because the
    * grouping key is the parent PK, so any_value is deterministic;
    * Spark makes the choice explicit where SQLite hides it. */
  private val a6 = QueryDef(
    "a6_bare_column_group_by",
    "bare-column GROUP BY via any_value (PK-grouped)",
    (s, dir) => {
      val o = Tables.orders(s, dir)
        .filter(col("o_orderkey") < 2000)
        .select("o_orderkey", "o_orderstatus")
      val l = Tables.lineitem(s, dir).select("l_orderkey", "l_linenumber")
      o.join(l, o("o_orderkey") === l("l_orderkey"))
        .groupBy("o_orderkey")
        .agg(any_value(col("o_orderstatus")).as("status"),
          count(lit(1)).as("n_items"))
        .orderBy("o_orderkey")
    },
    Some("""SELECT o_orderkey, any_value(o_orderstatus) AS status,
              count(*) AS n_items
            FROM orders JOIN lineitem ON o_orderkey = l_orderkey
            WHERE o_orderkey < 2000
            GROUP BY o_orderkey ORDER BY o_orderkey"""))

  /** A7 (main_scraper.py:295): distinct-set cardinality, exact. The
    * approx_count_distinct scale path is a separate rows-only query in
    * PipelineQueries (sketches don't match an exact oracle). */
  private val a7 = QueryDef(
    "a7_distinct_cardinality",
    "exact distinct cardinalities",
    (s, dir) => Tables.lineitem(s, dir)
      .agg(
        countDistinct(col("l_partkey")).as("n_parts"),
        countDistinct(col("l_suppkey")).as("n_supps"),
        count(lit(1)).as("n_rows"))
      .select(lit(1).as("k"), col("n_parts"), col("n_supps"), col("n_rows")),
    Some("""SELECT 1 AS k, count(DISTINCT l_partkey) AS n_parts,
              count(DISTINCT l_suppkey) AS n_supps, count(*) AS n_rows
            FROM lineitem"""))

  /** A8: exact grouped quantiles — percentile with linear
    * interpolation, the profiling query every curation pipeline runs
    * over its numeric signals (here events.value by type). Exact
    * (not approx_percentile) so the oracle's quantile_cont matches
    * bit-for-bit: both engines compute rank = p·(n−1) and lerp the
    * two neighbors; round(6) guards the last ulp. Exact percentiles
    * buffer each group's values, so this is one shuffle keyed by
    * event_type plus per-group sorts — at 100 TB the scale path is
    * approx_percentile (a7b's sketch discipline); this row pins the
    * exact semantics the sketch approximates. */
  private val a8 = QueryDef(
    "a8_grouped_quantiles",
    "exact per-group quantiles (p50/p90/p99)",
    (s, dir) => Tables.events(s, dir)
      .groupBy("event_type")
      .agg(
        count(lit(1)).as("n"),
        round(percentile(col("value"), lit(0.5)), 6).as("p50"),
        round(percentile(col("value"), lit(0.9)), 6).as("p90"),
        round(percentile(col("value"), lit(0.99)), 6).as("p99"))
      .orderBy("event_type"),
    Some("""SELECT event_type, count(*) AS n,
              round(quantile_cont(value, 0.5), 6) AS p50,
              round(quantile_cont(value, 0.9), 6) AS p90,
              round(quantile_cont(value, 0.99), 6) AS p99
            FROM events GROUP BY event_type ORDER BY event_type"""))

  /** A9: hierarchical rollup — per-(status, year) counts and totals
    * plus per-status subtotals and the grand total in one pass.
    * Spark plans this as one Expand (3 grouping sets) feeding ONE
    * hash aggregate + one shuffle — at 100 TB that beats three
    * separate aggregations by reading the scan once; the Expand's
    * 3× row inflation happens AFTER partial aggregation collapses
    * each map partition. Money is summed as decimal(18,2) — exact,
    * so the sum is order-independent and the double conversion at
    * the output edge is deterministic; the grouping keys are never
    * null in the base data, so null unambiguously marks subtotal
    * rows (no grouping_id needed in the gate). */
  private val a9 = QueryDef(
    "a9_rollup_totals",
    "ROLLUP subtotals: (status, year), (status), grand total",
    (s, dir) => Tables.orders(s, dir)
      .rollup(col("o_orderstatus").as("status"),
        year(col("o_orderdate")).cast("long").as("yr"))
      .agg(count(lit(1)).as("n_orders"),
        round(sum(col("o_totalprice").cast("decimal(18,2)"))
          .cast("double"), 2).as("sum_price"))
      .orderBy(col("status").asc_nulls_first, col("yr").asc_nulls_first),
    Some("""SELECT o_orderstatus AS status, year(o_orderdate) AS yr,
              count(*) AS n_orders,
              round(sum(o_totalprice::DECIMAL(18,2))::DOUBLE, 2) AS sum_price
            FROM orders
            GROUP BY ROLLUP (o_orderstatus, year(o_orderdate))
            ORDER BY status NULLS FIRST, yr NULLS FIRST"""))

  // ---------------------------------------------------------------- W

  /** W1 (scrape_my_channel.py:457): 1-based position assignment per
    * group — row_number over (partition, order). */
  private val w1 = QueryDef(
    "w1_position_assignment",
    "row_number position per group",
    (s, dir) => {
      val w = Window.partitionBy(col("l_orderkey")).orderBy(col("l_linenumber"))
      Tables.lineitem(s, dir)
        .filter(col("l_orderkey") < 50)
        .select(col("l_orderkey"), col("l_linenumber"))
        .withColumn("position", row_number().over(w))
        .orderBy("l_orderkey", "position")
    },
    Some("""SELECT l_orderkey, l_linenumber,
              row_number() OVER (PARTITION BY l_orderkey
                                 ORDER BY l_linenumber) AS position
            FROM lineitem WHERE l_orderkey < 50
            ORDER BY l_orderkey, position"""))

  /** W2 (display.py:304-312): next-position append — MAX(position)
    * over the group + 1. */
  private val w2 = QueryDef(
    "w2_next_position",
    "max(position)+1 per group (append slot)",
    (s, dir) => {
      val w = Window.partitionBy(col("l_orderkey"))
      Tables.lineitem(s, dir)
        .filter(col("l_orderkey") < 200)
        .select(col("l_orderkey"), col("l_linenumber"))
        .withColumn("next_pos", max(col("l_linenumber")).over(w) + 1)
        .select("l_orderkey", "next_pos").distinct()
        .orderBy("l_orderkey")
    },
    Some("""SELECT DISTINCT l_orderkey,
              max(l_linenumber) OVER (PARTITION BY l_orderkey) + 1 AS next_pos
            FROM lineitem WHERE l_orderkey < 200
            ORDER BY l_orderkey"""))

  /** W3 (main_scraper.py:383-391): latest-event-per-key — the ping
    * lifecycle's latest-status view; row_number desc = 1. */
  private val w3 = QueryDef(
    "w3_latest_per_key",
    "latest event per key via row_number desc",
    (s, dir) => {
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("ts").desc, col("event_id").desc)
      Tables.events(s, dir)
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1)
        .select(col("user_id"), col("event_id"), col("event_type"),
          date_format(col("ts"), "yyyy-MM-dd HH:mm:ss").as("ts_s"))
        .orderBy("user_id")
    },
    Some("""SELECT user_id, event_id, event_type,
              strftime(ts, '%Y-%m-%d %H:%M:%S') AS ts_s
            FROM (SELECT *, row_number() OVER (PARTITION BY user_id
                    ORDER BY ts DESC, event_id DESC) AS rn FROM events)
            WHERE rn = 1 ORDER BY user_id"""))

  /** W4: gap-based sessionization ([[graft.ops.Sessions]]) — the
    * batch twin of the streaming sessionizer, 30-minute gap. Two
    * stacked windows on one (user_id, ts) exchange assign session
    * numbers; the rollup emits one row per session. event_id breaks
    * same-ts ties so the boundaries are deterministic. */
  private val w4 = QueryDef(
    "w4_sessionize",
    "gap-based session assignment + per-session rollup",
    (s, dir) => Sessions.sessionSummary(
        Tables.events(s, dir), "user_id", "ts", gapSeconds = 1800,
        tieBreak = "event_id")
      .select(col("user_id"), col("session_no"), col("n_events"),
        date_format(col("session_start"), "yyyy-MM-dd HH:mm:ss").as("start_s"),
        date_format(col("session_end"), "yyyy-MM-dd HH:mm:ss").as("end_s"),
        col("span_ms"))
      .orderBy("user_id", "session_no"),
    Some("""WITH g AS (
              SELECT user_id, event_id, ts,
                CASE WHEN lag(ts) OVER w IS NULL
                       OR epoch_ms(ts) - epoch_ms(lag(ts) OVER w)
                          > 1800 * 1000 THEN 1 ELSE 0 END AS new_s
              FROM events
              WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
            a AS (
              SELECT user_id, ts,
                (sum(new_s) OVER (PARTITION BY user_id ORDER BY ts, event_id
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))::BIGINT
                  AS session_no
              FROM g)
            SELECT user_id, session_no, count(*) AS n_events,
              strftime(min(ts), '%Y-%m-%d %H:%M:%S') AS start_s,
              strftime(max(ts), '%Y-%m-%d %H:%M:%S') AS end_s,
              epoch_ms(max(ts)) - epoch_ms(min(ts)) AS span_ms
            FROM a GROUP BY user_id, session_no
            ORDER BY user_id, session_no"""))

  /** W5: ordered-funnel progression ([[Sessions.funnelStages]]) —
    * per user, the furthest view→click→purchase stage reached in
    * time order (a purchase before any view advances nothing). The
    * per-user fold is the position-ordered integer fold both engines
    * replicate exactly; integer-only output. */
  private val w5 = QueryDef(
    "w5_funnel_stages",
    "ordered funnel progression (signup -> view -> click -> purchase)",
    (s, dir) => {
      // high-value events only — the full stream is dense enough at
      // sf0.01 that every user completes, which would gate nothing;
      // the >100 slice populates all five stages (29/44/41/19/17)
      val hv = Tables.events(s, dir).filter(col("value") > 100.0)
      Sessions.funnelStages(hv,
        "user_id", "ts", "event_type", "event_id",
        Seq("signup", "view", "click", "purchase"),
        universe = Some(Tables.events(s, dir)))
        .orderBy("stage")
    },
    Some("""WITH sc AS (SELECT user_id, ts, event_id,
              CASE event_type WHEN 'signup' THEN 1 WHEN 'view' THEN 2
                   WHEN 'click' THEN 3 WHEN 'purchase' THEN 4
                   ELSE 0 END AS sc
              FROM events WHERE value > 100.0),
            st AS (SELECT user_id,
              list_reduce(list_prepend(0, list(sc ORDER BY ts, event_id)),
                (a, x) -> CASE WHEN x = a + 1 THEN a + 1 ELSE a END) AS stage
              FROM sc WHERE sc > 0 GROUP BY user_id),
            au AS (SELECT DISTINCT user_id FROM events)
            SELECT coalesce(st.stage, 0) AS stage, count(*) AS n_users
            FROM au LEFT JOIN st USING (user_id)
            GROUP BY 1 ORDER BY stage"""))

  /** W6: frame-based running metrics — cumulative sum and a 3-row
    * moving average per user in event-time order, the signal-
    * smoothing shape every monitoring/curation dashboard computes.
    * Both frames ride ONE (user_id) exchange + one sort — Spark
    * evaluates all window functions over the same (partition, order)
    * spec in a single Window operator, so adding the second frame is
    * free. Running frames stream in O(1) memory per partition (no
    * full-partition buffering like unbounded-following would need);
    * round(6) guards the last ulp of the double fold, which both
    * engines accumulate in identical (ts, event_id) order. */
  private val w6 = QueryDef(
    "w6_running_metrics",
    "running sum + 3-row moving average per user",
    (s, dir) => {
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("ts").asc, col("event_id").asc)
      val cum = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val mov = w.rowsBetween(-2, Window.currentRow)
      Tables.events(s, dir)
        .filter(col("user_id") < 100)
        .select(col("user_id"), col("event_id"),
          round(sum(col("value")).over(cum), 6).as("cum_value"),
          round(avg(col("value")).over(mov), 6).as("mov_avg3"))
        .orderBy("user_id", "event_id")
    },
    Some("""SELECT user_id, event_id,
              round(sum(value) OVER (PARTITION BY user_id
                ORDER BY ts, event_id
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 6)
                AS cum_value,
              round(avg(value) OVER (PARTITION BY user_id
                ORDER BY ts, event_id
                ROWS BETWEEN 2 PRECEDING AND CURRENT ROW), 6) AS mov_avg3
            FROM events WHERE user_id < 100
            ORDER BY user_id, event_id"""))

  /** W7: cohort retention — users bucketed by first-activity week
    * (both engines truncate weeks to Monday), counted distinct in
    * each subsequent week. The analytics shape every engagement
    * dashboard runs, and a deliberate three-narrow-shuffle plan:
    * (1) distinct (user, week) collapses the raw event mass FIRST
    * (the only corpus-sized exchange — everything after moves
    * ≤ |users|·|weeks| rows), (2) min-week per user, (3) the
    * (cohort, offset) count. Week offsets are day-diffs of
    * week-truncated dates — exact multiples of 7, so the division
    * is exact in both engines. */
  private val w7 = QueryDef(
    "w7_cohort_retention",
    "weekly cohort retention matrix",
    (s, dir) => {
      // qualifying activity = high-value events; the full stream is
      // dense enough that every user "retains" trivially (w5's trick)
      val um = Tables.events(s, dir)
        .filter(col("value") > 160.0)
        .select(col("user_id"), date_trunc("week", col("ts")).as("m"))
        .distinct()
      val cohort = um.groupBy("user_id").agg(min(col("m")).as("c"))
      um.join(cohort, "user_id")
        .groupBy(date_format(col("c"), "yyyy-MM-dd").as("cohort"),
          (datediff(col("m"), col("c")) / 7).cast("long").as("k"))
        .agg(countDistinct(col("user_id")).as("n_active"))
        .orderBy("cohort", "k")
    },
    Some("""WITH um AS (SELECT DISTINCT user_id,
              date_trunc('week', ts) AS m FROM events
              WHERE value > 160.0),
            c AS (SELECT user_id, min(m) AS c FROM um GROUP BY user_id)
            SELECT strftime(c.c, '%Y-%m-%d') AS cohort,
              (date_diff('day', c.c, m) // 7)::BIGINT AS k,
              count(DISTINCT um.user_id) AS n_active
            FROM um JOIN c USING (user_id)
            GROUP BY 1, 2 ORDER BY cohort, k"""))

  /** W8: SCD2 validity intervals ([[Sessions.stateIntervals]]) —
    * the type-2 slowly-changing-dimension history derived from the
    * raw state-change log: one row per consecutive same-state run,
    * [valid_from, valid_to), open interval's valid_to null. The
    * whole chain (lag run detection, running-sum run numbering, run
    * rollup, lead valid_to) rides one (user_id) exchange. */
  private val w8 = QueryDef(
    "w8_scd2_intervals",
    "SCD2 validity intervals from a state-change log",
    (s, dir) => Sessions.stateIntervals(
        Tables.events(s, dir).filter(col("user_id") < 200),
        "user_id", "ts", "event_type", "event_id")
      .select(col("user_id"), col("run_no"), col("state"),
        date_format(col("valid_from"), "yyyy-MM-dd HH:mm:ss").as("from_s"),
        date_format(col("valid_to"), "yyyy-MM-dd HH:mm:ss").as("to_s"),
        col("n_events"))
      .orderBy("user_id", "run_no"),
    Some("""WITH g AS (SELECT user_id, event_id, ts, event_type,
              CASE WHEN lag(event_type) OVER w IS NULL
                     OR lag(event_type) OVER w <> event_type
                   THEN 1 ELSE 0 END AS nr
              FROM events WHERE user_id < 200
              WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
            r AS (SELECT user_id, ts, event_type,
              (sum(nr) OVER (PARTITION BY user_id ORDER BY ts, event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))::BIGINT
                 AS run_no
              FROM g),
            a AS (SELECT user_id, run_no,
              any_value(event_type) AS state,
              min(ts) AS valid_from, count(*) AS n_events
              FROM r GROUP BY user_id, run_no)
            SELECT user_id, run_no, state,
              strftime(valid_from, '%Y-%m-%d %H:%M:%S') AS from_s,
              strftime(lead(valid_from) OVER (PARTITION BY user_id
                ORDER BY run_no), '%Y-%m-%d %H:%M:%S') AS to_s,
              n_events
            FROM a ORDER BY user_id, run_no"""))

  /** W9: HOPPING-WINDOW counts — the overlapping-window semantics
    * neither tumbling (st4) nor row frames (w6) express: 2-hour
    * windows advancing every hour, so each event counts in exactly
    * window/slide = 2 of them (the smoothing view every ops
    * dashboard wants). Spark's window(ts, '2 hours', '1 hour')
    * replicates in the oracle as the event × slide-offsets expansion
    * — both sides align window starts to epoch hour boundaries. */
  private val w9 = QueryDef(
    "w9_hopping_windows",
    "2h windows hopping hourly: every event counted in both",
    (s, dir) => Tables.events(s, dir)
      .groupBy(window(col("ts"), "2 hours", "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"))
      .select(col("window.start").cast("long").as("w_start_s"),
        col("event_type"), col("n"))
      .orderBy("w_start_s", "event_type"),
    Some("""SELECT CAST(epoch(time_bucket(INTERVAL '1 hour', ts)
              - g.k * INTERVAL '1 hour') AS BIGINT) AS w_start_s,
              event_type, count(*)::BIGINT AS n
            FROM events, generate_series(0, 1) AS g(k)
            GROUP BY 1, 2 ORDER BY 1, 2"""))

  // ---------------------------------------------------------------- O

  /** O1 (main_scraper.py:98): COLLATE NOCASE ordering → sort by
    * lower(key) with the raw key + pk as deterministic tie-breaks.
    * Mixed case is manufactured (the synthetic names are case-uniform). */
  private val o1 = QueryDef(
    "o1_nocase_sort",
    "case-insensitive ordering (COLLATE NOCASE)",
    (s, dir) => Tables.part(s, dir)
      .filter(col("p_partkey") < 300)
      .select(col("p_partkey"),
        when(col("p_partkey") % 2 === 0, upper(col("p_name")))
          .otherwise(col("p_name")).as("name"))
      .orderBy(lower(col("name")), col("name"), col("p_partkey")),
    Some("""SELECT p_partkey,
              CASE WHEN p_partkey % 2 = 0 THEN upper(p_name) ELSE p_name END AS name
            FROM part WHERE p_partkey < 300
            ORDER BY lower(name), name, p_partkey"""))

  /** O2 (display.py:81): ORDER BY count DESC — the dashboard's
    * most-filled-first ordering as its own row (also inside j1/a2). */
  private val o2 = QueryDef(
    "o2_count_desc_sort",
    "descending count ordering",
    (s, dir) => Tables.lineitem(s, dir)
      .groupBy("l_suppkey").agg(count(lit(1)).as("n_items"))
      .orderBy(desc("n_items"), asc("l_suppkey")),
    Some("""SELECT l_suppkey, count(*) AS n_items FROM lineitem
            GROUP BY l_suppkey ORDER BY n_items DESC, l_suppkey"""))

  /** O3 (display.py:102): ORDER BY date DESC with nulls — SQLite puts
    * NULL last on DESC; Spark's desc_nulls_last matches; the oracle
    * pins it explicitly. Nulls manufactured via CASE. */
  private val o3 = QueryDef(
    "o3_desc_nulls_last",
    "descending sort, nulls last",
    (s, dir) => Tables.orders(s, dir)
      .filter(col("o_custkey") < 50)
      .select(col("o_orderkey"),
        when(col("o_orderstatus") === "P", lit(null).cast("timestamp"))
          .otherwise(col("o_orderdate")).as("d"))
      .select(col("o_orderkey"), date_format(col("d"), "yyyy-MM-dd").as("d"))
      .orderBy(col("d").desc_nulls_last, col("o_orderkey")),
    Some("""SELECT o_orderkey,
              strftime(CASE WHEN o_orderstatus = 'P' THEN NULL
                            ELSE o_orderdate END, '%Y-%m-%d') AS d
            FROM orders WHERE o_custkey < 50
            ORDER BY d DESC NULLS LAST, o_orderkey"""))

  /** O4 (gui_app.py:65): multi-key mixed-direction ordering. */
  private val o4 = QueryDef(
    "o4_multikey_sort",
    "multi-key asc/desc ordering",
    (s, dir) => Tables.lineitem(s, dir)
      .filter(col("l_orderkey") < 30)
      .select(col("l_orderkey"), col("l_linenumber"),
        date_format(col("l_shipdate"), "yyyy-MM-dd").as("ship"))
      .orderBy(asc("l_linenumber"), desc("ship"), asc("l_orderkey")),
    Some("""SELECT l_orderkey, l_linenumber,
              strftime(l_shipdate, '%Y-%m-%d') AS ship
            FROM lineitem WHERE l_orderkey < 30
            ORDER BY l_linenumber ASC, ship DESC, l_orderkey ASC"""))

  /** O5 (web_app.py:53, export_playlists.py:44): playlist-position
    * ordering — curated order within each parent (also inside w1/s3). */
  private val o5 = QueryDef(
    "o5_position_order",
    "per-parent curated position ordering",
    (s, dir) => Tables.lineitem(s, dir)
      .filter(col("l_orderkey") < 100)
      .select("l_orderkey", "l_linenumber", "l_partkey")
      .orderBy(asc("l_orderkey"), asc("l_linenumber"), asc("l_partkey")),
    Some("""SELECT l_orderkey, l_linenumber, l_partkey FROM lineitem
            WHERE l_orderkey < 100
            ORDER BY l_orderkey, l_linenumber, l_partkey"""))

  /** O6 (display.py:556): top-k by sort + limit — Spark plans
    * TakeOrderedAndProject (per-partition heap + driver merge), which
    * is exactly the 100 TB-safe shape: no global sort. */
  private val o6 = QueryDef(
    "o6_topk_limit",
    "ORDER BY ... LIMIT top-k",
    (s, dir) => Tables.lineitem(s, dir)
      .select("l_orderkey", "l_linenumber", "l_extendedprice")
      .orderBy(desc("l_extendedprice"), asc("l_orderkey"), asc("l_linenumber"))
      .limit(20),
    Some("""SELECT l_orderkey, l_linenumber, l_extendedprice FROM lineitem
            ORDER BY l_extendedprice DESC, l_orderkey, l_linenumber
            LIMIT 20"""))

  /** O7 (scrape_my_channel.py:389-394): order-preserving dedup — keep
    * the first occurrence per key by arrival order. */
  private val o7 = QueryDef(
    "o7_first_occurrence_dedup",
    "order-preserving dedup (first event per user+type)",
    (s, dir) => {
      val w = Window.partitionBy(col("user_id"), col("event_type"))
        .orderBy(col("ts").asc, col("event_id").asc)
      Tables.events(s, dir)
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1)
        .select("user_id", "event_type", "event_id")
        .orderBy("user_id", "event_type")
    },
    Some("""SELECT user_id, event_type, event_id
            FROM (SELECT *, row_number() OVER (PARTITION BY user_id, event_type
                    ORDER BY ts, event_id) AS rn FROM events)
            WHERE rn = 1 ORDER BY user_id, event_type"""))

  /** O8 (§2.7): set operations — INTERSECT and EXCEPT branches tagged
    * and unioned (the reference only has procedural set difference;
    * these are the engine-level equivalents). */
  private val o8 = QueryDef(
    "o8_set_ops",
    "INTERSECT / EXCEPT set operations",
    (s, dir) => {
      val o = Tables.orders(s, dir)
      val open = o.filter(col("o_orderstatus") === "O")
        .select(col("o_custkey")).distinct()
      val done = o.filter(col("o_orderstatus") === "F")
        .select(col("o_custkey")).distinct()
      val both = open.intersect(done)
        .select(lit("both").as("tag"), col("o_custkey"))
      val openOnly = open.except(done)
        .select(lit("open_only").as("tag"), col("o_custkey"))
      both.unionByName(openOnly).orderBy("tag", "o_custkey")
    },
    Some("""WITH open_c AS (SELECT DISTINCT o_custkey FROM orders
                            WHERE o_orderstatus = 'O'),
                 done_c AS (SELECT DISTINCT o_custkey FROM orders
                            WHERE o_orderstatus = 'F')
            SELECT 'both' AS tag, o_custkey FROM
              (SELECT o_custkey FROM open_c INTERSECT
               SELECT o_custkey FROM done_c)
            UNION ALL
            SELECT 'open_only', o_custkey FROM
              (SELECT o_custkey FROM open_c EXCEPT
               SELECT o_custkey FROM done_c)
            ORDER BY tag, o_custkey"""))

  /** O9: pivot / cross-tab — one row per user, one column per event
    * type. The values list is EXPLICIT, which matters twice: Spark
    * skips the extra distinct-values pass (one scan, one aggregate),
    * and the output schema is static — the 100 TB contract, since a
    * data-dependent column set can't be planned, only discovered.
    * Catalyst compiles pivot to exactly the oracle's shape: one
    * hash aggregate of count-FILTER branches, no extra shuffle over
    * the plain groupBy. Absent combinations are 0, not null (both
    * engines pinned). */
  private val o9 = QueryDef(
    "o9_pivot",
    "pivot event types to per-user count columns",
    (s, dir) => Tables.events(s, dir)
      .filter(col("user_id") < 50)
      .groupBy("user_id")
      .pivot("event_type", Seq("signup", "view", "click", "purchase"))
      .agg(count(lit(1)))
      .na.fill(0)
      .orderBy("user_id"),
    Some("""SELECT user_id,
              count(*) FILTER (WHERE event_type = 'signup') AS signup,
              count(*) FILTER (WHERE event_type = 'view') AS view,
              count(*) FILTER (WHERE event_type = 'click') AS click,
              count(*) FILTER (WHERE event_type = 'purchase') AS purchase
            FROM events WHERE user_id < 50
            GROUP BY user_id ORDER BY user_id"""))

  def defs: Seq[QueryDef] = Seq(
    p1, p2, p3, p4, p5, p6, p7, p9,
    j1, j2, j3, j4, j5, j6, j7, j8, j9, j10, j11, j12, j13,
    a1, a2, a3, a4, a5, a6, a7, a8, a9,
    w1, w2, w3, w4, w5, w6, w7, w8, w9,
    o1, o2, o3, o4, o5, o6, o7, o8, o9)
}
