"""Relational operator family: scans, projections, joins, aggregations,
windows, set ops — the Spark re-expression of the reference's implicit
dataflow (SURVEY.md §2 A/C/D/F).

Every public ``q_*`` function takes ``(spark, sf_dir)`` and returns a
DataFrame whose column names match the paired oracle SQL in
``go_crawler_spark.oracles`` exactly (the driver hash-compares values
after sorting columns by name).

Scale notes (100 TB discipline):
- dimension joins (nation/region/supplier) are explicitly broadcast —
  at any scale those stay dim-sized;
- fact-fact joins (orders⋈lineitem) shuffle on the join key and rely on
  AQE for skew split;
- aggregations are expressed as single groupBy so Catalyst plans
  partial (map-side) + final hash aggregation;
- all filters are plain Column predicates → parquet pushdown.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from go_crawler_spark.tables import load


def q_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flagship: TPC-H-Q1-shaped pricing summary over lineitem.

    Mirrors the reference's metrics rollup shape (success/fail counters,
    /root/reference/internal/usecase/crawler.go:609-631) generalized to
    a full grouped aggregate. Single shuffle; partial agg map-side.
    """
    li = load(spark, sf_dir, "lineitem")
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("sum_disc_price"),
            F.round(F.avg("l_quantity"), 4).alias("avg_qty"),
            F.round(F.avg("l_discount"), 4).alias("avg_disc"),
            F.count(F.lit(1)).cast("long").alias("count_order"),
        )
    )


def q_dedupe_anti_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Enqueue-with-dedupe as an anti-join (SURVEY.md §2 D1/B10).

    'new URLs' = orders; 'seen set' = customers in the BUILDING segment.
    The reference probes Redis per URL
    (/root/reference/internal/usecase/crawler.go:448-456); the Spark form
    is one left_anti join — the seen side is aggregated to distinct keys
    first so the anti-join probe side is minimal.
    """
    orders = load(spark, sf_dir, "orders")
    seen = (
        load(spark, sf_dir, "customer")
        .filter(F.col("c_mktsegment") == "BUILDING")
        .select(F.col("c_custkey").alias("o_custkey"))
        .distinct()
    )
    return orders.join(seen, "o_custkey", "left_anti").select(
        "o_orderkey", "o_custkey"
    )


def q_dedupe_first_writer_wins(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Within-batch duplicate collapse, deterministic (SURVEY.md §2 D3).

    The reference's per-page goroutines race on Exists/Save
    (/root/reference/internal/usecase/crawler.go:263-304); we collapse
    duplicates by a deterministic first-writer rule: min id per key.
    Key = leading 5 tokens of the document (a canonicalized-URL analog).
    """
    docs = load(spark, sf_dir, "documents")
    key = F.array_join(F.slice(F.split(F.col("text"), " "), 1, 5), " ")
    return (
        docs.select(F.col("doc_id"), key.alias("dup_key"))
        .groupBy("dup_key")
        .agg(
            F.min("doc_id").cast("long").alias("keeper_id"),
            F.count(F.lit(1)).cast("long").alias("dup_count"),
        )
    )


def q_politeness_topk_per_host(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Window-ranked per-host budget dequeue (SURVEY.md §2 F2/C6).

    host → user_id, priority → value: rank events per user and keep the
    top 3. This is the politeness scheduler's core shape: one shuffle on
    the partition key, rank, filter — no driver-side loop.
    """
    events = load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy(
        F.col("value").desc(), F.col("event_id").asc()
    )
    return (
        events.withColumn("rn", F.row_number().over(w).cast("long"))
        .filter(F.col("rn") <= 3)
        .select("user_id", "event_id", "rn")
    )


def q_union_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Union of discovered-URL sets across strategies (SURVEY.md §2 D4)."""
    cust = load(spark, sf_dir, "customer").select(
        F.col("c_nationkey").alias("nationkey")
    )
    supp = load(spark, sf_dir, "supplier").select(
        F.col("s_nationkey").alias("nationkey")
    )
    return cust.unionByName(supp).distinct()


def q_metrics_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Round metrics aggregation (SURVEY.md §2 F5): counters + rates."""
    events = load(spark, sf_dir, "events")
    return events.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("long").alias("n_events"),
        F.sum(F.when(F.col("value") > 5.0, 1).otherwise(0))
        .cast("long")
        .alias("n_high"),
        F.round(F.avg("value"), 4).alias("avg_value"),
        F.round(F.max("value"), 2).alias("max_value"),
    )


def q_broadcast_dim_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Revenue per nation in ASIA (TPC-H-Q5 shape; SURVEY.md §2 G joins).

    nation/region/supplier are broadcast (dim-sized at any SF); the
    orders⋈lineitem fact join shuffles on orderkey with AQE skew split.
    Customer and supplier must share the nation (Q5 semantics).
    """
    cust = load(spark, sf_dir, "customer")
    orders = load(spark, sf_dir, "orders")
    li = load(spark, sf_dir, "lineitem")
    supp = load(spark, sf_dir, "supplier")
    nation = load(spark, sf_dir, "nation")
    region = load(spark, sf_dir, "region")

    asia_nations = nation.join(
        F.broadcast(region.filter(F.col("r_name") == "ASIA")),
        nation.n_regionkey == region.r_regionkey,
    ).select("n_nationkey", "n_name")

    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(
            F.broadcast(supp),
            (li.l_suppkey == supp.s_suppkey),
        )
        .join(cust, (orders.o_custkey == cust.c_custkey))
        .filter(cust.c_nationkey == supp.s_nationkey)
        .join(F.broadcast(asia_nations), supp.s_nationkey == F.col("n_nationkey"))
        .groupBy("n_name")
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue"),
            F.count(F.lit(1)).cast("long").alias("n_lineitems"),
        )
    )


def q_pagination_expand(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Total-count pagination (SURVEY.md §2 B5-B7).

    page_count = ceil(total/per_page) exactly as
    /root/reference/internal/usecase/crawler.go:371; URL construction as
    buildPaginatedURL query-mode (crawler.go:476-516). Pure narrow ops:
    sequence + explode + format_string — no shuffle at all.
    """
    part = load(spark, sf_dir, "part")
    per_page = 10
    pages = part.select(
        F.col("p_partkey"),
        F.ceil(F.col("p_size") / F.lit(per_page)).cast("int").alias("page_count"),
    ).select(
        "p_partkey",
        F.explode(F.sequence(F.lit(1), F.col("page_count"))).alias("page_no"),
    )
    return pages.select(
        "p_partkey",
        F.col("page_no").cast("long").alias("page_no"),
        F.format_string(
            "https://jobs.example.com/search/%d?p=%d", "p_partkey", "page_no"
        ).alias("page_url"),
    )


def q_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-based sessionization over the events stream (30-min gap).

    The batch twin of the streaming session operator: lag → gap flag →
    running sum = session id. Two window passes over one shuffle
    (same partition key), then one aggregate.
    """
    spark.conf.set("spark.sql.session.timeZone", "UTC")  # NTZ→epoch parity
    events = load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    epoch = F.unix_timestamp(F.col("ts"))
    gap = F.when(epoch - F.lag(epoch).over(w) > 1800, 1).otherwise(0)
    sessions = events.withColumn("new_sess", gap).withColumn(
        "sess_id", F.sum("new_sess").over(w)
    )
    return sessions.groupBy("user_id").agg(
        (F.max("sess_id") + 1).cast("long").alias("n_sessions"),
        F.count(F.lit(1)).cast("long").alias("n_events"),
    )


def q_asof_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Point-in-time (as-of) join: each click event picks the most
    recent view event of the same user at-or-before its timestamp.

    Spark has no ASOF JOIN operator; the scale-correct composition is
    the union-window form: both sides ride ONE shuffle on user_id and
    an ordered running last_value('view', ignorenulls) carries the
    match forward to every click — never a range join, never a per-key
    collect, never all-pairs. At 100 TB this is one Exchange + one
    window (the plan sessionize already rides). DuckDB's native
    ASOF LEFT JOIN derives the oracle answer independently. All
    timestamps travel as integer epoch-micros, so there is no float or
    interval arithmetic to disagree on. Equal-timestamp view/click
    ties would be ordered views-first to match ASOF's >= semantics;
    the event stream has strictly increasing per-user timestamps, so
    the tie-break is latent."""
    spark.conf.set("spark.sql.session.timeZone", "UTC")  # NTZ→epoch parity
    ev = load(spark, sf_dir, "events").filter(
        F.col("event_type").isin("view", "click")
    )
    base = ev.select(
        "event_id",
        "user_id",
        "event_type",
        F.unix_micros(F.col("ts").cast("timestamp")).alias("ts_us"),
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts_us", F.col("event_type").desc(), "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    is_view = F.col("event_type") == "view"
    view_id = F.last(
        F.when(is_view, F.col("event_id")), ignorenulls=True
    ).over(w)
    view_us = F.last(F.when(is_view, F.col("ts_us")), ignorenulls=True).over(w)
    return (
        base.withColumn("asof_view_id", view_id)
        .withColumn("lag_us", F.col("ts_us") - view_us)
        .filter(F.col("event_type") == "click")
        .select(
            F.col("event_id").alias("click_id"),
            "user_id",
            "ts_us",
            "asof_view_id",
            "lag_us",
        )
    )


def q_multires_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hypertable-style cascading time rollup over the events stream:
    minute → hour → day, each coarser grain aggregated FROM the finer
    grain, never from the raw scan.

    Scale shape: the raw scan is touched exactly once (the minute
    groupBy, one shuffle whose key count is bounded by minutes×types,
    partial agg map-side); the hour and day passes then aggregate
    inputs that are orders of magnitude smaller — at 100 TB the
    cascade costs one fact shuffle plus two near-free rollups, where
    recomputing every grain from the scan would cost three. This is
    the continuous-aggregate / materialized-rollup pattern
    (TimescaleDB hypertables, Druid rollup) expressed as plain
    DataFrame ops.

    Determinism: all integer math — epoch seconds (exact (us−us%10⁶)/10⁶
    floor at ≤2^53) and floor-cents values — so the DuckDB oracle (which
    derives the day grain directly from the scan, independently of the
    cascade) matches bit-for-bit in any aggregation order."""
    spark.conf.set("spark.sql.session.timeZone", "UTC")  # NTZ→epoch parity
    ev = load(spark, sf_dir, "events")
    us = F.unix_micros(F.col("ts").cast("timestamp"))
    sec = ((us - us % 1_000_000) / 1_000_000).cast("long")
    base = ev.select(
        sec.alias("sec"),
        "event_type",
        F.floor(F.col("value") * 100).cast("long").alias("cents"),
    )
    minute = base.groupBy(
        (F.col("sec") - F.col("sec") % 60).alias("m"), "event_type"
    ).agg(
        F.count(F.lit(1)).cast("long").alias("n_events"),
        F.sum("cents").cast("long").alias("sum_cents"),
    )
    hour = minute.groupBy(
        (F.col("m") - F.col("m") % 3600).alias("h"), "event_type"
    ).agg(
        F.sum("n_events").cast("long").alias("n_events"),
        F.sum("sum_cents").cast("long").alias("sum_cents"),
        F.count(F.lit(1)).cast("long").alias("n_minutes"),
    )
    return hour.groupBy(
        (F.col("h") - F.col("h") % 86400).alias("day"), "event_type"
    ).agg(
        F.sum("n_events").cast("long").alias("n_events"),
        F.sum("sum_cents").cast("long").alias("sum_cents"),
        F.sum("n_minutes").cast("long").alias("n_minutes"),
        F.count(F.lit(1)).cast("long").alias("n_hours"),
    )


RANGE_BUCKET_US = 600_000_000  # 10 min — also the max incident length


def _bucket_of(c: "F.Column") -> "F.Column":
    """Exact integer floor(c / RANGE_BUCKET_US) for non-negative longs:
    the numerator (c − c%B) is an exact multiple ≤ 2^53, so the double
    division is exact (same trick as textstats._floordiv)."""
    return ((c - c % RANGE_BUCKET_US) / RANGE_BUCKET_US).cast("long")


def q_range_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interval-containment (range) join: every click attributed to
    each error-incident window [err_ts, err_ts + (err_id%10+1) min)
    that contains it.

    Spark plans a naive theta join as BroadcastNestedLoop — O(n·m) and
    forbidden here. The scale path is coarse time-bucket binning:
    window length is bounded by one bucket width (10 min), so each
    window explodes to ≤ 2 bucket keys, each click maps to exactly
    one, and the join becomes a bucket equi-join with the residual
    containment predicate riding it — shuffle cardinality stays
    O(rows), not O(pairs). The DuckDB oracle is the plain inequality
    join over the same integer-micros columns."""
    spark.conf.set("spark.sql.session.timeZone", "UTC")  # NTZ→epoch parity
    ev = load(spark, sf_dir, "events").select(
        "event_id",
        "event_type",
        F.unix_micros(F.col("ts").cast("timestamp")).alias("us"),
    )
    wins = ev.filter(F.col("event_type") == "error").select(
        F.col("event_id").alias("win_id"),
        F.col("us").alias("start_us"),
        (F.col("us") + (F.col("event_id") % 10 + 1) * 60_000_000).alias(
            "end_us"
        ),
    )
    clicks = ev.filter(F.col("event_type") == "click").select(
        F.col("event_id").alias("click_id"), F.col("us").alias("click_us")
    )
    wbuck = wins.withColumn(
        "bucket",
        F.explode(
            F.sequence(
                _bucket_of(F.col("start_us")), _bucket_of(F.col("end_us") - 1)
            )
        ),
    )
    cbuck = clicks.withColumn("bucket", _bucket_of(F.col("click_us")))
    return (
        cbuck.join(wbuck, "bucket")
        .filter(
            (F.col("click_us") >= F.col("start_us"))
            & (F.col("click_us") < F.col("end_us"))
        )
        .select(
            "win_id",
            "click_id",
            (F.col("click_us") - F.col("start_us")).alias("offset_us"),
        )
    )


# re-fetch interval clamp bounds (seconds) and base period
REFETCH_BASE_SEC = 3600
REFETCH_MIN_SEC = 300
REFETCH_MAX_SEC = 604_800


def q_refetch_schedule(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental re-crawl scheduling (Cho & Garcia-Molina 2003 shape):
    per URL, estimate the content change rate from its fetch history
    and derive the next politeness-bounded re-fetch time. The reference
    crawls each URL once (status whitelist, SURVEY.md §2 B11); a
    continuous frontier instead re-enqueues URLs at an interval
    inversely proportional to their observed change frequency.

    ``events`` stands in for the fetch log (user_id = URL id, one row
    per historical fetch); the changed-since-last-fetch flag is a
    deterministic MINSTD residue of event_id so the oracle replays it
    bit-for-bit. interval = clamp(BASE · n_fetch / (n_changed+1),
    MIN, MAX) in exact integer floor-division — a frequently-changing
    URL (n_changed → n_fetch) converges to ~BASE, a static one is
    back-off-capped at MAX.

    Scale shape: one partial-aggregated groupBy on the URL key (the
    8-byte id is the only shuffled payload), then a narrow clamp map —
    the same plan at 10^10 URLs."""
    from go_crawler_spark.functions.textstats import _floordiv

    ev = load(spark, sf_dir, "events")
    changed = F.when(
        (F.col("event_id") * 48271 + 7) % 97 < 32, F.lit(1).cast("long")
    ).otherwise(F.lit(0).cast("long"))
    hist = (
        ev.select(
            F.col("user_id").alias("url_id"),
            changed.alias("changed"),
            # NTZ → session-UTC timestamp → epoch seconds via exact
            # integer floor-division (oracle mirrors: epoch_us // 1e6)
            _floordiv(
                F.unix_micros(F.col("ts").cast("timestamp")),
                F.lit(1_000_000).cast("long"),
            ).alias("ts_sec"),
        )
        .groupBy("url_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_fetch"),
            F.sum("changed").alias("n_changed"),
            F.max("ts_sec").alias("last_fetch_sec"),
        )
    )
    raw = _floordiv(
        F.col("n_fetch") * REFETCH_BASE_SEC, F.col("n_changed") + 1
    )
    refetch = F.least(
        F.lit(REFETCH_MAX_SEC).cast("long"),
        F.greatest(F.lit(REFETCH_MIN_SEC).cast("long"), raw),
    )
    return hist.select(
        "url_id",
        "n_fetch",
        "n_changed",
        refetch.alias("refetch_sec"),
        (F.col("last_fetch_sec") + refetch).alias("next_fetch_sec"),
        F.when(refetch <= 3600, "hot")
        .when(refetch <= 86400, "daily")
        .otherwise("cold")
        .alias("band"),
    )


# host-budget waterfill: capacity as a fraction of total demand, and
# the histogram level search that replaces a global per-host sort
BUDGET_CAP_DIV = 3  # round capacity = total_demand // BUDGET_CAP_DIV
BUDGET_HOST_MOD = 200  # synthetic host cardinality


def q_host_budget_waterfill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Max-min fair (waterfill) fetch-slot allocation across hosts under
    one global round capacity. The reference rate-limits with a single
    fixed sleep (/root/reference/internal/usecase/crawler.go:109 — one
    host, concurrency 1); a web-scale frontier has a global fetch
    budget per round and must split it across millions of competing
    hosts so no host starves: every host gets min(demand, level) where
    the water level is the largest integer T with
    Σ_h min(d_h, T) ≤ capacity.

    Scale shape: per-host demand is one partial-aggregated groupBy on
    the host key. The level search then runs on the DEMAND HISTOGRAM —
    a second groupBy onto distinct demand values — so the only ordered
    scans are (a) the cumulative window over distinct-demand rows and
    (b) the remainder rank over SATURATED hosts only, never a global
    per-host sort: 10^7 hosts with ~10^4 distinct demands need a
    10^4-row window, and the remainder rank is bounded by the
    saturated-host count. The chosen level broadcasts back as a
    one-row join.

    Max-min fairness is exact: the sub-level remainder
    rem = (cap − used(d*)) mod hosts_above (< saturated-host count by
    the floor property) goes +1 each to the first ``rem`` saturated
    hosts ranked by a MINSTD mix of the numeric host id — a
    deterministic, oracle-replayable stand-in for xxhash64(host),
    which DuckDB cannot compute — so Σ alloc == cap whenever total
    demand ≥ cap (VERDICT r4 "What's wrong" #3). A +1 host has
    demand ≥ level+1, so the bonus never overshoots its demand.

    All math is int64 (demands are counts; the level is
    d* + (cap − used(d*)) // hosts_above with exact floor division), so
    the DuckDB oracle replays it bit-for-bit. A virtual histogram row
    at demand 0 (used = 0 ≤ cap) makes the level search total: when
    even the smallest demand can't be met for everyone, d* = 0 and the
    level degrades to the flat cap // n_hosts split.
    """
    from go_crawler_spark.functions.textstats import _floordiv

    orders = load(spark, sf_dir, "orders")
    demand = (
        orders.select(
            (F.col("o_orderkey") % BUDGET_HOST_MOD).alias("host_num")
        )
        .groupBy("host_num")
        .agg(F.count(F.lit(1)).cast("long").alias("demand"))
        .select(
            F.format_string("host-%d.example.com", "host_num").alias("host"),
            "host_num",
            "demand",
        )
    )
    hist = demand.groupBy("demand").agg(
        F.count(F.lit(1)).cast("long").alias("n_hosts"),
        (F.count(F.lit(1)) * F.col("demand")).cast("long").alias("tot"),
    )
    zero = spark.range(1).select(
        F.lit(0).cast("long").alias("demand"),
        F.lit(0).cast("long").alias("n_hosts"),
        F.lit(0).cast("long").alias("tot"),
    )
    w = Window.orderBy("demand").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    totals = demand.agg(
        F.count(F.lit(1)).cast("long").alias("n_all"),
        F.sum("demand").cast("long").alias("d_all"),
    )
    cum = (
        hist.unionByName(zero)
        .withColumn("cum_hosts", F.sum("n_hosts").over(w).cast("long"))
        .withColumn("cum_tot", F.sum("tot").over(w).cast("long"))
        .crossJoin(F.broadcast(totals))
        .withColumn(
            "cap", _floordiv(F.col("d_all"), F.lit(BUDGET_CAP_DIV).cast("long"))
        )
        # filling every demand ≤ d fully and capping the rest at d
        .withColumn(
            "used",
            F.col("cum_tot")
            + (F.col("n_all") - F.col("cum_hosts")) * F.col("demand"),
        )
    )
    slope = F.col("n_all") - F.col("cum_hosts")  # hosts above the level
    level = (
        cum.filter(F.col("used") <= F.col("cap"))
        .orderBy(F.col("demand").desc())
        .limit(1)
        .select(
            F.when(
                slope > 0,
                F.col("demand")
                + _floordiv(F.col("cap") - F.col("used"), slope),
            )
            .otherwise(F.col("demand"))
            .alias("level"),
            # rem = cap − Σ min(d_h, level) = (cap − used(d*)) mod slope;
            # 0 when no host is saturated (then cap − Σ demand is true
            # slack, not divisible fairness debt)
            F.when(
                slope > 0, F.pmod(F.col("cap") - F.col("used"), slope)
            )
            .otherwise(F.lit(0).cast("long"))
            .alias("rem"),
        )
    )
    base = demand.crossJoin(F.broadcast(level))
    # remainder rank: saturated hosts only (bounded window), MINSTD mix
    # of the host id as the deterministic shuffle-proof order
    mix = (F.col("host_num") * 48271 + 11) % 100_003
    w_sat = Window.orderBy(mix.asc(), F.col("host_num").asc())
    bonus_keys = (
        base.filter(F.col("demand") > F.col("level"))
        .withColumn("rnk", F.row_number().over(w_sat).cast("long"))
        .filter(F.col("rnk") <= F.col("rem"))
        .select("host_num", F.lit(1).cast("long").alias("bonus"))
    )
    return (
        base.join(bonus_keys, "host_num", "left")
        .select(
            "host",
            "demand",
            (
                F.least(F.col("demand"), F.col("level"))
                + F.coalesce(F.col("bonus"), F.lit(0).cast("long"))
            ).alias("alloc"),
            (F.col("demand") > F.col("level")).alias("saturated"),
            F.col("level").alias("level"),
        )
    )


# snapshot-diff membership/status rules (deterministic key residues)
SNAPDIFF_DROP_A = 7  # url absent from snapshot A iff key % 7 == 0
SNAPDIFF_DROP_B = 5  # url absent from snapshot B iff key % 5 == 0


def q_frontier_snapshot_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Change-data-capture diff between two frontier snapshots: per URL,
    (old_status, new_status, change ∈ added|removed|status_changed|
    unchanged). The reference's Redis keyspace mutates in place with no
    history (/root/reference/internal/infra/crawl_job_client.go:42-82);
    a snapshot store (crawl/store.py keeps the same commit-marker
    semantics Iceberg would) makes round-over-round diffs a first-class
    audit query — what did round k+1 discover, finish, or drop?

    Both snapshots are synthesized from orders with deterministic key
    residues (membership by %7 / %5, status by %3) so the oracle
    rebuilds the identical pair. Shape: one full-outer equi-join on the
    8-byte url key — both sides shuffle-partition on the key, AQE
    handles skew; no window, no collect."""
    orders = load(spark, sf_dir, "orders").select(
        F.col("o_orderkey").alias("url_id")
    )
    k = F.col("url_id")
    snap_a = orders.filter(k % SNAPDIFF_DROP_A != 0).select(
        "url_id",
        F.when(k % 3 == 0, "PENDING").otherwise("SUCCESS").alias("old_status"),
    )
    snap_b = orders.filter(k % SNAPDIFF_DROP_B != 0).select(
        "url_id",
        F.when(k % 3 == 1, "PENDING").otherwise("SUCCESS").alias("new_status"),
    )
    joined = snap_a.join(snap_b, "url_id", "full_outer")
    change = (
        F.when(F.col("old_status").isNull(), "added")
        .when(F.col("new_status").isNull(), "removed")
        .when(F.col("old_status") != F.col("new_status"), "status_changed")
        .otherwise("unchanged")
    )
    return joined.select(
        "url_id", "old_status", "new_status", change.alias("change")
    )


# --------------------------------------------------------------------------
# Rendezvous (highest-random-weight) host→fetcher-shard assignment —
# the cluster-membership primitive a fetch fleet uses to give every
# host a stable owner (Thaler & Ravishankar, "Using name-based mappings
# to increase hit rates", IEEE/ACM ToN 6(1), 1998). The reference runs
# ONE fetch worker (/root/reference/internal/usecase/crawler.go:109 —
# concurrency 1, a single host), so ownership is trivial there; a
# 1000-executor fleet must shard politeness state by host, and HRW is
# the standard scheme because growing the fleet N→N+1 moves only the
# ~1/(N+1) of hosts whose new-shard weight wins — every other host
# keeps its owner, so per-host rate-limit state never mass-migrates.
#
# Determinism for the oracle: weight(h, s) is the MINSTD-style mix
# ((h % P + (s+1)·C) · A) % P with the repo's shared Knuth/P constants
# — the shard term lands BEFORE the multiplicative scramble so no
# shard index is systematically favored (an additive term AFTER the
# mix is monotone in s and the last shard always wins); consecutive
# shard inputs differ by C, so outputs differ by C·A mod P — an
# effectively random large stride that wraps P every few steps. Pure
# int64 (≤ ~2.7e18), so DuckDB replays it exactly. The argmax is
# branch-free: comb = w·64 + (63 − s) is strictly distinct across
# shards (s < 64), MAX(comb) picks the highest weight with ties to the
# LOWEST shard id, and shard = 63 − comb % 64 recovers the winner.
#
# Scale shape: entirely map-side per host — the per-shard weights are
# an array_max over a SEQUENCE literal (no explode row-blowup, no
# shuffle, no join); the only Exchange is the distinct-host build
# itself. The minimal-movement audit (shard_a vs shard_b, moved) is
# the same narrow map twice.
# --------------------------------------------------------------------------

HRW_P = 1000000007  # shared prime modulus (cleaning.SPLIT_MIX_P)
HRW_A = 2654435761  # Knuth multiplicative constant (cleaning.SPLIT_MIX_A)
HRW_C = 40503  # 16-bit Knuth mix for the shard term
HRW_N_A = 8  # fleet size before the resize
HRW_N_B = 9  # fleet size after adding one fetcher


def _hrw_comb(host_num: Column, n_shards: int) -> Column:
    """MAX over s in [0, n) of weight(h, s)·64 + (63 − s) — the packed
    rendezvous argmax (weights distinct per shard by construction)."""
    return F.array_max(
        F.transform(
            F.sequence(F.lit(0), F.lit(n_shards - 1)),
            lambda s: (
                (
                    (host_num % HRW_P + (s.cast("long") + 1) * HRW_C)
                    * F.lit(HRW_A).cast("long")
                )
                % HRW_P
            )
            * 64
            + (63 - s.cast("long")),
        )
    )


def q_hrw_shard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(host, host_num, shard_a, shard_b, moved): stable rendezvous
    owner for every distinct host at fleet sizes HRW_N_A and HRW_N_B,
    plus the resize-movement flag. HRW guarantees moved ⇒ shard_b is
    the NEW shard (HRW_N_B − 1): an existing shard can never steal a
    host during a grow."""
    orders = load(spark, sf_dir, "orders")
    hosts = (
        orders.select(
            (F.col("o_orderkey") % BUDGET_HOST_MOD).alias("host_num")
        )
        .distinct()
        .select(
            F.format_string("host-%d.example.com", "host_num").alias("host"),
            F.col("host_num").cast("long").alias("host_num"),
        )
    )
    shard_a = 63 - _hrw_comb(F.col("host_num"), HRW_N_A) % 64
    shard_b = 63 - _hrw_comb(F.col("host_num"), HRW_N_B) % 64
    return (
        hosts.withColumn("shard_a", shard_a.cast("long"))
        .withColumn("shard_b", shard_b.cast("long"))
        .withColumn("moved", F.col("shard_a") != F.col("shard_b"))
    )


# --------------------------------------------------------------------------
# Host-skew audit — the imbalance statistic that decides whether a
# frontier needs salting / AQE skew-join hygiene BEFORE a round runs:
# the Gini coefficient of per-host demand plus the demand share of the
# top-1% hottest hosts. On the web both are extreme (host popularity
# is Zipfian — Broder et al., "Graph structure in the web", WWW 2000),
# and a scheduler that ignores them serializes on its hottest hosts.
# The reference crawls ONE host and cannot observe skew at all.
#
# Scale shape (the point of the operator): Gini normally needs a
# GLOBAL per-host sort (rank every host by demand). With ties grouped,
# Σ rank·d per equal-demand group is d·(n_h·below + n_h·(n_h+1)/2) —
# independent of tie order — so the whole statistic computes on the
# DEMAND HISTOGRAM (distinct demand values, the waterfill trick): a
# 10^7-host frontier with 10^4 distinct demands needs a 10^4-row
# window, never a host sort. The top-1% share reads the same
# histogram from the hot end (whole groups + one partial group). The
# two permille divisions ride _mul_floordiv_wide (numerators reach
# ~n·T·1000 ≈ 10^20 at fleet scale — past int64); DuckDB mirrors with
# HUGEINT //.
# --------------------------------------------------------------------------

SKEW_HOST_MOD = 200  # synthetic host cardinality (waterfill's corpus)


def q_host_skew(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One row: (n_hosts, total_demand, gini_permille, top1pct_hosts,
    top1pct_share_permille) over per-host frontier demand. Gini uses
    ascending ranks 1..n with tie groups summed in closed form;
    top-1% takes the ceil(n/100) hottest hosts (partial group pro-
    rated by demand)."""
    from go_crawler_spark.functions.textstats import (
        _floordiv,
        _mul_floordiv_wide,
    )

    orders = load(spark, sf_dir, "orders")
    demand = (
        orders.select(
            (F.col("o_orderkey") % SKEW_HOST_MOD).alias("host_num")
        )
        .groupBy("host_num")
        .agg(F.count(F.lit(1)).cast("long").alias("d"))
    )
    hist = demand.groupBy("d").agg(
        F.count(F.lit(1)).cast("long").alias("n_h")
    )
    w_asc = Window.orderBy("d").rowsBetween(
        Window.unboundedPreceding, -1
    )
    w_desc = Window.orderBy(F.col("d").desc()).rowsBetween(
        Window.unboundedPreceding, -1
    )
    g = (
        hist.withColumn(
            "below", F.coalesce(F.sum("n_h").over(w_asc), F.lit(0)).cast("long")
        )
        .withColumn(
            "above",
            F.coalesce(F.sum("n_h").over(w_desc), F.lit(0)).cast("long"),
        )
        .withColumn(
            "rank_d",
            F.col("d")
            * (
                F.col("n_h") * F.col("below")
                + _floordiv(
                    F.col("n_h") * (F.col("n_h") + 1), F.lit(2).cast("long")
                )
            ),
        )
    )
    tot = g.agg(
        F.sum("n_h").cast("long").alias("n"),
        F.sum(F.col("n_h") * F.col("d")).cast("long").alias("t"),
        F.sum("rank_d").cast("long").alias("r"),
    )
    k = _floordiv(F.col("n") + 99, F.lit(100).cast("long"))
    # top-1% demand: per group take min(n_h, max(0, k − above)) hosts
    topsum = g.crossJoin(F.broadcast(tot)).select(
        (
            F.col("d")
            * F.greatest(
                F.lit(0).cast("long"),
                F.least(F.col("n_h"), k - F.col("above")),
            )
        ).alias("take_d"),
        F.lit(1).alias("one"),
    ).groupBy("one").agg(F.sum("take_d").cast("long").alias("top_t"))
    return (
        tot.crossJoin(F.broadcast(topsum.drop("one")))
        .select(
            F.col("n").alias("n_hosts"),
            F.col("t").alias("total_demand"),
            _mul_floordiv_wide(
                F.lit(2).cast("long") * F.col("r")
                - (F.col("n") + 1) * F.col("t"),
                F.lit(1000).cast("long"),
                F.col("n") * F.col("t"),
            ).alias("gini_permille"),
            k.alias("top1pct_hosts"),
            _mul_floordiv_wide(
                F.col("top_t"), F.lit(1000).cast("long"), F.col("t")
            ).alias("top1pct_share_permille"),
        )
    )
