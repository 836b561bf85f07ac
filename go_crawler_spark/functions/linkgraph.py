"""Link-graph operators: PageRank frontier prioritization.

The reference crawls breadth-first with a per-host budget and a static
priority column (SURVEY.md §2 F3-F4; /root/reference/internal/usecase/
crawler.go dequeue loop); a web-scale frontier ranks its pending URLs
by link authority instead. PageRank is the canonical such score, and
the canonical *iterative* Spark workload: each Lloyd-style round is

    ranks ⋈ edges (shuffle keyed by src) → contrib per edge →
    groupBy dst (one aggregation shuffle) → damped update vs all nodes

so a 10^10-edge graph iterates in O(iters) shuffle rounds with rank
state one long per node — never driver-side, never all-pairs. The
link graph here is synthesized deterministically from ``documents``
(every node emits PR_FANOUT pseudo-random out-links via an LCG both
engines compute exactly), standing in for the crawl's discovered-edge
table; the operator body is source-agnostic.

Determinism for the oracle (the driver hash-compares values): ranks
are integer mass units (PR_SCALE per node at t=0); the out-degree
split and the 0.85 damping both go through exact wide floor-division
(DECIMAL(38,0) on the Spark side, HUGEINT ``//`` in DuckDB), so both
engines produce bit-identical longs in any aggregation order, at any
corpus size — no double ever carries a value.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from go_crawler_spark.functions.textstats import _mul_floordiv_wide
from go_crawler_spark.tables import load

PR_FANOUT = 4  # out-link candidates per node (pre-distinct)
PR_ITERS = 3  # fixed unrolled iterations (oracle mirrors each level)
PR_SCALE = 1_000_000_000  # integer mass units per node at t=0
# teleport share = 15% of PR_SCALE, exactly representable as a long
PR_TELEPORT = 150_000_000
# MINSTD-family LCG for the synthetic out-links — engine-agnostic
# integer math (same discipline as textstats' train-mix MINSTD gate)
PR_LCG_A = 48271
PR_LCG_K = 11
PR_LCG_C = 7


def _wide_floordiv(a: Column, b: Column) -> Column:
    """floor(a/b) for non-negative longs with a possibly above 2^53
    (rank mass concentrates: a single hub's rank is bounded only by
    total graph mass ≈ N·PR_SCALE). Same DECIMAL(38,0) discipline as
    textstats._mul_floordiv_wide; DuckDB mirrors with HUGEINT //."""
    return _mul_floordiv_wide(a, F.lit(1).cast("long"), b)


def link_edges(docs: DataFrame) -> DataFrame:
    """Deterministic (src, dst) out-link table over the doc-id node set:
    dst_k = (src·A + k·K + C) mod N for k < PR_FANOUT, self-loops
    remapped to the next node, duplicates collapsed. N rides a
    broadcast one-row count — no driver collect."""
    n_row = docs.agg(F.count(F.lit(1)).cast("long").alias("n_nodes"))
    cand = (
        docs.select(F.col("doc_id").alias("src"))
        .crossJoin(F.broadcast(n_row))
        .select(
            "src",
            "n_nodes",
            F.explode(F.sequence(F.lit(0), F.lit(PR_FANOUT - 1))).alias("k"),
        )
        .select(
            "src",
            "n_nodes",
            (
                (F.col("src") * PR_LCG_A + F.col("k") * PR_LCG_K + PR_LCG_C)
                % F.col("n_nodes")
            ).alias("dst0"),
        )
    )
    return cand.select(
        "src",
        F.when(
            F.col("dst0") == F.col("src"), (F.col("dst0") + 1) % F.col("n_nodes")
        )
        .otherwise(F.col("dst0"))
        .alias("dst"),
    ).distinct()


def pagerank_ranks(
    nodes: DataFrame, edges: DataFrame, iters: int = PR_ITERS
) -> DataFrame:
    """(doc_id, pr) for EVERY node after ``iters`` damped integer
    PageRank rounds. nodes: (doc_id); edges: (src, dst).

    Per round: contrib(u→v) = floor(pr(u)/outdeg(u)); pr'(v) =
    PR_TELEPORT + floor(85·Σcontrib / 100). Nodes with no in-links
    decay to the teleport floor via the left join; nodes with no
    out-links keep their rank row (this is what the crawl engine's
    order='pagerank' dequeue consumes — a frontier URL with no known
    out-links still needs a priority). The edges⋈outdeg side is
    invariant across rounds, so it is computed once and
    localCheckpointed — each round then costs exactly two shuffles
    (attach ranks by src, aggregate by dst)."""
    outdeg = edges.groupBy("src").agg(F.count(F.lit(1)).cast("long").alias("outdeg"))
    edeg = edges.join(outdeg, "src").localCheckpoint(eager=False)
    ranks = nodes.select("doc_id", F.lit(PR_SCALE).cast("long").alias("pr"))
    for _ in range(iters):
        contrib = edeg.join(
            ranks.select(F.col("doc_id").alias("src"), "pr"), "src"
        ).select("dst", _wide_floordiv(F.col("pr"), F.col("outdeg")).alias("c"))
        sums = contrib.groupBy("dst").agg(F.sum("c").alias("s"))
        ranks = (
            nodes.join(sums.withColumnRenamed("dst", "doc_id"), "doc_id", "left")
            .select(
                "doc_id",
                (
                    F.lit(PR_TELEPORT).cast("long")
                    + _mul_floordiv_wide(
                        F.coalesce(F.col("s"), F.lit(0).cast("long")),
                        F.lit(85).cast("long"),
                        F.lit(100).cast("long"),
                    )
                ).alias("pr"),
            )
        )
    return ranks


def pagerank(nodes: DataFrame, edges: DataFrame, iters: int = PR_ITERS) -> DataFrame:
    """(doc_id, outdeg, pr) after ``iters`` damped integer PageRank
    rounds — pagerank_ranks restricted to nodes with out-links (the
    operator's oracle-paired output contract)."""
    outdeg = edges.groupBy("src").agg(F.count(F.lit(1)).cast("long").alias("outdeg"))
    return pagerank_ranks(nodes, edges, iters).join(
        outdeg.withColumnRenamed("src", "doc_id"), "doc_id"
    ).select("doc_id", "outdeg", "pr")


def q_link_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PageRank frontier priority over the synthesized doc link graph:
    (doc_id, outdeg, pr) after PR_ITERS integer-exact damped rounds.
    The pr column is what a frontier dequeue would ORDER BY (F3's
    priority analog at web scale)."""
    docs = load(spark, sf_dir, "documents").select("doc_id")
    return pagerank(docs, link_edges(docs))


ANCHOR_TOPK = 3  # anchor variants kept per target URL
ANCHOR_MOD = 17  # distinct anchor-text classes in the synthetic graph


def q_anchor_text_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Anchor-text aggregation: for every link target, the top-k anchor
    texts pointing at it, by count with a deterministic tie-break —
    the classic web-search signal (anchor text describes the TARGET,
    so search indexes aggregate it per destination; Brin & Page 1998
    §2.2). The reference extracts links without anchors (SURVEY.md §2
    A4); this is the web-scale enrichment of that edge table.

    Shape: edges get their anchor class map-side, one partial-agg
    groupBy (dst, anchor) → counts, then a window rank over the
    PRE-AGGREGATED rows (≤ ANCHOR_MOD per dst, bounded state — never
    a collect_list of raw anchors) keeps the top ANCHOR_TOPK. At
    10^12 edges only (dst, anchor-class) pairs ever shuffle twice."""
    docs = load(spark, sf_dir, "documents").select("doc_id")
    edges = link_edges(docs)
    counted = (
        edges.select(
            "dst",
            F.concat(
                F.lit("anchor-"), (F.col("src") % ANCHOR_MOD).cast("string")
            ).alias("anchor"),
        )
        .groupBy("dst", "anchor")
        .agg(F.count(F.lit(1)).cast("long").alias("cnt"))
    )
    from pyspark.sql import Window

    w = Window.partitionBy("dst").orderBy(
        F.col("cnt").desc(), F.col("anchor").asc()
    )
    return (
        counted.withColumn("rnk", F.row_number().over(w).cast("long"))
        .filter(F.col("rnk") <= ANCHOR_TOPK)
        .select("dst", "rnk", "anchor", "cnt")
    )


# link-farm detection: reciprocity threshold + planted farm structure
FARM_MOD = 97  # doc_id ≡ 0 (mod 97) nodes form the planted farm ring
FARM_LINKS = 2  # ring links each way (±1, ±2 by farm index) — symmetric
RECIP_PPM_THRESH = 400_000  # ≥ 40% reciprocated out-links ⇒ farm flag


def farm_edges(docs: DataFrame) -> DataFrame:
    """Planted link-farm: the ≡0 (mod FARM_MOD) nodes link to their
    ±1..±FARM_LINKS ring neighbors by farm index — symmetric by
    construction, so every farm edge is reciprocated. Ring arithmetic
    runs off a broadcast (min, count) row: no window, no collect."""
    farm = docs.filter(F.col("doc_id") % FARM_MOD == 0).select(
        F.col("doc_id").alias("src")
    )
    stats = farm.agg(
        F.min("src").alias("mn"),
        F.count(F.lit(1)).cast("long").alias("m"),
    )
    from go_crawler_spark.functions.textstats import _floordiv

    deltas = [d for k in range(1, FARM_LINKS + 1) for d in (k, -k)]
    # exact integer farm index (src-mn ≡ 0 mod FARM_MOD, but the repo's
    # _floordiv discipline holds even past 2^53 node ids — ADVICE r4)
    idx = _floordiv(F.col("src") - F.col("mn"), F.lit(FARM_MOD).cast("long"))
    return (
        farm.crossJoin(F.broadcast(stats))
        .select(
            "src",
            "mn",
            "m",
            idx.cast("long").alias("i"),
            F.explode(F.array(*[F.lit(d) for d in deltas])).alias("d"),
        )
        .filter(F.col("m") > 2 * FARM_LINKS)  # ring needs distinct neighbors
        .select(
            "src",
            (
                F.col("mn")
                + FARM_MOD * ((F.col("i") + F.col("d") + F.col("m")) % F.col("m"))
            ).alias("dst"),
        )
    )


def q_link_reciprocity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Link-farm detection by out-link reciprocity (the TrustRank-era
    spam signal: organic pages rarely get their links returned, farms
    reciprocate densely — Gyöngyi et al. 2004 discuss farm structures
    PageRank alone rewards). Per source node: out-degree, reciprocated
    out-degree, reciprocity ppm (exact floor) and the farm flag. The
    edge set is the shared LCG graph (≈0 organic reciprocity) plus the
    planted symmetric farm ring, so both flag classes exist at every
    SF.

    Scale shape: one distinct over the edge union (keyed on the edge
    pair), one left-semi self-join probing (dst, src) against
    (src, dst) — 16-byte keys, no payload — then a per-src partial
    aggregate. At 10^12 edges nothing but edge-key pairs ever
    shuffles, and the semi-join discards non-reciprocal probes
    map-side after the first match."""
    from go_crawler_spark.functions.textstats import _floordiv

    docs = load(spark, sf_dir, "documents").select("doc_id")
    edges = (
        link_edges(docs)
        .select("src", "dst")
        .unionByName(farm_edges(docs))
        .distinct()
    )
    rev = edges.select(
        F.col("dst").alias("src"), F.col("src").alias("dst")
    )
    recip = edges.join(rev, ["src", "dst"], "left_semi")
    out_deg = edges.groupBy("src").agg(
        F.count(F.lit(1)).cast("long").alias("n_out")
    )
    rec_deg = recip.groupBy("src").agg(
        F.count(F.lit(1)).cast("long").alias("n_recip")
    )
    ppm = _floordiv(
        F.col("n_recip") * 1_000_000, F.col("n_out")
    )
    return (
        out_deg.join(rec_deg, "src", "left")
        .select(
            "src",
            "n_out",
            F.coalesce(F.col("n_recip"), F.lit(0).cast("long")).alias(
                "n_recip"
            ),
        )
        .select(
            "src",
            "n_out",
            "n_recip",
            ppm.alias("recip_ppm"),
            (ppm >= RECIP_PPM_THRESH).alias("farm_flag"),
        )
    )


# --- HITS hubs & authorities --------------------------------------------------
# The second classical link-authority signal (Kleinberg, JACM 1999):
# authorities are pointed at by good hubs, hubs point at good
# authorities. Complements PageRank on the same discovered-edge table
# — a crawl frontier wants authorities (fetch them), a link-farm
# auditor wants hubs (they reveal who is propping whom up).
#
# Determinism: the mutual-reinforcement update is two sparse
# matrix-vector products per iteration, each normalized to HITS_SCALE
# total mass by exact wide floor-division (the float ℓ²-normalization
# of textbook HITS is replaced by an ℓ¹ rescale, which preserves the
# ranking and keeps every value a bit-exact long in both engines).
# Per iteration: 2 join-by-key + 2 groupBy shuffles over (long, long)
# rows plus two broadcast one-row sums — never all-pairs, no driver
# state; a 10^10-edge graph iterates exactly like PageRank does.

HITS_ITERS = 2
HITS_SCALE = 1_000_000_000


def _l1_rescale(nodes: DataFrame, raw: DataFrame, col: str) -> DataFrame:
    """(doc_id, col) for EVERY node: raw values rescaled to sum ≈
    HITS_SCALE by floor(v·SCALE / Σv), missing nodes at 0. Σv rides a
    broadcast one-row aggregate — no collect."""
    tot = raw.agg(F.sum("v").cast("long").alias("tot"))
    return (
        nodes.join(raw.withColumnRenamed("dst_or_src", "doc_id"), "doc_id", "left")
        .crossJoin(F.broadcast(tot))
        .select(
            "doc_id",
            _mul_floordiv_wide(
                F.coalesce(F.col("v"), F.lit(0).cast("long")),
                F.lit(HITS_SCALE).cast("long"),
                F.col("tot"),
            ).alias(col),
        )
    )


def hits_scores(
    nodes: DataFrame, edges: DataFrame, iters: int = HITS_ITERS
) -> DataFrame:
    """(doc_id, auth, hub) for EVERY node after ``iters`` exact-integer
    HITS rounds. nodes: (doc_id); edges: (src, dst).

    Round t: auth_raw(v) = Σ_{u→v} hub(u);  auth = ℓ¹-rescale;
             hub_raw(u)  = Σ_{u→v} auth(v); hub  = ℓ¹-rescale.
    The edges frame is reused across rounds (same localCheckpoint
    discipline as pagerank_ranks would be applied by callers that
    iterate more; at HITS_ITERS=2 the plan stays small without it)."""
    hub = nodes.select("doc_id", F.lit(HITS_SCALE).cast("long").alias("hub"))
    auth = None
    for _ in range(iters):
        a_raw = (
            edges.join(
                hub.select(F.col("doc_id").alias("src"), "hub"), "src"
            )
            .groupBy("dst")
            .agg(F.sum("hub").cast("long").alias("v"))
            .withColumnRenamed("dst", "dst_or_src")
        )
        auth = _l1_rescale(nodes, a_raw, "auth")
        h_raw = (
            edges.join(
                auth.select(F.col("doc_id").alias("dst"), "auth"), "dst"
            )
            .groupBy("src")
            .agg(F.sum("auth").cast("long").alias("v"))
            .withColumnRenamed("src", "dst_or_src")
        )
        hub = _l1_rescale(nodes, h_raw, "hub")
    return auth.join(hub, "doc_id").select("doc_id", "auth", "hub")


def q_hits_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HITS over the synthesized doc link graph: (doc_id, auth, hub)
    after HITS_ITERS exact-integer mutual-reinforcement rounds — the
    hub/authority complement to q_link_pagerank on the same edges.

    Scale shape: identical to PageRank's — per round the only wide
    data is (long, long) edge/score rows shuffled by src or dst; the
    ℓ¹ rescale is a broadcast of a one-row sum. DECIMAL(38,0) wide
    math on the Spark side, HUGEINT // in DuckDB: bit-identical longs
    in any aggregation order at any corpus size."""
    docs = load(spark, sf_dir, "documents").select("doc_id")
    return hits_scores(docs, link_edges(docs))


# --- OPIC (On-line Page Importance Computation) -------------------------------
# The third authority signal, and the one actually designed for a
# crawl frontier (Abiteboul, Preda & Cobéna, WWW 2003): every page
# holds CASH; each round a visited page banks its cash into HISTORY
# and distributes it equally along its out-links; importance is
# history + cash. Unlike PageRank it needs no convergence before the
# signal is usable — a crawler reads the running estimate mid-crawl,
# which is exactly the frontier's situation (the engine's
# order='pagerank' dequeue could consume this column unchanged).
#
# This is the synchronous batch adaptation (every page "visited" once
# per round). Dangling pages (no out-links — the frontier's unfetched
# majority) bank their cash into a global pot that is redistributed
# uniformly next round: the pot is a one-row broadcast aggregate, the
# paper's virtual-root trick without a driver collect. To make the
# dangling path real (the LCG graph gives every node out-links), OPIC
# drops the out-edges of src ≡ 0 (mod OPIC_DANGLE_MOD) nodes.
#
# Determinism: cash splits and the pot share go through exact wide
# floor-division (DECIMAL(38,0) / HUGEINT //); every value is a long
# both engines reproduce bit-identically in any aggregation order.
# Floor remainders leak mass (bounded by outdeg per node per round,
# < N·(FANOUT+1) per round globally) — leaked, never double-counted,
# and both engines leak identically.
#
# Range bound (the same mass-concentration bound PageRank documents at
# _wide_floordiv): any cash/hist value ≤ total mass = N·OPIC_SCALE, so
# longs hold to N < 2^63/OPIC_SCALE ≈ 9.2·10^9 nodes even if every
# unit of cash concentrated on one page; past that, shrink OPIC_SCALE
# (the estimate is scale-free) — intermediates are already DECIMAL(38).

OPIC_ITERS = 3
OPIC_SCALE = 1_000_000_000  # initial cash per page
OPIC_DANGLE_MOD = 13  # src ≡ 0 (mod 13) pages keep no out-links


def opic_scores(
    nodes: DataFrame, edges: DataFrame, iters: int = OPIC_ITERS
) -> DataFrame:
    """(doc_id, cash, hist, importance) after ``iters`` synchronous
    OPIC rounds. nodes: (doc_id); edges: (src, dst).

    Per round: hist' = hist + cash; inflow(v) = Σ_{u→v}
    floor(cash(u)/outdeg(u)); pot = Σ cash over dangling nodes;
    cash'(v) = inflow(v) + floor(pot/N). Two shuffles per round
    (attach cash by src, aggregate by dst) plus two one-row broadcast
    aggregates — the PageRank iteration shape, with state one
    (cash, hist) pair per node, never driver-side."""
    outdeg = edges.groupBy("src").agg(
        F.count(F.lit(1)).cast("long").alias("outdeg")
    )
    n_row = nodes.agg(F.count(F.lit(1)).cast("long").alias("n_nodes"))
    state = nodes.join(
        outdeg.withColumnRenamed("src", "doc_id"), "doc_id", "left"
    ).select(
        "doc_id",
        "outdeg",
        F.lit(OPIC_SCALE).cast("long").alias("cash"),
        F.lit(0).cast("long").alias("hist"),
    )
    for _ in range(iters):
        pot = state.filter(F.col("outdeg").isNull()).agg(
            F.coalesce(F.sum("cash"), F.lit(0)).cast("long").alias("pot")
        )
        inflow = (
            edges.join(
                state.select(
                    F.col("doc_id").alias("src"),
                    "cash",
                    F.col("outdeg").alias("od"),
                ),
                "src",
            )
            .select("dst", _wide_floordiv(F.col("cash"), F.col("od")).alias("c"))
            .groupBy("dst")
            .agg(F.sum("c").cast("long").alias("s"))
        )
        state = (
            state.join(inflow.withColumnRenamed("dst", "doc_id"), "doc_id", "left")
            .crossJoin(F.broadcast(pot))
            .crossJoin(F.broadcast(n_row))
            .select(
                "doc_id",
                "outdeg",
                (
                    F.coalesce(F.col("s"), F.lit(0).cast("long"))
                    + _wide_floordiv(F.col("pot"), F.col("n_nodes"))
                ).alias("cash"),
                (F.col("hist") + F.col("cash")).alias("hist"),
            )
        )
    return state.select(
        "doc_id",
        "cash",
        "hist",
        (F.col("cash") + F.col("hist")).alias("importance"),
    )


def q_opic_importance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """OPIC over the synthesized doc link graph with planted dangling
    pages: (doc_id, cash, hist, importance) after OPIC_ITERS
    synchronous cash-distribution rounds — the crawl-native running
    importance estimate (usable mid-crawl, unlike converged PageRank).

    Scale shape: PageRank's — per round the wide data is (long, long)
    edge/cash rows shuffled by src then dst; the dangling pot and the
    node count are one-row broadcast aggregates. Exact integer math
    end to end."""
    docs = load(spark, sf_dir, "documents").select("doc_id")
    edges = link_edges(docs).filter(
        F.col("src") % OPIC_DANGLE_MOD != 0
    )
    return opic_scores(docs, edges)


# --- co-citation similarity ----------------------------------------------------
# Related-page discovery from pure link structure (Small, JASIS 1973;
# the "related:" operator's classic signal): two pages are similar
# when many pages link to BOTH. Needs no content, so a frontier can
# suggest related fetch targets before fetching either page.
#
# Scale shape: pairs form WITHIN each citing page's out-link list, so
# the quadratic blowup is bounded by the out-degree cap — each citing
# page contributes C(min(outdeg, COCIT_CAP), 2) pairs, never N².
# The cap keeps link-farm hubs (the pages with pathological out-
# degree) from dominating: out-links rank deterministically by dst
# and overflow drops, same hygiene as the phash hot-bucket cap, and
# the oracle applies the identical cap. Two shuffles: the capped
# rank window (keyed by src) and the pair-count groupBy (keyed by
# the (a, b) pair). Only pairs co-cited ≥ COCIT_MIN survive.

COCIT_CAP = 8  # out-links per citing page that may form pairs
COCIT_MIN = 2  # co-citation count floor for a reported pair


def q_cocitation_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(a, b, n_cocited): page pairs (a < b) co-cited by at least
    COCIT_MIN distinct citing pages, out-links capped at COCIT_CAP
    per citer (rank by dst, overflow dropped — deterministic)."""
    from pyspark.sql import Window

    docs = load(spark, sf_dir, "documents").select("doc_id")
    edges = link_edges(docs)
    w = Window.partitionBy("src").orderBy("dst")
    capped = (
        edges.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= COCIT_CAP)
        .drop("rk")
    )
    lists = capped.groupBy("src").agg(
        F.sort_array(F.collect_list("dst")).alias("ds")
    )
    pairs = lists.select(
        F.explode(
            F.flatten(
                F.transform(
                    F.sequence(F.lit(1), F.size("ds") - 1),
                    lambda i: F.transform(
                        F.slice(F.col("ds"), i + 1, F.size("ds")),
                        lambda d: F.struct(
                            F.element_at(F.col("ds"), i).alias("a"),
                            d.alias("b"),
                        ),
                    ),
                )
            )
        ).alias("p")
    ).select(F.col("p.a").alias("a"), F.col("p.b").alias("b"))
    return (
        pairs.groupBy("a", "b")
        .agg(F.count(F.lit(1)).cast("long").alias("n_cocited"))
        .filter(F.col("n_cocited") >= COCIT_MIN)
    )


# --- TrustRank ------------------------------------------------------------------
# Gyöngyi, Garcia-Molina & Pedersen, VLDB 2004 ("Combating Web Spam
# with TrustRank"): PageRank's uniform teleport rewards link farms —
# every page, spam included, receives free rank each round. TrustRank
# replaces the teleport with a biased jump onto a small hand-vetted
# seed set, so trust flows outward from the seeds along out-links and
# ATTENUATES with link distance; a farm no trusted page links into
# can only collect what leaks in through organic edges, never mint its
# own. This completes the repo's link-analysis family: PageRank (raw
# authority), HITS (hubs/authorities), OPIC (online importance),
# reciprocity (structural farm flag), and now the seeded-propagation
# spam demotion those four motivate.
#
# The seed set is deterministic for the oracle: doc_id % TR_SEED_MOD
# == 1 AND NOT a planted-farm node (the vetting step — a human
# reviewer would never bless a farm page). The edge table is the same
# combined organic-LCG ∪ farm-ring graph as q_link_reciprocity, so the
# planted farm exists in the walk but receives zero seed mass.
#
# Determinism: identical integer discipline to pagerank_ranks — trust
# is integer mass (TR_SCALE per seed at t=0), the out-degree split and
# the 0.85 damping go through exact wide floor-division, and the
# teleport is a constant added only on seed rows, so both engines
# produce bit-identical longs at any SF. Scale shape is PageRank's:
# the edges⋈outdeg side is invariant (localCheckpointed once) and each
# round costs exactly two shuffles over (long, long) rows — a
# 10^10-edge graph iterates in O(TR_ITERS) shuffle rounds with one
# long of state per node, never driver-side.

TR_ITERS = 3  # fixed unrolled rounds (oracle mirrors each level)
TR_SCALE = 1_000_000_000  # integer trust units per seed at t=0
TR_TELEPORT = 150_000_000  # 15% re-seeded onto each seed per round
TR_SEED_MOD = 29  # doc_id % 29 == 1 → ~3.4% of pages are vetted seeds


def _tr_seed(doc_id: Column) -> Column:
    """The vetted-seed predicate: a deterministic sample of the node
    set minus every planted-farm page (vetting excludes spam)."""
    return (doc_id % TR_SEED_MOD == 1) & (doc_id % FARM_MOD != 0)


def q_trustrank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, is_seed, is_farm, trust) after TR_ITERS seeded damped
    propagation rounds over the combined organic ∪ farm-ring graph.
    Farm pages appear with the trust that organically leaks into them
    — the demotion signal a frontier would ORDER BY alongside pr."""
    docs = load(spark, sf_dir, "documents").select("doc_id")
    nodes = docs.select("doc_id", _tr_seed(F.col("doc_id")).alias("is_seed"))
    edges = (
        link_edges(docs)
        .select("src", "dst")
        .unionByName(farm_edges(docs))
        .distinct()
    )
    outdeg = edges.groupBy("src").agg(
        F.count(F.lit(1)).cast("long").alias("outdeg")
    )
    # invariant across rounds — computed once, reused by every level
    edeg = edges.join(outdeg, "src").localCheckpoint(eager=False)
    trust = nodes.select(
        "doc_id",
        "is_seed",
        F.when(F.col("is_seed"), F.lit(TR_SCALE))
        .otherwise(F.lit(0))
        .cast("long")
        .alias("trust"),
    )
    for _ in range(TR_ITERS):
        contrib = edeg.join(
            trust.select(F.col("doc_id").alias("src"), "trust"), "src"
        ).select("dst", _wide_floordiv(F.col("trust"), F.col("outdeg")).alias("c"))
        sums = contrib.groupBy("dst").agg(F.sum("c").alias("s"))
        trust = (
            nodes.join(sums.withColumnRenamed("dst", "doc_id"), "doc_id", "left")
            .select(
                "doc_id",
                "is_seed",
                (
                    _mul_floordiv_wide(
                        F.coalesce(F.col("s"), F.lit(0).cast("long")),
                        F.lit(85).cast("long"),
                        F.lit(100).cast("long"),
                    )
                    + F.when(F.col("is_seed"), F.lit(TR_TELEPORT))
                    .otherwise(F.lit(0))
                    .cast("long")
                ).alias("trust"),
            )
        )
    return trust.select(
        "doc_id",
        "is_seed",
        (F.col("doc_id") % FARM_MOD == 0).alias("is_farm"),
        "trust",
    )


# --- host-graph rank --------------------------------------------------------------
# Eiron, McCurley & Tomlin, WWW 2004 ("Ranking the Web Frontier"):
# most of a crawl's frontier is UNCRAWLED, so page-level PageRank
# can't score it — but every pending URL has a host, and rank computed
# on the host supergraph (hosts as nodes, inter-host links as edges)
# transfers to unseen pages on known hosts. This is the frontier-
# priority signal the page-level q_link_pagerank cannot provide for
# never-fetched URLs, and the host graph is ~3 orders of magnitude
# smaller than the page graph, so the iteration cost collapses.
#
# The page→host map is a contiguous block assignment (doc_id //
# HOST_BLOCK — both engines floor-divide exactly); host edges are the
# LCG page edges contracted to host pairs with intra-host links
# dropped (Eiron et al. discard self-edges: they carry no inter-site
# endorsement). The rank itself is the repo's integer-exact PageRank
# (pagerank_ranks) run unchanged on the contracted graph — same
# 2-shuffles-per-round shape, but over host-cardinality rows.

HOST_BLOCK = 50  # pages per synthetic host (doc_id // 50 → host_id)


def q_host_graph_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(host_id, n_pages, pr) after PR_ITERS integer PageRank rounds
    over the contracted host supergraph — the priority a frontier
    assigns to an uncrawled URL via its host."""
    from go_crawler_spark.functions.textstats import _floordiv

    docs = load(spark, sf_dir, "documents").select("doc_id")
    block = F.lit(HOST_BLOCK).cast("long")
    hosts = (
        docs.select(_floordiv(F.col("doc_id"), block).alias("doc_id"))
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).cast("long").alias("n_pages"))
    )
    hedges = (
        link_edges(docs)
        .select(
            _floordiv(F.col("src"), block).alias("src"),
            _floordiv(F.col("dst"), block).alias("dst"),
        )
        .filter(F.col("src") != F.col("dst"))
        .distinct()
    )
    ranks = pagerank_ranks(hosts.select("doc_id"), hedges)
    return (
        hosts.join(ranks, "doc_id")
        .select(F.col("doc_id").alias("host_id"), "n_pages", "pr")
    )


# --- focused-crawl frontier scoring ----------------------------------------------
# Chakrabarti, van den Berg & Dom, WWW 1999 ("Focused crawling: a new
# approach to topic-specific Web resource discovery"): a focused
# crawler prioritizes frontier URLs by topical evidence available
# BEFORE the fetch — the relevance of the pages that link to them
# (the classifier signal) and of the anchor text on those links (the
# link-local signal). Both are per-inbound-edge signals aggregated at
# the target, so the operator is one map-side derivation plus one
# partial-aggregated groupBy(dst) — a single shuffle keyed on the
# 8-byte target id at any graph size.
#
# Synthesis: the shared LCG edge table; anchor class src % ANCHOR_MOD
# (as in q_anchor_text_topk) with classes < FOCUS_TOPIC_ANCHORS
# on-topic; parent pages with src % FOCUS_PAGE_MOD < FOCUS_PAGE_TOPICAL
# topical (a stand-in for the parent classifier verdict). The priority
# blends the two at 60/40 per Chakrabarti's hard-focus emphasis on
# link-local evidence, normalized by in-degree, in exact integer ppm
# (wide multiply — no int64 overflow at any in-degree, ADVICE-r4
# discipline).

FOCUS_TOPIC_ANCHORS = 3  # anchor classes 0-2 of ANCHOR_MOD are on-topic
FOCUS_PAGE_MOD = 5
FOCUS_PAGE_TOPICAL = 2  # src % 5 in {0,1} → parent classifier says topical
FOCUS_W_ANCHOR = 6  # 60% weight on the anchor signal ...
FOCUS_W_PARENT = 4  # ... 40% on the parent-page signal (×100000 → ppm)
FOCUS_PRIORITY_MIN = 300_000  # dequeue-next gate


def q_focused_frontier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(dst, n_inlinks, n_topic_anchors, n_topic_parents, priority_ppm,
    crawl_next) — the focused-crawl dequeue score for every link
    target, from inbound-edge evidence only (no fetch needed)."""
    docs = load(spark, sf_dir, "documents").select("doc_id")
    edges = link_edges(docs)
    scored = edges.select(
        "dst",
        (F.col("src") % ANCHOR_MOD < FOCUS_TOPIC_ANCHORS)
        .cast("long")
        .alias("topic_anchor"),
        (F.col("src") % FOCUS_PAGE_MOD < FOCUS_PAGE_TOPICAL)
        .cast("long")
        .alias("topic_parent"),
    )
    agg = scored.groupBy("dst").agg(
        F.count(F.lit(1)).cast("long").alias("n_inlinks"),
        F.sum("topic_anchor").cast("long").alias("n_topic_anchors"),
        F.sum("topic_parent").cast("long").alias("n_topic_parents"),
    )
    prio = _mul_floordiv_wide(
        F.col("n_topic_anchors") * FOCUS_W_ANCHOR
        + F.col("n_topic_parents") * FOCUS_W_PARENT,
        F.lit(100_000).cast("long"),
        F.col("n_inlinks"),
    )
    return agg.select(
        "dst",
        "n_inlinks",
        "n_topic_anchors",
        "n_topic_parents",
        prio.alias("priority_ppm"),
        (prio >= FOCUS_PRIORITY_MIN).alias("crawl_next"),
    )


# --- BFS crawl depth ---------------------------------------------------------------
# Najork & Wiener, WWW 2001 ("Breadth-first crawling yields
# high-quality pages"): the breadth-first crawl order is defined by
# each URL's hop distance from the seed set, and the wavefront profile
# (how many new URLs each hop discovers) is what a crawl planner uses
# to budget rounds. This operator computes that quantity exactly:
# first_hop(v) = min hops from any seed, -1 if unreachable within
# DEPTH_MAX.
#
# Shape: set expansion, not rank propagation — each hop is one
# edges⋈frontier equi-join (shuffle keyed on the 8-byte src), a
# DISTINCT, and an anti-join against the seen set; per-hop state is
# (doc_id, hop) longs. DEPTH_MAX unrolled rounds, same O(iters)
# shuffle-round discipline as PageRank. The reference's BFS dequeue
# (crawler.go:606-641) realizes this order one URL at a time; here
# the whole wavefront advances per round.

DEPTH_SEED_MOD = 100  # doc_id ≡ 0 (mod 100) are the seed URLs
DEPTH_MAX = 3  # hops computed; beyond → first_hop = -1


def q_crawl_depth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, is_seed, first_hop) over the synthesized link graph:
    min-hop BFS depth from the seed set, -1 when unreached within
    DEPTH_MAX hops — the breadth-first crawl order as a column."""
    docs = load(spark, sf_dir, "documents").select("doc_id")
    edges = link_edges(docs)
    seeds = docs.filter(F.col("doc_id") % DEPTH_SEED_MOD == 0)
    seen = seeds.select("doc_id", F.lit(0).cast("long").alias("first_hop"))
    frontier = seeds
    for hop in range(1, DEPTH_MAX + 1):
        nxt = (
            edges.join(
                frontier.select(F.col("doc_id").alias("src")), "src"
            )
            .select(F.col("dst").alias("doc_id"))
            .distinct()
            .join(seen.select("doc_id"), "doc_id", "left_anti")
            .select("doc_id", F.lit(hop).cast("long").alias("first_hop"))
            .localCheckpoint(eager=False)
        )
        seen = seen.union(nxt)
        frontier = nxt
    return (
        docs.join(seen, "doc_id", "left")
        .select(
            "doc_id",
            (F.col("doc_id") % DEPTH_SEED_MOD == 0).alias("is_seed"),
            F.coalesce(F.col("first_hop"), F.lit(-1).cast("long")).alias(
                "first_hop"
            ),
        )
    )


# --- redirect-chain resolution -------------------------------------------------
# HTTP 3xx chains alias URLs: until every frontier URL is resolved to
# its terminal target, the URL-seen filter dedupes the alias, not the
# page, and the same document is fetched once per alias. The
# reference never sees this set-wise — Playwright's page.Goto follows
# redirects transparently one URL at a time
# (/root/reference/internal/infra/browser_client.go:100-104), which is
# O(chain length) fetches per URL. At 10^10-frontier scale resolution
# must be a batch operator over the (src → dst) redirect-edge table:
# pointer doubling (Wyllie's list-ranking jump, JáJá §3.1) squares the
# resolved distance per round — ptr ← ptr∘ptr, hops ← hops + hops∘ptr
# — so chains of length ≤ L resolve in ceil(log2 L) self-joins instead
# of L sequential rounds. Each round shuffles three longs per URL
# keyed on the 8-byte ptr; terminals are self-loops with hops 0, so
# the fixpoint is stable and convergence needs no driver-side check.
#
# The synthetic redirect graph: doc ids form blocks of REDIR_BLOCK
# URLs; within block b, chain position pos(r) = (r·5 + b%7) mod 16 is
# a bijection (5 odd), pos 0 is the HTTP-200 terminal, and every
# pos p > 0 URL 301s to the block's pos p−1 URL — chain lengths 0..15,
# phase-shifted per block so the permutation is exercised, not just
# the identity. A block participates only when all REDIR_BLOCK
# members exist in the corpus (decided by a census on the data, so
# ragged tail blocks of any id layout stay terminal). The DuckDB
# oracle never chases pointers: it inverts the permutation
# closed-form (5·13 ≡ 1 mod 16), the independent derivation.

REDIR_BLOCK = 16  # URLs per redirect block; max chain length 15
REDIR_PERM_A = 5  # odd ⇒ r → (r·5 + phase) mod 16 is a bijection
REDIR_PERM_INV = 13  # 5·13 ≡ 1 (mod 16)
REDIR_PHASE_MOD = 7  # per-block phase shift of the permutation
# ceil(log2(max chain 15)) pointer-doubling rounds resolve everything
REDIR_ROUNDS = 4


def redirect_edges(docs: DataFrame) -> DataFrame:
    """Deterministic (src, dst) redirect-edge table over the DISTINCT
    doc-id URL set (a corpus row is an observation, a URL is a node):
    within each FULL block of REDIR_BLOCK consecutive ids, the pos
    p > 0 URL 301s to the pos p−1 URL of the same block. Fullness is
    decided by the data (all REDIR_BLOCK members present), not by an
    id-density assumption, so ragged tail blocks of any id layout stay
    terminal and no edge ever dangles. The block census is a partial
    aggregate on the 8-byte block key. Consumers treat the edges as
    opaque: resolution below never uses this law."""
    docs = docs.select("doc_id").distinct()
    blk = _wide_floordiv(
        F.col("doc_id"), F.lit(REDIR_BLOCK).cast("long")
    )
    full = (
        docs.groupBy(blk.alias("blk"))
        .agg(F.count(F.lit(1)).alias("members"))
        .filter(F.col("members") == REDIR_BLOCK)
        .select("blk")
    )
    r = F.col("doc_id") % REDIR_BLOCK
    phase = F.col("blk") % REDIR_PHASE_MOD
    pos = (r * REDIR_PERM_A + phase) % REDIR_BLOCK
    # parent residue: pos−1 run back through the inverse permutation
    # (+REDIR_BLOCK keeps the argument non-negative before the mod)
    parent_r = (
        (pos - 1 - phase + REDIR_BLOCK) * REDIR_PERM_INV
    ) % REDIR_BLOCK
    return (
        docs.withColumn("blk", blk)
        .join(full, "blk")
        .filter(pos > 0)
        .select(
            F.col("doc_id").alias("src"),
            (F.col("doc_id") - r + parent_r).alias("dst"),
        )
    )


def q_redirect_resolve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, is_terminal, final_url, n_hops) — every URL resolved to
    its terminal (HTTP-200) target through the redirect-edge table by
    pointer doubling: REDIR_ROUNDS self-joins keyed on the 8-byte ptr,
    per-URL state three longs, never a per-row chase. Resolution runs
    over the DISTINCT URL node set (duplicate corpus rows would both
    multiply the pointer joins and shadow the tail-block boundary);
    results join back to every corpus row at the end."""
    rows = load(spark, sf_dir, "documents").select("doc_id")
    docs = rows.distinct()
    edges = redirect_edges(docs)
    state = (
        docs.join(edges, docs["doc_id"] == edges["src"], "left")
        .select(
            docs["doc_id"],
            F.coalesce(edges["dst"], docs["doc_id"]).alias("ptr"),
            F.when(edges["dst"].isNotNull(), F.lit(1))
            .otherwise(F.lit(0))
            .cast("long")
            .alias("hops"),
        )
    )
    for _ in range(REDIR_ROUNDS):
        hop = state.select(
            F.col("doc_id").alias("jump_key"),
            F.col("ptr").alias("jump_ptr"),
            F.col("hops").alias("jump_hops"),
        )
        state = (
            state.join(hop, state["ptr"] == hop["jump_key"])
            .select(
                "doc_id",
                F.col("jump_ptr").alias("ptr"),
                (F.col("hops") + F.col("jump_hops")).alias("hops"),
            )
            .localCheckpoint(eager=False)
        )
    return rows.join(state, "doc_id").select(
        "doc_id",
        (F.col("hops") == 0).alias("is_terminal"),
        F.col("ptr").alias("final_url"),
        F.col("hops").alias("n_hops"),
    )
