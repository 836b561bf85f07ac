"""DuckDB oracle SQL — one ANSI-SQL equivalent per driver-contract
query (see __spark_entry__.py). Each string runs on pre-registered
views: region nation customer supplier part orders lineitem events
documents embeddings.

Parity discipline (the driver hash-compares values):
- every aggregate / computed column is aliased identically to the
  Spark query;
- counts / sums of ints are CAST to BIGINT (DuckDB sums ints to
  HUGEINT, Spark to long);
- double expressions replicate the Spark computation **in the same
  operation order** (fold-left for array math) so IEEE results are
  bit-identical, then round to a fixed number of decimals;
- casts double→int go through round() on both sides (Spark cast
  truncates, DuckDB cast rounds — never rely on a bare cast).
"""

from __future__ import annotations

from go_crawler_spark.functions.similarity import (
    ANN_DIM,
    ANN_LSH_BITS,
    LSH_BANDS,
    LSH_MAX_BUCKET,
    LSH_ROWS,
    MINHASH_PERMS,
    NEARDUP_CC_DEN,
    NEARDUP_CC_NUM,
    P31,
)

# --- shared SQL fragments ---------------------------------------------------

# polynomial rolling hash fold over a string s (must mirror
# functions/similarity.py::poly_hash exactly: fold-left, acc*31+ord, mod P31)
def _poly_hash_sql(s: str) -> str:
    return (
        f"list_reduce(list_prepend(CAST(0 AS BIGINT), "
        f"list_transform(string_split({s}, ''), c -> CAST(ord(c) AS BIGINT))), "
        f"(acc, c) -> (acc * 31 + c) % {P31})"
    )


_TOKENS = r"list_filter(regexp_split_to_array(trim({col}), '\s+'), t -> t <> '')"

_EN = "['the','a','of','and','to','in','is','that','for','it']"
_DE = "['der','die','das','und','ist','nicht','ein','zu']"
_FR = "['le','la','les','et','est','un','une','que']"
_ES = "['el','la','los','y','es','un','una','que']"

# double dot-product fold matching functions/similarity.py::dot_double
def _dot_sql(a: str, b: str) -> str:
    return (
        f"list_reduce(list_prepend(0.0, list_transform("
        f"generate_series(1, len({a})), "
        f"i -> CAST({a}[i] AS DOUBLE) * CAST({b}[i] AS DOUBLE))), (acc, v) -> acc + v)"
    )


def _norm_sql(a: str) -> str:
    return (
        f"sqrt(list_reduce(list_prepend(0.0, list_transform({a}, "
        f"x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))), (acc, v) -> acc + v))"
    )


# --- relational family -------------------------------------------------------

PRICING_SUMMARY = """
SELECT l_returnflag, l_linestatus,
       round(sum(l_quantity), 2)                               AS sum_qty,
       round(sum(l_extendedprice), 2)                          AS sum_base_price,
       round(sum(l_extendedprice * (1 - l_discount)), 2)       AS sum_disc_price,
       round(avg(l_quantity), 4)                               AS avg_qty,
       round(avg(l_discount), 4)                               AS avg_disc,
       CAST(count(*) AS BIGINT)                                AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
GROUP BY l_returnflag, l_linestatus
"""

DEDUPE_ANTI_JOIN = """
SELECT o_orderkey, o_custkey
FROM orders o
WHERE NOT EXISTS (
  SELECT 1 FROM customer c
  WHERE c.c_mktsegment = 'BUILDING' AND c.c_custkey = o.o_custkey)
"""

DEDUPE_FIRST_WRITER_WINS = """
SELECT dup_key,
       CAST(min(doc_id) AS BIGINT) AS keeper_id,
       CAST(count(*) AS BIGINT)    AS dup_count
FROM (SELECT doc_id,
             array_to_string(string_split(text, ' ')[1:5], ' ') AS dup_key
      FROM documents)
GROUP BY dup_key
"""

POLITENESS_TOPK = """
SELECT user_id, event_id, rn
FROM (SELECT user_id, event_id,
             CAST(row_number() OVER (
               PARTITION BY user_id ORDER BY value DESC, event_id ASC) AS BIGINT) AS rn
      FROM events)
WHERE rn <= 3
"""

UNION_DISTINCT = """
SELECT c_nationkey AS nationkey FROM customer
UNION
SELECT s_nationkey AS nationkey FROM supplier
"""

METRICS_ROLLUP = """
SELECT event_type,
       CAST(count(*) AS BIGINT) AS n_events,
       CAST(sum(CASE WHEN value > 5.0 THEN 1 ELSE 0 END) AS BIGINT) AS n_high,
       round(avg(value), 4) AS avg_value,
       round(max(value), 2) AS max_value
FROM events
GROUP BY event_type
"""

BROADCAST_DIM_JOIN = """
SELECT n_name,
       round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
       CAST(count(*) AS BIGINT) AS n_lineitems
FROM lineitem
JOIN orders   ON l_orderkey = o_orderkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN customer ON o_custkey = c_custkey AND c_nationkey = s_nationkey
JOIN nation   ON s_nationkey = n_nationkey
JOIN region   ON n_regionkey = r_regionkey
WHERE r_name = 'ASIA'
GROUP BY n_name
"""

PAGINATION_EXPAND = """
SELECT p_partkey,
       CAST(page_no AS BIGINT) AS page_no,
       printf('https://jobs.example.com/search/%d?p=%d', p_partkey, page_no) AS page_url
FROM (SELECT p_partkey,
             unnest(generate_series(1, CAST(ceil(p_size / 10.0) AS INT))) AS page_no
      FROM part)
"""

SESSIONIZE = """
WITH flagged AS (
  SELECT user_id, ts, event_id,
         CASE WHEN CAST(floor(epoch(ts)) AS BIGINT)
                   - lag(CAST(floor(epoch(ts)) AS BIGINT)) OVER w > 1800
              THEN 1 ELSE 0 END AS new_sess
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
),
sess AS (
  SELECT user_id,
         sum(new_sess) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS sess_id
  FROM flagged
)
SELECT user_id,
       CAST(max(sess_id) + 1 AS BIGINT) AS n_sessions,
       CAST(count(*) AS BIGINT)         AS n_events
FROM sess
GROUP BY user_id
"""

# Mirrors relational.q_asof_join — DuckDB's NATIVE ASOF LEFT JOIN is the
# independent derivation of the Spark union-window composition.
ASOF_JOIN = """
WITH ev AS (
  SELECT event_id, user_id, event_type,
         CAST(epoch_us(ts) AS BIGINT) AS us
  FROM events),
clicks AS (
  SELECT event_id AS click_id, user_id, us AS ts_us
  FROM ev WHERE event_type = 'click'),
views AS (
  SELECT event_id AS view_id, user_id, us FROM ev WHERE event_type = 'view')
SELECT c.click_id, c.user_id, c.ts_us,
       v.view_id                        AS asof_view_id,
       CAST(c.ts_us - v.us AS BIGINT)   AS lag_us
FROM clicks c ASOF LEFT JOIN views v
  ON c.user_id = v.user_id AND c.ts_us >= v.us
"""

# Mirrors relational.q_range_join — the oracle is the plain inequality
# join (fine at oracle scale; the Spark side must NOT plan this shape).
RANGE_JOIN = """
WITH ev AS (
  SELECT event_id, event_type, CAST(epoch_us(ts) AS BIGINT) AS us
  FROM events),
wins AS (
  SELECT event_id AS win_id, us AS start_us,
         us + (event_id % 10 + 1) * 60000000 AS end_us
  FROM ev WHERE event_type = 'error'),
clicks AS (
  SELECT event_id AS click_id, us AS click_us
  FROM ev WHERE event_type = 'click')
SELECT w.win_id, c.click_id,
       CAST(c.click_us - w.start_us AS BIGINT) AS offset_us
FROM clicks c JOIN wins w
  ON c.click_us >= w.start_us AND c.click_us < w.end_us
"""

# --- link-graph family ---------------------------------------------------------
# Mirrors linkgraph.q_link_pagerank: the LCG edge synthesis, out-degree
# split, and 0.85 damping are all integer-exact (HUGEINT // here,
# DECIMAL(38,0) floor-division on the Spark side), so each unrolled
# iteration level reproduces bit-identical BIGINT ranks.


def _pagerank_levels_sql(nodes: str = "documents") -> str:
    """Unrolled damped-update CTE levels over a node table named
    ``nodes`` and edge CTEs named ``edges``/``outdeg`` — shared by the
    page-level LINK_PAGERANK and the contracted HOST_GRAPH_RANK so the
    two oracles can never drift on the rank recurrence itself."""
    from go_crawler_spark.functions.linkgraph import PR_ITERS, PR_TELEPORT

    parts = []
    prev = "r0"
    for i in range(1, PR_ITERS + 1):
        parts.append(
            f"""s{i} AS (
  SELECT e.dst AS doc_id,
         SUM(CAST(CAST(r.pr AS HUGEINT) // od.outdeg AS BIGINT)) AS s
  FROM {prev} r
  JOIN edges e ON e.src = r.doc_id
  JOIN outdeg od ON od.src = e.src
  GROUP BY e.dst),
r{i} AS (
  SELECT d.doc_id,
         CAST({PR_TELEPORT}
              + CAST(CAST(COALESCE(s{i}.s, 0) AS HUGEINT) * 85 // 100 AS BIGINT)
           AS BIGINT) AS pr
  FROM {nodes} d LEFT JOIN s{i} ON s{i}.doc_id = d.doc_id)"""
        )
        prev = f"r{i}"
    return ",\n".join(parts)


def _link_pagerank_sql() -> str:
    from go_crawler_spark.functions.linkgraph import (
        PR_FANOUT,
        PR_ITERS,
        PR_LCG_A,
        PR_LCG_C,
        PR_LCG_K,
        PR_SCALE,
    )

    return f"""
WITH nn AS (SELECT CAST(count(*) AS BIGINT) AS n FROM documents),
cand AS (
  SELECT d.doc_id AS src, nn.n,
         (d.doc_id * {PR_LCG_A} + u.k * {PR_LCG_K} + {PR_LCG_C}) % nn.n AS dst0
  FROM documents d, nn, unnest(generate_series(0, {PR_FANOUT - 1})) AS u(k)),
edges AS (
  SELECT DISTINCT src,
         CASE WHEN dst0 = src THEN (dst0 + 1) % n ELSE dst0 END AS dst
  FROM cand),
outdeg AS (
  SELECT src, CAST(count(*) AS BIGINT) AS outdeg FROM edges GROUP BY src),
r0 AS (SELECT doc_id, CAST({PR_SCALE} AS BIGINT) AS pr FROM documents),
{_pagerank_levels_sql()}
SELECT r.doc_id, od.outdeg, r.pr
FROM r{PR_ITERS} r JOIN outdeg od ON od.src = r.doc_id
"""


LINK_PAGERANK = _link_pagerank_sql()

# Mirrors relational.q_multires_rollup — but derives the day grain
# DIRECTLY from the raw scan (count / sum / count-distinct-buckets),
# independently of the Spark side's minute→hour→day cascade. The
# cascade exists for scale (each coarser grain aggregates the much
# smaller finer grain, not the raw scan); the oracle checks that the
# cascade loses nothing. All integer math: epoch seconds and
# floor-cents, no double ever aggregated.
MULTIRES_ROLLUP = """
WITH base AS (
  SELECT CAST(epoch_us(ts) AS BIGINT) // 1000000 AS sec,
         event_type,
         CAST(floor(value * 100) AS BIGINT) AS cents
  FROM events)
SELECT sec - sec % 86400 AS day, event_type,
       CAST(count(*) AS BIGINT)                       AS n_events,
       CAST(sum(cents) AS BIGINT)                     AS sum_cents,
       CAST(count(DISTINCT sec - sec % 60) AS BIGINT)   AS n_minutes,
       CAST(count(DISTINCT sec - sec % 3600) AS BIGINT) AS n_hours
FROM base GROUP BY 1, 2
"""

# Mirrors sketches.q_hll_distinct — identical hash, register split,
# rank ruler, and literal-for-literal estimator expression; the dyadic
# indicator sum is order-independent in IEEE doubles (see module doc).


def _hll_distinct_sql() -> str:
    from go_crawler_spark.functions.sketches import (
        HLL_M,
        HLL_MIX_A,
        HLL_MIX_B,
        HLL_VALUE_BITS,
    )

    r1 = HLL_VALUE_BITS + 1
    return f"""
WITH keys AS (SELECT CAST(l_orderkey AS VARCHAR) AS k FROM lineitem),
folded AS (SELECT {_poly_hash_sql('k')} AS h0 FROM keys),
hashed AS (SELECT ((h0 * {HLL_MIX_A}) % {P31} * {HLL_MIX_B}) % {P31} AS h
           FROM folded),
regs AS (
  SELECT h % {HLL_M} AS register,
         MAX(CASE WHEN h // {HLL_M} = 0 THEN {r1}
                  ELSE {r1} - length(bin(h // {HLL_M})) END) AS m_rank
  FROM hashed GROUP BY 1),
est AS (
  SELECT CAST({HLL_M} AS INT) AS m,
         CAST({HLL_M} - count(*) AS BIGINT) AS n_zero_registers,
         SUM(power(CAST(2.0 AS DOUBLE), -m_rank))
           + CAST({HLL_M} - count(*) AS DOUBLE) AS indicator_sum
  FROM regs)
SELECT m, n_zero_registers, indicator_sum,
       CAST(0.7213 AS DOUBLE)
         / (CAST(1.0 AS DOUBLE) + CAST(1.079 AS DOUBLE) / CAST({HLL_M} AS DOUBLE))
         * CAST({HLL_M} AS DOUBLE) * CAST({HLL_M} AS DOUBLE) / indicator_sum
         AS raw_estimate,
       (SELECT CAST(count(DISTINCT k) AS BIGINT) FROM keys) AS exact_distinct
FROM est
"""


HLL_DISTINCT = _hll_distinct_sql()

# --- parsing family ----------------------------------------------------------

EXTRACT_TOTAL_COUNT = """
SELECT event_id,
       CAST(NULLIF(replace(regexp_extract(props, '[0-9][0-9,]*', 0), ',', ''), '') AS INT)
         AS total_count
FROM events
"""

DATE_PARSE_MULTIFORMAT = """
WITH rendered AS (
  SELECT o_orderkey,
         CASE CAST(o_orderkey % 4 AS INT)
           WHEN 0 THEN strftime(o_orderdate, '%Y年%m月%d日')
           WHEN 1 THEN strftime(o_orderdate, '%Y/%m/%d')
           WHEN 2 THEN strftime(o_orderdate, '%Y-%m-%d')
           ELSE        strftime(o_orderdate, '%Y.%m.%d')
         END AS posted_at_raw
  FROM orders)
SELECT o_orderkey, posted_at_raw,
       strftime(COALESCE(
         try_strptime(posted_at_raw, '%Y年%m月%d日'),
         try_strptime(posted_at_raw, '%Y/%m/%d'),
         try_strptime(posted_at_raw, '%Y-%m-%d'),
         try_strptime(posted_at_raw, '%Y.%m.%d')), '%Y-%m-%d') AS posted_at
FROM rendered
"""

CLASSIFIER_LADDER = """
SELECT p_partkey,
       CASE WHEN contains(p_type, 'ECONOMY')  THEN 'economy'
            WHEN contains(p_type, 'STANDARD') THEN 'standard'
            WHEN contains(p_type, 'MEDIUM')   THEN 'medium'
            WHEN contains(p_type, 'PROMO')    THEN 'promo'
            WHEN contains(p_type, 'LARGE')    THEN 'large'
            WHEN contains(p_type, 'SMALL')    THEN 'small'
            ELSE 'unknown' END AS type_class
FROM part
"""

_NUM_RE = r"(\d+(?:\.\d+)?)"

AMOUNT_PARSE = f"""
WITH rendered AS (
  SELECT p_partkey,
         CASE CAST(p_partkey % 4 AS INT)
           WHEN 0 THEN '月給' || CAST(p_size AS VARCHAR) || '万円'
           WHEN 1 THEN CAST(p_size AS VARCHAR) || '千円'
           WHEN 2 THEN '年収0.' || CAST(p_size % 10 AS VARCHAR) || '億円'
           ELSE        '時給 ' || CAST(p_size * 13 AS VARCHAR) || '円'
         END AS salary_raw
  FROM part)
SELECT p_partkey, salary_raw,
       CAST(CASE
         WHEN contains(salary_raw, '億') AND regexp_extract(salary_raw, '{_NUM_RE}', 1) <> ''
           THEN round(CAST(regexp_extract(salary_raw, '{_NUM_RE}', 1) AS DOUBLE) * 100000000, 0)
         WHEN contains(salary_raw, '万') AND regexp_extract(salary_raw, '{_NUM_RE}', 1) <> ''
           THEN round(CAST(regexp_extract(salary_raw, '{_NUM_RE}', 1) AS DOUBLE) * 10000, 0)
         WHEN contains(salary_raw, '千') AND regexp_extract(salary_raw, '{_NUM_RE}', 1) <> ''
           THEN round(CAST(regexp_extract(salary_raw, '{_NUM_RE}', 1) AS DOUBLE) * 1000, 0)
         ELSE CAST(NULLIF(regexp_replace(salary_raw, '[^0-9]', '', 'g'), '') AS DOUBLE)
       END AS BIGINT) AS amount_yen
FROM rendered
"""

OPTIONAL_UINT = """
SELECT event_id,
       CAST(NULLIF(regexp_replace(props, '[^0-9]', '', 'g'), '') AS BIGINT) AS holidays
FROM events
"""

# --- textstats family --------------------------------------------------------

_TOK = _TOKENS.format(col="text")
_TOK_LOWER = _TOKENS.format(col="lower(text)")

TOKEN_COUNT = f"""
SELECT doc_id, CAST(len({_TOK}) AS BIGINT) AS n_tokens
FROM documents
"""

QUALITY_SCORE = f"""
WITH t AS (
  SELECT doc_id,
         CAST(len({_TOK}) AS BIGINT) AS n_tok,
         CAST(length(text) AS BIGINT) AS n_chars,
         CAST(length(regexp_replace(text, '[^.,!?;:]', '', 'g')) AS BIGINT) AS punct,
         CAST(len(list_filter({_TOK_LOWER}, x -> list_contains({_EN}, x))) AS BIGINT) AS sw
  FROM documents)
SELECT doc_id,
       CAST(least(40, CAST((n_tok * 40 - (n_tok * 40) % 50) / 50 AS BIGINT))
          + (CASE WHEN n_chars > 0
                  THEN greatest(0, 30 - CAST((punct * 150 - (punct * 150) % n_chars) / n_chars AS BIGINT))
                  ELSE 30 END)
          + (CASE WHEN n_tok > 0
                  THEN least(30, CAST((sw * 150 - (sw * 150) % n_tok) / n_tok AS BIGINT))
                  ELSE 0 END) AS BIGINT) AS quality
FROM t
"""

LANG_ID = f"""
WITH c AS (
  SELECT doc_id,
         len(list_filter({_TOK_LOWER}, x -> list_contains({_EN}, x))) AS en,
         len(list_filter({_TOK_LOWER}, x -> list_contains({_DE}, x))) AS de,
         len(list_filter({_TOK_LOWER}, x -> list_contains({_FR}, x))) AS fr,
         len(list_filter({_TOK_LOWER}, x -> list_contains({_ES}, x))) AS es
  FROM documents)
SELECT doc_id,
       CASE WHEN greatest(en, de, fr, es) = 0 THEN 'other'
            WHEN en = greatest(en, de, fr, es) THEN 'en'
            WHEN de = greatest(en, de, fr, es) THEN 'de'
            WHEN fr = greatest(en, de, fr, es) THEN 'fr'
            ELSE 'es' END AS lang_pred
FROM c
"""

FINGERPRINT = f"""
SELECT doc_id, {_poly_hash_sql('text')} AS fingerprint
FROM documents
"""

# --- similarity family -------------------------------------------------------

NGRAM_JACCARD_PAIRS = f"""
WITH toks AS (
  SELECT doc_id, {_TOK} AS ts FROM documents),
sh AS (
  SELECT doc_id,
         list_distinct(list_transform(
           CASE WHEN len(ts) - 2 > 0
                THEN list_transform(generate_series(1, len(ts) - 2),
                                    i -> array_to_string(ts[i:i+2], ' '))
                ELSE [] END,
           s -> {_poly_hash_sql('s')})) AS hs
  FROM toks)
SELECT a.doc_id AS doc_id,
       a.doc_id + 1 AS doc_id_next,
       round(CASE WHEN len(list_distinct(a.hs || b.hs)) > 0
                  THEN len(list_intersect(a.hs, b.hs)) / len(list_distinct(a.hs || b.hs))
                  ELSE 0.0 END, 4) AS jaccard3
FROM sh a JOIN sh b ON b.doc_id = a.doc_id + 1
"""


def _minhash_sig_sql() -> str:
    entries = ", ".join(
        f"list_min(list_transform(hs, h -> (h * {a} + {b}) % {P31}))"
        for (a, b) in MINHASH_PERMS
    )
    return f"[{entries}]"


# shared CTE chain: tokens → minhash sig → LSH bands → hot-bucket cap →
# candidate pairs (reused by MINHASH_LSH_CANDIDATES and NEARDUP_COMPONENTS
# so the two oracles can never drift apart)
_MINHASH_CAND_CTES = f"""toks AS (
  SELECT doc_id, list_distinct({_TOK}) AS ts FROM documents),
th AS (
  SELECT doc_id, list_transform(ts, t -> {_poly_hash_sql('t')}) AS hs
  FROM toks WHERE len(ts) > 0),
sig AS (
  SELECT doc_id, {_minhash_sig_sql()} AS sig FROM th),
bands AS (
  SELECT doc_id, band_id,
         array_to_string(list_transform(
           sig[band_id * {LSH_ROWS} + 1 : band_id * {LSH_ROWS} + {LSH_ROWS}],
           v -> CAST(v AS VARCHAR)), '-') AS band_key
  FROM sig, unnest(generate_series(0, {LSH_BANDS - 1})) AS u(band_id)),
capped AS (
  -- hot-bucket guard, same rule as q_minhash_lsh_candidates: a bucket
  -- with more than LSH_MAX_BUCKET docs is dropped before the self-join
  SELECT doc_id, band_id, band_key FROM bands
  QUALIFY count(*) OVER (PARTITION BY band_id, band_key) <= {LSH_MAX_BUCKET}),
cand AS (
  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
  FROM capped a JOIN capped b
    ON a.band_id = b.band_id AND a.band_key = b.band_key
       AND a.doc_id < b.doc_id)"""

MINHASH_LSH_CANDIDATES = f"""
WITH {_MINHASH_CAND_CTES}
SELECT doc_a, doc_b FROM cand
"""

# full candidate→edge→component chain (reused by NEARDUP_COMPONENTS and
# CORPUS_KEEP so the composed corpus gate can never drift from the
# standalone clustering oracle)
_NEARDUP_COMP_CTES = f"""{_MINHASH_CAND_CTES},
stoks AS (
  SELECT doc_id, {_TOK} AS ts FROM documents),
shc AS (
  SELECT doc_id,
         list_distinct(list_transform(
           CASE WHEN len(ts) - 2 > 0
                THEN list_transform(generate_series(1, len(ts) - 2),
                                    i -> array_to_string(ts[i:i+2], ' '))
                ELSE [] END,
           s -> {_poly_hash_sql('s')})) AS hs
  FROM stoks),
edges AS (
  -- exact rational Jaccard gate, same integer compare as neardup_edges
  SELECT c.doc_a AS u, c.doc_b AS v
  FROM cand c
  JOIN shc a ON a.doc_id = c.doc_a
  JOIN shc b ON b.doc_id = c.doc_b
  WHERE len(list_distinct(a.hs || b.hs)) > 0
    AND len(list_intersect(a.hs, b.hs)) * {NEARDUP_CC_DEN}
        >= len(list_distinct(a.hs || b.hs)) * {NEARDUP_CC_NUM}),
sym AS (
  SELECT u, v FROM edges UNION SELECT v AS u, u AS v FROM edges),
reach AS (
  SELECT DISTINCT u AS node, u AS r FROM sym
  UNION
  SELECT s.v AS node, reach.r FROM reach JOIN sym s ON s.u = reach.node),
comp AS (
  SELECT node AS doc_id, MIN(r) AS component FROM reach GROUP BY node)"""

NEARDUP_COMPONENTS = f"""
WITH RECURSIVE {_NEARDUP_COMP_CTES}
SELECT d.doc_id,
       COALESCE(c.component, d.doc_id) AS component,
       COALESCE(c.component, d.doc_id) = d.doc_id AS is_canonical
FROM documents d LEFT JOIN comp c ON c.doc_id = d.doc_id
"""


def _simhash_sql() -> str:
    terms = " + ".join(
        f"CASE WHEN COALESCE(list_sum(list_transform(hs, "
        f"h -> CASE WHEN (h >> {bit}) & 1 = 1 THEN 1 ELSE -1 END)), 0) > 0 "
        f"THEN CAST({2 ** bit} AS BIGINT) ELSE CAST(0 AS BIGINT) END"
        for bit in range(32)
    )
    return terms


SIMHASH = f"""
WITH toks AS (
  SELECT doc_id, list_distinct({_TOK}) AS ts FROM documents),
th AS (
  SELECT doc_id, list_transform(ts, t -> {_poly_hash_sql('t')}) AS hs
  FROM toks)
SELECT doc_id, CAST({_simhash_sql()} AS BIGINT) AS simhash
FROM th
"""

from go_crawler_spark.functions.similarity import (  # noqa: E402
    NEARDUP_BITS,
    NEARDUP_DUP_OFFSET,
    NEARDUP_TABLES,
    NEARDUP_THRESHOLD,
)

# Multi-table sign-LSH near-dup (mirror of q_embedding_neardup): planted
# perturbed copies, T×B hyperplane signs, (tbl, bucket) candidate join,
# exact cosine rerank. Hyperplane k regenerated from the same integer
# formula; all double folds in the same left-to-right order.
EMBEDDING_NEARDUP = f"""
WITH base AS (
  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS embedding
  FROM embeddings),
dups AS (
  SELECT orig + {NEARDUP_DUP_OFFSET} AS vec_id,
         list_transform(generate_series(0, {ANN_DIM - 1}),
           i -> CAST(emb[i + 1] AS DOUBLE)
                + CAST((orig * 31 + i) % 7 - 3 AS DOUBLE) * 0.002) AS embedding
  FROM (SELECT vec_id AS orig, embedding AS emb
        FROM embeddings WHERE vec_id % 10 = 7)),
corpus AS (
  SELECT * FROM base UNION ALL SELECT * FROM dups),
signs AS (
  SELECT vec_id,
         list_transform(generate_series(0, {NEARDUP_TABLES * NEARDUP_BITS - 1}),
           k -> CASE WHEN list_reduce(list_prepend(0.0,
                  list_transform(generate_series(1, 64),
                    i -> embedding[i] *
                         CAST((k * 8191 + (i - 1) * 127 + 13) % 2003 - 1001
                              AS DOUBLE))),
                  (acc, v) -> acc + v) >= 0 THEN 1 ELSE 0 END) AS s
  FROM corpus),
keyed AS (
  SELECT vec_id, tbl,
         CAST(list_sum(list_transform(generate_series(1, {NEARDUP_BITS}),
           b -> s[tbl * {NEARDUP_BITS} + b] * (1 << (b - 1)))) AS BIGINT) AS bucket
  FROM signs, unnest(generate_series(0, {NEARDUP_TABLES - 1})) AS u(tbl)),
cand AS (
  SELECT DISTINCT a.vec_id AS vec_a, b.vec_id AS vec_b
  FROM keyed a JOIN keyed b
    ON a.tbl = b.tbl AND a.bucket = b.bucket AND a.vec_id < b.vec_id),
e AS (
  SELECT vec_id, embedding, {_norm_sql('embedding')} AS nrm FROM corpus)
SELECT vec_a, vec_b, cos_sim FROM (
  SELECT c.vec_a, c.vec_b,
         round({_dot_sql('ea.embedding', 'eb.embedding')} / (ea.nrm * eb.nrm), 6)
           AS cos_sim
  FROM cand c
  JOIN e ea ON ea.vec_id = c.vec_a
  JOIN e eb ON eb.vec_id = c.vec_b)
WHERE cos_sim >= {NEARDUP_THRESHOLD}
"""

ANN_COSINE_TOPK = f"""
WITH e AS (
  SELECT vec_id, embedding, {_norm_sql('embedding')} AS nrm FROM embeddings),
q AS (
  SELECT vec_id AS query_id, embedding AS qvec, nrm AS qnrm
  FROM e WHERE vec_id % 100 = 0),
scored AS (
  SELECT q.query_id, e.vec_id AS neighbor_id,
         round({_dot_sql('q.qvec', 'e.embedding')} / (q.qnrm * e.nrm), 6) AS cos_sim
  FROM e CROSS JOIN q WHERE e.vec_id <> q.query_id)
SELECT query_id, neighbor_id, cos_sim, rank FROM (
  SELECT *, CAST(row_number() OVER (
    PARTITION BY query_id ORDER BY cos_sim DESC, neighbor_id ASC) AS BIGINT) AS rank
  FROM scored)
WHERE rank <= 5
"""

# --- scraper extraction family (E8-E10, E15-E16) -----------------------------

from go_crawler_spark.functions.extraction import (  # noqa: E402
    BENEFIT_KEYWORDS,
    BONUS_PATTERNS,
    PREFECTURES,
    RAISE_PATTERNS,
    short_pref_name,
)


def _amount_sql(s: str) -> str:
    """ParseAmount with fixed 億>万>千 precedence (mirror of
    functions/parsing.py::parse_amount_yen)."""
    num = f"regexp_extract({s}, '{_NUM_RE}', 1)"
    return f"""CAST(CASE
      WHEN contains({s}, '億') AND {num} <> ''
        THEN round(CAST({num} AS DOUBLE) * 100000000, 0)
      WHEN contains({s}, '万') AND {num} <> ''
        THEN round(CAST({num} AS DOUBLE) * 10000, 0)
      WHEN contains({s}, '千') AND {num} <> ''
        THEN round(CAST({num} AS DOUBLE) * 1000, 0)
      ELSE CAST(NULLIF(regexp_replace({s}, '[^0-9]', '', 'g'), '') AS DOUBLE)
    END AS BIGINT)"""


_SAL_RANGE = r"([\d.,]+(?:万|千|億)?円?)\s*[~～]\s*([\d.,]+(?:万|千|億)?円?)"
_SAL_SINGLE = r"(\d+(?:\.\d+)?[万億千]?)"

SALARY_PARSE = f"""
WITH rendered AS (
  SELECT p_partkey,
         CASE CAST(p_partkey % 6 AS INT)
           WHEN 0 THEN '月給' || CAST(p_size AS VARCHAR) || '万円~'
                       || CAST(p_size * 2 AS VARCHAR) || '万円'
           WHEN 1 THEN '年収' || CAST(p_size AS VARCHAR) || '~'
                       || CAST(p_size * 2 AS VARCHAR) || '万円'
           WHEN 2 THEN '時給' || CAST(p_size * 13 AS VARCHAR) || '円'
           WHEN 3 THEN '日給 ' || CAST(p_size AS VARCHAR) || '千円 ~ '
                       || CAST(p_size * 2 AS VARCHAR) || '千円'
           WHEN 4 THEN ''
           ELSE '応相談'
         END AS salary_raw
  FROM part),
parsed AS (
  SELECT p_partkey, salary_raw,
         regexp_extract(salary_raw, '{_SAL_RANGE}', 1) AS min_str,
         regexp_extract(salary_raw, '{_SAL_RANGE}', 2) AS max_str,
         regexp_extract(salary_raw, '{_SAL_SINGLE}', 1) AS single_str
  FROM rendered),
eff AS (
  SELECT *,
         CASE WHEN regexp_extract(min_str, '(万|千|億)', 1) = ''
               AND regexp_extract(max_str, '(万|千|億)', 1) <> ''
              THEN min_str || regexp_extract(max_str, '(万|千|億)', 1)
              ELSE min_str END AS min_eff
  FROM parsed),
amounts AS (
  SELECT p_partkey, salary_raw, min_str, max_str, single_str,
         {_amount_sql('min_eff')} AS amin,
         {_amount_sql('max_str')} AS amax,
         {_amount_sql('single_str')} AS asingle
  FROM eff),
final AS (
  SELECT *,
         (min_str <> '') AS has_range,
         (min_str <> '' AND amin IS NOT NULL AND amax IS NOT NULL) AS range_ok,
         (single_str <> '' AND asingle IS NOT NULL) AS single_ok,
         CASE WHEN contains(salary_raw, '年収') THEN '年給'
              WHEN contains(salary_raw, '年給') THEN '年給'
              WHEN contains(salary_raw, '月給') THEN '月給'
              WHEN contains(salary_raw, '日給') THEN '日給'
              WHEN contains(salary_raw, '時給') THEN '時給'
              ELSE '不明' END AS unit
  FROM amounts)
SELECT p_partkey, salary_raw,
       CAST(CASE WHEN has_range THEN (CASE WHEN range_ok THEN amin ELSE 0 END)
                 WHEN single_ok THEN asingle
                 ELSE 0 END AS BIGINT) AS salary_min,
       CAST(CASE WHEN range_ok THEN amax END AS BIGINT) AS salary_max,
       CASE WHEN range_ok OR (NOT has_range AND single_ok)
            THEN unit ELSE '不明' END AS salary_unit
FROM final
"""


def _counter_sql(s: str, patterns: tuple, keywords: tuple) -> str:
    attempts = ",\n         ".join(
        f"CAST(NULLIF(regexp_extract({s}, '{p}', 1), '') AS BIGINT)"
        for p in patterns
    )
    kw = " OR ".join(f"contains({s}, '{k}')" for k in keywords)
    return (
        f"COALESCE({attempts},\n"
        f"         CASE WHEN {kw} THEN CAST(1 AS BIGINT) END)"
    )


RAISE_BONUS = f"""
WITH rendered AS (
  SELECT p_partkey,
         CASE CAST(p_partkey % 6 AS INT)
           WHEN 0 THEN '昇給/年' || CAST(p_size % 4 + 1 AS VARCHAR) || '回 賞与/年2回'
           WHEN 1 THEN '賞与 年' || CAST(p_size % 4 + 1 AS VARCHAR) || '回支給'
           WHEN 2 THEN '年' || CAST(p_size % 4 + 1 AS VARCHAR) || '回ほど賞与あり'
           WHEN 3 THEN '昇給あり、ボーナスなし'
           WHEN 4 THEN 'ボーナス/年' || CAST(p_size % 4 + 1 AS VARCHAR) || '回'
           ELSE '特になし'
         END AS detail_raw
  FROM part)
SELECT p_partkey, detail_raw,
       {_counter_sql('detail_raw', RAISE_PATTERNS, ('昇給',))} AS raise_count,
       {_counter_sql('detail_raw', BONUS_PATTERNS, ('賞与', 'ボーナス'))} AS bonus_count
FROM rendered
"""

_BENEFIT_PIECES = ",\n           ".join(
    f"CASE WHEN (p_partkey & {1 << (i % 7)}) <> 0 THEN '{kw}' END"
    for i, (_, kw) in enumerate(BENEFIT_KEYWORDS)
)
_BENEFIT_FLAGS = ",\n       ".join(
    f"contains(benefits_raw, '{kw}') AS {name}" for name, kw in BENEFIT_KEYWORDS
)

BENEFITS_FLAGS = f"""
WITH rendered AS (
  SELECT p_partkey,
         concat_ws('、',
           {_BENEFIT_PIECES}) AS benefits_raw
  FROM part)
SELECT p_partkey, benefits_raw,
       {_BENEFIT_FLAGS}
FROM rendered
"""

_PREF_VALUES = ",\n    ".join(
    f"('{code}', '{name}', '{short_pref_name(name)}')"
    for code, name in PREFECTURES
)

LOCATION_PARSE = f"""
WITH prefs(pref_code, pref_name, short_name) AS (
  VALUES
    {_PREF_VALUES}),
rendered AS (
  SELECT c_custkey,
         CASE CAST(c_custkey % 8 AS INT)
           WHEN 0 THEN '東京都渋谷区1-2-3'
           WHEN 1 THEN '大阪府大阪市北区梅田'
           WHEN 2 THEN '北海道札幌市中央区'
           WHEN 3 THEN '神奈川県横浜市西区みなとみらい'
           WHEN 4 THEN '京都市下京区'
           WHEN 5 THEN '愛知県名古屋市中村区'
           WHEN 6 THEN '福岡県福岡市博多区'
           ELSE '所在地未定'
         END AS loc_raw
  FROM customer),
matched AS (
  SELECT r.c_custkey, r.loc_raw,
         min(p.pref_code) AS pref_code,
         min(p.pref_code || '|' || p.pref_name) AS codename
  FROM rendered r LEFT JOIN prefs p
    ON contains(r.loc_raw, p.pref_name) OR contains(r.loc_raw, p.short_name)
  GROUP BY r.c_custkey, r.loc_raw)
SELECT c_custkey, loc_raw, pref_code,
       CASE WHEN pref_code IS NOT NULL
            THEN string_split(codename, '|')[2] END AS pref_name,
       CASE WHEN pref_code IS NOT NULL THEN NULLIF(
         regexp_replace(
           regexp_extract(loc_raw, '(?:都|道|府|県)[\\s ]*(\\S+?[市区町村])', 1),
           '^[\\pP\\pS]+|[\\pP\\pS]+$', '', 'g'), '') END AS city
FROM matched
"""

# --- full 26-column scraper pipeline (A14-16 + E1-E17 composed) --------------
# Independent-derivation oracle: scraper.synth_page_text plants every
# field as a deterministic function of doc_id, so the oracle derives the
# expected 26 columns DIRECTLY from doc_id (it never runs the extraction
# regexes) — composition bugs in the Spark pipeline (alias drift, null
# rendering, normalization order) cannot cancel out. Locations go
# through the same prefecture-VALUES join + city regex as LOCATION_PARSE
# because min-code disambiguation (東京都 ⊃ 京都 shadow) is part of the
# contract under test.

_CITY_SQL = (
    "NULLIF(regexp_replace(regexp_extract({raw}, "
    "'(?:都|道|府|県)[\\s ]*(\\S+?[市区町村])', 1), "
    "'^[\\pP\\pS]+|[\\pP\\pS]+$', '', 'g'), '')"
)


def _loc_cte(name: str, raw: str) -> str:
    return f"""{name} AS (
  SELECT f.d, min(p.pref_code) AS pref_code,
         min(p.pref_code || '|' || p.pref_name) AS codename
  FROM fields f LEFT JOIN prefs p
    ON contains(f.{raw}, p.pref_name) OR contains(f.{raw}, p.short_name)
  GROUP BY f.d)"""


JOB_POSTING_CSV = f"""
WITH fields AS (
  SELECT doc_id AS d,
    '会社' || CAST(doc_id % 97 AS VARCHAR)                        AS company,
    '求人タイトル' || CAST(doc_id AS VARCHAR)                     AS title,
    'https://jobs.example.com/detail/' || CAST(doc_id AS VARCHAR) AS url,
    CASE CAST(doc_id % 5 AS INT)
      WHEN 0 THEN '東京都港区'      WHEN 1 THEN '大阪府堺市'
      WHEN 2 THEN '福岡県久留米市'  WHEN 3 THEN '北海道函館市'
      ELSE '愛知県豊田市' END                                      AS loc_raw,
    CASE CAST(doc_id % 7 AS INT)
      WHEN 0 THEN '東京都千代田区丸の内' WHEN 1 THEN '奈良県奈良市'
      WHEN 2 THEN '大阪府吹田市'         WHEN 3 THEN '沖縄県那覇市'
      WHEN 4 THEN '京都市伏見区'         WHEN 5 THEN '広島県広島市中区'
      ELSE '海外(シンガポール)' END                                AS hq_loc_raw,
    CASE CAST(doc_id % 4 AS INT)
      WHEN 0 THEN '正社員' WHEN 1 THEN '契約社員'
      WHEN 2 THEN 'アルバイト' ELSE '業務委託' END                  AS job_type,
    CAST(CASE CAST(doc_id % 3 AS INT)
      WHEN 0 THEN (doc_id % 30 + 18) * 10000
      WHEN 1 THEN (doc_id % 200 + 300) * 10000
      ELSE (doc_id % 10 + 9) * 100 END AS BIGINT)                 AS salary_min,
    CAST(CASE CAST(doc_id % 3 AS INT)
      WHEN 0 THEN (doc_id % 30 + 25) * 10000
      WHEN 1 THEN (doc_id % 200 + 400) * 10000
      ELSE (doc_id % 10 + 12) * 100 END AS BIGINT)                AS salary_max,
    CASE CAST(doc_id % 3 AS INT)
      WHEN 0 THEN '月給' WHEN 1 THEN '年給' ELSE '時給' END         AS salary_unit,
    printf('2024-%02d-15', doc_id % 9 + 1)                        AS posted_at,
    'Webサービスの開発運用' || CAST(doc_id AS VARCHAR)             AS job_description,
    CAST(doc_id % 2 + 1 AS BIGINT)                                AS raise_count,
    CAST(doc_id % 3 + 1 AS BIGINT)                                AS bonus_count,
    '配属チームは' || CAST(doc_id % 20 + 3 AS VARCHAR) || '名規模'  AS job_detail,
    '開発経験' || CAST(doc_id % 5 + 1 AS VARCHAR) || '年以上'       AS requirements,
    CASE CAST(doc_id % 4 AS INT)
      WHEN 0 THEN 'リモート' WHEN 1 THEN '出社'
      WHEN 2 THEN 'ハイブリッド' ELSE 'リモート' END                AS workplace,
    CAST(doc_id % 15 + 105 AS BIGINT)                             AS annual_holidays,
    CASE CAST(doc_id % 3 AS INT)
      WHEN 0 THEN '完全週休二日制' WHEN 1 THEN '週休二日制'
      ELSE 'シフト制' END                                          AS holiday_policy,
    CAST(doc_id % 3 + 8 AS VARCHAR) || ':00~18:00'                AS work_hours,
    '社会保険完備、交通費支給'
      || CASE WHEN doc_id % 2 = 0 THEN '、住宅手当' ELSE '' END
      || CASE WHEN doc_id % 4 = 0 THEN '、退職金制度' ELSE '' END   AS benefits_raw
  FROM documents),
prefs(pref_code, pref_name, short_name) AS (
  VALUES
    {_PREF_VALUES}),
{_loc_cte('loc', 'loc_raw')},
{_loc_cte('hq', 'hq_loc_raw')}
SELECT
  f.company                                                AS "会社名",
  f.title                                                  AS "タイトル",
  f.url                                                    AS "URL",
  COALESCE(l.pref_code, '')                                AS "勤務地(都道府県コード)",
  COALESCE(CASE WHEN l.pref_code IS NOT NULL
                THEN string_split(l.codename, '|')[2] END, '') AS "勤務地(都道府県)",
  COALESCE(CASE WHEN l.pref_code IS NOT NULL
                THEN {_CITY_SQL.format(raw='f.loc_raw')} END, '') AS "勤務地(市区町村)",
  COALESCE(f.loc_raw, '')                                  AS "勤務地(原文)",
  COALESCE(h.pref_code, '')                                AS "本社(都道府県コード)",
  COALESCE(CASE WHEN h.pref_code IS NOT NULL
                THEN string_split(h.codename, '|')[2] END, '') AS "本社(都道府県)",
  COALESCE(CASE WHEN h.pref_code IS NOT NULL
                THEN {_CITY_SQL.format(raw='f.hq_loc_raw')} END, '') AS "本社(市区町村)",
  COALESCE(f.hq_loc_raw, '')                               AS "本社(原文)",
  f.job_type                                               AS "雇用形態",
  CAST(f.salary_min AS VARCHAR)                            AS "給与(下限)",
  CAST(f.salary_max AS VARCHAR)                            AS "給与(上限)",
  f.salary_unit                                            AS "給与(単位)",
  f.posted_at                                              AS "投稿日",
  f.job_description                                        AS "職務内容",
  CAST(f.raise_count AS VARCHAR)                           AS "昇給",
  CAST(f.bonus_count AS VARCHAR)                           AS "賞与",
  f.job_detail                                             AS "業務内容詳細",
  f.requirements                                           AS "応募要件",
  f.workplace                                              AS "勤務形態",
  CAST(f.annual_holidays AS VARCHAR)                       AS "年間休日",
  f.holiday_policy                                         AS "休日・休暇",
  f.work_hours                                             AS "勤務時間",
  f.benefits_raw                                           AS "福利厚生(原文)"
FROM fields f
JOIN loc l ON l.d = f.d
JOIN hq  h ON h.d = f.d
"""

# --- streaming family --------------------------------------------------------
# availableNow over a static source converges to the batch windowed
# aggregate — the oracle is the plain GROUP BY the stream must equal.

STREAM_WINDOWED_COUNTS = """
SELECT strftime(make_timestamp(CAST(floor(epoch(ts) / 3600) * 3600 AS BIGINT)
                               * 1000000),
                '%Y-%m-%d %H:%M:%S')         AS win_start,
       event_type,
       CAST(count(*) AS BIGINT)              AS n_events,
       round(sum(value), 4)                  AS sum_value
FROM events
GROUP BY 1, 2
"""

STREAM_DEDUPE = """
SELECT DISTINCT user_id, event_type FROM events
"""

STREAM_FRONTIER_DRAIN = """
SELECT user_id,
       CAST(count(*) AS BIGINT) AS n_pending,
       round(max(value), 2)     AS max_priority
FROM events
GROUP BY user_id
"""

# --- pagination URL family (B7/B8) + JSON codec (B12) ------------------------

PAGINATED_URL_MODES = """
SELECT p_partkey,
       CAST(p_partkey % 4 AS INT) AS mode,
       CASE CAST(p_partkey % 4 AS INT)
         WHEN 0 THEN 'https://x.example.com/list/' || CAST(p_partkey AS VARCHAR)
         WHEN 1 THEN 'https://x.example.com/list/' || CAST(p_partkey AS VARCHAR)
                     || '?p=' || CAST(p_size % 20 + 1 AS VARCHAR)
         WHEN 2 THEN 'https://x.example.com/list/' || CAST(p_partkey AS VARCHAR)
                     || '/page/' || CAST(p_size % 20 + 1 AS VARCHAR)
         ELSE        'https://x.example.com/list/' || CAST(p_partkey AS VARCHAR)
                     || '/page' || CAST(p_size % 20 + 1 AS VARCHAR)
       END AS page_url
FROM part
"""

PAGE_ONE_NORMALIZE = """
WITH rendered AS (
  SELECT p_partkey,
         CAST(p_partkey % 3 AS INT) AS mode,
         CAST(p_size % 20 + 1 AS VARCHAR) AS n,
         'https://x.example.com/list/' || CAST(p_partkey AS VARCHAR) AS base
  FROM part),
raws AS (
  SELECT p_partkey, mode,
         CASE mode
           WHEN 0 THEN base || '?p=' || n
           WHEN 1 THEN base || '/page/' || n
           ELSE        base || '/page' || n
         END AS raw_url
  FROM rendered)
SELECT p_partkey, raw_url,
       CASE mode
         WHEN 0 THEN regexp_replace(raw_url, '\\?p=\\d+$', '')
         WHEN 1 THEN regexp_replace(raw_url, '/page/\\d+$', '/')
         ELSE        regexp_replace(raw_url, '/page\\d+$', '/')
       END AS page_one_url
FROM raws
"""

ATTR_EXTRACT_EMPTY_SKIP = """
WITH rendered AS (
  SELECT p_partkey,
         '<a href="/p/' || CAST(p_partkey AS VARCHAR) || '">x</a>'
         || '<a href="'
         || CASE WHEN p_partkey % 3 = 0 THEN ''
                 ELSE '/b/' || CAST(p_partkey AS VARCHAR) END
         || '">y</a>'
         || '<a href="'
         || CASE WHEN p_partkey % 2 = 0 THEN ''
                 ELSE '/q/' || CAST(p_partkey AS VARCHAR) END
         || '">z</a>' AS html
  FROM part),
extracted AS (
  SELECT p_partkey, html,
         list_filter(regexp_extract_all(html, 'href="([^"]*)"', 1),
                     v -> v <> '') AS attrs
  FROM rendered)
SELECT p_partkey, html,
       CAST(len(attrs) AS BIGINT)    AS n_attrs,
       array_to_string(attrs, ',')   AS attrs_joined
FROM extracted
"""

QUERY_REENCODE_MULTIPARAM = """
WITH rendered AS (
  SELECT p_partkey, CAST(p_size % 20 + 1 AS VARCHAR) AS page,
         'https://x.example.com/list?page_size=20&q=term'
         || CAST(p_partkey AS VARCHAR)
         || CASE WHEN p_partkey % 2 = 0
                 THEN '&p=' || CAST(p_partkey % 7 + 2 AS VARCHAR)
                 ELSE '' END AS base_url
  FROM part)
SELECT p_partkey, base_url,
       split_part(base_url, '?', 1) || '?' ||
       array_to_string(list_sort(list_append(
         list_filter(string_split(split_part(base_url, '?', 2), '&'),
                     x -> NOT starts_with(x, 'p=')),
         'p=' || page), 'ASC'), '&') AS page_url
FROM rendered
"""

_ROBOTS_BLK = (
    r"regexp_extract(robots_txt, "
    r"'(?s)User-agent:[ \t]*\*[ \t]*\n(.*?)(?:User-agent:|$)', 1)"
)
_ROBOTS_DELAY = (
    "COALESCE(CAST(NULLIF(regexp_extract(blk, "
    r"'Crawl-delay:[ \t]*([0-9.]+)', 1), '') AS DOUBLE), 1.0)"
)

ROBOTS_PARSE = f"""
WITH rendered AS (
  SELECT s_suppkey,
         '# synthetic robots' || chr(10) || 'User-agent: OtherBot' || chr(10)
         || 'Disallow: /' || chr(10) || chr(10)
         || 'User-agent: *' || chr(10)
         || 'Disallow: /private' || chr(10)
         || CASE WHEN s_suppkey % 2 = 0
                 THEN 'Disallow: /tmp/' || CAST(s_suppkey AS VARCHAR) || chr(10)
                 ELSE '' END
         || CASE WHEN s_suppkey % 4 = 0
                 THEN 'Disallow: /private/job/' || CAST(s_suppkey % 10 AS VARCHAR)
                      || chr(10)
                 ELSE '' END
         || CASE WHEN s_suppkey % 3 = 0
                 THEN 'Crawl-delay: ' || CAST(s_suppkey % 9 + 1 AS VARCHAR) || chr(10)
                 ELSE '' END
         || 'Allow: /public' || chr(10)
         || CASE WHEN s_suppkey % 5 = 0
                 THEN 'Allow: /private/job' || chr(10)
                 ELSE '' END AS robots_txt
  FROM supplier),
parsed AS (
  SELECT s_suppkey, robots_txt, {_ROBOTS_BLK} AS blk,
         '/private/job/' || CAST(s_suppkey % 10 AS VARCHAR) AS probe_path
  FROM rendered),
matched AS (
  SELECT *,
         regexp_extract_all(blk, 'Disallow:[ \\t]*(\\S+)', 1) AS dis_rules,
         regexp_extract_all(blk, 'Allow:[ \\t]*(\\S+)', 1) AS alw_rules
  FROM parsed)
SELECT s_suppkey, robots_txt,
       {_ROBOTS_DELAY} AS crawl_delay,
       array_to_string(dis_rules, ',') AS disallow_joined,
       array_to_string(alw_rules, ',') AS allow_joined,
       CAST(greatest(1, floor(60.0 / {_ROBOTS_DELAY})) AS BIGINT) AS budget,
       probe_path,
       -- RFC 9309 longest-match precedence, ties to Allow
       COALESCE(list_max(list_transform(
           list_filter(dis_rules, d -> starts_with(probe_path, d)),
           d -> len(d))), 0)
       <= COALESCE(list_max(list_transform(
           list_filter(alw_rules, a -> starts_with(probe_path, a)),
           a -> len(a))), 0) AS probe_allowed
FROM matched
"""

JSON_CODEC = """
WITH rec AS (
  SELECT o_orderkey,
         to_json(struct_pack(
           id := o_orderkey,
           url := 'https://jobs.example.com/detail/' || CAST(o_orderkey AS VARCHAR),
           status := CASE WHEN o_orderstatus = 'F' THEN 'SUCCESS' ELSE 'PENDING' END
         )) AS record_json
  FROM orders)
SELECT o_orderkey, record_json,
       CAST(json_extract(record_json, '$.id') AS BIGINT)    AS job_id,
       json_extract_string(record_json, '$.url')            AS job_url,
       json_extract_string(record_json, '$.status')         AS job_status
FROM rec
"""

# --- LSH-bucketed ANN (scale path) -------------------------------------------


def _hyperplane_dot_sql(vec: str, k: int) -> str:
    return (
        f"list_reduce(list_prepend(0.0, list_transform("
        f"generate_series(1, {ANN_DIM}), "
        f"i -> CAST({vec}[i] AS DOUBLE) * "
        f"CAST((({k} * 8191 + (i - 1) * 127 + 13) % 2003 - 1001) AS DOUBLE))), "
        f"(acc, v) -> acc + v)"
    )


_BUCKET_SQL = " + ".join(
    f"(CASE WHEN {_hyperplane_dot_sql('embedding', k)} >= 0 THEN {1 << k} ELSE 0 END)"
    for k in range(ANN_LSH_BITS)
)

ANN_LSH_TOPK = f"""
WITH b AS (
  SELECT vec_id, embedding, {_BUCKET_SQL} AS bucket,
         {_norm_sql('embedding')} AS nrm
  FROM embeddings),
q AS (
  SELECT vec_id AS query_id, embedding AS qvec, bucket, nrm AS qnrm
  FROM b WHERE vec_id % 100 = 0),
cand AS (
  SELECT q.query_id, b.vec_id AS neighbor_id,
         round({_dot_sql('q.qvec', 'b.embedding')} / (q.qnrm * b.nrm), 6) AS cos_sim
  FROM b JOIN q USING (bucket)
  WHERE b.vec_id <> q.query_id)
SELECT query_id, neighbor_id, cos_sim, rank FROM (
  SELECT *, CAST(row_number() OVER (
    PARTITION BY query_id ORDER BY cos_sim DESC, neighbor_id ASC) AS BIGINT) AS rank
  FROM cand)
WHERE rank <= 3
"""

# --- IVF ANN (coarse-quantizer scale path) -----------------------------------
# Mirror of q_ann_ivf_topk: pivot centroids by residue rule, nearest-cell
# assignment (ORDER BY raw-double cos DESC, cid ASC — same winner as
# Spark's max_by over the (c_cos, -cid) struct), top-NPROBE probes per
# query, in-cell exact rerank. All double folds left-to-right in the
# same element order, all norm products in the same operand order.

from go_crawler_spark.functions.similarity import (  # noqa: E402
    IVF_NPROBE,
    IVF_PIVOT_MOD,
    IVF_PIVOT_REM,
    IVF_TOPK,
)

ANN_IVF_TOPK = f"""
WITH e AS (
  SELECT vec_id, embedding, {_norm_sql('embedding')} AS nrm FROM embeddings),
c AS (
  SELECT vec_id AS cid, embedding AS cvec, nrm AS cnrm
  FROM e WHERE vec_id % {IVF_PIVOT_MOD} = {IVF_PIVOT_REM}),
scored AS (
  SELECT e.vec_id, c.cid,
         {_dot_sql('e.embedding', 'c.cvec')} / (e.nrm * c.cnrm) AS c_cos
  FROM e CROSS JOIN c),
assign AS (
  SELECT vec_id, cid AS cell FROM (
    SELECT vec_id, cid, row_number() OVER (
      PARTITION BY vec_id ORDER BY c_cos DESC, cid ASC) AS rn
    FROM scored) WHERE rn = 1),
probes AS (
  SELECT vec_id AS query_id, cid AS cell FROM (
    SELECT vec_id, cid, row_number() OVER (
      PARTITION BY vec_id ORDER BY c_cos DESC, cid ASC) AS rn
    FROM scored WHERE vec_id % 100 = 0) WHERE rn <= {IVF_NPROBE}),
cand AS (
  SELECT p.query_id, n.vec_id AS neighbor_id,
         round({_dot_sql('q.embedding', 'n.embedding')} / (q.nrm * n.nrm), 6)
           AS cos_sim
  FROM assign a
  JOIN probes p USING (cell)
  JOIN e n ON n.vec_id = a.vec_id
  JOIN e q ON q.vec_id = p.query_id
  WHERE n.vec_id <> p.query_id)
SELECT query_id, neighbor_id, cos_sim, rank FROM (
  SELECT *, CAST(row_number() OVER (
    PARTITION BY query_id ORDER BY cos_sim DESC, neighbor_id ASC) AS BIGINT) AS rank
  FROM cand)
WHERE rank <= {IVF_TOPK}
"""

# --- multimodal golden oracle ------------------------------------------------
# The image codec is sha-seeded and not expressible in SQL, so the
# oracle is a golden VALUES table generated at import time by the same
# pure-Python codec the kernel wraps (deterministic function of doc_id,
# ~0.2 s for 200 rows). This checks the SPARK side end-to-end — the two
# mapInPandas stages, Arrow schemas, batch iteration, and that the
# distributed run reproduces the single-process truth — not the codec
# against itself.


def _image_meta_golden_values() -> str:
    from go_crawler_spark.crawl import codec as _codec
    from go_crawler_spark.functions.multimodal import resize_nn as _resize

    rows = []
    for did in range(200):
        p = _codec.payload_for(f"doc-{did}")
        px, fmt = _codec.decode(p["bytes"])
        thumb = _resize(px, 16, 16)
        rows.append(
            f"({did}, {len(p['bytes'])}, {px.shape[1]}, {px.shape[0]}, "
            f"'{fmt}', {_codec.phash64(px)}, 16, 16, {_codec.phash64(thumb)})"
        )
    return ",\n    ".join(rows)


IMAGE_META_EXTRACT = f"""
WITH golden(doc_id, n_bytes, w, h, fmt, phash, thumb_w, thumb_h, thumb_phash) AS (
  VALUES
    {_image_meta_golden_values()})
SELECT CAST(g.doc_id AS BIGINT)      AS doc_id,
       CAST(g.n_bytes AS INT)        AS n_bytes,
       CAST(g.w AS INT)              AS w,
       CAST(g.h AS INT)              AS h,
       g.fmt                         AS fmt,
       CAST(g.phash AS BIGINT)       AS phash,
       CAST(g.thumb_w AS INT)        AS thumb_w,
       CAST(g.thumb_h AS INT)        AS thumb_h,
       CAST(g.thumb_phash AS BIGINT) AS thumb_phash
FROM golden g JOIN documents d ON d.doc_id = g.doc_id
"""

def _video_frame_golden_values() -> str:
    from go_crawler_spark.functions.multimodal import video_frame_golden

    return ",\n    ".join(
        f"({v}, {n}, {j}, {t}, {w}, {h}, {p})"
        for v, n, j, t, w, h, p in video_frame_golden()
    )


VIDEO_FRAME_SAMPLE = f"""
WITH golden(vid_id, n_frames, frame_idx, t_ms, w, h, phash) AS (
  VALUES
    {_video_frame_golden_values()})
SELECT CAST(g.vid_id AS BIGINT)   AS vid_id,
       CAST(g.n_frames AS INT)    AS n_frames,
       CAST(g.frame_idx AS INT)   AS frame_idx,
       CAST(g.t_ms AS BIGINT)     AS t_ms,
       CAST(g.w AS INT)           AS w,
       CAST(g.h AS INT)           AS h,
       CAST(g.phash AS BIGINT)    AS phash
FROM golden g JOIN documents d ON d.doc_id = g.vid_id
"""


def _audio_features_golden_values() -> str:
    from go_crawler_spark.functions.multimodal import audio_features_golden

    return ",\n    ".join(
        f"({a}, {r}, {n}, {d}, {s}, {p}, {z})"
        for a, r, n, d, s, p, z in audio_features_golden()
    )


AUDIO_FEATURES = f"""
WITH golden(aud_id, sample_rate, n_samples, duration_ms, sum_sq, peak,
            zero_crossings) AS (
  VALUES
    {_audio_features_golden_values()})
SELECT CAST(g.aud_id AS BIGINT)        AS aud_id,
       CAST(g.sample_rate AS INT)      AS sample_rate,
       CAST(g.n_samples AS INT)        AS n_samples,
       CAST(g.duration_ms AS BIGINT)   AS duration_ms,
       CAST(g.sum_sq AS BIGINT)        AS sum_sq,
       CAST(g.peak AS INT)             AS peak,
       CAST(g.zero_crossings AS INT)   AS zero_crossings
FROM golden g JOIN documents d ON d.doc_id = g.aud_id
"""


def _phash_neardup_golden_values() -> str:
    from go_crawler_spark.functions.multimodal import phash_neardup_golden

    return ",\n    ".join(
        f"({a}, {b}, {h})" for a, b, h in phash_neardup_golden()
    )


PHASH_NEARDUP = f"""
WITH golden(img_a, img_b, hamming) AS (
  VALUES
    {_phash_neardup_golden_values()})
SELECT CAST(g.img_a AS BIGINT) AS img_a,
       CAST(g.img_b AS BIGINT) AS img_b,
       CAST(g.hamming AS INT)  AS hamming
FROM golden g
JOIN documents a ON a.doc_id = g.img_a % 100000
JOIN documents b ON b.doc_id = g.img_b % 100000
"""

def _tile_partial_dup_golden_values() -> str:
    from go_crawler_spark.functions.multimodal import tile_partial_dup_golden

    return ",\n    ".join(
        f"({a}, {b}, {n})" for a, b, n in tile_partial_dup_golden()
    )


TILE_PARTIAL_DUP = f"""
WITH golden(img_a, img_b, n_tiles) AS (
  VALUES
    {_tile_partial_dup_golden_values()})
SELECT CAST(g.img_a AS BIGINT)   AS img_a,
       CAST(g.img_b AS BIGINT)   AS img_b,
       CAST(g.n_tiles AS BIGINT) AS n_tiles
FROM golden g
JOIN documents a ON a.doc_id = g.img_a % 200000
JOIN documents b ON b.doc_id = g.img_b % 200000
"""

def _cdc_chunk_dedup_golden_values() -> str:
    from go_crawler_spark.functions.multimodal import cdc_chunk_dedup_golden

    return ",\n    ".join(
        f"({d}, {n}, {t}, {dc}, {db})"
        for d, n, t, dc, db in cdc_chunk_dedup_golden()
    )


CDC_CHUNK_DEDUP = f"""
WITH golden(doc_id, n_chunks, total_bytes, dup_chunks, dup_bytes) AS (
  VALUES
    {_cdc_chunk_dedup_golden_values()})
SELECT CAST(g.doc_id AS BIGINT)      AS doc_id,
       CAST(g.n_chunks AS BIGINT)    AS n_chunks,
       CAST(g.total_bytes AS BIGINT) AS total_bytes,
       CAST(g.dup_chunks AS BIGINT)  AS dup_chunks,
       CAST(g.dup_bytes AS BIGINT)   AS dup_bytes
FROM golden g JOIN documents d ON d.doc_id = g.doc_id
"""

EXACT_DEDUP = """
SELECT CAST(min(doc_id) AS BIGINT) AS keeper_id,
       CAST(count(*) AS BIGINT)    AS n_copies
FROM documents
GROUP BY text
"""

STREAM_STATEFUL_FIRST_SEEN = """
SELECT user_id, event_type,
       CAST(min(event_id) AS BIGINT) AS first_event_id,
       CAST(count(*) AS BIGINT)      AS n_seen
FROM events
GROUP BY user_id, event_type
"""


# --- training-mix stratified sample -----------------------------------------

from go_crawler_spark.functions.textstats import (  # noqa: E402
    SAMPLE_MINSTD,
    SAMPLE_P31,
    TRAIN_MIX_PERMILLE,
)

_RATE_CASE = "CASE lang_pred " + " ".join(
    f"WHEN '{k}' THEN {v}" for k, v in TRAIN_MIX_PERMILLE.items() if k != "other"
) + f" ELSE {TRAIN_MIX_PERMILLE['other']} END"

TRAIN_MIX_SAMPLE = f"""
WITH c AS (
  SELECT doc_id,
         len(list_filter({_TOK_LOWER}, x -> list_contains({_EN}, x))) AS en,
         len(list_filter({_TOK_LOWER}, x -> list_contains({_DE}, x))) AS de,
         len(list_filter({_TOK_LOWER}, x -> list_contains({_FR}, x))) AS fr,
         len(list_filter({_TOK_LOWER}, x -> list_contains({_ES}, x))) AS es
  FROM documents),
l AS (
  SELECT doc_id,
         CASE WHEN greatest(en, de, fr, es) = 0 THEN 'other'
              WHEN en = greatest(en, de, fr, es) THEN 'en'
              WHEN de = greatest(en, de, fr, es) THEN 'de'
              WHEN fr = greatest(en, de, fr, es) THEN 'fr'
              ELSE 'es' END AS lang_pred
  FROM c),
s AS (
  SELECT doc_id, lang_pred,
         ((((doc_id % {SAMPLE_P31}) * {SAMPLE_MINSTD}) % {SAMPLE_P31})
          * {SAMPLE_MINSTD}) % {SAMPLE_P31} % 1000 AS bucket,
         CAST({_RATE_CASE} AS INTEGER) AS rate_permille
  FROM l)
SELECT doc_id, lang_pred, CAST(bucket AS BIGINT) AS bucket, rate_permille
FROM s WHERE bucket < rate_permille
"""


# --- phash near-dup components ----------------------------------------------

def _phash_components_golden_values() -> str:
    from go_crawler_spark.functions.multimodal import phash_components_golden

    return ",\n    ".join(
        f"({i}, {c}, {'TRUE' if k else 'FALSE'})"
        for i, c, k in phash_components_golden()
    )


PHASH_COMPONENTS = f"""
WITH golden(img_id, component, is_canonical) AS (
  VALUES
    {_phash_components_golden_values()})
SELECT CAST(g.img_id AS BIGINT) AS img_id,
       CAST(g.component AS BIGINT) AS component,
       g.is_canonical AS is_canonical
FROM golden g
JOIN documents d ON d.doc_id = g.img_id % 100000
"""


# --- corpus cleaning ---------------------------------------------------------

from go_crawler_spark.functions.cleaning import (  # noqa: E402
    BOILER_DEN,
    BOILER_NUM,
    PII_EMAIL_RE,
    PII_IP_RE,
    PII_PHONE_RE,
    QUALITY_MIN,
)

PII_SCRUB = f"""
WITH raw AS (
  SELECT doc_id,
         text || ' Contact user' || CAST(doc_id AS VARCHAR)
           || '@mail.example.com from 10.0.'
           || CAST(doc_id % 256 AS VARCHAR) || '.'
           || CAST((doc_id * 3) % 256 AS VARCHAR)
           || ' tel +81 90-'
           || lpad(CAST((doc_id * 7) % 10000 AS VARCHAR), 4, '0') || '-'
           || lpad(CAST((doc_id * 13) % 10000 AS VARCHAR), 4, '0') AS raw
  FROM documents),
p1 AS (
  SELECT doc_id, raw,
         regexp_replace(raw, '{PII_EMAIL_RE}', '<EMAIL>', 'g') AS s1
  FROM raw),
p2 AS (
  SELECT doc_id, raw, s1,
         regexp_replace(s1, '{PII_IP_RE}', '<IP>', 'g') AS s2
  FROM p1)
SELECT doc_id,
       CAST(len(regexp_extract_all(raw, '{PII_EMAIL_RE}')) AS BIGINT) AS n_emails,
       CAST(len(regexp_extract_all(s1, '{PII_IP_RE}')) AS BIGINT)    AS n_ips,
       CAST(len(regexp_extract_all(s2, '{PII_PHONE_RE}')) AS BIGINT) AS n_phones,
       regexp_replace(s2, '{PII_PHONE_RE}', '<PHONE>', 'g')          AS clean_text
FROM p2
"""

BOILERPLATE_STRIP = f"""
WITH pages AS (
  SELECT doc_id,
         'NAV home about contact' || chr(10) || text || chr(10)
           || 'footer site-' || CAST(doc_id % 5 AS VARCHAR)
           || ' legal notice' || chr(10)
           || 'tag doc-' || CAST(doc_id AS VARCHAR) AS page
  FROM documents),
lines AS (
  SELECT doc_id, CAST(i - 1 AS INT) AS pos, parts[i] AS line
  FROM (SELECT doc_id, string_split(page, chr(10)) AS parts FROM pages),
       unnest(generate_series(1, len(parts))) AS g(i)),
freq AS (
  SELECT line, count(DISTINCT doc_id) AS df FROM lines GROUP BY line),
tot AS (SELECT count(*) AS n_docs FROM documents),
kept AS (
  SELECT l.doc_id, l.pos, l.line,
         (f.df * {BOILER_DEN} >= t.n_docs * {BOILER_NUM}) AS strip
  FROM lines l JOIN freq f USING (line), tot t)
SELECT doc_id,
       COALESCE(string_agg(CASE WHEN NOT strip THEN line END,
                           chr(10) ORDER BY pos), '') AS clean_text,
       CAST(sum(CASE WHEN NOT strip THEN 1 ELSE 0 END) AS BIGINT) AS n_lines_kept,
       CAST(sum(CASE WHEN strip THEN 1 ELSE 0 END) AS BIGINT)     AS n_lines_stripped
FROM kept GROUP BY doc_id
"""

# --- composed corpus-keep decision -------------------------------------------
# Reuses the LANG_ID / QUALITY_SCORE oracles verbatim as nested CTEs and
# the shared _NEARDUP_COMP_CTES chain, so the composed gate is checked
# against exactly the sub-oracles the standalone queries are checked
# against — the composition itself is the only new logic under test.

CORPUS_KEEP = f"""
WITH RECURSIVE {_NEARDUP_COMP_CTES},
lng AS ({LANG_ID}),
qual AS ({QUALITY_SCORE}),
base AS (
  SELECT d.doc_id,
         lng.lang_pred,
         qual.quality,
         d.doc_id = MIN(d.doc_id) OVER (PARTITION BY d.text) AS is_exact_keeper,
         ((((d.doc_id % {SAMPLE_P31}) * {SAMPLE_MINSTD}) % {SAMPLE_P31})
          * {SAMPLE_MINSTD}) % {SAMPLE_P31} % 1000
           < ({_RATE_CASE}) AS sampled
  FROM documents d
  JOIN lng ON lng.doc_id = d.doc_id
  JOIN qual ON qual.doc_id = d.doc_id)
SELECT b.doc_id, b.lang_pred, b.quality, b.is_exact_keeper, b.sampled,
       COALESCE(c.component, b.doc_id) = b.doc_id AS is_neardup_canonical,
       (b.is_exact_keeper
        AND COALESCE(c.component, b.doc_id) = b.doc_id
        AND b.sampled
        AND b.quality >= {QUALITY_MIN}) AS keep
FROM base b LEFT JOIN comp c ON c.doc_id = b.doc_id
"""


# --- tokenization / Gopher quality / decontamination -------------------------

from go_crawler_spark.functions.textstats import (  # noqa: E402
    BPE_TOKEN_RE,
    GOPHER_MIN_WORDS,
    GOPHER_SYMBOL_RE,
)

_BPE_RE_SQL = BPE_TOKEN_RE.replace("'", "''")

TOKEN_COUNT_BPE = f"""
SELECT doc_id,
       CAST(len({_TOK}) AS BIGINT) AS n_tokens_ws,
       CAST(len(regexp_extract_all(text, '{_BPE_RE_SQL}')) AS BIGINT)
         AS n_tokens_bpe
FROM documents
"""

GOPHER_QUALITY_FLAGS = f"""
WITH t AS (
  SELECT doc_id,
         CAST(len({_TOK}) AS BIGINT) AS n,
         CAST(COALESCE(list_sum(list_transform({_TOK}, t -> length(t))), 0)
              AS BIGINT) AS sum_len,
         CAST(len(regexp_extract_all(text, '{GOPHER_SYMBOL_RE}')) AS BIGINT)
           AS n_sym,
         CAST(len(list_distinct({_TOK})) AS BIGINT) AS n_distinct,
         CAST(len(list_filter({_TOK}, t -> regexp_matches(t, '[A-Za-z]')))
              AS BIGINT) AS n_alpha,
         CAST(len(list_filter({_EN}, s -> list_contains({_TOK_LOWER}, s)))
              AS BIGINT) AS n_stop
  FROM documents)
SELECT doc_id,
       n AS n_words,
       n >= {GOPHER_MIN_WORDS} AS words_ok,
       (sum_len >= 3 * n AND sum_len <= 10 * n) AS word_len_ok,
       n_sym * 10 <= n AS symbol_ok,
       n_stop >= 2 AS stopword_ok,
       (n - n_distinct) * 10 <= n * 3 AS repetition_ok,
       n_alpha * 10 >= n * 8 AS alpha_ok,
       (n >= {GOPHER_MIN_WORDS}
        AND sum_len >= 3 * n AND sum_len <= 10 * n
        AND n_sym * 10 <= n
        AND n_stop >= 2
        AND (n - n_distinct) * 10 <= n * 3
        AND n_alpha * 10 >= n * 8) AS gopher_keep
FROM t
"""

from go_crawler_spark.functions.cleaning import (  # noqa: E402
    DECON_DEN,
    DECON_EVAL_MOD,
    DECON_NUM,
)

DECONTAMINATE = f"""
WITH toks3 AS (
  SELECT doc_id, {_TOK} AS ts FROM documents),
sh3 AS (
  SELECT doc_id,
         list_distinct(list_transform(
           CASE WHEN len(ts) - 2 > 0
                THEN list_transform(generate_series(1, len(ts) - 2),
                                    i -> array_to_string(ts[i:i+2], ' '))
                ELSE [] END,
           s -> {_poly_hash_sql('s')})) AS hs
  FROM toks3),
ev AS (
  SELECT DISTINCT h
  FROM (SELECT unnest(hs) AS h FROM sh3 WHERE doc_id % {DECON_EVAL_MOD} = 0)),
base AS (
  SELECT doc_id, hs, len(hs) AS n_shingles
  FROM sh3 WHERE doc_id % {DECON_EVAL_MOD} <> 0),
expl AS (
  SELECT doc_id, unnest(hs) AS h FROM base),
hits AS (
  SELECT e.doc_id, count(*) AS n
  FROM expl e JOIN ev ON ev.h = e.h GROUP BY e.doc_id)
SELECT b.doc_id,
       CAST(b.n_shingles AS BIGINT) AS n_shingles,
       CAST(COALESCE(h.n, 0) AS BIGINT) AS n_overlap,
       (b.n_shingles > 0
        AND COALESCE(h.n, 0) * {DECON_DEN} >= b.n_shingles * {DECON_NUM})
         AS contaminated
FROM base b LEFT JOIN hits h ON h.doc_id = b.doc_id
"""

# --- semantic dedup (SemDeDup shape) -----------------------------------------
# Mirrors functions/similarity.py::q_semantic_dedup: the planted-dup
# corpus CTE (same as EMBEDDING_NEARDUP), the deterministic IVF pivot
# assignment (same as ANN_IVF_TOPK), then the within-cell lower-id
# cosine gate. round(cos, 6) is computed on the identical double fold.

from go_crawler_spark.functions.similarity import SEMDEDUP_TAU  # noqa: E402

SEMANTIC_DEDUP = f"""
WITH base AS (
  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS embedding
  FROM embeddings),
dups AS (
  SELECT orig + {NEARDUP_DUP_OFFSET} AS vec_id,
         list_transform(generate_series(0, {ANN_DIM - 1}),
           i -> CAST(emb[i + 1] AS DOUBLE)
                + CAST((orig * 31 + i) % 7 - 3 AS DOUBLE) * 0.002) AS embedding
  FROM (SELECT vec_id AS orig, embedding AS emb
        FROM embeddings WHERE vec_id % 10 = 7)),
corpus AS (SELECT * FROM base UNION ALL SELECT * FROM dups),
e AS (
  SELECT vec_id, embedding, {_norm_sql('embedding')} AS nrm FROM corpus),
c AS (
  SELECT vec_id AS cid, embedding AS cvec, nrm AS cnrm
  FROM e
  WHERE vec_id % {IVF_PIVOT_MOD} = {IVF_PIVOT_REM}
    AND vec_id < {NEARDUP_DUP_OFFSET}),
assign AS (
  SELECT vec_id, cid AS cell FROM (
    SELECT e.vec_id, c.cid, row_number() OVER (
      PARTITION BY e.vec_id
      ORDER BY {_dot_sql('e.embedding', 'c.cvec')} / (e.nrm * c.cnrm) DESC,
               c.cid ASC) AS rn
    FROM e CROSS JOIN c) WHERE rn = 1),
dup AS (
  SELECT ha.vec_id, min(la.vec_id) AS dup_of
  FROM assign ha
  JOIN assign la ON la.cell = ha.cell AND la.vec_id < ha.vec_id
  JOIN e hi ON hi.vec_id = ha.vec_id
  JOIN e lo ON lo.vec_id = la.vec_id
  WHERE round({_dot_sql('lo.embedding', 'hi.embedding')} / (lo.nrm * hi.nrm), 6)
          >= {SEMDEDUP_TAU}
  GROUP BY ha.vec_id)
SELECT a.vec_id, a.cell, d.dup_of, d.dup_of IS NULL AS keep
FROM assign a LEFT JOIN dup d ON d.vec_id = a.vec_id
"""

# --- BM25 top-k ---------------------------------------------------------------
# Mirrors functions/search.py::q_bm25_topk. idf is rounded to 6 decimals
# right after ln() (the one libm-vs-Math.log hazard), every other step
# is exact double math in the identical order, and the 3-term sum is a
# literal left-to-right + chain.

from go_crawler_spark.functions.search import (  # noqa: E402
    BM25_B,
    BM25_K1,
    BM25_TERMS,
    BM25_TOPK,
)


def _bm25_term_sql(t: str) -> str:
    idf = (
        f"round(ln((CAST(n_docs AS DOUBLE) - CAST(df_{t} AS DOUBLE) + 0.5)"
        f" / (CAST(df_{t} AS DOUBLE) + 0.5) + 1.0), 6)"
    )
    part = (
        f"(CAST(tf_{t} AS DOUBLE) * {BM25_K1 + 1.0})"
        f" / (CAST(tf_{t} AS DOUBLE) + {BM25_K1} * ({1.0 - BM25_B}"
        f" + {BM25_B} * CAST(dl AS DOUBLE)"
        f" / (CAST(sum_dl AS DOUBLE) / CAST(n_docs AS DOUBLE))))"
    )
    return f"{idf} * {part}"


BM25_TOPK_SQL = f"""
WITH toks AS (
  SELECT doc_id, {_TOKENS.format(col='text')} AS toks FROM documents),
d AS (
  SELECT doc_id, CAST(len(toks) AS BIGINT) AS dl,
         {', '.join(
             f"CAST(len(list_filter(toks, t -> t = '{t}')) AS BIGINT) AS tf_{t}"
             for t in BM25_TERMS)}
  FROM toks),
stats AS (
  SELECT CAST(count(*) AS BIGINT) AS n_docs,
         CAST(sum(dl) AS BIGINT) AS sum_dl,
         {', '.join(
             f"CAST(sum(CASE WHEN tf_{t} > 0 THEN 1 ELSE 0 END) AS BIGINT)"
             f" AS df_{t}"
             for t in BM25_TERMS)}
  FROM d),
scored AS (
  SELECT doc_id, {', '.join(f'tf_{t}' for t in BM25_TERMS)},
         round({' + '.join(_bm25_term_sql(t) for t in BM25_TERMS)}, 6) AS score
  FROM d CROSS JOIN stats)
SELECT doc_id, {', '.join(f'tf_{t}' for t in BM25_TERMS)}, score,
       CAST(row_number() OVER (ORDER BY score DESC, doc_id ASC) AS BIGINT)
         AS rank
FROM scored
ORDER BY score DESC, doc_id ASC
LIMIT {BM25_TOPK}
"""

# --- cross-doc duplicated 8-grams ---------------------------------------------
# Mirrors functions/cleaning.py::q_dup_ngram_fraction: distinct word
# 8-gram poly-hashes per doc, document frequency ≥ 2 ⇒ duplicated,
# verdict by integer rational compare.

from go_crawler_spark.functions.cleaning import (  # noqa: E402
    DUPNGRAM_DEN,
    DUPNGRAM_N,
    DUPNGRAM_NUM,
)

DUP_NGRAM_FRACTION = f"""
WITH toks AS (
  SELECT doc_id, {_TOK} AS ts FROM documents),
sh AS (
  SELECT doc_id,
         list_distinct(list_transform(
           CASE WHEN len(ts) - {DUPNGRAM_N - 1} > 0
                THEN list_transform(generate_series(1, len(ts) - {DUPNGRAM_N - 1}),
                                    i -> array_to_string(ts[i:i+{DUPNGRAM_N - 1}], ' '))
                ELSE [] END,
           s -> {_poly_hash_sql('s')})) AS hs
  FROM toks),
base AS (
  SELECT doc_id, hs, len(hs) AS n_shingles FROM sh),
expl AS (
  SELECT doc_id, unnest(hs) AS h FROM base),
dup AS (
  SELECT h FROM expl GROUP BY h HAVING count(*) >= 2),
hits AS (
  SELECT e.doc_id, count(*) AS n FROM expl e JOIN dup USING (h)
  GROUP BY e.doc_id)
SELECT b.doc_id,
       CAST(b.n_shingles AS BIGINT) AS n_shingles,
       CAST(COALESCE(h.n, 0) AS BIGINT) AS n_dup,
       (b.n_shingles > 0
        AND COALESCE(h.n, 0) * {DUPNGRAM_DEN} >= b.n_shingles * {DUPNGRAM_NUM})
         AS dup_heavy
FROM base b LEFT JOIN hits h ON h.doc_id = b.doc_id
"""

# --- within-doc top-2-gram repetition share -----------------------------------
# Mirrors functions/textstats.py::q_top_ngram_share, derived the
# independent way: the Spark side folds the longest run over each doc's
# sorted 2-gram hashes (zero-shuffle narrow map); this side group-counts
# the exploded 2-grams and window-ranks (count DESC, hash ASC), so the
# value-hash compare cross-checks two different algorithms.

from go_crawler_spark.functions.textstats import (  # noqa: E402
    TOPNGRAM_DEN,
    TOPNGRAM_N,
    TOPNGRAM_NUM,
)

TOP_NGRAM_SHARE = f"""
WITH toks AS (
  SELECT doc_id, {_TOK} AS ts FROM documents),
sh AS (
  SELECT doc_id,
         CASE WHEN len(ts) - {TOPNGRAM_N - 1} > 0
              THEN list_transform(generate_series(1, len(ts) - {TOPNGRAM_N - 1}),
                                  i -> array_to_string(ts[i:i+{TOPNGRAM_N - 1}], ' '))
              ELSE [] END AS gs
  FROM toks),
expl AS (
  SELECT doc_id, {_poly_hash_sql('g')} AS h
  FROM (SELECT doc_id, unnest(gs) AS g FROM sh) u),
cnt AS (
  SELECT doc_id, h, count(*) AS c FROM expl GROUP BY doc_id, h),
ranked AS (
  SELECT doc_id, h, c,
         row_number() OVER (PARTITION BY doc_id ORDER BY c DESC, h ASC) AS rn
  FROM cnt),
tot AS (
  SELECT doc_id, CAST(sum(c) AS BIGINT) AS n_ngrams FROM cnt GROUP BY doc_id)
SELECT d.doc_id,
       CAST(COALESCE(t.n_ngrams, 0) AS BIGINT) AS n_ngrams,
       CAST(COALESCE(r.c, 0) AS BIGINT) AS top_count,
       r.h AS top_hash,
       (COALESCE(t.n_ngrams, 0) > 0
        AND COALESCE(r.c, 0) * {TOPNGRAM_DEN}
            >= COALESCE(t.n_ngrams, 0) * {TOPNGRAM_NUM}) AS repetitive
FROM (SELECT doc_id FROM documents) d
LEFT JOIN tot t ON t.doc_id = d.doc_id
LEFT JOIN ranked r ON r.doc_id = d.doc_id AND r.rn = 1
"""

# --- temperature-resampled source mix -----------------------------------------
# Mirrors functions/textstats.py::q_source_mix_weights. The single
# pow() per source runs on exact BIGINT-derived doubles; everything
# downstream is integer floor-division ((a − a%b)/b stays exact in
# doubles below 2^53), so no float-sum order or round() boundary.

from go_crawler_spark.functions.textstats import MIX_ALPHA, MIX_SCALE  # noqa: E402

SOURCE_MIX_WEIGHTS = f"""
WITH per AS (
  SELECT source, CAST(sum(len({_TOK})) AS BIGINT) AS src_tokens
  FROM documents GROUP BY source),
tot AS (
  SELECT CAST(sum(src_tokens) AS BIGINT) AS tot_tokens FROM per),
q AS (
  SELECT source, src_tokens, tot_tokens,
         CAST(floor(pow(CAST(src_tokens AS DOUBLE) / CAST(tot_tokens AS DOUBLE),
                        {MIX_ALPHA}) * {MIX_SCALE}) AS BIGINT) AS wq
  FROM per CROSS JOIN tot),
den AS (
  SELECT CAST(sum(wq) AS BIGINT) AS sum_wq FROM q)
SELECT source, src_tokens,
       CAST((wq * 1000000 - (wq * 1000000) % sum_wq) / sum_wq AS BIGINT)
         AS weight_ppm,
       -- HUGEINT mirrors the Spark side's DECIMAL(38,0) product: both
       -- exact past int64, so parity holds at any corpus size.
       CAST((CAST(wq AS HUGEINT) * tot_tokens) // sum_wq AS BIGINT)
         AS expected_tokens
FROM q CROSS JOIN den
"""

# --- MinHash sketch accuracy ---------------------------------------------------
# Mirrors functions/similarity.py::q_minhash_jaccard_estimate: the LSH
# candidate CTEs (identical hot-bucket cap), signature agreement out of
# 16 positions (matches/16 is a dyadic-exact double), exact Jaccard via
# the proven list_intersect/list_distinct form.

MINHASH_JACCARD_ESTIMATE = f"""
WITH {_MINHASH_CAND_CTES},
est AS (
  SELECT c.doc_a, c.doc_b,
         CAST(len(list_filter(generate_series(1, {LSH_BANDS * LSH_ROWS}),
              i -> sa.sig[i] = sb.sig[i])) AS BIGINT) AS sig_matches
  FROM cand c
  JOIN sig sa ON sa.doc_id = c.doc_a
  JOIN sig sb ON sb.doc_id = c.doc_b)
SELECT e.doc_a, e.doc_b, e.sig_matches,
       CAST(e.sig_matches AS DOUBLE) / 16.0 AS est_jaccard,
       round(CASE WHEN len(list_distinct(ha.hs || hb.hs)) > 0
                  THEN len(list_intersect(ha.hs, hb.hs))
                       / len(list_distinct(ha.hs || hb.hs))
                  ELSE 0.0 END, 4) AS exact_jaccard
FROM est e
JOIN th ha ON ha.doc_id = e.doc_a
JOIN th hb ON hb.doc_id = e.doc_b
"""

# --- k-means (one Lloyd iteration) ---------------------------------------------
# Mirrors functions/similarity.py::q_kmeans_assign. Embeddings are
# quantized (floor(x·10^6) as BIGINT) before the mean so per-cell sums
# are order-independent exact integers; new centroid values are the
# identical doubles in both engines; assignment ties break to the
# smaller centroid id.

KMEANS_ASSIGN = f"""
WITH e AS (
  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS emb,
         {_norm_sql('embedding')} AS nrm
  FROM embeddings),
c0 AS (
  SELECT vec_id AS cid, emb AS cvec, nrm AS cnrm FROM e
  WHERE vec_id % {IVF_PIVOT_MOD} = {IVF_PIVOT_REM}),
a1 AS (
  SELECT vec_id, cid AS cell_init FROM (
    SELECT e.vec_id, c0.cid, row_number() OVER (
      PARTITION BY e.vec_id
      ORDER BY {_dot_sql('e.emb', 'c0.cvec')} / (e.nrm * c0.cnrm) DESC,
               c0.cid ASC) AS rn
    FROM e CROSS JOIN c0) WHERE rn = 1),
q AS (
  SELECT a1.cell_init AS cell, u.pos,
         CAST(floor(e.emb[u.pos] * 1000000.0) AS BIGINT) AS qv
  FROM e JOIN a1 USING (vec_id),
       unnest(generate_series(1, {ANN_DIM})) AS u(pos)),
sums AS (
  SELECT cell, pos, CAST(sum(qv) AS BIGINT) AS s,
         CAST(count(*) AS BIGINT) AS cnt
  FROM q GROUP BY cell, pos),
c1 AS (
  SELECT cell AS cid,
         list(CAST(s AS DOUBLE) / CAST(cnt AS DOUBLE) / 1000000.0
              ORDER BY pos) AS cvec
  FROM sums GROUP BY cell),
c1n AS (
  SELECT cid, cvec, {_norm_sql('cvec')} AS cnrm FROM c1),
a2 AS (
  SELECT vec_id, cid AS cell_final FROM (
    SELECT e.vec_id, c.cid, row_number() OVER (
      PARTITION BY e.vec_id
      ORDER BY {_dot_sql('e.emb', 'c.cvec')} / (e.nrm * c.cnrm) DESC,
               c.cid ASC) AS rn
    FROM e CROSS JOIN c1n c) WHERE rn = 1)
SELECT a1.vec_id, a1.cell_init, a2.cell_final,
       a1.cell_init <> a2.cell_final AS moved
FROM a1 JOIN a2 USING (vec_id)
"""

# --- URL blocklist filter --------------------------------------------------------
# Mirrors functions/parsing.py::q_url_blocklist_filter: URLs from
# orders, rules from nation, longest-prefix-wins with rule_id tiebreak.

URL_BLOCKLIST_FILTER = """
WITH urls AS (
  SELECT o_orderkey,
         'shop' || CAST(o_custkey % 40 AS VARCHAR) || '.example.com' AS host,
         '/cat' || CAST(o_orderkey % 25 AS VARCHAR) || '/item'
           || CAST(o_orderkey AS VARCHAR) AS path
  FROM orders),
rules AS (
  SELECT CAST(n_nationkey AS BIGINT) AS rule_id,
         CASE WHEN n_nationkey % 2 = 0
              THEN 'shop' || CAST(n_nationkey % 40 AS VARCHAR) || '.example.com'
              ELSE '*' END AS host_pat,
         '/cat' || CAST(n_nationkey AS VARCHAR) AS path_prefix
  FROM nation),
hits AS (
  SELECT o_orderkey, rule_id, row_number() OVER (
      PARTITION BY o_orderkey
      ORDER BY length(path_prefix) DESC, rule_id ASC) AS rn
  FROM urls u JOIN rules r
    ON (r.host_pat = '*' OR r.host_pat = u.host)
   AND starts_with(u.path, r.path_prefix)),
best AS (
  SELECT o_orderkey, rule_id AS matched_rule FROM hits WHERE rn = 1)
SELECT u.o_orderkey,
       'https://' || u.host || u.path AS url,
       b.matched_rule IS NOT NULL AS blocked,
       b.matched_rule
FROM urls u LEFT JOIN best b ON b.o_orderkey = u.o_orderkey
"""


# --- PQ-ADC ANN ---------------------------------------------------------------
# Every distance below is INTEGER math on floor(x·512) fixed-point
# values (power-of-two scale: the double product and floor are
# bit-identical in Spark and DuckDB), so the ADC GROUP BY SUM has no
# float fold-order hazard. lut is enc restricted to query rows — the
# same values Spark's broadcast query→codeword table computes.

from go_crawler_spark.functions.similarity import (  # noqa: E402
    PQ_M,
    PQ_PIVOT_MOD,
    PQ_PIVOT_REM,
    PQ_SCALE,
    PQ_SUBDIM,
    PQ_TOPK,
)

ANN_PQ_ADC_TOPK = f"""
WITH q AS (
  SELECT vec_id,
         list_transform(embedding,
           x -> CAST(floor(CAST(x AS DOUBLE) * {PQ_SCALE}) AS BIGINT)) AS xq
  FROM embeddings),
sub AS (
  SELECT vec_id, m,
         list_transform(
           generate_series(m*{PQ_SUBDIM}+1, m*{PQ_SUBDIM}+{PQ_SUBDIM}),
           i -> xq[i]) AS sv
  FROM q CROSS JOIN (
    SELECT unnest(generate_series(0, {PQ_M - 1})) AS m) ms),
enc AS (
  SELECT s.vec_id, s.m, c.cid,
         list_reduce(list_prepend(CAST(0 AS BIGINT),
           list_transform(generate_series(1, {PQ_SUBDIM}),
             i -> (s.sv[i] - c.cw[i]) * (s.sv[i] - c.cw[i]))),
           (acc, v) -> acc + v) AS d
  FROM sub s JOIN (
    SELECT m, vec_id AS cid, sv AS cw FROM sub
    WHERE vec_id % {PQ_PIVOT_MOD} = {PQ_PIVOT_REM}) c
    USING (m)),
codes AS (
  SELECT vec_id, m, cid AS code FROM (
    SELECT *, row_number() OVER (
      PARTITION BY vec_id, m ORDER BY d ASC, cid ASC) AS rn FROM enc)
  WHERE rn = 1),
lut AS (
  SELECT vec_id AS query_id, m, cid, d AS pdist FROM enc
  WHERE vec_id % 100 = 0),
adc AS (
  SELECT l.query_id, k.vec_id AS neighbor_id,
         CAST(sum(l.pdist) AS BIGINT) AS adc_dist
  FROM codes k JOIN lut l ON l.m = k.m AND l.cid = k.code
  WHERE k.vec_id <> l.query_id
  GROUP BY 1, 2)
SELECT query_id, neighbor_id, adc_dist, rank FROM (
  SELECT *, CAST(row_number() OVER (
    PARTITION BY query_id ORDER BY adc_dist ASC, neighbor_id ASC) AS BIGINT)
    AS rank
  FROM adc)
WHERE rank <= {PQ_TOPK}
"""


# --- count-min heavy hitters ---------------------------------------------------
# All-integer: MINSTD-family bucket hashes and pure counts, so every
# aggregate is order-insensitive. The top-k cut is total-ordered
# (estimate DESC, user_id ASC) — no tie ambiguity at the boundary.

from go_crawler_spark.functions.sketches import (  # noqa: E402
    CMS_A,
    CMS_B,
    CMS_D,
    CMS_TOPK,
    CMS_W,
    P31 as _CMS_P31,
)

_CMS_HASH_VALUES = ", ".join(
    f"({j}, {CMS_A[j]}, {CMS_B[j]})" for j in range(CMS_D)
)

CMS_HEAVY_HITTERS = f"""
WITH h(j, a, b) AS (VALUES {_CMS_HASH_VALUES}),
ev AS (SELECT user_id FROM events),
sketch AS (
  SELECT j, ((user_id % {_CMS_P31}) * a + b) % {_CMS_P31} % {CMS_W} AS bucket,
         CAST(count(*) AS BIGINT) AS cnt
  FROM ev CROSS JOIN h GROUP BY 1, 2),
users AS (
  SELECT user_id, CAST(count(*) AS BIGINT) AS exact_count FROM ev GROUP BY 1),
probes AS (
  SELECT u.user_id, u.exact_count, j,
         ((u.user_id % {_CMS_P31}) * a + b) % {_CMS_P31} % {CMS_W} AS bucket
  FROM users u CROSS JOIN h),
est AS (
  SELECT user_id, CAST(min(cnt) AS BIGINT) AS cms_estimate,
         max(exact_count) AS exact_count
  FROM probes p JOIN sketch s USING (j, bucket) GROUP BY 1)
SELECT user_id, cms_estimate, exact_count, rank FROM (
  SELECT *, CAST(row_number() OVER (
    ORDER BY cms_estimate DESC, user_id ASC) AS BIGINT) AS rank FROM est)
WHERE rank <= {CMS_TOPK}
"""


# --- image curation gate --------------------------------------------------------
# Golden rows carry only the codec-derived INPUTS (dims, byte size,
# caption text, phash); every gate rule is re-derived here in SQL —
# integer compares, unicode length(), bit_count on the same signed
# 64-bit pattern — so the decision logic itself is independently
# computed, not replayed. Engine-parity notes: DuckDB length() counts
# unicode codepoints like Spark's length(), and bit_count(BIGINT)
# counts two's-complement bits like Spark's bit_count.


def _image_gate_values() -> str:
    from go_crawler_spark.functions.multimodal import image_gate_inputs

    return ",\n    ".join(
        f"({d}, {w}, {h}, {nb}, '{cap}', {ph})"
        for d, _iid, w, h, nb, cap, ph in image_gate_inputs()
    )


from go_crawler_spark.functions.multimodal import (  # noqa: E402
    IMG_GATE_AR_DEN,
    IMG_GATE_AR_NUM,
    IMG_GATE_MAX_BYTES,
    IMG_GATE_MIN_CAPTION,
    IMG_GATE_MIN_SIDE,
    IMG_GATE_POP_HI,
    IMG_GATE_POP_LO,
)

IMAGE_FILTER_GATE = f"""
WITH golden(doc_id, w, h, n_bytes, caption, phash) AS (
  VALUES
    {_image_gate_values()}),
flags AS (
  SELECT CAST(g.doc_id AS BIGINT) AS doc_id,
         CAST(g.w AS INT) AS w,
         CAST(g.h AS INT) AS h,
         CAST(g.n_bytes AS INT) AS n_bytes,
         CAST(length(g.caption) AS INT) AS caption_len,
         CAST(bit_count(CAST(g.phash AS BIGINT)) AS INT) AS phash_pop,
         least(g.w, g.h) >= {IMG_GATE_MIN_SIDE} AS min_side_ok,
         greatest(g.w, g.h) * {IMG_GATE_AR_DEN}
           <= least(g.w, g.h) * {IMG_GATE_AR_NUM} AS aspect_ok,
         g.n_bytes <= {IMG_GATE_MAX_BYTES} AS bytes_ok,
         length(g.caption) >= {IMG_GATE_MIN_CAPTION} AS caption_ok,
         bit_count(CAST(g.phash AS BIGINT))
           BETWEEN {IMG_GATE_POP_LO} AND {IMG_GATE_POP_HI} AS phash_entropy_ok
  FROM golden g JOIN documents d ON d.doc_id = g.doc_id)
SELECT *,
       (min_side_ok AND aspect_ok AND bytes_ok AND caption_ok
        AND phash_entropy_ok) AS keep
FROM flags
"""


# --- sequence packing ------------------------------------------------------------
# Single global running SUM in DuckDB (small data) vs the two-phase
# distributed prefix sum on the Spark side — identical int64 results.
# Window cuts use // on non-negative BIGINTs = Spark's `div`.

from go_crawler_spark.functions.textstats import (  # noqa: E402
    SEQPACK_BUDGET,
)

SEQ_PACK = f"""
WITH t AS (
  SELECT doc_id, CAST(len({_TOK}) AS BIGINT) AS n_tokens FROM documents),
c AS (
  SELECT doc_id, n_tokens,
         CAST(COALESCE(SUM(n_tokens) OVER (
           ORDER BY doc_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT)
           AS start_off
  FROM t)
SELECT doc_id, n_tokens, start_off,
       start_off // {SEQPACK_BUDGET} AS pack_first,
       (start_off + greatest(n_tokens, 1) - 1) // {SEQPACK_BUDGET}
         AS pack_last,
       (start_off + greatest(n_tokens, 1) - 1) // {SEQPACK_BUDGET}
         - start_off // {SEQPACK_BUDGET} + 1 AS n_packs
FROM c
"""


# --- quantile sketch -------------------------------------------------------------
# Independent SQL derivation of the histogram percentile read-off:
# same 256 equi-width bins, cumulative window, and integer coverage
# test cum*100 >= p*total. No float percent anywhere.

from go_crawler_spark.functions.sketches import (  # noqa: E402
    QSK_BIN_W,
    QSK_BINS,
    QSK_PCTS,
)

_QSK_PCT_VALUES = ", ".join(f"({p})" for p in QSK_PCTS)

QUANTILE_SKETCH = f"""
WITH t AS (
  SELECT CAST(len({_TOK}) AS BIGINT) AS n_tokens FROM documents),
hist AS (
  SELECT least(n_tokens // {QSK_BIN_W}, {QSK_BINS - 1}) AS bin_idx,
         CAST(count(*) AS BIGINT) AS bin_count
  FROM t GROUP BY 1),
cum AS (
  SELECT bin_idx, bin_count,
         CAST(SUM(bin_count) OVER (ORDER BY bin_idx) AS BIGINT) AS cum_count
  FROM hist),
tot AS (SELECT CAST(count(*) AS BIGINT) AS total_count FROM t),
pcts(pct) AS (VALUES {_QSK_PCT_VALUES}),
covered AS (
  SELECT CAST(p.pct AS BIGINT) AS pct, tot.total_count,
         min(c.bin_idx) AS bin_idx
  FROM pcts p CROSS JOIN tot
  JOIN cum c ON c.cum_count * 100 >= p.pct * tot.total_count
  GROUP BY 1, 2)
SELECT v.pct, v.bin_idx,
       v.bin_idx * {QSK_BIN_W} AS bin_lo,
       (v.bin_idx + 1) * {QSK_BIN_W} AS bin_hi,
       c.cum_count, v.total_count
FROM covered v JOIN cum c ON c.bin_idx = v.bin_idx
"""


# --- inverted index --------------------------------------------------------------
# Same tokenizer CTE as the BM25/token-count oracles; ranking and the
# posting-head string are re-derived with a window + ordered
# string_agg. All counts integer; the only string is the rendered
# "doc:tf" list, built with the identical separator and order.

from go_crawler_spark.functions.search import (  # noqa: E402
    INDEX_DF_MIN,
    INDEX_POSTINGS,
)

INVERTED_INDEX = f"""
WITH toks AS (
  SELECT doc_id, unnest({_TOK_LOWER}) AS term FROM documents),
tf AS (
  SELECT term, doc_id, CAST(count(*) AS BIGINT) AS tf
  FROM toks GROUP BY 1, 2),
stats AS (
  SELECT term, CAST(count(*) AS BIGINT) AS df,
         CAST(sum(tf) AS BIGINT) AS tf_total
  FROM tf GROUP BY 1),
ranked AS (
  SELECT term, doc_id, tf,
         row_number() OVER (
           PARTITION BY term ORDER BY tf DESC, doc_id ASC) AS rn
  FROM tf),
posts AS (
  SELECT term,
         string_agg(doc_id || ':' || tf, ',' ORDER BY rn) AS top_postings
  FROM ranked WHERE rn <= {INDEX_POSTINGS} GROUP BY 1)
SELECT s.term, s.df, s.tf_total, p.top_postings
FROM stats s JOIN posts p USING (term)
WHERE s.df >= {INDEX_DF_MIN}
"""


# --- payload header sniff --------------------------------------------------------
# Golden rows come from the ENCODER (codec truth); Spark's side parses
# the bytes with JVM expressions — a real encoder↔parser round-trip.
# magic_ok is asserted true for every synthesized payload.


def _payload_sniff_values() -> str:
    from go_crawler_spark.functions.multimodal import payload_sniff_golden

    return ",\n    ".join(
        f"({d}, '{fmt}', {w}, {h}, {nb})"
        for d, fmt, w, h, nb in payload_sniff_golden()
    )


PAYLOAD_HEADER_SNIFF = f"""
WITH golden(doc_id, fmt, w, h, n_bytes) AS (
  VALUES
    {_payload_sniff_values()})
SELECT CAST(g.doc_id AS BIGINT) AS doc_id,
       TRUE AS magic_ok,
       g.fmt AS fmt,
       CAST(g.w AS BIGINT) AS w,
       CAST(g.h AS BIGINT) AS h,
       CAST(g.n_bytes AS BIGINT) AS n_bytes
FROM golden g JOIN documents d ON d.doc_id = g.doc_id
"""


# --- sitemap.xml parse -------------------------------------------------------
# The oracle renders the IDENTICAL urlset body (same s_suppkey-keyed
# entry count / dates / changefreq / priority) and re-parses it with
# DuckDB regexp/list functions — both the renderer and the parser are
# independently derived.

_SITEMAP_ENTRY = (
    "'<url><loc>https://host-' || CAST(k AS VARCHAR)"
    " || '.example.com/page/' || CAST(j AS VARCHAR)"
    " || '</loc><lastmod>2024-'"
    " || lpad(CAST((k * 7 + j) % 12 + 1 AS VARCHAR), 2, '0') || '-'"
    " || lpad(CAST((k + j * 3) % 28 + 1 AS VARCHAR), 2, '0')"
    " || '</lastmod><changefreq>'"
    " || ['always','hourly','daily','weekly','monthly','yearly']"
    "[(k + j) % 6 + 1]"
    " || '</changefreq><priority>'"
    " || CASE WHEN (k + j) % 10 + 1 = 10 THEN '1.0'"
    "         ELSE '0.' || CAST((k + j) % 10 + 1 AS VARCHAR) END"
    " || '</priority></url>' || chr(10)"
)

SITEMAP_PARSE = f"""
WITH rendered AS (
  SELECT s_suppkey,
         '<?xml version="1.0"?>' || chr(10) || '<urlset>' || chr(10)
         || array_to_string(list_transform(
              generate_series(1, s_suppkey % 5 + 1),
              j -> {_SITEMAP_ENTRY}), '')
         || '</urlset>' AS sitemap_xml
  FROM (SELECT s_suppkey, s_suppkey AS k FROM supplier)),
parsed AS (
  SELECT s_suppkey,
         regexp_extract_all(sitemap_xml, '<loc>([^<]*)</loc>', 1) AS locs,
         regexp_extract_all(sitemap_xml,
                            '<lastmod>([^<]*)</lastmod>', 1) AS lastmods,
         regexp_extract_all(sitemap_xml,
                            '<changefreq>([^<]*)</changefreq>', 1) AS freqs,
         regexp_extract_all(sitemap_xml,
                            '<priority>([^<]*)</priority>', 1) AS prios
  FROM rendered)
SELECT s_suppkey,
       CAST(len(locs) AS BIGINT) AS n_urls,
       locs[1] AS first_loc,
       list_max(lastmods) AS lastmod_max,
       list_max(list_transform(
           prios, p -> CAST(replace(p, '.', '') AS BIGINT)))
         AS max_priority_tenths,
       list_min(list_transform(freqs, f -> CAST(
           CASE f WHEN 'always' THEN 60 WHEN 'hourly' THEN 3600
                  WHEN 'daily' THEN 86400 WHEN 'weekly' THEN 604800
                  WHEN 'monthly' THEN 2592000 ELSE 31536000 END
           AS BIGINT))) AS min_refetch_sec
FROM parsed
"""


# --- incremental re-fetch scheduling ----------------------------------------
# interval = clamp(BASE·n_fetch/(n_changed+1), MIN, MAX) in exact
# integer floor division; the changed flag is a MINSTD residue of
# event_id replayed identically here.

REFETCH_SCHEDULE = """
WITH hist AS (
  SELECT user_id AS url_id,
         CAST(COUNT(*) AS BIGINT) AS n_fetch,
         CAST(SUM(CASE WHEN (event_id * 48271 + 7) % 97 < 32
                       THEN 1 ELSE 0 END) AS BIGINT) AS n_changed,
         MAX(CAST(epoch_us(ts) AS BIGINT) // 1000000) AS last_fetch_sec
  FROM events GROUP BY user_id),
calc AS (
  SELECT *,
         least(604800, greatest(300,
               (n_fetch * 3600) // (n_changed + 1))) AS refetch_sec
  FROM hist)
SELECT url_id, n_fetch, n_changed,
       CAST(refetch_sec AS BIGINT) AS refetch_sec,
       CAST(last_fetch_sec + refetch_sec AS BIGINT) AS next_fetch_sec,
       CASE WHEN refetch_sec <= 3600 THEN 'hot'
            WHEN refetch_sec <= 86400 THEN 'daily'
            ELSE 'cold' END AS band
FROM calc
"""


# --- anchor-text top-k per target --------------------------------------------
# Same LCG edge synthesis as LINK_PAGERANK (PR_FANOUT/PR_LCG_* constants
# interpolated below), then count per (dst, anchor-class) and keep the
# top ANCHOR_TOPK by (count DESC, anchor ASC) — a total order, so the
# row set is engine-independent.

from go_crawler_spark.functions.linkgraph import (  # noqa: E402
    ANCHOR_MOD,
    ANCHOR_TOPK,
    PR_FANOUT,
    PR_LCG_A,
    PR_LCG_C,
    PR_LCG_K,
)

ANCHOR_TEXT_TOPK = f"""
WITH n AS (SELECT COUNT(*) AS n_nodes FROM documents),
cand AS (
  SELECT d.doc_id AS src,
         (d.doc_id * {PR_LCG_A} + u.k * {PR_LCG_K} + {PR_LCG_C})
           % n.n_nodes AS dst0,
         n.n_nodes AS n_nodes
  FROM documents d, n, unnest(generate_series(0, {PR_FANOUT - 1})) AS u(k)),
edges AS (
  SELECT DISTINCT src,
         CASE WHEN dst0 = src THEN (dst0 + 1) % n_nodes ELSE dst0 END AS dst
  FROM cand),
counted AS (
  SELECT dst, 'anchor-' || CAST(src % {ANCHOR_MOD} AS VARCHAR) AS anchor,
         CAST(COUNT(*) AS BIGINT) AS cnt
  FROM edges GROUP BY dst, anchor),
ranked AS (
  SELECT dst, anchor, cnt,
         CAST(row_number() OVER (PARTITION BY dst
              ORDER BY cnt DESC, anchor ASC) AS BIGINT) AS rnk
  FROM counted)
SELECT dst, rnk, anchor, cnt FROM ranked WHERE rnk <= {ANCHOR_TOPK}
"""


# --- crawl-trap template profiling --------------------------------------------
# Same four URL template classes synthesized from orders (keys replayed
# exactly), digit-normalized to a template, then distinct-URL counts
# with the identical over-cap rule. All integer.

from go_crawler_spark.functions.parsing import (  # noqa: E402
    TRAP_TEMPLATE_CAP,
)

CRAWL_TRAP_TEMPLATES = f"""
WITH urls AS (
  SELECT printf('shop%d.example.com', o_custkey % 20) AS host,
         CASE o_orderkey % 4
           WHEN 0 THEN '/p/' || CAST(o_orderkey AS VARCHAR)
           WHEN 1 THEN '/cal/' || CAST(o_orderkey % 50 + 2000 AS VARCHAR)
                    || '/' || CAST(o_orderkey % 12 + 1 AS VARCHAR)
           WHEN 2 THEN '/tag/' || CAST(o_orderkey % 30 AS VARCHAR)
           ELSE '/s/' || CAST((o_orderkey % 1000000007) * 2654435761
                              % 1000000007 AS VARCHAR)
         END AS path
  FROM orders),
prof AS (
  SELECT host, regexp_replace(path, '[0-9]+', 'N', 'g') AS template,
         CAST(count(DISTINCT path) AS BIGINT) AS n_urls,
         CAST(count(*) AS BIGINT) AS n_hits
  FROM urls GROUP BY 1, 2)
SELECT host, template, n_urls, n_hits,
       n_urls > {TRAP_TEMPLATE_CAP} AS over_cap,
       CAST(greatest(0, n_urls - {TRAP_TEMPLATE_CAP}) AS BIGINT)
         AS excess_urls
FROM prof
"""


# --- per-doc salient terms (tf-idf-shaped top-k) -------------------------------
# Same tokenizer CTE as the inverted-index oracle; score is the
# integer-exact tf * (SCALE // df) so no libm log enters either engine.

from go_crawler_spark.functions.search import (  # noqa: E402
    TFIDF_IDF_SCALE,
    TFIDF_TOPK,
)

TFIDF_TOPK_TERMS = f"""
WITH toks AS (
  SELECT doc_id, unnest({_TOK_LOWER}) AS term FROM documents),
tf AS (
  SELECT doc_id, term, CAST(count(*) AS BIGINT) AS tf
  FROM toks GROUP BY 1, 2),
dfp AS (
  SELECT term, CAST(count(*) AS BIGINT) AS df FROM tf GROUP BY 1),
scored AS (
  SELECT tf.doc_id, tf.term,
         CAST(tf.tf * ({TFIDF_IDF_SCALE} // dfp.df) AS BIGINT) AS score
  FROM tf JOIN dfp USING (term)),
ranked AS (
  SELECT doc_id, term, score,
         CAST(row_number() OVER (PARTITION BY doc_id
              ORDER BY score DESC, term ASC) AS BIGINT) AS rnk
  FROM scored)
SELECT doc_id, rnk, term, score FROM ranked WHERE rnk <= {TFIDF_TOPK}
"""


# --- host-budget waterfill ----------------------------------------------------
# Same demand synthesis, histogram level search and integer flooring;
# the virtual demand-0 row makes the feasible set non-empty in both
# engines. Window frames agree because histogram demands are distinct
# (RANGE vs ROWS equivalence).

from go_crawler_spark.functions.relational import (  # noqa: E402
    BUDGET_CAP_DIV,
    BUDGET_HOST_MOD,
    SNAPDIFF_DROP_A,
    SNAPDIFF_DROP_B,
)

HOST_BUDGET_WATERFILL = f"""
WITH demand AS (
  SELECT o_orderkey % {BUDGET_HOST_MOD} AS host_num,
         printf('host-%d.example.com', o_orderkey % {BUDGET_HOST_MOD}) AS host,
         CAST(count(*) AS BIGINT) AS demand
  FROM orders GROUP BY 1, 2),
totals AS (
  SELECT CAST(count(*) AS BIGINT) AS n_all,
         CAST(sum(demand) AS BIGINT) AS d_all FROM demand),
hist AS (
  SELECT demand, CAST(count(*) AS BIGINT) AS n_hosts,
         CAST(count(*) * demand AS BIGINT) AS tot
  FROM demand GROUP BY 1
  UNION ALL SELECT CAST(0 AS BIGINT), CAST(0 AS BIGINT), CAST(0 AS BIGINT)),
cum AS (
  SELECT demand,
         CAST(SUM(n_hosts) OVER (ORDER BY demand) AS BIGINT) AS cum_hosts,
         CAST(SUM(tot) OVER (ORDER BY demand) AS BIGINT) AS cum_tot
  FROM hist),
lvl AS (
  SELECT c.demand + CASE WHEN t.n_all > c.cum_hosts
           THEN (t.d_all // {BUDGET_CAP_DIV}
                 - (c.cum_tot + (t.n_all - c.cum_hosts) * c.demand))
                // (t.n_all - c.cum_hosts)
           ELSE 0 END AS level,
         CASE WHEN t.n_all > c.cum_hosts
           THEN (t.d_all // {BUDGET_CAP_DIV}
                 - (c.cum_tot + (t.n_all - c.cum_hosts) * c.demand))
                % (t.n_all - c.cum_hosts)
           ELSE 0 END AS rem
  FROM cum c, totals t
  WHERE c.cum_tot + (t.n_all - c.cum_hosts) * c.demand
        <= t.d_all // {BUDGET_CAP_DIV}
  ORDER BY c.demand DESC LIMIT 1),
bonus AS (
  SELECT host_num FROM (
    SELECT d.host_num,
           row_number() OVER (
             ORDER BY (d.host_num * 48271 + 11) % 100003, d.host_num
           ) AS rnk
    FROM demand d, lvl l WHERE d.demand > l.level) s, lvl l
  WHERE s.rnk <= l.rem)
SELECT d.host, d.demand,
       CAST(least(d.demand, l.level)
            + CASE WHEN b.host_num IS NOT NULL THEN 1 ELSE 0 END
            AS BIGINT) AS alloc,
       d.demand > l.level AS saturated,
       CAST(l.level AS BIGINT) AS level
FROM demand d LEFT JOIN bonus b USING (host_num), lvl l
"""


# --- frontier snapshot diff ----------------------------------------------------
# Identical membership/status residues on both sides of a full-outer
# join; USING-style coalesced key.

FRONTIER_SNAPSHOT_DIFF = f"""
WITH a AS (
  SELECT o_orderkey AS url_id,
         CASE WHEN o_orderkey % 3 = 0 THEN 'PENDING'
              ELSE 'SUCCESS' END AS old_status
  FROM orders WHERE o_orderkey % {SNAPDIFF_DROP_A} <> 0),
b AS (
  SELECT o_orderkey AS url_id,
         CASE WHEN o_orderkey % 3 = 1 THEN 'PENDING'
              ELSE 'SUCCESS' END AS new_status
  FROM orders WHERE o_orderkey % {SNAPDIFF_DROP_B} <> 0)
SELECT COALESCE(a.url_id, b.url_id) AS url_id, a.old_status, b.new_status,
       CASE WHEN a.url_id IS NULL THEN 'added'
            WHEN b.url_id IS NULL THEN 'removed'
            WHEN a.old_status <> b.new_status THEN 'status_changed'
            ELSE 'unchanged' END AS change
FROM a FULL OUTER JOIN b ON a.url_id = b.url_id
"""


# --- Matryoshka prefix-cascade ANN ---------------------------------------------
# Same two-stage total order: coarse rank on the dim-prefix slice,
# shortlist, full-dim rerank; dot/norm folds use the shared helpers so
# the summation order matches Spark's left fold exactly.

from go_crawler_spark.functions.similarity import (  # noqa: E402
    MRL_DECAY,
    MRL_PREFIX,
    MRL_SHORTLIST,
    MRL_TOPK,
)

ANN_MATRYOSHKA_TOPK = f"""
WITH e AS (
  SELECT vec_id,
         list_transform(generate_series(1, len(embedding)),
            i -> CAST(embedding[i] AS DOUBLE)
                 * ({float(MRL_DECAY)} / ({float(MRL_DECAY)}
                    + CAST(i - 1 AS DOUBLE)))) AS embedding
  FROM embeddings),
p AS (SELECT vec_id, embedding[1:{MRL_PREFIX}] AS pvec FROM e),
pq AS (SELECT vec_id AS query_id, pvec AS qpre FROM p WHERE vec_id % 100 = 0),
coarse AS (
  SELECT pq.query_id, p.vec_id AS neighbor_id,
         round({_dot_sql('pq.qpre', 'p.pvec')}
               / ({_norm_sql('pq.qpre')} * {_norm_sql('p.pvec')}), 6)
           AS pre_sim
  FROM p CROSS JOIN pq WHERE p.vec_id <> pq.query_id),
short AS (
  SELECT query_id, neighbor_id FROM (
    SELECT *, row_number() OVER (PARTITION BY query_id
               ORDER BY pre_sim DESC, neighbor_id ASC) AS rn
    FROM coarse) WHERE rn <= {MRL_SHORTLIST}),
fq AS (SELECT vec_id AS query_id, embedding AS qvec
       FROM e WHERE vec_id % 100 = 0),
rer AS (
  SELECT s.query_id, s.neighbor_id,
         round({_dot_sql('fq.qvec', 'e.embedding')}
               / ({_norm_sql('fq.qvec')} * {_norm_sql('e.embedding')}), 6)
           AS cos_sim
  FROM short s
  JOIN e ON e.vec_id = s.neighbor_id
  JOIN fq ON fq.query_id = s.query_id)
SELECT query_id, neighbor_id, cos_sim, rank FROM (
  SELECT *, CAST(row_number() OVER (PARTITION BY query_id
             ORDER BY cos_sim DESC, neighbor_id ASC) AS BIGINT) AS rank
  FROM rer) WHERE rank <= {MRL_TOPK}
"""


# --- domain-level quality gate --------------------------------------------------
# Per-doc quality is the QUALITY_SCORE oracle verbatim (nested CTE);
# the domain verdict is the identical integer cross-multiplication.

from go_crawler_spark.functions.cleaning import (  # noqa: E402
    DOMAIN_KEEP_DEN,
    DOMAIN_KEEP_NUM,
    DOMAIN_MOD,
)

DOMAIN_QUALITY_GATE = f"""
WITH q AS ({QUALITY_SCORE}),
d AS (
  SELECT doc_id, quality,
         printf('site-%d.example.org', doc_id % {DOMAIN_MOD}) AS host
  FROM q),
dom AS (
  SELECT host, CAST(count(*) AS BIGINT) AS host_n_docs,
         CAST(sum(quality) AS BIGINT) AS host_sum_quality
  FROM d GROUP BY 1),
g AS (
  SELECT CAST(count(*) AS BIGINT) AS g_n,
         CAST(sum(quality) AS BIGINT) AS g_sum
  FROM d)
SELECT d.doc_id, d.host, d.quality, dom.host_n_docs, dom.host_sum_quality,
       dom.host_sum_quality * g.g_n * {DOMAIN_KEEP_DEN}
         >= g.g_sum * dom.host_n_docs * {DOMAIN_KEEP_NUM} AS domain_keep
FROM d JOIN dom USING (host) CROSS JOIN g
"""


# --- caption-image alignment gate ------------------------------------------------
# Same feature hashing (shared poly fold), same power-of-two fixed
# point; every cross-row aggregate is integer so accumulation order is
# irrelevant in both engines.

from go_crawler_spark.functions.multimodal import ALIGN_FIX  # noqa: E402
from go_crawler_spark.functions.similarity import ANN_DIM  # noqa: E402

CAPTION_ALIGN_GATE = f"""
WITH toks AS (
  SELECT doc_id, unnest({_TOK_LOWER}) AS tok FROM documents),
hashed AS (
  SELECT doc_id, {_poly_hash_sql('tok')} AS h FROM toks),
sparse AS (
  SELECT doc_id, h % {ANN_DIM} AS dim,
         CAST(SUM(CASE WHEN (h // {ANN_DIM}) % 2 = 0
                       THEN 1 ELSE -1 END) AS BIGINT) AS w
  FROM hashed GROUP BY 1, 2),
fixed AS (
  SELECT vec_id AS doc_id,
         list_transform(embedding,
            x -> CAST(floor(CAST(x AS DOUBLE) * {ALIGN_FIX}) AS BIGINT))
           AS qfix
  FROM embeddings),
dotted AS (
  SELECT s.doc_id,
         CAST(SUM(s.w * f.qfix[CAST(s.dim + 1 AS INTEGER)]) AS BIGINT)
           AS dot_fixed,
         CAST(SUM(s.w * s.w) AS BIGINT) AS cap_norm2
  FROM sparse s JOIN fixed f USING (doc_id) GROUP BY 1),
norms AS (
  SELECT doc_id,
         CAST(list_reduce(list_prepend(CAST(0 AS BIGINT),
              list_transform(qfix, x -> x * x)), (a, v) -> a + v)
           AS BIGINT) AS img_norm2
  FROM fixed)
SELECT n.doc_id,
       COALESCE(t.dot_fixed, 0) AS dot_fixed,
       COALESCE(t.cap_norm2, 0) AS cap_norm2,
       n.img_norm2,
       COALESCE(t.dot_fixed, 0) >= 0 AS keep
FROM norms n LEFT JOIN dotted t USING (doc_id)
"""

# --- perplexity-bucket filter ---------------------------------------------------
# Same tokenizer CTE, same integer rarity surrogate and floored doc
# mean; tercile thresholds from the identical doc-mean histogram
# cumulative (distinct values ⇒ RANGE/ROWS frame equivalence).

from go_crawler_spark.functions.cleaning import PPLX_SCALE  # noqa: E402

PERPLEXITY_BUCKETS = f"""
WITH toks AS (
  SELECT doc_id, unnest({_TOK_LOWER}) AS term FROM documents),
tf AS (
  SELECT doc_id, term, CAST(count(*) AS BIGINT) AS tf
  FROM toks GROUP BY 1, 2),
dfp AS (
  SELECT term, CAST(count(*) AS BIGINT) AS df FROM tf GROUP BY 1),
per_doc AS (
  SELECT tf.doc_id,
         CAST(SUM(tf.tf) AS BIGINT) AS n_tokens,
         CAST(SUM(tf.tf * ({PPLX_SCALE} // dfp.df)) AS BIGINT)
           AS surprisal_sum
  FROM tf JOIN dfp USING (term) GROUP BY 1),
scored AS (
  SELECT *, surprisal_sum // n_tokens AS doc_mean FROM per_doc),
hist AS (
  SELECT doc_mean, CAST(count(*) AS BIGINT) AS n_docs
  FROM scored GROUP BY 1),
cum AS (
  SELECT doc_mean,
         CAST(SUM(n_docs) OVER (ORDER BY doc_mean) AS BIGINT) AS cum
  FROM hist),
n AS (SELECT CAST(count(*) AS BIGINT) AS n_all FROM scored),
thr AS (
  SELECT min(CASE WHEN c.cum * 3 >= n.n_all THEN c.doc_mean END) AS t1,
         min(CASE WHEN c.cum * 3 >= 2 * n.n_all THEN c.doc_mean END) AS t2
  FROM cum c CROSS JOIN n)
SELECT s.doc_id, s.n_tokens, s.surprisal_sum,
       CAST(s.doc_mean AS BIGINT) AS doc_mean,
       CASE WHEN s.doc_mean <= t.t1 THEN 'head'
            WHEN s.doc_mean > t.t2 THEN 'tail'
            ELSE 'middle' END AS bucket
FROM scored s CROSS JOIN thr t
"""


# --- link reciprocity / farm detection -------------------------------------------
# Same LCG edge synthesis as LINK_PAGERANK/ANCHOR_TEXT_TOPK, same
# planted symmetric farm ring (index arithmetic off min/count), same
# integer ppm floor and threshold.

from go_crawler_spark.functions.linkgraph import (  # noqa: E402
    FARM_LINKS,
    FARM_MOD,
    RECIP_PPM_THRESH,
)

_FARM_DELTAS = ", ".join(
    str(d) for k in range(1, FARM_LINKS + 1) for d in (k, -k)
)

LINK_RECIPROCITY = f"""
WITH n AS (SELECT COUNT(*) AS n_nodes FROM documents),
cand AS (
  SELECT d.doc_id AS src,
         (d.doc_id * {PR_LCG_A} + u.k * {PR_LCG_K} + {PR_LCG_C})
           % n.n_nodes AS dst0,
         n.n_nodes AS n_nodes
  FROM documents d, n, unnest(generate_series(0, {PR_FANOUT - 1})) AS u(k)),
lcg_edges AS (
  SELECT DISTINCT src,
         CASE WHEN dst0 = src THEN (dst0 + 1) % n_nodes ELSE dst0 END AS dst
  FROM cand),
farm AS (SELECT doc_id AS src FROM documents WHERE doc_id % {FARM_MOD} = 0),
fstats AS (SELECT min(src) AS mn, CAST(count(*) AS BIGINT) AS m FROM farm),
farm_e AS (
  SELECT f.src,
         s.mn + {FARM_MOD} * (((f.src - s.mn) // {FARM_MOD} + u.d + s.m) % s.m)
           AS dst
  FROM farm f CROSS JOIN fstats s,
       unnest(ARRAY[{_FARM_DELTAS}]) AS u(d)
  WHERE s.m > {2 * FARM_LINKS}),
edges AS (
  SELECT DISTINCT src, dst FROM (
    SELECT src, dst FROM lcg_edges UNION ALL SELECT src, dst FROM farm_e)),
recip AS (
  SELECT e.src, CAST(count(*) AS BIGINT) AS n_recip
  FROM edges e SEMI JOIN edges r ON r.src = e.dst AND r.dst = e.src
  GROUP BY 1),
deg AS (
  SELECT src, CAST(count(*) AS BIGINT) AS n_out FROM edges GROUP BY 1)
SELECT d.src, d.n_out,
       COALESCE(r.n_recip, 0) AS n_recip,
       (COALESCE(r.n_recip, 0) * 1000000) // d.n_out AS recip_ppm,
       (COALESCE(r.n_recip, 0) * 1000000) // d.n_out >= {RECIP_PPM_THRESH}
         AS farm_flag
FROM deg d LEFT JOIN recip r USING (src)
"""


# --- crawl→train composed pipeline ------------------------------------------------
# Golden rows carry only the codec-derived INPUTS (url_hash, dims,
# caption text); the verify-flag residues, the scrape regex, every
# gate rule, the caption-dedup window and the packing prefix sum are
# all re-derived here in SQL (DuckDB groups dup captions by the string
# itself where Spark keys the shuffle on xxhash64(caption) — same
# partition classes). DuckDB uses one global running SUM (small data)
# vs Spark's two-phase bucketed prefix sum — identical int64 offsets.


def _train_pages_values() -> str:
    from go_crawler_spark.functions.trainpipe import train_pages_inputs

    return ",\n    ".join(
        f"({k}, {w}, {h}, '{cap}')" for k, w, h, cap in train_pages_inputs()
    )


from go_crawler_spark.functions.trainpipe import (  # noqa: E402
    TRAIN_AR_DEN,
    TRAIN_AR_NUM,
    TRAIN_CAPTION_MOD,
    TRAIN_DECODE_MOD,
    TRAIN_MIN_CAPTION,
    TRAIN_MIN_SIDE,
    TRAIN_PACK_BUDGET,
    TRAIN_PIXELS_MOD,
    TRAIN_SALARY_RE,
)

CRAWL_TO_TRAIN = f"""
WITH golden(url_hash, w, h, caption) AS (
  VALUES
    {_train_pages_values()}),
pages AS (
  SELECT CAST(g.url_hash AS BIGINT) AS url_hash, g.w, g.h, g.caption,
         g.url_hash % {TRAIN_DECODE_MOD} <> 0 AS decode_ok,
         g.url_hash % {TRAIN_PIXELS_MOD} <> 0 AS pixels_ok,
         g.url_hash % {TRAIN_CAPTION_MOD} <> 0 AS caption_ok
  FROM golden g JOIN documents d ON d.doc_id = g.url_hash),
flags AS (
  SELECT url_hash,
         CAST(regexp_extract(caption, '{TRAIN_SALARY_RE}', 1) AS BIGINT)
           AS salary_man,
         CAST(length(caption) AS BIGINT) AS caption_len,
         (decode_ok AND pixels_ok AND caption_ok) AS verified,
         (least(w, h) >= {TRAIN_MIN_SIDE}
          AND greatest(w, h) * {TRAIN_AR_DEN}
              <= least(w, h) * {TRAIN_AR_NUM}) AS image_ok,
         length(caption) >= {TRAIN_MIN_CAPTION} AS caption_len_ok,
         (url_hash = min(url_hash) OVER (PARTITION BY caption)) AS dup_keeper
  FROM pages),
gated AS (
  SELECT *, (verified AND image_ok AND caption_len_ok AND dup_keeper) AS keep
  FROM flags),
placed AS (
  SELECT url_hash, caption_len,
         CAST(COALESCE(SUM(caption_len) OVER (ORDER BY url_hash
              ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
           AS BIGINT) AS start_off
  FROM gated WHERE keep)
SELECT g.url_hash, g.salary_man, g.caption_len, g.verified, g.image_ok,
       g.caption_len_ok, g.dup_keeper, g.keep,
       CAST(COALESCE(p.start_off, -1) AS BIGINT) AS start_off,
       CAST(COALESCE(p.start_off // {TRAIN_PACK_BUDGET}, -1) AS BIGINT)
         AS pack_first,
       CAST(COALESCE((p.start_off + greatest(g.caption_len, 1) - 1)
                     // {TRAIN_PACK_BUDGET}, -1) AS BIGINT) AS pack_last
FROM gated g LEFT JOIN placed p USING (url_hash)
"""

# --- exact-substring span coverage --------------------------------------------
# Mirrors functions/cleaning.py::q_exact_substr_coverage: positional
# word EXSUB_K-gram poly-hashes, occurrence count ≥ 2 ⇒ duplicated
# span, per-doc union of [pos, pos+K) via a running-max-of-ends
# window, verdict by integer rational compare. All BIGINT/BOOLEAN.


def _exact_substr_coverage_sql() -> str:
    from go_crawler_spark.functions.cleaning import (
        EXSUB_DEN,
        EXSUB_K,
        EXSUB_NUM,
    )

    gram = _poly_hash_sql(
        f"array_to_string(ts[pos:pos+{EXSUB_K - 1}], ' ')"
    )
    return f"""
WITH toks AS (
  SELECT doc_id, {_TOK} AS ts FROM documents),
base AS (
  SELECT doc_id, CAST(len(ts) AS BIGINT) AS n_tokens, ts FROM toks),
spans AS (
  SELECT doc_id, CAST(pos AS BIGINT) AS pos, {gram} AS h
  FROM (SELECT doc_id, ts,
               unnest(generate_series(1, len(ts) - {EXSUB_K - 1})) AS pos
        FROM base WHERE len(ts) >= {EXSUB_K})),
dup AS (
  SELECT h FROM spans GROUP BY h HAVING count(*) >= 2),
hits AS (
  SELECT s.doc_id, s.pos FROM spans s JOIN dup USING (h)),
cov AS (
  SELECT doc_id,
         pos + {EXSUB_K}
           - GREATEST(pos, COALESCE(
               max(pos + {EXSUB_K}) OVER (
                 PARTITION BY doc_id ORDER BY pos
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
               pos)) AS c
  FROM hits),
agg AS (
  SELECT doc_id, CAST(sum(c) AS BIGINT) AS covered FROM cov GROUP BY doc_id)
SELECT b.doc_id, b.n_tokens,
       CAST(COALESCE(a.covered, 0) AS BIGINT) AS covered_tokens,
       (b.n_tokens > 0
        AND COALESCE(a.covered, 0) * {EXSUB_DEN} >= b.n_tokens * {EXSUB_NUM})
         AS exsub_drop
FROM base b LEFT JOIN agg a USING (doc_id)
"""


EXACT_SUBSTR_COVERAGE = _exact_substr_coverage_sql()


# --- winnowing fingerprints ----------------------------------------------------
# Mirrors functions/cleaning.py::q_winnow_fingerprints: per-position
# word EXSUB_K-gram poly-hashes (derived independently per position —
# not via the engine's rolling-prefix kernel), packed argmin key
# h·2^32 + (2^32−1−pos), min over each full WINNOW_W window, DISTINCT
# decode. DISTINCT here ⇔ the engine's lag-dedup because equal-mk runs
# are contiguous (cleaning.py module comment). All BIGINT — DuckDB's
# int64 holds key < 2^63 exactly, same as Spark.


def _winnow_fingerprints_sql() -> str:
    from go_crawler_spark.functions.cleaning import (
        _WINNOW_M,
        EXSUB_K,
        WINNOW_W,
    )

    gram = _poly_hash_sql(
        f"array_to_string(ts[pos:pos+{EXSUB_K - 1}], ' ')"
    )
    return f"""
WITH toks AS (
  SELECT doc_id, {_TOK} AS ts FROM documents),
spans AS (
  SELECT doc_id, CAST(pos AS BIGINT) AS pos, {gram} AS h
  FROM (SELECT doc_id, ts,
               unnest(generate_series(1, len(ts) - {EXSUB_K - 1})) AS pos
        FROM toks WHERE len(ts) >= {EXSUB_K})),
keyed AS (
  SELECT doc_id, pos,
         h * {_WINNOW_M} + ({_WINNOW_M - 1} - pos) AS key,
         count(*) OVER (PARTITION BY doc_id) AS k
  FROM spans),
mins AS (
  SELECT doc_id, pos, k,
         min(key) OVER (PARTITION BY doc_id ORDER BY pos
                        ROWS BETWEEN CURRENT ROW
                        AND {WINNOW_W - 1} FOLLOWING) AS mk
  FROM keyed)
SELECT DISTINCT doc_id,
       CAST({_WINNOW_M - 1} - mk % {_WINNOW_M} AS BIGINT) AS fp_pos,
       CAST(mk // {_WINNOW_M} AS BIGINT) AS fp_hash
FROM mins WHERE pos <= k - {WINNOW_W} + 1
"""


WINNOW_FINGERPRINTS = _winnow_fingerprints_sql()

# --- reverse image search (multi-index hamming top-k) -------------------------
# Mirrors multimodal.q_phash_reverse_search via the same golden-rows
# pattern as PHASH_NEARDUP: phash_reverse_golden() is the pure-Python
# brute-force replay of the band-candidate rule + hot-bucket cap +
# exact Hamming rerank; the documents joins keep the oracle honest
# about which doc_ids actually exist in the table under test.


def _phash_reverse_golden_values() -> str:
    from go_crawler_spark.functions.multimodal import phash_reverse_golden

    return ",\n    ".join(
        f"({q}, {r}, {i}, {h})" for q, r, i, h in phash_reverse_golden()
    )


def _phash_reverse_search_sql() -> str:
    from go_crawler_spark.functions.multimodal import (
        PHASH_VARIANT_OFFSET,
        REVSEARCH_QUERY_OFFSET,
    )

    return f"""
WITH golden(query_id, rank, img_id, hamming) AS (
  VALUES
    {_phash_reverse_golden_values()})
SELECT CAST(g.query_id AS BIGINT) AS query_id,
       CAST(g.rank AS BIGINT)     AS rank,
       CAST(g.img_id AS BIGINT)   AS img_id,
       CAST(g.hamming AS INT)     AS hamming
FROM golden g
JOIN documents q ON q.doc_id = g.query_id % {REVSEARCH_QUERY_OFFSET}
JOIN documents c ON c.doc_id = g.img_id % {PHASH_VARIANT_OFFSET}
"""


PHASH_REVERSE_SEARCH = _phash_reverse_search_sql()

# --- HITS hubs & authorities ---------------------------------------------------
# Mirrors linkgraph.q_hits_scores: same LCG edge synthesis as
# LINK_PAGERANK, then HITS_ITERS unrolled mutual-reinforcement levels,
# each ℓ¹-rescaled to HITS_SCALE by exact HUGEINT floor-division
# (DECIMAL(38,0) on the Spark side) — bit-identical BIGINTs.


def _hits_levels_sql() -> str:
    from go_crawler_spark.functions.linkgraph import HITS_ITERS, HITS_SCALE

    parts = []
    prev_hub = "h0"
    for i in range(1, HITS_ITERS + 1):
        parts.append(
            f"""ar{i} AS (
  SELECT e.dst AS doc_id, CAST(SUM(h.hub) AS BIGINT) AS v
  FROM {prev_hub} h JOIN edges e ON e.src = h.doc_id GROUP BY e.dst),
at{i} AS (SELECT CAST(SUM(v) AS BIGINT) AS tot FROM ar{i}),
a{i} AS (
  SELECT d.doc_id,
         CAST(CAST(COALESCE(ar.v, 0) AS HUGEINT) * {HITS_SCALE}
              // at{i}.tot AS BIGINT) AS auth
  FROM documents d LEFT JOIN ar{i} ar ON ar.doc_id = d.doc_id, at{i}),
hr{i} AS (
  SELECT e.src AS doc_id, CAST(SUM(a.auth) AS BIGINT) AS v
  FROM a{i} a JOIN edges e ON e.dst = a.doc_id GROUP BY e.src),
ht{i} AS (SELECT CAST(SUM(v) AS BIGINT) AS tot FROM hr{i}),
h{i} AS (
  SELECT d.doc_id,
         CAST(CAST(COALESCE(hr.v, 0) AS HUGEINT) * {HITS_SCALE}
              // ht{i}.tot AS BIGINT) AS hub
  FROM documents d LEFT JOIN hr{i} hr ON hr.doc_id = d.doc_id, ht{i})"""
        )
        prev_hub = f"h{i}"
    return ",\n".join(parts)


def _hits_scores_sql() -> str:
    from go_crawler_spark.functions.linkgraph import (
        HITS_ITERS,
        HITS_SCALE,
        PR_FANOUT,
        PR_LCG_A,
        PR_LCG_C,
        PR_LCG_K,
    )

    return f"""
WITH nn AS (SELECT CAST(count(*) AS BIGINT) AS n FROM documents),
cand AS (
  SELECT d.doc_id AS src, nn.n,
         (d.doc_id * {PR_LCG_A} + u.k * {PR_LCG_K} + {PR_LCG_C}) % nn.n AS dst0
  FROM documents d, nn, unnest(generate_series(0, {PR_FANOUT - 1})) AS u(k)),
edges AS (
  SELECT DISTINCT src,
         CASE WHEN dst0 = src THEN (dst0 + 1) % n ELSE dst0 END AS dst
  FROM cand),
h0 AS (SELECT doc_id, CAST({HITS_SCALE} AS BIGINT) AS hub FROM documents),
{_hits_levels_sql()}
SELECT a{HITS_ITERS}.doc_id, a{HITS_ITERS}.auth, h{HITS_ITERS}.hub
FROM a{HITS_ITERS} JOIN h{HITS_ITERS} USING (doc_id)
"""


HITS_SCORES = _hits_scores_sql()

# --- OPIC online page importance ----------------------------------------------
# Mirrors linkgraph.q_opic_importance: LCG edges minus the planted
# danglers' out-edges, then OPIC_ITERS unrolled synchronous rounds —
# cash banks into history, splits by exact HUGEINT floor-division
# along out-links, dangling cash pools and redistributes uniformly.


def _opic_levels_sql() -> str:
    from go_crawler_spark.functions.linkgraph import OPIC_ITERS

    parts = []
    for i in range(1, OPIC_ITERS + 1):
        p = f"s{i - 1}"
        parts.append(
            f"""pot{i} AS (
  SELECT CAST(COALESCE(SUM(cash), 0) AS BIGINT) AS pot
  FROM {p} WHERE od IS NULL),
inf{i} AS (
  SELECT e.dst AS doc_id,
         CAST(SUM(CAST(s.cash AS HUGEINT) // s.od) AS BIGINT) AS v
  FROM {p} s JOIN edges e ON e.src = s.doc_id GROUP BY e.dst),
s{i} AS (
  SELECT p.doc_id, p.od,
         CAST(COALESCE(i.v, 0)
              + CAST(pot{i}.pot AS HUGEINT) // nn.n AS BIGINT) AS cash,
         CAST(p.hist + p.cash AS BIGINT) AS hist
  FROM {p} p LEFT JOIN inf{i} i USING (doc_id), pot{i}, nn)"""
        )
    return ",\n".join(parts)


def _opic_importance_sql() -> str:
    from go_crawler_spark.functions.linkgraph import (
        OPIC_DANGLE_MOD,
        OPIC_ITERS,
        OPIC_SCALE,
        PR_FANOUT,
        PR_LCG_A,
        PR_LCG_C,
        PR_LCG_K,
    )

    return f"""
WITH nn AS (SELECT CAST(count(*) AS BIGINT) AS n FROM documents),
cand AS (
  SELECT d.doc_id AS src, nn.n,
         (d.doc_id * {PR_LCG_A} + u.k * {PR_LCG_K} + {PR_LCG_C}) % nn.n AS dst0
  FROM documents d, nn, unnest(generate_series(0, {PR_FANOUT - 1})) AS u(k)),
edges AS (
  SELECT DISTINCT src,
         CASE WHEN dst0 = src THEN (dst0 + 1) % n ELSE dst0 END AS dst
  FROM cand WHERE src % {OPIC_DANGLE_MOD} <> 0),
outdeg AS (SELECT src, CAST(count(*) AS BIGINT) AS od FROM edges GROUP BY src),
s0 AS (
  SELECT d.doc_id, o.od, CAST({OPIC_SCALE} AS BIGINT) AS cash,
         CAST(0 AS BIGINT) AS hist
  FROM documents d LEFT JOIN outdeg o ON o.src = d.doc_id),
{_opic_levels_sql()}
SELECT doc_id, cash, hist, CAST(cash + hist AS BIGINT) AS importance
FROM s{OPIC_ITERS}
"""


OPIC_IMPORTANCE = _opic_importance_sql()

# --- aspect-ratio bucketing + batch packing -------------------------------------
# Mirrors multimodal.q_aspect_bucket_pack: synthetic integer (w, h),
# exact common-denominator fraction compare for the bucket argmin
# (ties to the lower bucket id), doc_id-ordered ASPECT_BATCH packing
# per bucket with the trailing partial batch flagged keep=false.


def _aspect_bucket_pack_sql() -> str:
    from go_crawler_spark.functions.multimodal import (
        ASPECT_BATCH,
        ASPECT_LADDER,
        ASPECT_LCM,
    )

    ladder_rows = ",\n    ".join(
        f"({i}, {bw}, {bh}, {ASPECT_LCM // bh})"
        for i, (bw, bh) in enumerate(ASPECT_LADDER)
    )
    return f"""
WITH imgs AS (
  SELECT doc_id,
         CAST(256 + (doc_id * 37 % 129) * 8 AS BIGINT) AS w,
         CAST(256 + (doc_id * 53 % 129) * 8 AS BIGINT) AS h
  FROM documents),
ladder(bid, bw, bh, m) AS (VALUES
    {ladder_rows}),
scored AS (
  SELECT i.doc_id, i.w, i.h, l.bid, l.bw, l.bh,
         row_number() OVER (
           PARTITION BY i.doc_id
           ORDER BY abs(i.w * l.bh - l.bw * i.h) * l.m, l.bid) AS rnk
  FROM imgs i CROSS JOIN ladder l),
assigned AS (
  SELECT doc_id, w, h, bid, bw, bh FROM scored WHERE rnk = 1),
ranked AS (
  SELECT *,
         row_number() OVER (PARTITION BY bid ORDER BY doc_id) AS rn,
         count(*) OVER (PARTITION BY bid) AS n_bucket
  FROM assigned)
SELECT doc_id, w, h,
       CAST(bid AS BIGINT) AS bucket_id,
       CAST(bw AS BIGINT) AS bucket_w,
       CAST(bh AS BIGINT) AS bucket_h,
       CAST((rn - 1) // {ASPECT_BATCH} AS BIGINT) AS batch_idx,
       CAST((rn - 1) % {ASPECT_BATCH} AS BIGINT) AS slot,
       rn <= (n_bucket // {ASPECT_BATCH}) * {ASPECT_BATCH} AS keep
FROM ranked
"""


ASPECT_BUCKET_PACK = _aspect_bucket_pack_sql()

# --- DUST irrelevant-parameter rules --------------------------------------------
# Mirrors parsing.q_dust_param_rules end to end: mixed-radix URL
# synthesis from o_orderkey, regex re-parse of host/path/param values
# from the URL STRING (the parse is part of what's verified), residual
# bucketing per candidate param, exact distinct counts, rule verdict.


def _dust_param_rules_sql() -> str:
    from go_crawler_spark.functions.parsing import (
        DUST_P_HOST,
        DUST_P_PAGE,
        DUST_P_PATH,
        DUST_P_REF,
        DUST_P_SESSION,
        DUST_PARAMS,
    )

    d1 = DUST_P_PATH
    d2 = d1 * DUST_P_PAGE
    d3 = d2 * DUST_P_REF
    variant_selects = []
    for p in DUST_PARAMS:
        others = " || '&' || ".join(
            f"'{q}=' || v_{q}" for q in DUST_PARAMS if q != p
        )
        variant_selects.append(
            f"""SELECT content_hash, host, '{p}' AS param,
       host || '&' || path || '&' || {others} AS residual,
       v_{p} AS pval
FROM parsed"""
        )
    variants = "\nUNION ALL\n".join(variant_selects)
    return f"""
WITH urls AS (
  SELECT printf('https://h%d.example.com/cat/%d?page=%d&ref=%d&session=%d',
                (o_orderkey // {d3 * DUST_P_SESSION}) % {DUST_P_HOST},
                o_orderkey % {d1},
                (o_orderkey // {d1}) % {DUST_P_PAGE},
                (o_orderkey // {d2}) % {DUST_P_REF},
                (o_orderkey // {d3}) % {DUST_P_SESSION}) AS url,
         CAST((((o_orderkey // {d3 * DUST_P_SESSION}) % {DUST_P_HOST} + 1)
               * 1009
               + (o_orderkey % {d1}) * 97
               + ((o_orderkey // {d1}) % {DUST_P_PAGE}) * 31)
              % 1000000007 AS BIGINT) AS content_hash
  FROM orders),
parsed AS (
  SELECT content_hash,
         regexp_extract(url, '^https://([^/]+)/', 1) AS host,
         regexp_extract(url, '^https://[^/]+(/[^?]*)', 1) AS path,
         regexp_extract(url, '[?&]page=([0-9]+)', 1) AS v_page,
         regexp_extract(url, '[?&]ref=([0-9]+)', 1) AS v_ref,
         regexp_extract(url, '[?&]session=([0-9]+)', 1) AS v_session
  FROM urls),
variants AS (
{variants}),
groups AS (
  SELECT host, param, residual,
         CAST(count(DISTINCT pval) AS BIGINT) AS nv,
         CAST(count(DISTINCT content_hash) AS BIGINT) AS nh
  FROM variants GROUP BY host, param, residual)
SELECT host, param,
       CAST(count(*) AS BIGINT) AS n_groups,
       CAST(SUM(CASE WHEN nv >= 2 AND nh = 1 THEN 1 ELSE 0 END) AS BIGINT)
         AS supports,
       CAST(SUM(CASE WHEN nv >= 2 AND nh >= 2 THEN 1 ELSE 0 END) AS BIGINT)
         AS violations,
       (SUM(CASE WHEN nv >= 2 AND nh = 1 THEN 1 ELSE 0 END) >= 1
        AND SUM(CASE WHEN nv >= 2 AND nh >= 2 THEN 1 ELSE 0 END) = 0)
         AS irrelevant
FROM groups GROUP BY host, param
"""


DUST_PARAM_RULES = _dust_param_rules_sql()

# --- leakage-safe domain split ---------------------------------------------------
# Mirrors cleaning.q_domain_split: split is a pure function of the
# domain id (reduced multiplicative mix mod 100) — zero-shuffle
# governance; all docs of a host share a split by construction.


def _domain_split_sql() -> str:
    from go_crawler_spark.functions.cleaning import (
        DOMAIN_MOD,
        SPLIT_MIX_A,
        SPLIT_MIX_P,
        SPLIT_TRAIN_PCT,
        SPLIT_VAL_PCT,
    )

    bucket = (
        f"((doc_id % {DOMAIN_MOD}) % {SPLIT_MIX_P}) * {SPLIT_MIX_A} "
        f"% {SPLIT_MIX_P} % 100"
    )
    return f"""
SELECT doc_id,
       printf('site-%d.example.org', doc_id % {DOMAIN_MOD}) AS host,
       CAST({bucket} AS BIGINT) AS split_bucket,
       CASE WHEN {bucket} < {SPLIT_TRAIN_PCT} THEN 'train'
            WHEN {bucket} < {SPLIT_VAL_PCT} THEN 'val'
            ELSE 'test' END AS split
FROM documents
"""


DOMAIN_SPLIT = _domain_split_sql()

# --- BPE first-merge candidates ---------------------------------------------------
# Mirrors textstats.q_bpe_top_pairs: corpus → word-frequency table →
# count-weighted adjacent char pairs → top-K by (count desc, pair asc).


def _bpe_top_pairs_sql() -> str:
    from go_crawler_spark.functions.textstats import BPE_TOPK

    return f"""
WITH words AS (
  SELECT unnest({_TOK_LOWER}) AS word FROM documents),
wc AS (
  SELECT word, CAST(count(*) AS BIGINT) AS wn FROM words GROUP BY word),
pairs AS (
  SELECT substr(word, CAST(i AS INT), 2) AS pair, wn
  FROM wc, unnest(generate_series(1, len(word) - 1)) AS u(i)
  WHERE len(word) >= 2),
agg AS (
  SELECT pair, CAST(SUM(wn) AS BIGINT) AS n_occurrences
  FROM pairs GROUP BY pair),
ranked AS (
  SELECT *, row_number() OVER (ORDER BY n_occurrences DESC, pair ASC) AS rank
  FROM agg)
SELECT CAST(rank AS BIGINT) AS rank, pair, n_occurrences
FROM ranked WHERE rank <= {BPE_TOPK}
"""


BPE_TOP_PAIRS = _bpe_top_pairs_sql()

# --- bigram count-of-counts --------------------------------------------------------
# Mirrors textstats.q_ngram_count_of_counts: adjacent lowercased word
# bigram counts, then N_c with the > CC_MAX_C tail pooled at MAX_C+1.


def _ngram_count_of_counts_sql() -> str:
    from go_crawler_spark.functions.textstats import CC_MAX_C

    return f"""
WITH toks AS (
  SELECT doc_id, {_TOK_LOWER} AS ts FROM documents),
grams AS (
  SELECT ts[CAST(i AS INT)] || ' ' || ts[CAST(i AS INT) + 1] AS bigram
  FROM toks, unnest(generate_series(1, len(ts) - 1)) AS u(i)
  WHERE len(ts) >= 2),
counts AS (
  SELECT bigram, CAST(count(*) AS BIGINT) AS c0 FROM grams GROUP BY bigram),
bucketed AS (
  SELECT CAST(CASE WHEN c0 <= {CC_MAX_C} THEN c0
                   ELSE {CC_MAX_C + 1} END AS BIGINT) AS c
  FROM counts)
SELECT c, CAST(count(*) AS BIGINT) AS n_bigrams FROM bucketed GROUP BY c
"""


NGRAM_COUNT_OF_COUNTS = _ngram_count_of_counts_sql()

# --- token-balanced shard assignment ----------------------------------------------
# Mirrors textstats.q_shard_balance: global (n_tokens desc, doc_id)
# rank, serpentine folded round-robin over SHARD_N shards.


def _shard_balance_sql() -> str:
    from go_crawler_spark.functions.textstats import SHARD_N

    return f"""
WITH toks AS (
  SELECT doc_id, CAST(len({_TOK}) AS BIGINT) AS n_tokens FROM documents),
ranked AS (
  SELECT doc_id, n_tokens,
         row_number() OVER (ORDER BY n_tokens DESC, doc_id) AS r
  FROM toks)
SELECT doc_id, n_tokens, CAST(r AS BIGINT) AS rank,
       CAST(CASE WHEN ((r - 1) // {SHARD_N}) % 2 = 0
                 THEN (r - 1) % {SHARD_N}
                 ELSE {SHARD_N - 1} - (r - 1) % {SHARD_N} END AS BIGINT)
         AS shard
FROM ranked
"""


SHARD_BALANCE = _shard_balance_sql()

# --- co-citation pairs ---------------------------------------------------------
# Mirrors linkgraph.q_cocitation_pairs: LCG edges, out-links capped at
# COCIT_CAP per citer (rank by dst), pairs within each citer's list
# (a < b), count ≥ COCIT_MIN. The oracle forms pairs by self-join —
# a different mechanism than the engine's within-list expansion, so
# the hash gate checks the pair semantics, not the implementation.


def _cocitation_pairs_sql() -> str:
    from go_crawler_spark.functions.linkgraph import (
        COCIT_CAP,
        COCIT_MIN,
        PR_FANOUT,
        PR_LCG_A,
        PR_LCG_C,
        PR_LCG_K,
    )

    return f"""
WITH nn AS (SELECT CAST(count(*) AS BIGINT) AS n FROM documents),
cand AS (
  SELECT d.doc_id AS src, nn.n,
         (d.doc_id * {PR_LCG_A} + u.k * {PR_LCG_K} + {PR_LCG_C}) % nn.n AS dst0
  FROM documents d, nn, unnest(generate_series(0, {PR_FANOUT - 1})) AS u(k)),
edges AS (
  SELECT DISTINCT src,
         CASE WHEN dst0 = src THEN (dst0 + 1) % n ELSE dst0 END AS dst
  FROM cand),
capped AS (
  SELECT src, dst FROM (
    SELECT src, dst,
           row_number() OVER (PARTITION BY src ORDER BY dst) AS rk
    FROM edges)
  WHERE rk <= {COCIT_CAP}),
pairs AS (
  SELECT x.dst AS a, y.dst AS b
  FROM capped x JOIN capped y ON x.src = y.src AND x.dst < y.dst)
SELECT a, b, CAST(count(*) AS BIGINT) AS n_cocited
FROM pairs GROUP BY a, b HAVING count(*) >= {COCIT_MIN}
"""


COCITATION_PAIRS = _cocitation_pairs_sql()


# --- TrustRank ---------------------------------------------------------------
# Mirrors linkgraph.q_trustrank: same combined organic-LCG ∪ farm-ring
# edge synthesis as LINK_RECIPROCITY, the deterministic vetted-seed
# predicate (doc_id % TR_SEED_MOD == 1 and not a farm node), then
# TR_ITERS unrolled seeded-propagation levels with the identical
# integer discipline as LINK_PAGERANK (HUGEINT // for the out-degree
# split and the 85/100 damping; the teleport lands on seed rows only).


def _trustrank_levels_sql() -> str:
    from go_crawler_spark.functions.linkgraph import TR_ITERS, TR_TELEPORT

    parts = []
    prev = "t0"
    for i in range(1, TR_ITERS + 1):
        parts.append(
            f"""s{i} AS (
  SELECT e.dst AS doc_id,
         SUM(CAST(CAST(t.trust AS HUGEINT) // od.outdeg AS BIGINT)) AS s
  FROM {prev} t
  JOIN edges e ON e.src = t.doc_id
  JOIN outdeg od ON od.src = e.src
  GROUP BY e.dst),
t{i} AS (
  SELECT sd.doc_id,
         CAST(CAST(CAST(COALESCE(s{i}.s, 0) AS HUGEINT) * 85 // 100 AS BIGINT)
              + CASE WHEN sd.is_seed THEN {TR_TELEPORT} ELSE 0 END
           AS BIGINT) AS trust
  FROM seeds sd LEFT JOIN s{i} ON s{i}.doc_id = sd.doc_id)"""
        )
        prev = f"t{i}"
    return ",\n".join(parts)


def _trustrank_sql() -> str:
    from go_crawler_spark.functions.linkgraph import (
        FARM_LINKS,
        FARM_MOD,
        PR_FANOUT,
        PR_LCG_A,
        PR_LCG_C,
        PR_LCG_K,
        TR_ITERS,
        TR_SCALE,
        TR_SEED_MOD,
    )

    deltas = ", ".join(
        str(d) for k in range(1, FARM_LINKS + 1) for d in (k, -k)
    )
    return f"""
WITH n AS (SELECT COUNT(*) AS n_nodes FROM documents),
cand AS (
  SELECT d.doc_id AS src,
         (d.doc_id * {PR_LCG_A} + u.k * {PR_LCG_K} + {PR_LCG_C})
           % n.n_nodes AS dst0,
         n.n_nodes AS n_nodes
  FROM documents d, n, unnest(generate_series(0, {PR_FANOUT - 1})) AS u(k)),
lcg_edges AS (
  SELECT DISTINCT src,
         CASE WHEN dst0 = src THEN (dst0 + 1) % n_nodes ELSE dst0 END AS dst
  FROM cand),
farm AS (SELECT doc_id AS src FROM documents WHERE doc_id % {FARM_MOD} = 0),
fstats AS (SELECT min(src) AS mn, CAST(count(*) AS BIGINT) AS m FROM farm),
farm_e AS (
  SELECT f.src,
         s.mn + {FARM_MOD} * (((f.src - s.mn) // {FARM_MOD} + u.d + s.m) % s.m)
           AS dst
  FROM farm f CROSS JOIN fstats s,
       unnest(ARRAY[{deltas}]) AS u(d)
  WHERE s.m > {2 * FARM_LINKS}),
edges AS (
  SELECT DISTINCT src, dst FROM (
    SELECT src, dst FROM lcg_edges UNION ALL SELECT src, dst FROM farm_e)),
outdeg AS (
  SELECT src, CAST(count(*) AS BIGINT) AS outdeg FROM edges GROUP BY 1),
seeds AS (
  SELECT doc_id,
         (doc_id % {TR_SEED_MOD} = 1 AND doc_id % {FARM_MOD} <> 0) AS is_seed
  FROM documents),
t0 AS (
  SELECT doc_id, is_seed,
         CAST(CASE WHEN is_seed THEN {TR_SCALE} ELSE 0 END AS BIGINT) AS trust
  FROM seeds),
{_trustrank_levels_sql()}
SELECT sd.doc_id, sd.is_seed,
       (sd.doc_id % {FARM_MOD} = 0) AS is_farm,
       t.trust
FROM t{TR_ITERS} t JOIN seeds sd USING (doc_id)
"""


TRUSTRANK = _trustrank_sql()


# --- containment (asymmetric near-dup) -----------------------------------------
# Mirrors similarity.q_containment_pairs: the shared capped-LSH
# candidate CTEs (identical hot-bucket cap, so this oracle can never
# drift from the candidate/components oracles), distinct 3-gram
# shingle lists in the NEARDUP_COMPONENTS shc form, then integer-ppm
# containment per side (DuckDB // mirrors the engine's exact
# floor-division; zero-shingle sides pin to 0).


def _containment_pairs_sql() -> str:
    from go_crawler_spark.functions.similarity import CONTAIN_PPM_THRESH

    return f"""
WITH {_MINHASH_CAND_CTES},
stoks AS (
  SELECT doc_id, {_TOK} AS ts FROM documents),
shc AS (
  SELECT doc_id,
         list_distinct(list_transform(
           CASE WHEN len(ts) - 2 > 0
                THEN list_transform(generate_series(1, len(ts) - 2),
                                    i -> array_to_string(ts[i:i+2], ' '))
                ELSE [] END,
           s -> {_poly_hash_sql('s')})) AS hs3
  FROM stoks),
counted AS (
  SELECT c.doc_a, c.doc_b,
         CAST(len(a.hs3) AS BIGINT) AS n_sh_a,
         CAST(len(b.hs3) AS BIGINT) AS n_sh_b,
         CAST(len(list_intersect(a.hs3, b.hs3)) AS BIGINT) AS n_common
  FROM cand c
  JOIN shc a ON a.doc_id = c.doc_a
  JOIN shc b ON b.doc_id = c.doc_b)
SELECT doc_a, doc_b, n_sh_a, n_sh_b, n_common,
       CAST(CASE WHEN n_sh_a > 0 THEN n_common * 1000000 // n_sh_a
                 ELSE 0 END AS BIGINT) AS contain_a_ppm,
       CAST(CASE WHEN n_sh_b > 0 THEN n_common * 1000000 // n_sh_b
                 ELSE 0 END AS BIGINT) AS contain_b_ppm,
       greatest(CASE WHEN n_sh_a > 0 THEN n_common * 1000000 // n_sh_a
                     ELSE 0 END,
                CASE WHEN n_sh_b > 0 THEN n_common * 1000000 // n_sh_b
                     ELSE 0 END) >= {CONTAIN_PPM_THRESH} AS subset_flag
FROM counted
"""


CONTAINMENT_PAIRS = _containment_pairs_sql()


# --- host-graph rank ------------------------------------------------------------
# Mirrors linkgraph.q_host_graph_rank (Eiron, McCurley & Tomlin, WWW
# 2004): the page LCG edges contracted to host pairs (doc_id //
# HOST_BLOCK — BIGINT // floor-division, exact in both engines),
# intra-host edges dropped, then the SAME unrolled integer-PageRank
# levels as LINK_PAGERANK run over the host node set — the shared
# _pagerank_levels_sql builder guarantees the recurrence is
# bit-identical between the two rank oracles.


def _host_graph_rank_sql() -> str:
    from go_crawler_spark.functions.linkgraph import (
        HOST_BLOCK,
        PR_ITERS,
        PR_SCALE,
    )

    return f"""
WITH nn AS (SELECT CAST(count(*) AS BIGINT) AS n FROM documents),
pcand AS (
  SELECT d.doc_id AS src, nn.n,
         (d.doc_id * {PR_LCG_A} + u.k * {PR_LCG_K} + {PR_LCG_C})
           % nn.n AS dst0
  FROM documents d, nn, unnest(generate_series(0, {PR_FANOUT - 1})) AS u(k)),
pedges AS (
  SELECT DISTINCT src,
         CASE WHEN dst0 = src THEN (dst0 + 1) % n ELSE dst0 END AS dst
  FROM pcand),
hosts AS (
  SELECT CAST(doc_id // {HOST_BLOCK} AS BIGINT) AS doc_id,
         CAST(count(*) AS BIGINT) AS n_pages
  FROM documents GROUP BY 1),
edges AS (
  SELECT DISTINCT CAST(src // {HOST_BLOCK} AS BIGINT) AS src,
                  CAST(dst // {HOST_BLOCK} AS BIGINT) AS dst
  FROM pedges
  WHERE src // {HOST_BLOCK} <> dst // {HOST_BLOCK}),
outdeg AS (
  SELECT src, CAST(count(*) AS BIGINT) AS outdeg FROM edges GROUP BY src),
r0 AS (SELECT doc_id, CAST({PR_SCALE} AS BIGINT) AS pr FROM hosts),
{_pagerank_levels_sql(nodes="hosts")}
SELECT h.doc_id AS host_id, h.n_pages, r.pr
FROM r{PR_ITERS} r JOIN hosts h ON h.doc_id = r.doc_id
"""


HOST_GRAPH_RANK = _host_graph_rank_sql()


# --- focused-crawl frontier scoring ---------------------------------------------
# Mirrors linkgraph.q_focused_frontier (Chakrabarti, van den Berg &
# Dom, WWW 1999): the shared LCG edge synthesis, per-target counts of
# on-topic anchors (src % ANCHOR_MOD) and topical parents (src %
# FOCUS_PAGE_MOD), then the 60/40 blended priority in exact integer
# ppm — HUGEINT * 100000 // n_inlinks mirrors the engine's
# DECIMAL(38,0) wide multiply, so no in-degree can overflow either
# engine.


def _focused_frontier_sql() -> str:
    from go_crawler_spark.functions.linkgraph import (
        FOCUS_PAGE_MOD,
        FOCUS_PAGE_TOPICAL,
        FOCUS_PRIORITY_MIN,
        FOCUS_TOPIC_ANCHORS,
        FOCUS_W_ANCHOR,
        FOCUS_W_PARENT,
    )

    blend = (
        f"CAST(n_topic_anchors * {FOCUS_W_ANCHOR} "
        f"+ n_topic_parents * {FOCUS_W_PARENT} AS HUGEINT) "
        f"* 100000 // n_inlinks"
    )
    return f"""
WITH nn AS (SELECT CAST(count(*) AS BIGINT) AS n FROM documents),
cand AS (
  SELECT d.doc_id AS src, nn.n,
         (d.doc_id * {PR_LCG_A} + u.k * {PR_LCG_K} + {PR_LCG_C})
           % nn.n AS dst0
  FROM documents d, nn, unnest(generate_series(0, {PR_FANOUT - 1})) AS u(k)),
edges AS (
  SELECT DISTINCT src,
         CASE WHEN dst0 = src THEN (dst0 + 1) % n ELSE dst0 END AS dst
  FROM cand),
agg AS (
  SELECT dst,
         CAST(count(*) AS BIGINT) AS n_inlinks,
         CAST(sum(CASE WHEN src % {ANCHOR_MOD} < {FOCUS_TOPIC_ANCHORS}
                       THEN 1 ELSE 0 END) AS BIGINT) AS n_topic_anchors,
         CAST(sum(CASE WHEN src % {FOCUS_PAGE_MOD} < {FOCUS_PAGE_TOPICAL}
                       THEN 1 ELSE 0 END) AS BIGINT) AS n_topic_parents
  FROM edges GROUP BY dst)
SELECT dst, n_inlinks, n_topic_anchors, n_topic_parents,
       CAST({blend} AS BIGINT) AS priority_ppm,
       {blend} >= {FOCUS_PRIORITY_MIN} AS crawl_next
FROM agg
"""


FOCUSED_FRONTIER = _focused_frontier_sql()


# --- mirror-host detection -------------------------------------------------------
# Mirrors similarity.q_mirror_hosts (Bharat & Broder, WWW 1999): the
# planted mirror fingerprint synthesis (host ≡ 1 mod MIRROR_MOD
# replays host-1's pages; reduced-key LCG fp, every product < 5e13),
# per-host bottom-k sketch (row_number over fp — distinct rows, no
# tie), the hot-fp cap, the shared-sample pair counts, and the
# integer-ppm resemblance (// floor-division, BIGINT-safe: n_shared
# ≤ K so the numerator is ≤ 8e6).


def _mirror_hosts_sql() -> str:
    from go_crawler_spark.functions.linkgraph import HOST_BLOCK
    from go_crawler_spark.functions.similarity import (
        MIRROR_FP_A,
        MIRROR_FP_CAP,
        MIRROR_FP_P,
        MIRROR_MOD,
        MIRROR_PPM_MIN,
        MIRROR_SKETCH_K,
    )

    return f"""
WITH pf AS (
  SELECT DISTINCT doc_id // {HOST_BLOCK} AS host,
         ((CASE WHEN (doc_id // {HOST_BLOCK}) % {MIRROR_MOD} = 1
                THEN (doc_id // {HOST_BLOCK} - 1) * {HOST_BLOCK}
                     + doc_id % {HOST_BLOCK}
                ELSE doc_id END) % {MIRROR_FP_P})
           * {MIRROR_FP_A} % {MIRROR_FP_P} AS fp
  FROM documents),
sk AS (
  SELECT host, fp,
         row_number() OVER (PARTITION BY host ORDER BY fp) AS rn
  FROM pf),
sketch AS (SELECT host, fp FROM sk WHERE rn <= {MIRROR_SKETCH_K}),
sizes AS (
  SELECT host, CAST(count(*) AS BIGINT) AS ksize FROM sketch GROUP BY host),
capped AS (
  SELECT host, fp FROM (
    SELECT host, fp, count(*) OVER (PARTITION BY fp) AS nh FROM sketch) t
  WHERE nh <= {MIRROR_FP_CAP}),
pairs AS (
  SELECT a.host AS host_a, b.host AS host_b,
         CAST(count(*) AS BIGINT) AS n_shared
  FROM capped a JOIN capped b ON a.fp = b.fp AND a.host < b.host
  GROUP BY 1, 2)
SELECT p.host_a, p.host_b, p.n_shared,
       sa.ksize AS k_a, sb.ksize AS k_b,
       CAST(p.n_shared * 1000000 // least(sa.ksize, sb.ksize)
         AS BIGINT) AS resemblance_ppm,
       p.n_shared * 1000000 // least(sa.ksize, sb.ksize)
         >= {MIRROR_PPM_MIN} AS is_mirror
FROM pairs p
JOIN sizes sa ON sa.host = p.host_a
JOIN sizes sb ON sb.host = p.host_b
"""


MIRROR_HOSTS = _mirror_hosts_sql()


# --- best-copy keeper selection ---------------------------------------------
# Mirrors multimodal.q_dedup_best_copy: the golden component rows
# (independent pure-Python union-find, shared with PHASH_COMPONENTS so
# the two oracles can't disagree on clustering), then the resolution
# synthesis and the argmax-keeper window expressed independently in
# SQL — all integer, the row_number total order has no ties
# (n_pixels DESC then img_id ASC is strict).


def _dedup_best_copy_sql() -> str:
    from go_crawler_spark.functions.multimodal import (
        BESTCOPY_BASE_PX,
        BESTCOPY_SCALE_MOD,
    )

    return f"""
WITH golden(img_id, component, is_canonical) AS (
  VALUES
    {_phash_components_golden_values()}),
g AS (
  SELECT CAST(golden.img_id AS BIGINT) AS img_id,
         CAST(golden.component AS BIGINT) AS component
  FROM golden JOIN documents d ON d.doc_id = golden.img_id % 100000),
dims AS (
  SELECT img_id, component,
         CAST({BESTCOPY_BASE_PX} * (1 + img_id % {BESTCOPY_SCALE_MOD})
           AS BIGINT) AS width,
         CAST({BESTCOPY_BASE_PX} * (1 + img_id % {BESTCOPY_SCALE_MOD})
           AS BIGINT) AS height
  FROM g)
SELECT img_id, component, width, height,
       CAST(width * height AS BIGINT) AS n_pixels,
       row_number() OVER (PARTITION BY component
                          ORDER BY width * height DESC, img_id ASC) = 1
         AS keep
FROM dims
"""


DEDUP_BEST_COPY = _dedup_best_copy_sql()


# --- BFS crawl depth ---------------------------------------------------------
# Mirrors linkgraph.q_crawl_depth (Najork & Wiener 2001): the shared
# LCG edge synthesis, then DEPTH_MAX unrolled BFS levels — each level
# is the distinct out-neighborhood of the previous one minus
# everything already seen (NOT EXISTS = the engine's anti-join).
# All-integer; first_hop pins to -1 for URLs the wavefront never
# reaches.


def _crawl_depth_sql() -> str:
    from go_crawler_spark.functions.linkgraph import (
        DEPTH_MAX,
        DEPTH_SEED_MOD,
    )

    parts = [
        f"l0 AS (SELECT doc_id FROM documents WHERE doc_id % {DEPTH_SEED_MOD} = 0)",
        "s0 AS (SELECT doc_id, CAST(0 AS BIGINT) AS first_hop FROM l0)",
    ]
    for i in range(1, DEPTH_MAX + 1):
        parts.append(
            f"""l{i} AS (
  SELECT DISTINCT e.dst AS doc_id
  FROM edges e JOIN l{i - 1} p ON p.doc_id = e.src
  WHERE NOT EXISTS (SELECT 1 FROM s{i - 1} s WHERE s.doc_id = e.dst))"""
        )
        parts.append(
            f"""s{i} AS (
  SELECT doc_id, first_hop FROM s{i - 1}
  UNION ALL
  SELECT doc_id, CAST({i} AS BIGINT) AS first_hop FROM l{i})"""
        )
    levels = ",\n".join(parts)
    return f"""
WITH nn AS (SELECT CAST(count(*) AS BIGINT) AS n FROM documents),
cand AS (
  SELECT d.doc_id AS src, nn.n,
         (d.doc_id * {PR_LCG_A} + u.k * {PR_LCG_K} + {PR_LCG_C})
           % nn.n AS dst0
  FROM documents d, nn, unnest(generate_series(0, {PR_FANOUT - 1})) AS u(k)),
edges AS (
  SELECT DISTINCT src,
         CASE WHEN dst0 = src THEN (dst0 + 1) % n ELSE dst0 END AS dst
  FROM cand),
{levels}
SELECT d.doc_id,
       d.doc_id % {DEPTH_SEED_MOD} = 0 AS is_seed,
       COALESCE(s.first_hop, -1) AS first_hop
FROM documents d LEFT JOIN s{DEPTH_MAX} s ON s.doc_id = d.doc_id
"""


CRAWL_DEPTH = _crawl_depth_sql()


# --- lexical URL spam scoring --------------------------------------------------
# Mirrors parsing.q_spam_url_score (Ma et al., KDD 2009): the five-way
# URL synthesis replayed exactly (same reduced-key session-id math as
# CRAWL_TRAP_TEMPLATES), then every lexical feature computed FROM THE
# STRING with engine-parallel primitives — length-difference counts
# for char classes, split_part for the host (Spark substring_index),
# anchored regexp for the IP-literal test. All-integer score.


def _spam_url_score_sql() -> str:
    from go_crawler_spark.functions.parsing import (
        SPAMURL_DEPTH_FREE,
        SPAMURL_DIGIT_FREE,
        SPAMURL_THRESHOLD,
        SPAMURL_W_DEPTH,
        SPAMURL_W_DIGIT,
        SPAMURL_W_HYPHEN,
        SPAMURL_W_IP,
    )

    return f"""
WITH u AS (
  SELECT o_orderkey AS url_key,
         CASE o_orderkey % 5
           WHEN 0 THEN 'shop' || CAST(o_orderkey % 20 AS VARCHAR)
                    || '.example.com/p/'
                    || CAST(o_orderkey % 100000 AS VARCHAR)
           WHEN 1 THEN 'shop' || CAST(o_orderkey % 20 AS VARCHAR)
                    || '.example.com/buy-cheap-best-deal-extra-now-'
                    || CAST(o_orderkey % 1000 AS VARCHAR)
           WHEN 2 THEN 'shop' || CAST(o_orderkey % 20 AS VARCHAR)
                    || '.example.com/a/b/c/d/e/f/'
                    || CAST(o_orderkey % 1000 AS VARCHAR)
           WHEN 3 THEN 'shop' || CAST(o_orderkey % 20 AS VARCHAR)
                    || '.example.com/x/'
                    || CAST((o_orderkey % 1000000007) * 2654435761
                            % 1000000007 AS VARCHAR)
                    || CAST(((o_orderkey + 1) % 1000000007) * 2654435761
                            % 1000000007 AS VARCHAR)
                    || CAST((o_orderkey * 7 + 3) % 1000000 AS VARCHAR)
           ELSE '10.' || CAST(o_orderkey % 250 AS VARCHAR)
                    || '.' || CAST(o_orderkey % 199 AS VARCHAR)
                    || '.7/p/' || CAST(o_orderkey % 100000 AS VARCHAR)
         END AS url
  FROM orders),
f AS (
  SELECT url_key, url,
         CAST(length(url) AS BIGINT) AS url_len,
         CAST(length(url)
              - length(regexp_replace(url, '[0-9]', '', 'g'))
           AS BIGINT) AS n_digits,
         CAST(length(url)
              - length(regexp_replace(url, '-', '', 'g'))
           AS BIGINT) AS n_hyphens,
         CAST(length(url)
              - length(regexp_replace(url, '/', '', 'g'))
           AS BIGINT) AS path_depth,
         regexp_matches(split_part(url, '/', 1), '^[0-9.]+$') AS host_is_ip
  FROM u),
s AS (
  SELECT *,
         CAST(n_hyphens * {SPAMURL_W_HYPHEN}
              + greatest(0, n_digits - {SPAMURL_DIGIT_FREE})
                * {SPAMURL_W_DIGIT}
              + greatest(0, path_depth - {SPAMURL_DEPTH_FREE})
                * {SPAMURL_W_DEPTH}
              + CASE WHEN host_is_ip THEN {SPAMURL_W_IP} ELSE 0 END
           AS BIGINT) AS spam_score
  FROM f)
SELECT url_key, url, url_len, n_digits, n_hyphens, path_depth, host_is_ip,
       spam_score, spam_score >= {SPAMURL_THRESHOLD} AS is_spam
FROM s
"""


SPAM_URL_SCORE = _spam_url_score_sql()


# --- fuzzy (near-dup) eval decontamination --------------------------------------
# Mirrors cleaning.q_fuzzy_decontaminate: the SHARED capped-LSH
# candidate CTEs (identical band kernel + hot-bucket cap, so the
# candidate set can never drift from the minhash family), pairs
# restricted to cross the train/eval split, exact signature-position
# match counts, best eval per train doc by (n_match DESC, eval_id
# ASC), and the integer threshold verdict. All-integer; unmatched
# train docs pin (0, -1, 0, false).


def _fuzzy_decontaminate_sql() -> str:
    from go_crawler_spark.functions.cleaning import (
        DECON_EVAL_MOD,
        FUZZYDECON_MIN_MATCH,
    )

    return f"""
WITH {_MINHASH_CAND_CTES},
xp AS (
  SELECT CASE WHEN doc_a % {DECON_EVAL_MOD} = 0 THEN doc_b ELSE doc_a END
           AS doc_id,
         CASE WHEN doc_a % {DECON_EVAL_MOD} = 0 THEN doc_a ELSE doc_b END
           AS eval_id
  FROM cand
  WHERE (doc_a % {DECON_EVAL_MOD} = 0) <> (doc_b % {DECON_EVAL_MOD} = 0)),
m AS (
  SELECT p.doc_id, p.eval_id,
         CAST(len(list_filter(generate_series(1, len(st.sig)),
                              i -> st.sig[i] = se.sig[i]))
           AS BIGINT) AS n_match
  FROM xp p
  JOIN sig st ON st.doc_id = p.doc_id
  JOIN sig se ON se.doc_id = p.eval_id),
best AS (
  SELECT doc_id,
         CAST(count(*) OVER (PARTITION BY doc_id) AS BIGINT) AS n_cand,
         eval_id, n_match,
         row_number() OVER (PARTITION BY doc_id
                            ORDER BY n_match DESC, eval_id ASC) AS rn
  FROM m)
SELECT d.doc_id,
       COALESCE(b.n_cand, 0) AS n_cand,
       COALESCE(b.eval_id, -1) AS eval_id,
       COALESCE(b.n_match, 0) AS n_match,
       COALESCE(b.n_match, 0) >= {FUZZYDECON_MIN_MATCH}
         AS fuzzy_contaminated
FROM documents d
LEFT JOIN (SELECT * FROM best WHERE rn = 1) b ON b.doc_id = d.doc_id
WHERE d.doc_id % {DECON_EVAL_MOD} <> 0
"""


FUZZY_DECONTAMINATE = _fuzzy_decontaminate_sql()


# --- image eval-set decontamination -------------------------------------------
# Mirrors multimodal.q_image_decontaminate via the same golden-rows
# pattern as PHASH_NEARDUP: image_decontaminate_golden() is the
# pure-Python brute-force replay (same codec.phash64 kernel, same band
# rule + hot-bucket cap, cross-split restriction, closest-eval pick),
# and the SQL pins those rows joined back to the documents table.


def _image_decontaminate_golden_values() -> str:
    from go_crawler_spark.functions.multimodal import (
        image_decontaminate_golden,
    )

    return ",\n    ".join(
        f"({i}, {n}, {e}, {h}, {str(bool(c)).upper()})"
        for i, n, e, h, c in image_decontaminate_golden()
    )


def _image_decontaminate_sql() -> str:
    return f"""
WITH golden(img_id, n_cand, eval_img, hamming, img_contaminated) AS (
  VALUES
    {_image_decontaminate_golden_values()})
SELECT CAST(g.img_id AS BIGINT)   AS img_id,
       CAST(g.n_cand AS BIGINT)   AS n_cand,
       CAST(g.eval_img AS BIGINT) AS eval_img,
       CAST(g.hamming AS INT)     AS hamming,
       g.img_contaminated         AS img_contaminated
FROM golden g
JOIN documents d ON d.doc_id = g.img_id % 100000
"""


IMAGE_DECONTAMINATE = _image_decontaminate_sql()


# --- redirect-chain resolution -------------------------------------------------
# Mirrors linkgraph.q_redirect_resolve WITHOUT chasing pointers: the
# engine resolves chains by pointer doubling over the opaque edge
# table; the oracle inverts the block permutation closed-form
# (REDIR_PERM_INV·REDIR_PERM_A ≡ 1 mod REDIR_BLOCK), so the two
# derivations share only the synthesis law. All-integer; docs in
# ragged (not fully present) blocks are self-terminal with zero hops.


def _redirect_resolve_sql() -> str:
    from go_crawler_spark.functions.linkgraph import (
        REDIR_BLOCK,
        REDIR_PERM_A,
        REDIR_PERM_INV,
        REDIR_PHASE_MOD,
    )

    B, A, INV, PM = REDIR_BLOCK, REDIR_PERM_A, REDIR_PERM_INV, REDIR_PHASE_MOD
    return f"""
WITH ids AS (SELECT DISTINCT doc_id FROM documents),
full_blocks AS (
  SELECT doc_id // {B} AS blk FROM ids
  GROUP BY 1 HAVING count(*) = {B}),
d AS (
  SELECT doc_id,
         doc_id % {B} AS r,
         (doc_id // {B}) % {PM} AS phase,
         ((doc_id % {B}) * {A} + (doc_id // {B}) % {PM}) % {B} AS pos,
         EXISTS (SELECT 1 FROM full_blocks f
                 WHERE f.blk = documents.doc_id // {B}) AS in_block
  FROM documents)
SELECT doc_id,
       (NOT in_block) OR pos = 0 AS is_terminal,
       CAST(CASE WHEN in_block
            THEN doc_id - r + (({B} - phase) * {INV}) % {B}
            ELSE doc_id END AS BIGINT) AS final_url,
       CAST(CASE WHEN in_block THEN pos ELSE 0 END AS BIGINT) AS n_hops
FROM d
"""


REDIRECT_RESOLVE = _redirect_resolve_sql()


# --- weighted priority sampling ------------------------------------------------
# Mirrors textstats.q_priority_sample with ONE plain window per source
# (the engine's salted two-phase window is an execution strategy, not
# a semantics change): identical MINSTD hash, identical integer key
# floor(w·2^31/h) via HUGEINT //, identical τ and ŵ scale.


def _priority_sample_sql() -> str:
    from go_crawler_spark.functions.textstats import (
        PRIO_K,
        PRIO_SCALE,
        SAMPLE_MINSTD,
        SAMPLE_P31,
    )

    return f"""
WITH keyed AS (
  SELECT source, doc_id, GREATEST(n_chars, 1) AS w,
         CAST((CAST(GREATEST(n_chars, 1) AS HUGEINT) * {PRIO_SCALE})
              // (doc_id % {SAMPLE_P31} * {SAMPLE_MINSTD} % {SAMPLE_P31}
                  * {SAMPLE_MINSTD} % {SAMPLE_P31} + 1) AS BIGINT)
           AS prio_key
  FROM documents),
ranked AS (
  SELECT source, doc_id, w, prio_key,
         CAST(row_number() OVER (PARTITION BY source
                ORDER BY prio_key DESC, doc_id ASC) AS BIGINT) AS rk
  FROM keyed),
tau AS (
  SELECT source, doc_id, w, prio_key, rk,
         COALESCE(MAX(CASE WHEN rk = {PRIO_K + 1} THEN prio_key END)
                  OVER (PARTITION BY source), 0) AS tau_key
  FROM ranked)
SELECT source, doc_id, w, prio_key, rk, tau_key,
       GREATEST(w * {PRIO_SCALE}, tau_key) AS w_hat_scaled
FROM tau WHERE rk <= {PRIO_K}
"""


PRIORITY_SAMPLE = _priority_sample_sql()

# --- HLL set operations -------------------------------------------------------
# Mirrors sketches.q_hll_set_ops — identical hash/register/rank math as
# HLL_DISTINCT, built per shard (l_suppkey parity), the union sketch as
# a register-wise MAX over the two register tables, and the
# inclusion-exclusion intersection with the same left-associated
# double arithmetic. Exact side via COUNT(DISTINCT CASE ...).


def _hll_set_ops_sql() -> str:
    from go_crawler_spark.functions.sketches import (
        HLL_M,
        HLL_MIX_A,
        HLL_MIX_B,
        HLL_VALUE_BITS,
    )

    r1 = HLL_VALUE_BITS + 1

    def est(regs: str, alias: str, with_m: bool = False) -> str:
        m_col = f"CAST({HLL_M} AS INT) AS m,\n         " if with_m else ""
        return f"""
  SELECT {m_col}CAST(0.7213 AS DOUBLE)
           / (CAST(1.0 AS DOUBLE)
              + CAST(1.079 AS DOUBLE) / CAST({HLL_M} AS DOUBLE))
           * CAST({HLL_M} AS DOUBLE) * CAST({HLL_M} AS DOUBLE)
           / (SUM(power(CAST(2.0 AS DOUBLE), -m_rank))
              + CAST({HLL_M} - count(*) AS DOUBLE)) AS {alias}
  FROM {regs}"""

    regs = (
        f"SELECT h % {HLL_M} AS register,\n"
        f"         MAX(CASE WHEN h // {HLL_M} = 0 THEN {r1}\n"
        f"                  ELSE {r1} - length(bin(h // {HLL_M})) END)"
        f" AS m_rank\n"
    )
    return f"""
WITH keys AS (
  SELECT CAST(l_orderkey AS VARCHAR) AS k, (l_suppkey % 2 = 0) AS in_a
  FROM lineitem),
hashed AS (
  SELECT (({_poly_hash_sql('k')} * {HLL_MIX_A}) % {P31} * {HLL_MIX_B})
           % {P31} AS h,
         in_a
  FROM keys),
regs_a AS (
  {regs}  FROM hashed WHERE in_a GROUP BY 1),
regs_b AS (
  {regs}  FROM hashed WHERE NOT in_a GROUP BY 1),
regs_u AS (
  SELECT register, MAX(m_rank) AS m_rank
  FROM (SELECT * FROM regs_a UNION ALL SELECT * FROM regs_b)
  GROUP BY 1),
est_a AS ({est('regs_a', 'est_a')}),
est_b AS ({est('regs_b', 'est_b')}),
est_u AS ({est('regs_u', 'est_union', with_m=True)}),
exact AS (
  SELECT CAST(count(DISTINCT CASE WHEN in_a THEN k END) AS BIGINT)
           AS exact_a,
         CAST(count(DISTINCT CASE WHEN NOT in_a THEN k END) AS BIGINT)
           AS exact_b,
         CAST(count(DISTINCT k) AS BIGINT) AS exact_union
  FROM keys)
SELECT m, est_a, est_b, est_union,
       est_a + est_b - est_union AS est_intersect,
       exact_a, exact_b, exact_union,
       CAST(exact_a + exact_b - exact_union AS BIGINT) AS exact_intersect
FROM est_u CROSS JOIN est_a CROSS JOIN est_b CROSS JOIN exact
"""


HLL_SET_OPS = _hll_set_ops_sql()

# --- Good-Turing discounted counts ---------------------------------------------
# Mirrors textstats.q_good_turing: the same bigram-count CTE as
# NGRAM_COUNT_OF_COUNTS (shared heavy pass), then the discount table
# r* = (r+1)·N_{r+1}/N_r over a generate_series grid. The two float
# columns are single divisions of exact BIGINTs — correctly-rounded
# IEEE in both engines, no fold order to replicate.


def _good_turing_sql() -> str:
    from go_crawler_spark.functions.textstats import GT_MAX_R

    return f"""
WITH toks AS (
  SELECT doc_id, {_TOK_LOWER} AS ts FROM documents),
grams AS (
  SELECT ts[CAST(i AS INT)] || ' ' || ts[CAST(i AS INT) + 1] AS bigram
  FROM toks, unnest(generate_series(1, len(ts) - 1)) AS u(i)
  WHERE len(ts) >= 2),
counts AS (
  SELECT bigram, CAST(count(*) AS BIGINT) AS c0 FROM grams GROUP BY bigram),
nc AS (
  SELECT c0 AS r, CAST(count(*) AS BIGINT) AS n_r FROM counts GROUP BY 1),
totals AS (
  SELECT CAST(sum(c0) AS BIGINT) AS total_grams,
         CAST(sum(CASE WHEN c0 = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n1
  FROM counts),
grid AS (
  SELECT CAST(g.r AS BIGINT) AS r
  FROM unnest(generate_series(1, {GT_MAX_R})) AS g(r))
SELECT g.r AS r, a.n_r AS n_r,
       CAST(COALESCE(b.n_r, 0) AS BIGINT) AS n_r1,
       (g.r + 1) * CAST(COALESCE(b.n_r, 0) AS BIGINT) / a.n_r AS r_star,
       t.total_grams AS total_grams,
       t.n1 / t.total_grams AS p0_unseen
FROM grid g
JOIN nc a ON a.r = g.r
LEFT JOIN nc b ON b.r = g.r + 1
CROSS JOIN totals t
"""


GOOD_TURING = _good_turing_sql()

# --- dihedral-invariant phash dedup ---------------------------------------------
# Mirrors multimodal.q_phash_dihedral via the golden-rows pattern:
# phash_dihedral_golden() canonicalizes through the PIXEL road (8
# dihedral_transform'd arrays, each re-hashed by the integer-exact
# kernel) while the engine permutes the bits of ONE hash — the VALUES
# agree only if the permutation algebra is right. Joined back to
# documents on the base doc id (img_id % DIH_VARIANT_OFFSET).


def _phash_dihedral_golden_values() -> str:
    from go_crawler_spark.functions.multimodal import phash_dihedral_golden

    return ",\n    ".join(
        f"({i}, {p}, {d}, {c}, {g})"
        for i, p, d, c, g in phash_dihedral_golden()
    )


def _phash_dihedral_sql() -> str:
    from go_crawler_spark.functions.multimodal import DIH_VARIANT_OFFSET

    return f"""
WITH golden(img_id, phash, dihedral_phash, canon_img, group_size) AS (
  VALUES
    {_phash_dihedral_golden_values()})
SELECT CAST(g.img_id AS BIGINT)         AS img_id,
       CAST(g.phash AS BIGINT)          AS phash,
       CAST(g.dihedral_phash AS BIGINT) AS dihedral_phash,
       CAST(g.canon_img AS BIGINT)      AS canon_img,
       CAST(g.group_size AS BIGINT)     AS group_size
FROM golden g
JOIN documents d ON d.doc_id = g.img_id % {DIH_VARIANT_OFFSET}
"""


PHASH_DIHEDRAL = _phash_dihedral_sql()

# --- phash threshold accuracy audit ----------------------------------------------
# Mirrors multimodal.q_phash_threshold_audit via golden VALUES from the
# pure-Python brute-force sweep. The rows are corpus-level aggregates
# over the PINNED doc_id < PHASH_N_DOCS corpus (documents ≥ 500 at
# every SF, so the corpus is complete everywhere) — no per-row doc join
# is possible or needed.


def _phash_threshold_audit_sql() -> str:
    from go_crawler_spark.functions.multimodal import (
        phash_threshold_audit_golden,
    )

    values = ",\n    ".join(
        f"({t}, {fl}, {tp}, {fp}, {fn}, {tt})"
        for t, fl, tp, fp, fn, tt in phash_threshold_audit_golden()
    )
    return f"""
WITH golden(t, n_flagged, n_tp, n_fp, n_fn, n_true_total) AS (
  VALUES
    {values})
SELECT CAST(t AS BIGINT)            AS t,
       CAST(n_flagged AS BIGINT)    AS n_flagged,
       CAST(n_tp AS BIGINT)         AS n_tp,
       CAST(n_fp AS BIGINT)         AS n_fp,
       CAST(n_fn AS BIGINT)         AS n_fn,
       CAST(n_true_total AS BIGINT) AS n_true_total
FROM golden
"""


PHASH_THRESHOLD_AUDIT = _phash_threshold_audit_sql()

# --- HRW rendezvous shard ---------------------------------------------------------
# Mirrors relational.q_hrw_shard: distinct hosts, packed-argmax
# rendezvous weight per shard at both fleet sizes. The oracle unnests
# a shard series and MAXes the packed key — a different mechanism than
# the engine's array_max fold, so the hash gate checks the assignment
# semantics, not the implementation.


def _hrw_shard_sql() -> str:
    from go_crawler_spark.functions.relational import (
        BUDGET_HOST_MOD,
        HRW_A,
        HRW_C,
        HRW_N_A,
        HRW_N_B,
        HRW_P,
    )

    def comb(n: int) -> str:
        return (
            f"(SELECT MAX((h.host_num % {HRW_P} + (s.k + 1) * {HRW_C}) "
            f"* {HRW_A} % {HRW_P} * 64 + (63 - s.k)) "
            f"FROM unnest(generate_series(0, {n - 1})) AS s(k))"
        )

    return f"""
WITH hosts AS (
  SELECT DISTINCT CAST(o_orderkey % {BUDGET_HOST_MOD} AS BIGINT) AS host_num
  FROM orders),
packed AS (
  SELECT host_num,
         {comb(HRW_N_A)} AS comb_a,
         {comb(HRW_N_B)} AS comb_b
  FROM hosts h)
SELECT printf('host-%d.example.com', host_num) AS host,
       host_num,
       CAST(63 - comb_a % 64 AS BIGINT) AS shard_a,
       CAST(63 - comb_b % 64 AS BIGINT) AS shard_b,
       (63 - comb_a % 64) <> (63 - comb_b % 64) AS moved
FROM packed
"""


HRW_SHARD = _hrw_shard_sql()

# --- Heaps'-law vocabulary growth -------------------------------------------------
# Mirrors textstats.q_heaps_vocab_growth: integer prefix buckets
# b = doc_id*10 // (max_doc_id+1), per-token min bucket, ten-row
# cumulative sums.


def _heaps_vocab_growth_sql() -> str:
    from go_crawler_spark.functions.textstats import HEAPS_BUCKETS

    return f"""
WITH mx AS (SELECT CAST(MAX(doc_id) + 1 AS BIGINT) AS m FROM documents),
tb AS (
  SELECT CAST(d.doc_id * {HEAPS_BUCKETS} // mx.m AS BIGINT) AS bucket,
         unnest({_TOK_LOWER}) AS tok
  FROM documents d, mx),
firstb AS (SELECT tok, MIN(bucket) AS bucket FROM tb GROUP BY tok),
v AS (SELECT bucket, CAST(count(*) AS BIGINT) AS new_vocab
      FROM firstb GROUP BY bucket),
t AS (SELECT bucket, CAST(count(*) AS BIGINT) AS n_tokens
      FROM tb GROUP BY bucket),
bs AS (SELECT CAST(unnest(generate_series(0, {HEAPS_BUCKETS - 1})) AS BIGINT)
              AS bucket)
SELECT bs.bucket,
       CAST(SUM(COALESCE(t.n_tokens, 0))
            OVER (ORDER BY bs.bucket) AS BIGINT) AS cum_tokens,
       CAST(SUM(COALESCE(v.new_vocab, 0))
            OVER (ORDER BY bs.bucket) AS BIGINT) AS cum_vocab
FROM bs
LEFT JOIN t ON t.bucket = bs.bucket
LEFT JOIN v ON v.bucket = bs.bucket
"""


HEAPS_VOCAB_GROWTH = _heaps_vocab_growth_sql()

# --- posting-list delta/varint size ----------------------------------------------
# Mirrors search.q_postings_delta_bytes: distinct (term, doc_id)
# postings, doc_id-sorted gaps via lag (first gap = doc_id + 1),
# 7-bit-group varint byte count, integer permille savings.


def _postings_delta_bytes_sql() -> str:
    from go_crawler_spark.functions.search import INDEX_DF_MIN, VARINT_STEPS

    vb = " + ".join(
        f"CASE WHEN gap >= {s} THEN 1 ELSE 0 END" for s in VARINT_STEPS
    )
    return f"""
WITH postings AS (
  SELECT DISTINCT doc_id, unnest({_TOK_LOWER}) AS term FROM documents),
gaps AS (
  SELECT term,
         doc_id - LAG(doc_id, 1, -1)
                  OVER (PARTITION BY term ORDER BY doc_id) AS gap
  FROM postings),
agg AS (
  SELECT term, CAST(count(*) AS BIGINT) AS df,
         CAST(SUM(1 + {vb}) AS BIGINT) AS varint_bytes
  FROM gaps GROUP BY term)
SELECT term, df,
       CAST(df * 8 AS BIGINT) AS raw_bytes,
       varint_bytes,
       CAST((df * 8 - varint_bytes) * 1000 // (df * 8) AS BIGINT)
         AS savings_permille
FROM agg
WHERE df >= {INDEX_DF_MIN}
"""


POSTINGS_DELTA_BYTES = _postings_delta_bytes_sql()

# --- thumbnail-pyramid sizing ------------------------------------------------------
# Mirrors multimodal.q_thumb_pyramid_bytes: golden (doc_id, w, h) from
# the pure-Python codec replay; EVERY sizing column re-derives in SQL
# (ceil-div levels via generate_series, min-edge floor, geometric
# byte sum) — the hash gate checks the algebra, not a copied value.


def _thumb_pyramid_sql() -> str:
    from go_crawler_spark.functions.multimodal import (
        PYR_MAX_LVL,
        PYR_MIN_DIM,
        thumb_pyramid_golden,
    )

    values = ",\n    ".join(
        f"({d}, {w}, {h})" for d, w, h in thumb_pyramid_golden()
    )
    return f"""
WITH golden(doc_id, w, h) AS (
  VALUES
    {values}),
lv AS (
  SELECT doc_id,
         (w + (1 << s.k) - 1) // (1 << s.k) AS cw,
         (h + (1 << s.k) - 1) // (1 << s.k) AS ch
  FROM golden, unnest(generate_series(0, {PYR_MAX_LVL})) AS s(k)),
ok AS (SELECT * FROM lv WHERE least(cw, ch) >= {PYR_MIN_DIM}),
agg AS (
  SELECT doc_id, CAST(count(*) AS BIGINT) AS n_levels,
         CAST(SUM(cw * ch * 3) AS BIGINT) AS pyramid_bytes
  FROM ok GROUP BY doc_id)
SELECT CAST(g.doc_id AS BIGINT) AS doc_id,
       CAST(g.w AS BIGINT) AS w,
       CAST(g.h AS BIGINT) AS h,
       COALESCE(a.n_levels, 0) AS n_levels,
       CAST(g.w * g.h * 3 AS BIGINT) AS base_bytes,
       COALESCE(a.pyramid_bytes, 0) AS pyramid_bytes,
       CAST(COALESCE(a.pyramid_bytes, 0) * 1000 // (g.w * g.h * 3)
            AS BIGINT) AS overhead_permille
FROM golden g
LEFT JOIN agg a USING (doc_id)
"""


THUMB_PYRAMID = _thumb_pyramid_sql()

# --- host-skew audit --------------------------------------------------------------
# Mirrors relational.q_host_skew: demand histogram, closed-form tie-
# group rank sums (Gini needs no per-host sort), top-1% from the hot
# end of the same histogram, HUGEINT // for the two permille ratios
# (Spark side rides _mul_floordiv_wide).


def _host_skew_sql() -> str:
    from go_crawler_spark.functions.relational import SKEW_HOST_MOD

    return f"""
WITH demand AS (
  SELECT o_orderkey % {SKEW_HOST_MOD} AS host_num,
         CAST(count(*) AS BIGINT) AS d
  FROM orders GROUP BY 1),
hist AS (SELECT d, CAST(count(*) AS BIGINT) AS n_h FROM demand GROUP BY d),
g AS (
  SELECT d, n_h,
    COALESCE(SUM(n_h) OVER (ORDER BY d ASC
      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS below,
    COALESCE(SUM(n_h) OVER (ORDER BY d DESC
      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS above
  FROM hist),
tot AS (
  SELECT CAST(SUM(n_h) AS BIGINT) AS n,
         CAST(SUM(n_h * d) AS BIGINT) AS t,
         CAST(SUM(d * (n_h * below + (n_h * (n_h + 1)) // 2)) AS BIGINT)
           AS r
  FROM g),
topt AS (
  SELECT CAST(SUM(d * GREATEST(0, LEAST(n_h,
           (SELECT (n + 99) // 100 FROM tot) - above))) AS BIGINT) AS top_t
  FROM g)
SELECT n AS n_hosts,
       t AS total_demand,
       CAST((2 * CAST(r AS HUGEINT) - (CAST(n AS HUGEINT) + 1) * t) * 1000
            // (CAST(n AS HUGEINT) * t) AS BIGINT) AS gini_permille,
       CAST((n + 99) // 100 AS BIGINT) AS top1pct_hosts,
       CAST(CAST(top_t AS HUGEINT) * 1000 // t AS BIGINT)
         AS top1pct_share_permille
FROM tot, topt
"""


HOST_SKEW = _host_skew_sql()

# --- Zipf head audit --------------------------------------------------------------
# Mirrors textstats.q_zipf_topk: token frequencies, (freq desc, term
# asc) head of ZIPF_TOPK, integer rank*freq products and the permille
# ratio to the top frequency.


def _zipf_topk_sql() -> str:
    from go_crawler_spark.functions.textstats import ZIPF_TOPK

    return f"""
WITH toks AS (
  SELECT unnest({_TOK_LOWER}) AS term FROM documents),
freq AS (
  SELECT term, CAST(count(*) AS BIGINT) AS freq FROM toks GROUP BY term),
head AS (
  SELECT term, freq,
         CAST(row_number() OVER (ORDER BY freq DESC, term ASC) AS BIGINT)
           AS rank
  FROM freq
  ORDER BY freq DESC, term ASC
  LIMIT {ZIPF_TOPK}),
top1 AS (SELECT freq AS f1 FROM head WHERE rank = 1)
SELECT h.rank, h.term, h.freq,
       CAST(h.rank * h.freq AS BIGINT) AS rf_product,
       CAST(h.rank * h.freq * 1000 // t.f1 AS BIGINT) AS rf_permille
FROM head h, top1 t
"""


ZIPF_TOPK_SQL = _zipf_topk_sql()

# --- token-budget apportionment ----------------------------------------------------
# Mirrors textstats.q_token_budget_apportion: identical wq
# quantization (the one pow() on exact BIGINT-derived doubles — the
# SOURCE_MIX_WEIGHTS parity argument), HUGEINT floor quota, exact
# largest-remainder bonus ranked (rem desc, source asc).


def _token_budget_apportion_sql() -> str:
    from go_crawler_spark.functions.textstats import (
        APPORTION_BUDGET,
        MIX_ALPHA,
        MIX_SCALE,
    )

    return f"""
WITH per AS (
  SELECT source, CAST(sum(len({_TOK})) AS BIGINT) AS src_tokens
  FROM documents GROUP BY source),
tot AS (
  SELECT CAST(sum(src_tokens) AS BIGINT) AS tot_tokens FROM per),
q AS (
  SELECT source, src_tokens,
         CAST(floor(pow(CAST(src_tokens AS DOUBLE) / CAST(tot_tokens AS DOUBLE),
                        {MIX_ALPHA}) * {MIX_SCALE}) AS BIGINT) AS wq
  FROM per CROSS JOIN tot),
den AS (SELECT CAST(sum(wq) AS BIGINT) AS sum_wq FROM q),
base AS (
  SELECT source, src_tokens, wq, sum_wq,
         CAST((CAST(wq AS HUGEINT) * {APPORTION_BUDGET}) // sum_wq
              AS BIGINT) AS floor_quota
  FROM q CROSS JOIN den),
b2 AS (
  SELECT *, wq * {APPORTION_BUDGET} - floor_quota * sum_wq AS rem_num
  FROM base),
lo AS (
  SELECT CAST({APPORTION_BUDGET} - sum(floor_quota) AS BIGINT) AS leftover
  FROM b2),
rk AS (
  SELECT *, row_number() OVER (ORDER BY rem_num DESC, source ASC) AS r
  FROM b2)
SELECT source, src_tokens, floor_quota,
       CAST(rem_num AS BIGINT) AS rem_num,
       CAST(floor_quota + CASE WHEN r <= leftover THEN 1 ELSE 0 END
            AS BIGINT) AS alloc
FROM rk CROSS JOIN lo
"""


TOKEN_BUDGET_APPORTION = _token_budget_apportion_sql()

# --- cross-source duplication audit ------------------------------------------------
# Mirrors cleaning.q_cross_source_dup: distinct (leading-5-token key,
# source), self-join on the key with src_a < src_b, count shared keys
# per pair. string_split(text, ' ') matches Spark's split-on-space
# (empties retained, slice clamps on short docs) exactly.

CROSS_SOURCE_DUP = """
WITH d AS (
  SELECT DISTINCT
         array_to_string((string_split(text, ' '))[1:5], ' ') AS dup_key,
         source
  FROM documents),
p AS (
  SELECT a.source AS src_a, b.source AS src_b
  FROM d a JOIN d b ON a.dup_key = b.dup_key AND a.source < b.source)
SELECT src_a, src_b, CAST(count(*) AS BIGINT) AS n_shared_keys
FROM p GROUP BY src_a, src_b
"""
