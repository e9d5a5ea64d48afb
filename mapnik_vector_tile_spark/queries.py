"""Driver-facing query registry (__spark_entry__ delegates here).

Each SQL-expressible operator is written ONCE as a SQL template over the
driver's pre-registered tables (region nation customer supplier part
orders lineitem events documents embeddings). The same text runs through
Spark SQL (temp views over the parquet) and DuckDB (driver oracle) —
dialect differences are isolated in tiny snippet helpers (``_hash60``).

Floating-point outputs are rounded to 6 decimals on both sides so a
1-ulp libm-vs-JVM difference can't flip the driver's value hash.

Spatial queries derive deterministic lon/lat from integer keys
(tilemath.key_lonlat_sql) because the TPC-H-ish oracle tables carry no
coordinates; the *images* pipeline (real payload) is exercised by
pytest goldens and the non-SQL queries instead.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from mapnik_vector_tile_spark import tilemath

TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


# session -> sf_dir whose views are currently registered. Re-reading 10
# parquet footers per query call cost ~0.7s per timed SQL leg (r7
# measurement) for views that were already in place; registration is
# idempotent per (session, sf_dir), so skip it when the session's views
# already point at this directory. Weak keys: a stopped session's entry
# dies with the session object.
import weakref

_VIEWS_AT: "weakref.WeakKeyDictionary[SparkSession, str]" = weakref.WeakKeyDictionary()


def _register_views(spark: SparkSession, sf_dir: str) -> None:
    if _VIEWS_AT.get(spark) == sf_dir:
        return
    for t in TABLES:
        spark.read.parquet(f"{sf_dir}/{t}.parquet").createOrReplaceTempView(t)
    _VIEWS_AT[spark] = sf_dir


def _hash60(expr: str, dialect: str) -> str:
    """Portable md5-derived 60-bit non-negative BIGINT hash."""
    if dialect == "spark":
        return f"cast(conv(substr(md5(cast({expr} as string)), 1, 15), 16, 10) as bigint)"
    return f"cast(concat('0x', substr(md5(cast({expr} as varchar)), 1, 15)) as bigint)"


def _values_seq(n: int, alias: str, col: str) -> str:
    """(VALUES (0),(1),...) AS alias(col) — portable integer sequence."""
    vals = ",".join(f"({i})" for i in range(n))
    return f"(VALUES {vals}) AS {alias}({col})"


# ---------------------------------------------------------------------------
# S P A T I A L  /  T I L I N G   (J1, P1, J2, J5, P6, A4)
# ---------------------------------------------------------------------------

def q_tile_assign_z13(dialect: str) -> str:
    """J1: cell assignment + per-tile counts at z13 over orders points."""
    loc = tilemath.key_lonlat_sql("o_orderkey")
    cell = tilemath.lonlat_to_tile_sql(13, loc["lon"], loc["lat"])
    return f"""
SELECT 13 AS z, {cell['x']} AS x, {cell['y']} AS y,
       count(*) AS n_rows,
       min(o_orderkey) AS min_key
FROM orders
GROUP BY 1, 2, 3
"""


def q_tile_bbox_z3(dialect: str) -> str:
    """P1: tile_mercator_bbox (src/vector_tile_projection.hpp:17-28) for
    every z3 tile that receives at least one customer point."""
    loc = tilemath.key_lonlat_sql("c_custkey")
    cell = tilemath.lonlat_to_tile_sql(3, loc["lon"], loc["lat"])
    bbox = tilemath.tile_bbox_sql(3, "x", "y")
    return f"""
WITH cells AS (
  SELECT DISTINCT {cell['x']} AS x, {cell['y']} AS y FROM customer
)
SELECT 3 AS z, x, y,
       round({bbox['minx']}, 6) AS minx,
       round({bbox['miny']}, 6) AS miny,
       round({bbox['maxx']}, 6) AS maxx,
       round({bbox['maxy']}, 6) AS maxy
FROM cells
"""


def q_pip_join_z3(dialect: str) -> str:
    """J2: point-in-polygon join of customer points against the full z3
    tile-boundary grid (rect refine, half-open [min, max) like the
    reference's bbox intersects), buffer_px = 0."""
    loc = tilemath.key_lonlat_sql("c_custkey")
    merc = tilemath.mercator_sql(loc["lon"], loc["lat"])
    bbox = tilemath.tile_bbox_sql(3, "g.x", "g.y")
    return f"""
WITH grid AS (
  SELECT xs.x AS x, ys.y AS y
  FROM {_values_seq(8, 'xs', 'x')} CROSS JOIN {_values_seq(8, 'ys', 'y')}
),
pts AS (
  SELECT c_custkey, {merc['mx']} AS mx, {merc['my']} AS my FROM customer
)
SELECT p.c_custkey AS point_id, 3 AS z, g.x AS x, g.y AS y
FROM pts p CROSS JOIN grid g
WHERE p.mx >= {bbox['minx']} AND p.mx < {bbox['maxx']}
  AND p.my >= {bbox['miny']} AND p.my < {bbox['maxy']}
"""


def q_knn_k5(dialect: str) -> str:
    """J5 oracle form: exact kNN (k=5, squared-euclidean on derived
    lon/lat, ties by neighbour key) for the 20 smallest custkeys.
    The scalable ring-expansion operator (operators/knn.py) must agree."""
    ql = tilemath.key_lonlat_sql("q.c_custkey")
    cl = tilemath.key_lonlat_sql("c.c_custkey")
    return f"""
WITH q AS (
  SELECT c_custkey FROM customer ORDER BY c_custkey LIMIT 20
),
pairs AS (
  SELECT q.c_custkey AS query_id, c.c_custkey AS neighbor_id,
         ({ql['lon']} - {cl['lon']}) * ({ql['lon']} - {cl['lon']})
       + ({ql['lat']} - {cl['lat']}) * ({ql['lat']} - {cl['lat']}) AS d2
  FROM q CROSS JOIN customer c
  WHERE q.c_custkey <> c.c_custkey
),
ranked AS (
  SELECT query_id, neighbor_id, d2,
         row_number() OVER (PARTITION BY query_id ORDER BY d2, neighbor_id) AS rank
  FROM pairs
)
SELECT query_id, neighbor_id, rank, round(d2, 6) AS d2
FROM ranked WHERE rank <= 5
"""


def q_scale_visibility(dialect: str) -> str:
    """P6: scale-denominator / zoom-visibility filter
    (src/vector_tile_layer.hpp:271-281; test scale_denom_filter.cpp) —
    layers (here: parts) visible only within their [min_zoom, max_zoom]."""
    return """
WITH layers AS (
  SELECT p_partkey, p_size % 15 AS min_zoom, p_size % 15 + 4 AS max_zoom FROM part
),
zooms AS (SELECT z FROM (VALUES (0),(3),(7),(13),(14)) AS t(z))
SELECT z, count(*) AS visible_layers
FROM layers CROSS JOIN zooms
WHERE z >= min_zoom AND z <= max_zoom
GROUP BY z
"""


def q_painted_stats(dialect: str) -> str:
    """A4/A5: per-tile painted/empty + per-type counts analogue
    (src/vector_tile_tile.hpp:115-123, vector_tile_is_valid.hpp:122-237):
    z7 tiles over supplier points, counting rows per 'geom type' class."""
    loc = tilemath.key_lonlat_sql("s_suppkey")
    cell = tilemath.lonlat_to_tile_sql(7, loc["lon"], loc["lat"])
    return f"""
SELECT {cell['x']} AS x, {cell['y']} AS y,
       count(*) AS n_features,
       cast(sum(CASE WHEN s_suppkey % 3 = 0 THEN 1 ELSE 0 END) as bigint) AS n_points,
       cast(sum(CASE WHEN s_suppkey % 3 = 1 THEN 1 ELSE 0 END) as bigint) AS n_lines,
       cast(sum(CASE WHEN s_suppkey % 3 = 2 THEN 1 ELSE 0 END) as bigint) AS n_polys,
       count(DISTINCT s_nationkey) AS n_layers
FROM supplier
GROUP BY 1, 2
"""


# ---------------------------------------------------------------------------
# R E L A T I O N A L   M E C H A N I C S  (scan/filter/agg/join/window/set)
# ---------------------------------------------------------------------------

def q_agg_pushdown(dialect: str) -> str:
    """S1/P8: scan with predicate + column pruning into a grouped agg
    (TPC-H Q1 shape)."""
    return """
SELECT l_returnflag, l_linestatus,
       round(sum(l_quantity), 4) AS sum_qty,
       round(sum(l_extendedprice), 4) AS sum_base_price,
       round(sum(l_extendedprice * (1 - l_discount)), 4) AS sum_disc_price,
       round(avg(l_quantity), 6) AS avg_qty,
       count(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
GROUP BY l_returnflag, l_linestatus
"""


def q_broadcast_join_agg(dialect: str) -> str:
    """Broadcast-style dim join (J6 mechanics): revenue per market segment."""
    return """
SELECT c.c_mktsegment AS segment,
       count(*) AS n_orders,
       round(sum(o.o_totalprice), 4) AS revenue
FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
GROUP BY c.c_mktsegment
"""


def q_topk_per_group(dialect: str) -> str:
    """T3: top-3 orders by price per priority via window row_number."""
    return """
WITH ranked AS (
  SELECT o_orderpriority, o_orderkey, o_totalprice,
         row_number() OVER (PARTITION BY o_orderpriority
                            ORDER BY o_totalprice DESC, o_orderkey) AS rank
  FROM orders
)
SELECT o_orderpriority, o_orderkey, round(o_totalprice, 4) AS o_totalprice, rank
FROM ranked WHERE rank <= 3
"""


def q_merge_layers_union(dialect: str) -> str:
    """J3 relational core: composite/merge = union-by-name + first-wins
    on duplicate layer names (src/vector_tile_composite.hpp:48-76).
    Sources = two 'tile sets' (odd/even orders); first source wins."""
    return """
WITH src1 AS (
  SELECT o_orderkey % 100 AS layer_id, 1 AS src, count(*) AS n
  FROM orders WHERE o_orderkey % 2 = 0 GROUP BY 1
),
src2 AS (
  SELECT o_orderkey % 100 AS layer_id, 2 AS src, count(*) AS n
  FROM orders WHERE o_orderkey % 3 = 0 GROUP BY 1
),
unioned AS (
  SELECT * FROM src1 UNION ALL SELECT * FROM src2
),
ranked AS (
  SELECT layer_id, src, n,
         row_number() OVER (PARTITION BY layer_id ORDER BY src) AS pick
  FROM unioned
)
SELECT layer_id, src, n FROM ranked WHERE pick = 1
"""


def q_events_hourly(dialect: str) -> str:
    """Streaming-shaped batch agg: events per type per hour-of-day."""
    return """
SELECT event_type, extract(hour FROM ts) AS hour_of_day,
       count(*) AS n, round(sum(value), 4) AS total_value
FROM events
GROUP BY event_type, extract(hour FROM ts)
"""


def q_events_sessions(dialect: str) -> str:
    """Gap-based sessionization (30-min inactivity) via lag + running
    sum — the SQL twin of the streaming applyInPandasWithState
    sessionizer (streaming/incremental.py). Epoch seconds are truncated
    identically on both engines (Spark unix_timestamp truncates; DuckDB
    epoch() keeps the fraction, hence the floor)."""
    epoch = (
        "unix_timestamp(ts)" if dialect == "spark"
        else "cast(floor(epoch(ts)) AS bigint)"
    )
    return f"""
WITH marked AS (
  SELECT user_id, event_id, {epoch} AS es,
         CASE WHEN {epoch} - lag({epoch}) OVER (
                  PARTITION BY user_id ORDER BY ts, event_id
              ) > 1800
              OR lag({epoch}) OVER (
                  PARTITION BY user_id ORDER BY ts, event_id
              ) IS NULL
              THEN 1 ELSE 0 END AS new_session
  FROM events
),
sess AS (
  SELECT user_id, es,
         cast(sum(new_session) OVER (
             PARTITION BY user_id ORDER BY es, event_id
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
         ) AS bigint) AS session_id
  FROM marked
)
SELECT user_id, session_id,
       count(*) AS n_events,
       max(es) - min(es) AS duration_s
FROM sess
GROUP BY user_id, session_id
"""


# ---------------------------------------------------------------------------
# T R A I N I N G - D A T A   P I P E L I N E   (dedup / text / similarity)
# ---------------------------------------------------------------------------

def q_dedup_exact(dialect: str) -> str:
    """Exact dedup by content hash over documents."""
    h = _hash60("text", dialect)
    return f"""
SELECT {h} AS content_hash,
       count(*) AS n_dups,
       min(doc_id) AS representative
FROM documents
GROUP BY 1
"""


def q_text_quality(dialect: str) -> str:
    """Quality scoring: char/token counts + crude punct/space ratios."""
    return """
SELECT doc_id,
       length(text) AS n_chars_measured,
       (length(text) - length(replace(text, ' ', '')) + 1) AS n_tokens,
       round(cast(length(text) - length(replace(text, ' ', '')) as double)
             / length(text), 6) AS space_ratio,
       CASE WHEN length(text) >= 64 THEN 1 ELSE 0 END AS len_ok
FROM documents
WHERE length(text) > 0
"""


def q_lang_profile(dialect: str) -> str:
    """Language profile: docs + avg length per (lang, source)."""
    return """
SELECT lang, source, count(*) AS n_docs,
       round(avg(n_chars), 6) AS avg_chars,
       min(doc_id) AS first_doc
FROM documents
GROUP BY lang, source
"""


def q_stratified_sample(dialect: str) -> str:
    """Deterministic stratified sampling — the dataset-curation step
    between filtering and training-set export: up to K docs per
    (lang, source) stratum, chosen by md5-hash rank so the sample is
    reproducible across engines and runs (no RNG anywhere); emits the
    kept rows with their in-stratum rank and the stratum population,
    so downstream weighting can invert the sampling rate."""
    h = _hash60("doc_id", dialect)
    return f"""
WITH strata AS (
  SELECT lang, source, count(*) AS stratum_n
  FROM documents GROUP BY lang, source
),
ranked AS (
  SELECT doc_id, lang, source,
         row_number() OVER (
           PARTITION BY lang, source ORDER BY {h}, doc_id
         ) AS rk
  FROM documents
)
SELECT cast(r.doc_id AS bigint) AS doc_id, r.lang, r.source,
       cast(r.rk AS bigint) AS rk,
       cast(s.stratum_n AS bigint) AS stratum_n
FROM ranked r
JOIN strata s ON r.lang = s.lang AND r.source = s.source
WHERE r.rk <= 10
"""


def q_curation_funnel(dialect: str) -> str:
    """The composed curation pipeline a training-data user actually
    runs, as ONE declarative query: quality filter (length + space
    ratio) -> exact dedup (min-doc representative per content hash) ->
    deterministic per-stratum sampling cap -> per-(lang, source) funnel
    counts for every stage. Catalyst sees the whole pipeline, so
    filters push below the dedup aggregation and the stages share one
    scan."""
    h_text = _hash60("text", dialect)
    h_id = _hash60("doc_id", dialect)
    return f"""
WITH raw AS (
  SELECT doc_id, text, lang, source FROM documents WHERE length(text) > 0
),
quality AS (
  SELECT * FROM raw
  WHERE length(text) >= 64
    AND cast(length(text) - length(replace(text, ' ', '')) AS double)
        / length(text) BETWEEN 0.05 AND 0.4
),
uniq AS (
  SELECT {h_text} AS content_hash, min(doc_id) AS doc_id
  FROM quality GROUP BY 1
),
kept AS (
  SELECT q.doc_id, q.lang, q.source
  FROM quality q JOIN uniq u ON q.doc_id = u.doc_id
),
ranked AS (
  SELECT doc_id, lang, source,
         row_number() OVER (
           PARTITION BY lang, source ORDER BY {h_id}, doc_id
         ) AS rk
  FROM kept
),
sampled AS (SELECT * FROM ranked WHERE rk <= 5),
s_raw AS (SELECT lang, source, count(*) AS n_raw FROM raw GROUP BY 1, 2),
s_q AS (SELECT lang, source, count(*) AS n_quality FROM quality GROUP BY 1, 2),
s_u AS (SELECT lang, source, count(*) AS n_unique FROM kept GROUP BY 1, 2),
s_s AS (
  SELECT lang, source, count(*) AS n_sampled, min(doc_id) AS min_sampled
  FROM sampled GROUP BY 1, 2
)
SELECT r.lang, r.source,
       cast(r.n_raw AS bigint) AS n_raw,
       cast(coalesce(q.n_quality, 0) AS bigint) AS n_quality,
       cast(coalesce(u.n_unique, 0) AS bigint) AS n_unique,
       cast(coalesce(s.n_sampled, 0) AS bigint) AS n_sampled,
       cast(s.min_sampled AS bigint) AS min_sampled
FROM s_raw r
LEFT JOIN s_q q ON r.lang = q.lang AND r.source = q.source
LEFT JOIN s_u u ON r.lang = u.lang AND r.source = u.source
LEFT JOIN s_s s ON r.lang = s.lang AND r.source = s.source
"""


def q_minhash_band(dialect: str) -> str:
    """MinHash(4 permutations)-style signature per doc from whitespace
    shingles, via portable md5-derived hashes; band key groups candidate
    duplicates (LSH bucket join prep). Spark-side runs the same SQL —
    the DataFrame composition lives in operators/dedup.py."""
    h = _hash60("tok.word", dialect)
    if dialect == "spark":
        tokens = "LATERAL VIEW explode(split(text, ' ')) tok AS word"
        frm = f"FROM documents {tokens}"
    else:
        frm = "FROM documents, unnest(string_split(text, ' ')) AS tok(word)"
    return f"""
WITH tok_hashes AS (
  SELECT doc_id, {h} AS th {frm}
),
sig AS (
  SELECT doc_id,
         min(((th % 2147483647) * 40503 + 17) % 2147483647) AS h0,
         min(((th % 2147483647) * 48271 + 23) % 2147483647) AS h1,
         min(((th % 2147483647) * 69621 + 31) % 2147483647) AS h2,
         min(((th % 2147483647) * 16807 + 47) % 2147483647) AS h3
  FROM tok_hashes GROUP BY doc_id
)
SELECT doc_id, h0, h1, h2, h3, (h0 % 1024) * 1024 + (h1 % 1024) AS band_key
FROM sig
"""


def q_ngram_jaccard_pairs(dialect: str) -> str:
    """n-gram (token unigram) Jaccard near-dup scores for candidate
    pairs sharing a rare token, capped deterministically."""
    h = _hash60("tok.word", dialect)
    if dialect == "spark":
        frm = "FROM documents LATERAL VIEW explode(split(text, ' ')) tok AS word"
    else:
        frm = "FROM documents, unnest(string_split(text, ' ')) AS tok(word)"
    return f"""
WITH toks AS (
  SELECT DISTINCT doc_id, {h} AS th {frm}
),
sizes AS (SELECT doc_id, count(*) AS sz FROM toks GROUP BY doc_id),
pairs AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS inter
  FROM toks a JOIN toks b ON a.th = b.th AND a.doc_id < b.doc_id
  WHERE a.doc_id < 50 AND b.doc_id < 50
  GROUP BY a.doc_id, b.doc_id
)
SELECT p.doc_a, p.doc_b,
       round(cast(p.inter as double) / (sa.sz + sb.sz - p.inter), 6) AS jaccard
FROM pairs p
JOIN sizes sa ON p.doc_a = sa.doc_id
JOIN sizes sb ON p.doc_b = sb.doc_id
WHERE cast(p.inter as double) / (sa.sz + sb.sz - p.inter) >= 0.5
"""


def q_simhash(dialect: str) -> str:
    """SimHash (16-bit, portable SQL): per-doc fingerprint from signed
    bit votes of token hashes."""
    h = _hash60("tok.word", dialect)
    if dialect == "spark":
        frm = "FROM documents LATERAL VIEW explode(split(text, ' ')) tok AS word"
    else:
        frm = "FROM documents, unnest(string_split(text, ' ')) AS tok(word)"
    bits = "\n       + ".join(
        f"(CASE WHEN sum(CASE WHEN (th % {2**(b+1)}) >= {2**b} THEN 1 ELSE -1 END) > 0 "
        f"THEN {2**b} ELSE 0 END)"
        for b in range(16)
    )
    return f"""
WITH toks AS (
  SELECT doc_id, {h} AS th {frm}
)
SELECT doc_id,
       {bits} AS simhash16
FROM toks GROUP BY doc_id
"""


def q_doc_fingerprint(dialect: str) -> str:
    """Rolling-hash document fingerprint: position-weighted token-hash
    sum in bounded integer space (overflow-free in both engines)."""
    h = _hash60("tok.word", dialect)
    if dialect == "spark":
        frm = ("FROM documents LATERAL VIEW posexplode(split(text, ' ')) tok AS pos, word")
        sel = f"SELECT doc_id, tok.pos AS pos, {h} AS th {frm}"
    else:
        h_d = _hash60("tok.word", dialect).replace("tok.word", "word")
        sel = (
            "SELECT doc_id, pos, th FROM (SELECT doc_id, "
            "unnest(string_split(text, ' ')) AS word, "
            "unnest(range(len(string_split(text, ' ')))) AS pos FROM documents) t, "
            f"LATERAL (SELECT {h_d} AS th) h"
        )
    return f"""
WITH toks AS (
  {sel}
)
SELECT doc_id,
       cast(sum((th % 1000003) * (pos + 1)) % 2147483647 as bigint) AS fingerprint
FROM toks GROUP BY doc_id
"""


def q_ann_cosine_topk(dialect: str) -> str:
    """Brute-force cosine top-5 neighbours for the first 10 vectors —
    the exactness baseline the LSH/IVF path (operators/ann.py) is
    checked against. Portable via unnest/posexplode of the embedding."""
    if dialect == "spark":
        expl = ("LATERAL VIEW posexplode(embedding) e AS i, v")
        comp = f"SELECT vec_id, i, cast(v as double) AS v FROM embeddings {expl}"
    else:
        comp = ("SELECT vec_id, unnest(range(len(embedding))) AS i, "
                "unnest(list_transform(embedding, x -> cast(x as double))) AS v "
                "FROM embeddings")
    return f"""
WITH comp AS ({comp}),
norms AS (SELECT vec_id, sqrt(sum(v * v)) AS nrm FROM comp GROUP BY vec_id),
q AS (SELECT vec_id FROM embeddings ORDER BY vec_id LIMIT 10),
dots AS (
  SELECT a.vec_id AS query_id, b.vec_id AS neighbor_id, sum(a.v * b.v) AS dot
  FROM comp a JOIN comp b ON a.i = b.i
  WHERE a.vec_id IN (SELECT vec_id FROM q) AND a.vec_id <> b.vec_id
  GROUP BY a.vec_id, b.vec_id
),
scored AS (
  SELECT d.query_id, d.neighbor_id,
         d.dot / (na.nrm * nb.nrm) AS cosine,
         row_number() OVER (PARTITION BY d.query_id
                            ORDER BY d.dot / (na.nrm * nb.nrm) DESC, d.neighbor_id) AS rank
  FROM dots d
  JOIN norms na ON d.query_id = na.vec_id
  JOIN norms nb ON d.neighbor_id = nb.vec_id
)
SELECT query_id, neighbor_id, rank, round(cosine, 6) AS cosine
FROM scored WHERE rank <= 5
"""


def q_embedding_stats(dialect: str) -> str:
    """Per-label embedding stats (count + mean L2 norm) — the 'typed
    metadata over opaque payload' pattern for multimodal columns."""
    if dialect == "spark":
        comp = ("SELECT vec_id, label, cast(v as double) AS v FROM embeddings "
                "LATERAL VIEW explode(embedding) e AS v")
    else:
        comp = ("SELECT vec_id, label, cast(v as double) AS v FROM embeddings, "
                "unnest(embedding) AS e(v)")
    return f"""
WITH comp AS ({comp}),
norms AS (SELECT vec_id, label, sqrt(sum(v * v)) AS nrm FROM comp GROUP BY vec_id, label)
SELECT label, count(*) AS n_vecs, round(avg(nrm), 6) AS avg_norm
FROM norms GROUP BY label
"""


# ---------------------------------------------------------------------------
# Registry
# ---------------------------------------------------------------------------

SQL_QUERIES: dict[str, Callable[[str], str]] = {
    "tile_assign_z13": q_tile_assign_z13,
    "tile_bbox_z3": q_tile_bbox_z3,
    "pip_join_z3": q_pip_join_z3,
    "knn_k5": q_knn_k5,
    "scale_visibility": q_scale_visibility,
    "painted_stats": q_painted_stats,
    "agg_pushdown": q_agg_pushdown,
    "broadcast_join_agg": q_broadcast_join_agg,
    "topk_per_group": q_topk_per_group,
    "merge_layers_union": q_merge_layers_union,
    "events_hourly": q_events_hourly,
    "events_sessions": q_events_sessions,
    "dedup_exact": q_dedup_exact,
    "text_quality": q_text_quality,
    "lang_profile": q_lang_profile,
    "stratified_sample": q_stratified_sample,
    "curation_funnel": q_curation_funnel,
    "minhash_band": q_minhash_band,
    "ngram_jaccard_pairs": q_ngram_jaccard_pairs,
    "simhash": q_simhash,
    "doc_fingerprint": q_doc_fingerprint,
    "ann_cosine_topk": q_ann_cosine_topk,
    "embedding_stats": q_embedding_stats,
}


def spark_query(name: str) -> Callable[[SparkSession, str], DataFrame]:
    def run(spark: SparkSession, sf_dir: str) -> DataFrame:
        _register_views(spark, sf_dir)
        return spark.sql(SQL_QUERIES[name]("spark"))

    return run


def oracle_sql_for(name: str) -> str:
    return SQL_QUERIES[name]("duckdb")
