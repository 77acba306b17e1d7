"""DuckDB oracle SQL for every SQL-expressible operator.

The driver runs each Spark query side by side with this ANSI SQL on the
same parquet tables (views: region nation customer supplier part orders
lineitem events documents embeddings) and compares row count + schema +
order-insensitive value hash. Column names/aliases here MUST match the
Spark DataFrames exactly.

The shared CTE prefix reproduces sources/interleaved.py's deterministic
derivation (tokenize → spans → dictionary → closed-form redirect
canonicalization). The engine resolves redirects *iteratively*
(operators/linking.py); the oracle uses the closed form — chains are
9→8→7→6, so `id - (id%10 - 6)` — which makes the oracle an independent
implementation, not a restatement.
"""

from __future__ import annotations

# ---- shared CTE prefix -------------------------------------------------

KG_PREFIX = """
WITH tok AS (
  SELECT CAST(doc_id AS VARCHAR) AS doc_id,
         CAST(generate_subscripts(string_split(text, ' '), 1) - 1 AS INT) AS "offset",
         unnest(string_split(text, ' ')) AS token
  FROM documents
),
spans AS (
  SELECT doc_id, "offset",
         CASE WHEN "offset" % 7 = 3 THEN 'media' ELSE 'text' END AS kind,
         CASE WHEN "offset" % 7 = 3 THEN NULL ELSE token END AS text,
         CASE WHEN "offset" % 7 = 3 THEN 'File:' || token || '.jpg' END AS media_ref
  FROM tok
),
vocab AS (
  SELECT DISTINCT token AS title FROM tok WHERE length(token) >= 3
),
dict AS (
  SELECT title,
         CAST(1 + ((row_number() OVER (ORDER BY title)) - 1)
                  % (1 + (count(*) OVER () * 4) // 5) AS BIGINT) AS item_id
  FROM vocab
),
cdict AS (
  SELECT title,
         CAST(CASE WHEN item_id % 10 >= 7
                   THEN item_id - (item_id % 10 - 6)
                   ELSE item_id END AS BIGINT) AS item_id
  FROM dict
),
tmentions AS (
  SELECT s.doc_id, s."offset", d.item_id
  FROM spans s JOIN cdict d ON s.text = d.title
  WHERE s.kind = 'text'
),
mmentions AS (
  SELECT s.doc_id, s."offset", d.item_id
  FROM spans s
  JOIN cdict d ON substring(s.media_ref, 6, length(s.media_ref) - 9) = d.title
  WHERE s.kind = 'media'
)
"""


def kg_sql(body: str) -> str:
    return KG_PREFIX + body


ORACLES: dict[str, str] = {}

ORACLES["kg_spans"] = kg_sql(
    """
SELECT doc_id, "offset", kind, text, media_ref FROM spans
"""
)

ORACLES["kg_dictionary"] = kg_sql(
    """
SELECT title, item_id, 'Q' || CAST(item_id AS VARCHAR) AS item FROM dict
"""
)

ORACLES["kg_canonical_dictionary"] = kg_sql(
    """
SELECT title, item_id, 'Q' || CAST(item_id AS VARCHAR) AS item FROM cdict
"""
)

ORACLES["kg_text_mentions"] = kg_sql(
    """
SELECT doc_id, "offset", item_id FROM tmentions
"""
)

ORACLES["kg_media_mentions"] = kg_sql(
    """
SELECT doc_id, "offset", item_id FROM mmentions
"""
)

ORACLES["kg_qviews"] = kg_sql(
    """
SELECT item_id, CAST(count(*) AS BIGINT) AS views
FROM tmentions GROUP BY item_id
"""
)

ORACLES["kg_qrank"] = kg_sql(
    """
SELECT 'Q' || CAST(item_id AS VARCHAR) AS item, item_id, views,
       CAST(row_number() OVER (ORDER BY views DESC, item_id ASC) AS BIGINT) AS rank
FROM (
  SELECT item_id, CAST(count(*) AS BIGINT) AS views
  FROM tmentions GROUP BY item_id
)
"""
)

ORACLES["kg_triples"] = kg_sql(
    """
SELECT DISTINCT 'Q' || CAST(item_id AS VARCHAR) AS subj,
       'links_to' AS pred,
       'Q' || CAST(next_id AS VARCHAR) AS obj,
       item_id AS src_id, next_id AS dst_id
FROM (
  SELECT item_id,
         lead(item_id) OVER (PARTITION BY doc_id ORDER BY "offset") AS next_id
  FROM tmentions
)
WHERE next_id IS NOT NULL AND next_id <> item_id
"""
)

# Arrow mention kernel computes the identical relation → same oracle
ORACLES["kg_text_mentions_arrow"] = ORACLES["kg_text_mentions"]

# pipeline driven from the packed nested input_hint table (pack →
# spans_from_interleaved → mentions → qviews) — same relation as qviews
ORACLES["kg_qviews_from_interleaved"] = ORACLES["kg_qviews"]

# fused Arrow build kernel — identical results, different physical plan
ORACLES["kg_qviews_fused"] = ORACLES["kg_qviews"]
ORACLES["kg_triples_fused"] = kg_sql("""
SELECT DISTINCT 'Q' || CAST(item_id AS VARCHAR) AS subj,
       'links_to' AS pred,
       'Q' || CAST(next_id AS VARCHAR) AS obj,
       item_id AS src_id, next_id AS dst_id
FROM (
  SELECT item_id,
         lead(item_id) OVER (PARTITION BY doc_id ORDER BY "offset") AS next_id
  FROM tmentions
)
WHERE next_id IS NOT NULL AND next_id <> item_id
""")

ORACLES["kg_item_signals"] = kg_sql(
    """
, per_doc AS (
  SELECT t.item_id, t.doc_id, CAST(count(*) AS BIGINT) AS doc_mentions
  FROM tmentions t GROUP BY t.item_id, t.doc_id
),
text_sig AS (
  SELECT p.item_id,
         CAST(sum(p.doc_mentions) AS BIGINT) AS pageviews_52w,
         CAST(sum(d.n_chars) AS BIGINT) AS wikitext_bytes,
         CAST(count(*) AS BIGINT) AS claims
  FROM per_doc p JOIN documents_str d ON p.doc_id = d.doc_id
  GROUP BY p.item_id
),
ident AS (
  SELECT item_id, CAST(count(DISTINCT title) AS BIGINT) AS identifiers
  FROM cdict GROUP BY item_id
),
media_sig AS (
  SELECT item_id, CAST(count(*) AS BIGINT) AS sitelinks
  FROM mmentions GROUP BY item_id
)
SELECT COALESCE(t.item_id, m.item_id) AS item_id,
       'Q' || CAST(COALESCE(t.item_id, m.item_id) AS VARCHAR) AS item,
       CAST(COALESCE(t.pageviews_52w, 0) AS BIGINT) AS pageviews_52w,
       CAST(COALESCE(t.wikitext_bytes, 0) AS BIGINT) AS wikitext_bytes,
       CAST(COALESCE(t.claims, 0) AS BIGINT) AS claims,
       CAST(COALESCE(i.identifiers, 0) AS BIGINT) AS identifiers,
       CAST(COALESCE(m.sitelinks, 0) AS BIGINT) AS sitelinks
FROM text_sig t
FULL OUTER JOIN media_sig m ON t.item_id = m.item_id
LEFT JOIN ident i ON COALESCE(t.item_id, m.item_id) = i.item_id
"""
).replace(
    "documents_str",
    "(SELECT CAST(doc_id AS VARCHAR) AS doc_id, n_chars FROM documents)",
)


# one-pass fused build: identical item_signals relation
ORACLES["kg_item_signals_fused"] = ORACLES["kg_item_signals"]

# ---- graph analytics over the triple graph ------------------------------

_EDGES_CTE = """
, edges AS (
  SELECT DISTINCT item_id AS u, next_id AS v
  FROM (
    SELECT item_id,
           lead(item_id) OVER (PARTITION BY doc_id ORDER BY "offset") AS next_id
    FROM tmentions
  )
  WHERE next_id IS NOT NULL AND next_id <> item_id
),
nodes AS (SELECT u AS node FROM edges UNION SELECT v FROM edges)
"""

ORACLES["kg_degrees"] = kg_sql(
    _EDGES_CTE
    + """
SELECT n.node,
       CAST(COALESCE(o.d, 0) AS BIGINT) AS out_degree,
       CAST(COALESCE(i.d, 0) AS BIGINT) AS in_degree
FROM nodes n
LEFT JOIN (SELECT u, count(*) AS d FROM edges GROUP BY u) o ON n.node = o.u
LEFT JOIN (SELECT v, count(*) AS d FROM edges GROUP BY v) i ON n.node = i.v
"""
)


# Triangle participation counts: plain ordered 3-way self-join (no
# degree orientation) — independent of the engine's ordered-wedge plan.
ORACLES["kg_triangles"] = kg_sql(
    _EDGES_CTE
    + """
, und AS (
  SELECT DISTINCT least(u, v) AS a, greatest(u, v) AS b
  FROM edges WHERE u <> v
),
tri AS (
  SELECT e1.a AS x, e1.b AS y, e2.b AS z
  FROM und e1
  JOIN und e2 ON e2.a = e1.b
  JOIN und e3 ON e3.a = e1.a AND e3.b = e2.b
)
SELECT node, CAST(count(*) AS BIGINT) AS n_triangles
FROM (SELECT unnest([x, y, z]) AS node FROM tri)
GROUP BY node
"""
)


# BFS hop distances from the minimum node — bounded recursive CTE (the
# UNION dedups (node, hops) pairs so cycles terminate), min per node.
ORACLES["kg_bfs"] = kg_sql(
    _EDGES_CTE
    + """
, und2 AS (
  SELECT u, v FROM edges WHERE u <> v
  UNION
  SELECT v, u FROM edges WHERE u <> v
),
src AS (SELECT min(u) AS s FROM und2),
walk AS (
  SELECT s AS node, CAST(0 AS BIGINT) AS hops FROM src
  UNION
  SELECT und2.v, w.hops + 1
  FROM walk w JOIN und2 ON und2.u = w.node
  WHERE w.hops < 6
)
SELECT node, CAST(min(hops) AS BIGINT) AS hops FROM walk GROUP BY node
"""
).replace("WITH tok AS", "WITH RECURSIVE tok AS", 1)

ORACLES["qa_checks"] = """
SELECT 'event_value_le_400' AS rule,
       CAST(count(*) AS BIGINT) AS n_checked,
       CAST(count(CASE WHEN NOT coalesce(value <= 400, FALSE) THEN 1 END) AS BIGINT) AS n_violations
FROM events
UNION ALL
SELECT 'event_value_positive', CAST(count(*) AS BIGINT),
       CAST(count(CASE WHEN NOT coalesce(value > 0, FALSE) THEN 1 END) AS BIGINT)
FROM events
UNION ALL
SELECT 'lineitem_order_fk', CAST(count(*) AS BIGINT),
       CAST(count(CASE WHEN NOT coalesce(o.o_orderkey IS NOT NULL, FALSE) THEN 1 END) AS BIGINT)
FROM lineitem l LEFT JOIN orders o ON l.l_orderkey = o.o_orderkey
UNION ALL
SELECT 'document_nchars_consistent', CAST(count(*) AS BIGINT),
       CAST(count(CASE WHEN NOT coalesce(length(text) = n_chars, FALSE) THEN 1 END) AS BIGINT)
FROM documents
"""


def _pagerank_sql(iters: int = 3, damping: float = 0.85) -> str:
    """Unrolled PageRank recurrence — per-iteration round6 makes the
    float fixpoint identical to the engine's iterative joins."""
    d = repr(damping)
    ctes = [
        ",\nnn AS (SELECT CAST(count(*) AS DOUBLE) AS n FROM nodes)",
        ",\nodeg AS (SELECT u, CAST(count(*) AS BIGINT) AS outdeg FROM edges GROUP BY u)",
        ",\nr0 AS (SELECT node, floor(1.0 / nn.n * 1000000.0 + 0.5) / 1000000.0 AS rank"
        " FROM nodes CROSS JOIN nn)",
    ]
    for t in range(1, iters + 1):
        ctes.append(
            f""",
c{t} AS (
  SELECT e.v AS node, sum(r.rank / o.outdeg) AS incoming
  FROM edges e JOIN r{t - 1} r ON e.u = r.node JOIN odeg o ON e.u = o.u
  GROUP BY e.v
),
r{t} AS (
  SELECT no.node,
         floor(((1.0 - {d}) / nn.n + {d} * COALESCE(c.incoming, 0.0))
               * 1000000.0 + 0.5) / 1000000.0 AS rank
  FROM nodes no CROSS JOIN nn LEFT JOIN c{t} c ON no.node = c.node
)"""
        )
    return kg_sql(
        _EDGES_CTE + "".join(ctes) + f"\nSELECT node, rank FROM r{iters}\n"
    )


ORACLES["kg_pagerank"] = _pagerank_sql(3, 0.85)

ORACLES["kg_item_signals_pr"] = None  # composed below after both parts exist

# ---- training-data operators ------------------------------------------

_STOPWORDS_SQL = "('the','a','of','and','to','in','is','it')"

ORACLES["td_fingerprints"] = """
SELECT doc_id,
       md5(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g')) AS fingerprint
FROM documents
"""

ORACLES["td_exact_dedup"] = """
SELECT fingerprint,
       CAST(count(*) AS BIGINT) AS dup_count,
       CAST(min(doc_id) AS BIGINT) AS min_doc_id
FROM (
  SELECT doc_id,
         md5(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g')) AS fingerprint
  FROM documents
)
GROUP BY fingerprint
HAVING count(*) > 1
"""

ORACLES["td_token_counts"] = """
SELECT doc_id,
       CAST(len(string_split(text, ' ')) AS BIGINT) AS ws_tokens,
       CAST(list_sum(list_transform(string_split(text, ' '),
                                    t -> CAST(ceil(length(t) / 4.0) AS BIGINT)))
            AS BIGINT) AS subword_est
FROM documents
"""

ORACLES["td_quality"] = """
WITH base AS (
  SELECT doc_id,
         string_split(text, ' ') AS l,
         CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
         CAST(length(text) AS BIGINT) AS n_chars_measured
  FROM documents
),
m AS (
  SELECT doc_id, n_tokens, n_chars_measured,
         CAST(list_sum(list_transform(l,
                 t -> CASE WHEN t IN """ + _STOPWORDS_SQL + """ THEN 1 ELSE 0 END))
               AS DOUBLE) / greatest(n_tokens, 1) AS sr,
         CAST(n_chars_measured - (n_tokens - 1) AS DOUBLE)
               / greatest(n_tokens, 1) AS mtl
  FROM base
)
SELECT doc_id, n_tokens, n_chars_measured,
       floor(sr * 1000000.0 + 0.5) / 1000000.0 AS stopword_ratio,
       floor(mtl * 1000000.0 + 0.5) / 1000000.0 AS mean_token_len,
       floor((least(n_tokens / 64.0, 1.0) * 0.5
             + (1.0 - least(sr * 2, 1.0)) * 0.25
             + CASE WHEN mtl >= 3 AND mtl <= 10
                    THEN 0.25 ELSE 0.0 END) * 1000000.0 + 0.5) / 1000000.0 AS quality
FROM m
"""

ORACLES["td_language_id"] = """
WITH toks AS (
  SELECT doc_id, string_split(text, ' ') AS l,
         greatest(len(string_split(text, ' ')), 1) AS n
  FROM documents
),
scores AS (
  SELECT doc_id, 'de' AS lang,
         CAST(list_sum(list_transform(l, t -> CASE WHEN t IN ('der','die','und','das','ein') THEN 1 ELSE 0 END)) AS DOUBLE) / n AS score
  FROM toks
  UNION ALL
  SELECT doc_id, 'en',
         CAST(list_sum(list_transform(l, t -> CASE WHEN t IN ('the','and','of','to','a') THEN 1 ELSE 0 END)) AS DOUBLE) / n
  FROM toks
  UNION ALL
  SELECT doc_id, 'es',
         CAST(list_sum(list_transform(l, t -> CASE WHEN t IN ('el','los','que','y','una') THEN 1 ELSE 0 END)) AS DOUBLE) / n
  FROM toks
  UNION ALL
  SELECT doc_id, 'fr',
         CAST(list_sum(list_transform(l, t -> CASE WHEN t IN ('le','la','et','les','un') THEN 1 ELSE 0 END)) AS DOUBLE) / n
  FROM toks
  UNION ALL
  SELECT doc_id, 'zh',
         CAST(list_sum(list_transform(l, t -> CASE WHEN t IN ('的','是','了','在','和') THEN 1 ELSE 0 END)) AS DOUBLE) / n
  FROM toks
),
best AS (
  SELECT doc_id, lang, score,
         row_number() OVER (PARTITION BY doc_id ORDER BY score DESC, lang ASC) AS r
  FROM scores
)
SELECT doc_id,
       CASE WHEN score > 0 THEN lang ELSE 'und' END AS predicted_lang,
       floor(score * 1000000.0 + 0.5) / 1000000.0 AS lang_score
FROM best WHERE r = 1
"""

ORACLES["td_ngram_jaccard"] = """
WITH toks AS (
  SELECT doc_id, string_split(text, ' ') AS l FROM documents
),
sh AS (
  SELECT DISTINCT doc_id, gram AS shingle FROM (
    SELECT doc_id,
           unnest(list_transform(generate_series(1, greatest(len(l) - 2, 1)),
                                 i -> array_to_string(l[i:i+2], ' '))) AS gram
    FROM toks
  ) WHERE length(gram) > 0
),
sizes AS (
  SELECT doc_id, CAST(count(*) AS BIGINT) AS n_sh FROM sh GROUP BY doc_id
),
inter AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, CAST(count(*) AS BIGINT) AS n_inter
  FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
  GROUP BY 1, 2
)
SELECT i.doc_a, i.doc_b,
       floor(CAST(i.n_inter AS DOUBLE)
             / (sa.n_sh + sb.n_sh - i.n_inter) * 1000000.0 + 0.5) / 1000000.0 AS jaccard
FROM inter i
JOIN sizes sa ON i.doc_a = sa.doc_id
JOIN sizes sb ON i.doc_b = sb.doc_id
WHERE floor(CAST(i.n_inter AS DOUBLE)
            / (sa.n_sh + sb.n_sh - i.n_inter) * 1000000.0 + 0.5) / 1000000.0 >= 0.06
"""

ORACLES["td_ann_topk"] = """
WITH q AS (
  SELECT vec_id AS query_id, embedding AS qv FROM embeddings WHERE vec_id < 16
),
c AS (
  SELECT vec_id AS neighbor_id, embedding AS cv FROM embeddings
),
scored AS (
  SELECT query_id, neighbor_id,
         floor(
           list_sum(list_transform(generate_series(1, len(qv)),
                                   i -> CAST(qv[i] AS DOUBLE) * CAST(cv[i] AS DOUBLE)))
           / (sqrt(list_sum(list_transform(generate_series(1, len(qv)),
                                   i -> CAST(qv[i] AS DOUBLE) * CAST(qv[i] AS DOUBLE))))
            * sqrt(list_sum(list_transform(generate_series(1, len(cv)),
                                   i -> CAST(cv[i] AS DOUBLE) * CAST(cv[i] AS DOUBLE)))))
           * 1000000.0 + 0.5) / 1000000.0 AS cosine
  FROM c, q
  WHERE neighbor_id <> query_id
)
SELECT query_id, neighbor_id, cosine,
       CAST(row_number() OVER (PARTITION BY query_id
                               ORDER BY cosine DESC, neighbor_id ASC) AS BIGINT) AS nn_rank
FROM scored
QUALIFY nn_rank <= 5
"""

# ---- events (batch form of the streaming aggregation) ------------------

ORACLES["ev_windowed_counts"] = """
SELECT date_trunc('hour', ts) AS window_start,
       event_type,
       CAST(count(*) AS BIGINT) AS n_events,
       round(sum(value), 6) AS total_value
FROM events
GROUP BY 1, 2
"""


ORACLES["ev_sessions"] = """
WITH e AS (
  SELECT user_id, ts, event_id, value, epoch_us(ts) AS us FROM events
),
flags AS (
  SELECT user_id, ts, event_id, value,
         CASE WHEN lag(us) OVER w IS NULL
                   OR us - lag(us) OVER w > 1800000000
              THEN 1 ELSE 0 END AS is_new
  FROM e
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
),
sess AS (
  SELECT user_id, ts, value,
         CAST(sum(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_seq
  FROM flags
)
SELECT user_id, session_seq,
       min(ts) AS session_start,
       max(ts) AS session_end,
       CAST(count(*) AS BIGINT) AS n_events,
       floor(sum(value) * 1000000.0 + 0.5) / 1000000.0 AS total_value
FROM sess GROUP BY user_id, session_seq
"""

# As-of join: DuckDB's NATIVE ASOF LEFT JOIN is the independent
# implementation checking the engine's union+running-last-window form.
ORACLES["ev_asof_clicks"] = """
WITH p AS (
  SELECT event_id, user_id, ts, value FROM events WHERE event_type = 'purchase'
),
c AS (
  SELECT event_id, user_id, ts, value FROM events WHERE event_type = 'click'
  QUALIFY row_number() OVER (PARTITION BY user_id, ts ORDER BY event_id DESC) = 1
)
SELECT p.event_id, p.user_id, epoch_us(p.ts) AS ts_us,
       c.event_id AS click_event_id,
       epoch_us(c.ts) AS click_ts_us,
       floor(c.value * 1000000.0 + 0.5) / 1000000.0 AS click_value
FROM p ASOF LEFT JOIN c ON p.user_id = c.user_id AND p.ts >= c.ts
"""

# Range join: bucketed-interval equi-join in the engine vs DuckDB's
# plain inequality join (native IEJoin) — independent formulations.
ORACLES["ev_range_join"] = """
WITH p AS (
  SELECT event_id, user_id, epoch_us(ts) AS ts_us
  FROM events WHERE event_type = 'purchase'
),
s AS (
  SELECT event_id AS signup_event_id, user_id,
         epoch_us(ts) AS start_us,
         epoch_us(ts) + 7200000000 AS end_us
  FROM events WHERE event_type = 'signup'
)
SELECT p.event_id, p.user_id, p.ts_us, s.signup_event_id, s.start_us
FROM p JOIN s
  ON p.user_id = s.user_id AND p.ts_us BETWEEN s.start_us AND s.end_us
"""

# Rollup cascade: the engine re-aggregates day from hour and week from
# day; the oracle aggregates every level directly from raw events.
# Equality IS the continuous-aggregate invariant (associative integer
# measures).
ORACLES["ev_rollup_cascade"] = """
SELECT 'hour' AS level,
       epoch_us(date_trunc('hour', ts)) AS bucket_us,
       event_type,
       CAST(count(*) AS BIGINT) AS n_events,
       CAST(sum(CAST(floor(value * 100 + 0.5) AS BIGINT)) AS BIGINT) AS value_c
FROM events GROUP BY 1, 2, 3
UNION ALL
SELECT 'day' AS level,
       epoch_us(date_trunc('day', ts)) AS bucket_us,
       event_type,
       CAST(count(*) AS BIGINT) AS n_events,
       CAST(sum(CAST(floor(value * 100 + 0.5) AS BIGINT)) AS BIGINT) AS value_c
FROM events GROUP BY 1, 2, 3
UNION ALL
SELECT 'week' AS level,
       epoch_us(date_trunc('week', ts)) AS bucket_us,
       event_type,
       CAST(count(*) AS BIGINT) AS n_events,
       CAST(sum(CAST(floor(value * 100 + 0.5) AS BIGINT)) AS BIGINT) AS value_c
FROM events GROUP BY 1, 2, 3"""

ORACLES["ev_props_stats"] = """
WITH parsed AS (
  SELECT event_type,
         CAST(json_extract_string(props, '$.k') AS BIGINT) AS k,
         value
  FROM events
)
SELECT event_type,
       CAST(count(*) AS BIGINT) AS n_events,
       CAST(count(CASE WHEN k > 50 THEN 1 END) AS BIGINT) AS n_high_k,
       CAST(sum(k) AS BIGINT) AS sum_k,
       floor(sum(value) * 1000000.0 + 0.5) / 1000000.0 AS total_value
FROM parsed GROUP BY event_type
"""

ORACLES["td_tfidf_top_terms"] = """
WITH toks AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents
),
tf AS (
  SELECT doc_id, term, CAST(count(*) AS BIGINT) AS tf
  FROM toks WHERE length(term) > 0 GROUP BY doc_id, term
),
df AS (SELECT term, CAST(count(*) AS BIGINT) AS df FROM tf GROUP BY term),
n AS (SELECT CAST(count(*) AS DOUBLE) AS n_docs FROM documents),
scored AS (
  SELECT t.doc_id, t.term, t.tf,
         floor(t.tf * ln(n.n_docs / d.df) * 1000000.0 + 0.5) / 1000000.0 AS score
  FROM tf t JOIN df d ON t.term = d.term CROSS JOIN n
)
SELECT doc_id, term, tf, score,
       CAST(row_number() OVER (PARTITION BY doc_id
                               ORDER BY score DESC, term ASC) AS BIGINT) AS term_rank
FROM scored
QUALIFY term_rank <= 3
"""

ORACLES["ev_quantiles"] = """
SELECT event_type,
       CAST(count(*) AS BIGINT) AS n_events,
       floor(quantile_cont(value, 0.5)  * 1000000.0 + 0.5) / 1000000.0 AS p50,
       floor(quantile_cont(value, 0.9)  * 1000000.0 + 0.5) / 1000000.0 AS p90,
       floor(quantile_cont(value, 0.99) * 1000000.0 + 0.5) / 1000000.0 AS p99
FROM events GROUP BY event_type
"""

ORACLES["an_monthly_revenue"] = """
SELECT CAST(year(CAST(o_orderdate AS TIMESTAMP)) AS INT) AS order_year,
       CAST(month(CAST(o_orderdate AS TIMESTAMP)) AS INT) AS order_month,
       CAST(count(*) AS BIGINT) AS n_orders,
       CAST(sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)) AS BIGINT) AS revenue_c
FROM orders
GROUP BY 1, 2
"""

# IVM invariant: the oracle aggregates the WHOLE table directly; the
# engine merges separately-aggregated base and delta states.
ORACLES["ev_incremental_agg"] = """
SELECT user_id,
       CAST(count(*) AS BIGINT) AS n_events,
       CAST(sum(CAST(floor(value * 100 + 0.5) AS BIGINT)) AS BIGINT) AS sum_value_c
FROM events
GROUP BY user_id
"""

ORACLES["ev_transitions"] = """
WITH seq AS (
  SELECT user_id, event_type,
         lag(event_type) OVER (
           PARTITION BY user_id ORDER BY epoch_us(ts), event_id
         ) AS prev_type
  FROM events
),
pairs AS (
  SELECT prev_type, event_type, CAST(count(*) AS BIGINT) AS n
  FROM seq WHERE prev_type IS NOT NULL
  GROUP BY prev_type, event_type
)
SELECT prev_type, event_type, n,
       floor(CAST(n AS DOUBLE) / sum(n) OVER (PARTITION BY prev_type)
             * 1000000.0 + 0.5) / 1000000.0 AS p
FROM pairs
"""

ORACLES["ev_funnel"] = """
WITH e AS (
  SELECT user_id, event_type, epoch_us(ts) AS ts_us FROM events
),
staged AS (
  SELECT user_id,
         min(CASE WHEN event_type = 'signup' THEN ts_us END) AS s_us
  FROM e GROUP BY user_id
),
clicked AS (
  SELECT s.user_id, s.s_us,
         min(CASE WHEN e.event_type = 'click' AND e.ts_us >= s.s_us
                  THEN e.ts_us END) AS c_us
  FROM staged s JOIN e ON e.user_id = s.user_id
  GROUP BY s.user_id, s.s_us
),
purchased AS (
  SELECT c.user_id, c.s_us, c.c_us,
         min(CASE WHEN e.event_type = 'purchase' AND e.ts_us >= c.c_us
                  THEN e.ts_us END) AS p_us
  FROM clicked c JOIN e ON e.user_id = c.user_id
  GROUP BY c.user_id, c.s_us, c.c_us
),
counts AS (
  SELECT CAST(count(s_us) AS BIGINT) AS signup,
         CAST(count(c_us) AS BIGINT) AS click,
         CAST(count(p_us) AS BIGINT) AS purchase
  FROM purchased
)
SELECT CAST(1 AS BIGINT) AS step, 'signup' AS stage, signup AS n_users FROM counts
UNION ALL
SELECT CAST(2 AS BIGINT), 'click', click FROM counts
UNION ALL
SELECT CAST(3 AS BIGINT), 'purchase', purchase FROM counts
"""

ORACLES["ev_cohorts"] = """
WITH e AS (
  SELECT user_id, epoch_us(date_trunc('week', ts)) AS week_us FROM events
),
cohort AS (
  SELECT user_id, min(week_us) AS cohort_week_us FROM e GROUP BY user_id
)
SELECT c.cohort_week_us, e.week_us AS activity_week_us,
       CAST(count(DISTINCT e.user_id) AS BIGINT) AS n_active_users
FROM e JOIN cohort c ON e.user_id = c.user_id
GROUP BY 1, 2
"""

ORACLES["ev_click_purchase_join"] = """
WITH c AS (
  SELECT event_id AS click_event_id, user_id, epoch_us(ts) AS click_ts_us
  FROM events WHERE event_type = 'click'
),
p AS (
  SELECT event_id AS purchase_event_id, user_id, epoch_us(ts) AS purchase_ts_us
  FROM events WHERE event_type = 'purchase'
)
SELECT c.click_event_id, c.user_id, c.click_ts_us,
       p.purchase_event_id, p.purchase_ts_us
FROM c JOIN p
  ON c.user_id = p.user_id
 AND p.purchase_ts_us BETWEEN c.click_ts_us AND c.click_ts_us + 3600000000
"""

ORACLES["ev_moving_avg"] = """
WITH e AS (
  SELECT event_id, user_id, epoch_us(ts) AS ts_us,
         CAST(floor(value * 100 + 0.5) AS BIGINT) AS value_c
  FROM events
)
SELECT event_id, user_id, ts_us, value_c,
       lag(value_c) OVER w AS prev_value_c,
       CAST(sum(value_c) OVER wf AS BIGINT) AS mov_sum_c,
       CAST(count(*) OVER wf AS BIGINT) AS mov_n,
       floor(CAST(sum(value_c) OVER wf AS DOUBLE) / (count(*) OVER wf)
             * 1000000.0 + 0.5) / 1000000.0 AS mov_avg_c
FROM e
WINDOW w AS (PARTITION BY user_id ORDER BY ts_us, event_id),
       wf AS (PARTITION BY user_id ORDER BY ts_us, event_id
              ROWS BETWEEN 4 PRECEDING AND CURRENT ROW)
"""

ORACLES["ev_scd2"] = """
SELECT event_id, user_id, epoch_us(ts) AS valid_from_us,
       lead(epoch_us(ts)) OVER (
         PARTITION BY user_id ORDER BY epoch_us(ts), event_id
       ) AS valid_to_us,
       CAST(floor(value * 100 + 0.5) AS BIGINT) AS value_c
FROM events
"""

ORACLES["ev_merge_upsert"] = """
WITH t AS (
  SELECT user_id, epoch_us(ts) AS ts_us,
         CAST(floor(value * 100 + 0.5) AS BIGINT) AS value_c
  FROM events WHERE event_id % 2 = 0
  QUALIFY row_number() OVER (
    PARTITION BY user_id ORDER BY epoch_us(ts) DESC, event_id DESC) = 1
),
u AS (
  SELECT user_id, epoch_us(ts) AS ts_us,
         CAST(floor(value * 100 + 0.5) AS BIGINT) AS value_c,
         user_id % 7 = 0 AS deleted
  FROM events WHERE event_id % 2 = 1
  QUALIFY row_number() OVER (
    PARTITION BY user_id ORDER BY epoch_us(ts) DESC, event_id DESC) = 1
)
SELECT coalesce(t.user_id, u.user_id) AS user_id,
       CASE WHEN u.user_id IS NOT NULL THEN u.ts_us ELSE t.ts_us END AS ts_us,
       CASE WHEN u.user_id IS NOT NULL THEN u.value_c ELSE t.value_c END AS value_c
FROM t FULL JOIN u ON t.user_id = u.user_id
WHERE NOT coalesce(u.deleted, FALSE)
"""

ORACLES["ev_latest_state"] = """
SELECT event_id, user_id, epoch_us(ts) AS ts_us, event_type,
       CAST(floor(value * 100 + 0.5) AS BIGINT) AS value_c
FROM events
QUALIFY row_number() OVER (
  PARTITION BY user_id ORDER BY epoch_us(ts) DESC, event_id DESC
) = 1
"""

ORACLES["an_sales_cube"] = """
SELECT coalesce(l_returnflag, 'ALL') AS returnflag,
       coalesce(l_linestatus, 'ALL') AS linestatus,
       CAST(sum(CAST(floor(l_quantity * 100 + 0.5) AS BIGINT)) AS BIGINT) AS sum_qty_c,
       CAST(sum(CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT)) AS BIGINT) AS sum_base_c,
       CAST(count(*) AS BIGINT) AS n_rows,
       CAST(grouping(l_returnflag) * 2 + grouping(l_linestatus) AS BIGINT) AS grp
FROM lineitem
GROUP BY CUBE (l_returnflag, l_linestatus)
"""

ORACLES["td_embedding_near_dups"] = """
WITH v AS (SELECT vec_id, embedding AS e FROM embeddings WHERE vec_id < 120),
scored AS (
  SELECT a.vec_id AS id_a, b.vec_id AS id_b,
         floor(
           list_sum(list_transform(generate_series(1, len(a.e)),
                                   i -> CAST(a.e[i] AS DOUBLE) * CAST(b.e[i] AS DOUBLE)))
           / (sqrt(list_sum(list_transform(generate_series(1, len(a.e)),
                                   i -> CAST(a.e[i] AS DOUBLE) * CAST(a.e[i] AS DOUBLE))))
            * sqrt(list_sum(list_transform(generate_series(1, len(b.e)),
                                   i -> CAST(b.e[i] AS DOUBLE) * CAST(b.e[i] AS DOUBLE)))))
           * 1000000.0 + 0.5) / 1000000.0 AS cosine
  FROM v a, v b WHERE a.vec_id < b.vec_id
)
SELECT id_a, id_b, cosine FROM scored WHERE cosine >= 0.3
"""


# ---- sketch oracles (md5 hash family / embedded hyperplane constants) --
#
# The LSH/sketch operators are deterministic given their hash family, so
# they are value-checkable: the gate variants use md5 (identical in
# Spark and DuckDB; xxhash64 remains the engine's scale-path family) or
# share the deterministic hyperplane constants. The SQL below is
# *generated* — bucketing, joins and ranking are written independently
# of the DataFrame plans.

_MH_BANDS, _MH_ROWS = 8, 4

_mh_mins = ",\n         ".join(
    f"min(md5('{i}:' || shingle)) AS h{i}" for i in range(_MH_BANDS * _MH_ROWS)
)
_mh_banded = "\n  UNION ALL\n".join(
    "  SELECT doc_id, {b} AS band, md5({parts}) AS bucket FROM sig".format(
        b=b,
        parts=" || ',' || ".join(f"h{b * _MH_ROWS + r}" for r in range(_MH_ROWS)),
    )
    for b in range(_MH_BANDS)
)

ORACLES["td_minhash_pairs"] = f"""
WITH toks AS (
  SELECT doc_id, string_split(text, ' ') AS l FROM documents
),
sh AS (
  SELECT DISTINCT doc_id, gram AS shingle FROM (
    SELECT doc_id,
           unnest(list_transform(generate_series(1, greatest(len(l) - 2, 1)),
                                 i -> array_to_string(l[i:i+2], ' '))) AS gram
    FROM toks
  ) WHERE length(gram) > 0
),
sig AS (
  SELECT doc_id,
         {_mh_mins}
  FROM sh GROUP BY doc_id
),
banded AS (
{_mh_banded}
)
SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
FROM banded a
JOIN banded b ON a.band = b.band AND a.bucket = b.bucket AND a.doc_id < b.doc_id
"""

# Incremental dedup equivalence: the oracle rebuilds the FULL injected
# corpus's banded-LSH candidate pairs and keeps those touching the new
# batch (doc_id % 7 = 3) — exactly what the Spark side must produce
# from the standing band table + the batch alone. Same md5 sketch as
# td_minhash_pairs; corpus injection mirrors inject_near_dups.
ORACLES["td_incremental_dedup"] = f"""
WITH base AS (
  SELECT doc_id, string_split(text, ' ') AS l FROM documents
),
toks AS (
  SELECT doc_id, l FROM base
  UNION ALL
  SELECT doc_id + 10000000,
         string_split(array_to_string(l[1:greatest(len(l) - 2, 1)], ' '), ' ')
  FROM base WHERE doc_id % 50 = 0
),
sh AS (
  SELECT DISTINCT doc_id, gram AS shingle FROM (
    SELECT doc_id,
           unnest(list_transform(generate_series(1, greatest(len(l) - 2, 1)),
                                 i -> array_to_string(l[i:i+2], ' '))) AS gram
    FROM toks
  ) WHERE length(gram) > 0
),
sig AS (
  SELECT doc_id,
         {_mh_mins}
  FROM sh GROUP BY doc_id
),
banded AS (
{_mh_banded}
)
SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
FROM banded a
JOIN banded b ON a.band = b.band AND a.bucket = b.bucket AND a.doc_id < b.doc_id
WHERE a.doc_id % 7 = 3 OR b.doc_id % 7 = 3
"""

_SH_BANDS, _SH_WIDTH = 4, 16

_sh_sums = ",\n    ".join(
    "sum(CASE WHEN ((strpos('0123456789abcdef', substr(h, {nib}, 1)) - 1) // {p}) % 2 = 1"
    " THEN 1 ELSE -1 END) AS s{i}".format(nib=i // 4 + 1, p=2 ** (i % 4), i=i)
    for i in range(64)
)
_sh_keys = ",\n    ".join(
    "CAST({expr} AS BIGINT) AS k{b}".format(
        b=b,
        expr=" + ".join(
            f"CASE WHEN s{b * _SH_WIDTH + r} > 0 THEN {1 << r} ELSE 0 END"
            for r in range(_SH_WIDTH)
        ),
    )
    for b in range(_SH_BANDS)
)
_sh_banded = "\n  UNION ALL\n".join(
    f"  SELECT doc_id, k0, k1, k2, k3, {b} AS band, k{b} AS bkey FROM keys"
    for b in range(_SH_BANDS)
)
_sh_ham = " + ".join(f"bit_count(xor(a{b}, b{b}))" for b in range(_SH_BANDS))

ORACLES["td_simhash_pairs"] = f"""
WITH toks AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents
),
votes AS (SELECT doc_id, md5(tok) AS h FROM toks),
sums AS (
  SELECT doc_id,
    {_sh_sums}
  FROM votes GROUP BY doc_id
),
keys AS (
  SELECT doc_id,
    {_sh_keys}
  FROM sums
),
banded AS (
{_sh_banded}
),
cand AS (
  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b,
         a.k0 AS a0, a.k1 AS a1, a.k2 AS a2, a.k3 AS a3,
         b.k0 AS b0, b.k1 AS b1, b.k2 AS b2, b.k3 AS b3
  FROM banded a
  JOIN banded b ON a.band = b.band AND a.bkey = b.bkey AND a.doc_id < b.doc_id
)
SELECT doc_a, doc_b, CAST({_sh_ham} AS INT) AS hamming
FROM cand
WHERE {_sh_ham} <= 3
"""


def _plane_dot_sql(vec: str, plane: list[float]) -> str:
    """Explicit left-associated sum — the same IEEE addition order as the
    engine's F.aggregate fold, so bucket signs agree bit-for-bit."""
    return " + ".join(
        f"CAST({vec}[{i + 1}] AS DOUBLE)*({v!r})" for i, v in enumerate(plane)
    )


def _bucket_sql(vec: str, dim: int, nbits: int, table_seed: int) -> str:
    from .operators.similarity import _hyperplane

    parts = []
    for bit in range(nbits):
        plane = _hyperplane(dim, table_seed * 97 + bit + 1)
        parts.append(
            f"(CASE WHEN ({_plane_dot_sql(vec, plane)}) > 0 THEN {1 << bit} ELSE 0 END)"
        )
    return " + ".join(parts)


_EMB_DIM = 64  # all sf dirs ship dim-64 embeddings (verified)

_COS_SQL = """floor(
           list_sum(list_transform(generate_series(1, len({a})),
                                   i -> CAST({a}[i] AS DOUBLE) * CAST({b}[i] AS DOUBLE)))
           / (sqrt(list_sum(list_transform(generate_series(1, len({a})),
                                   i -> CAST({a}[i] AS DOUBLE) * CAST({a}[i] AS DOUBLE))))
            * sqrt(list_sum(list_transform(generate_series(1, len({b})),
                                   i -> CAST({b}[i] AS DOUBLE) * CAST({b}[i] AS DOUBLE)))))
           * 1000000.0 + 0.5) / 1000000.0"""

_nd_buckets = "\n  UNION ALL\n".join(
    f"  SELECT vec_id, {t + 1} AS t, ({_bucket_sql('e', _EMB_DIM, 4, t + 1)}) AS bucket FROM v"
    for t in range(8)
)

ORACLES["td_embedding_near_dups_lsh"] = f"""
WITH v AS (SELECT vec_id, embedding AS e FROM embeddings WHERE vec_id < 120),
buckets AS (
{_nd_buckets}
),
cand AS (
  SELECT DISTINCT a.vec_id AS id_a, b.vec_id AS id_b
  FROM buckets a
  JOIN buckets b ON a.t = b.t AND a.bucket = b.bucket AND a.vec_id < b.vec_id
),
pairs AS (
  SELECT c.id_a, c.id_b, va.e AS ea, vb.e AS eb
  FROM cand c
  JOIN v va ON c.id_a = va.vec_id
  JOIN v vb ON c.id_b = vb.vec_id
),
scored AS (
  SELECT id_a, id_b, {_COS_SQL.format(a="ea", b="eb")} AS cosine FROM pairs
)
SELECT id_a, id_b, cosine FROM scored WHERE cosine >= 0.3
"""

_ann_buckets = "\n  UNION ALL\n".join(
    f"  SELECT vec_id, {t + 1} AS t, ({_bucket_sql('e', _EMB_DIM, 8, t + 1)}) AS bucket FROM allv"
    for t in range(4)
)

ORACLES["td_lsh_ann"] = f"""
WITH allv AS (SELECT vec_id, embedding AS e FROM embeddings),
buckets AS (
{_ann_buckets}
),
cand AS (
  SELECT DISTINCT qb.vec_id AS query_id, cb.vec_id AS neighbor_id
  FROM buckets cb
  JOIN buckets qb ON cb.t = qb.t AND cb.bucket = qb.bucket
  WHERE qb.vec_id < 16 AND cb.vec_id <> qb.vec_id
),
pairs AS (
  SELECT c.query_id, c.neighbor_id, q.e AS qv, n.e AS cv
  FROM cand c
  JOIN allv q ON c.query_id = q.vec_id
  JOIN allv n ON c.neighbor_id = n.vec_id
),
scored AS (
  SELECT query_id, neighbor_id, {_COS_SQL.format(a="qv", b="cv")} AS cosine FROM pairs
)
SELECT query_id, neighbor_id, cosine,
       CAST(row_number() OVER (PARTITION BY query_id
                               ORDER BY cosine DESC, neighbor_id ASC) AS BIGINT) AS nn_rank
FROM scored
QUALIFY nn_rank <= 5
"""

_DOT_ROUND_SQL = """floor(
      list_sum(list_transform(generate_series(1, len({a})),
                              i -> CAST({a}[i] AS DOUBLE) * CAST({b}[i] AS DOUBLE)))
      * 1000000.0 + 0.5) / 1000000.0"""

ORACLES["td_ivf_ann"] = f"""
WITH params AS (
  SELECT greatest(1, count(*) // 16) AS step FROM embeddings
),
centroids AS (
  SELECT cid, cent FROM (
    SELECT vec_id AS cid, embedding AS cent,
           row_number() OVER (ORDER BY vec_id) AS rn
    FROM embeddings
  ) ranked, params
  WHERE (rn - 1) % step = 0 AND rn <= 1 + 15 * step
),
cassign AS (
  SELECT neighbor_id, cv, cid FROM (
    SELECT neighbor_id, cv, cid,
           row_number() OVER (PARTITION BY neighbor_id ORDER BY sim DESC, cid ASC) AS r
    FROM (
      SELECT e.vec_id AS neighbor_id, e.embedding AS cv, c.cid,
             {_DOT_ROUND_SQL.format(a="e.embedding", b="c.cent")} AS sim
      FROM embeddings e, centroids c
    )
  ) WHERE r = 1
),
qassign AS (
  SELECT query_id, qv, cid FROM (
    SELECT query_id, qv, cid,
           row_number() OVER (PARTITION BY query_id ORDER BY sim DESC, cid ASC) AS r
    FROM (
      SELECT e.vec_id AS query_id, e.embedding AS qv, c.cid,
             {_DOT_ROUND_SQL.format(a="e.embedding", b="c.cent")} AS sim
      FROM embeddings e, centroids c
      WHERE e.vec_id < 16
    )
  ) WHERE r <= 4
),
cand AS (
  SELECT qa.query_id, qa.qv, ca.neighbor_id, ca.cv
  FROM cassign ca JOIN qassign qa ON ca.cid = qa.cid
  WHERE ca.neighbor_id <> qa.query_id
),
scored AS (
  SELECT query_id, neighbor_id, {_COS_SQL.format(a="qv", b="cv")} AS cosine FROM cand
)
SELECT query_id, neighbor_id, cosine,
       CAST(row_number() OVER (PARTITION BY query_id
                               ORDER BY cosine DESC, neighbor_id ASC) AS BIGINT) AS nn_rank
FROM scored
QUALIFY nn_rank <= 5
"""

# Winnowing fingerprints (MOSS): polynomial rolling hash of every char
# k-gram, min per window of `window` consecutive grams, distinct. The
# fold is left-associative in both engines (list_reduce seeded with a
# prepended 0 == F.aggregate with init 0).
ORACLES["td_winnow_fps"] = """
WITH g AS (
  SELECT doc_id,
    list_transform(generate_series(1, greatest(length(text) - 8 + 1, 1)),
      i -> list_reduce(
             list_prepend(CAST(0 AS BIGINT),
               list_transform(string_split(substr(text, CAST(i AS INT), 8), ''),
                              c -> CAST(ord(c) AS BIGINT))),
             (a, c) -> (a * 31 + c) % 2147483647)) AS grams
  FROM documents WHERE length(text) > 0
),
w AS (
  SELECT doc_id,
    list_distinct(
      list_transform(generate_series(1, greatest(len(grams) - 4 + 1, 1)),
                     j -> list_min(grams[j:j+3]))) AS fps
  FROM g
)
SELECT doc_id, CAST(unnest(fps) AS BIGINT) AS fp FROM w
"""

# The curation composition: exact-dedup survivors ∩ quality threshold ∩
# confident language id — built by nesting the already-verified oracle
# queries as parenthesized subqueries (each keeps its own WITH).
ORACLES["td_curation"] = f"""
SELECT s.doc_id, l.predicted_lang, q.quality
FROM (
  SELECT min(doc_id) AS doc_id
  FROM (
    SELECT doc_id,
           md5(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g')) AS f
    FROM documents
  ) GROUP BY f
) s
JOIN ({ORACLES["td_quality"]}) q ON q.doc_id = s.doc_id
JOIN ({ORACLES["td_language_id"]}) l ON l.doc_id = s.doc_id
WHERE q.quality >= 0.5 AND l.predicted_lang <> 'und'
"""

# ---- dup clustering / contamination / PII -------------------------------

# Connected components via recursive-CTE transitive closure — an
# independent algorithm from the engine's iterative min-label
# propagation (operators/clusters.py). Shared 3-gram-Jaccard pair CTEs.
_JACCARD_PAIR_CTES = """toks AS (
  SELECT doc_id, string_split(text, ' ') AS l FROM documents
),
sh AS (
  SELECT DISTINCT doc_id, gram AS shingle FROM (
    SELECT doc_id,
           unnest(list_transform(generate_series(1, greatest(len(l) - 2, 1)),
                                 i -> array_to_string(l[i:i+2], ' '))) AS gram
    FROM toks
  ) WHERE length(gram) > 0
),
sizes AS (
  SELECT doc_id, CAST(count(*) AS BIGINT) AS n_sh FROM sh GROUP BY doc_id
),
inter AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, CAST(count(*) AS BIGINT) AS n_inter
  FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
  GROUP BY 1, 2
),
pairs AS (
  SELECT i.doc_a, i.doc_b
  FROM inter i
  JOIN sizes sa ON i.doc_a = sa.doc_id
  JOIN sizes sb ON i.doc_b = sb.doc_id
  WHERE floor(CAST(i.n_inter AS DOUBLE)
              / (sa.n_sh + sb.n_sh - i.n_inter) * 1000000.0 + 0.5) / 1000000.0 >= 0.06
)"""

ORACLES["td_dup_clusters"] = f"""
WITH RECURSIVE {_JACCARD_PAIR_CTES},
sym AS (
  SELECT doc_a AS a, doc_b AS b FROM pairs
  UNION
  SELECT doc_b, doc_a FROM pairs
),
reach AS (
  SELECT a AS node, b AS r FROM sym
  UNION
  SELECT re.node, s.b FROM reach re JOIN sym s ON re.r = s.a
)
SELECT node AS doc_id, least(node, min(r)) AS component
FROM reach GROUP BY node
"""

# The composed SCALE pipeline, end to end: md5 minhash banded LSH
# candidates → exact Jaccard verified ON CANDIDATES ONLY → recursive-CTE
# transitive closure (vs the engine's label propagation). Runs over the
# near-dup-injected corpus (inject_near_dups mirror: docs with
# doc_id % 50 = 0 gain a copy at +10000000 with the last two tokens
# dropped), since the synthetic corpus has no organic near-dups.
ORACLES["td_dup_clusters_lsh"] = f"""
WITH RECURSIVE base AS (
  SELECT doc_id, string_split(text, ' ') AS l FROM documents
),
toks AS (
  SELECT doc_id, l FROM base
  UNION ALL
  SELECT doc_id + 10000000,
         string_split(array_to_string(l[1:greatest(len(l) - 2, 1)], ' '), ' ')
  FROM base WHERE doc_id % 50 = 0
),
sh AS (
  SELECT DISTINCT doc_id, gram AS shingle FROM (
    SELECT doc_id,
           unnest(list_transform(generate_series(1, greatest(len(l) - 2, 1)),
                                 i -> array_to_string(l[i:i+2], ' '))) AS gram
    FROM toks
  ) WHERE length(gram) > 0
),
sig AS (
  SELECT doc_id,
         {_mh_mins}
  FROM sh GROUP BY doc_id
),
banded AS (
{_mh_banded}
),
cand AS (
  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
  FROM banded a
  JOIN banded b ON a.band = b.band AND a.bucket = b.bucket AND a.doc_id < b.doc_id
),
sizes AS (
  SELECT doc_id, CAST(count(*) AS BIGINT) AS n_sh FROM sh GROUP BY doc_id
),
inter AS (
  SELECT c.doc_a, c.doc_b, CAST(count(*) AS BIGINT) AS n_inter
  FROM cand c
  JOIN sh a ON a.doc_id = c.doc_a
  JOIN sh b ON b.doc_id = c.doc_b AND b.shingle = a.shingle
  GROUP BY 1, 2
),
pairs AS (
  SELECT i.doc_a, i.doc_b
  FROM inter i
  JOIN sizes sa ON i.doc_a = sa.doc_id
  JOIN sizes sb ON i.doc_b = sb.doc_id
  WHERE floor(CAST(i.n_inter AS DOUBLE)
              / (sa.n_sh + sb.n_sh - i.n_inter) * 1000000.0 + 0.5) / 1000000.0 >= 0.5
),
sym AS (
  SELECT doc_a AS a, doc_b AS b FROM pairs
  UNION
  SELECT doc_b, doc_a FROM pairs
),
reach AS (
  SELECT a AS node, b AS r FROM sym
  UNION
  SELECT re.node, s.b FROM reach re JOIN sym s ON re.r = s.a
)
SELECT node AS doc_id, least(node, min(r)) AS component
FROM reach GROUP BY node
"""

# survivor election by token length over the same injected-corpus
# closure: replace the component projection with an argmax window
ORACLES["td_best_of_cluster"] = ORACLES["td_dup_clusters_lsh"].replace(
    """SELECT node AS doc_id, least(node, min(r)) AS component
FROM reach GROUP BY node""",
    """, comp AS (
  SELECT node AS doc_id, least(node, min(r)) AS component
  FROM reach GROUP BY node
),
lens AS (
  SELECT doc_id, CAST(len(l) AS BIGINT) AS n_tokens FROM toks
),
scored AS (
  SELECT c.component, c.doc_id, t.n_tokens,
         row_number() OVER (PARTITION BY c.component
                            ORDER BY t.n_tokens DESC, c.doc_id ASC) AS rk,
         CAST(count(*) OVER (PARTITION BY c.component) AS BIGINT)
           AS cluster_size
  FROM comp c JOIN lens t ON t.doc_id = c.doc_id
)
SELECT component, doc_id AS best_doc_id, n_tokens AS best_n_tokens,
       cluster_size
FROM scored WHERE rk = 1""",
)


# HyperLogLog with a PORTABLE hash (md5 → 60-bit int): both engines
# derive the same registers, integer-exact register fold, so the
# estimates agree to the last round6 digit. 49 = remainder bits + 1
# (60-bit hash, 12 bucket bits); 281474976710655 = 2^48 - 1;
# 562949953421312.0 = 2^49.
ORACLES["td_hll_tokens"] = """
WITH tok AS (
  SELECT lang, unnest(string_split(text, ' ')) AS token FROM documents
),
hashed AS (
  SELECT lang, CAST('0x' || substr(md5(token), 1, 15) AS BIGINT) AS h
  FROM tok WHERE length(token) > 0
),
mx AS (
  SELECT lang, h >> 48 AS bucket,
         max(CASE WHEN (h & 281474976710655) = 0 THEN 49
                  ELSE 49 - length(bin(h & 281474976710655)) END) AS mx
  FROM hashed GROUP BY 1, 2
),
agg AS (
  SELECT lang,
         sum(CAST(1 AS BIGINT) << (49 - mx)) AS s_present,
         CAST(count(*) AS BIGINT) AS n_nonzero
  FROM mx GROUP BY lang
),
est AS (
  SELECT lang, n_nonzero,
         (0.7213 / (1 + 1.079 / 4096)) * 4096 * 4096 * 562949953421312.0
           / CAST(s_present + (4096 - n_nonzero) * (CAST(1 AS BIGINT) << 49)
                  AS DOUBLE) AS raw,
         4096 - n_nonzero AS zeros
  FROM agg
)
SELECT lang, CAST(4096 AS BIGINT) AS n_buckets, n_nonzero,
       floor((CASE WHEN raw <= 2.5 * 4096 AND zeros > 0
                   THEN 4096.0 * ln(4096.0 / zeros) ELSE raw END)
             * 1000000.0 + 0.5) / 1000000.0 AS hll_estimate
FROM est
"""

# KMV sketch set algebra: both engines build identical k-minimum-value
# sketches from hash60 and apply the same estimators; 1152921504606846976
# = 2^60.
ORACLES["td_kmv_overlap"] = """
WITH tok AS (
  SELECT lang AS g, CAST('0x' || substr(md5(token), 1, 15) AS BIGINT) AS h
  FROM (SELECT lang, unnest(string_split(text, ' ')) AS token FROM documents)
  WHERE length(token) > 0
),
dedup AS (SELECT DISTINCT g, h FROM tok),
topk AS (
  SELECT g, h FROM dedup
  QUALIFY row_number() OVER (PARTITION BY g ORDER BY h) <= 8
),
sk AS (SELECT g, list_sort(list(h)) AS sk FROM topk GROUP BY g),
pairs AS (
  SELECT a.g AS group_a, b.g AS group_b,
         list_sort(list_distinct(list_concat(a.sk, b.sk)))[1:8] AS merged,
         a.sk AS sk_a, b.sk AS sk_b
  FROM sk a JOIN sk b ON a.g < b.g
),
est AS (
  SELECT group_a, group_b,
         CASE WHEN len(merged) < 8 THEN CAST(len(merged) AS DOUBLE)
              ELSE 7.0 * 1152921504606846976.0 / merged[8] END AS union_est,
         CAST(len(list_intersect(list_intersect(merged, sk_a), sk_b)) AS DOUBLE)
           / least(len(merged), 8) AS j_est
  FROM pairs
)
SELECT group_a, group_b,
       floor(union_est * 1000000.0 + 0.5) / 1000000.0 AS union_est,
       floor(j_est * 1000000.0 + 0.5) / 1000000.0 AS jaccard_est,
       floor(j_est * union_est * 1000000.0 + 0.5) / 1000000.0 AS inter_est
FROM est
"""

# Bigram-LM quality: both engines train the same add-one-smoothed model
# on the corpus; per-term log-probs quantized to integer micro-units
# before summing (aggregation-order-proof).
ORACLES["td_lm_score"] = """
WITH docs AS (
  SELECT doc_id, string_split(text, ' ') AS l FROM documents
),
bigrams AS (
  SELECT doc_id, l[i] AS w1, l[i + 1] AS w2
  FROM (SELECT doc_id, l, unnest(generate_series(1, len(l) - 1)) AS i
        FROM docs WHERE len(l) >= 2)
),
c1 AS (
  SELECT w1, CAST(count(*) AS BIGINT) AS c1
  FROM (SELECT doc_id, unnest(l) AS w1 FROM docs) GROUP BY w1
),
v AS (
  SELECT CAST(count(DISTINCT w1) AS BIGINT) AS vs
  FROM (SELECT unnest(l) AS w1 FROM docs)
),
c2 AS (
  SELECT w1, w2, CAST(count(*) AS BIGINT) AS c2 FROM bigrams GROUP BY w1, w2
),
scored AS (
  SELECT b.doc_id,
         CAST(floor(ln(CAST(c2.c2 + 1 AS DOUBLE) / (c1.c1 + v.vs))
                    * 1000000.0 + 0.5) AS BIGINT) AS term_u
  FROM bigrams b
  JOIN c2 ON b.w1 = c2.w1 AND b.w2 = c2.w2
  JOIN c1 ON b.w1 = c1.w1
  CROSS JOIN v
)
SELECT doc_id, CAST(count(*) AS BIGINT) AS n_bigrams,
       floor(CAST(sum(term_u) AS DOUBLE) / (1000000.0 * count(*))
             * 1000000.0 + 0.5) / 1000000.0 AS avg_logp
FROM scored GROUP BY doc_id
"""

# Edit-distance pairs: the ENGINE joins SymSpell deletion neighborhoods;
# the oracle does the naive quadratic scan with native levenshtein().
# Vocabulary = corpus tokens + injected last-char-dropped misspellings
# (inject_misspellings mirror, min length 5).
ORACLES["td_edit_pairs"] = """
WITH base AS (
  SELECT DISTINCT tok AS token
  FROM (SELECT unnest(string_split(text, ' ')) AS tok FROM documents)
  WHERE length(tok) > 0 AND strlen(tok) = length(tok)
),
vocab AS (
  SELECT token FROM base
  UNION
  SELECT substr(token, 1, length(token) - 1) FROM base WHERE length(token) >= 5
)
SELECT a.token AS tok_a, b.token AS tok_b,
       CAST(levenshtein(a.token, b.token) AS BIGINT) AS dist
FROM vocab a
JOIN vocab b ON a.token < b.token AND levenshtein(a.token, b.token) <= 1
"""

# Overlap coefficient (asymmetric containment): same injected corpus
# as the other dedup gates; truncated copies are CONTAINED in their
# source (overlap 1.0) even where Jaccard drops below a symmetric
# threshold.
ORACLES["td_containment"] = """
WITH base AS (
  SELECT doc_id, string_split(text, ' ') AS l FROM documents
),
toks AS (
  SELECT doc_id, l FROM base
  UNION ALL
  SELECT doc_id + 10000000,
         string_split(array_to_string(l[1:greatest(len(l) - 2, 1)], ' '), ' ')
  FROM base WHERE doc_id % 50 = 0
),
sh AS (
  SELECT DISTINCT doc_id, gram AS shingle FROM (
    SELECT doc_id,
           unnest(list_transform(generate_series(1, greatest(len(l) - 2, 1)),
                                 i -> array_to_string(l[i:i+2], ' '))) AS gram
    FROM toks
  ) WHERE length(gram) > 0
),
sizes AS (
  SELECT doc_id, CAST(count(*) AS BIGINT) AS n_sh FROM sh GROUP BY doc_id
),
inter AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, CAST(count(*) AS BIGINT) AS n_inter
  FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
  GROUP BY 1, 2
)
SELECT i.doc_a, i.doc_b,
       floor(CAST(i.n_inter AS DOUBLE) / least(sa.n_sh, sb.n_sh)
             * 1000000.0 + 0.5) / 1000000.0 AS overlap
FROM inter i
JOIN sizes sa ON i.doc_a = sa.doc_id
JOIN sizes sb ON i.doc_b = sb.doc_id
WHERE floor(CAST(i.n_inter AS DOUBLE) / least(sa.n_sh, sb.n_sh)
            * 1000000.0 + 0.5) / 1000000.0 >= 0.9
"""

# The prefix-filtered containment join is EXACT — provably the same
# pairs/values as the naive form — so its oracle is the identical SQL.
ORACLES["td_containment_scaled"] = ORACLES["td_containment"]

# MOSS match stage over the injected corpus: pairs sharing >= 4
# winnowed fingerprints (k=8, window=4 — same kernel as td_winnow_fps).
ORACLES["td_winnow_pairs"] = """
WITH base AS (
  SELECT doc_id, text FROM documents
  UNION ALL
  SELECT doc_id + 10000000,
         array_to_string(
           string_split(text, ' ')[1:greatest(len(string_split(text, ' ')) - 2, 1)],
           ' ')
  FROM documents WHERE doc_id % 50 = 0
),
g AS (
  SELECT doc_id,
    list_transform(generate_series(1, greatest(length(text) - 8 + 1, 1)),
      i -> list_reduce(
             list_prepend(CAST(0 AS BIGINT),
               list_transform(string_split(substr(text, CAST(i AS INT), 8), ''),
                              c -> CAST(ord(c) AS BIGINT))),
             (a, c) -> (a * 31 + c) % 2147483647)) AS grams
  FROM base WHERE length(text) > 0
),
w AS (
  SELECT doc_id,
    list_distinct(
      list_transform(generate_series(1, greatest(len(grams) - 4 + 1, 1)),
                     j -> list_min(grams[j:j+3]))) AS fps
  FROM g
),
fp0 AS (SELECT doc_id, unnest(fps) AS fp FROM w),
rare AS (SELECT fp FROM fp0 GROUP BY fp HAVING count(*) <= 5),
fp AS (SELECT fp0.doc_id, fp0.fp FROM fp0 JOIN rare USING (fp))
SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, CAST(count(*) AS BIGINT) AS shared_fps
FROM fp a JOIN fp b ON a.fp = b.fp AND a.doc_id < b.doc_id
GROUP BY 1, 2
HAVING count(*) >= 4
"""

# Deterministic stratified sampling: the oracle reproduces the exact
# per-row keep/drop decision from the same md5 hash — not a rate check.
ORACLES["td_sample"] = """
SELECT doc_id, lang
FROM documents
WHERE CAST('0x' || substr(md5('strat:' || lang || ':' || CAST(doc_id AS VARCHAR)), 1, 15)
           AS BIGINT) % 1000
      < CASE lang WHEN 'en' THEN 500 WHEN 'zh' THEN 250 ELSE 100 END
"""

# Prefix-filtered exact similarity join: the ENGINE prunes with rarest-
# shingle prefixes (lossless by the SSJoin prefix lemma); the oracle just
# computes the exact all-pairs answer the filter must reproduce.
ORACLES["td_jaccard_prefix"] = """
WITH base AS (
  SELECT doc_id, string_split(text, ' ') AS l FROM documents
),
toks AS (
  SELECT doc_id, l FROM base
  UNION ALL
  SELECT doc_id + 10000000,
         string_split(array_to_string(l[1:greatest(len(l) - 2, 1)], ' '), ' ')
  FROM base WHERE doc_id % 50 = 0
),
sh AS (
  SELECT DISTINCT doc_id, gram AS shingle FROM (
    SELECT doc_id,
           unnest(list_transform(generate_series(1, greatest(len(l) - 2, 1)),
                                 i -> array_to_string(l[i:i+2], ' '))) AS gram
    FROM toks
  ) WHERE length(gram) > 0
),
sizes AS (
  SELECT doc_id, CAST(count(*) AS BIGINT) AS n_sh FROM sh GROUP BY doc_id
),
inter AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, CAST(count(*) AS BIGINT) AS n_inter
  FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
  GROUP BY 1, 2
)
SELECT i.doc_a, i.doc_b,
       floor(CAST(i.n_inter AS DOUBLE)
             / (sa.n_sh + sb.n_sh - i.n_inter) * 1000000.0 + 0.5) / 1000000.0 AS jaccard
FROM inter i
JOIN sizes sa ON i.doc_a = sa.doc_id
JOIN sizes sb ON i.doc_b = sb.doc_id
WHERE floor(CAST(i.n_inter AS DOUBLE)
            / (sa.n_sh + sb.n_sh - i.n_inter) * 1000000.0 + 0.5) / 1000000.0 >= 0.5
"""

# The capstone composition: near-dup removal (same CTE chain as
# td_dup_clusters_lsh) → curation → stratified sampling by DETECTED
# language → token accounting, all over the post-dedup `corpus` CTE
# (the per-doc oracle fragments are reused verbatim with their source
# retargeted from `documents` to `corpus`).
def _over_corpus(fragment: str) -> str:
    return fragment.replace("FROM documents", "FROM corpus")


ORACLES["td_pipeline"] = f"""
WITH RECURSIVE inj AS (
  SELECT doc_id, text FROM documents
  UNION ALL
  SELECT doc_id + 10000000,
         array_to_string(
           string_split(text, ' ')[1:greatest(len(string_split(text, ' ')) - 2, 1)],
           ' ')
  FROM documents WHERE doc_id % 50 = 0
),
toks AS (SELECT doc_id, string_split(text, ' ') AS l FROM inj),
sh AS (
  SELECT DISTINCT doc_id, gram AS shingle FROM (
    SELECT doc_id,
           unnest(list_transform(generate_series(1, greatest(len(l) - 2, 1)),
                                 i -> array_to_string(l[i:i+2], ' '))) AS gram
    FROM toks
  ) WHERE length(gram) > 0
),
sig AS (
  SELECT doc_id,
         {_mh_mins}
  FROM sh GROUP BY doc_id
),
banded AS (
{_mh_banded}
),
cand AS (
  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
  FROM banded a
  JOIN banded b ON a.band = b.band AND a.bucket = b.bucket AND a.doc_id < b.doc_id
),
sizes AS (
  SELECT doc_id, CAST(count(*) AS BIGINT) AS n_sh FROM sh GROUP BY doc_id
),
inter AS (
  SELECT c.doc_a, c.doc_b, CAST(count(*) AS BIGINT) AS n_inter
  FROM cand c
  JOIN sh a ON a.doc_id = c.doc_a
  JOIN sh b ON b.doc_id = c.doc_b AND b.shingle = a.shingle
  GROUP BY 1, 2
),
pairs AS (
  SELECT i.doc_a, i.doc_b
  FROM inter i
  JOIN sizes sa ON i.doc_a = sa.doc_id
  JOIN sizes sb ON i.doc_b = sb.doc_id
  WHERE floor(CAST(i.n_inter AS DOUBLE)
              / (sa.n_sh + sb.n_sh - i.n_inter) * 1000000.0 + 0.5) / 1000000.0 >= 0.5
),
sym AS (
  SELECT doc_a AS a, doc_b AS b FROM pairs
  UNION
  SELECT doc_b, doc_a FROM pairs
),
reach AS (
  SELECT a AS node, b AS r FROM sym
  UNION
  SELECT re.node, s.b FROM reach re JOIN sym s ON re.r = s.a
),
comp AS (
  SELECT node, least(node, min(r)) AS component FROM reach GROUP BY node
),
corpus AS (
  SELECT doc_id, text FROM inj
  WHERE doc_id NOT IN (SELECT node FROM comp WHERE node <> component)
)
SELECT s.doc_id, l.predicted_lang, q.quality, t.ws_tokens
FROM (
  SELECT min(doc_id) AS doc_id
  FROM (
    SELECT doc_id,
           md5(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g')) AS f
    FROM corpus
  ) GROUP BY f
) s
JOIN ({_over_corpus(ORACLES["td_quality"])}) q ON q.doc_id = s.doc_id
JOIN ({_over_corpus(ORACLES["td_language_id"])}) l ON l.doc_id = s.doc_id
JOIN ({_over_corpus(ORACLES["td_token_counts"])}) t ON t.doc_id = s.doc_id
WHERE q.quality >= 0.5 AND l.predicted_lang <> 'und'
  AND CAST('0x' || substr(md5('strat:' || l.predicted_lang || ':'
             || CAST(s.doc_id AS VARCHAR)), 1, 15) AS BIGINT) % 1000
      < CASE l.predicted_lang WHEN 'en' THEN 500 WHEN 'zh' THEN 250 ELSE 100 END
"""

ORACLES["td_contamination"] = """
WITH toks AS (
  SELECT doc_id, string_split(text, ' ') AS l FROM documents
),
sh AS (
  SELECT DISTINCT doc_id, gram AS shingle FROM (
    SELECT doc_id,
           unnest(list_transform(generate_series(1, greatest(len(l) - 2, 1)),
                                 i -> array_to_string(l[i:i+2], ' '))) AS gram
    FROM toks
  ) WHERE length(gram) > 0
),
t AS (SELECT doc_id AS train_doc, shingle FROM sh WHERE doc_id % 97 <> 0),
b AS (SELECT doc_id AS bench_doc, shingle FROM sh WHERE doc_id % 97 = 0)
SELECT train_doc, bench_doc, CAST(count(*) AS BIGINT) AS shared_ngrams
FROM t JOIN b USING (shingle)
GROUP BY 1, 2
HAVING count(*) >= 2
"""


def _pii_sql() -> str:
    """Mirror of the scrub_pii sequential count-then-replace policy,
    generated from the same PII_PATTERNS so patterns cannot drift."""
    from .operators.textstats import CONTACT_SQL, PII_PATTERNS

    cur = CONTACT_SQL
    counts = []
    for name, pat, repl in PII_PATTERNS:
        counts.append(
            f"CAST(len(regexp_extract_all({cur}, '{pat}')) AS BIGINT) AS n_{name}"
        )
        cur = f"regexp_replace({cur}, '{pat}', '{repl}', 'g')"
    cols = ",\n       ".join([f"{cur} AS clean"] + counts)
    return f"SELECT doc_id,\n       {cols}\nFROM documents"


ORACLES["td_pii_scrub"] = _pii_sql()

# ---- gate-stable projections of nested/binary outputs -------------------

ORACLES["kg_docs_with_spans"] = kg_sql(
    """
SELECT doc_id,
       CAST(count(*) AS BIGINT) AS n_spans,
       string_agg(kind || ',' || COALESCE(text, '') || ',' || COALESCE(media_ref, '')
                  || ',' || CAST("offset" AS VARCHAR), '|' ORDER BY "offset") AS span_seq
FROM spans GROUP BY doc_id
"""
)

_mm_feats = ",\n       ".join(
    "floor(ord(substr(media_ref, ({i} % length(media_ref)) + 1, 1)) / 255.0"
    " * 1000000.0 + 0.5) / 1000000.0 AS f{i}".format(i=i)
    for i in range(8)
)

ORACLES["mm_media_features"] = kg_sql(
    f"""
SELECT doc_id, "offset", media_ref,
       TRUE AS decoded_ok,
       {_mm_feats}
FROM spans WHERE kind = 'media'
"""
)

# Perceptual average-hash over the fake-decoded features (ord(byte)/255
# cyclic over the payload = the utf-8 media_ref, mirroring _fake_decode);
# LEFT folds on both sides so the float path is bit-identical.
ORACLES["mm_media_ahash"] = kg_sql(
    """
SELECT doc_id, "offset", media_ref,
       CAST(list_reduce(list_prepend(CAST(0 AS BIGINT),
            list_transform(generate_series(0, 7),
              i -> CASE WHEN feat[CAST(i AS INT) + 1] > mu
                   THEN (CAST(1 AS BIGINT) << CAST(i AS INT))
                   ELSE CAST(0 AS BIGINT) END)),
            (a, x) -> a + x) AS BIGINT) AS ahash
FROM (
  SELECT doc_id, "offset", media_ref, feat,
         list_reduce(list_prepend(0.0, feat), (a, x) -> a + x) / 8.0 AS mu
  FROM (
    SELECT doc_id, "offset", media_ref,
           list_transform(generate_series(0, 7),
             i -> CAST(ord(substr(media_ref,
                    CAST(i % length(media_ref) AS INT) + 1, 1)) AS DOUBLE)
                  / 255.0) AS feat
    FROM spans WHERE kind = 'media'
  )
)
"""
)

# ---- wiki-shaped derived tables (J10/A7 + J7 at data scale) ------------

ORACLES["wiki_item_signals"] = """
WITH ps AS (
  SELECT 'w' || CAST(p_partkey % 3 AS VARCHAR) AS wiki,
         p_partkey AS page_id,
         'Q' || CAST(1 + p_partkey % 500 AS VARCHAR) AS item,
         CAST(p_size AS BIGINT) AS wikitext_bytes,
         CAST(p_partkey % 7 AS BIGINT) AS claims,
         CAST(p_partkey % 5 AS BIGINT) AS identifiers,
         CAST(p_partkey % 11 AS BIGINT) AS sitelinks
  FROM part
),
wv AS (
  SELECT 'w' || CAST(l_partkey % 3 AS VARCHAR) AS wiki,
         l_partkey AS page_id,
         CAST(floor(l_quantity) AS BIGINT) AS views
  FROM lineitem
),
vpp AS (
  SELECT wiki, page_id, CAST(sum(views) AS BIGINT) AS views
  FROM wv GROUP BY wiki, page_id
)
SELECT p.item,
       CAST(sum(COALESCE(v.views, 0)) AS BIGINT) AS pageviews_52w,
       CAST(sum(COALESCE(p.wikitext_bytes, 0)) AS BIGINT) AS wikitext_bytes,
       CAST(sum(COALESCE(p.claims, 0)) AS BIGINT) AS claims,
       CAST(sum(COALESCE(p.identifiers, 0)) AS BIGINT) AS identifiers,
       CAST(sum(COALESCE(p.sitelinks, 0)) AS BIGINT) AS sitelinks
FROM ps p LEFT JOIN vpp v ON p.wiki = v.wiki AND p.page_id = v.page_id
GROUP BY p.item
"""

ORACLES["wiki_links"] = """
WITH page_items AS (
  SELECT p_partkey AS page_id, CAST(1 + p_partkey % 211 AS BIGINT) AS item_id
  FROM part
),
targets AS (
  SELECT 'T' || CAST(s_suppkey AS VARCHAR) AS title,
         CAST(s_suppkey % 97 AS BIGINT) AS item_id
  FROM supplier
  UNION ALL
  SELECT 'R' || CAST(c_custkey AS VARCHAR),
         CAST(c_custkey % 97 AS BIGINT)
  FROM customer
),
pl AS (
  SELECT l_partkey AS from_page,
         CAST(l_linenumber % 2 AS INT) AS namespace,
         CASE WHEN l_orderkey % 4 = 0
              THEN 'R' || CAST(1 + l_suppkey % 1500 AS VARCHAR)
              ELSE 'T' || CAST(l_suppkey AS VARCHAR) END AS title
  FROM lineitem
),
prefixed AS (
  SELECT from_page,
         CASE WHEN namespace <> 0 THEN 'NS:' || title ELSE title END AS title
  FROM pl
),
edges AS (
  SELECT DISTINCT pi.item_id AS src_id, t.item_id AS dst_id
  FROM prefixed l
  JOIN page_items pi ON l.from_page = pi.page_id
  JOIN targets t ON l.title = t.title
  WHERE pi.item_id <> t.item_id
)
SELECT 'Q' || CAST(src_id AS VARCHAR) AS subj,
       'links_to' AS pred,
       'Q' || CAST(dst_id AS VARCHAR) AS obj,
       src_id, dst_id
FROM edges
"""

# SQL-surface demo: the user's spark.sql query over kg_qrank — oracle
# nests the kg_qrank oracle with the same predicate.
ORACLES["an_sql_surface"] = f"""
SELECT item, item_id, views, rank
FROM ({ORACLES["kg_qrank"]})
WHERE rank <= 10
"""

# ---- general analytics -------------------------------------------------

ORACLES["an_pricing_summary"] = """
SELECT l_returnflag, l_linestatus,
       CAST(sum(CAST(floor(l_quantity * 100 + 0.5) AS BIGINT)) AS BIGINT) AS sum_qty_c,
       CAST(sum(CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT)) AS BIGINT) AS sum_base_c,
       CAST(sum(CAST(floor(l_extendedprice * (1 - l_discount) * 10000 + 0.5) AS BIGINT)) AS BIGINT) AS sum_disc_price_u,
       CAST(count(*) AS BIGINT) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
GROUP BY l_returnflag, l_linestatus
"""

ORACLES["an_revenue_by_nation"] = """
SELECT n.n_name,
       CAST(sum(CAST(floor(l.l_extendedprice * (1 - l.l_discount) * 10000 + 0.5) AS BIGINT)) AS BIGINT) AS revenue_u,
       CAST(count(*) AS BIGINT) AS n_items
FROM lineitem l
JOIN orders o ON l.l_orderkey = o.o_orderkey
JOIN customer c ON o.o_custkey = c.c_custkey
JOIN nation n ON c.c_nationkey = n.n_nationkey
GROUP BY n.n_name
"""

# Salting is result-transparent: the oracle is the PLAIN join.
ORACLES["an_salted_join"] = """
SELECT o.o_orderpriority,
       CAST(count(*) AS BIGINT) AS n_items,
       CAST(sum(CAST(floor(l.l_extendedprice * 100 + 0.5) AS BIGINT)) AS BIGINT) AS sum_base_c
FROM lineitem l
JOIN orders o ON l.l_orderkey = o.o_orderkey
GROUP BY o.o_orderpriority
"""

# Bloom pruning is correctness-neutral: the oracle is the PLAIN join.
ORACLES["an_bloom_semijoin"] = """
SELECT l.l_returnflag,
       CAST(count(*) AS BIGINT) AS n_items,
       CAST(sum(CAST(floor(l.l_extendedprice * 100 + 0.5) AS BIGINT)) AS BIGINT) AS sum_base_c
FROM lineitem l
JOIN orders o ON l.l_orderkey = o.o_orderkey
WHERE floor(o.o_totalprice * 100 + 0.5) > 40000000
GROUP BY l.l_returnflag
"""

ORACLES["an_pivot"] = """
SELECT CAST(year(CAST(o_orderdate AS TIMESTAMP)) AS INT) AS order_year,
       CAST(month(CAST(o_orderdate AS TIMESTAMP)) AS INT) AS order_month,
       CAST(count(CASE WHEN o_orderstatus = 'O' THEN 1 END) AS BIGINT) AS n_open,
       CAST(count(CASE WHEN o_orderstatus = 'F' THEN 1 END) AS BIGINT) AS n_filled,
       CAST(count(CASE WHEN o_orderstatus = 'P' THEN 1 END) AS BIGINT) AS n_partial
FROM orders
GROUP BY 1, 2
"""

ORACLES["an_set_ops"] = """
WITH ordered AS (
  SELECT c_custkey FROM customer c
  WHERE EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
),
never AS (
  SELECT c_custkey FROM customer c
  WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
),
high AS (
  SELECT DISTINCT o_custkey AS c_custkey FROM orders
  WHERE floor(o_totalprice * 100 + 0.5) > 30000000
)
SELECT c_custkey, 'ordered' AS segment FROM ordered
UNION ALL
SELECT c_custkey, 'never_ordered' FROM never
UNION ALL
SELECT c_custkey, 'low_value_only' FROM ordered
WHERE c_custkey NOT IN (SELECT c_custkey FROM high)
"""

# The oracle keeps the CORRELATED subquery form — DuckDB decorrelates
# it itself, independently of the engine's explicit join rewrite.
ORACLES["an_below_avg"] = """
SELECT CAST(count(*) AS BIGINT) AS n_items,
       CAST(sum(CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT)) AS BIGINT) AS sum_base_c
FROM lineitem l
WHERE CAST(floor(l_quantity * 100 + 0.5) AS BIGINT)
      * (SELECT count(*) FROM lineitem i WHERE i.l_partkey = l.l_partkey) * 5
      < (SELECT sum(CAST(floor(i.l_quantity * 100 + 0.5) AS BIGINT))
         FROM lineitem i WHERE i.l_partkey = l.l_partkey)
"""

ORACLES["an_full_outer"] = """
WITH cc AS (
  SELECT c_nationkey AS nationkey, CAST(count(*) AS BIGINT) AS n_customers
  FROM customer GROUP BY 1
),
sc AS (
  SELECT s_nationkey AS nationkey, CAST(count(*) AS BIGINT) AS n_suppliers
  FROM supplier GROUP BY 1
)
SELECT coalesce(cc.nationkey, sc.nationkey) AS nationkey,
       CAST(coalesce(n_customers, 0) AS BIGINT) AS n_customers,
       CAST(coalesce(n_suppliers, 0) AS BIGINT) AS n_suppliers
FROM cc FULL JOIN sc ON cc.nationkey = sc.nationkey
"""

# pivot → unpivot must round-trip to the plain long-form GROUP BY.
ORACLES["an_unpivot"] = """
SELECT CAST(year(CAST(o_orderdate AS TIMESTAMP)) AS INT) AS order_year,
       CAST(month(CAST(o_orderdate AS TIMESTAMP)) AS INT) AS order_month,
       o_orderstatus,
       CAST(count(*) AS BIGINT) AS n
FROM orders
GROUP BY 1, 2, 3
"""

ORACLES["an_top_orders"] = """
SELECT o_custkey, o_orderkey,
       CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS price_c,
       CAST(row_number() OVER (
         PARTITION BY o_custkey
         ORDER BY floor(o_totalprice * 100 + 0.5) DESC, o_orderkey ASC
       ) AS BIGINT) AS order_rank
FROM orders
QUALIFY order_rank <= 3
"""


# item_signals ⨯ pagerank composition (subqueries carry their own WITH)
ORACLES["kg_item_signals_pr"] = f"""
SELECT s.*, COALESCE(p.rank, 0.0) AS pagerank
FROM ({ORACLES["kg_item_signals"]}) s
LEFT JOIN ({ORACLES["kg_pagerank"]}) p ON s.item_id = p.node
"""

# ---- round-4 additions -------------------------------------------------

# IVM invariant: merge(agg(base), agg(delta)) == agg(base ∪ delta); the
# oracle aggregates the whole corpus directly, so hash equality proves
# the incremental KG path absorbs a batch without re-reading history.
ORACLES["kg_qviews_incremental"] = ORACLES["kg_qviews"]

ORACLES["kg_snapshot_diff"] = kg_sql(
    """
, edges_a AS (
  SELECT 'Q' || CAST(item_id AS VARCHAR) AS subj,
         'links_to' AS pred,
         'Q' || CAST(next_id AS VARCHAR) AS obj,
         CAST(count(*) AS BIGINT) AS weight_a
  FROM (
    SELECT item_id,
           lead(item_id) OVER (PARTITION BY doc_id ORDER BY "offset") AS next_id
    FROM tmentions WHERE CAST(doc_id AS BIGINT) % 5 != 0
  )
  WHERE next_id IS NOT NULL AND next_id <> item_id
  GROUP BY 1, 2, 3
),
edges_b AS (
  SELECT 'Q' || CAST(item_id AS VARCHAR) AS subj,
         'links_to' AS pred,
         'Q' || CAST(next_id AS VARCHAR) AS obj,
         CAST(count(*) AS BIGINT) AS weight_b
  FROM (
    SELECT item_id,
           lead(item_id) OVER (PARTITION BY doc_id ORDER BY "offset") AS next_id
    FROM tmentions WHERE CAST(doc_id AS BIGINT) % 5 != 1
  )
  WHERE next_id IS NOT NULL AND next_id <> item_id
  GROUP BY 1, 2, 3
)
SELECT coalesce(a.subj, b.subj) AS subj,
       coalesce(a.pred, b.pred) AS pred,
       coalesce(a.obj, b.obj) AS obj,
       a.weight_a, b.weight_b,
       CASE WHEN a.weight_a IS NULL THEN 'added'
            WHEN b.weight_b IS NULL THEN 'removed'
            ELSE 'changed' END AS change
FROM edges_a a
FULL OUTER JOIN edges_b b
  ON a.subj = b.subj AND a.pred = b.pred AND a.obj = b.obj
WHERE a.weight_a IS NULL OR b.weight_b IS NULL OR a.weight_a <> b.weight_b
"""
)

ORACLES["ev_gap_fill"] = """
WITH agg AS (
  SELECT event_type,
         epoch_us(ts) // 3600000000 AS bucket_h,
         CAST(count(*) AS BIGINT) AS n_events,
         CAST(sum(CAST(floor(value * 100 + 0.5) AS BIGINT)) AS BIGINT) AS value_c
  FROM events
  GROUP BY event_type, bucket_h
),
bounds AS (
  SELECT event_type, min(bucket_h) AS lo, max(bucket_h) AS hi
  FROM agg GROUP BY event_type
),
dense AS (
  SELECT event_type, unnest(generate_series(lo, hi)) AS bucket_h FROM bounds
)
SELECT d.event_type,
       CAST(d.bucket_h AS BIGINT) AS bucket_h,
       CAST(coalesce(a.n_events, 0) AS BIGINT) AS n_events,
       a.value_c,
       last_value(a.value_c IGNORE NULLS) OVER (
         PARTITION BY d.event_type ORDER BY d.bucket_h
         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
       ) AS value_c_locf
FROM dense d LEFT JOIN agg a
  ON d.event_type = a.event_type AND d.bucket_h = a.bucket_h
"""

ORACLES["td_repetition"] = """
WITH d AS (
  SELECT doc_id, string_split(text, ' ') AS l FROM documents
),
g AS (
  SELECT doc_id,
         CASE WHEN len(l) >= 3
              THEN list_transform(generate_series(1, len(l) - 2),
                                  i -> l[i] || ' ' || l[i + 1] || ' ' || l[i + 2])
              ELSE CAST([] AS VARCHAR[]) END AS grams
  FROM d
)
SELECT doc_id,
       CAST(len(grams) AS BIGINT) AS n_grams,
       CAST(len(list_distinct(grams)) AS BIGINT) AS n_distinct,
       CASE WHEN len(grams) > 0
            THEN floor((1 - CAST(len(list_distinct(grams)) AS DOUBLE) / len(grams))
                       * 1000000.0 + 0.5) / 1000000.0
            ELSE 0.0 END AS rep_ratio
FROM g
"""

# CCNet-style perplexity bucketing composed over the full td_lm_score
# oracle (nested with its own WITH); quantile_cont ≡ Spark percentile
# bit-for-bit on the shared round6 score values.
ORACLES["td_ccnet_buckets"] = f"""
WITH scored AS (
  SELECT doc_id, avg_logp FROM ({ORACLES["td_lm_score"]}) s
),
cuts AS (
  SELECT quantile_cont(avg_logp, 1.0/3) AS lo,
         quantile_cont(avg_logp, 2.0/3) AS hi
  FROM scored
)
SELECT doc_id, avg_logp,
       CASE WHEN avg_logp >= hi THEN 'head'
            WHEN avg_logp < lo THEN 'tail'
            ELSE 'middle' END AS bucket
FROM scored, cuts
"""

ORACLES["an_q3_shipping"] = """
SELECT l_orderkey,
       CAST(epoch_us(o_orderdate) AS BIGINT) AS o_orderdate_us,
       o_orderpriority,
       CAST(sum(CAST(floor(l_extendedprice * (1 - l_discount) * 10000 + 0.5)
                     AS BIGINT)) AS BIGINT) AS revenue_u
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
WHERE c_mktsegment = 'FURNITURE'
  AND o_orderdate < TIMESTAMP '1998-01-01'
  AND l_shipdate > TIMESTAMP '1998-01-01'
GROUP BY l_orderkey, o_orderdate_us, o_orderpriority
ORDER BY revenue_u DESC, l_orderkey ASC
LIMIT 10
"""

ORACLES["an_q4_priority"] = """
SELECT o_orderpriority, CAST(count(*) AS BIGINT) AS order_count
FROM orders o
WHERE o_orderdate >= TIMESTAMP '1997-01-01'
  AND o_orderdate < TIMESTAMP '1997-07-01'
  AND EXISTS (
    SELECT 1 FROM lineitem l
    WHERE l.l_orderkey = o.o_orderkey AND l.l_shipdate > o.o_orderdate
  )
GROUP BY o_orderpriority
"""

ORACLES["ev_anomaly_zscore"] = """
WITH agg AS (
  SELECT event_type,
         epoch_us(ts) // 3600000000 AS bucket_h,
         CAST(count(*) AS BIGINT) AS n_events
  FROM events GROUP BY event_type, bucket_h
),
mom AS (
  SELECT event_type,
         CAST(count(*) AS BIGINT) AS nb,
         CAST(sum(n_events) AS BIGINT) AS s1,
         CAST(sum(n_events * n_events) AS BIGINT) AS s2
  FROM agg GROUP BY event_type
)
SELECT a.event_type,
       CAST(a.bucket_h AS BIGINT) AS bucket_h,
       a.n_events,
       floor(CASE WHEN (s2 - s1 * s1 / nb) / (nb - 1) > 0
                  THEN (a.n_events - s1 / nb)
                       / sqrt((s2 - s1 * s1 / nb) / (nb - 1))
                  ELSE 0.0 END * 1000000.0 + 0.5) / 1000000.0 AS z,
       abs(CASE WHEN (s2 - s1 * s1 / nb) / (nb - 1) > 0
                THEN (a.n_events - s1 / nb)
                     / sqrt((s2 - s1 * s1 / nb) / (nb - 1))
                ELSE 0.0 END) > 2.0 AS is_anomaly
FROM agg a JOIN mom m ON a.event_type = m.event_type
WHERE nb > 1
"""

ORACLES["kg_two_hop"] = kg_sql(
    """
, edges AS (
  SELECT DISTINCT item_id AS src_id, next_id AS dst_id
  FROM (
    SELECT item_id,
           lead(item_id) OVER (PARTITION BY doc_id ORDER BY "offset") AS next_id
    FROM tmentions
  )
  WHERE next_id IS NOT NULL AND next_id <> item_id
)
SELECT e1.src_id AS src_id,
       CAST(count(DISTINCT e2.dst_id) AS BIGINT) AS n_two_hop
FROM edges e1 JOIN edges e2 ON e1.dst_id = e2.src_id
WHERE e1.src_id <> e2.dst_id
GROUP BY e1.src_id
"""
)

# HLL-sketched two-hop reachability: the oracle rebuilds the identical
# portable md5 registers (same constants as td_hll_tokens: bucket = top
# 12 of 60 hash bits, 2^48-1 remainder mask, rho ceiling 49) per mid
# node, merges them across the edge join with max(), and applies the
# same estimator — so the approximate value is bit-identical, not just
# close.
ORACLES["kg_two_hop_approx"] = kg_sql(
    """
, edges AS (
  SELECT DISTINCT item_id AS src_id, next_id AS dst_id
  FROM (
    SELECT item_id,
           lead(item_id) OVER (PARTITION BY doc_id ORDER BY "offset") AS next_id
    FROM tmentions
  )
  WHERE next_id IS NOT NULL AND next_id <> item_id
),
regs_m AS (
  SELECT m, h >> 48 AS bucket,
         max(CASE WHEN (h & 281474976710655) = 0 THEN 49
                  ELSE 49 - length(bin(h & 281474976710655)) END) AS mx
  FROM (SELECT src_id AS m,
               CAST('0x' || substr(md5(CAST(dst_id AS VARCHAR)), 1, 15)
                    AS BIGINT) AS h
        FROM edges)
  GROUP BY 1, 2
),
merged AS (
  SELECT e1.src_id AS src_id, r.bucket, max(r.mx) AS mx
  FROM edges e1 JOIN regs_m r ON e1.dst_id = r.m
  GROUP BY 1, 2
),
agg AS (
  SELECT src_id,
         sum(CAST(1 AS BIGINT) << (49 - mx)) AS s_present,
         CAST(count(*) AS BIGINT) AS n_nonzero
  FROM merged GROUP BY src_id
),
est AS (
  SELECT src_id, n_nonzero,
         (0.7213 / (1 + 1.079 / 4096)) * 4096 * 4096 * 562949953421312.0
           / CAST(s_present + (4096 - n_nonzero) * (CAST(1 AS BIGINT) << 49)
                  AS DOUBLE) AS raw,
         4096 - n_nonzero AS zeros
  FROM agg
)
SELECT src_id, CAST(4096 AS BIGINT) AS n_buckets, n_nonzero,
       floor((CASE WHEN raw <= 2.5 * 4096 AND zeros > 0
                   THEN 4096.0 * ln(4096.0 / zeros) ELSE raw END)
             * 1000000.0 + 0.5) / 1000000.0 AS n_two_hop_est
FROM est
"""
)

ORACLES["kg_pmi"] = kg_sql(
    """
, inc AS (SELECT DISTINCT doc_id, item_id FROM tmentions),
nd AS (SELECT CAST(count(DISTINCT doc_id) AS BIGINT) AS n FROM inc),
dfi AS (
  SELECT item_id, CAST(count(*) AS BIGINT) AS n_docs_item
  FROM inc GROUP BY item_id
),
pairs AS (
  SELECT a.item_id AS item_a, b.item_id AS item_b,
         CAST(count(*) AS BIGINT) AS n_ab
  FROM inc a JOIN inc b ON a.doc_id = b.doc_id AND a.item_id < b.item_id
  GROUP BY a.item_id, b.item_id
  HAVING count(*) >= 2
)
SELECT p.item_a, p.item_b, p.n_ab,
       floor(ln((p.n_ab * nd.n) / (da.n_docs_item * db.n_docs_item))
             * 1000000.0 + 0.5) / 1000000.0 AS pmi
FROM pairs p
JOIN dfi da ON p.item_a = da.item_id
JOIN dfi db ON p.item_b = db.item_id
CROSS JOIN nd
"""
)

# components need WITH RECURSIVE at the head of the chain (same trick
# as kg_bfs)
ORACLES["kg_entity_components"] = kg_sql(
    """
, edges AS (
  SELECT DISTINCT item_id AS src_id, next_id AS dst_id
  FROM (
    SELECT item_id,
           lead(item_id) OVER (PARTITION BY doc_id ORDER BY "offset") AS next_id
    FROM tmentions
  )
  WHERE next_id IS NOT NULL AND next_id <> item_id
),
sym AS (
  SELECT src_id AS a, dst_id AS b FROM edges
  UNION
  SELECT dst_id, src_id FROM edges
),
reach AS (
  SELECT a AS node, b AS r FROM sym
  UNION
  SELECT re.node, s.b FROM reach re JOIN sym s ON re.r = s.a
)
SELECT node, least(node, min(r)) AS component
FROM reach GROUP BY node
"""
).replace("WITH tok AS", "WITH RECURSIVE tok AS")

ORACLES["an_q5_local_supplier"] = """
SELECT n_name,
       CAST(sum(CAST(floor(l_extendedprice * (1 - l_discount) * 10000 + 0.5)
                     AS BIGINT)) AS BIGINT) AS revenue_u
FROM lineitem
JOIN orders   ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
JOIN nation   ON s_nationkey = n_nationkey
JOIN region   ON n_regionkey = r_regionkey
WHERE r_name = 'EUROPE'
  AND o_orderdate >= TIMESTAMP '1996-01-01'
  AND o_orderdate < TIMESTAMP '1998-01-01'
GROUP BY n_name
"""

ORACLES["td_lang_stats"] = """
WITH t AS (
  SELECT lang, CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
  FROM documents
)
SELECT lang,
       CAST(count(*) AS BIGINT) AS n_docs,
       floor(quantile_cont(n_tokens, 0.5) * 1000000.0 + 0.5) / 1000000.0
         AS median_tokens,
       floor(quantile_cont(n_tokens, 0.9) * 1000000.0 + 0.5) / 1000000.0
         AS p90_tokens,
       floor(CAST(sum(n_tokens) AS DOUBLE) / count(*) * 1000000.0 + 0.5)
         / 1000000.0 AS mean_tokens
FROM t GROUP BY lang
"""

ORACLES["an_q6_forecast"] = """
SELECT CAST(sum(CAST(floor(l_extendedprice * l_discount * 10000 + 0.5)
                     AS BIGINT)) AS BIGINT) AS revenue_u
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1997-01-01'
  AND l_shipdate < TIMESTAMP '1998-01-01'
  AND l_discount >= 0.02 AND l_discount <= 0.09
  AND l_quantity < 24
"""

ORACLES["an_q14_promo"] = """
WITH j AS (
  SELECT CAST(floor(l_extendedprice * (1 - l_discount) * 10000 + 0.5)
              AS BIGINT) AS rev_u,
         p_type
  FROM lineitem JOIN part ON l_partkey = p_partkey
  WHERE l_shipdate >= TIMESTAMP '1997-01-01'
    AND l_shipdate < TIMESTAMP '1997-04-01'
),
s AS (
  SELECT CAST(sum(CASE WHEN p_type LIKE 'PROMO%' THEN rev_u ELSE 0 END)
              AS BIGINT) AS promo_u,
         CAST(sum(rev_u) AS BIGINT) AS total_u
  FROM j
)
SELECT promo_u, total_u,
       floor(100.0 * promo_u / total_u * 1000000.0 + 0.5) / 1000000.0
         AS promo_pct
FROM s
"""

ORACLES["kg_reciprocity"] = kg_sql(
    """
, edges AS (
  SELECT DISTINCT item_id AS src_id, next_id AS dst_id
  FROM (
    SELECT item_id,
           lead(item_id) OVER (PARTITION BY doc_id ORDER BY "offset") AS next_id
    FROM tmentions
  )
  WHERE next_id IS NOT NULL AND next_id <> item_id
),
outd AS (
  SELECT src_id AS node, CAST(count(*) AS BIGINT) AS n_out
  FROM edges GROUP BY src_id
),
mut AS (
  SELECT e.src_id AS node, CAST(count(*) AS BIGINT) AS n_reciprocal
  FROM edges e
  WHERE EXISTS (
    SELECT 1 FROM edges r
    WHERE r.src_id = e.dst_id AND r.dst_id = e.src_id
  )
  GROUP BY e.src_id
)
SELECT o.node, o.n_out,
       CAST(coalesce(m.n_reciprocal, 0) AS BIGINT) AS n_reciprocal,
       floor(CAST(coalesce(m.n_reciprocal, 0) AS DOUBLE) / o.n_out
             * 1000000.0 + 0.5) / 1000000.0 AS reciprocity
FROM outd o LEFT JOIN mut m ON o.node = m.node
"""
)

ORACLES["ev_histogram"] = """
WITH b AS (
  SELECT event_type,
         CAST(least(greatest(floor((value - 0.0) / 20.0), 0), 19) AS BIGINT)
           AS bin
  FROM events
),
c AS (
  SELECT event_type, bin, CAST(count(*) AS BIGINT) AS n
  FROM b GROUP BY event_type, bin
)
SELECT event_type, bin,
       floor((0.0 + bin * 20.0) * 1000000.0 + 0.5) / 1000000.0 AS bin_lo,
       n,
       CAST(sum(n) OVER (
         PARTITION BY event_type ORDER BY bin
         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
       ) AS BIGINT) AS cum_n
FROM c
"""

ORACLES["an_q7_volume"] = """
WITH n AS (SELECT n_nationkey, n_name FROM nation
           WHERE n_name IN ('NATION_11', 'NATION_12'))
SELECT n1.n_name AS supp_nation,
       n2.n_name AS cust_nation,
       CAST(year(l_shipdate) AS INTEGER) AS l_year,
       CAST(sum(CAST(floor(l_extendedprice * (1 - l_discount) * 10000 + 0.5)
                     AS BIGINT)) AS BIGINT) AS revenue_u
FROM lineitem
JOIN supplier ON l_suppkey = s_suppkey
JOIN orders   ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN n n1 ON s_nationkey = n1.n_nationkey
JOIN n n2 ON c_nationkey = n2.n_nationkey
WHERE n1.n_name <> n2.n_name
  AND l_shipdate >= TIMESTAMP '1996-01-01'
  AND l_shipdate < TIMESTAMP '1998-01-01'
GROUP BY 1, 2, 3
"""

ORACLES["an_q8_share"] = """
WITH j AS (
  SELECT CAST(year(o_orderdate) AS INTEGER) AS o_year,
         CAST(floor(l_extendedprice * (1 - l_discount) * 10000 + 0.5)
              AS BIGINT) AS rev_u,
         sn.n_name AS supp_nation
  FROM lineitem
  JOIN part     ON l_partkey = p_partkey
  JOIN supplier ON l_suppkey = s_suppkey
  JOIN orders   ON l_orderkey = o_orderkey
  JOIN customer ON o_custkey = c_custkey
  JOIN nation sn ON s_nationkey = sn.n_nationkey
  WHERE p_type = 'ECONOMY'
    AND o_orderdate >= TIMESTAMP '1996-01-01'
    AND o_orderdate < TIMESTAMP '1998-01-01'
    AND c_nationkey IN (
      SELECT n_nationkey FROM nation JOIN region
        ON n_regionkey = r_regionkey WHERE r_name = 'ASIA')
)
SELECT o_year,
       CAST(sum(CASE WHEN supp_nation = 'NATION_2' THEN rev_u ELSE 0 END)
            AS BIGINT) AS target_u,
       CAST(sum(rev_u) AS BIGINT) AS total_u,
       floor((CAST(sum(CASE WHEN supp_nation = 'NATION_2' THEN rev_u ELSE 0 END)
                   AS BIGINT) / CAST(sum(rev_u) AS BIGINT))
             * 1000000.0 + 0.5) / 1000000.0 AS mkt_share
FROM j GROUP BY o_year
"""

ORACLES["an_q9_profit"] = """
SELECT n_name AS nation,
       CAST(year(o_orderdate) AS INTEGER) AS o_year,
       CAST(sum(CAST(floor(l_extendedprice * (1 - l_discount) * 10000 + 0.5)
                     AS BIGINT)) AS BIGINT) AS profit_u
FROM lineitem
JOIN part     ON l_partkey = p_partkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation   ON s_nationkey = n_nationkey
JOIN orders   ON l_orderkey = o_orderkey
WHERE p_name LIKE '%red%'
GROUP BY 1, 2
"""

ORACLES["an_q10_returns"] = """
SELECT c_custkey, c_name,
       CAST(floor(c_acctbal * 100 + 0.5) AS BIGINT) AS acctbal_c,
       n_name AS nation,
       revenue_u
FROM (
  SELECT o_custkey,
         CAST(sum(CAST(floor(l_extendedprice * (1 - l_discount) * 10000 + 0.5)
                       AS BIGINT)) AS BIGINT) AS revenue_u
  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
  WHERE l_returnflag = 'R'
    AND o_orderdate >= TIMESTAMP '1996-10-01'
    AND o_orderdate < TIMESTAMP '1997-01-01'
  GROUP BY o_custkey
) pc
JOIN customer ON o_custkey = c_custkey
JOIN nation   ON c_nationkey = n_nationkey
ORDER BY revenue_u DESC, c_custkey ASC
LIMIT 20
"""

ORACLES["an_q12_shiplag"] = """
SELECT CASE WHEN date_diff('day', o_orderdate, l_shipdate) > 60
            THEN 'LATE' ELSE 'ON_TIME' END AS lag_bucket,
       CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                     THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
       CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                     THEN 0 ELSE 1 END) AS BIGINT) AS low_line_count
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
WHERE year(l_shipdate) = 1997
GROUP BY 1
"""

ORACLES["an_q13_custdist"] = """
WITH pc AS (
  SELECT c_custkey, CAST(count(o_orderkey) AS BIGINT) AS c_count
  FROM customer LEFT JOIN orders
    ON c_custkey = o_custkey AND o_orderpriority <> '4-NOT SPECIFIED'
  GROUP BY c_custkey
)
SELECT c_count, CAST(count(*) AS BIGINT) AS custdist
FROM pc GROUP BY c_count
"""

ORACLES["an_q15_top_supplier"] = """
WITH rev AS (
  SELECT l_suppkey AS supplier_no,
         CAST(sum(CAST(floor(l_extendedprice * (1 - l_discount) * 10000 + 0.5)
                       AS BIGINT)) AS BIGINT) AS total_revenue_u
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1996-01-01'
    AND l_shipdate < TIMESTAMP '1996-04-01'
  GROUP BY l_suppkey
)
SELECT s_suppkey, s_name, total_revenue_u
FROM rev JOIN supplier ON supplier_no = s_suppkey
WHERE total_revenue_u = (SELECT max(total_revenue_u) FROM rev)
"""

ORACLES["an_q18_big_orders"] = """
WITH big AS (
  SELECT l_orderkey,
         CAST(sum(CAST(floor(l_quantity * 100 + 0.5) AS BIGINT))
              AS BIGINT) AS sum_qty_c
  FROM lineitem GROUP BY l_orderkey
  HAVING sum(CAST(floor(l_quantity * 100 + 0.5) AS BIGINT)) > 30000
)
SELECT c_custkey, c_name, o_orderkey,
       CAST(o_orderdate AS VARCHAR) AS o_orderdate_s,
       CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS totalprice_c,
       sum_qty_c
FROM big
JOIN orders   ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
"""

ORACLES["an_q19_disjunctive"] = """
SELECT CAST(sum(CAST(floor(l_extendedprice * (1 - l_discount) * 10000 + 0.5)
                     AS BIGINT)) AS BIGINT) AS revenue_u,
       CAST(count(*) AS BIGINT) AS n_items
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 15
       AND l_quantity BETWEEN 1 AND 20)
   OR (p_brand = 'Brand#5' AND p_size BETWEEN 10 AND 30
       AND l_quantity BETWEEN 10 AND 30)
   OR (p_brand = 'Brand#9' AND p_size BETWEEN 20 AND 50
       AND l_quantity BETWEEN 20 AND 40)
"""

ORACLES["an_q21_waiting"] = """
WITH lines AS (
  SELECT l_orderkey, l_suppkey,
         date_diff('day', o_orderdate, l_shipdate) > 90 AS is_late
  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
  WHERE o_orderstatus = 'F'
),
l1 AS (SELECT l_orderkey, l_suppkey FROM lines WHERE is_late),
w AS (
  SELECT l1.l_orderkey, l1.l_suppkey FROM l1
  WHERE EXISTS (SELECT 1 FROM lines l2
                WHERE l2.l_orderkey = l1.l_orderkey
                  AND l2.l_suppkey <> l1.l_suppkey)
    AND NOT EXISTS (SELECT 1 FROM lines l3
                    WHERE l3.is_late
                      AND l3.l_orderkey = l1.l_orderkey
                      AND l3.l_suppkey <> l1.l_suppkey)
)
SELECT s_name, n_name AS nation, CAST(count(*) AS BIGINT) AS numwait
FROM w
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation   ON s_nationkey = n_nationkey
GROUP BY s_name, n_name
ORDER BY numwait DESC, s_name ASC, nation ASC
LIMIT 100
"""

ORACLES["an_q22_idle_customers"] = """
WITH c AS (
  SELECT * FROM customer
  WHERE c_nationkey IN (1, 5, 7, 11, 13, 17, 19)
),
avg_bal AS (
  SELECT CAST(sum(CAST(floor(c_acctbal * 100 + 0.5) AS BIGINT)) AS BIGINT)
           AS sum_bal_c,
         CAST(count(*) AS BIGINT) AS n_bal
  FROM c WHERE c_acctbal > 0.0
)
SELECT CAST(c_nationkey AS INTEGER) AS cntrycode,
       CAST(count(*) AS BIGINT) AS numcust,
       CAST(sum(CAST(floor(c_acctbal * 100 + 0.5) AS BIGINT)) AS BIGINT)
         AS totacctbal_c
FROM c, avg_bal
WHERE CAST(floor(c_acctbal * 100 + 0.5) AS BIGINT) * n_bal > sum_bal_c
  AND NOT EXISTS (SELECT 1 FROM orders
                  WHERE o_custkey = c_custkey
                    AND o_orderdate >= TIMESTAMP '1999-01-01')
GROUP BY 1
"""


def _kcore_sql(k: int = 2, rounds: int = 8) -> str:
    """Unrolled k-core peeling — same fixed-round recurrence as
    operators/graph.py:k_core (extra rounds at a fixpoint are no-ops,
    so the engine's early exit cannot diverge from this unroll)."""
    ctes = [
        """,
und0 AS MATERIALIZED (
  SELECT DISTINCT u, v FROM (
    SELECT u, v FROM edges WHERE u <> v
    UNION ALL
    SELECT v AS u, u AS v FROM edges WHERE u <> v
  )
)"""
    ]
    for r in range(1, rounds + 1):
        ctes.append(
            f""",
keep{r} AS MATERIALIZED (
  SELECT u FROM und{r - 1} GROUP BY u HAVING count(*) >= {k}
),
und{r} AS MATERIALIZED (
  SELECT e.u, e.v FROM und{r - 1} e
  JOIN keep{r} a ON e.u = a.u
  JOIN keep{r} b ON e.v = b.u
)"""
        )
    return kg_sql(
        _EDGES_CTE
        + "".join(ctes)
        + f"""
SELECT u AS node, CAST(count(*) AS BIGINT) AS core_degree
FROM und{rounds} GROUP BY u HAVING count(*) >= {k}
"""
    )


ORACLES["kg_kcore"] = _kcore_sql(2, 8)


def _hits_sql(iters: int = 3) -> str:
    """Unrolled HITS recurrence mirroring operators/graph.py:hits —
    half-step ordering (authorities from current hubs, hubs from the
    NEW normalized authorities), L1 normalization + round6 at every
    boundary, absent sides scored 0."""
    r6f = "floor(({x}) * 1000000.0 + 0.5) / 1000000.0"
    ctes = [
        ",\nnn AS (SELECT CAST(count(*) AS DOUBLE) AS n FROM nodes)",
        ",\ns0 AS (SELECT node, "
        + r6f.format(x="1.0 / nn.n")
        + " AS hub, "
        + r6f.format(x="1.0 / nn.n")
        + " AS authority FROM nodes CROSS JOIN nn)",
    ]
    for t in range(1, iters + 1):
        ctes.append(
            f""",
ar{t} AS MATERIALIZED (
  SELECT e.v AS node, sum(s.hub) AS authority
  FROM edges e JOIN s{t - 1} s ON e.u = s.node GROUP BY e.v
),
an{t} AS MATERIALIZED (
  SELECT node,
         CASE WHEN (SELECT sum(authority) FROM ar{t}) > 0
              THEN {r6f.format(x=f"authority / (SELECT sum(authority) FROM ar{t})")}
              ELSE 0.0 END AS authority
  FROM ar{t}
),
hr{t} AS MATERIALIZED (
  SELECT e.u AS node, sum(a.authority) AS hub
  FROM edges e JOIN an{t} a ON e.v = a.node GROUP BY e.u
),
hn{t} AS MATERIALIZED (
  SELECT node,
         CASE WHEN (SELECT sum(hub) FROM hr{t}) > 0
              THEN {r6f.format(x=f"hub / (SELECT sum(hub) FROM hr{t})")}
              ELSE 0.0 END AS hub
  FROM hr{t}
),
s{t} AS MATERIALIZED (
  SELECT no.node,
         COALESCE(h.hub, 0.0) AS hub,
         COALESCE(a.authority, 0.0) AS authority
  FROM nodes no
  LEFT JOIN hn{t} h ON no.node = h.node
  LEFT JOIN an{t} a ON no.node = a.node
)"""
        )
    return kg_sql(
        _EDGES_CTE
        + "".join(ctes)
        + f"\nSELECT node, hub, authority FROM s{iters}\n"
    )


ORACLES["kg_hits"] = _hits_sql(3)


ORACLES["td_countmin"] = """
WITH tok AS (
  SELECT unnest(string_split(text, ' ')) AS token FROM documents
),
coords AS (
  SELECT CAST(ds.d AS INTEGER) AS d,
         CAST('0x' || substr(md5(CAST(ds.d AS VARCHAR) || ':' || token), 1, 15)
              AS BIGINT) % 256 AS bucket
  FROM tok CROSS JOIN (SELECT unnest([0, 1, 2, 3]) AS d) ds
)
SELECT d, bucket, CAST(count(*) AS BIGINT) AS cnt
FROM coords GROUP BY d, bucket
"""


ORACLES["td_countmin_est"] = """
WITH tok AS (
  SELECT unnest(string_split(text, ' ')) AS token FROM documents
),
coords AS (
  SELECT token,
         CAST(ds.d AS INTEGER) AS d,
         CAST('0x' || substr(md5(CAST(ds.d AS VARCHAR) || ':' || token), 1, 15)
              AS BIGINT) % 256 AS bucket
  FROM tok CROSS JOIN (SELECT unnest([0, 1, 2, 3]) AS d) ds
),
sketch AS (
  SELECT d, bucket, CAST(count(*) AS BIGINT) AS cnt
  FROM coords GROUP BY d, bucket
),
probes AS (
  SELECT DISTINCT token AS key, d, bucket FROM coords
)
SELECT p.key, CAST(min(COALESCE(s.cnt, 0)) AS BIGINT) AS est
FROM probes p LEFT JOIN sketch s ON p.d = s.d AND p.bucket = s.bucket
GROUP BY p.key
"""


ORACLES["td_chunk_dedup"] = """
WITH toks AS (
  SELECT doc_id, string_split(text, ' ') AS l FROM documents
),
idxs AS (
  SELECT doc_id, l,
         CAST(unnest(range(CAST(ceil(len(l) / 10.0) AS BIGINT)))
              AS INTEGER) AS idx
  FROM toks
),
ch AS MATERIALIZED (
  SELECT doc_id, idx,
         CAST('0x' || substr(md5(array_to_string(
                l[idx * 10 + 1 : (idx + 1) * 10], ' ')), 1, 15)
              AS BIGINT) AS h
  FROM idxs
),
flag AS (
  SELECT doc_id,
         CASE WHEN row_number() OVER (PARTITION BY h ORDER BY doc_id, idx) = 1
              THEN 0 ELSE 1 END AS is_dup
  FROM ch
)
SELECT doc_id,
       CAST(count(*) AS BIGINT) AS n_chunks,
       CAST(sum(is_dup) AS BIGINT) AS n_dup_chunks
FROM flag GROUP BY doc_id
"""


ORACLES["an_q17_small_qty"] = """
WITH per_part AS (
  SELECT l_partkey AS pk,
         CAST(sum(CAST(floor(l_quantity * 100 + 0.5) AS BIGINT)) AS BIGINT)
           AS sum_qty_c,
         CAST(count(*) AS BIGINT) AS n_li
  FROM lineitem GROUP BY l_partkey
)
SELECT CAST(sum(CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT))
            AS BIGINT) AS revenue_c,
       CAST(count(*) AS BIGINT) AS n_items
FROM lineitem
JOIN part ON l_partkey = p_partkey
JOIN per_part ON l_partkey = pk
WHERE p_brand = 'Brand#3'
  AND CAST(floor(l_quantity * 100 + 0.5) AS BIGINT) * 5 * n_li < sum_qty_c
"""


ORACLES["an_q20_dominant"] = """
WITH li AS MATERIALIZED (
  SELECT l_partkey, l_suppkey,
         CAST(floor(l_quantity * 100 + 0.5) AS BIGINT) AS qty_c
  FROM lineitem JOIN part ON l_partkey = p_partkey
  WHERE year(l_shipdate) = 1997 AND p_name LIKE '%red%'
),
per_ps AS (
  SELECT l_partkey, l_suppkey, CAST(sum(qty_c) AS BIGINT) AS qty_s_c
  FROM li GROUP BY l_partkey, l_suppkey
),
per_p AS (
  SELECT l_partkey AS pk, CAST(sum(qty_c) AS BIGINT) AS qty_p_c
  FROM li GROUP BY l_partkey
),
dominant AS (
  SELECT DISTINCT l_suppkey
  FROM per_ps JOIN per_p ON l_partkey = pk
  WHERE qty_s_c * 2 > qty_p_c
)
SELECT s_suppkey, s_name, n_name AS nation
FROM supplier
JOIN nation ON s_nationkey = n_nationkey
WHERE s_suppkey IN (SELECT l_suppkey FROM dominant)
"""


ORACLES["an_q11_important_parts"] = """
WITH per_part AS MATERIALIZED (
  SELECT l_partkey AS partkey,
         CAST(sum(CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT))
              AS BIGINT) AS value_c
  FROM lineitem GROUP BY l_partkey
)
SELECT partkey, value_c
FROM per_part
WHERE value_c * 1000000 > 100 * (SELECT sum(value_c) FROM per_part)
"""


ORACLES["an_q16_supplier_counts"] = """
SELECT p_brand, p_type, p_size,
       CAST(count(DISTINCT l_suppkey) AS BIGINT) AS supplier_cnt
FROM lineitem
JOIN part ON l_partkey = p_partkey
WHERE p_brand <> 'Brand#3'
  AND p_size IN (1, 4, 9, 16, 25, 36, 49)
  AND l_suppkey NOT IN (
    SELECT s_suppkey FROM supplier WHERE s_nationkey IN (3, 14))
GROUP BY p_brand, p_type, p_size
"""


ORACLES["an_q2_best_supplier"] = """
WITH offers AS (
  SELECT p_partkey,
         CAST(floor(CAST(floor(l_extendedprice * 10000 + 0.5) AS BIGINT) * 100
                    / CAST(floor(l_quantity * 100 + 0.5) AS BIGINT))
              AS BIGINT) AS unit_u,
         s_suppkey, s_name, n_name AS nation
  FROM lineitem
  JOIN part ON l_partkey = p_partkey
  JOIN supplier ON l_suppkey = s_suppkey
  JOIN nation ON s_nationkey = n_nationkey
  JOIN region ON n_regionkey = r_regionkey
  WHERE p_size = 15 AND r_name = 'ASIA'
)
SELECT p_partkey AS partkey, s_suppkey, s_name, nation, unit_u
FROM (
  SELECT *, row_number() OVER (PARTITION BY p_partkey
                               ORDER BY unit_u, s_suppkey) AS rn
  FROM offers
) WHERE rn = 1
"""


def _label_prop_sql(rounds: int = 3) -> str:
    """Unrolled synchronous mode-LPA recurrence mirroring
    operators/graph.py:label_propagation — per round, each node takes
    the most frequent neighbor label, ties toward the smallest; at a
    fixpoint extra rounds are no-ops, so the engine's early exit and
    this fixed unroll agree."""
    ctes = [
        """,
undlp AS (
  SELECT u, v FROM edges WHERE u <> v
  UNION
  SELECT v, u FROM edges WHERE u <> v
),
l0 AS (SELECT DISTINCT u AS node, u AS lbl FROM undlp)"""
    ]
    for r in range(1, rounds + 1):
        ctes.append(
            f""",
l{r} AS MATERIALIZED (
  SELECT node, lbl FROM (
    SELECT e.u AS node, l.lbl AS lbl,
           row_number() OVER (PARTITION BY e.u
                              ORDER BY count(*) DESC, l.lbl ASC) AS rn
    FROM undlp e JOIN l{r - 1} l ON l.node = e.v
    GROUP BY e.u, l.lbl
  ) WHERE rn = 1
)"""
        )
    return kg_sql(
        _EDGES_CTE
        + "".join(ctes)
        + f"\nSELECT node, lbl AS community FROM l{rounds}\n"
    )


ORACLES["kg_label_prop"] = _label_prop_sql(3)


def _harmonic_sql(n_landmarks: int = 8, max_hops: int = 4) -> str:
    """Unrolled landmark harmonic centrality mirroring
    operators/graph.py:harmonic_centrality — per-hop min-distance
    relaxation from the n smallest node ids, integer numerator
    sum(lcm // hops) so the aggregate is order-proof exact."""
    import math

    scale = math.lcm(*range(1, max_hops + 1))
    ctes = [
        f""",
undh AS (
  SELECT u, v FROM edges WHERE u <> v
  UNION
  SELECT v, u FROM edges WHERE u <> v
),
lmh AS (SELECT node FROM nodes ORDER BY node LIMIT {n_landmarks}),
d0 AS (SELECT node AS lm, node, CAST(0 AS BIGINT) AS hops FROM lmh)"""
    ]
    for r in range(1, max_hops + 1):
        ctes.append(
            f""",
d{r} AS MATERIALIZED (
  SELECT lm, node, CAST(min(hops) AS BIGINT) AS hops FROM (
    SELECT lm, node, hops FROM d{r - 1}
    UNION ALL
    SELECT d.lm, e.v AS node, d.hops + 1 AS hops
    FROM d{r - 1} d JOIN undh e ON e.u = d.node
    WHERE d.hops = {r - 1}
  ) GROUP BY lm, node
)"""
        )
    return kg_sql(
        _EDGES_CTE
        + "".join(ctes)
        + f"""
SELECT n.node,
       CAST(COALESCE(s.hn, 0) AS BIGINT) AS harmonic_num,
       CAST(COALESCE(s.hn, 0) AS BIGINT) / {float(scale)!r} AS harmonic
FROM nodes n LEFT JOIN (
  SELECT node, sum({scale} // hops) AS hn
  FROM d{max_hops} WHERE hops > 0 GROUP BY node
) s ON n.node = s.node
"""
    )


ORACLES["kg_harmonic"] = _harmonic_sql(8, 4)


def _bm25_sql(k: int = 3, k1: float = 1.2, b: float = 0.75) -> str:
    """Okapi BM25 top-k terms mirroring textstats.py:bm25_top_terms.
    Float literals are emitted with repr() of the SAME Python doubles
    the Spark expression uses (k1+1, 1-b), so both engines evaluate
    the identical operation sequence on identical doubles; round6
    absorbs libm ln ulp differences (the tfidf contract)."""
    return f"""
WITH toks AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents
),
tf AS (
  SELECT doc_id, term, CAST(count(*) AS BIGINT) AS tf
  FROM toks WHERE length(term) > 0 GROUP BY doc_id, term
),
df AS (SELECT term, CAST(count(*) AS BIGINT) AS df FROM tf GROUP BY term),
dl AS (SELECT doc_id, CAST(sum(tf) AS BIGINT) AS dl FROM tf GROUP BY doc_id),
n AS (SELECT CAST(count(*) AS DOUBLE) AS n_docs FROM documents),
ad AS (
  SELECT (SELECT CAST(sum(tf) AS DOUBLE) FROM tf)
         / (SELECT CAST(count(*) AS DOUBLE) FROM documents) AS avgdl
),
scored AS (
  SELECT t.doc_id, t.term, t.tf,
         floor(ln(1.0 + (n.n_docs - d.df + 0.5) / (d.df + 0.5))
               * (t.tf * {k1 + 1.0!r})
               / (t.tf + {k1!r} * ({1.0 - b!r} + {b!r} * l.dl / ad.avgdl))
               * 1000000.0 + 0.5) / 1000000.0 AS score
  FROM tf t JOIN df d ON t.term = d.term JOIN dl l ON t.doc_id = l.doc_id
  CROSS JOIN n CROSS JOIN ad
)
SELECT doc_id, term, tf, score,
       CAST(row_number() OVER (PARTITION BY doc_id
                               ORDER BY score DESC, term ASC) AS BIGINT) AS term_rank
FROM scored
QUALIFY term_rank <= {k}
"""


ORACLES["td_bm25_top_terms"] = _bm25_sql(3)


def _ppr_sql(n_seeds: int = 3, iters: int = 3, damping: float = 0.85) -> str:
    """Unrolled personalized-PageRank recurrence mirroring
    operators/graph.py:personalized_pagerank — restart mass goes to
    the n smallest node ids instead of uniformly. Float literals are
    repr() of the SAME Python doubles the Spark code computes
    (1/n_seeds, (1-d)/n_seeds), and round6 is applied per iteration,
    so the float fixpoint is identical in both engines."""
    seed0 = 1.0 / n_seeds
    base_seed = (1.0 - damping) * (1.0 / n_seeds)
    d = repr(damping)
    ctes = [
        f",\nsd AS (SELECT node FROM nodes ORDER BY node LIMIT {n_seeds})",
        ",\nodeg AS (SELECT u, CAST(count(*) AS BIGINT) AS outdeg"
        " FROM edges GROUP BY u)",
        f""",
p0 AS (
  SELECT n.node,
         CASE WHEN s.node IS NOT NULL
              THEN floor(CAST({seed0!r} AS DOUBLE) * 1000000.0 + 0.5)
                   / 1000000.0
              ELSE 0.0 END AS rank
  FROM nodes n LEFT JOIN sd s ON n.node = s.node
)""",
    ]
    for t in range(1, iters + 1):
        ctes.append(
            f""",
pc{t} AS (
  SELECT e.v AS node, sum(r.rank / o.outdeg) AS incoming
  FROM edges e JOIN p{t - 1} r ON e.u = r.node JOIN odeg o ON e.u = o.u
  GROUP BY e.v
),
p{t} AS (
  SELECT n.node,
         floor((CASE WHEN s.node IS NOT NULL
                     THEN CAST({base_seed!r} AS DOUBLE) ELSE 0.0 END
                + CAST({d} AS DOUBLE) * COALESCE(c.incoming, 0.0))
               * 1000000.0 + 0.5) / 1000000.0 AS rank
  FROM nodes n LEFT JOIN sd s ON n.node = s.node
  LEFT JOIN pc{t} c ON n.node = c.node
)"""
        )
    return kg_sql(
        _EDGES_CTE + "".join(ctes) + f"\nSELECT node, rank FROM p{iters}\n"
    )


ORACLES["kg_ppr"] = _ppr_sql(3, 3, 0.85)


# Truth discovery / fact fusion (operators/fusion.py): one
# TruthFinder-style round — majority bootstrap, integer-ppm source
# reliability (floor division of non-negative longs, so Spark `div`
# and DuckDB `//` agree), reliability-weighted re-vote. Claims are
# per-document consecutive-mention instances (NOT deduped — the
# document is the source).
ORACLES["kg_fact_fusion"] = kg_sql(
    """
, claims AS (
  SELECT doc_id AS source_id, item_id AS subj_id, next_id AS obj_id
  FROM (
    SELECT doc_id, item_id,
           lead(item_id) OVER (PARTITION BY doc_id ORDER BY "offset") AS next_id
    FROM tmentions
  )
  WHERE next_id IS NOT NULL AND next_id <> item_id
),
votes0 AS (
  SELECT subj_id, obj_id, CAST(count(DISTINCT source_id) AS BIGINT) AS ns
  FROM claims GROUP BY subj_id, obj_id
),
winner0 AS (
  SELECT subj_id, obj_id AS win0
  FROM (
    SELECT subj_id, obj_id,
           row_number() OVER (PARTITION BY subj_id
                              ORDER BY ns DESC, obj_id ASC) AS rn
    FROM votes0
  )
  WHERE rn = 1
),
rel AS (
  SELECT c.source_id,
         CAST((sum(CASE WHEN c.obj_id = w.win0 THEN 1 ELSE 0 END)
               * 1000000) // count(*) AS BIGINT) AS r_ppm
  FROM claims c JOIN winner0 w ON c.subj_id = w.subj_id
  GROUP BY c.source_id
),
weighted AS (
  SELECT c.subj_id, c.obj_id,
         CAST(sum(r.r_ppm) AS BIGINT) AS weight_ppm,
         CAST(count(DISTINCT c.source_id) AS BIGINT) AS n_sources
  FROM claims c JOIN rel r ON c.source_id = r.source_id
  GROUP BY c.subj_id, c.obj_id
)
SELECT subj_id, obj_id, weight_ppm, n_sources
FROM (
  SELECT *, row_number() OVER (PARTITION BY subj_id
                               ORDER BY weight_ppm DESC, obj_id ASC) AS rn
  FROM weighted
)
WHERE rn = 1
"""
)


# Deterministic filtered negative sampling (operators/negatives.py):
# the corrupted object is hash60('neg:'||src||':'||dst||':'||i) mod
# |pool| mapped through a dense 1-based index over the dst-side
# entity pool (bipartite doc→entity linking), minus true pairs —
# both engines regenerate the identical sample bit-for-bit
# (portable md5 hash, row_number index).
ORACLES["kg_negative_samples"] = kg_sql(
    """
, edges AS (
  SELECT DISTINCT doc_id AS src_id, item_id AS dst_id FROM tmentions
),
indexed AS (
  SELECT node, CAST(row_number() OVER (ORDER BY node ASC) AS BIGINT) AS idx
  FROM (SELECT DISTINCT dst_id AS node FROM edges)
),
nn AS (SELECT max(idx) AS n FROM indexed),
drawn AS (
  SELECT e.src_id, e.dst_id, g.i,
         (CAST('0x' || substr(md5('neg:' || e.src_id
                                  || ':' || CAST(e.dst_id AS VARCHAR)
                                  || ':' || CAST(g.i AS VARCHAR)), 1, 15)
               AS BIGINT) % nn.n) + 1 AS idx
  FROM edges e
  CROSS JOIN (SELECT CAST(unnest([0, 1]) AS BIGINT) AS i) g
  CROSS JOIN nn
)
SELECT d.src_id, d.dst_id, x.node AS neg_id, d.i
FROM drawn d
JOIN indexed x ON d.idx = x.idx
WHERE NOT EXISTS (SELECT 1 FROM edges t
                  WHERE t.src_id = d.src_id AND t.dst_id = x.node)
"""
)


# Exact n-gram span dedup (operators/spandedup.py): positions covered
# by an 8-gram occurring in >= 2 distinct documents, merged into
# maximal [start, end) islands per document. Pure integer/md5
# relation — the oracle replays tokenize → lead-window grams → dup
# hash set → island merge identically.
ORACLES["td_span_dedup"] = kg_sql(
    """
, grams AS (
  SELECT doc_id, "offset",
         md5(token || ' ' || l1 || ' ' || l2 || ' ' || l3 || ' ' || l4
                   || ' ' || l5 || ' ' || l6 || ' ' || l7) AS h
  FROM (SELECT doc_id, "offset", token,
               lead(token, 1) OVER w AS l1, lead(token, 2) OVER w AS l2,
               lead(token, 3) OVER w AS l3, lead(token, 4) OVER w AS l4,
               lead(token, 5) OVER w AS l5, lead(token, 6) OVER w AS l6,
               lead(token, 7) OVER w AS l7
        FROM tok WINDOW w AS (PARTITION BY doc_id ORDER BY "offset"))
  WHERE l7 IS NOT NULL
),
dup AS (SELECT h FROM grams GROUP BY h HAVING count(DISTINCT doc_id) >= 2),
pos AS (SELECT g.doc_id, g."offset" FROM grams g JOIN dup USING (h)),
isl AS (
  SELECT doc_id, "offset",
         max("offset" + 8) OVER (PARTITION BY doc_id ORDER BY "offset"
                                 ROWS BETWEEN UNBOUNDED PRECEDING
                                 AND 1 PRECEDING) AS pmax
  FROM pos
),
isl2 AS (
  SELECT doc_id, "offset",
         sum(CASE WHEN pmax IS NULL OR "offset" > pmax THEN 1 ELSE 0 END)
           OVER (PARTITION BY doc_id ORDER BY "offset") AS island
  FROM isl
)
SELECT doc_id,
       CAST(min("offset") AS BIGINT) AS span_start,
       CAST(max("offset") + 8 AS BIGINT) AS span_end,
       CAST(max("offset") + 8 - min("offset") AS BIGINT) AS span_tokens
FROM isl2 GROUP BY doc_id, island
"""
)


# Mixture-targeted resampling (operators/sampling.py mixture_resample):
# integer bottleneck-size / per-stratum-rate derivation plus the
# portable md5 per-row verdict — both engines regenerate the sample
# exactly. Targets: en 40%, de/fr/es/zh 15% each (ppm).
ORACLES["td_mixture_resample"] = """
WITH tgt AS (
  SELECT * FROM (VALUES ('en', CAST(400000 AS BIGINT)),
                        ('de', CAST(150000 AS BIGINT)),
                        ('fr', CAST(150000 AS BIGINT)),
                        ('es', CAST(150000 AS BIGINT)),
                        ('zh', CAST(150000 AS BIGINT))) t(lang, t_ppm)
),
grp AS (
  SELECT d.lang, t.t_ppm, CAST(count(*) AS BIGINT) AS n
  FROM documents d JOIN tgt t ON d.lang = t.lang
  GROUP BY d.lang, t.t_ppm
),
smax AS (SELECT min((n * 1000000) // t_ppm) AS s FROM grp),
rates AS (
  SELECT g.lang,
         LEAST(CAST(1000000 AS BIGINT),
               ((x.s * g.t_ppm) // 1000000) * 1000000 // g.n) AS rate_ppm
  FROM grp g CROSS JOIN smax x
)
SELECT d.doc_id, d.lang
FROM documents d JOIN rates r ON d.lang = r.lang
WHERE CAST('0x' || substr(md5('mix:' || CAST(d.doc_id AS VARCHAR)), 1, 15)
           AS BIGINT) % 1000000 < r.rate_ppm
"""


# Local clustering coefficient (operators/graph.py
# clustering_coefficient): exact integer ppm from the plain ordered
# 3-way-join triangle count (independent of the engine's
# degree-ordered orientation) and the undirected simple-graph degree.
ORACLES["kg_clustering_coeff"] = kg_sql(
    _EDGES_CTE
    + """
, und AS (
  SELECT DISTINCT least(u, v) AS a, greatest(u, v) AS b
  FROM edges WHERE u <> v
),
deg AS (
  SELECT node, CAST(count(*) AS BIGINT) AS deg
  FROM (SELECT a AS node FROM und UNION ALL SELECT b FROM und)
  GROUP BY node
),
tri AS (
  SELECT e1.a AS x, e1.b AS y, e2.b AS z
  FROM und e1
  JOIN und e2 ON e2.a = e1.b
  JOIN und e3 ON e3.a = e1.a AND e3.b = e2.b
),
tcnt AS (
  SELECT node, CAST(count(*) AS BIGINT) AS n_triangles
  FROM (SELECT unnest([x, y, z]) AS node FROM tri)
  GROUP BY node
)
SELECT d.node, d.deg,
       COALESCE(t.n_triangles, CAST(0 AS BIGINT)) AS n_triangles,
       CAST(CASE WHEN d.deg >= 2
                 THEN (2 * COALESCE(t.n_triangles, 0) * 1000000)
                      // (d.deg * (d.deg - 1))
                 ELSE 0 END AS BIGINT) AS cc_ppm
FROM deg d LEFT JOIN tcnt t ON d.node = t.node
"""
)


# HyperANF neighborhood function (operators/graph.py
# neighborhood_function): the oracle unrolls the register recurrence —
# r0 = per-node self-registers, r{h} = max-merge of r{h-1} across the
# directed edge join — with the same portable md5 register constants
# as kg_two_hop_approx (bucket = top 12 of 60 bits, 2^48-1 remainder
# mask, rho ceiling 49) and the same estimator text, so every round's
# estimate is bit-identical.
_HYPERANF_EST = """floor((CASE WHEN raw <= 2.5 * 4096 AND zeros > 0
                   THEN 4096.0 * ln(4096.0 / zeros) ELSE raw END)
             * 1000000.0 + 0.5) / 1000000.0"""


def _hyperanf_ctes(max_hops: int) -> list[str]:
    ctes = [
        """
, r0 AS (
  SELECT node, h >> 48 AS bucket,
         max(CASE WHEN (h & 281474976710655) = 0 THEN 49
                  ELSE 49 - length(bin(h & 281474976710655)) END) AS mx
  FROM (SELECT node,
               CAST('0x' || substr(md5(CAST(node AS VARCHAR)), 1, 15)
                    AS BIGINT) AS h
        FROM nodes)
  GROUP BY 1, 2
)"""
    ]
    for h in range(1, max_hops + 1):
        ctes.append(
            f""",
r{h} AS MATERIALIZED (
  SELECT node, bucket, max(mx) AS mx FROM (
    SELECT node, bucket, mx FROM r{h - 1}
    UNION ALL
    SELECT e.u AS node, r.bucket, r.mx
    FROM edges e JOIN r{h - 1} r ON r.node = e.v
  ) GROUP BY 1, 2
),
agg{h} AS (
  SELECT node,
         sum(CAST(1 AS BIGINT) << (49 - mx)) AS s_present,
         CAST(count(*) AS BIGINT) AS n_nonzero
  FROM r{h} GROUP BY node
),
est{h} AS (
  SELECT node, n_nonzero,
         (0.7213 / (1 + 1.079 / 4096)) * 4096 * 4096 * 562949953421312.0
           / CAST(s_present + (4096 - n_nonzero) * (CAST(1 AS BIGINT) << 49)
                  AS DOUBLE) AS raw,
         4096 - n_nonzero AS zeros
  FROM agg{h}
)"""
        )
    return ctes


def _hyperanf_sql(max_hops: int) -> str:
    est_selects = [
        f"""
SELECT node, CAST({h} AS BIGINT) AS hops, CAST(4096 AS BIGINT) AS n_buckets,
       n_nonzero,
       {_HYPERANF_EST} AS n_reachable_est
FROM est{h}"""
        for h in range(1, max_hops + 1)
    ]
    return kg_sql(
        _EDGES_CTE
        + "".join(_hyperanf_ctes(max_hops))
        + "\nUNION ALL".join(est_selects)
    )


ORACLES["kg_neighborhood"] = _hyperanf_sql(3)


# Effective diameter (operators/graph.py effective_diameter): the
# HyperANF rounds above, each hop's per-node estimates snapped to
# BIGINT micro units BEFORE the graph-wide sum (order-free integer
# fold — the engine contract), hop 0 = exact node count, then the q‰
# quantile test in integer space and one interpolating division on the
# constant-size hop table.
def _eff_diameter_sql(max_hops: int, q_permille: int) -> str:
    hop_sums = [
        f"""
SELECT CAST({h} AS BIGINT) AS hops,
       CAST(sum(CAST(floor(({_HYPERANF_EST}) * 1000000.0 + 0.5)
                AS BIGINT)) AS BIGINT) AS n_pairs_micro
FROM est{h}"""
        for h in range(1, max_hops + 1)
    ]
    q = q_permille
    body = f""",
dist AS (
  SELECT CAST(0 AS BIGINT) AS hops,
         CAST((SELECT count(*) FROM nodes) AS BIGINT) * 1000000
           AS n_pairs_micro
  UNION ALL{' UNION ALL'.join(hop_sums)}
),
wt AS (
  SELECT hops, n_pairs_micro,
         max(n_pairs_micro) OVER () AS total_micro,
         lag(n_pairs_micro) OVER (ORDER BY hops) AS prev_micro
  FROM dist
),
st AS (
  SELECT hops, n_pairs_micro,
         CASE WHEN n_pairs_micro * 1000 >= {q} * total_micro
               AND (prev_micro IS NULL
                    OR NOT (prev_micro * 1000 >= {q} * total_micro))
         THEN floor((CASE WHEN hops = 0 THEN 0.0
                     ELSE CAST(hops - 1 AS DOUBLE)
                          + ((CAST({q} AS DOUBLE)
                              * CAST(total_micro AS DOUBLE)) / 1000.0
                             - CAST(prev_micro AS DOUBLE))
                            / CAST(n_pairs_micro - prev_micro AS DOUBLE)
                     END) * 1000000.0 + 0.5) / 1000000.0
         END AS eff_at
  FROM wt
)
SELECT hops, n_pairs_micro, max(eff_at) OVER () AS eff_diameter FROM st
"""
    return kg_sql(_EDGES_CTE + "".join(_hyperanf_ctes(max_hops)) + body)


ORACLES["kg_eff_diameter"] = _eff_diameter_sql(3, 900)


# Directed out-in degree assortativity (operators/graph.py
# assortativity) over the doc→entity incidence graph: exact BIGINT
# moment sums folded once, the Pearson ratio formed on the single
# output row — identical arithmetic order to the Spark expression.
ORACLES["kg_assortativity"] = kg_sql(
    """
, bedges AS (SELECT DISTINCT doc_id AS u, item_id AS v FROM tmentions),
doutA AS (SELECT u, CAST(count(*) AS BIGINT) AS x FROM bedges GROUP BY u),
dinA AS (SELECT v, CAST(count(*) AS BIGINT) AS y FROM bedges GROUP BY v),
xyA AS (
  SELECT o.x, i.y FROM bedges e
  JOIN doutA o ON e.u = o.u JOIN dinA i ON e.v = i.v
),
sA AS (
  SELECT CAST(count(*) AS BIGINT) AS n,
         CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy,
         CAST(sum(x * x) AS BIGINT) AS sxx,
         CAST(sum(y * y) AS BIGINT) AS syy,
         CAST(sum(x * y) AS BIGINT) AS sxy
  FROM xyA
)
SELECT n AS n_edges,
       CASE WHEN CAST(n * sxx - sx * sx AS DOUBLE) > 0
             AND CAST(n * syy - sy * sy AS DOUBLE) > 0
       THEN floor((CAST(n * sxy - sx * sy AS DOUBLE)
                   / (sqrt(CAST(n * sxx - sx * sx AS DOUBLE))
                      * sqrt(CAST(n * syy - sy * sy AS DOUBLE))))
                  * 1000000.0 + 0.5) / 1000000.0
       END AS assortativity
FROM sA
"""
)


# Link prediction (operators/graph.py link_prediction,
# max_mid_degree=64, min_common=2): wedges through capped-degree mids
# over the undirected simple graph; Adamic-Adar contributions snapped
# to BIGINT micro units per mid before the per-pair sum (order-free).
ORACLES["kg_link_prediction"] = kg_sql(
    _EDGES_CTE
    + """
, undp AS (SELECT u, v FROM edges UNION SELECT v, u FROM edges),
degp AS (SELECT u, CAST(count(*) AS BIGINT) AS deg FROM undp GROUP BY u),
midp AS (
  SELECT u AS mid, deg AS mid_deg FROM degp WHERE deg BETWEEN 2 AND 64
),
adjp AS (
  SELECT a.u AS mid, m.mid_deg, a.v AS x
  FROM undp a JOIN midp m ON a.u = m.mid
),
pairsp AS (
  SELECT a1.x AS node_a, a2.x AS node_b,
         CAST(count(*) AS BIGINT) AS n_common,
         CAST(sum(CAST(floor(1000000.0 / ln(CAST(a1.mid_deg AS DOUBLE))
                             + 0.5) AS BIGINT)) AS BIGINT) AS aa_micro
  FROM adjp a1 JOIN adjp a2 ON a1.mid = a2.mid AND a1.x < a2.x
  GROUP BY 1, 2
  HAVING count(*) >= 2
)
SELECT p.node_a, p.node_b, p.n_common,
       da.deg AS deg_a, db.deg AS deg_b,
       floor((CAST(p.n_common AS DOUBLE)
              / CAST(da.deg + db.deg - p.n_common AS DOUBLE))
             * 1000000.0 + 0.5) / 1000000.0 AS jaccard,
       p.aa_micro,
       (e.u IS NOT NULL) AS is_edge
FROM pairsp p
JOIN degp da ON p.node_a = da.u
JOIN degp db ON p.node_b = db.u
LEFT JOIN undp e ON e.u = p.node_a AND e.v = p.node_b
"""
)


# Deterministic DeepWalk corpus (operators/graph.py random_walks,
# walk_len=4, walks_per_node=2): ranked undirected adjacency, step t
# picks neighbor index hash60(start|walk_no|t) mod deg — the identical
# portable md5 hash, so both engines emit bit-identical walks.
def _random_walks_sql(walk_len: int, walks_per_node: int) -> str:
    wvals = ", ".join(f"({w})" for w in range(walks_per_node))
    ctes = [
        f""",
undw AS (SELECT u, v FROM edges UNION SELECT v, u FROM edges),
adjw AS (
  SELECT u AS node,
         CAST(row_number() OVER (PARTITION BY u ORDER BY v) - 1
              AS BIGINT) AS idx,
         v AS nxt
  FROM undw
),
degw AS (SELECT node, CAST(count(*) AS BIGINT) AS deg
         FROM adjw GROUP BY node),
w0 AS (
  SELECT s.start_node, CAST(wn.walk_no AS BIGINT) AS walk_no,
         s.start_node AS cur
  FROM (SELECT DISTINCT u AS start_node FROM undw) s
  CROSS JOIN (VALUES {wvals}) wn(walk_no)
)"""
    ]
    for t in range(1, walk_len + 1):
        ctes.append(
            f""",
w{t} AS (
  SELECT p.start_node, p.walk_no, a.nxt AS cur
  FROM (
    SELECT f.start_node, f.walk_no, f.cur,
           CAST('0x' || substr(md5(CAST(f.start_node AS VARCHAR) || '|'
                                   || CAST(f.walk_no AS VARCHAR)
                                   || '|{t}'), 1, 15) AS BIGINT)
             % d.deg AS idx
    FROM w{t - 1} f JOIN degw d ON d.node = f.cur
  ) p
  JOIN adjw a ON a.node = p.cur AND a.idx = p.idx
)"""
        )
    selects = [
        f"""
SELECT start_node, walk_no, CAST({t} AS BIGINT) AS step, cur AS node
FROM w{t}"""
        for t in range(walk_len + 1)
    ]
    return kg_sql(
        _EDGES_CTE + "".join(ctes) + "\nUNION ALL".join(selects)
    )


ORACLES["kg_random_walks"] = _random_walks_sql(4, 2)


# Blocked entity resolution over dictionary titles (operators/
# linking.py entity_match, block_chars=1, max_len_diff=3,
# min_sim_micro=300000): levenshtein is unit-cost in both engines;
# the similarity is snapped to BIGINT micro units.
ORACLES["kg_entity_match"] = kg_sql(
    """
SELECT a.title AS title_a, b.title AS title_b,
       a.item_id AS item_a, b.item_id AS item_b,
       CAST(levenshtein(a.title, b.title) AS BIGINT) AS lev,
       CAST(floor((1.0 - CAST(levenshtein(a.title, b.title) AS DOUBLE)
                   / CAST(greatest(length(a.title), length(b.title))
                          AS DOUBLE)) * 1000000.0 + 0.5)
            AS BIGINT) AS sim_micro,
       (a.item_id = b.item_id) AS same_entity
FROM cdict a JOIN cdict b
  ON lower(substr(a.title, 1, 1)) = lower(substr(b.title, 1, 1))
 AND a.title < b.title
 AND abs(length(a.title) - length(b.title)) <= 3
WHERE CAST(floor((1.0 - CAST(levenshtein(a.title, b.title) AS DOUBLE)
                  / CAST(greatest(length(a.title), length(b.title))
                         AS DOUBLE)) * 1000000.0 + 0.5)
           AS BIGINT) >= 300000
"""
)


# Mean-pooled entity embeddings (operators/similarity.py
# entity_embeddings): per-dimension float components widened to
# DOUBLE and snapped to BIGINT micros BEFORE the per-(entity, dim)
# sum — order-free integer fold, one dividing mean per output row.
ORACLES["kg_entity_embeddings"] = kg_sql(
    """
, mentE AS (SELECT DISTINCT doc_id, item_id FROM tmentions),
exE AS (
  SELECT m.item_id,
         CAST(unnest(generate_series(1, len(e.embedding))) - 1
              AS BIGINT) AS dim,
         unnest(list_transform(generate_series(1, len(e.embedding)),
                               i -> CAST(e.embedding[i] AS DOUBLE)))
           AS val
  FROM mentE m
  JOIN (SELECT vec_id AS doc_id, embedding FROM embeddings) e
    USING (doc_id)
),
perE AS (
  SELECT item_id, dim,
         CAST(count(*) AS BIGINT) AS n_docs,
         CAST(sum(CAST(floor(val * 1000000.0 + 0.5) AS BIGINT))
              AS BIGINT) AS sum_micro
  FROM exE GROUP BY 1, 2
)
SELECT item_id, dim, n_docs, sum_micro,
       floor(((CAST(sum_micro AS DOUBLE) / 1000000.0)
              / CAST(n_docs AS DOUBLE)) * 1000000.0 + 0.5)
         / 1000000.0 AS mean
FROM perE
"""
)


# SemDeDup (operators/similarity.py semdedup, threshold=0.2, k=16):
# seed centroids by id rank, rounded-dot argmax assignment with
# lowest-cid tiebreak (the td_ivf_ann rule chain), then within-cluster
# round6 cosine — drop any vector with a lower-id near-dup in its cell.
ORACLES["td_semdedup"] = f"""
WITH params AS (
  SELECT greatest(1, count(*) // 16) AS step FROM embeddings
),
centroids AS (
  SELECT cid, cent FROM (
    SELECT vec_id AS cid, embedding AS cent,
           row_number() OVER (ORDER BY vec_id) AS rn
    FROM embeddings
  ) ranked, params
  WHERE (rn - 1) % step = 0 AND rn <= 1 + 15 * step
),
assigned AS (
  SELECT vec_id, v, cid FROM (
    SELECT vec_id, v, cid,
           row_number() OVER (PARTITION BY vec_id
                              ORDER BY sim DESC, cid ASC) AS r
    FROM (
      SELECT e.vec_id, e.embedding AS v, c.cid,
             {_DOT_ROUND_SQL.format(a="e.embedding", b="c.cent")} AS sim
      FROM embeddings e, centroids c
    )
  ) WHERE r = 1
),
dropped AS (
  SELECT DISTINCT b.vec_id
  FROM assigned a JOIN assigned b
    ON a.cid = b.cid AND a.vec_id < b.vec_id
  WHERE {_COS_SQL.format(a="a.v", b="b.v")} >= 0.2
)
SELECT a.vec_id, a.cid, (d.vec_id IS NULL) AS keep
FROM assigned a LEFT JOIN dropped d ON a.vec_id = d.vec_id
"""


# Skip-gram pair counts (operators/textstats.py skipgram_pairs,
# window=2, min_count=2): tokens by position, each center joined to
# the token at pos+d for d in {-2,-1,1,2} — fan-out exactly 2w.
ORACLES["td_skipgrams"] = """
WITH toks AS (
  SELECT doc_id,
         CAST(unnest(generate_series(1, len(ts))) - 1 AS BIGINT) AS pos,
         unnest(ts) AS tok
  FROM (SELECT doc_id, string_split(text, ' ') AS ts FROM documents)
),
pairs AS (
  SELECT t1.tok AS center, t2.tok AS context
  FROM toks t1
  CROSS JOIN (VALUES (-2), (-1), (1), (2)) o(d)
  JOIN toks t2 ON t2.doc_id = t1.doc_id AND t2.pos = t1.pos + o.d
)
SELECT center, context, CAST(count(*) AS BIGINT) AS n_pairs
FROM pairs GROUP BY 1, 2 HAVING count(*) >= 2
"""


# One exact TransE gradient step (operators/graph.py transe_step,
# dim=8, lr=1/100): hash-lattice init, integer micro diffs, order-free
# BIGINT gradient folds, sign-corrected floor-division update — no
# float anywhere, so the recurrence is bit-identical across engines.
ORACLES["kg_transe_step"] = kg_sql(
    _EDGES_CTE
    + """
, dimsT AS (SELECT unnest(generate_series(0, 7)) AS dim),
embT AS (
  SELECT node, CAST(dim AS BIGINT) AS dim,
         (CAST('0x' || substr(md5(CAST(node AS VARCHAR) || '|'
                                  || CAST(dim AS VARCHAR)), 1, 15)
               AS BIGINT) % 2001 - 1000) * 1000 AS emb0_micro
  FROM nodes, dimsT
),
relT AS (
  SELECT CAST(dim AS BIGINT) AS dim,
         (CAST('0x' || substr(md5('r|' || CAST(dim AS VARCHAR)), 1, 15)
               AS BIGINT) % 2001 - 1000) * 1000 AS r_micro
  FROM dimsT
),
diffT AS (
  SELECT e.u AS h, e.v AS t, eh.dim,
         eh.emb0_micro + r.r_micro - et.emb0_micro AS diff
  FROM edges e
  JOIN embT eh ON eh.node = e.u
  JOIN embT et ON et.node = e.v AND et.dim = eh.dim
  JOIN relT r ON r.dim = eh.dim
),
gradT AS (
  SELECT node, dim, CAST(sum(g) AS BIGINT) AS grad_micro FROM (
    SELECT h AS node, dim, 2 * diff AS g FROM diffT
    UNION ALL
    SELECT t AS node, dim, -2 * diff AS g FROM diffT
  ) GROUP BY 1, 2
)
SELECT emb.node, emb.dim, emb.emb0_micro,
       CAST(COALESCE(g.grad_micro, 0) AS BIGINT) AS grad_micro,
       CAST(emb.emb0_micro - COALESCE(g.grad_micro, 0) // 100
            AS BIGINT) AS emb1_micro
FROM embT emb LEFT JOIN gradT g
  ON emb.node = g.node AND emb.dim = g.dim
"""
)


# Incremental degree maintenance (plans/incremental_kg.py
# degrees_incremental): the oracle recomputes degrees over the WHOLE
# corpus — hash equality against the Spark-side batch-merged form is
# the IVM invariant (same proof shape as kg_qviews_incremental).
ORACLES["kg_degrees_incremental"] = ORACLES["kg_degrees"]


# k-truss peeling (operators/graph.py k_truss, k=3, rounds=2): per
# round the oracle recounts edge support with a plain ordered 3-way
# self-join (e1=(p,q), e2=(q,r), e3=(p,r) with a<b edges gives each
# triangle exactly once) and drops edges below k-2; at a fixpoint
# extra rounds are no-ops, so the fixed unroll stays in lockstep with
# the engine's early-exit loop.
def _k_truss_sql(k: int, rounds: int) -> str:
    def sup_cte(r: int) -> str:
        return f""",
tri{r} AS MATERIALIZED (
  SELECT e1.a AS p, e1.b AS q, e2.b AS r
  FROM und{r} e1
  JOIN und{r} e2 ON e2.a = e1.b
  JOIN und{r} e3 ON e3.a = e1.a AND e3.b = e2.b
),
sup{r} AS MATERIALIZED (
  SELECT u.a AS node_a, u.b AS node_b,
         CAST(COALESCE(s.c, 0) AS BIGINT) AS support
  FROM und{r} u LEFT JOIN (
    SELECT a, b, count(*) AS c FROM (
      SELECT p AS a, q AS b FROM tri{r}
      UNION ALL SELECT q AS a, r AS b FROM tri{r}
      UNION ALL SELECT p AS a, r AS b FROM tri{r}
    ) GROUP BY 1, 2
  ) s ON u.a = s.a AND u.b = s.b
)"""

    ctes = [
        """,
und0 AS MATERIALIZED (
  SELECT DISTINCT least(u, v) AS a, greatest(u, v) AS b
  FROM edges WHERE u <> v
)"""
    ]
    ctes.append(sup_cte(0))
    for r in range(1, rounds + 1):
        ctes.append(
            f""",
und{r} AS MATERIALIZED (
  SELECT node_a AS a, node_b AS b FROM sup{r - 1}
  WHERE support >= {k - 2}
)"""
        )
        ctes.append(sup_cte(r))
    return kg_sql(
        _EDGES_CTE
        + "".join(ctes)
        + f"\nSELECT node_a, node_b, support FROM sup{rounds}\n"
    )


ORACLES["kg_truss"] = _k_truss_sql(3, 2)


# Interpolated Kneser-Ney bigram LM (operators/textstats.py
# kneser_ney_bigrams, D=0.75): integer count ingredients, one fixed
# double expression per row, round6 — identical text both engines.
ORACLES["td_kneser_ney"] = """
WITH toksK AS (
  SELECT doc_id,
         CAST(unnest(generate_series(1, len(ts))) - 1 AS BIGINT) AS pos,
         unnest(ts) AS w1
  FROM (SELECT doc_id, string_split(text, ' ') AS ts FROM documents)
),
bgK AS (
  SELECT t1.w1, t2.w1 AS w2
  FROM toksK t1 JOIN toksK t2
    ON t2.doc_id = t1.doc_id AND t2.pos = t1.pos + 1
),
c12K AS (
  SELECT w1, w2, CAST(count(*) AS BIGINT) AS c12 FROM bgK GROUP BY 1, 2
),
leftK AS (
  SELECT w1, CAST(sum(c12) AS BIGINT) AS c1,
         CAST(count(*) AS BIGINT) AS n1_fwd
  FROM c12K GROUP BY 1
),
rightK AS (
  SELECT w2, CAST(count(*) AS BIGINT) AS n1_bwd FROM c12K GROUP BY 1
),
bK AS (SELECT CAST(count(*) AS BIGINT) AS b_types FROM c12K)
SELECT c.w1, c.w2, c.c12,
       floor((greatest(CAST(c.c12 AS DOUBLE) - 0.75, 0.0)
                / CAST(l.c1 AS DOUBLE)
              + (0.75 * CAST(l.n1_fwd AS DOUBLE) / CAST(l.c1 AS DOUBLE))
                * (CAST(r.n1_bwd AS DOUBLE) / CAST(b.b_types AS DOUBLE)))
             * 1000000.0 + 0.5) / 1000000.0 AS p_kn
FROM c12K c
JOIN leftK l ON c.w1 = l.w1
JOIN rightK r ON c.w2 = r.w2
CROSS JOIN bK b
"""


# Vocabulary coverage curve (operators/textstats.py vocab_coverage):
# single-node window replay of the engine's two-phase global
# rank/prefix-sum; exact integer permille.
ORACLES["td_vocab_coverage"] = """
WITH cntV AS (
  SELECT token, CAST(count(*) AS BIGINT) AS cnt FROM (
    SELECT unnest(string_split(text, ' ')) AS token FROM documents
  ) GROUP BY 1
),
tot AS (SELECT CAST(sum(cnt) AS BIGINT) AS total FROM cntV)
SELECT token, cnt,
       CAST(row_number() OVER (ORDER BY cnt DESC, token ASC)
            AS BIGINT) AS rank,
       CAST(sum(cnt) OVER (ORDER BY cnt DESC, token ASC
                           ROWS UNBOUNDED PRECEDING)
            AS BIGINT) AS cum_cnt,
       CAST(sum(cnt) OVER (ORDER BY cnt DESC, token ASC
                           ROWS UNBOUNDED PRECEDING) * 1000 // total
            AS BIGINT) AS cum_permille
FROM cntV CROSS JOIN tot
"""


# Degree distribution histogram (operators/graph.py degree_histogram)
# over the doc→entity incidence graph — the skew-bearing edge set.
ORACLES["kg_degree_histogram"] = kg_sql(
    """
, bedH AS (SELECT DISTINCT doc_id AS u, item_id AS v FROM tmentions)
SELECT 'out' AS side, CAST(degree AS BIGINT) AS degree,
       CAST(count(*) AS BIGINT) AS n_nodes
FROM (SELECT u, count(*) AS degree FROM bedH GROUP BY u) GROUP BY 2
UNION ALL
SELECT 'in' AS side, CAST(degree AS BIGINT) AS degree,
       CAST(count(*) AS BIGINT) AS n_nodes
FROM (SELECT v, count(*) AS degree FROM bedH GROUP BY v) GROUP BY 2
"""
)


# ER blocking-quality report (operators/linking.py
# er_blocking_metrics): candidate pairs under the entity_match block
# with the score threshold off, vs all n·(n−1)/2 comparisons.
ORACLES["kg_er_metrics"] = kg_sql(
    """
, candE AS (
  SELECT CAST(count(*) AS BIGINT) AS n_candidate_pairs
  FROM cdict a JOIN cdict b
    ON lower(substr(a.title, 1, 1)) = lower(substr(b.title, 1, 1))
   AND a.title < b.title
   AND abs(length(a.title) - length(b.title)) <= 3
),
nT AS (SELECT CAST(count(*) AS BIGINT) AS n_titles FROM cdict)
SELECT n_titles, n_candidate_pairs,
       CAST((n_titles * (n_titles - 1)) // 2 AS BIGINT) AS n_all_pairs,
       CASE WHEN n_titles >= 2 THEN
         CAST((1000 * ((n_titles * (n_titles - 1)) // 2
                       - n_candidate_pairs))
              // ((n_titles * (n_titles - 1)) // 2) AS BIGINT)
       END AS reduction_permille
FROM nT CROSS JOIN candE
"""
)


# Mergeable HLL window rollup (operators/sketches.py
# hll_window_rollup): hourly registers from raw events, day grain by
# register max-merge — identical md5 register constants and estimator
# text at both grains.
ORACLES["ev_hll_rollup"] = """
WITH mxH AS (
  SELECT event_type, date_trunc('hour', ts) AS h, hsh >> 48 AS bucket,
         max(CASE WHEN (hsh & 281474976710655) = 0 THEN 49
                  ELSE 49 - length(bin(hsh & 281474976710655)) END) AS mx
  FROM (SELECT event_type, ts,
               CAST('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 15)
                    AS BIGINT) AS hsh
        FROM events)
  GROUP BY 1, 2, 3
),
mxD AS (
  SELECT event_type, date_trunc('day', h) AS d, bucket, max(mx) AS mx
  FROM mxH GROUP BY 1, 2, 3
),
aggH AS (
  SELECT event_type, h,
         sum(CAST(1 AS BIGINT) << (49 - mx)) AS s_present,
         CAST(count(*) AS BIGINT) AS n_nonzero
  FROM mxH GROUP BY 1, 2
),
aggD AS (
  SELECT event_type, d,
         sum(CAST(1 AS BIGINT) << (49 - mx)) AS s_present,
         CAST(count(*) AS BIGINT) AS n_nonzero
  FROM mxD GROUP BY 1, 2
),
estH AS (
  SELECT event_type, h, n_nonzero,
         (0.7213 / (1 + 1.079 / 4096)) * 4096 * 4096 * 562949953421312.0
           / CAST(s_present + (4096 - n_nonzero) * (CAST(1 AS BIGINT) << 49)
                  AS DOUBLE) AS raw,
         4096 - n_nonzero AS zeros
  FROM aggH
),
estD AS (
  SELECT event_type, d, n_nonzero,
         (0.7213 / (1 + 1.079 / 4096)) * 4096 * 4096 * 562949953421312.0
           / CAST(s_present + (4096 - n_nonzero) * (CAST(1 AS BIGINT) << 49)
                  AS DOUBLE) AS raw,
         4096 - n_nonzero AS zeros
  FROM aggD
)
SELECT event_type, CAST(epoch_us(h) AS BIGINT) AS bucket_us,
       'hour' AS grain, CAST(4096 AS BIGINT) AS n_buckets, n_nonzero,
       floor((CASE WHEN raw <= 2.5 * 4096 AND zeros > 0
                   THEN 4096.0 * ln(4096.0 / zeros) ELSE raw END)
             * 1000000.0 + 0.5) / 1000000.0 AS hll_estimate
FROM estH
UNION ALL
SELECT event_type, CAST(epoch_us(d) AS BIGINT) AS bucket_us,
       'day' AS grain, CAST(4096 AS BIGINT) AS n_buckets, n_nonzero,
       floor((CASE WHEN raw <= 2.5 * 4096 AND zeros > 0
                   THEN 4096.0 * ln(4096.0 / zeros) ELSE raw END)
             * 1000000.0 + 0.5) / 1000000.0 AS hll_estimate
FROM estD
"""


# SPARQL BGP 3-cycle pattern (operators/bgp.py bgp_match with
# [?a links_to ?b, ?b links_to ?c, ?c links_to ?a]): plain 3-way
# self-join over the Q-prefixed triple relation, distinct bindings.
ORACLES["kg_bgp_cycles"] = kg_sql(
    _EDGES_CTE
    + """
, qeB AS (
  SELECT 'Q' || CAST(u AS VARCHAR) AS s, 'Q' || CAST(v AS VARCHAR) AS o
  FROM edges
)
SELECT DISTINCT e1.s AS a, e1.o AS b, e2.o AS c
FROM qeB e1
JOIN qeB e2 ON e2.s = e1.o
JOIN qeB e3 ON e3.s = e2.o AND e3.o = e1.s
"""
)


# N-Triples serialization (operators/bgp.py to_ntriples): one W3C
# statement line per triple, base IRI http://example.org/.
ORACLES["kg_ntriples"] = kg_sql(
    _EDGES_CTE
    + """
SELECT '<http://example.org/Q' || CAST(u AS VARCHAR)
       || '> <http://example.org/links_to> <http://example.org/Q'
       || CAST(v AS VARCHAR) || '> .' AS line
FROM edges
"""
)


# SPARQL OPTIONAL (bgp.py bgp_match optional=): required [?a p ?b]
# LEFT JOIN optional [?b p ?c] — NULL c where b has no out-edge.
ORACLES["kg_bgp_optional"] = kg_sql(
    _EDGES_CTE
    + """
, qeO AS (
  SELECT 'Q' || CAST(u AS VARCHAR) AS s, 'Q' || CAST(v AS VARCHAR) AS o
  FROM edges
)
SELECT DISTINCT e1.s AS a, e1.o AS b, e2.o AS c
FROM qeO e1 LEFT JOIN qeO e2 ON e2.s = e1.o
"""
)


# Per-triple provenance (operators/links.py triple_provenance,
# sample_k=5): distinct supporting docs per edge + the 5 smallest doc
# ids comma-joined.
ORACLES["kg_triple_provenance"] = kg_sql(
    """
, occP AS (
  SELECT DISTINCT doc_id, item_id AS src_id, next_id AS dst_id
  FROM (
    SELECT doc_id, item_id,
           lead(item_id) OVER (PARTITION BY doc_id ORDER BY "offset")
             AS next_id
    FROM tmentions
  )
  WHERE next_id IS NOT NULL AND next_id <> item_id
),
rankedP AS (
  SELECT doc_id, src_id, dst_id,
         row_number() OVER (PARTITION BY src_id, dst_id
                            ORDER BY doc_id) AS rn
  FROM occP
)
SELECT src_id, dst_id, CAST(count(*) AS BIGINT) AS n_docs,
       string_agg(CAST(doc_id AS VARCHAR), ',' ORDER BY doc_id)
         FILTER (WHERE rn <= 5) AS sample_docs
FROM rankedP GROUP BY 1, 2
"""
)


# Distance-weighted windowed co-occurrence (operators/links.py
# windowed_cooccurrence, window=3): per-doc mention ranks, forward
# offsets 1..3, inverse-distance BIGINT micro weights.
ORACLES["kg_windowed_cooc"] = kg_sql(
    """
, rankedW AS (
  SELECT doc_id, item_id,
         CAST(row_number() OVER (PARTITION BY doc_id ORDER BY "offset")
              AS BIGINT) AS rn
  FROM tmentions
)
SELECT l.item_id AS src_id, r.item_id AS dst_id,
       CAST(count(*) AS BIGINT) AS n_cooc,
       CAST(sum(CAST(floor(1000000.0 / CAST(o.d AS DOUBLE) + 0.5)
                     AS BIGINT)) AS BIGINT) AS weight_micro
FROM rankedW l
CROSS JOIN (VALUES (1), (2), (3)) o(d)
JOIN rankedW r ON r.doc_id = l.doc_id AND r.rn = l.rn + o.d
WHERE l.item_id <> r.item_id
GROUP BY 1, 2
"""
)


# LSH quality report (operators/dedup.py lsh_quality_report over the
# near-dup-injected corpus): banded-LSH candidates vs exact
# Jaccard >= 0.5 truth, integer-permille precision/recall. Reuses the
# td_jaccard_prefix injected preamble and the td_minhash_pairs banded
# fragments verbatim.
ORACLES["td_lsh_quality"] = f"""
WITH base AS (
  SELECT doc_id, string_split(text, ' ') AS l FROM documents
),
toks AS (
  SELECT doc_id, l FROM base
  UNION ALL
  SELECT doc_id + 10000000,
         string_split(array_to_string(l[1:greatest(len(l) - 2, 1)], ' '), ' ')
  FROM base WHERE doc_id % 50 = 0
),
sh AS (
  SELECT DISTINCT doc_id, gram AS shingle FROM (
    SELECT doc_id,
           unnest(list_transform(generate_series(1, greatest(len(l) - 2, 1)),
                                 i -> array_to_string(l[i:i+2], ' '))) AS gram
    FROM toks
  ) WHERE length(gram) > 0
),
sig AS (
  SELECT doc_id,
         {_mh_mins}
  FROM sh GROUP BY doc_id
),
banded AS (
{_mh_banded}
),
cand AS (
  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
  FROM banded a
  JOIN banded b ON a.band = b.band AND a.bucket = b.bucket
               AND a.doc_id < b.doc_id
),
sizes AS (
  SELECT doc_id, CAST(count(*) AS BIGINT) AS n_sh FROM sh GROUP BY doc_id
),
inter AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
         CAST(count(*) AS BIGINT) AS n_inter
  FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
  GROUP BY 1, 2
),
truth AS (
  SELECT i.doc_a, i.doc_b
  FROM inter i
  JOIN sizes sa ON i.doc_a = sa.doc_id
  JOIN sizes sb ON i.doc_b = sb.doc_id
  WHERE floor(CAST(i.n_inter AS DOUBLE)
              / (sa.n_sh + sb.n_sh - i.n_inter) * 1000000.0 + 0.5)
          / 1000000.0 >= 0.5
),
nums AS (
  SELECT (SELECT CAST(count(*) AS BIGINT) FROM cand) AS n_candidates,
         (SELECT CAST(count(*) AS BIGINT) FROM truth) AS n_true,
         (SELECT CAST(count(*) AS BIGINT)
          FROM cand c JOIN truth t
            ON c.doc_a = t.doc_a AND c.doc_b = t.doc_b) AS n_hit
)
SELECT n_candidates, n_true, n_hit,
       CASE WHEN n_candidates > 0
            THEN CAST((n_hit * 1000) // n_candidates AS BIGINT)
       END AS precision_permille,
       CASE WHEN n_true > 0
            THEN CAST((n_hit * 1000) // n_true AS BIGINT)
       END AS recall_permille
FROM nums
"""


# Integer weighted PageRank (operators/graph.py weighted_pagerank,
# iters=3, d=850 permille) over the distance-weighted co-occurrence
# relation: the recurrence never leaves BIGINT space, so the unrolled
# oracle is bit-identical by construction.
def _weighted_pagerank_sql(iters: int, dp: int) -> str:
    ctes = [
        """,
wedges AS (
  SELECT l.item_id AS u, r.item_id AS v,
         CAST(sum(CAST(floor(1000000.0 / CAST(o.d AS DOUBLE) + 0.5)
                       AS BIGINT)) AS BIGINT) AS w
  FROM (SELECT doc_id, item_id,
               CAST(row_number() OVER (PARTITION BY doc_id
                                       ORDER BY "offset") AS BIGINT) AS rn
        FROM tmentions) l
  CROSS JOIN (VALUES (1), (2), (3)) o(d)
  JOIN (SELECT doc_id, item_id,
               CAST(row_number() OVER (PARTITION BY doc_id
                                       ORDER BY "offset") AS BIGINT) AS rn
        FROM tmentions) r
    ON r.doc_id = l.doc_id AND r.rn = l.rn + o.d
  WHERE l.item_id <> r.item_id
  GROUP BY 1, 2
),
wnodes AS (SELECT u AS node FROM wedges UNION SELECT v FROM wedges),
nnW AS (SELECT CAST(count(*) AS BIGINT) AS n FROM wnodes),
wdeg AS (SELECT u, CAST(sum(w) AS BIGINT) AS w_u FROM wedges GROUP BY u),
wr0 AS (
  SELECT node, CAST(1000000 // nnW.n AS BIGINT) AS rank_micro
  FROM wnodes CROSS JOIN nnW
)"""
    ]
    for t in range(1, iters + 1):
        ctes.append(
            f""",
wc{t} AS (
  SELECT e.v AS node,
         CAST(sum((r.rank_micro * e.w) // d.w_u) AS BIGINT) AS incoming
  FROM wedges e
  JOIN wr{t - 1} r ON e.u = r.node
  JOIN wdeg d ON e.u = d.u
  GROUP BY e.v
),
wr{t} AS (
  SELECT no.node,
         CAST((((1000 - {dp}) * 1000000) // (1000 * nnW.n))
              + ({dp} * COALESCE(c.incoming, 0)) // 1000
              AS BIGINT) AS rank_micro
  FROM wnodes no CROSS JOIN nnW
  LEFT JOIN wc{t} c ON no.node = c.node
)"""
        )
    return kg_sql(
        "".join(ctes) + f"\nSELECT node, rank_micro FROM wr{iters}\n"
    )


ORACLES["kg_weighted_pagerank"] = _weighted_pagerank_sql(3, 850)


# Deterministic word dropout (operators/textstats.py word_dropout,
# rate=150 permille): hash-Bernoulli per (doc, pos, token) — identical
# md5 verdict both engines.
ORACLES["td_word_dropout"] = """
WITH tokD AS (
  SELECT doc_id, string_split(text, ' ') AS l FROM documents
),
keptD AS (
  SELECT doc_id, len(l) AS n_tokens,
         list_filter(
           list_transform(generate_series(1, len(l)),
                          i -> {'t': l[i], 'i': i - 1}),
           s -> CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR) || '|'
                                        || CAST(s.i AS VARCHAR) || '|'
                                        || s.t), 1, 15) AS BIGINT)
                % 1000 >= 150
         ) AS kept
  FROM tokD
)
SELECT doc_id,
       array_to_string(list_transform(kept, s -> s.t), ' ') AS text_aug,
       CAST(n_tokens AS BIGINT) AS n_tokens,
       CAST(n_tokens - len(kept) AS BIGINT) AS n_dropped
FROM keptD
"""


# Deterministic sequence packing (operators/textstats.py
# sequence_packing, budget=256): single-window replay of the two-phase
# prefix sum; bin = pre-doc running total // budget.
ORACLES["td_seq_packing"] = """
WITH cntS AS (
  SELECT doc_id,
         CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
  FROM documents
),
placed AS (
  SELECT doc_id, n_tokens,
         CAST((sum(n_tokens) OVER (ORDER BY n_tokens DESC, doc_id ASC
                                   ROWS UNBOUNDED PRECEDING) - n_tokens)
              // 256 AS BIGINT) AS bin_id
  FROM cntS
),
binsS AS (
  SELECT bin_id, CAST(count(*) AS BIGINT) AS bin_docs,
         CAST(sum(n_tokens) AS BIGINT) AS bin_fill
  FROM placed GROUP BY 1
)
SELECT p.doc_id, p.n_tokens, p.bin_id, b.bin_docs, b.bin_fill
FROM placed p JOIN binsS b ON p.bin_id = b.bin_id
"""


# Deterministic neighbor sampling (operators/graph.py neighbor_sample,
# fanouts (3, 2)): per-(seed, frontier-node) top-fanout edges under the
# portable hash ranking, unrolled per hop.
def _neighbor_sample_sql(fanouts: tuple[int, ...]) -> str:
    ctes = [
        """,
eN AS (SELECT DISTINCT u, v FROM edges),
f0 AS (SELECT node AS seed, node AS cur FROM nodes)"""
    ]
    selects = []
    for h, fan in enumerate(fanouts, start=1):
        ctes.append(
            f""",
s{h} AS (
  SELECT seed, CAST({h} AS BIGINT) AS hop, cur AS src, v AS dst FROM (
    SELECT f.seed, f.cur, e.v,
           row_number() OVER (
             PARTITION BY f.seed, f.cur
             ORDER BY CAST('0x' || substr(md5(CAST(f.seed AS VARCHAR)
                        || '|{h}|' || CAST(f.cur AS VARCHAR) || '|'
                        || CAST(e.v AS VARCHAR)), 1, 15) AS BIGINT) ASC,
                      e.v ASC) AS rn
    FROM f{h - 1} f JOIN eN e ON e.u = f.cur
  ) WHERE rn <= {fan}
),
f{h} AS (SELECT DISTINCT seed, dst AS cur FROM s{h})"""
        )
        selects.append(f"SELECT seed, hop, src, dst FROM s{h}")
    return kg_sql(
        _EDGES_CTE + "".join(ctes) + "\nUNION ALL\n".join(selects)
    )


ORACLES["kg_neighbor_sample"] = _neighbor_sample_sql((3, 2))


# Link-prediction ranking metrics (operators/graph.py
# link_prediction_metrics over link_prediction's capped-wedge scores):
# filtered-protocol MRR + hits@k in exact integers. The scores CTE is
# the kg_link_prediction oracle body verbatim.
ORACLES["kg_lp_metrics"] = kg_sql(
    _EDGES_CTE
    + """
, undp AS (SELECT u, v FROM edges UNION SELECT v, u FROM edges),
degp AS (SELECT u, CAST(count(*) AS BIGINT) AS deg FROM undp GROUP BY u),
midp AS (
  SELECT u AS mid, deg AS mid_deg FROM degp WHERE deg BETWEEN 2 AND 64
),
adjp AS (
  SELECT a.u AS mid, m.mid_deg, a.v AS x
  FROM undp a JOIN midp m ON a.u = m.mid
),
pairsp AS (
  SELECT a1.x AS node_a, a2.x AS node_b,
         CAST(sum(CAST(floor(1000000.0 / ln(CAST(a1.mid_deg AS DOUBLE))
                             + 0.5) AS BIGINT)) AS BIGINT) AS aa_micro,
         CAST(count(*) AS BIGINT) AS n_common
  FROM adjp a1 JOIN adjp a2 ON a1.mid = a2.mid AND a1.x < a2.x
  GROUP BY 1, 2
  HAVING count(*) >= 2
),
scoresM AS (
  SELECT p.node_a, p.node_b, p.aa_micro,
         (e.u IS NOT NULL) AS is_edge
  FROM pairsp p
  LEFT JOIN undp e ON e.u = p.node_a AND e.v = p.node_b
),
rankedM AS (
  SELECT node_a, is_edge,
         CAST(row_number() OVER (PARTITION BY node_a
                                 ORDER BY aa_micro DESC, node_b ASC)
              AS BIGINT) AS rnk
  FROM scoresM
),
firstsM AS (
  SELECT node_a, CAST(min(rnk) AS BIGINT) AS first_rank
  FROM rankedM WHERE is_edge GROUP BY node_a
),
foldM AS (
  SELECT CAST(count(*) AS BIGINT) AS n_seeds,
         CAST(sum(1000000 // first_rank) AS BIGINT) AS rr_sum,
         CAST(sum(CASE WHEN first_rank <= 1 THEN 1 ELSE 0 END) AS BIGINT) AS h1,
         CAST(sum(CASE WHEN first_rank <= 3 THEN 1 ELSE 0 END) AS BIGINT) AS h3,
         CAST(sum(CASE WHEN first_rank <= 10 THEN 1 ELSE 0 END) AS BIGINT) AS h10
  FROM firstsM
)
SELECT n_seeds,
       CAST(rr_sum // n_seeds AS BIGINT) AS mean_rr_micro,
       CAST((h1 * 1000) // n_seeds AS BIGINT) AS hits1_permille,
       CAST((h3 * 1000) // n_seeds AS BIGINT) AS hits3_permille,
       CAST((h10 * 1000) // n_seeds AS BIGINT) AS hits10_permille
FROM foldM
"""
)


# ANN recall@5 (operators/similarity.py ann_recall_report): IVF
# candidates (td_ivf_ann's full oracle, nprobe=4) against brute-force
# truth (td_ann_topk's full oracle) on the same 16 queries; the two
# existing oracles nest verbatim as derived tables.
ORACLES["td_ann_recall"] = f"""
WITH truthA AS (
  SELECT query_id, neighbor_id FROM ({ORACLES["td_ann_topk"]})
),
candA AS (
  SELECT query_id, neighbor_id FROM ({ORACLES["td_ivf_ann"]})
),
numsA AS (
  SELECT (SELECT CAST(count(*) AS BIGINT)
          FROM embeddings WHERE vec_id < 16) AS n_queries,
         (SELECT CAST(count(*) AS BIGINT) FROM truthA) AS n_truth,
         (SELECT CAST(count(*) AS BIGINT)
          FROM candA c JOIN truthA t
            ON c.query_id = t.query_id
           AND c.neighbor_id = t.neighbor_id) AS n_hit
)
SELECT n_queries, n_truth, n_hit,
       CASE WHEN n_truth > 0
            THEN CAST((n_hit * 1000) // n_truth AS BIGINT)
       END AS recall_permille
FROM numsA
"""


# Hamming-1 adjacency between distinct media-hash groups
# (operators/multimodal.py ahash_near_groups over mm_media_ahash's
# hashes): flip-probe equi-join in value space — the oracle reuses the
# mm_media_ahash statement verbatim as the hash source.
ORACLES["mm_ahash_near_groups"] = f"""
WITH hsrc AS (
  SELECT ahash FROM ({ORACLES["mm_media_ahash"]})
),
cnts AS (
  SELECT ahash, CAST(count(*) AS BIGINT) AS n FROM hsrc GROUP BY 1
),
flips AS (
  SELECT c.ahash AS hash_a, c.n AS n_a,
         xor(c.ahash, CAST((1 << f.i) AS BIGINT)) AS hash_b
  FROM cnts c CROSS JOIN (SELECT unnest(generate_series(0, 7)) AS i) f
)
SELECT f.hash_a, f.hash_b, f.n_a, c2.n AS n_b
FROM flips f JOIN cnts c2 ON f.hash_b = c2.ahash
WHERE f.hash_a < f.hash_b
"""


# Rank drift between snapshots (plans/incremental_kg.py rank_drift,
# A = doc_id % 5 != 0, B = doc_id % 5 != 1): per-snapshot qrank order
# replayed with a plain window, full outer on item_id.
ORACLES["kg_rank_drift"] = kg_sql(
    """
, qa AS (
  SELECT item_id, CAST(count(*) AS BIGINT) AS views_a,
         CAST(row_number() OVER (ORDER BY count(*) DESC, item_id ASC)
              AS BIGINT) AS rank_a
  FROM tmentions WHERE CAST(doc_id AS BIGINT) % 5 != 0
  GROUP BY item_id
),
qb AS (
  SELECT item_id, CAST(count(*) AS BIGINT) AS views_b,
         CAST(row_number() OVER (ORDER BY count(*) DESC, item_id ASC)
              AS BIGINT) AS rank_b
  FROM tmentions WHERE CAST(doc_id AS BIGINT) % 5 != 1
  GROUP BY item_id
)
SELECT COALESCE(qa.item_id, qb.item_id) AS item_id,
       qa.views_a, qb.views_b, qa.rank_a, qb.rank_b,
       CAST(qa.rank_a - qb.rank_b AS BIGINT) AS rank_drift
FROM qa FULL OUTER JOIN qb ON qa.item_id = qb.item_id
"""
)
