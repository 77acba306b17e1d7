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
