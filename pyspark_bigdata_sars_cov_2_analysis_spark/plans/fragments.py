"""Shared DuckDB-oracle SQL fragments (review r14).

The oracle registry had three byte-identical copies of the SCD2
dimension CTE chain (w08 / j09 / e16 — the Spark side already shares
``w08_scd2_intervals``), two copies of the text-normalization
expression, and two copies of the language-argmax CASE. Hand-kept
copies are exactly the drift hazard the ``_bands_sql`` comment
documents ("two drifting copies ... would let one query's sessions
silently disagree"): an edit applied to one copy desynchronizes
attested twins across files. Every multi-consumer oracle fragment
lives here ONCE; this module imports nothing from the rest of
``plans``, so any plan module can import it at top level without a
cycle.
"""

from __future__ import annotations

# The normalization every text/dedup oracle applies before tokenizing —
# the DuckDB twin of functions.text.normalize_text / llmdata.dedup._normalize.
DUCK_NORM = "regexp_replace(trim(lower(text)), '\\s+', ' ', 'g')"

# SCD2 history construction over events: per (user, day) the LAST
# event's type (argmax by ts with event_id tiebreak — lineitem-style
# determinism), then change-points via lag. w08 selects intervals
# straight off `changes`; j09/e16 extend with the `dim` CTE and the
# temporal join.
SCD2_CHANGES_CTES = """
    daily AS (
      SELECT user_id, d, event_type AS attr FROM (
        SELECT user_id, CAST(ts AS DATE) AS d, event_type,
               ROW_NUMBER() OVER (PARTITION BY user_id, CAST(ts AS DATE)
                                  ORDER BY ts DESC, event_id DESC) AS rn
        FROM events) WHERE rn = 1),
    marked AS (
      SELECT user_id, d, attr,
             LAG(attr) OVER w AS prev_attr
      FROM daily WINDOW w AS (PARTITION BY user_id ORDER BY d)),
    changes AS (
      SELECT user_id, d, attr FROM marked
      WHERE prev_attr IS NULL OR attr <> prev_attr)"""

# j09's oracle — and e16's VERBATIM (the streaming drain through the
# native parquet file sink must reproduce the batch temporal join
# exactly, so the two attestations share one string by construction).
SCD2_TEMPORAL_JOIN_SQL = f"""
    WITH {SCD2_CHANGES_CTES},
    dim AS (
      SELECT user_id, attr, d AS valid_from,
             LEAD(d - INTERVAL 1 DAY) OVER
               (PARTITION BY user_id ORDER BY d) AS valid_to
      FROM changes)
    SELECT dim.attr AS regime_attr, e.event_type,
           CAST(COUNT(*) AS BIGINT) AS n
    FROM events e JOIN dim
      ON e.user_id = dim.user_id
     AND CAST(e.ts AS DATE) >= dim.valid_from
     AND (dim.valid_to IS NULL OR CAST(e.ts AS DATE) <= dim.valid_to)
    GROUP BY 1, 2
    """

# Language-ID argmax with the deterministic lexicographic tiebreak —
# t03's prediction CASE, reused verbatim by t17's confusion rollup.
LANG_ARGMAX_CASE = """
           CASE
             WHEN s_de >= s_en AND s_de >= s_es AND s_de >= s_fr AND s_de >= s_zh THEN 'de'
             WHEN s_en >= s_es AND s_en >= s_fr AND s_en >= s_zh THEN 'en'
             WHEN s_es >= s_fr AND s_es >= s_zh THEN 'es'
             WHEN s_fr >= s_zh THEN 'fr'
             ELSE 'zh'
           END"""
