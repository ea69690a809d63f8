"""Deterministic sampling & splitting for training-data pipelines.

Random sampling (``df.sample``/``rand()``) is a reproducibility bug at
pipeline scale: a retried task re-draws and the output shifts between runs
and between engines. Everything here keys decisions off a content hash, so
the same row gets the same decision on every run, every engine, every
cluster size — and the DuckDB oracles can replicate the exact rule.

The hash rule: ``substring(md5(key), 1, 4) < threshold_hex`` — md5 hex is
uniform, a 4-hex-digit prefix gives 16-bit (1/65536) rate granularity, and
lexicographic comparison on lowercase hex is identical in Spark, DuckDB,
and Python. No conv()/bit tricks that differ across engines.

NULL keys (review r15, pinned in tests): ``md5(NULL)`` is NULL, the
comparison is NULL, and a ``where(NULL)`` DROPS the row — in Spark AND in
every SQL oracle, by three-valued logic. So the filter-shaped operators
(stratified/weighted/temperature sampling) exclude NULL-id rows at ANY
rate, exactly like ``WHERE`` would; this is the deliberate cross-engine
contract, not an accident — a sampling key should never be NULL, and a
row with one has no deterministic fate to reproduce. The one
column-shaped operator (``leakage_free_split``) instead routes NULL
group keys to 'eval' (its ``otherwise`` branch — fail-safe: questionable
rows must never contaminate train).

Scale shape: both operators are pure row-local projections/filters — zero
shuffles beyond what the caller already has; the split is stable under
repartitioning by construction.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from pyspark_bigdata_sars_cov_2_analysis_spark.operators.joins import (
    _assert_no_reserved,
)


def rate_to_hex(rate: float, digits: int = 4) -> str:
    """Largest ``digits``-hex threshold with P(prefix < threshold) <= rate
    — the exact effective rate is ``int(threshold, 16) / 16**digits``.
    ``rate >= 1`` returns ``"g"``: lexicographically greater than every hex
    prefix, so the gate keeps everything (the naive ``format`` would emit a
    5-char ``"10000"``, which compares SMALLER than ``"ffff"`` and would
    silently keep ~6% instead of 100%)."""
    if not 0.0 <= rate <= 1.0:
        raise ValueError(f"rate must be in [0, 1], got {rate}")
    n = int(rate * (16**digits))
    if n >= 16**digits:
        return "g"
    return format(n, f"0{digits}x")


def _hash_prefix(key: Column, salt: str) -> Column:
    """The 4-hex md5 prefix every gate in this module compares against
    its threshold. ONE definition: the prefix width and the (salt, key)
    concat scheme are a cross-engine contract with the DuckDB oracles —
    a drifted copy in one gate would silently decorrelate it from the
    others."""
    return F.substring(
        F.md5(F.concat(F.lit(salt), key.cast("string"))), 1, 4
    )


def hash_gate(key: Column, rate: float, salt: str = "") -> Column:
    """Boolean column: deterministically true for ~``rate`` of distinct
    keys, NULL for a NULL key (which a ``where()`` then drops — the
    module-doc NULL contract). ``salt`` decorrelates independent gates
    over the same key (a sample gate and a split gate must not select
    nested subsets)."""
    return _hash_prefix(key, salt) < F.lit(rate_to_hex(rate))


def stratified_hash_sample(
    df: DataFrame,
    id_col: str,
    strata_col: str,
    rates: dict[str, float],
    default_rate: float = 0.0,
    salt: str = "sample",
) -> DataFrame:
    """Per-stratum deterministic sample: stratum ``s`` keeps ~``rates[s]``
    of its rows (``default_rate`` for unlisted strata). The per-row
    decision hashes (salt, id) only — adding or removing strata from the
    config never reshuffles which rows survive in other strata (the
    property that makes corpus-mix tuning reproducible)."""
    expr = None
    for stratum, rate in sorted(rates.items()):
        cond = F.col(strata_col) == stratum
        g = hash_gate(F.col(id_col), rate, salt)
        expr = F.when(cond, g) if expr is None else expr.when(cond, g)
    gate = (
        expr.otherwise(hash_gate(F.col(id_col), default_rate, salt))
        if expr is not None
        else hash_gate(F.col(id_col), default_rate, salt)
    )
    return df.where(gate)


def rate_threshold_hex(rate: Column) -> Column:
    """In-plan twin of ``rate_to_hex``: encode a keep-rate column as the
    4-hex-digit md5-prefix threshold. rate ≥ 1 keeps everything: the
    4-hex space tops out at 'ffff', so the keep-all sentinel is 'g'
    (> every md5 prefix). The least() clamp is the SECOND overflow
    guard (ADVICE r6): if floor ever yielded 65536, its hex '10000'
    would lpad-TRUNCATE to '1000' — silently keeping ~6% instead of
    ~100%. At 2^16 granularity the multiply is an exact exponent shift
    so rate < 1.0 cannot reach 65536, but the clamp makes the
    truncation impossible by construction rather than by that
    binade argument (which a non-power-of-two granularity would
    silently invalidate).

    Total over the rate domain (review r9): a NEGATIVE rate is clamped
    to 0 ('0000', keep nothing) — unclamped, its two's-complement hex
    would lpad-truncate to 'ffff' and keep ~everything, the silent
    inversion the module comment warns about; a NaN rate (undefined
    keep probability) likewise encodes as keep-NOTHING via nanvl —
    under Spark's NaN-is-greatest ordering it would otherwise satisfy
    ``rate >= 1.0`` and keep the entire corpus."""
    r = F.greatest(F.nanvl(rate, F.lit(0.0)), F.lit(0.0))
    return F.when(r >= 1.0, F.lit("g")).otherwise(
        F.lower(
            F.lpad(
                F.hex(
                    F.least(F.floor(r * 65536).cast("int"), F.lit(65535))
                ),
                4,
                "0",
            )
        )
    )


def weighted_hash_sample(
    df: DataFrame,
    id_col: str,
    weight: Column,
    salt: str = "wsample",
) -> DataFrame:
    """Per-ROW weighted Bernoulli sampling: row kept with probability ≈
    its own ``weight`` (clamped to [0,1]), decided by the same
    deterministic md5 gate as o05/o06/d08 — the quality-proportional
    sampling step of an LLM-data pipeline (keep good documents often,
    bad ones rarely) made reproducible across runs/engines/partitioning.
    o05's gate applies one rate per STRATUM and o06's one per SOURCE;
    this is the per-row generalization: the threshold is computed from
    the weight column in-plan (``rate_threshold_hex``, both overflow
    guards included), so the whole operator stays a row-local filter —
    zero shuffle, trivially scale-clean. Weights must be deterministic
    (derive them from content, not ``rand()``), or reproducibility is
    lost upstream of the gate. Negative and NaN weights keep NOTHING
    (the encoder clamps both — an undefined keep probability must not
    keep ~everything)."""
    return df.where(
        _hash_prefix(F.col(id_col), salt) < rate_threshold_hex(weight)
    )


def temperature_mixture_sample(
    df: DataFrame,
    id_col: str,
    source_col: str,
    weights: dict[str, float],
    inv_temperature: int = 2,
    budget: float = 0.25,
    salt: str = "mix",
) -> DataFrame:
    """Temperature-scaled corpus mixing — the standard LLM-data recipe for
    rebalancing sources: target share of source ``s`` ∝ ``w_s^(1/T)``,
    with ``budget`` = target output fraction of the whole corpus.
    Per-source keep-rate = ``min(1, budget·N·share_s / n_s)``; rows are
    kept by the same deterministic md5 gate as o05/d08, so the mix is
    reproducible across runs, engines, and partitionings.

    Temperature domain (review r15): the in-plan exponent is the
    INTEGER ``inv_temperature`` = 1/T ≥ 1, so this operator directly
    expresses the identity mix (1) and SHARPENING toward the
    max-weight source (≥ 2). The FLATTENING regime (T > 1 — the
    ``w^0.7``-style upsample-rare recipe) is reached by pre-scaling the
    weights DICT driver-side (``{s: w**0.7 for ...}`` with
    ``inv_temperature=1``): the dict values are Python floats that land
    as identical literals in the Spark plan and the SQL oracle, so
    cross-engine exactness is preserved — which an in-plan fractional
    ``pow()`` (last-ulp divergence across engines) would not be.

    ``inv_temperature`` is an INTEGER exponent (1/T) applied by repeated
    multiplication: ``pow()`` differs across engines in the last ulp,
    which could flip a 16-bit gate threshold; +,-,×,÷ are correctly
    rounded IEEE doubles everywhere, so the identical expression tree
    yields bit-identical thresholds in Spark and the DuckDB oracle.
    Sources missing from ``weights`` get weight 0 (dropped); shares
    renormalize over the sources actually present in the corpus.

    Scale shape: ONE tiny per-source count aggregate, broadcast-joined
    back; the gate itself is row-local. No driver round-trip (the rates
    live in the plan, not in Python), no big-side shuffle — at 100 TB the
    corpus is read once and filtered in place."""
    if inv_temperature < 1:
        raise ValueError("inv_temperature must be a positive integer")
    # budget and weights are driver-side Python floats — fail fast on the
    # values whose per-source rate the hex encoder would clamp to
    # keep-NOTHING (negative) or that signal a config bug (NaN): either
    # way the caller meant neither an empty nor a full corpus. The
    # NaN > 0 comparison is False, so one check catches both.
    if not budget > 0:
        raise ValueError(f"budget must be > 0, got {budget}")
    bad = {s: w for s, w in weights.items() if not w >= 0}
    if bad:
        # a negative or NaN weight has no meaningful target share;
        # pre-clamp, a negative rate's hex encoding lpad-truncated to
        # 'ffff' — silently keeping ~everything
        raise ValueError(f"weights must be >= 0 and not NaN, got {bad}")
    # the final drop() would otherwise remove the CALLER's columns
    _assert_no_reserved(
        "temperature_mixture_sample",
        ("__src", "__n", "__sw", "__ntot", "__swtot", "__thresh"),
        df=df,
    )
    pairs = [
        x
        for key in sorted(weights)
        for x in (F.lit(key), F.lit(float(weights[key])))
    ]
    wmap = F.create_map(*pairs) if pairs else F.create_map()
    w = F.coalesce(
        wmap[F.col("__src")] if pairs else F.lit(None).cast("double"),
        F.lit(0.0),
    )
    sw = w
    for _ in range(inv_temperature - 1):
        sw = sw * w
    counts = (
        df.groupBy(F.col(source_col).alias("__src"))
        .agg(F.count(F.lit(1)).alias("__n"))
        .select("__src", "__n", sw.alias("__sw"))
    )
    tot = counts.agg(
        F.sum("__n").alias("__ntot"), F.sum("__sw").alias("__swtot")
    )
    rate = (
        F.lit(float(budget))
        * F.col("__ntot")
        * (F.col("__sw") / F.col("__swtot"))
        / F.col("__n")
    )
    thresh = rate_threshold_hex(rate)
    rates = counts.crossJoin(F.broadcast(tot)).select(
        "__src", thresh.alias("__thresh")
    )
    gated = df.join(
        F.broadcast(rates), df[source_col] == rates["__src"]
    ).where(_hash_prefix(F.col(id_col), salt) < F.col("__thresh"))
    return gated.drop("__src", "__thresh")


def leakage_free_split(
    df: DataFrame,
    id_col: str,
    group_key: Column,
    train_rate: float = 0.9,
    salt: str = "split",
) -> DataFrame:
    """Train/eval split that can't leak near-identical content across the
    boundary: the split decision hashes ``group_key`` (e.g. a dup-cluster
    id or a content fingerprint), so every member of a group lands on the
    SAME side. Splitting i.i.d. by row is how eval contamination happens
    in deduplicated-but-clustered corpora.

    A NULL group key routes to 'eval' (the ``otherwise`` branch) —
    fail-safe by design: a row whose grouping is unknown must never
    contaminate train (module-doc NULL contract, pinned in tests).

    Output: input columns + ``split`` ∈ {'train', 'eval'}."""
    _assert_no_reserved("leakage_free_split", ("split",), df=df)
    return df.select(
        "*",
        F.when(hash_gate(group_key, train_rate, salt), F.lit("train"))
        .otherwise(F.lit("eval"))
        .alias("split"),
    )
