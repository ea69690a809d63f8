"""ML plans (SURVEY.md §2.10). Model fits are not SQL-expressible, but
every query's OUTPUT contract is: ml02-ml05 use closed-form
deterministic eval paths, and ml01 (r15) hashes its post-training
contract (model set, compat-grid chance-band edges, in_band verdict)
while the un-oracle-able raw accuracies surface only in its
contract-violation raise."""

from __future__ import annotations

from pyspark.sql import functions as F

from pyspark_bigdata_sars_cov_2_analysis_spark.ml import (
    confusion_matrix,
    evaluate_accuracy,
    train_classifiers,
)
from pyspark_bigdata_sars_cov_2_analysis_spark.functions.localrel import (
    local_frame,
)
from pyspark_bigdata_sars_cov_2_analysis_spark.ml.classify import features_from_array
from pyspark_bigdata_sars_cov_2_analysis_spark.operators.sorts import seeded_split
from pyspark_bigdata_sars_cov_2_analysis_spark.plans.registry import (
    tracked_cache,
    pround,
    pyround,
    query,
    sql_round,
    table,
)


def _prepped(spark, sf_dir):
    e = table(spark, sf_dir, "embeddings")
    return tracked_cache(features_from_array(e, "embedding", "label"))


# the oracle and the query DEFAULT must state the same band — a single
# constant feeds both so they cannot drift (review r15); calling
# ml01_classifier_bench directly with a custom band is out of the
# registered contract (the planted-failure test does, and raises
# before returning a frame)
_ML01_BAND = (0.5, 3.0)

# ml01's hashable contract (VERDICT r14 stretch #8): the MLlib
# accuracies themselves are engine-specific (no SQL twin can refit the
# models), but everything ELSE the query asserts IS oracle-expressible —
# the model set, the data-derived chance-band edges on the compat
# rounding grid, and the in_band verdict (TRUE row-for-row, because an
# out-of-band model RAISES instead of returning false). So the oracle
# states the full post-training contract and the measured accuracies
# live in the raise message, not the hashed frame — upgrading ml01 from
# the registry's sole rows-only check to a hashed one like ml02–ml05.
_ML01_ORACLE = f"""
WITH k AS (SELECT COUNT(DISTINCT label) AS n FROM embeddings)
SELECT m.model,
       {sql_round(f'{_ML01_BAND[0]} / k.n', 4)} AS band_lo,
       {sql_round(f'{_ML01_BAND[1]} / k.n', 4)} AS band_hi,
       TRUE AS in_band
FROM (VALUES ('random_forest'), ('decision_tree'),
             ('logistic_regression')) AS m(model)
CROSS JOIN k
"""


@query("ml01_classifier_bench", oracle=_ML01_ORACLE)
def ml01_classifier_bench(spark, sf_dir, band=_ML01_BAND):
    """M1-M6 — the reference's classifier accuracy bench
    (spark/jobs/cases_clinical_spectrum_analysis.py:168-212), seeded.

    The rows CARRY the pass/fail signal (VERDICT r7 #7, the a19/a20
    contract-boolean pattern): each model row states its accuracy band —
    the embeddings are random vectors, so a correct train/eval loop must
    land NEAR the chance rate 1/n_classes, with n_classes derived from
    the data — and ``in_band`` asserts it. VERDICT r8 #8 closes the
    loop: an out-of-band model RAISES (turning the driver record red via
    its err field, and carrying the measured accuracies in the message)
    instead of returning a polite false the driver would count as a
    green row. Safe to raise because the whole path is seeded and
    deterministic — a band exit means the train/eval loop broke, not
    that the dice rolled badly. ``band`` is the (lo, hi) multiplier pair
    on the chance rate; the planted-failure test passes an impossible
    band to prove the raise fires through the real training path.

    Hash-checkable since r15 (VERDICT r14 stretch #8): the returned
    frame holds only engine-independent values — model names, compat-
    grid band edges, in_band — so the DuckDB oracle states the same
    contract and the driver's value-hash attests it; the raw accuracies
    (MLlib-specific, un-oracle-able) moved out of the frame and surface
    only in the contract-violation raise. Margins measured at
    sf0.001/sf0.01: accuracies 0.096-0.128 against band [0.05, 0.3] —
    ≥1.9x from either edge, so the hashed contract is not fragile."""
    data = _prepped(spark, sf_dir)
    try:
        n_classes = data.select("label").distinct().count()
        chance = 1.0 / n_classes
        band_lo = pyround(band[0] * chance, 4)
        band_hi = pyround(band[1] * chance, 4)
        train, test = seeded_split(data, [0.8, 0.2], seed=2020)
        models = train_classifiers(train)
        checked = [
            (
                name,
                (acc := pyround(evaluate_accuracy(m, test), 4)),
                band_lo <= acc <= band_hi,
            )
            for name, m in models.items()
        ]
        out_of_band = [c for c in checked if not c[2]]
        if out_of_band:
            raise AssertionError(
                "ml01 chance-band contract violated (broken train/eval "
                f"loop?): {[(c[0], c[1], band_lo, band_hi) for c in out_of_band]}"
            )
        return local_frame(
            spark,
            [(name, band_lo, band_hi, ok) for name, _acc, ok in checked],
            "model string, band_lo double, band_hi double, "
            "in_band boolean",
        )
    finally:
        # training and eval are EAGER (MLlib fits + accuracy actions run
        # above), and the returned frame is a local literal frame — the
        # cached features block would otherwise sit in executor storage
        # for the rest of a multi-query suite run (review r9)
        data.unpersist()


_CM_COLS = ",\n           ".join(
    f'CAST(SUM(CASE WHEN pred = {k} THEN 1 ELSE 0 END) AS BIGINT) AS "{k}"'
    for k in range(10)
)


@query(
    "ml02_confusion_matrix",
    # Fully deterministic eval path so M7's VALUES are oracle-checkable
    # (r5 verdict item #4): the 80/20 split is the md5 hash gate (d08
    # family, salt 'mlsplit', 0.8 → hex cutoff 'cccc'), and the classifier
    # is a closed-form 10-way linear scorer over the 1/32768-quantized
    # embedding with u07's integer weight formula — all-int64 scores, so
    # argmax is exact in any engine; ties break to the lowest class via
    # first-position semantics on both sides.
    oracle=f"""
    WITH t AS (
      SELECT CAST(label AS BIGINT) AS label,
             list_transform(embedding,
               x -> CAST(floor(CAST(x AS DOUBLE) * 32768 + 0.5) AS BIGINT)
             ) AS q
      FROM embeddings
      WHERE NOT (substr(md5('mlsplit' || CAST(vec_id AS VARCHAR)), 1, 4)
                 < 'cccc')
    ),
    s AS (
      SELECT label,
             list_transform(generate_series(0, 9), c ->
               list_aggregate(list_transform(generate_series(1, len(q)),
                 i -> q[i] * ((((i-1)*7 + c*13) % 5) - 2)), 'sum')) AS sc
      FROM t
    ),
    p AS (
      SELECT label,
             list_position(sc, list_aggregate(sc, 'max')) - 1 AS pred
      FROM s
    )
    SELECT label,
           {_CM_COLS}
    FROM p GROUP BY label
    """,
)
def ml02_confusion_matrix(spark, sf_dir):
    """M7 — DataFrame-native confusion matrix (replaces the reference's
    RDD MulticlassMetrics, spark/jobs/radiography_analysis.py:208-214),
    now with a hash-checkable eval path: deterministic md5-gate test split
    (llmdata/sampling.hash_gate — randomSplit re-draws on task retry and
    differs across engines) and a closed-form 10-way integer linear
    classifier standing in for the model (native expressions, zero UDFs,
    exact int64 argmax — the u07 symbolic-model trick). The trained-model
    variant of this same operator runs in pipelines/radiography.py and
    ml01's accuracy bands; here the stand-in makes every cell of the
    matrix reproducible in DuckDB SQL."""
    from pyspark_bigdata_sars_cov_2_analysis_spark.llmdata.sampling import (
        hash_gate,
    )

    e = table(spark, sf_dir, "embeddings")
    test = e.where(~hash_gate(F.col("vec_id"), 0.8, salt="mlsplit"))
    # materialize the quantized embedding as a COLUMN before the score
    # lambdas reference it (review r9, the oracle's CTE `t` shape): an
    # inlined `q` is re-evaluated per element_at access inside the
    # nested higher-order functions, where subexpression elimination
    # does not reach — the full embedding transform ran up to
    # 10 classes × d elements per row
    t = test.select(
        F.col("label").cast("bigint").alias("label"),
        F.transform(
            "embedding",
            lambda x: F.floor(x.cast("double") * 32768 + F.lit(0.5)).cast(
                "long"
            ),
        ).alias("q"),
    )
    scores = F.transform(
        F.sequence(F.lit(0), F.lit(9)),
        lambda c: F.aggregate(
            F.sequence(F.lit(1), F.size("q")),
            F.lit(0).cast("long"),
            lambda acc, i: acc
            + F.element_at(F.col("q"), i) * (((i - 1) * 7 + c * 13) % 5 - 2),
        ),
    )
    preds = t.select(
        "label",
        (F.array_position(scores, F.array_max(scores)) - 1)
        .cast("bigint")
        .alias("prediction"),
    )
    return confusion_matrix(preds, values=list(range(10)))


@query(
    "ml03_regression_metrics",
    oracle=f"""
    WITH p AS (
      SELECT o_orderstatus,
             o_totalprice - ((o_orderkey % 1000) * 150.0 + 100000.0) AS err,
             o_totalprice AS y
      FROM orders
    ),
    a AS (
      SELECT o_orderstatus,
             CAST(COUNT(*) AS BIGINT) AS n,
             SUM(err * err) AS sse,
             SUM(abs(err)) AS sae,
             SUM(y) AS sy,
             SUM(y * y) AS syy
      FROM p GROUP BY 1
    )
    SELECT o_orderstatus, n,
           {sql_round("sqrt(sse / n)", 2)} AS rmse,
           {sql_round("sae / n", 2)} AS mae,
           {sql_round("1.0 - sse / (syy - sy * sy / n)", 6)} AS r2
    FROM a
    """,
)
def ml03_regression_metrics(spark, sf_dir):
    """M-family completion: DF-native regression evaluation (RMSE / MAE /
    R²) per group in ONE aggregate pass — the eval path a 100 TB scoring
    job uses instead of RegressionEvaluator's single-metric passes. The
    predictor is a closed integer formula of the key (ml02's trick), so
    both engines score identical residuals; R² uses the one-pass identity
    Σ(y−ȳ)² = Σy² − (Σy)²/n, and every metric is compat-rounded. All
    sums are map-side-partial aggregates; no window, no second scan."""
    o = table(spark, sf_dir, "orders")
    err = F.col("o_totalprice") - (
        (F.col("o_orderkey") % 1000) * 150.0 + 100000.0
    )
    a = o.groupBy("o_orderstatus").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(err * err).alias("sse"),
        F.sum(F.abs(err)).alias("sae"),
        F.sum("o_totalprice").alias("sy"),
        F.sum(F.col("o_totalprice") * F.col("o_totalprice")).alias("syy"),
    )
    return a.select(
        "o_orderstatus",
        "n",
        pround(F.sqrt(F.col("sse") / F.col("n")), 2).alias("rmse"),
        pround(F.col("sae") / F.col("n"), 2).alias("mae"),
        pround(
            F.lit(1.0)
            - F.col("sse")
            / (F.col("syy") - F.col("sy") * F.col("sy") / F.col("n")),
            6,
        ).alias("r2"),
    )


@query(
    "ml04_kfold_assignment",
    # the fold id is a CASE over the first md5 hex char — '0'-'3'/'4'-'7'/
    # '8'-'b'/'c'-'f' are lexicographically contiguous in every engine,
    # so the assignment is pure string algebra, no hex->int conversion
    oracle="""
    WITH f AS (
      SELECT label,
             CASE WHEN substr(md5('cv|' || CAST(vec_id AS VARCHAR)), 1, 1)
                       < '4' THEN 0
                  WHEN substr(md5('cv|' || CAST(vec_id AS VARCHAR)), 1, 1)
                       < '8' THEN 1
                  WHEN substr(md5('cv|' || CAST(vec_id AS VARCHAR)), 1, 1)
                       < 'c' THEN 2
                  ELSE 3 END AS fold
      FROM embeddings
    )
    SELECT CAST(fold AS BIGINT) AS fold, label,
           CAST(COUNT(*) AS BIGINT) AS n
    FROM f GROUP BY fold, label
    """,
)
def ml04_kfold_assignment(spark, sf_dir):
    """M-family completion — deterministic k-fold cross-validation
    assignment (k=4): every example lands in exactly one fold keyed by a
    content-id hash, so the folds are identical on every run, engine,
    cluster size, and data layout — unlike MLlib's ``CrossValidator``
    fold assignment, which draws from ``rand(seed)`` and is therefore
    stable only within one engine. The md5-gate family (o05/d08/o08)
    applied to model selection: fold membership is a row-local
    projection (zero shuffle), per-(fold, label) counts are one
    aggregate, and the output shape is exactly what a stratification
    audit reads (does each fold see every class?). Train/validate for
    fold i = ``fold != i`` / ``fold == i`` filters — no data movement."""
    e = table(spark, sf_dir, "embeddings")
    c = F.substring(
        F.md5(F.concat(F.lit("cv|"), F.col("vec_id").cast("string"))), 1, 1
    )
    fold = (
        F.when(c < "4", 0)
        .when(c < "8", 1)
        .when(c < "c", 2)
        .otherwise(3)
        .cast("bigint")
    )
    return (
        e.select(fold.alias("fold"), "label")
        .groupBy("fold", "label")
        .agg(F.count(F.lit(1)).alias("n"))
    )


@query(
    "ml05_calibration_bins",
    # score and label are both deterministic rational arithmetic (no
    # exp/sigmoid — libm last-ulp differences would flip bin edges), so
    # the whole reliability table hashes exactly; rates ride the compat
    # 4dp grid
    oracle=f"""
    WITH s AS (
      SELECT event_id,
             least(greatest(value / 200.0, 0.0), 1.0) AS score,
             (value + CAST(CAST('0x' || substr(md5('cal|' ||
                CAST(event_id AS VARCHAR)), 1, 4) AS UBIGINT) AS BIGINT)
              % 120 > 160) AS label
      FROM events
    ),
    b AS (
      SELECT least(CAST(floor(score * 10) AS INT), 9) AS bin, score,
             CASE WHEN label THEN 1 ELSE 0 END AS y
      FROM s
    )
    SELECT CAST(bin AS BIGINT) AS bin,
           CAST(COUNT(*) AS BIGINT) AS n,
           {sql_round("AVG(score)", 4)} AS mean_score,
           {sql_round("AVG(y)", 4)} AS pos_rate,
           {sql_round("ABS(AVG(score) - AVG(y))", 4)} AS calib_gap
    FROM b GROUP BY bin
    """,
)
def ml05_calibration_bins(spark, sf_dir):
    """M-family completion (r10) — the CALIBRATION / reliability table:
    decile-binned mean predicted score vs observed positive rate with
    the per-bin gap, the eval that says whether a model's 0.8 means
    80%. Here the score is a deterministic rational squash of the
    event value and the label a hash-noised threshold on the same
    signal — the PATTERN under attestation is the binning/rollup
    (row-local bin id, one tiny aggregate), which plugs any real
    model's score column in unchanged. Determinism discipline: no
    sigmoid/exp (libm last-ulp differences across engines could flip a
    bin edge) — the squash is one division and two clamps, the noise
    one md5 prefix, so every bin count and rate hashes exactly."""
    e = table(spark, sf_dir, "events")
    score = F.least(
        F.greatest(F.col("value") / F.lit(200.0), F.lit(0.0)), F.lit(1.0)
    )
    noise = (
        F.conv(
            F.substring(
                F.md5(
                    F.concat(F.lit("cal|"), F.col("event_id").cast("string"))
                ),
                1,
                4,
            ),
            16,
            10,
        ).cast("bigint")
        % 120
    )
    label = (F.col("value") + noise) > F.lit(160.0)
    b = e.select(
        F.least(F.floor(score * 10).cast("int"), F.lit(9)).alias("bin"),
        score.alias("score"),
        F.when(label, 1).otherwise(0).alias("y"),
    )
    return b.groupBy(F.col("bin").cast("bigint").alias("bin")).agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        pround(F.avg("score"), 4).alias("mean_score"),
        pround(F.avg("y"), 4).alias("pos_rate"),
        pround(F.abs(F.avg("score") - F.avg("y")), 4).alias("calib_gap"),
    )
