"""Deduplication operators for training-data pipelines (LLM-data surface).

Four families, all expressed as DataFrame compositions (no Python UDFs, no
driver collects) so they scale to 100 TB:

- exact: md5-fingerprint groupBy — the shuffle key is a 16-byte hash, never
  the document text itself;
- MinHash + LSH: shingle → per-seed min-hash → band → bucket self-join;
  candidate generation is equi-join on (band, band_signature), so the only
  quadratic work happens inside a bucket;
- SimHash: per-token 32-bit hashes, bit-majority vote → one signature per
  doc; near-dup = small Hamming distance (cheap XOR popcount join on
  band prefixes if needed);
- n-gram Jaccard: exact set similarity verified only on pairs that share at
  least one shingle (inverted-index join), never all-pairs.

Hashing is md5-based everywhere — deterministic, seed-stable, and
reproducible in any engine (this is what the DuckDB oracles rely on).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from pyspark_bigdata_sars_cov_2_analysis_spark.functions.compat import pround


def _normalize(col: Column) -> Column:
    return F.regexp_replace(F.trim(F.lower(col)), r"\s+", " ")


def exact_duplicates(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Exact dedup groups: one row per distinct normalized text with the
    canonical (minimum) id and the group size. Groups on the md5 of the
    text so the shuffle moves 32-byte keys, not documents."""
    fp = F.md5(_normalize(F.col(text_col))).alias("fp")
    return (
        df.select(fp, F.col(id_col))
        .groupBy("fp")
        .agg(
            F.min(id_col).alias("keeper"),
            F.count(F.lit(1)).alias("n_copies"),
        )
    )


def word_shingles(
    df: DataFrame, id_col: str, text_col: str, k: int = 3
) -> DataFrame:
    """Distinct word k-shingles per document → (id, shingle) exploded.
    Documents shorter than k tokens produce no rows."""
    toks = F.split(_normalize(F.col(text_col)), " ")
    idx = F.sequence(F.lit(1), F.size(toks) - (k - 1))
    sh = F.transform(idx, lambda i: F.array_join(F.slice(toks, i, k), " "))
    return (
        df.where(F.size(toks) >= k)
        .select(F.col(id_col), F.explode(F.array_distinct(sh)).alias("shingle"))
    )


def minhash_signatures(
    shingled: DataFrame, id_col: str, num_hashes: int = 12
) -> DataFrame:
    """(id, j, mh): per-seed min-hash. Hash family = md5(shingle || '#j');
    the min is taken over the *hex string* ordering, which every engine
    agrees on.

    Shape matters at scale: instead of a seeds crossJoin (which multiplies
    the shingle stream ``num_hashes``× before the shuffle), compute all
    seeds as ``num_hashes`` min-aggregates in ONE groupBy — map-side
    partials reduce each partition to one row per (doc, seed) before any
    data moves — then unpivot the tiny aggregated result."""
    mins = [
        F.min(
            F.md5(F.concat_ws("#", F.col("shingle"), F.lit(str(j))))
        ).alias(f"mh_{j}")
        for j in range(num_hashes)
    ]
    wide = shingled.groupBy(id_col).agg(*mins)
    stack_args = ", ".join(f"{j}, mh_{j}" for j in range(num_hashes))
    return wide.select(
        F.col(id_col),
        F.expr(f"stack({num_hashes}, {stack_args}) AS (j, mh)"),
    )


def lsh_candidate_pairs(
    signatures: DataFrame, id_col: str, band_rows: int = 3
) -> DataFrame:
    """Band the signatures (band = j // band_rows), equi-join docs sharing a
    (band, band_signature) bucket → distinct candidate pairs (a < b)."""
    banded = signatures.withColumn("band", (F.col("j") / band_rows).cast("int"))
    band_sig = (
        banded.groupBy(id_col, "band")
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("j", "mh"))),
                    lambda s: s["mh"],
                ),
                ",",
            ).alias("band_sig")
        )
    )
    a = band_sig.select(
        F.col(id_col).alias("id_a"), "band", "band_sig"
    )
    b = band_sig.select(
        F.col(id_col).alias("id_b"), "band", "band_sig"
    )
    return (
        a.join(b, on=["band", "band_sig"])
        .where(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .distinct()
    )


def minhash_lsh_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    k: int = 3,
    num_hashes: int = 12,
    band_rows: int = 3,
) -> DataFrame:
    """Full MinHash+LSH near-dup candidate pipeline."""
    sh = word_shingles(df, id_col, text_col, k)
    sig = minhash_signatures(sh, id_col, num_hashes)
    return lsh_candidate_pairs(sig, id_col, band_rows)


def jaccard_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    k: int = 3,
    threshold: float = 0.1,
) -> DataFrame:
    """Exact n-gram Jaccard over pairs sharing ≥1 shingle (inverted-index
    join). Returns (id_a, id_b, jaccard rounded 4dp) above threshold."""
    sh = word_shingles(df, id_col, text_col, k)
    sizes = sh.groupBy(id_col).agg(F.count(F.lit(1)).alias("n_sh"))
    a = sh.select(F.col(id_col).alias("id_a"), "shingle")
    b = sh.select(F.col(id_col).alias("id_b"), "shingle")
    inter = (
        a.join(b, on="shingle")
        .where(F.col("id_a") < F.col("id_b"))
        .groupBy("id_a", "id_b")
        .agg(F.count(F.lit(1)).alias("n_inter"))
    )
    sa = sizes.select(F.col(id_col).alias("id_a"), F.col("n_sh").alias("n_a"))
    sb = sizes.select(F.col(id_col).alias("id_b"), F.col("n_sh").alias("n_b"))
    jac = (
        inter.join(sa, on="id_a")
        .join(sb, on="id_b")
        .withColumn(
            "jaccard",
            pround(
                F.col("n_inter")
                / (F.col("n_a") + F.col("n_b") - F.col("n_inter")),
                4,
            ),
        )
    )
    return jac.where(F.col("jaccard") >= threshold).select("id_a", "id_b", "jaccard")


def simhash_signatures(
    df: DataFrame, id_col: str, text_col: str, bits: int = 32
) -> DataFrame:
    """(id, simhash): bit-majority SimHash over distinct whitespace tokens.
    Token hash = first 8 hex chars of md5 as an unsigned 32-bit int."""
    toks = df.select(
        F.col(id_col),
        F.explode(
            F.array_distinct(F.split(_normalize(F.col(text_col)), " "))
        ).alias("tok"),
    )
    h = F.conv(F.substring(F.md5("tok"), 1, 8), 16, 10).cast("bigint")
    spark = df.sparkSession
    # (b, p=2^b): dividing by a power of two is exact in double arithmetic,
    # so floor(h/p) % 2 is a portable bit test (shiftright needs a literal).
    bit_idx = spark.range(bits).select(
        F.col("id").cast("int").alias("b"),
        F.pow(F.lit(2.0), F.col("id").cast("double")).cast("bigint").alias("p"),
    )
    contrib = (
        toks.withColumn("h", h)
        .crossJoin(F.broadcast(bit_idx))
        .select(
            F.col(id_col),
            "b",
            "p",
            F.when((F.floor(F.col("h") / F.col("p")).cast("bigint") % 2) == 1, 1)
            .otherwise(-1)
            .alias("sgn"),
        )
    )
    bit_votes = contrib.groupBy(id_col, "b", "p").agg(F.sum("sgn").alias("vote"))
    bit_val = F.when(F.col("vote") > 0, F.col("p")).otherwise(F.lit(0).cast("bigint"))
    return bit_votes.groupBy(id_col).agg(F.sum(bit_val).alias("simhash"))
