"""Deduplication operators for training-data pipelines (LLM-data surface).

Four text families (embedding near-dup lives in :mod:`.similarity`), all
DataFrame compositions (no Python UDFs, no driver collects) sized for
100 TB:

- exact: md5-fingerprint groupBy — the shuffle key is a 16-byte hash, never
  the document text itself;
- MinHash + LSH: shingle → per-seed min-hash → band → bucket-grouped
  row-local pair expansion; the only quadratic work happens inside a
  bucket, and the signature pipeline executes once (no self-join);
- SimHash: per-token 32-bit hashes, bit-majority vote → one signature per
  doc; near-dup pairs via byte-band candidates + exact
  ``bit_count(xor)`` Hamming verify;
- n-gram Jaccard: exact set similarity over pairs sharing ≥1 shingle
  (inverted-index join), with a lossless AllPairs prefix-filtered variant
  for corpora whose hottest shingles make the naive join quadratic.

Plus the two dedup-adjacent corpus-hygiene ops: benchmark decontamination
(``contamination_hits`` — train×eval shingle collision, fan-out-free) and
quality-argmax dup resolution (``dedup_keep_best``).

Hashing is md5-based everywhere — deterministic, seed-stable, and
reproducible in any engine (this is what the DuckDB oracles rely on).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from pyspark_bigdata_sars_cov_2_analysis_spark.functions.compat import pround
from pyspark_bigdata_sars_cov_2_analysis_spark.functions.localrel import (
    local_frame,
)
from pyspark_bigdata_sars_cov_2_analysis_spark.operators.relational import spread_compute


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


def shingle_array(col: Column, k: int = 3) -> Column:
    """Word k-shingles of a text column as a per-row array (row-local; no
    explode). Documents shorter than k tokens yield an empty array.

    The token array is BOUND ONCE per row by making it the argument of a
    single-element ``transform`` and building the shingles inside the
    lambda from the lambda VARIABLE (optimization r15, guide §1.2 "per-
    task work"). A higher-order function evaluates its argument once per
    row but re-evaluates free subexpressions in the lambda body on
    EVERY element — the previous form had ``toks`` (regexp normalize +
    split over the full text) free inside the per-shingle lambda, so a
    300-token document re-ran the regexp ~300 times. Interpreted HOFs
    get no codegen subexpression elimination, and CollapseProject can't
    help inside one Column. MEASURED on the sf0.1 corpus (noop sink,
    explode of the array): k=2 4.56s -> 0.53s, k=3 4.94s -> 0.51s (~9x);
    result arrays verified identical at k=2/3/5 including null/short
    texts."""
    toks = F.split(_normalize(col), " ")

    def shingles(t: Column) -> Column:
        idx = F.sequence(F.lit(1), F.size(t) - (k - 1))
        sh = F.transform(idx, lambda i: F.array_join(F.slice(t, i, k), " "))
        # sequence(1, n<1) counts DOWN, so guard short documents explicitly
        return F.when(F.size(t) >= k, sh).otherwise(
            F.array().cast("array<string>")
        )

    return F.element_at(F.transform(F.array(toks), shingles), 1)


def word_shingles(
    df: DataFrame, id_col: str, text_col: str, k: int = 3, distinct: bool = True
) -> DataFrame:
    """Word k-shingles per document → (id, shingle) exploded. Documents
    shorter than k tokens produce no rows. The scan is spread to full
    parallelism first — shingling is the CPU-heavy step.

    ``distinct=False`` skips array_distinct, which is interpreted and
    O(n²) per array — MEASURED as ~4× the cost of the whole MinHash
    pipeline at 50k docs. Set-semantics consumers (Jaccard counts) need
    it; idempotent-aggregate consumers (min-hash) must not pay for it."""
    sh = shingle_array(F.col(text_col), k)
    if distinct:
        sh = F.array_distinct(sh)
    # hash-spread on the doc id (not round-robin): skips the
    # sort-before-repartition of the text rows and lets the MinHash
    # signature aggregate's groupBy(id) reuse this exchange outright
    # (spread_compute key rationale; plan-verified: the signature
    # pipeline's id Exchange disappears)
    return spread_compute(df, key=id_col).select(
        F.col(id_col), F.explode(sh).alias("shingle")
    )


def minhash_signatures(
    df: DataFrame,
    id_col: str,
    text_col: str,
    k: int = 3,
    num_hashes: int = 12,
) -> DataFrame:
    """One row per document with columns ``mh_0..mh_{n-1}`` — the MinHash
    signature as ``num_hashes`` bigints.

    Hash family: seed ``j`` is the 8-hex-char chunk ``j % 4`` of
    ``md5(shingle || '#' || (j // 4))`` parsed as an unsigned 32-bit int,
    so 12 seeds cost only 3 md5 evaluations per shingle; fixed-width hex
    parses order-preservingly, and every engine agrees on integer min.
    Documents shorter than ``k`` tokens drop out.

    Scale shape: explode → aggregate, not per-row array transforms —
    Aggregate is a pipeline breaker, so shingling runs exactly once per
    document and each md5 exactly once per shingle (higher-order array
    functions are interpreted, and projection collapse would re-evaluate
    the chain once per signature column). The min buffers are primitive
    longs, so the agg plans as HashAggregate with map-side partials
    reducing each partition to one row per doc before the only shuffle."""
    if num_hashes % 4:
        raise ValueError("num_hashes must be a multiple of 4")
    groups = num_hashes // 4
    # min() is duplicate-insensitive — skip the O(n²) array_distinct
    sh = word_shingles(df, id_col, text_col, k, distinct=False)
    hashed = sh.select(
        F.col(id_col),
        *[
            F.md5(F.concat_ws("#", "shingle", F.lit(str(g)))).alias(f"hg_{g}")
            for g in range(groups)
        ],
    )
    return hashed.groupBy(id_col).agg(
        *[
            F.min(
                F.conv(
                    F.substring(F.col(f"hg_{j // 4}"), 8 * (j % 4) + 1, 8), 16, 10
                ).cast("bigint")
            ).alias(f"mh_{j}")
            for j in range(num_hashes)
        ]
    )


# Persisted band_sig encoding version (optimization r16, VERDICT r15 #8):
# 'bin32-v2' = each min-hash (u32 by the in-repo hash family) as its
# 4-byte big-endian image, concatenated (fixed-width ⇒ injective). Pre-r16 checkpoints
# ('csv-v1', comma-joined decimals — stamped implicitly when the sidecar
# lacks the field) are refused with a re-seed instruction by
# _validate_band_params: signatures from the two encodings can never
# band-match, in either direction.
_SIG_ENCODING = "bin32-v2"


def lsh_bands(
    signatures: DataFrame,
    id_col: str,
    num_hashes: int = 12,
    band_rows: int = 3,
) -> DataFrame:
    """(id, band, band_sig): concatenate each ``band_rows`` consecutive
    min-hashes into a band signature and unpivot — ``num_hashes/band_rows``
    small rows per document are all that ever reaches a shuffle. When
    ``band_rows`` does not divide ``num_hashes`` the trailing
    ``num_hashes % band_rows`` hashes form a narrower remainder band
    (review r14, the simhash_band_layout rule applied here): without it
    those hashes were computed and paid for in the signature aggregate
    but belonged to no band — pairs agreeing only there were never
    candidates, a silent recall loss.

    ``band_sig`` encoding (optimization r16, VERDICT r15 #8 / guide
    §2.3 "narrower types"): fixed-width BINARY — each min-hash as its
    4-byte big-endian image, concatenated — instead of the comma-joined
    decimal string (~27 B measured for 3 hashes at sf0.1). 12 B per sig
    through the hottest dedup shuffle key (groupBy(band, band_sig) in
    every LSH family member) and through the persisted band-checkpoint
    state. 4 bytes suffice BY CONSTRUCTION of the in-repo hash family:
    :func:`minhash_signatures` parses 8 hex chars, so every mh value is
    an unsigned 32-bit int — that precondition is part of this
    function's contract (it already shares the family's seed layout).
    The encoding is INJECTIVE (fixed width ⇒ concatenation decodes
    uniquely), so sig equality ≡ min-hash tuple equality — unlike the
    8-byte lossy hash considered and REJECTED in OPTIMIZATION_r16.md: a
    hash collision would merge two different buckets and alter
    candidate pairs at scale, a silent semantics change no test scale
    would catch. Sig comparisons only ever happen within one band, so
    the remainder band's narrower width is immaterial. Persisted
    checkpoints record the encoding in their parameter sidecar
    (``sig_encoding``) and refuse a mismatched reuse — see
    write_band_checkpoint."""
    n_bands = num_hashes // band_rows
    slices = [
        range(b * band_rows, (b + 1) * band_rows) for b in range(n_bands)
    ]
    if num_hashes % band_rows:
        slices.append(range(n_bands * band_rows, num_hashes))

    def _be4(c: Column) -> Column:
        # u32 bigint -> 4-byte big-endian binary: hex() of a value in
        # [0, 2^32) is at most 8 chars, lpad+unhex fixes the width.
        # All three run inside whole-stage codegen.
        return F.unhex(F.lpad(F.hex(c), 8, "0"))

    bands = F.array(
        *[
            F.struct(
                F.lit(b).alias("band"),
                F.concat(
                    *[_be4(F.col(f"mh_{j}")) for j in sl]
                ).alias("band_sig"),
            )
            for b, sl in enumerate(slices)
        ]
    )
    return signatures.select(
        F.col(id_col), F.explode(bands).alias("bs")
    ).select(F.col(id_col), F.col("bs.band"), F.col("bs.band_sig"))


def lsh_candidate_pairs(
    banded: DataFrame, id_col: str
) -> DataFrame:
    """Distinct candidate pairs (a < b) of docs sharing a
    (band, band_signature) bucket.

    Shape: groupBy bucket → sorted id list → row-local combination
    expansion — NOT a self-join, which would execute the whole upstream
    signature pipeline twice (once per join side) and is quadratic in the
    bucket via the join anyway. One shuffle on the bucket key; the
    collect_list state is bounded by bucket size (near-dup group), the
    same bound the join shape has."""
    buckets = (
        banded.groupBy("band", "band_sig")
        .agg(F.array_sort(F.collect_list(id_col)).alias("ids"))
        .where(F.size("ids") >= 2)
    )
    pairs = F.flatten(
        F.transform(
            "ids",
            lambda x, i: F.transform(
                F.slice(F.col("ids"), i + 2, F.size("ids")),
                lambda y: F.struct(x.alias("id_a"), y.alias("id_b")),
            ),
        )
    )
    return (
        buckets.select(F.explode(pairs).alias("p"))
        .select("p.id_a", "p.id_b")
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
    """Full MinHash+LSH near-dup candidate pipeline (signature → bands →
    bucket self-join; one shuffle end-to-end)."""
    sig = minhash_signatures(df, id_col, text_col, k, num_hashes)
    banded = lsh_bands(sig, id_col, num_hashes, band_rows)
    return lsh_candidate_pairs(banded, id_col)


def _hwm_dir(path: str) -> str:
    """Directory holding the checkpoint's committed-batch markers
    (underscore-prefixed: hidden from parquet partition discovery, like
    the parameter sidecars). Resolved through the filesystem seam
    (``io/fs.py``, VERDICT r14 #2) so marker I/O follows the table onto
    whatever store the checkpoint lives on."""
    from pyspark_bigdata_sars_cov_2_analysis_spark.io import fs as _fs

    f = _fs.for_path(path)
    return f.join(f.resolve(path), "_ingest_hwm")


def ingest_high_water_mark(path: str) -> int:
    """Highest batch id ever COMMITTED into the checkpoint at ``path``
    (-1 = none yet / pre-hwm checkpoint). Read from append-only O_EXCL
    marker files — one tiny empty file per committed batch, the same
    local-FS maintenance-op model as the staged-swap markers and jsonl
    snapshot versions (an object-store deployment swaps the O_EXCL
    create for a conditional put). Listing cost is one readdir over
    filenames; there is no torn-delete window because nothing is ever
    rewritten."""
    from pyspark_bigdata_sars_cov_2_analysis_spark.io import fs as _fs

    names = _fs.for_path(path).list_names(_hwm_dir(path))
    if not names:
        return -1
    ids = [int(n[1:]) for n in names if n.startswith("b") and n[1:].isdigit()]
    return max(ids, default=-1)


def _batch_fingerprint(batch_df: DataFrame, id_col: str, text_col: str) -> str:
    """Order- and partitioning-independent fingerprint of a batch's
    CONTENT (``count:sum-of-bounded-(id,text)-hashes``) — cheap enough
    for one tiny agg per micro-batch, discriminating enough to tell
    "the same batch replayed" from "a DIFFERENT batch reusing the same
    ids" (review r9: the ``== hwm`` allowance is only safe for the
    former). The hash covers id AND text (second review pass): ids
    alone miss the common restart shape where a new incarnation's
    sequential id assignment reproduces the exact id range with
    different documents. The per-row hash is bounded below 2^30 so the
    sum stays far from bigint overflow (ANSI would throw) at any
    plausible batch size. Format note: changing this fingerprint's
    definition invalidates ``== hwm`` replay verification across the
    code-version boundary — upgrade at a clean boundary (no crashed
    in-flight batch), the stamp-migration rule."""
    row = batch_df.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(
            F.pmod(
                F.xxhash64(F.col(id_col), F.col(text_col)),
                F.lit(1_000_000_007),
            )
        ).alias("h"),
    ).collect()[0]
    return f"{int(row['n'])}:{int(row['h'] or 0)}"


def _mark_batch_committed(
    path: str, batch_id: int, fingerprint: str = ""
) -> None:
    """Record ``batch_id`` as committed into the checkpoint at ``path``.
    Idempotent (a replay's duplicate marker is a no-op via EEXIST, and a
    legitimate replay carries the identical fingerprint anyway); written
    only AFTER the batch's output and state appends both succeeded, so a
    crash mid-batch leaves the mark absent and the replay passes the
    high-water-mark guard as ``batch_id == hwm + 1`` (or ``== hwm`` when
    the marker landed but the stream checkpoint commit did not —
    at-least-once replay, which the stamp-scoped exclusion makes
    idempotent). The marker FILE CONTENT is the committed batch's id-set
    fingerprint, published through the filesystem seam's
    first-writer-wins ``put_if_absent`` (``io/fs.py``): the FIRST
    publisher genuinely wins and a later racer's content is discarded
    WHOLE — never interleaved, never overwritten (the ADVICE r9
    takeover hazard and the review-r10 os.rename last-wins hazard are
    both closed by that contract; on LocalFS it is a uniquely-named
    stage + ``os.link``, on an object store a conditional PUT). A crash
    can leave a stale unique ``.tmp``, never a truncated marker, so an
    existing marker's content is trustworthy (empty = legacy
    pre-fingerprint marker, which the guard treats as unverifiable and
    allows); stale tmps from killed processes are ignored by the hwm
    reader and dropped by checkpoint compaction's marker copy.
    Concurrency contract: markers assume at most one LOGICAL writer per
    state path (the streaming engine serializes micro-batches); the
    claim protocol only makes a rogue second process fail-safe."""
    from pyspark_bigdata_sars_cov_2_analysis_spark.io import fs as _fs

    f = _fs.for_path(path)
    final = f.join(_hwm_dir(path), f"b{int(batch_id)}")
    if f.exists(final):
        return  # a replay's duplicate marker is a no-op
    f.put_if_absent(final, fingerprint)
    # False = a racer committed first: its content stands, ours drops


def _committed_fingerprint(path: str, batch_id: int) -> str | None:
    """Content of batch ``batch_id``'s commit marker (None = no marker,
    "" = legacy empty marker)."""
    from pyspark_bigdata_sars_cov_2_analysis_spark.io import fs as _fs

    f = _fs.for_path(path)
    try:
        return f.read_text(f.join(_hwm_dir(path), f"b{int(batch_id)}")).strip()
    except FileNotFoundError:
        return None


def _resolve_append_batch_id(
    mode: str, batch_id: int | None, what: str
) -> int:
    """Resolve the checkpoint writers' ``batch_id=None`` default: -1
    (seed) on an overwrite, REFUSED on an append (ADVICE r9) — a
    silently seed-stamped append sits outside the ingest replay
    exclusion, re-opening the torn-append silent-loss path the stamps
    exist to close. An explicit ``batch_id=-1`` append remains the
    operator's clean-boundary seed-extension assertion.

    Only ``overwrite`` (seed) and ``append`` (ingest) are meaningful
    checkpoint modes — anything else is refused here for BOTH writers
    (review r14: ``mode='ignore'`` made the data write a no-op but
    still re-stamped the parameter sidecar with the CALLER's values,
    relabeling state computed under different parameters — exactly the
    undetected zero-match hazard the sidecar exists to prevent)."""
    if mode not in ("overwrite", "append"):
        raise ValueError(
            f"{what} mode must be 'overwrite' (seed) or 'append' "
            f"(ingest), got {mode!r}"
        )
    if batch_id is not None:
        return int(batch_id)
    if mode == "append":
        raise ValueError(
            f"appending to a {what} requires an explicit batch_id: pass "
            "the writing batch's id (>= 0) so the ingest replay "
            "exclusion can scope a torn append to its writer, or "
            "batch_id=-1 to assert a clean-boundary seed extension "
            "(no crashed in-flight batch)"
        )
    return -1


def _guard_batch_id_monotonic(
    path: str, batch_id: int, what: str, fingerprint: str | None = None
) -> None:
    """Raise when ``batch_id`` has fallen BELOW the checkpoint's
    committed high-water mark — the batch-id-collision hazard of the
    stamp-scoped replay exclusion (ADVICE r9). ``foreachBatch`` epoch
    ids restart at 0 whenever the STREAMING checkpoint is deleted or
    relocated (or a second pipeline targets the same state path), and a
    colliding id would (a) exclude a PRIOR incarnation's legitimately
    committed same-id state rows from the corpus side — silently
    re-admitting their near-duplicates — and (b) clobber that
    incarnation's same-id output partition via the dynamic overwrite.
    ``batch_id == hwm`` is allowed ONLY as the legitimate
    replay-after-crash of the newest batch, which the exclusion makes
    idempotent — and since review r9 that claim is VERIFIED, not
    assumed: commit markers carry the committed batch's id-set
    fingerprint, and an ``== hwm`` arrival whose content fingerprint
    differs is a restarted incarnation whose FIRST epoch collides with
    the newest committed batch (the hwm==0 blind spot of the
    strictly-below check) and is refused. Legacy empty markers are
    unverifiable and stay allowed. Equal-or-higher ids never collide
    within one incarnation because its ids are monotonic."""
    hwm = ingest_high_water_mark(path)
    if int(batch_id) < hwm:
        raise ValueError(
            f"batch_id {batch_id} is below the {what}'s committed "
            f"high-water mark {hwm} at {path}: batch ids restarted (new "
            "streaming checkpoint over kept dedup state?) or a second "
            "pipeline shares this state path. A colliding id would "
            "exclude the prior incarnation's committed same-id state "
            "from the replay-exclusion filter and overwrite its output "
            "partition. Continue numbering above the mark (keep the "
            "original stream checkpoint), or seed a fresh state path "
            "for a genuinely new corpus run."
        )
    if int(batch_id) == hwm and fingerprint is not None:
        committed = _committed_fingerprint(path, hwm)
        if committed and committed != fingerprint:
            raise ValueError(
                f"batch_id {batch_id} equals the {what}'s committed "
                f"high-water mark at {path} but carries DIFFERENT "
                "content than the committed batch (fingerprint "
                f"{fingerprint} != {committed}): this is not a replay "
                "— batch ids restarted at the newest committed id (new "
                "streaming checkpoint over kept state, or a second "
                "pipeline on this path). Proceeding would exclude the "
                "committed batch's state from the replay filter and "
                "overwrite its output partition. Continue numbering "
                "above the mark or seed a fresh state path."
            )


def write_band_checkpoint(
    corpus_df: DataFrame,
    path: str,
    id_col: str,
    text_col: str,
    k: int = 3,
    num_hashes: int = 12,
    band_rows: int = 3,
    mode: str = "overwrite",
    batch_id: int | None = None,
    n_sig_buckets: int | None = None,
) -> None:
    """Persist a corpus's LSH band frame ``(id, band, band_sig,
    src_batch)`` — the between-batches dedup state an ingestion pipeline
    maintains (the at-rest twin of ``similarity.write_bucketed_layout``).
    Re-deriving bands from 100 TB of corpus text on EVERY incoming batch
    is the dominant repeated ingest cost; this checkpoint is a few
    bigints+a short string per (doc, band) — ~num_hashes/band_rows tiny
    rows per document — written once and reused by every subsequent
    ``incremental_neardup_pairs(corpus_bands=...)`` call. Partitioned by
    ``band`` so a band-parallel consumer prunes; append a new batch's own
    bands with ``mode='append'`` after it clears dedup.

    ``batch_id`` stamps every row with the WRITING micro-batch's id
    (``src_batch``; -1 = seed corpus, outside any batch). This is what
    scopes :func:`ingest_batch_idempotent`'s torn-append replay
    exclusion to exactly the rows the current batch's own crashed
    attempt wrote (ADVICE r8): an id re-delivered in a LATER batch —
    at-least-once upstream, a re-crawl in a different source file —
    keeps its earlier-batch bands on the corpus side and is correctly
    dropped as a duplicate, instead of anti-joining its own history
    away and being silently re-admitted. On ``mode='append'`` the
    batch_id is REQUIRED (ADVICE r9): defaulting an append to the seed
    stamp would place its rows outside the replay exclusion, so a torn
    manual append replayed through the ingest loop would self-match —
    the exact silent-loss bug the stamps close. Pass the writing
    batch's id (>= 0), or ``batch_id=-1`` explicitly to ASSERT a
    clean-boundary seed extension (no crashed in-flight batch, same
    operator assertion as :func:`migrate_band_checkpoint_stamps`).
    Stamped appends also record the id in the checkpoint's committed
    high-water mark (:func:`ingest_high_water_mark`) and refuse ids
    below it — a restarted-at-zero batch counter over kept state would
    otherwise collide with a PRIOR incarnation's stamps and re-admit
    duplicates through the exclusion filter.

    ``n_sig_buckets`` (VERDICT r8 #4, the chunk-checkpoint rule applied
    here): every band row also lands in a ``sigb =
    pmod(xxhash64(band_sig), n_sig_buckets)`` sub-partition, so the
    ingest probe can restrict the state scan to the signature buckets
    the incoming batch actually hashes into — a literal partition
    filter, pruning whole directories. The grid rides the sidecar
    (appends must match it); 0 = flat per-band layout. The default
    ``None`` resolves to 16 on a fresh write and to the EXISTING
    sidecar's grid on an append — so appending to a pre-bucketing
    (flat) or differently-sized checkpoint with defaults keeps working
    instead of raising a grid mismatch against a default the checkpoint
    never used; pass an explicit int to ASSERT the grid instead."""
    batch_id = _resolve_append_batch_id(mode, batch_id, "band checkpoint")
    batch_fp = None
    if mode == "append" and batch_id >= 0:
        batch_fp = _batch_fingerprint(corpus_df, id_col, text_col)
        _guard_batch_id_monotonic(
            path, batch_id, "band checkpoint", fingerprint=batch_fp
        )
    spark = corpus_df.sparkSession
    sidecar_exists = False
    if mode == "append":
        # ADVICE r6: an append must VALIDATE against the existing sidecar,
        # not re-stamp it — overwriting would relabel old band rows
        # (computed under the previous parameters) with the new ones,
        # recreating exactly the undetected zero-match state the sidecar
        # exists to prevent. ONE sidecar read serves the banding-params
        # check, the grid check, and the None-grid resolution (the first
        # cut launched three driver jobs here).
        try:
            params = read_band_params(spark, path)
        except Exception:
            params = None
        if params is not None:
            sidecar_exists = True
            _validate_band_params(path, params, k, num_hashes, band_rows)
            if n_sig_buckets is None:
                n_sig_buckets = params["n_sig_buckets"]
            elif params["n_sig_buckets"] != n_sig_buckets:
                raise ValueError(
                    f"band checkpoint at {path} is bucketed with "
                    f"n_sig_buckets={params['n_sig_buckets']}, caller "
                    f"expects {n_sig_buckets}: appended rows would land "
                    "outside the probe's partition grid"
                )
        else:
            # ADVICE r8 (chunk twin applied here too): data files with no
            # sidecar = a writer crashed between data and sidecar writes;
            # appending would re-stamp the caller's params over rows
            # possibly banded under different ones — refuse instead
            try:
                has_data = bool(spark.read.parquet(path).columns)
            except Exception:
                has_data = False
            if has_data:
                raise ValueError(
                    f"band checkpoint at {path} has data files but no "
                    "parameter sidecar (torn earlier write?): refusing to "
                    "append — existing rows may use different band "
                    "parameters. Re-seed with mode='overwrite'."
                )
    if n_sig_buckets is None:
        n_sig_buckets = 16
    bands = lsh_bands(
        minhash_signatures(corpus_df, id_col, text_col, k, num_hashes),
        id_col, num_hashes, band_rows,
    ).withColumn("src_batch", F.lit(int(batch_id)))
    if n_sig_buckets:
        # cluster on the partition grid before the write — one file per
        # touched (band, sigb) cell instead of one per (task, cell)
        bands = bands.withColumn(
            "sigb", _lh_bucket(F.col("band_sig"), n_sig_buckets)
        )
        bands.repartition("band", "sigb").write.mode(mode).partitionBy(
            "band", "sigb"
        ).parquet(path)
    else:
        bands.write.mode(mode).partitionBy("band").parquet(path)
    # parameter sidecar in an underscore-prefixed subdir (hidden from
    # parquet partition discovery): band signatures are only comparable
    # between sides computed with the SAME (k, num_hashes, band_rows) —
    # a mismatched reuse would silently return zero pairs, appending a
    # duplicate-laden batch to the corpus. On an append with a validated
    # sidecar already in place the rewrite is SKIPPED: the values are
    # guaranteed identical, and the overwrite (delete-then-commit) would
    # re-open the torn-sidecar crash window on every micro-batch that
    # the refusal above exists to catch.
    if not sidecar_exists:
        # local_frame, not createDataFrame: this write runs once per
        # checkpoint seed and its Python-RDD form cost ~5 s of Python
        # worker spawn per write job (r15, functions/localrel.py)
        local_frame(
            spark,
            [(k, num_hashes, band_rows, n_sig_buckets, _SIG_ENCODING)],
            "k int, num_hashes int, band_rows int, n_sig_buckets int, "
            "sig_encoding string",
        ).coalesce(1).write.mode("overwrite").parquet(f"{path}/_band_params")
    if mode == "append" and batch_id >= 0:
        _mark_batch_committed(path, batch_id, batch_fp or "")


# (sidecar-path, mtime) -> params. A checkpoint's parameter sidecar is
# IMMUTABLE once written (appends skip the rewrite by documented
# contract; only a full re-seed replaces the sidecar directory, which
# changes its mtime and invalidates the entry), so the per-micro-batch
# sidecar read in the ingest loops — one Spark job each, ~0.3 s of pure
# fixed cost at local[32] — can be answered from the driver after the
# first read (optimization r15, guide §5 "no driver round-trips in hot
# loops"). This memoizes CONFIG METADATA of a state path, never query
# results: every bench/oracle invocation builds its checkpoints in a
# fresh mkdtemp dir, so nothing carries across runs.
_PARAMS_MEMO: dict[str, tuple[float, dict]] = {}


def _memoized_sidecar(spark, sidecar: str, loader):
    from pyspark_bigdata_sars_cov_2_analysis_spark.io import fs as _fs

    try:
        mt = _fs.for_path(sidecar).mtime(sidecar)
    except Exception:
        mt = None
    if mt is not None:
        hit = _PARAMS_MEMO.get(sidecar)
        if hit is not None and hit[0] == mt:
            return dict(hit[1])
    params = loader()
    if mt is not None:
        _PARAMS_MEMO[sidecar] = (mt, dict(params))
    return params


def read_band_params(spark, path: str) -> dict:
    """The band checkpoint's parameter sidecar as a dict; pre-bucketing
    sidecars read as n_sig_buckets=0 (flat per-band layout). Memoized
    per (path, sidecar mtime) — see ``_PARAMS_MEMO``."""

    def _load() -> dict:
        got = (
            spark.read.parquet(f"{path}/_band_params").collect()[0].asDict()
        )
        got["n_sig_buckets"] = int(got.get("n_sig_buckets", 0) or 0)
        # pre-r16 sidecars predate the encoding field: they hold the
        # comma-joined decimal band_sig (format migration, VERDICT r15 #8)
        got["sig_encoding"] = got.get("sig_encoding") or "csv-v1"
        return got

    return _memoized_sidecar(spark, f"{path}/_band_params", _load)


def _validate_band_params(
    path: str, params: dict, k: int, num_hashes: int, band_rows: int
) -> None:
    """Raise unless the caller's banding parameters match the sidecar's —
    shared by the reader and the append path of the writer so both fail
    with the same message from ONE sidecar read. Also validated: the
    band_sig ENCODING (optimization r16 format migration, VERDICT r15
    #8) — a checkpoint persisted under the comma-joined decimal
    encoding ('csv-v1', the pre-r16 default stamped onto any sidecar
    missing the field) can never band-match signatures computed by this
    code ('bin32-v2', fixed-width binary), in EITHER direction; the
    refusal names the re-seed migration instead of silently admitting
    every duplicate."""
    want = {"k": k, "num_hashes": num_hashes, "band_rows": band_rows}
    stored = {kk: params[kk] for kk in want}
    if stored != want:
        raise ValueError(
            f"band checkpoint at {path} was written with {stored}, "
            f"caller expects {want}: signatures would never match"
        )
    enc = params.get("sig_encoding") or "csv-v1"
    if enc != _SIG_ENCODING:
        raise ValueError(
            f"band checkpoint at {path} stores band_sig as {enc!r}, this "
            f"engine computes {_SIG_ENCODING!r}: cross-side signatures "
            "would never match and every batch would silently dedupe "
            "against nothing. Migrate by re-seeding the checkpoint "
            "(write_band_checkpoint(mode='overwrite') from the corpus) "
            "at a clean batch boundary."
        )


def read_band_checkpoint(
    spark,
    path: str,
    id_col: str,
    k: int = 3,
    num_hashes: int = 12,
    band_rows: int = 3,
    sig_buckets: list[int] | None = None,
    params: dict | None = None,
) -> DataFrame:
    """Load a band checkpoint written by :func:`write_band_checkpoint`,
    normalized to the ``(id_col, band, band_sig, src_batch)`` shape
    ``incremental_neardup_pairs`` / :func:`ingest_batch_idempotent`
    expect (partition discovery re-types ``band`` — pin it back to int;
    pre-src_batch checkpoints read as src_batch=-1, i.e. seed rows).
    The ``k``/``num_hashes``/``band_rows`` the CALLER will band the
    incoming batch with are validated against the checkpoint's parameter
    sidecar — a mismatch means no band signature could ever match
    cross-side and every batch would silently dedupe against nothing.

    ``sig_buckets``: on a sub-bucketed checkpoint, restrict the scan to
    these ``sigb`` partition values (literal partition filter — prunes
    unmatched state directories; the VERDICT r8 #4 path). Ignored on a
    flat layout.

    ``params``: a sidecar dict the caller already read via
    :func:`read_band_params` — skips the second sidecar collect job
    (one driver round-trip per micro-batch in the ingest loop)."""
    if params is None:
        params = read_band_params(spark, path)
    _validate_band_params(path, params, k, num_hashes, band_rows)
    # mergeSchema: a checkpoint upgraded mid-life can hold pre-src_batch
    # files next to stamped ones; without merging, Spark takes one
    # arbitrary footer's schema and either NULLs the legacy rows (the
    # != filter then drops the whole legacy corpus from the probe) or
    # hides the stamps entirely (a torn append would self-match). With
    # merging + coalesce, legacy rows read as seed rows (-1), stamped
    # rows keep their writer id. SCOPE of that guarantee: it keeps the
    # legacy CORPUS correct, but it cannot re-attribute a legacy TORN
    # append — unstamped rows a pre-stamp build's crashed batch wrote
    # look identical to legacy seed rows, so a replay of that same batch
    # under this code would still self-match them (the pre-stamp bug, in
    # its one-time upgrade window). Closing it needs the operator:
    # run :func:`migrate_band_checkpoint_stamps` at a CLEAN boundary
    # (no crashed in-flight batch) before the first post-upgrade ingest.
    df = spark.read.option("mergeSchema", "true").parquet(path)
    if params["n_sig_buckets"] and sig_buckets is not None:
        df = df.where(F.col("sigb").isin([int(b) for b in sig_buckets]))
    src = (
        F.coalesce(F.col("src_batch").cast("int"), F.lit(-1))
        if "src_batch" in df.columns
        else F.lit(-1)
    )
    return df.select(
        F.col(id_col), F.col("band").cast("int").alias("band"), "band_sig",
        src.alias("src_batch"),
    )


def _migrate_checkpoint_stamps(
    spark, path: str, part_cols_fn, sidecar: str
) -> dict:
    """Shared body of the two stamp migrations: rewrite a checkpoint so
    every data row carries an EXPLICIT ``src_batch`` (existing stamps
    preserved, unstamped legacy rows stamped -1), keeping the partition
    layout and the parameter sidecar, via the count-verified staged swap
    the parquet maintenance ops use (crash mid-swap → marker →
    :func:`io.writers.recover_staged_swap`).

    ``part_cols_fn`` is a THUNK (it reads the parameter sidecar) and is
    called only after ``recover_staged_swap`` — a crash between the
    swap's two renames leaves no table at ``path``, so an eager sidecar
    read in the caller would raise before recovery could run and the
    documented rerun-to-self-heal path would be unreachable."""
    import os as _os
    import shutil as _shutil

    from pyspark_bigdata_sars_cov_2_analysis_spark.io.writers import (
        _swap_in,
        recover_staged_swap,
    )

    recover_staged_swap(path)
    part_cols = part_cols_fn()
    df = spark.read.option("mergeSchema", "true").parquet(path)
    had_stamp_col = "src_batch" in df.columns
    src = (
        F.coalesce(F.col("src_batch").cast("int"), F.lit(-1))
        if had_stamp_col
        else F.lit(-1).cast("int")
    )
    out = df.withColumn("src_batch", src)
    # ONE pre-write scan for both counts (total + seed) — the rewrite
    # itself is a second scan, and a 100 TB state should not pay a third
    counts = out.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum((F.col("src_batch") == -1).cast("long")).alias("seed"),
    ).collect()[0]
    want, seed = int(counts["n"]), int(counts["seed"] or 0)
    tmp = path.rstrip("/") + ".migrating"
    _shutil.rmtree(tmp, ignore_errors=True)
    writer = (
        out.repartition(*part_cols).write.partitionBy(*part_cols)
        if part_cols
        else out.write
    )
    writer.parquet(tmp)
    # the parameter sidecar lives INSIDE the checkpoint dir (underscore
    # prefix hides it from partition discovery) — carry it into the
    # staged copy or the swapped-in checkpoint would read as sidecar-less
    # (torn) and refuse every append
    _shutil.copytree(
        _os.path.join(path, sidecar), _os.path.join(tmp, sidecar)
    )
    # the committed-batch markers too (review r9): losing _ingest_hwm in
    # the swap silently resets the high-water mark to -1, DISARMING the
    # batch-id collision guard — a restarted-at-zero counter over the
    # migrated state would then pass the guard, exclude a prior
    # incarnation's committed rows from the replay filter, and clobber
    # its output partition (the exact hazard the markers exist to refuse)
    hwm_src = _hwm_dir(path)
    if _os.path.isdir(hwm_src):
        _shutil.copytree(
            hwm_src, _hwm_dir(tmp),
            ignore=_shutil.ignore_patterns("*.tmp"),
        )
    got = spark.read.parquet(tmp).count()
    if got != want:
        raise RuntimeError(
            f"stamp migration row-count mismatch ({got} != {want}); "
            f"staged output left at {tmp}, original untouched"
        )
    _swap_in(path, tmp, ".pre-stamp-migration")
    return {"rows": want, "seed_rows": seed, "had_stamp_col": had_stamp_col}


def migrate_band_checkpoint_stamps(spark, path: str) -> dict:
    """ONE-TIME upgrade migration for band checkpoints written (fully or
    partially) by pre-``src_batch`` builds: rewrites the state so every
    row carries an explicit stamp — existing stamps preserved, unstamped
    legacy rows stamped -1 (seed) — and keeps the partition grid and
    parameter sidecar.

    Why it exists: :func:`read_band_checkpoint`'s mergeSchema+coalesce
    keeps a legacy CORPUS correct, but an unstamped row written by a
    pre-stamp build's crashed (torn) append is indistinguishable from a
    legacy seed row — a replay of that same batch under stamped code
    would self-match it, the pre-stamp silent-loss bug in its one-time
    upgrade window. No row-level rule can tell those two apart, so the
    operator must assert the distinction: run this at a CLEAN boundary
    (no crashed in-flight batch — e.g. after the last pre-upgrade batch
    completed, before the first post-upgrade one starts), at which point
    stamping everything unstamped as seed is exactly right. After the
    migration every future torn append is stamped by the writing batch
    and the replay exclusion is airtight again. Idempotent; returns
    ``{rows, seed_rows, had_stamp_col}``."""
    return _migrate_checkpoint_stamps(
        spark,
        path,
        lambda: (
            ["band", "sigb"]
            if read_band_params(spark, path)["n_sig_buckets"]
            else ["band"]
        ),
        "_band_params",
    )


def migrate_chunk_checkpoint_stamps(spark, path: str) -> dict:
    """:func:`migrate_band_checkpoint_stamps` for chunk checkpoints —
    same one-time upgrade window, same clean-boundary precondition,
    same semantics."""
    return _migrate_checkpoint_stamps(
        spark,
        path,
        lambda: (
            ["lhb"]
            if read_chunk_params(spark, path)["n_buckets"]
            else []
        ),
        "_chunk_params",
    )


def _compact_checkpoint(spark, path: str, sidecar: str, part_cols_fn) -> dict:
    """Shared body of the two checkpoint compactions (VERDICT r9 #2):
    rewrite every bucket directory of a band/chunk dedup checkpoint to
    ONE file, keeping the partition grid, the parameter sidecar, and the
    committed-batch high-water markers, via the count-verified staged
    swap the other parquet maintenance ops use (crash mid-swap → marker
    → :func:`io.writers.recover_staged_swap`).

    Why it exists: each ingest micro-batch appends one file per touched
    bucket, so after N batches a bucket directory holds up to N small
    files and the pruned per-batch probe — whose whole point is opening
    few files — degrades into a small-files scan. Plain
    :func:`io.writers.compact_parquet` cannot run here: it flattens the
    Hive partition layout the literal-filter pruning depends on, and it
    knows nothing of the sidecar or the ``_ingest_hwm`` markers, whose
    loss would re-arm the torn-sidecar refusal and DISARM the batch-id
    collision guard respectively.

    Clean-boundary refusal: rows stamped ABOVE the committed high-water
    mark belong to an in-flight (or crashed and not-yet-replayed) batch
    — the same uncommitted state the hwm fingerprint guard refuses to
    re-admit. Compacting concurrently with that batch's writer would
    read a snapshot, then swap away whatever the writer appended after
    the read — silent state loss. So compaction refuses until the batch
    either commits (marker lands) or is replayed to completion, exactly
    the stamp-migration precondition. Rows AT or below the hwm compact
    freely; their ``src_batch`` stamps are preserved verbatim, so the
    replay exclusion and re-delivery semantics are unchanged (proven by
    running the ingest-equivalence tests over a mid-sequence-compacted
    checkpoint). Legacy unstamped rows (pre-``src_batch`` files under
    mergeSchema) rewrite as explicit NULL stamps, which the readers
    coalesce to -1 — observably identical to the un-compacted mixed
    layout, and NOT a stamp migration (a legacy torn append stays in
    its documented pre-migration limbo; run the migration first if that
    window applies).

    ``part_cols_fn`` is a thunk (it reads the parameter sidecar) called
    only after ``recover_staged_swap`` — same rationale as the stamp
    migration. Idempotent; returns ``{rows, files_before, files_after,
    hwm}``."""
    import os as _os
    import shutil as _shutil

    from pyspark_bigdata_sars_cov_2_analysis_spark.io import (
        writers as _writers,
    )
    from pyspark_bigdata_sars_cov_2_analysis_spark.io.writers import (
        _swap_in,
        recover_staged_swap,
    )

    recover_staged_swap(path)
    part_cols = part_cols_fn()
    df = spark.read.option("mergeSchema", "true").parquet(path)
    files_before = len(df.inputFiles())
    hwm = ingest_high_water_mark(path)
    if "src_batch" in df.columns:
        stats = df.agg(
            F.count(F.lit(1)).alias("n"),
            F.max(
                F.coalesce(F.col("src_batch").cast("int"), F.lit(-1))
            ).alias("mx"),
        ).collect()[0]
        want = int(stats["n"])
        max_src = int(stats["mx"]) if stats["mx"] is not None else -1
    else:
        want, max_src = df.count(), -1
    if max_src > hwm:
        raise ValueError(
            f"checkpoint at {path} holds rows stamped src_batch="
            f"{max_src}, above the committed high-water mark {hwm}: an "
            "ingest batch is in flight (or crashed and not yet "
            "replayed). Compaction would swap away anything that batch "
            "appends after the snapshot read — let it commit or replay "
            "to completion first (the stamp-migration clean-boundary "
            "rule)."
        )
    tmp = path.rstrip("/") + ".compacting"
    _shutil.rmtree(tmp, ignore_errors=True)
    if part_cols:
        # repartition ON the grid: each partition value combo lands in
        # exactly one task, so every bucket directory gets exactly one
        # output file — the post-compact invariant the tests pin
        (
            df.repartition(*part_cols)
            .write.partitionBy(*part_cols)
            .parquet(tmp)
        )
    else:
        df.coalesce(1).write.parquet(tmp)
    # carry the parameter sidecar and the committed-batch markers into
    # the staged copy — losing the former re-arms the torn-sidecar
    # append refusal, losing the latter resets the hwm to -1 and disarms
    # the batch-id collision guard (the migrate_* rules)
    _shutil.copytree(
        _os.path.join(path, sidecar), _os.path.join(tmp, sidecar)
    )
    hwm_src = _hwm_dir(path)
    if _os.path.isdir(hwm_src):
        # stale .tmp stages from killed marker publishers are dead
        # weight — carry only the committed markers forward
        _shutil.copytree(
            hwm_src, _hwm_dir(tmp),
            ignore=_shutil.ignore_patterns("*.tmp"),
        )
    staged = spark.read.parquet(tmp)
    staged_files = staged.inputFiles()
    # row-count cross-check from the staged files' parquet footers —
    # the same verification, minus a full Spark re-scan of the staged
    # copy (optimization r15, the write_parquet_snapshot footer rule)
    got = _writers._footer_row_count(sorted(staged_files))
    if got != want:
        raise RuntimeError(
            f"checkpoint compaction row-count mismatch ({got} != {want});"
            f" staged output left at {tmp}, original untouched"
        )
    files_after = len(staged_files)
    _swap_in(path, tmp, ".pre-compaction")
    return {
        "rows": want,
        "files_before": files_before,
        "files_after": files_after,
        "hwm": hwm,
    }


def compact_band_checkpoint(spark, path: str) -> dict:
    """Compact a band checkpoint's accumulated per-batch append files to
    one file per ``(band, sigb)`` bucket directory (one per ``band`` on
    a flat layout), preserving grid, sidecar, hwm markers, and every
    ``src_batch`` stamp — see :func:`_compact_checkpoint` for the
    clean-boundary refusal and crash-recovery contract. Run it on the
    maintenance cadence that keeps per-bucket file counts O(1) between
    compactions (e.g. every N batches); the probe's literal-filter
    pruning then opens ~1 file per matched bucket instead of N."""
    return _compact_checkpoint(
        spark,
        path,
        "_band_params",
        lambda: (
            ["band", "sigb"]
            if read_band_params(spark, path)["n_sig_buckets"]
            else ["band"]
        ),
    )


def compact_chunk_checkpoint(spark, path: str) -> dict:
    """:func:`compact_band_checkpoint` for chunk checkpoints — one file
    per ``lhb`` bucket directory (a single file on a flat layout), same
    preservation and refusal contract."""
    return _compact_checkpoint(
        spark,
        path,
        "_chunk_params",
        lambda: (
            ["lhb"]
            if read_chunk_params(spark, path)["n_buckets"]
            else []
        ),
    )


def streaming_neardup_ingest(
    spark,
    source_dir: str,
    schema: str,
    band_path: str,
    out_path: str,
    stream_checkpoint: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 3,
    num_hashes: int = 12,
    band_rows: int = 3,
    max_files_per_trigger: int = 1,
    compact_every: int = 0,
):
    """Streaming twin of the d11 band checkpoint (VERDICT r6 #8): an
    ``availableNow`` ingestion loop where each micro-batch of documents
    (1) dedups against the PERSISTED band checkpoint — the corpus text
    is never scanned, same plan as ``incremental_neardup_pairs(
    corpus_bands=...)``; (2) appends its surviving docs to ``out_path``;
    (3) appends its own bands to the checkpoint (``mode='append'``, so
    the parameter sidecar is validated, never re-stamped) — making later
    batches dedup against everything earlier ones admitted.

    Returns a ``DataStreamWriter``; callers ``.start()`` it. Restart
    semantics: the STREAMING checkpoint (``stream_checkpoint``) records
    which source files each micro-batch consumed, so a restart over the
    same source re-processes nothing — the restart-idempotence the
    exactly-once test proves. The standard ``foreachBatch`` gap (a crash
    INSIDE a micro-batch replays the whole batch on restart) is closed
    for the OUTPUT side by :func:`ingest_batch_idempotent`: survivors go
    to a per-``batch_id`` partition via dynamic partition overwrite, so
    a replay overwrites its own partition instead of appending a second
    copy (replay-idempotence tested by running one batch twice). Band
    rows still append — a replay can duplicate a band row, which is
    semantically harmless (pairs are ``distinct()``-ed before the anti
    join) and costs only bounded storage.

    The band checkpoint must already exist (seed it once from the
    initial corpus with :func:`write_band_checkpoint`) — that's the
    production flow, and it pins the (k, num_hashes, band_rows)
    parameters every batch must use.

    ``compact_every`` (r10): run :func:`compact_band_checkpoint` after
    every Nth committed batch (ids N-1, 2N-1, …), folding the state
    maintenance into the loop so per-bucket file counts stay O(N)
    between compactions instead of growing one file per batch forever.
    The compaction runs AFTER the batch's commit marker lands, so its
    in-flight refusal can never fire here, and it is itself crash-safe
    (marker-protected swap, self-healing on the next run); a compaction
    crash before the swap completes leaves the checkpoint valid and the
    stream checkpoint un-advanced for nothing — the batch was already
    committed. 0 disables (the default — small deployments may prefer
    an external maintenance window)."""
    # fail fast (and pin parameters) before any micro-batch runs
    read_band_checkpoint(
        spark, band_path, id_col,
        k=k, num_hashes=num_hashes, band_rows=band_rows,
    )

    def _process(batch_df: DataFrame, batch_id: int) -> None:
        ingest_batch_idempotent(
            batch_df, batch_id, band_path, out_path,
            id_col=id_col, text_col=text_col,
            k=k, num_hashes=num_hashes, band_rows=band_rows,
        )
        if compact_every and (int(batch_id) + 1) % compact_every == 0:
            compact_band_checkpoint(spark, band_path)

    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(source_dir)
    )
    return (
        stream.writeStream.foreachBatch(_process)
        .option("checkpointLocation", stream_checkpoint)
        .trigger(availableNow=True)
    )


def ingest_batch_idempotent(
    batch_df: DataFrame,
    batch_id: int,
    band_path: str,
    out_path: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 3,
    num_hashes: int = 12,
    band_rows: int = 3,
) -> None:
    """One micro-batch of the streaming dedup ingest, REPLAY-SAFE: dedup
    ``batch_df`` against the persisted band checkpoint, publish survivors,
    append the survivors' bands.

    The hardening (closes the foreachBatch mid-batch-crash caveat the
    first cut documented): survivors land in an ``ingest_batch=<id>``
    partition via DYNAMIC partition overwrite, so replaying a crashed
    batch — which ``foreachBatch`` does with the SAME batch_id —
    overwrites that batch's own partition instead of appending a second
    copy. Output duplication, the actual correctness hazard, is thereby
    impossible; earlier batches' partitions are untouched by the scoped
    overwrite. Band rows still append (a replay can leave a duplicate
    band row), which is benign by construction: candidate pairs are
    ``distinct()``-ed before the anti join, so a duplicated band can
    only re-derive the same pair, never re-admit a document — the cost
    is bounded storage, not wrong answers.

    Replay determinism (ADVICE r7 #1, re-scoped per ADVICE r8): the
    corpus side EXCLUDES every band row STAMPED with the current
    ``batch_id`` (``src_batch == batch_id``, a row-local filter — no
    join at all) — a replay therefore sees exactly the pre-batch corpus
    state and recomputes the identical survivor set REGARDLESS of how
    much of the previous attempt's band append landed. Without this, a
    torn append (crash mid job-commit) would let a replayed survivor
    match its own — or a sibling survivor's — partially-landed bands and
    the scoped dynamic overwrite would rewrite the partition without
    those docs: permanent silent loss. A plain ``new_id != corpus_id``
    self-pair filter would NOT suffice: two intra-batch survivors that
    near-dup each other would still cross-match each other's landed
    bands and both drop. Scoping the exclusion by the WRITER's batch id
    rather than by the batch's doc ids (the r8 form) also keeps
    at-least-once upstreams honest: an id re-delivered in a LATER batch
    still sees its own earlier-batch bands on the corpus side and is
    dropped as the duplicate it is, instead of having its history
    anti-joined away and being silently re-admitted. Verified by tests
    that replay the same (batch_df, batch_id) over full AND torn band
    appends, and by a cross-batch re-delivery test. Upgrade caveat: a
    checkpoint holding UNSTAMPED rows from a pre-stamp build must be
    migrated at a clean boundary first
    (:func:`migrate_band_checkpoint_stamps`) — a legacy torn append is
    indistinguishable from legacy seed rows and sits outside this
    exclusion's reach.

    Batch-id collision guard (ADVICE r9): the stamp-scoped exclusion is
    only sound while batch ids never RECUR below the checkpoint's
    committed high-water mark — ``foreachBatch`` epochs restart at 0
    under a new streaming checkpoint, and a colliding id would both
    exclude a prior incarnation's committed same-id bands (silently
    re-admitting their near-duplicates) and clobber its same-id output
    partition. Each committed batch therefore drops an O_EXCL marker
    (:func:`ingest_high_water_mark`) and ``batch_id < hwm`` raises
    loudly; ``== hwm`` stays allowed as the legitimate newest-batch
    replay. Verified by an incarnation-restart test.

    Degenerate text: a NULL-text doc has no shingles, is never a dup
    candidate, and PASSES THROUGH to the output — unlike the chunk
    ingest twin, where NULL text drops the doc (SQL NULL propagation;
    see :func:`chunk_dedup_keep_first`)."""
    if int(batch_id) < 0:
        raise ValueError(
            f"batch_id must be >= 0 (got {batch_id}): -1 is reserved for "
            "seed-corpus checkpoint rows and would exclude them"
        )
    batch_fp = _batch_fingerprint(batch_df, id_col, text_col)
    _guard_batch_id_monotonic(
        band_path, batch_id, "band checkpoint", fingerprint=batch_fp
    )
    s = batch_df.sparkSession
    # The batch's bands feed THREE consumers — the sigb pruning probe,
    # the pair expansion, and the survivors' checkpoint append — so they
    # are banded ONCE and cached for the batch scope (micro-batch-sized
    # (id, band, band_sig) rows). The first cut re-minhashed the batch
    # per consumer: three full shingle+minhash passes per micro-batch,
    # measured as the bulk of d20's 28-42s at sf0.1 (~13s after).
    params = read_band_params(s, band_path)
    n_sig_buckets = params["n_sig_buckets"]
    batch_bands = lsh_bands(
        minhash_signatures(batch_df, id_col, text_col, k, num_hashes),
        id_col, num_hashes, band_rows,
    ).cache()
    # dup_ids is assigned mid-try; pre-initialize so the finally can
    # test `is not None` instead of probing locals() by string (the
    # chunk twin's `kept = None` pattern — a rename would silently turn
    # a locals() probe into a no-op and leak the cached id set)
    dup_ids = None
    try:
        # state pruning (VERDICT r8 #4): collect the batch's own
        # distinct sigb bucket ids — bounded by the sidecar's
        # n_sig_buckets, the same bounded-params class as the 1-row
        # bounds sidecars — and scan the checkpoint through that literal
        # partition filter. A batch spanning every bucket degrades to
        # the full scan.
        sig_buckets = None
        if n_sig_buckets:
            sig_buckets = sorted(
                r.sigb
                for r in batch_bands.select(
                    _lh_bucket(F.col("band_sig"), n_sig_buckets).alias(
                        "sigb"
                    )
                )
                .distinct()
                .collect()
            )
        corpus_bands = read_band_checkpoint(
            s, band_path, id_col,
            k=k, num_hashes=num_hashes, band_rows=band_rows,
            sig_buckets=sig_buckets, params=params,
        )
        # drop ONLY the current batch's own (possibly torn) prior append
        # from the corpus side: replays must dedup against the pre-batch
        # state
        corpus_bands = corpus_bands.where(
            F.col("src_batch") != int(batch_id)
        ).drop("src_batch")
        pairs = incremental_neardup_pairs(
            batch_df, None, id_col, text_col,
            k=k, num_hashes=num_hashes, band_rows=band_rows,
            corpus_bands=corpus_bands, new_bands=batch_bands,
        )
        # dup_ids feeds TWO actions through `clean` (the output write and
        # the band-append's semi-join) — cache the tiny id set so the
        # expensive probe chain behind it (state scan + bucket expansion)
        # runs once per batch, not once per consumer
        dup_ids = pairs.select(F.col("new_id").alias(id_col)).distinct(
        ).cache()
        clean = batch_df.join(dup_ids, on=id_col, how="left_anti")
        (
            clean.withColumn("ingest_batch", F.lit(int(batch_id)))
            .write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("ingest_batch")
            .parquet(out_path)
        )
        # append the SURVIVORS' bands from the already-computed batch
        # bands (semi-join on the admitted ids — never a re-minhash),
        # stamped with this batch's id and folded into the sigb grid
        # READ FROM the sidecar (validated, never re-stamped; the
        # sidecar file itself is untouched by appends here)
        add = batch_bands.join(
            F.broadcast(clean.select(id_col)), on=id_col, how="left_semi"
        ).withColumn("src_batch", F.lit(int(batch_id)))
        if n_sig_buckets:
            add = add.withColumn(
                "sigb", _lh_bucket(F.col("band_sig"), n_sig_buckets)
            )
            add.repartition("band", "sigb").write.mode(
                "append"
            ).partitionBy("band", "sigb").parquet(band_path)
        else:
            add.write.mode("append").partitionBy("band").parquet(band_path)
        # commit marker LAST: a crash anywhere above leaves it absent
        # and the replay re-enters as batch_id >= hwm
        _mark_batch_committed(band_path, batch_id, batch_fp)
    finally:
        batch_bands.unpersist()
        if dup_ids is not None:
            dup_ids.unpersist()


def incremental_neardup_pairs(
    new_df: DataFrame,
    corpus_df: DataFrame | None,
    id_col: str,
    text_col: str,
    k: int = 3,
    num_hashes: int = 12,
    band_rows: int = 3,
    corpus_bands: DataFrame | None = None,
    new_bands: DataFrame | None = None,
) -> DataFrame:
    """Near-dup candidates of an INCOMING batch against an EXISTING
    corpus — the dedup an ingestion pipeline runs on every new crawl
    slice before appending it. Returns distinct (new_id, corpus_id)
    pairs sharing ≥1 LSH band bucket.

    The corpus side comes from either ``corpus_df`` (raw text — bands are
    recomputed, self-contained form) or ``corpus_bands`` (a persisted
    ``(id, band, band_sig)`` frame from :func:`write_band_checkpoint` —
    the production form: batch N+1 never re-tokenizes or even scans the
    corpus text, plan-shape-tested in tests/test_plan_shape.py).

    Scale shape: the new batch runs the one-shuffle signature→bands
    pipeline, then one union reaches a single bucket-grouped expansion
    that emits ONLY cross-side pairs: the row-local nested transform
    iterates new-members × corpus-members, so intra-corpus pairs — the
    quadratic bulk of an established corpus's buckets, already found by
    prior batches — are never materialized, not even pre-filter. Cost per
    bucket is |new ∩ bucket| · |corpus ∩ bucket|, which a small incoming
    batch keeps near-linear in corpus size."""
    if (corpus_df is None) == (corpus_bands is None):
        raise ValueError("pass exactly one of corpus_df / corpus_bands")
    # ``new_bands``: an already-banded (id, band, band_sig) frame for the
    # NEW side — :func:`ingest_batch_idempotent` bands its batch once and
    # shares the frame between the pruning probe, this expansion, and
    # the checkpoint append, instead of re-minhashing per consumer
    bn = (
        new_bands.select(F.col(id_col), "band", "band_sig")
        if new_bands is not None
        else lsh_bands(
            minhash_signatures(new_df, id_col, text_col, k, num_hashes),
            id_col, num_hashes, band_rows,
        )
    ).withColumn("side", F.lit(1))
    if corpus_bands is None:
        corpus_bands = lsh_bands(
            minhash_signatures(corpus_df, id_col, text_col, k, num_hashes),
            id_col, num_hashes, band_rows,
        )
    bc = corpus_bands.select(F.col(id_col), "band", "band_sig").withColumn(
        "side", F.lit(0)
    )
    buckets = (
        bn.unionByName(bc)
        .groupBy("band", "band_sig")
        .agg(
            F.array_sort(
                F.collect_list(F.struct("side", F.col(id_col).alias("id")))
            ).alias("ms")
        )
    )
    news = F.filter(F.col("ms"), lambda s: s["side"] == 1)
    olds = F.filter(F.col("ms"), lambda s: s["side"] == 0)
    pairs = F.flatten(
        F.transform(
            news,
            lambda n: F.transform(
                olds,
                lambda o: F.struct(
                    n["id"].alias("new_id"), o["id"].alias("corpus_id")
                ),
            ),
        )
    )
    return (
        buckets.where((F.size(news) >= 1) & (F.size(olds) >= 1))
        .select(F.explode(pairs).alias("p"))
        .select("p.new_id", "p.corpus_id")
        .distinct()
    )


def dup_clusters(
    pairs: DataFrame,
    id_a: str = "id_a",
    id_b: str = "id_b",
    max_iterations: int = 20,
) -> DataFrame:
    """Connected components over a near-dup pair graph → (doc_id,
    cluster_id), where cluster_id is the MINIMUM doc id in the component —
    the step that turns pairwise dedup output into keep-one-per-cluster
    decisions (keeper = the row where doc_id == cluster_id).

    Algorithm: iterative min-label propagation over the CLOSED
    neighborhood — self-loops are planted in the edge frame, so each
    round is ONE shuffle join + ONE aggregate on (id, label) pairs
    (optimization r15: the open-neighborhood form needed a second
    labels⋈nb_min join per round to mix in the node's own label — at
    scale that was a second full shuffle of the label frame every
    round, and locally a second join stage). Converges in
    O(graph diameter) rounds; near-dup graphs are dense clique-ish
    clusters with tiny diameters (LSH buckets emit all intra-bucket
    pairs), so this beats the O(log n) large-star/small-star alternates
    that exist for long-path graphs. Round 1 is FUSED into the seed:
    initial labels are the ids themselves, so the first round's
    min-over-closed-neighborhood is just min(dst) per src over the
    self-looped edges — a plain aggregate, no join, replacing both the
    old distinct-ids seed pass and the first loop round. Convergence:
    the self-loop row carries each node's own previous label through
    the round's aggregate, so the exact changed-row count is a
    filter+count over the round's tiny checkpointed (id, label, own)
    frame — type-agnostic (ids need not be numeric), no second join,
    and everything else stays distributed.
    """
    # Both directions AND the self-loops are generated ROW-LOCALLY with
    # one explode — four (src, dst) structs per pair row — instead of
    # the old three-way union (optimization r15, guide §1.2/§2.4): the
    # union's branches each embedded the whole upstream pair pipeline
    # (minhash shingle/signature/band/self-join for d07) and no longer
    # canonicalized equal after the keyed-spread change, so the pipeline
    # executed more than twice per edges fill (measured 2.5 s vs 1.1 s
    # for a single pass at sf0.1). One pass, same distinct, same rows:
    # self-loops for BOTH endpoints ride along (dst-side nodes included,
    # exactly what the old sym-of-sym union produced).
    edges = (
        pairs.select(
            F.explode(
                F.array(
                    F.struct(
                        F.col(id_a).alias("src"), F.col(id_b).alias("dst")
                    ),
                    F.struct(
                        F.col(id_b).alias("src"), F.col(id_a).alias("dst")
                    ),
                    F.struct(
                        F.col(id_a).alias("src"), F.col(id_a).alias("dst")
                    ),
                    F.struct(
                        F.col(id_b).alias("src"), F.col(id_b).alias("dst")
                    ),
                )
            ).alias("e")
        )
        .select("e.src", "e.dst")
        .distinct()
        .cache()
    )

    def release_checkpoint(ckpt: DataFrame) -> None:
        # Dataset.unpersist() does NOT free localCheckpoint blocks (they
        # live on the internal LogicalRDD, not in the CacheManager —
        # verified empirically); without this, every round's (id, label)
        # snapshot stays in executor storage until JVM GC. Private-API
        # reach-in, so failure just defers cleanup to the ContextCleaner
        # (the status quo), never breaks the computation.
        try:
            ckpt._jdf.queryExecution().analyzed().rdd().unpersist(False)
        except Exception:
            pass

    # round 1, fused: labels start as the ids, so min over the closed
    # neighborhood is min(dst) within the self-looped edge groups.
    # eager localCheckpoint MATERIALIZES each round's result and
    # truncates its lineage before the predecessor is released — a plain
    # cache().unpersist() sequence here left each round recomputing the
    # full i-deep plan from `edges` (quadratic total work, linearly
    # growing plan). Label frames are (id, label) pairs, so the
    # checkpointed blocks are tiny.
    labels = (
        edges.groupBy("src")
        .agg(F.min("dst").alias("label"))
        .select(F.col("src").alias("id"), "label")
        .localCheckpoint(eager=True)
    )
    converged = False
    prev_ckpt: DataFrame = labels
    for _ in range(max_iterations):
        # the self-loop row (dst == src) carries the node's OWN previous
        # label into its group, so the same aggregate yields both the new
        # label and the old one — the exact per-round change count costs
        # one filter+count on the tiny checkpointed frame, works for any
        # id type, and needs no second labels join
        stepped = (
            edges.join(labels, edges.dst == labels.id)
            .groupBy("src")
            .agg(
                F.min("label").alias("label"),
                F.max(
                    F.when(F.col("dst") == F.col("src"), F.col("label"))
                ).alias("__own"),
            )
            .select(F.col("src").alias("id"), "label", "__own")
            .localCheckpoint(eager=True)
        )
        changed = stepped.where(F.col("label") != F.col("__own")).count()
        labels = stepped.select("id", "label")
        release_checkpoint(prev_ckpt)
        prev_ckpt = stepped
        if changed == 0:
            converged = True
            break
    edges.unpersist()
    if not converged:
        raise RuntimeError(
            f"dup_clusters did not converge within {max_iterations} "
            "iterations (graph diameter exceeds max_iterations); labels "
            "would be silently wrong — raise max_iterations"
        )
    return labels.select(
        F.col("id").alias("doc_id"), F.col("label").alias("cluster_id")
    )


def _shingle_arrays(
    df: DataFrame, id_col: str, text_col: str, k: int
) -> DataFrame:
    """Per-document DISTINCT shingle arrays ``(id, __sh_arr, __n_sh)``,
    computed in ONE spread shingling pass and cached through the
    plan-cache registry (released by ``registry.release_plan_caches()``
    like t09's tf frame / d18's score frame).

    Why (optimization r15, guide §2.4/§5): every exact-similarity
    consumer branch previously re-ran ``word_shingles`` — d16's prefix
    plan held SIX Generate nodes re-shingling the corpus (frequency,
    rank, probe, full index, and two collect_list array rebuilds),
    because each branch projects differently and ReuseExchange never
    canonicalizes them together. One cached array pass replaces all of
    them; downstream views are a cheap ``explode`` (inverted index), a
    ``size`` projection (doc sizes — no aggregate at all), and the
    arrays themselves (row-local verification — the two
    collect_list+Exchange array rebuilds disappear outright). The cache
    is ~k× the text bytes and spillable (MEMORY_AND_DISK default);
    recomputing the interpreted ``array_distinct`` shingling 3-6× per
    query costs more at every scale measured."""
    from pyspark_bigdata_sars_cov_2_analysis_spark.plans.registry import (
        tracked_cache,
    )

    arr = F.array_distinct(shingle_array(F.col(text_col), k))
    # keyed spread (see spread_compute): same shuffle, minus the
    # round-robin determinism sort of the text rows
    return tracked_cache(
        spread_compute(df, key=id_col)
        .select(F.col(id_col), arr.alias("__sh_arr"))
        .withColumn("__n_sh", F.size("__sh_arr").cast("bigint"))
    )


def _exploded_shingles(arrs: DataFrame, id_col: str) -> DataFrame:
    """(id, shingle) inverted-index view of :func:`_shingle_arrays` —
    documents shorter than k tokens (empty arrays) produce no rows,
    exactly like ``word_shingles``."""
    return arrs.select(F.col(id_col), F.explode("__sh_arr").alias("shingle"))


def jaccard_pairs_prefix(
    df: DataFrame,
    id_col: str,
    text_col: str,
    k: int = 3,
    threshold: float = 0.1,
    _arrs: DataFrame | None = None,
) -> DataFrame:
    """Exact n-gram Jaccard ≥ threshold with LOSSLESS prefix filtering
    (the AllPairs/PPJoin bound): if J(A,B) ≥ t, the pair must share a
    shingle among each side's first ``|X| - ⌈t·|X|⌉ + 1`` shingles in a
    global rarest-first order — so the inverted index only stores those
    prefixes, and hot shingles (the quadratic blowup in a naive
    shingle-join) fall out of candidate generation entirely.

    Verification is row-local: candidates join each side's (small) full
    shingle array once and compute ``size(array_intersect)`` — no second
    pass over the inverted index. Output is identical to ``jaccard_pairs``
    (tested). MEASURED crossover: at sf0.1 (5k docs, short texts) the
    extra shuffles cost 7× more than the naive join saves, so the naive
    form stays the default; this one is for corpora whose hottest shingle
    appears in a large fraction of documents (inverted-list length ~N →
    naive candidate pairs ~N², while prefixes only index rare shingles).

    Physical shape (optimization r15): shingling runs ONCE into the
    cached :func:`_shingle_arrays` frame; the inverted index explodes
    from it, doc sizes are a ``size()`` projection of it (the former
    per-doc count aggregate + exchange is gone), and verification reads
    the cached arrays directly instead of rebuilding them with two
    collect_list aggregates."""
    arrs = (
        _shingle_arrays(df, id_col, text_col, k) if _arrs is None else _arrs
    )
    sh = _exploded_shingles(arrs, id_col)
    freq = sh.groupBy("shingle").agg(F.count(F.lit(1)).alias("df_"))
    sizes = arrs.select(F.col(id_col), F.col("__n_sh").alias("n_sh"))
    w = Window.partitionBy(id_col).orderBy(F.asc("df_"), F.asc("shingle"))
    ranked = (
        sh.join(freq, on="shingle")
        .withColumn("rn", F.row_number().over(w))
        .join(sizes, on=id_col)
    )
    # ceil(t*n) via an epsilon guard: fp overshoot (0.1*40 = 4.0000…01)
    # would shorten the prefix and break losslessness; undershooting only
    # admits extra candidates.
    need = F.ceil(F.lit(threshold) * F.col("n_sh") - F.lit(1e-9))
    prefix = ranked.where(F.col("rn") <= F.col("n_sh") - need + 1)
    a = prefix.select(F.col(id_col).alias("id_a"), "shingle")
    b = prefix.select(F.col(id_col).alias("id_b"), "shingle")
    cands = (
        a.join(b, on="shingle")
        .where(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .distinct()
    )
    j = cands.join(
        arrs.select(
            F.col(id_col).alias("id_a"),
            F.col("__sh_arr").alias("sa"),
            F.col("__n_sh").alias("n_a"),
        ),
        on="id_a",
    ).join(
        arrs.select(
            F.col(id_col).alias("id_b"),
            F.col("__sh_arr").alias("sb"),
            F.col("__n_sh").alias("n_b"),
        ),
        on="id_b",
    )
    inter = F.size(F.array_intersect("sa", "sb")).cast("bigint")
    jac = j.select(
        "id_a",
        "id_b",
        pround(
            inter / (F.col("n_a") + F.col("n_b") - inter), 4
        ).alias("jaccard"),
    )
    return jac.where(F.col("jaccard") >= threshold)


def _cooccurrence_counts(
    arrs: DataFrame, id_col: str
) -> DataFrame:
    """(id_a, id_b, n_inter, n_a, n_b) for every ordered (id_a < id_b)
    pair sharing ≥1 shingle — the inverted-index co-occurrence frame
    shared by :func:`jaccard_pairs` and :func:`containment_pairs`
    (review r14: the ~25-line block lived verbatim in both, so a fix to
    the shared shape had to be applied twice). One shingle-keyed
    self-join + one pair aggregate, never all-pairs. Input is the
    cached :func:`_shingle_arrays` frame (optimization r15): the
    inverted index explodes from it and doc sizes are a projection of
    it — the former per-doc count aggregate (a full extra exchange) is
    gone."""
    sh = _exploded_shingles(arrs, id_col)
    a = sh.select(F.col(id_col).alias("id_a"), "shingle")
    b = sh.select(F.col(id_col).alias("id_b"), "shingle")
    inter = (
        a.join(b, on="shingle")
        .where(F.col("id_a") < F.col("id_b"))
        .groupBy("id_a", "id_b")
        .agg(F.count(F.lit(1)).alias("n_inter"))
    )
    sa = arrs.select(F.col(id_col).alias("id_a"), F.col("__n_sh").alias("n_a"))
    sb = arrs.select(F.col(id_col).alias("id_b"), F.col("__n_sh").alias("n_b"))
    return inter.join(sa, on="id_a").join(sb, on="id_b")


def jaccard_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    k: int = 3,
    threshold: float = 0.1,
    _arrs: DataFrame | None = None,
) -> DataFrame:
    """Exact n-gram Jaccard over pairs sharing ≥1 shingle (full
    inverted-index join) — fastest below the hot-shingle crossover
    (see ``jaccard_pairs_prefix`` for the skew-proof variant)."""
    arrs = (
        _shingle_arrays(df, id_col, text_col, k) if _arrs is None else _arrs
    )
    jac = _cooccurrence_counts(arrs, id_col).withColumn(
        "jaccard",
        pround(
            F.col("n_inter")
            / (F.col("n_a") + F.col("n_b") - F.col("n_inter")),
            4,
        ),
    )
    return jac.where(F.col("jaccard") >= threshold).select("id_a", "id_b", "jaccard")


def containment_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    k: int = 3,
    threshold: float = 0.8,
    _arrs: DataFrame | None = None,
) -> DataFrame:
    """ASYMMETRIC near-dup: shingle CONTAINMENT |A∩B| / min(|A|, |B|) —
    catches a document embedded inside a larger one (boilerplate-wrapped
    reposts, code files pasted into bigger files), which symmetric
    Jaccard structurally misses: a 50-shingle doc fully contained in a
    500-shingle doc scores J ≈ 0.1 (below any dedup threshold) but
    containment 1.0. Same inverted-index shape as ``jaccard_pairs`` —
    pairs sharing ≥1 shingle, one co-occurrence count aggregate, never
    all-pairs — with the pair oriented (small, big) by shingle count
    (id tiebreak) so the score reads as 'fraction of the smaller doc
    found inside the bigger'."""
    arrs = (
        _shingle_arrays(df, id_col, text_col, k) if _arrs is None else _arrs
    )
    j = _cooccurrence_counts(arrs, id_col)
    a_small = (F.col("n_a") < F.col("n_b")) | (
        (F.col("n_a") == F.col("n_b")) & (F.col("id_a") < F.col("id_b"))
    )
    out = j.select(
        F.when(a_small, F.col("id_a")).otherwise(F.col("id_b")).alias("id_small"),
        F.when(a_small, F.col("id_b")).otherwise(F.col("id_a")).alias("id_big"),
        pround(
            F.col("n_inter") / F.least(F.col("n_a"), F.col("n_b")), 4
        ).alias("containment"),
    )
    return out.where(F.col("containment") >= threshold)


def _containment_prefix_candidates(
    sh: DataFrame,
    id_col: str,
    threshold: float,
    sizes: DataFrame | None = None,
) -> DataFrame:
    """Candidate (id_a, id_b) pairs from the asymmetric prefix bound —
    the frame :func:`containment_pairs_prefix` verifies. Split out so the
    structural claim ('the prefix probe expands strictly fewer candidates
    than the naive inverted-index join in the hot-shingle regime') is
    testable as a row count, not a wall-clock assertion
    (tests/test_properties.py::test_containment_prefix_prunes_candidates).
    ``sizes``: an optional pre-computed ``(id, n_sh)`` frame (the
    :func:`_shingle_arrays` projection) — skips the per-doc count
    aggregate over ``sh``."""
    freq = sh.groupBy("shingle").agg(F.count(F.lit(1)).alias("df_"))
    if sizes is None:
        sizes = sh.groupBy(id_col).agg(F.count(F.lit(1)).alias("n_sh"))
    w = Window.partitionBy(id_col).orderBy(F.asc("df_"), F.asc("shingle"))
    ranked = (
        sh.join(freq, on="shingle")
        .withColumn("rn", F.row_number().over(w))
        .join(sizes, on=id_col)
    )
    # epsilon guard as in jaccard_pairs_prefix: fp overshoot must never
    # shorten the prefix (losslessness); undershoot only adds candidates
    need = F.ceil(F.lit(threshold) * F.col("n_sh") - F.lit(1e-9))
    prefix = ranked.where(F.col("rn") <= F.col("n_sh") - need + 1)
    probe = prefix.select(F.col(id_col).alias("id_p"), "shingle")
    full = sh.select(F.col(id_col).alias("id_f"), "shingle")
    return (
        probe.join(full, on="shingle")
        .where(F.col("id_p") != F.col("id_f"))
        .select(
            F.least("id_p", "id_f").alias("id_a"),
            F.greatest("id_p", "id_f").alias("id_b"),
        )
        .distinct()
    )


def containment_pairs_prefix(
    df: DataFrame,
    id_col: str,
    text_col: str,
    k: int = 3,
    threshold: float = 0.8,
    _arrs: DataFrame | None = None,
) -> DataFrame:
    """LOSSLESS prefix-filtered containment — the hot-regime scale path
    for :func:`containment_pairs` (a Jaccard-LSH prefilter CANNOT serve
    here: it recalls by symmetric similarity and misses the embedded
    high-containment/low-Jaccard pairs this family exists for). The
    asymmetric prefix bound: if |A∩B| ≥ ⌈t·|A|⌉ for the SMALLER set A,
    at least one shared shingle lies in A's rarest-first prefix of
    length |A| − ⌈t·|A|⌉ + 1 (else all shared shingles fit in the
    ⌈t·|A|⌉−1 suffix — contradiction). So candidates = every doc's tiny
    prefix (~(1−t)·|A| shingles) probed against the FULL inverted index
    — the containing side cannot be pruned, but hot shingles leave the
    PROBE side entirely unless they are a document's rarest, which
    bounds candidate generation by prefix-shingle document frequencies.
    Verification is row-local array_intersect per candidate pair,
    oriented small→big; output identical to the naive form
    (property-tested, embedded-pair case included).

    Physical shape (optimization r15): same single-pass cached
    :func:`_shingle_arrays` skeleton as ``jaccard_pairs_prefix`` — one
    shingling pass, sizes as a projection, verification from the cached
    arrays (no collect_list rebuild aggregates)."""
    arrs = (
        _shingle_arrays(df, id_col, text_col, k) if _arrs is None else _arrs
    )
    sh = _exploded_shingles(arrs, id_col)
    sizes = arrs.select(F.col(id_col), F.col("__n_sh").alias("n_sh"))
    cands = _containment_prefix_candidates(sh, id_col, threshold, sizes=sizes)
    j = cands.join(
        arrs.select(
            F.col(id_col).alias("id_a"),
            F.col("__sh_arr").alias("sa"),
            F.col("__n_sh").alias("n_a"),
        ),
        on="id_a",
    ).join(
        arrs.select(
            F.col(id_col).alias("id_b"),
            F.col("__sh_arr").alias("sb"),
            F.col("__n_sh").alias("n_b"),
        ),
        on="id_b",
    )
    inter = F.size(F.array_intersect("sa", "sb")).cast("bigint")
    a_small = (F.col("n_a") < F.col("n_b")) | (
        (F.col("n_a") == F.col("n_b")) & (F.col("id_a") < F.col("id_b"))
    )
    out = j.select(
        F.when(a_small, F.col("id_a")).otherwise(F.col("id_b")).alias("id_small"),
        F.when(a_small, F.col("id_b")).otherwise(F.col("id_a")).alias("id_big"),
        pround(inter / F.least(F.col("n_a"), F.col("n_b")), 4).alias(
            "containment"
        ),
    )
    return out.where(F.col("containment") >= threshold)


def contamination_hits(
    train: DataFrame,
    eval_df: DataFrame,
    id_col: str,
    text_col: str,
    k: int = 5,
) -> DataFrame:
    """Benchmark decontamination: for every training document, count the
    distinct word ``k``-shingles it shares with ANY document in the eval
    set — the n-gram-collision check run before training so benchmark
    text leaking into the corpus can't inflate eval scores. Returns
    (id, n_hit_shingles) for contaminated docs only; dropping or auditing
    them is the caller's policy.

    Scale shape: the eval side collapses to a DISTINCT shingle set —
    benchmark suites are tiny next to a training corpus, so AQE
    broadcasts it and the train side is never shuffled (the join is left
    unhinted so a pathological giant eval set degrades to a shuffle join
    instead of an OOM). Because the eval set is distinct, each train
    (doc, shingle) row matches AT MOST ONE eval row — zero fan-out even
    on stopword-dense shingles, so the hot-key quadratic blowup of
    doc-to-doc shingle joins cannot occur here. Train shingles are
    per-doc distinct, making the count exactly "distinct shared
    shingles"."""
    tr = word_shingles(train, id_col, text_col, k)
    ev = word_shingles(eval_df, id_col, text_col, k).select("shingle").distinct()
    return (
        tr.join(ev, "shingle")
        .groupBy(id_col)
        .agg(F.count(F.lit(1)).alias("n_hit_shingles"))
    )


def dedup_keep_best(
    df: DataFrame, id_col: str, text_col: str, score: Column
) -> DataFrame:
    """Exact-dup resolution with a QUALITY policy: one row per distinct
    normalized text keeping the highest-``score`` member (ties → minimum
    id), plus the group size — the keep-best-per-cluster step a training
    pipeline runs instead of d01's keep-first when members differ in
    metadata quality.

    Scale shape: a single hash AGGREGATE on the 32-byte fingerprint —
    ``max(struct(score, -id))`` is an argmax that map-side partials
    combine associatively, so no per-group sort and no window (group
    sizes are dup multiplicities, but the aggregate shape doesn't even
    rely on them being small). The score is rounded (compat grid) BEFORE
    the argmax so fp noise can't flip keeper choices between engines."""
    scored = df.select(
        F.md5(_normalize(F.col(text_col))).alias("fp"),
        F.col(id_col),
        pround(score, 4).alias("q"),
    )
    best = F.max(
        F.struct(F.col("q"), (-F.col(id_col)).alias("negid"))
    ).alias("b")
    return (
        scored.groupBy("fp")
        .agg(best, F.count(F.lit(1)).alias("n_copies"))
        .select(
            "fp",
            (-F.col("b.negid")).alias("keeper"),
            F.col("b.q").alias("best_quality"),
            F.col("n_copies").cast("bigint").alias("n_copies"),
        )
    )


def fuzzy_dedup_keep_best(
    df: DataFrame,
    id_col: str,
    text_col: str,
    score: Column,
    k: int = 3,
    num_hashes: int = 12,
    band_rows: int = 3,
    max_iterations: int = 20,
    broadcast_max_members: int = 8_000_000,
) -> DataFrame:
    """The FUZZY counterpart of the d12 chain: MinHash-LSH candidate
    pairs → connected components → keep-best-per-cluster. One row per
    near-dup cluster (≥2 members): (cluster_id, keeper, best_quality,
    n_members) — which document survives each fuzzy-duplicate group and
    how many it replaces. Singletons never enter the pair graph, so they
    are implicitly all keepers and excluded here (resolving them costs
    nothing: every doc outside this frame keeps itself).

    ``score`` may reference ``text_col`` (and the join keys) ONLY: the
    corpus side of the members join is projected to (id, text) so the
    quality battery runs on members, not the whole corpus (ADVICE r15 —
    documenting the restriction the r15 projection introduced; a score
    over other metadata columns belongs in :func:`dedup_keep_best`,
    whose input keeps the caller's full row).

    ``broadcast_max_members`` (ADVICE r15): the members frame is only
    broadcast when its exact row count — a cheap scan of the already-
    localCheckpointed cluster frame — stays under this cap. 'Members ≪
    corpus' is the common case, not a construction: on a heavily
    duplicated corpus the members frame can approach the corpus size,
    and an unconditional broadcast would hit the 8 GB / 512M-row
    broadcast hard cap (driver OOM) where a shuffle join degrades
    gracefully. 8M rows of (long, long) ≈ low hundreds of MB framed —
    comfortably inside executor memory at real scale; above the cap the
    planner picks the join strategy from its own estimates.

    Scale shape: the signature→bands→bucket-expansion pipeline is d02's
    single-shuffle form; clustering is d07's per-round (id, label) join
    — both already scale-audited. The keep-best tail joins the (small:
    dup members only) cluster frame back to a quality projection of the
    corpus on the id key and runs ONE argmax aggregate per cluster
    (d10's max(struct) shape, no window). The quality score is rounded
    before the argmax so keeper choice is engine-stable."""
    pairs = minhash_lsh_pairs(df, id_col, text_col, k, num_hashes, band_rows)
    # (doc_id, cluster_id), members only
    clusters = dup_clusters(pairs, max_iterations=max_iterations)
    # score AFTER the members join, not in a pre-join projection
    # (optimization r15, guide §3 "pre-filter the big side"): the score
    # expression (t16's regexp battery in d13) is row-local, and the
    # cluster frame holds dup members only — a tiny fraction of the
    # corpus — so computing it on the joined rows scores exactly the
    # members instead of every corpus document. Catalyst cannot hoist a
    # projection above a join by itself; written this way the corpus
    # side of the (broadcast) join carries raw (id, text) and the regex
    # work runs on members only.
    # broadcast the MEMBERS side explicitly WHEN IT FITS: the
    # checkpointed cluster frame has no stats (ExistingRDD), so the
    # planner otherwise guesses — at sf0.1 it picked the corpus TEXT
    # side as the build, exactly backwards for scale. The hint is gated
    # on the frame's exact row count (ADVICE r15): the frame is already
    # localCheckpoint-materialized, so the count is an in-memory scan,
    # and a heavily duplicated corpus (members ≈ corpus) falls back to
    # the planner's shuffle join instead of tripping the 8 GB broadcast
    # hard cap.
    if clusters.count() <= broadcast_max_members:
        clusters = F.broadcast(clusters)
    j = clusters.join(
        df.select(F.col(id_col).alias("__sid"), F.col(text_col)),
        clusters.doc_id == F.col("__sid"),
    ).select("cluster_id", "doc_id", pround(score, 4).alias("q"))
    best = F.max(
        F.struct(F.col("q"), (-F.col("doc_id")).alias("negid"))
    ).alias("b")
    return (
        j.groupBy("cluster_id")
        .agg(best, F.count(F.lit(1)).alias("n_members"))
        .select(
            "cluster_id",
            (-F.col("b.negid")).alias("keeper"),
            F.col("b.q").alias("best_quality"),
            F.col("n_members").cast("bigint").alias("n_members"),
        )
    )


def decontaminate_resolve_split(
    train: DataFrame,
    eval_df: DataFrame,
    id_col: str,
    text_col: str,
    score: Column,
    k: int = 5,
    train_rate: float = 0.9,
    salt: str = "split",
) -> DataFrame:
    """The ingest tail as ONE composed plan: decontaminate (d09) → resolve
    exact dups keep-best (d10) → leakage-free split (d08). Returns one row
    per surviving distinct content: (fp, keeper, best_quality, n_copies,
    split) — which document to keep and which side of the train/eval
    boundary its content group lands on.

    The operators compose without inter-stage shuffles on the big side:
    the contamination frame is id-only and joins back LEFT ANTI (small by
    construction — AQE broadcasts it); keep-best is the single fp hash
    aggregate; and the split gate hashes the fp ALREADY produced by that
    aggregate, so d08's projection adds zero work. Keying the split on
    the normalized-content fp (rather than d08's raw-text md5) is
    deliberate: whitespace/case variants of a kept document cannot land
    across the boundary. One big-side shuffle end-to-end
    (plan-shape-tested)."""
    from pyspark_bigdata_sars_cov_2_analysis_spark.llmdata.sampling import (
        leakage_free_split,
    )

    hits = contamination_hits(train, eval_df, id_col, text_col, k)
    clean = train.join(hits.select(id_col), id_col, "left_anti")
    keep = dedup_keep_best(clean, id_col, text_col, score)
    return leakage_free_split(
        keep, "keeper", F.col("fp"), train_rate=train_rate, salt=salt
    )


def _sampled_shingle_stats(
    df: DataFrame,
    id_col: str,
    text_col: str,
    k: int,
    sample_fraction: float | None,
    salt: str,
    _arrs: DataFrame | None = None,
) -> dict:
    """The corpus measurement both dispatch choosers share: shingle-
    frequency aggregate over a deterministic md5-gated doc sample, with
    unbiased scale-up. Doc-level p-sampling thins each shingle's doc
    list binomially, so E[L̂·(L̂−1)] = p²·L·(L−1) and E[Σ L̂] = p·Σ L —
    hence quad /= p² and rows /= p are unbiased. ``l_max`` scales by
    1/p as an INDICATOR only (the max of thinned lists is not the
    thinned max — it under-reaches for rare tails; exact when
    sample_fraction is None). The gate is md5-keyed, never rand(), so
    the dispatch is reproducible run to run."""
    if sample_fraction is not None and not (0.0 < sample_fraction <= 1.0):
        raise ValueError(
            f"sample_fraction must be in (0, 1], got {sample_fraction}"
        )
    p = 1.0 if sample_fraction is None else sample_fraction
    if _arrs is not None:
        # derive the sample from the caller's cached shingle-array frame
        # (optimization r15): the md5 gate keys on the id either way, so
        # the sampled doc set — and therefore the stats — is identical
        # to shingling the gated raw corpus, without a second shingling
        # pass just to pick a physical plan.
        src = _arrs
        if p < 1.0:
            from pyspark_bigdata_sars_cov_2_analysis_spark.llmdata.sampling import (
                hash_gate,
            )

            src = src.where(hash_gate(F.col(id_col), p, salt=salt))
        sh = _exploded_shingles(src, id_col)
    else:
        if p < 1.0:
            from pyspark_bigdata_sars_cov_2_analysis_spark.llmdata.sampling import (
                hash_gate,
            )

            df = df.where(hash_gate(F.col(id_col), p, salt=salt))
        sh = word_shingles(df, id_col, text_col, k)
    st = (
        sh.groupBy("shingle")
        .agg(F.count(F.lit(1)).alias("L"))
        .agg(
            F.sum(F.col("L") * (F.col("L") - 1) / 2).alias("quad"),
            F.sum("L").alias("rows"),
            F.max("L").alias("l_max"),
        )
        .first()
    )
    return {
        "quad": (st.quad or 0.0) / (p * p),
        "rows": (st.rows or 0) / p,
        "l_max": round((st.l_max or 0) / p),
        "sample_fraction": p,
    }


def choose_jaccard_variant(
    df: DataFrame,
    id_col: str,
    text_col: str,
    k: int = 3,
    threshold: float = 0.1,
    sample_fraction: float | None = 0.25,
    _arrs: DataFrame | None = None,
) -> tuple[str, dict]:
    """Pick ``naive`` vs ``prefix`` Jaccard from ONE measured corpus stat
    instead of making the caller guess (the round-4 advice item).

    The shingle-frequency aggregate yields, in a single columnar scan +
    one shuffle on the shingle key (noise next to the O(quad) join it
    sizes):

    - ``rows``  = total (doc, shingle) rows — every linear pass costs this;
    - ``quad``  = Σ_s L_s·(L_s−1)/2 — the EXACT candidate-pair count the
      naive inverted-index join will expand (not a model).

    The prefix variant keeps ≈ (1−t) of each doc's shingles, so under a
    uniform shingle-rank model it expands ≈ (1−t)²·quad candidates,
    saving quad·(1−(1−t)²) — but pays fixed extra passes (frequency
    join, per-doc rank window) that scale with ``rows``. MEASURED on both
    ends: the sf0.01 corpus (Lmax=7, quad≈0.5·rows) has naive faster at
    every threshold 0.1-0.7 (prefix 1.6-2× slower), and the 50k-replica
    probe corpus (README) has naive 4.5× faster even at t=0.1 with
    quad≈4.5·rows. Prefix only wins when a hot shingle appears in a
    large fraction of documents (L_max ~ N → quad ~ N²/2 ≫ rows) — the
    skew case candidate generation must not expand. β=2 places the
    crossover safely past both measured naive-wins points:
    choose prefix iff quad·(1−(1−t)²) > 2·rows.

    ``sample_fraction`` (default 0.25): deterministic md5-gated
    doc-level sample with unbiased scale-up — the shared
    :func:`_sampled_shingle_stats` measurement (estimator math and the
    l_max caveat documented there); pass ``None`` for the exact scan."""
    stats = _sampled_shingle_stats(
        df, id_col, text_col, k, sample_fraction, salt="jacchoose|",
        _arrs=_arrs,
    )
    saved = stats["quad"] * (1.0 - (1.0 - threshold) ** 2)
    stats["saved_candidates_est"] = saved
    return ("prefix" if saved > 2.0 * stats["rows"] else "naive"), stats


def jaccard_pairs_auto(
    df: DataFrame,
    id_col: str,
    text_col: str,
    k: int = 3,
    threshold: float = 0.1,
) -> DataFrame:
    """Single Jaccard entry point: measures the corpus
    (``choose_jaccard_variant``) and dispatches to ``jaccard_pairs`` or
    ``jaccard_pairs_prefix`` — both emit identical pairs (lossless
    property test), so the choice is purely physical. The chooser's
    stats job and the chosen variant SHARE one cached
    :func:`_shingle_arrays` frame (optimization r15) — the corpus is
    shingled once for both, instead of once for the measurement and
    3-6 more times inside the variant's plan."""
    import logging

    arrs = _shingle_arrays(df, id_col, text_col, k)
    variant, stats = choose_jaccard_variant(
        df, id_col, text_col, k, threshold, _arrs=arrs
    )
    logging.getLogger(__name__).info(
        "jaccard_pairs_auto: variant=%s stats=%s threshold=%s",
        variant, stats, threshold,
    )
    fn = jaccard_pairs_prefix if variant == "prefix" else jaccard_pairs
    return fn(df, id_col, text_col, k, threshold, _arrs=arrs)


def choose_containment_variant(
    df: DataFrame,
    id_col: str,
    text_col: str,
    k: int = 3,
    threshold: float = 0.8,
    sample_fraction: float | None = 0.25,
    _arrs: DataFrame | None = None,
) -> tuple[str, dict]:
    """d16's measured dispatch (VERDICT r7 Next-round #4) — the
    :func:`choose_jaccard_variant` pattern with the ASYMMETRIC cost
    model. Same shingle-frequency aggregate (``rows``, ``quad``,
    ``l_max``), different saving formula: the containment prefix prunes
    only the PROBE side (the containing side can never be pruned),
    keeping ≈ (1−t)·|A|+1 of each doc's shingles, so under the uniform
    shingle-rank model it expands ≈ 2·(1−t)·quad candidates against
    naive's quad — saving quad·(2t−1), which is non-positive for
    t ≤ 0.5 (the probe prefix then covers over half of every doc and
    prefix can only lose). Fixed-cost bar β=8 (RECALIBRATED,
    optimization r15 — was 2): prefix pays rank-window + candidate
    distinct passes that scale with ``rows``, and — the term the old
    β=2 bar under-counted — its verification is a per-candidate
    ``array_intersect`` (O(avg shingles/doc) each), where naive's
    verification is an O(1)-per-row count aggregate over the same
    co-occurrence join it already ran. Measured at sf0.1 (saved/rows
    ≈ 3): naive 1.7s vs prefix 4.1s on a warm shingle cache — the old
    bar picked prefix, 2.4× the cost. Measured on planted hot corpora:
    prefix first wins around saved/rows ≈ 40 (1.3×), with a flat tie
    zone between ~20 and ~40; β=8 puts the shipped regime (≤3) firmly
    on naive and the hot regimes (≥18) on prefix, the decision the
    planted-regime tests pin from both sides. Choose prefix iff
    quad·(2t−1) > 8·rows.

    ``sample_fraction`` (default 0.25) measures a DETERMINISTIC
    hash-gated subset of documents instead of the full corpus — the
    right chooser shape at 100 TB, where a full stat scan just to pick a
    physical plan is real money (shared :func:`_sampled_shingle_stats`;
    the unbiased estimator math and the l_max caveat live there). The
    decision needs only an order-of-magnitude margin (the two regimes
    sit decades apart on quad/rows), so estimator noise cannot flip it
    anywhere near the measured corpora — asserted by a test that the
    sampled decision matches the full-scan decision on both planted
    regimes. Pass ``None`` to measure the full corpus."""
    stats = _sampled_shingle_stats(
        df, id_col, text_col, k, sample_fraction, salt="contchoose|",
        _arrs=_arrs,
    )
    saved = stats["quad"] * max(2.0 * threshold - 1.0, 0.0)
    stats["saved_candidates_est"] = saved
    return ("prefix" if saved > 8.0 * stats["rows"] else "naive"), stats


def containment_pairs_auto(
    df: DataFrame,
    id_col: str,
    text_col: str,
    k: int = 3,
    threshold: float = 0.8,
) -> DataFrame:
    """Single containment entry point: measures the corpus
    (:func:`choose_containment_variant`) and dispatches to
    :func:`containment_pairs` or :func:`containment_pairs_prefix` — both
    emit identical (id_small, id_big, containment) rows (lossless
    property test), so the choice is purely physical. As in
    :func:`jaccard_pairs_auto`, the stats job and the chosen variant
    share ONE cached :func:`_shingle_arrays` frame (optimization r15) —
    one shingling pass total instead of one for the measurement plus
    3-6 inside the variant."""
    import logging

    arrs = _shingle_arrays(df, id_col, text_col, k)
    variant, stats = choose_containment_variant(
        df, id_col, text_col, k, threshold, _arrs=arrs
    )
    logging.getLogger(__name__).info(
        "containment_pairs_auto: variant=%s stats=%s threshold=%s",
        variant, stats, threshold,
    )
    fn = containment_pairs_prefix if variant == "prefix" else containment_pairs
    return fn(df, id_col, text_col, k, threshold, _arrs=arrs)


def simhash_signatures(
    df: DataFrame, id_col: str, text_col: str, bits: int = 32
) -> DataFrame:
    """(id, simhash): bit-majority SimHash over distinct whitespace tokens.
    Token hash = first ``ceil(bits/4)`` hex chars of md5 (8 chars — an
    unsigned 32-bit int — at the default), so every signature bit has a
    live vote source. ``bits`` caps at 60: the hash must stay below
    2^63 for the signed-bigint ``conv`` (review r14 — the hash was
    FIXED at 32 bits, so ``bits=64`` silently voted -n_tokens on every
    bit >= 32: all-zero upper halves, dead bands whose (band, val) was
    identical for every doc, and a quadratic candidate blowup in the
    banded self-join instead of an error).

    Scale shape: each token row carries its ``bits`` ±1 votes as ``bits``
    sum columns into ONE ``groupBy(id)`` — map-side partial sums combine
    per bit, the shuffle moves one row of ``bits`` longs per (map
    partition, id), and the signature is assembled from the votes as a
    pure column expression. No joins, no row fan-out, single exchange
    (the earlier formulation crossJoined every token with a broadcast
    bit index, multiplying pre-shuffle rows ``bits``×, and needed a
    second aggregate to fold bytes into the signature)."""
    if not 1 <= bits <= 60:
        raise ValueError(
            f"bits must be in [1, 60] (the token hash is built from "
            f"ceil(bits/4) md5 hex chars and must fit a signed bigint), "
            f"got {bits}"
        )
    toks = df.select(
        F.col(id_col),
        F.explode(
            F.array_distinct(F.split(_normalize(F.col(text_col)), " "))
        ).alias("tok"),
    )
    n_hex = (bits + 3) // 4  # 8 at bits=32 — the historical hash exactly
    h = F.conv(F.substring(F.md5("tok"), 1, n_hex), 16, 10).cast("bigint")
    t = toks.select(F.col(id_col), h.alias("h"))
    # bit b of h via shiftright with a LITERAL shift (stays in codegen);
    # vote = +1 when set, -1 when clear
    votes = [
        F.sum(
            F.when(
                F.shiftright(F.col("h"), b).bitwiseAND(F.lit(1)) == 1, 1
            ).otherwise(-1)
        ).alias(f"v{b}")
        for b in range(bits)
    ]
    agg = t.groupBy(id_col).agg(*votes)
    sim = F.lit(0).cast("bigint")
    for b in range(bits):
        sim = sim + F.when(
            F.col(f"v{b}") > 0, F.lit(1 << b).cast("bigint")
        ).otherwise(F.lit(0).cast("bigint"))
    return agg.select(F.col(id_col), sim.alias("simhash"))


def simhash_band_layout(bits: int, band_bits: int) -> list[tuple[int, int]]:
    """Band layout as (shift, width) slices covering EVERY signature bit
    exactly once. When ``band_bits`` does not divide ``bits`` the top
    ``bits % band_bits`` bits get a narrower remainder band — without it
    they would sit outside every band and two signatures differing only
    there would never become candidates (silent recall loss)."""
    assert 0 < band_bits <= bits
    layout = [(b * band_bits, band_bits) for b in range(bits // band_bits)]
    rem = bits % band_bits
    if rem:
        layout.append((bits - rem, rem))
    return layout


def simhash_neardup_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    max_hamming: int = 6,
    bits: int = 32,
    band_bits: int | None = None,
    n_docs: int | None = None,
) -> DataFrame:
    """SimHash near-duplicate pairs: candidates share at least one band
    slice of the signature, then verified exactly with
    bit_count(xor) ≤ max_hamming. Detection is GUARANTEED (pigeonhole)
    only when the layout has more bands than max_hamming: ≤h differing
    bits touch ≤h bands, so with n_bands > h at least one band matches
    exactly. With n_bands ≤ h a pair inside the Hamming budget can split
    its errors across every band and be missed — the warning below fires
    for such configs (the standard LSH recall trade, made explicit).

    Scale shape: bits/band_bits small (band, value) rows per doc, then a
    self-EQUI-JOIN on (band, value) with id_a < id_b — each side carries
    its signature, so the exact Hamming check is a projection on the
    join output and needs no re-join. This differs from d02's
    bucket-grouped expansion deliberately: there the point is to AVOID
    materializing intra-corpus pairs (they're not the output); here
    every qualifying intra-corpus pair IS the output, and streaming them
    through a join beats building per-bucket pair ARRAYS first —
    measured at sf0.1 (5000 docs, 5.25M pairs): 27-30s array-grouped →
    5.4-9.3s joined, a 4-5x win, because the nested
    transform/slice/flatten materialized ~50k-struct arrays per bucket
    row before exploding. Small inputs broadcast-hash; at scale both
    sides shuffle on (band, value), where the band_bits auto-scaling
    below keeps per-key bucket sizes bounded. Emission is canonicalized
    to the FIRST matching band of each pair's xor mask (a row-local
    when-chain), so every pair surfaces exactly once and the old global
    distinct() exchange over ~5x-duplicated full-width rows disappears.
    MEASURED: at 50k docs a fixed 8-bit banding
    saturates (≤1024 buckets per band → bucket sizes grow with N and pair
    expansion goes quadratic), so ``band_bits=None`` (the default)
    auto-scales with corpus size: ``clamp(ceil(log2(n_docs)), 8,
    bits // 2)`` — bucket count per band then grows at least linearly
    with the corpus. ``n_docs`` (VERDICT r9 #5, d18's probe-hint rule
    applied here): callers that already know the corpus size — an
    ingest loop counting its input anyway, a planner with catalog stats
    — pass it to skip the sizing ``count()`` job entirely; the default
    ``None`` runs one columnar count scan, noise next to the dedup
    itself, and the hint only sizes the LAYOUT (an off-by-2x estimate
    shifts band_bits by at most 1 — recall/cost trade, never
    correctness). Ignored when ``band_bits`` is pinned explicitly.
    Recall trade (standard LSH): fewer, wider
    bands → a pair must agree on one of fewer bands — detection is only
    GUARANTEED when Hamming < n_bands. Pass ``band_bits`` explicitly
    (e.g. the d06 oracle pins 4 → 8 bands > max_hamming=6) when the band
    layout itself is part of the contract; raise ``bits`` to 64 (with a
    widened hash) for corpora past ~100M docs."""
    if band_bits is None:
        import math

        if n_docs is None:
            n_docs = df.count()
        band_bits = min(bits // 2, max(8, math.ceil(math.log2(max(n_docs, 2)))))
    layout = simhash_band_layout(bits, band_bits)
    if len(layout) <= max_hamming:
        import warnings

        warnings.warn(
            f"simhash_neardup_pairs: {len(layout)} bands <= max_hamming="
            f"{max_hamming}; pigeonhole detection is not guaranteed — pairs "
            "within the Hamming budget can split across all bands. Lower "
            "band_bits or raise bits.",
            stacklevel=2,
        )
    bands = F.array(
        *[
            F.struct(
                F.lit(b).alias("band"),
                F.shiftright(F.col("simhash"), shift)
                .bitwiseAND(F.lit((1 << width) - 1))
                .alias("val"),
            )
            for b, (shift, width) in enumerate(layout)
        ]
    )

    def first_match_band(m: Column) -> Column:
        """Index of the LOWEST band whose slice of the xor mask ``m`` is
        all-zero — i.e. the first band where the two signatures agree.
        Literal when-chain over the layout: row-local, codegen. The
        canonical-emission rule: a pair with Hamming ≤ h matches
        ≥ n_bands − h bands (all of them for identical signatures) and
        would otherwise be emitted once per matching band; keeping it
        only where the join band equals this index yields each pair
        exactly once by construction — its first matching band's bucket
        contains both members by definition — so no distinct is
        needed and duplicates never exist at all."""
        expr: Column = F.lit(len(layout))  # sentinel, unreachable in-bucket
        for b, (shift, width) in reversed(list(enumerate(layout))):
            expr = F.when(
                F.shiftright(m, shift).bitwiseAND(F.lit((1 << width) - 1))
                == 0,
                F.lit(b),
            ).otherwise(expr)
        return expr

    from pyspark_bigdata_sars_cov_2_analysis_spark.plans.registry import (
        tracked_cache,
    )

    sig = simhash_signatures(df, id_col, text_col, bits)
    # Cached through the plan-cache registry (optimization r15, the
    # d16/_shingle_arrays rule applied here): both self-join sides are
    # projections of this ONE frame, but they project different aliases,
    # so ReuseExchange never canonicalizes them together and the whole
    # signature pipeline — tokenize, explode, md5, bit-majority
    # aggregate over the full corpus — executed TWICE, once per side.
    # The cache is tiny (n_bands rows of four ints per doc, no text) and
    # released by registry.release_plan_caches() like every plan cache.
    banded = tracked_cache(
        sig.select(
            F.col(id_col), F.col("simhash"), F.explode(bands).alias("bs")
        ).select(F.col(id_col), "simhash", "bs.band", "bs.val")
    )
    a = banded.select(
        F.col(id_col).alias("id_a"), F.col("simhash").alias("sa"),
        "band", "val",
    )
    b = banded.select(
        F.col(id_col).alias("id_b"), F.col("simhash").alias("sb"),
        "band", "val",
    )
    m = F.col("sa").bitwiseXOR(F.col("sb"))
    return (
        a.join(b, ["band", "val"])
        .where(F.col("id_a") < F.col("id_b"))
        .where(
            (F.bit_count(m) <= max_hamming)
            & (F.col("band") == first_match_band(m))
        )
        .select(
            "id_a", "id_b", F.bit_count(m).cast("bigint").alias("hamming")
        )
    )


def _doc_chunks(
    df: DataFrame, id_col: str, text_col: str, chunk_words: int
) -> DataFrame:
    """(id, pos, chunk, lh): consecutive ``chunk_words``-word spans of
    each document with their position and 16-byte hash — the exploded
    frame both the batch (:func:`chunk_dedup_keep_first`) and streaming
    (:func:`chunk_ingest_batch_idempotent`) span dedups run on. Pure
    row-local expressions, no shuffle."""
    return (
        df.select(
            F.col(id_col),
            F.split(F.col(text_col), " ").alias("w"),
        )
        .select(
            id_col,
            F.posexplode(
                F.transform(
                    F.sequence(
                        F.lit(0),
                        F.ceil(F.size("w") / chunk_words).cast("int") - 1,
                    ),
                    lambda i: F.array_join(
                        F.slice("w", i * chunk_words + 1, chunk_words), " "
                    ),
                )
            ).alias("pos", "chunk"),
        )
        .withColumn("lh", F.md5("chunk"))
    )


def chunk_dedup_keep_first(
    df: DataFrame,
    id_col: str,
    text_col: str,
    chunk_words: int = 10,
) -> DataFrame:
    """Span-level (CCNet/C4-style) dedup WITHIN documents across the
    whole corpus: split each document into consecutive ``chunk_words``-word
    chunks, keep only the corpus-wide FIRST occurrence of each distinct
    chunk (ordered by (id, position)), and reassemble the surviving
    chunks per document — the pretraining cleanup that strips boilerplate
    spans (headers, license blocks, navigation) repeated across pages,
    which document-level dedup (d01-d07) can never catch because the
    documents differ elsewhere.

    Returns ``(id_col, clean_text, n_chunks, n_dropped)``.

    Degenerate text (pinned by
    tests/test_properties.py::test_chunk_dedup_null_and_empty_text): a
    NULL-text document has no chunks and is ABSENT from the output —
    SQL NULL propagation, and exactly what the d14 DuckDB oracle
    computes — while an empty text is one ``''`` chunk subject to
    normal keep-first. This differs from the d11 band ingest, where a
    NULL-text doc has no shingles and passes through to the output;
    callers wanting NULL-text docs surfaced here must gate them
    upstream (the quality gate emits ``keep=false/'null_text'``).

    Scale shape: first-occurrence selection is a
    ``min(struct(id, pos, chunk))`` AGGREGATE keyed on md5(chunk) —
    never a window over the chunk hash, whose hot keys (the boilerplate
    being removed!) would serialize into single window partitions. The
    corpus is chunked exactly ONCE (optimization r15: per-doc totals
    are the row-local ``ceil(n_tokens/chunk_words)``, no second
    explode, and the survivor text rides the min struct instead of a
    semi-join back onto a third re-chunking); chunk text crosses
    exactly two exchanges (the hash groupBy — where map-side partials
    collapse duplicates first — and the per-doc reassembly, the a08
    ordered-collect aggregate keyed by document id)."""
    chunks = _doc_chunks(df, id_col, text_col, chunk_words)
    kept = _first_occurrence_survivors(chunks, id_col)
    # same tokenization expression as _doc_chunks, so the count matches
    # the explode's row count exactly (incl. empty text = 1 '' chunk);
    # NULL text yields no chunk rows there and is filtered here
    w = F.split(F.col(text_col), " ")
    totals = (
        df.where(F.col(text_col).isNotNull())
        .select(
            F.col(id_col),
            F.ceil(F.size(w) / chunk_words).cast("long").alias("__n"),
        )
        .groupBy(id_col)
        .agg(F.sum("__n").alias("n_chunks"))
    )
    return _reassemble_chunks(chunks, kept, id_col, totals=totals)


def _first_occurrence_survivors(chunks: DataFrame, id_col: str) -> DataFrame:
    """The chunk rows surviving keep-first: min(struct(id, pos, chunk))
    per chunk hash (an aggregate, never a window over the hot
    boilerplate keys). Shared by the batch operator and the streaming
    ingest twin (review r14: the block lived verbatim in both, so the
    twins could drift).

    The chunk TEXT rides INSIDE the min struct (optimization r15, guide
    §2.4): struct comparison is lexicographic and (id, pos) is unique
    per chunk row, so the text field never decides an ordering — it
    just tags along, and the former semi-join back onto the full
    exploded frame (a second full shuffle of every chunk row, text
    included, plus a third corpus re-chunking in the batch operator) is
    gone. Map-side partial min collapses duplicates before the
    exchange, so the shuffle carries one chunk text per distinct hash
    per map partition — strictly fewer text bytes than the semi-join
    probe side moved."""
    return (
        chunks.groupBy("lh")
        .agg(
            F.min(
                F.struct(
                    F.col(id_col).alias("id"), F.col("pos"), F.col("chunk")
                )
            ).alias("fo")
        )
        .select(
            F.col("fo.id").alias(id_col),
            F.col("fo.pos").alias("pos"),
            F.col("fo.chunk").alias("chunk"),
            "lh",
        )
    )


def _reassemble_chunks(
    chunks: DataFrame, kept: DataFrame, id_col: str,
    totals: DataFrame | None = None,
) -> DataFrame:
    """(id, clean_text, n_chunks, n_dropped): per-doc ordered reassembly
    of the surviving chunks against the full chunk totals — the a08
    ordered-collect aggregate, one shuffle keyed by document id. Shared
    by the batch operator and the streaming ingest twin. ``totals``
    (optimization r15): a caller that can compute per-doc chunk counts
    WITHOUT the exploded frame (row-local ``ceil(n_tokens/k)`` — the
    batch operator) passes them here and skips one full corpus
    re-chunking; the streaming twin keeps the default (its ``chunks``
    is a cached micro-batch frame, so the count is a cache read)."""
    if totals is None:
        totals = chunks.groupBy(id_col).agg(
            F.count(F.lit(1)).alias("n_chunks")
        )
    rebuilt = kept.groupBy(id_col).agg(
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "chunk"))),
                lambda s: s["chunk"],
            ),
            " ",
        ).alias("clean_text"),
        F.count(F.lit(1)).alias("n_kept"),
    )
    return (
        totals.join(rebuilt, on=id_col, how="left")
        .select(
            id_col,
            F.coalesce("clean_text", F.lit("")).alias("clean_text"),
            "n_chunks",
            (F.col("n_chunks") - F.coalesce("n_kept", F.lit(0))).alias(
                "n_dropped"
            ),
        )
    )


def _lh_bucket(col: Column, n_buckets: int) -> Column:
    """Stable bucket id in [0, n_buckets) for a chunk-hash (hex md5
    string) or band-sig (binary) column — the partition key of a
    bucketed checkpoint. xxhash64 accepts both types; pmod folds the
    signed hash non-negative."""
    return F.pmod(F.xxhash64(col), F.lit(int(n_buckets)))


def read_chunk_params(spark, path: str) -> dict:
    """The chunk checkpoint's parameter sidecar as a dict —
    ``{"chunk_words", "n_buckets"}`` — the same shape as its band twin
    :func:`read_band_params` (review r9: the tuple form forced
    magic-index access at call sites, and adding a sidecar field — as
    this round did for bands — silently shifts tuple positions).
    Pre-bucketing sidecars read as n_buckets=0 (flat layout). Memoized
    per (path, sidecar mtime) — see ``_PARAMS_MEMO``."""

    def _load() -> dict:
        got = (
            spark.read.parquet(f"{path}/_chunk_params").collect()[0].asDict()
        )
        return {
            "chunk_words": int(got["chunk_words"]),
            "n_buckets": int(got.get("n_buckets", 0) or 0),
        }

    return _memoized_sidecar(spark, f"{path}/_chunk_params", _load)


def _validate_chunk_words(path: str, stored_cw: int, chunk_words: int) -> None:
    """Raise unless the caller's chunk width matches the sidecar's —
    shared by the reader and the append path of the writer so both fail
    with the same message from ONE sidecar read."""
    if stored_cw != chunk_words:
        raise ValueError(
            f"chunk checkpoint at {path} was written with chunk_words="
            f"{stored_cw}, caller expects {chunk_words}: chunk "
            "boundaries would never align"
        )


def write_chunk_checkpoint(
    corpus_df: DataFrame,
    path: str,
    id_col: str,
    text_col: str,
    chunk_words: int = 10,
    mode: str = "overwrite",
    batch_id: int | None = None,
    n_buckets: int | None = None,
) -> None:
    """Persist a corpus's span-dedup state — the FIRST occurrence
    ``(lh, id, pos)`` of every distinct chunk hash — the between-batches
    twin of d11's band checkpoint for :func:`chunk_dedup_keep_first`
    (VERDICT r7 #8). Re-chunking 100 TB of admitted corpus on every
    incoming batch is the dominant repeated cost; this checkpoint is one
    16-byte hash + two ids per DISTINCT chunk, written once and probed
    by every subsequent :func:`chunk_ingest_batch_idempotent` call. The
    ``chunk_words`` parameter rides a sidecar exactly like the band
    checkpoint's: a mismatched reuse would chunk on different
    boundaries and silently drop nothing.

    ``batch_id`` stamps rows with the writing batch's id (``src_batch``;
    -1 = seed corpus) so the ingest replay exclusion is scoped to the
    current batch's own torn appends — same rule and rationale as
    :func:`write_band_checkpoint` (ADVICE r8). As there, an append
    REQUIRES an explicit batch_id (a silently seed-stamped append would
    sit outside the replay exclusion; ``batch_id=-1`` remains the
    explicit clean-boundary seed-extension assertion), stamped appends
    record the committed high-water mark, and ids below it are refused
    (ADVICE r9 — restarted batch counters over kept state).

    ``n_buckets`` (VERDICT r8 #4) hash-partitions the state by
    ``lhb = pmod(xxhash64(lh), n_buckets)`` so
    :func:`chunk_ingest_batch_idempotent` can prune whole state
    DIRECTORIES its batch cannot possibly match (literal partition
    filter from the batch's own bucket set) instead of scanning the
    full linear state every micro-batch — the known-linear residual
    VERDICT r8 adjudicated. The bucket count rides the sidecar (appends
    must fold new rows into the SAME partition grid or the probe's
    literal filter would miss them); 0 = flat legacy layout. The
    default ``None`` resolves to 64 on a fresh write and to the
    EXISTING sidecar's grid on an append (so appending to a flat or
    differently-sized checkpoint with defaults keeps working); pass an
    explicit int to ASSERT the grid instead. Pruning
    pays off when a micro-batch's distinct chunk count is small against
    ``n_buckets`` or the hash space is hot-skewed; a batch that touches
    every bucket degrades gracefully to the full scan it did before.
    SIZE the grid to the state, not the default: each bucket is a
    partition directory whose per-write commit has a fixed cost
    (measured ~35 ms/dir on local FS, worse on object stores), so aim
    for per-bucket state around file-sized (100 MB-1 GB at scale) — a
    10k-row state over 64 buckets pays more in commits than in data
    (2.75s vs 0.45s flat, measured; the attestation queries use 16).

    An ``append`` onto a directory that has data files but NO parameter
    sidecar is refused (ADVICE r8): that state means a previous writer
    crashed between the data write and the sidecar write, and blindly
    re-stamping the caller's ``chunk_words`` would legitimize rows
    possibly chunked at a different width — the exact mismatch the
    sidecar exists to catch. Recover by re-seeding with
    ``mode='overwrite'``."""
    batch_id = _resolve_append_batch_id(mode, batch_id, "chunk checkpoint")
    batch_fp = None
    if mode == "append" and batch_id >= 0:
        batch_fp = _batch_fingerprint(corpus_df, id_col, text_col)
        _guard_batch_id_monotonic(
            path, batch_id, "chunk checkpoint", fingerprint=batch_fp
        )
    spark = corpus_df.sparkSession
    sidecar_exists = False
    if mode == "append":
        # validate, never re-stamp (the band-checkpoint ADVICE r6 rule);
        # ONE sidecar read serves the width check, the grid check, and
        # the None-grid resolution (the first cut launched three driver
        # jobs here)
        try:
            params = read_chunk_params(spark, path)
            stored_cw = params["chunk_words"]
            stored_nb = params["n_buckets"]
        except Exception:
            stored_cw = stored_nb = None
        if stored_cw is not None:
            sidecar_exists = True
            _validate_chunk_words(path, stored_cw, chunk_words)
            if n_buckets is None:
                n_buckets = stored_nb
            elif stored_nb != n_buckets:
                raise ValueError(
                    f"chunk checkpoint at {path} is bucketed with "
                    f"n_buckets={stored_nb}, caller expects {n_buckets}: "
                    "appended rows would land outside the probe's "
                    "partition grid"
                )
        else:
            try:
                has_data = bool(spark.read.parquet(path).columns)
            except Exception:
                has_data = False
            if has_data:
                raise ValueError(
                    f"chunk checkpoint at {path} has data files but no "
                    "chunk_words sidecar (torn earlier write?): refusing "
                    "to append — existing rows may be chunked at a "
                    "different width. Re-seed with mode='overwrite'."
                )
    if n_buckets is None:
        n_buckets = 64
    firsts = (
        _doc_chunks(corpus_df, id_col, text_col, chunk_words)
        .groupBy("lh")
        .agg(
            F.min(F.struct(F.col(id_col).alias("id"), F.col("pos"))).alias(
                "fo"
            )
        )
        .select("lh", F.col("fo.id").alias(id_col), F.col("fo.pos").alias("pos"))
        .withColumn("src_batch", F.lit(int(batch_id)))
    )
    if n_buckets:
        # repartition ON the partition key first: a plain partitionBy
        # write sprays one file per (task, bucket) pair — up to
        # tasks x n_buckets tiny files PER WRITE, compounding every
        # append; clustered, each bucket gets exactly one file here
        firsts = firsts.withColumn("lhb", _lh_bucket(F.col("lh"), n_buckets))
        firsts.repartition("lhb").write.mode(mode).partitionBy(
            "lhb"
        ).parquet(path)
    else:
        firsts.write.mode(mode).parquet(path)
    # skipped on an append with a validated sidecar in place — the
    # values are guaranteed identical and the overwrite would re-open
    # the torn-sidecar crash window (band twin's rule)
    if not sidecar_exists:
        # local_frame, not createDataFrame — see the band sidecar above
        local_frame(
            spark, [(chunk_words, n_buckets)], "chunk_words int, n_buckets int"
        ).coalesce(1).write.mode("overwrite").parquet(f"{path}/_chunk_params")
    if mode == "append" and batch_id >= 0:
        _mark_batch_committed(path, batch_id, batch_fp or "")


def read_chunk_checkpoint(
    spark,
    path: str,
    id_col: str,
    chunk_words: int = 10,
    buckets: list[int] | None = None,
    params: dict | None = None,
) -> DataFrame:
    """Load a chunk checkpoint written by :func:`write_chunk_checkpoint`
    as ``(lh, id_col, pos, src_batch)``, validating the caller's
    ``chunk_words`` against the sidecar (a mismatch chunks on different
    boundaries — no hash could ever match and every batch would dedup
    against nothing). Pre-src_batch checkpoints read as src_batch=-1
    (seed rows).

    ``buckets``: on a bucketed checkpoint, restrict the read to these
    ``lhb`` partition values as a LITERAL partition filter — the scan
    then never opens the other buckets' files (the VERDICT r8 #4
    pruning path). Ignored on a flat (n_buckets=0) layout, where there
    is nothing to prune.

    ``params``: a sidecar dict the caller already read via
    :func:`read_chunk_params` — skips the second sidecar collect job
    (one driver round-trip per micro-batch in the ingest loop)."""
    if params is None:
        params = read_chunk_params(spark, path)
    stored_cw, stored_nb = params["chunk_words"], params["n_buckets"]
    _validate_chunk_words(path, stored_cw, chunk_words)
    # mergeSchema + coalesce: see read_band_checkpoint — mixed
    # pre/post-src_batch files must read as seed rows (-1), not as NULLs
    # the exclusion filter silently drops. Same scope caveat: a legacy
    # TORN append is indistinguishable from legacy seed rows — run
    # :func:`migrate_chunk_checkpoint_stamps` at a clean boundary before
    # the first post-upgrade ingest.
    df = spark.read.option("mergeSchema", "true").parquet(path)
    if stored_nb and buckets is not None:
        df = df.where(F.col("lhb").isin([int(b) for b in buckets]))
    src = (
        F.coalesce(F.col("src_batch").cast("int"), F.lit(-1))
        if "src_batch" in df.columns
        else F.lit(-1)
    )
    return df.select("lh", id_col, "pos", src.alias("src_batch"))


def chunk_ingest_batch_idempotent(
    batch_df: DataFrame,
    batch_id: int,
    chunk_path: str,
    out_path: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    chunk_words: int = 10,
) -> None:
    """One micro-batch of streaming span dedup, replay-safe — d14's
    incremental form, completing the dedup-family matrix (d11 already
    has it for document-level LSH; VERDICT r7 #8). Each batch: (1) drop
    every chunk whose hash is already in the persisted first-occurrence
    checkpoint — the admitted corpus is never re-chunked; (2) keep the
    within-batch first occurrence of each remaining hash (the same
    min(struct) aggregate as the batch operator — no window over the
    hot boilerplate keys); (3) reassemble surviving spans per document
    and publish to a per-``batch_id`` partition via dynamic partition
    overwrite; (4) append the batch's own new first-occurrences to the
    checkpoint. Batches with increasing ids reproduce
    :func:`chunk_dedup_keep_first` on the concatenated corpus exactly
    (streaming==batch twin test) — PROVIDED doc ids are monotone with
    batch order, the twin test's (and d19's) delivery contract. When a
    later batch delivers a SMALLER id sharing a chunk with an admitted
    doc, the stream keeps the admitted copy (arrival order) while the
    batch operator's min(struct(id, pos)) would keep the smaller id —
    the stream is still a correct keep-first under arrival order, it
    just isn't the id-ordered batch answer (review r14: the claim was
    previously unconditional).

    Replay safety follows the torn-append rule of
    :func:`ingest_batch_idempotent`, re-scoped per ADVICE r8: the
    checkpoint rows STAMPED with the current ``batch_id``
    (``src_batch == batch_id`` — the current batch's own possibly-torn
    prior append, and nothing else) are excluded by a row-local filter,
    so a replay — over a complete OR torn previous append — sees exactly
    the pre-batch state and recomputes the identical output, which the
    scoped dynamic overwrite then rewrites byte-identically. Scoping by
    writer batch id (not by the batch's doc ids) means an id
    re-delivered in a LATER batch still probes against its own
    earlier-batch spans and dedups correctly instead of being silently
    re-admitted. Checkpoint appends may duplicate (lh, id, pos) rows on
    replay; harmless — the probe is a left_anti on ``lh``. Upgrade
    caveat (band twin's rule): a checkpoint with unstamped pre-stamp
    rows needs :func:`migrate_chunk_checkpoint_stamps` at a clean
    boundary before the first post-upgrade ingest. Batch-id collision
    guard (ADVICE r9, band twin's rule): committed batches drop an
    O_EXCL high-water marker and ``batch_id < hwm`` raises — a batch
    counter restarted at 0 over kept state (new streaming checkpoint,
    second pipeline on one state path) would otherwise exclude a prior
    incarnation's committed same-id spans from the probe and clobber
    its same-id output partition; ``== hwm`` stays allowed as the
    newest-batch replay.

    State pruning (VERDICT r8 #4): on a bucketed checkpoint the probe
    first collects the batch's own DISTINCT ``lhb`` bucket ids — a
    driver-side list bounded by the sidecar's ``n_buckets``, the same
    bounded-params class as the 1-row bounds sidecars — and reads the
    state through that literal partition filter, so buckets the batch
    cannot match are never opened. The anti-join itself is unchanged;
    only the state scan shrinks. A batch whose chunks span every bucket
    reads everything, exactly as the flat layout did.

    Degenerate text follows the batch operator
    (:func:`chunk_dedup_keep_first`): a NULL-text doc has no chunks and
    is absent from the batch's output partition — gate upstream if it
    must be surfaced."""
    if int(batch_id) < 0:
        raise ValueError(
            f"batch_id must be >= 0 (got {batch_id}): -1 is reserved for "
            "seed-corpus checkpoint rows and would exclude them"
        )
    batch_fp = _batch_fingerprint(batch_df, id_col, text_col)
    _guard_batch_id_monotonic(
        chunk_path, batch_id, "chunk checkpoint", fingerprint=batch_fp
    )
    s = batch_df.sparkSession
    # chunks feeds the lhb bucket probe, the fresh->firsts->kept chain
    # (twice within the output write's own branches), and totals — cache
    # the micro-batch-sized exploded frame for the batch scope so the
    # split/transform/md5 chunking runs once, not once per consumer (the
    # same per-consumer-recompute fix as batch_bands in the band twin;
    # this is a BATCH frame, not the corpus — the never-cache-exploded-
    # corpus rule doesn't apply)
    chunks = _doc_chunks(batch_df, id_col, text_col, chunk_words).cache()
    # EVERYTHING after the cache sits inside the try: the sidecar read /
    # chunk_words validation and the bucket-probe collect can all raise,
    # and in a long-lived foreachBatch session a raise that skipped the
    # finally would pin another exploded batch frame in executor storage
    # on every failed retry
    kept = None
    try:
        params = read_chunk_params(s, chunk_path)
        n_buckets = params["n_buckets"]
        buckets = None
        if n_buckets:
            buckets = sorted(
                r.lhb
                for r in chunks.select(
                    _lh_bucket(F.col("lh"), n_buckets).alias("lhb")
                )
                .distinct()
                .collect()
            )
        prior = read_chunk_checkpoint(
            s, chunk_path, id_col, chunk_words, buckets=buckets,
            params=params,
        )
        prior = prior.where(
            F.col("src_batch") != int(batch_id)
        ).drop("src_batch")
        fresh = chunks.join(prior.select("lh"), on="lh", how="left_anti")
        # kept feeds TWO actions (the output write and the checkpoint
        # append) — cache it for the batch scope so the state anti-join
        # and first-occurrence aggregate run once, not twice;
        # micro-batch sized, released in the finally below
        kept = _first_occurrence_survivors(fresh, id_col).cache()
        out = _reassemble_chunks(chunks, kept, id_col).withColumn(
            "ingest_batch", F.lit(int(batch_id))
        )
        (
            out.write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("ingest_batch")
            .parquet(out_path)
        )
        # the batch's own new first occurrences (post-anti-join, so this
        # appends ONLY the batch's additions, never corpus re-chunks),
        # stamped with this batch's id for the replay-exclusion scope and
        # folded into the checkpoint's partition grid when bucketed
        add = kept.select("lh", id_col, "pos").withColumn(
            "src_batch", F.lit(int(batch_id))
        )
        if n_buckets:
            # cluster on the partition key (see write_chunk_checkpoint):
            # one file per touched bucket per append, not per (task,
            # bucket) — otherwise the state the pruning exists to keep
            # cheap degrades into a tiny-file swamp
            add = add.withColumn("lhb", _lh_bucket(F.col("lh"), n_buckets))
            add.repartition("lhb").write.mode("append").partitionBy(
                "lhb"
            ).parquet(chunk_path)
        else:
            add.write.mode("append").parquet(chunk_path)
        # commit marker LAST (band twin's rule): a crash above leaves it
        # absent and the replay re-enters as batch_id >= hwm
        _mark_batch_committed(chunk_path, batch_id, batch_fp)
    finally:
        if kept is not None:
            kept.unpersist()
        chunks.unpersist()


def streaming_chunk_dedup_ingest(
    spark,
    source_dir: str,
    schema: str,
    chunk_path: str,
    out_path: str,
    stream_checkpoint: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    chunk_words: int = 10,
    max_files_per_trigger: int = 1,
    compact_every: int = 0,
):
    """Streaming driver for :func:`chunk_ingest_batch_idempotent` — the
    d14 twin of :func:`streaming_neardup_ingest`, same ``availableNow``
    + ``foreachBatch`` shape, same restart semantics (the streaming
    checkpoint records consumed source files; the per-batch dynamic
    overwrite makes mid-batch crash replays byte-identical), same
    ``compact_every`` maintenance cadence (compact AFTER every Nth
    batch's commit marker lands — the in-flight refusal can never fire
    from inside the loop; 0 disables). Seed the chunk checkpoint once
    from the initial corpus with :func:`write_chunk_checkpoint`.
    Returns a ``DataStreamWriter``; callers ``.start()`` it."""
    read_chunk_checkpoint(spark, chunk_path, id_col, chunk_words)

    def _process(batch_df: DataFrame, batch_id: int) -> None:
        chunk_ingest_batch_idempotent(
            batch_df, batch_id, chunk_path, out_path,
            id_col=id_col, text_col=text_col, chunk_words=chunk_words,
        )
        if compact_every and (int(batch_id) + 1) % compact_every == 0:
            compact_chunk_checkpoint(spark, chunk_path)

    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(source_dir)
    )
    return (
        stream.writeStream.foreachBatch(_process)
        .option("checkpointLocation", stream_checkpoint)
        .trigger(availableNow=True)
    )
