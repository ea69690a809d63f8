"""Unit tests for sinks, set-op edge cases, and operators without a
cross-engine oracle (SURVEY.md §5.2 items 1 and 4)."""

from __future__ import annotations

import glob
import json
import os

from pyspark.sql import functions as F

from pyspark_bigdata_sars_cov_2_analysis_spark.io.writers import (
    write_json_single_file,
    write_parquet,
)
from pyspark_bigdata_sars_cov_2_analysis_spark.operators import setops, sorts
from tests.conftest import SF_TEST


def test_json_single_file_contract(spark, tmp_path):
    """S6 — coalesce(1) JSON-lines: exactly one part file, rereadable
    (ref: spark/jobs/cases_time_analysis.py:309-314)."""
    df = spark.range(100).select(
        F.col("id"), (F.col("id") * 2).alias("doubled")
    )
    out = str(tmp_path / "single")
    write_json_single_file(df, out)
    parts = glob.glob(os.path.join(out, "part-*"))
    assert len(parts) == 1
    with open(parts[0]) as f:
        lines = [json.loads(line) for line in f]
    assert len(lines) == 100 and lines[0].keys() == {"id", "doubled"}
    back = spark.read.json(out)
    assert back.count() == 100


def test_parquet_partitioned_writer(spark, tmp_path):
    df = spark.read.parquet(f"{SF_TEST}/orders.parquet")
    out = str(tmp_path / "by_status")
    write_parquet(df, out, partition_by=["o_orderstatus"])
    # partition dirs exist → partition pruning is possible on read
    dirs = {p.split("=")[-1] for p in glob.glob(os.path.join(out, "o_orderstatus=*"))}
    assert dirs == {"F", "O", "P"}
    pruned = spark.read.parquet(out).where(F.col("o_orderstatus") == "F")
    assert pruned.count() == df.where(F.col("o_orderstatus") == "F").count()


def test_union_by_name_missing_columns(spark):
    """U1 — unionByName with allowMissingColumns (the safe version of the
    reference's positional unions)."""
    a = spark.createDataFrame([(1, "x")], "id int, extra string")
    b = spark.createDataFrame([(2,)], "id int")
    out = a.unionByName(b, allowMissingColumns=True)
    rows = {(r["id"], r["extra"]) for r in out.collect()}
    assert rows == {(1, "x"), (2, None)}


def test_intersect_except_all_duplicates(spark):
    """U3 — *All variants preserve duplicate multiplicity."""
    a = spark.createDataFrame([(1,), (1,), (2,)], "v int")
    b = spark.createDataFrame([(1,), (2,), (2,)], "v int")
    assert sorted(
        r["v"] for r in setops.intersect_rows(a, b, keep_duplicates=True).collect()
    ) == [1, 2]
    assert [r["v"] for r in setops.except_rows(a, b, keep_duplicates=True).collect()] == [1]


def test_seeded_split_reproducible(spark):
    df = spark.read.parquet(f"{SF_TEST}/customer.parquet")
    a1, b1 = sorts.seeded_split(df, [0.8, 0.2], seed=2020)
    a2, b2 = sorts.seeded_split(df, [0.8, 0.2], seed=2020)
    assert a1.count() == a2.count() and b1.count() == b2.count()
    assert sorted(r["c_custkey"] for r in b1.collect()) == sorted(
        r["c_custkey"] for r in b2.collect()
    )


def test_recode_values_default_passthrough(spark):
    from pyspark_bigdata_sars_cov_2_analysis_spark.operators.relational import (
        recode_values,
    )

    df = spark.createDataFrame([("a",), ("b",), ("c",)], "k string")
    out = recode_values(df, "k", {"a": "A"}, default=None)
    assert {r["k"] for r in out.collect()} == {"A", "b", "c"}


def test_mlp_inference_matches_numpy(spark):
    """u07's real-MLP UDF must equal a driver-side numpy forward pass with
    the same seeded weights — the golden that replaces a SQL oracle for
    non-SQL-expressible tensor compute."""
    import numpy as np

    from pyspark_bigdata_sars_cov_2_analysis_spark.plans import QUERIES
    from pyspark_bigdata_sars_cov_2_analysis_spark.plans.registry import table
    from pyspark_bigdata_sars_cov_2_analysis_spark.udf.pandas_udfs import _load_mlp

    got = {
        r["vec_id"]: r["score"]
        for r in QUERIES["u07_mlp_inference"](spark, SF_TEST).collect()
    }
    emb = table(spark, SF_TEST, "embeddings").collect()
    model = _load_mlp()
    batch = np.stack([np.asarray(r["embedding"], dtype="float64") for r in emb])
    want = np.floor(model(batch) * 1e6 + 0.5) / 1e6
    assert len(got) == len(emb) > 0
    for r, w in zip(emb, want):
        assert got[r["vec_id"]] == w


def test_salted_join_equivalence(spark):
    """salted_join must return exactly the plain join's rows (skew salting
    is a physical rewrite, not a semantic one)."""
    from pyspark_bigdata_sars_cov_2_analysis_spark.operators import joins
    from pyspark_bigdata_sars_cov_2_analysis_spark.plans.registry import table
    from tests.conftest import SF_TEST

    o = table(spark, SF_TEST, "orders").select("o_orderkey", "o_totalprice")
    li = table(spark, SF_TEST, "lineitem").select("l_orderkey", "l_quantity")
    plain = li.join(o, on=li.l_orderkey == o.o_orderkey)
    salted = joins.salted_join(li, o, "l_orderkey", "o_orderkey", n_salts=5)
    assert "__salt" not in salted.columns
    assert sorted(map(tuple, plain.collect())) == sorted(
        map(tuple, salted.select(*plain.columns).collect())
    )


def test_salted_join_spreads_hot_key(spark):
    """A pathological single-key frame must land in n_salts distinct
    (key, salt) groups — the whole point of the rewrite."""
    from pyspark.sql import functions as F

    from pyspark_bigdata_sars_cov_2_analysis_spark.operators import joins

    hot = spark.range(1000).select(F.lit(7).alias("k"), F.col("id").alias("payload"))
    dim = spark.range(10).select(F.col("id").alias("k2"), F.lit("x").alias("attr"))
    out = joins.salted_join(hot, dim, "k", "k2", n_salts=4)
    assert out.count() == 1000
    salts = (
        hot.withColumn(
            "__salt", F.pmod(F.xxhash64("k", "payload"), F.lit(4)).cast("int")
        )
        .select("__salt")
        .distinct()
        .count()
    )
    assert salts == 4


def test_bucketed_join_has_no_shuffle(spark, tmp_path):
    """Two tables bucketed on the join key must sort-merge join with zero
    Exchange nodes — the co-located-join contract write_bucketed_table
    exists to provide."""
    from pyspark.sql import functions as F

    from pyspark_bigdata_sars_cov_2_analysis_spark.io.writers import (
        write_bucketed_table,
    )
    from pyspark_bigdata_sars_cov_2_analysis_spark.plans.registry import table
    from tests.conftest import SF_TEST

    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        o = table(spark, SF_TEST, "orders")
        li = table(spark, SF_TEST, "lineitem")
        write_bucketed_table(o, "t_orders_b", "o_orderkey", 4, "o_orderkey")
        write_bucketed_table(li, "t_lineitem_b", "l_orderkey", 4, "l_orderkey")
        ob = spark.table("t_orders_b")
        lb = spark.table("t_lineitem_b")
        j = lb.join(ob, on=lb.l_orderkey == ob.o_orderkey).select(
            "l_orderkey", "l_quantity", "o_totalprice"
        )
        jvm = spark._jvm
        plan = j._jdf.queryExecution().explainString(
            jvm.org.apache.spark.sql.execution.ExplainMode.fromString("simple")
        )
        assert "Exchange" not in plan, plan
        assert j.count() == li.count()
    finally:
        spark.sql("DROP TABLE IF EXISTS t_orders_b")
        spark.sql("DROP TABLE IF EXISTS t_lineitem_b")
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")


def test_orc_roundtrip_preserves_schema_and_values(spark, tmp_path):
    from pyspark_bigdata_sars_cov_2_analysis_spark.io.readers import read_orc
    from pyspark_bigdata_sars_cov_2_analysis_spark.io.writers import write_orc
    from pyspark_bigdata_sars_cov_2_analysis_spark.plans.registry import table
    from tests.conftest import SF_TEST

    o = table(spark, SF_TEST, "orders")
    path = str(tmp_path / "orders_orc")
    write_orc(o, path)
    back = read_orc(spark, path)
    assert back.schema == o.schema
    assert sorted(map(tuple, back.collect())) == sorted(map(tuple, o.collect()))


def test_text_reader_lines_and_wholefile(spark, tmp_path):
    from pyspark_bigdata_sars_cov_2_analysis_spark.io.readers import read_text

    p = tmp_path / "corpus"
    p.mkdir()
    (p / "a.txt").write_text("line one\nline two\n")
    (p / "b.txt").write_text("solo\n")
    lines = read_text(spark, str(p))
    assert lines.count() == 3
    whole = read_text(spark, str(p), whole_file=True)
    assert whole.count() == 2


def test_dynamic_partition_overwrite_is_incremental(spark, tmp_path):
    """overwrite_partitions must replace ONLY the partitions present in
    the incoming frame — a re-run backfill of one day cannot wipe the
    rest of the table (which static overwrite would)."""
    from pyspark_bigdata_sars_cov_2_analysis_spark.io.writers import (
        overwrite_partitions,
        write_parquet,
    )

    path = str(tmp_path / "days")
    base = spark.createDataFrame(
        [("2020-01-01", 1, 10.0), ("2020-01-01", 2, 20.0),
         ("2020-01-02", 3, 30.0)],
        "day string, id int, v double",
    )
    write_parquet(base, path, partition_by=["day"])
    # backfill day 2 with corrected rows; day 1 must survive
    fix = spark.createDataFrame(
        [("2020-01-02", 3, 33.0), ("2020-01-02", 4, 44.0)],
        "day string, id int, v double",
    )
    overwrite_partitions(fix, path, ["day"])
    back = spark.read.parquet(path)
    # partition-column type inference reads 'day' back as a DATE — compare
    # its string form
    got = sorted(
        map(tuple, back.select(F.col("day").cast("string"), "id", "v").collect())
    )
    assert got == [("2020-01-01", 1, 10.0), ("2020-01-01", 2, 20.0),
                   ("2020-01-02", 3, 33.0), ("2020-01-02", 4, 44.0)]
    # idempotent: running the same backfill again changes nothing
    overwrite_partitions(fix, path, ["day"])
    assert spark.read.parquet(path).count() == 4


def test_partitioned_layout_prunes_on_read(spark, tmp_path):
    """A filter on the partition column must prune at planning time —
    PartitionFilters in the scan, and only the matching day's files read."""
    from pyspark_bigdata_sars_cov_2_analysis_spark.io.writers import write_parquet
    from pyspark_bigdata_sars_cov_2_analysis_spark.plans.registry import table

    path = str(tmp_path / "events_by_day")
    e = table(spark, SF_TEST, "events").withColumn(
        "day", F.date_format("ts", "yyyy-MM-dd")
    )
    write_parquet(e, path, partition_by=["day"])
    days = [r[0] for r in spark.read.parquet(path).select("day").distinct().collect()]
    assert len(days) > 1, "need multiple partitions for pruning to mean anything"
    one = spark.read.parquet(path).where(F.col("day") == sorted(days)[0])
    plan = one._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters: [" in plan and "day" in plan.split(
        "PartitionFilters"
    )[1].split("]")[0], plan
    assert one.count() == e.where(F.date_format("ts", "yyyy-MM-dd") == sorted(days)[0]).count()


def test_python_datasource_synthetic_docs(spark):
    """Spark 4 Python Data Source: deterministic, partition-parallel, and
    re-sliceable — the same corpus regardless of partition count."""
    from pyspark_bigdata_sars_cov_2_analysis_spark.io.pysource import (
        register_synthetic_docs,
    )

    register_synthetic_docs(spark)
    read = lambda parts: (  # noqa: E731
        spark.read.format("synthetic_docs")
        .option("n", 300).option("parts", parts).load()
    )
    df = read(4)
    assert df.rdd.getNumPartitions() == 4
    assert df.count() == 300 and df.select("doc_id").distinct().count() == 300
    a = sorted(map(tuple, df.collect()))
    assert a == sorted(map(tuple, read(4).collect()))   # rerun-stable
    assert a == sorted(map(tuple, read(7).collect()))   # slicing-invariant


def test_python_datasource_planted_duplicates(spark):
    """dup_every plants exact duplicates with a count known by
    construction — the end-to-end ground truth for the dedup pipeline."""
    from pyspark_bigdata_sars_cov_2_analysis_spark.io.pysource import (
        register_synthetic_docs,
    )
    from pyspark_bigdata_sars_cov_2_analysis_spark.llmdata.dedup import (
        exact_duplicates,
    )

    register_synthetic_docs(spark)
    # non-divisible n included: ground truth is one 2-copy group per
    # multiple of k whose neighbor id exists, i.e. len(range(0, n-1, k))
    for n, k in ((400, 10), (405, 10), (401, 10)):
        df = (
            spark.read.format("synthetic_docs")
            .option("n", n).option("parts", 4).option("dup_every", k).load()
        )
        dup_groups = exact_duplicates(df, "doc_id", "text").where(
            F.col("n_copies") > 1
        )
        want = len(range(0, n - 1, k))
        assert dup_groups.count() == want, (n, k)
        assert {r["n_copies"] for r in dup_groups.collect()} == {2}


def test_json_corrupt_record_capture(spark, tmp_path):
    """PERMISSIVE + declared corrupt column: malformed JSON lines are
    captured with their raw text (quarantinable, countable) while good
    rows parse normally — not silently nulled, not batch-failing."""
    from pyspark.sql.types import LongType, StringType, StructType

    from pyspark_bigdata_sars_cov_2_analysis_spark.io.readers import read_json

    p = str(tmp_path / "mixed.jsonl")
    with open(p, "w") as f:
        f.write('{"id": 1, "name": "ok"}\n')
        f.write('{"id": 2, "name": "also ok"}\n')
        f.write('{"id": 3, "name": broken!!\n')
    schema = (
        StructType()
        .add("id", LongType())
        .add("name", StringType())
    )
    df = read_json(spark, p, schema=schema, corrupt_column="_bad").cache()
    good = df.where(F.col("_bad").isNull())
    bad = df.where(F.col("_bad").isNotNull())
    assert sorted((r.id, r.name) for r in good.collect()) == [
        (1, "ok"), (2, "also ok")
    ]
    assert bad.count() == 1 and "broken" in bad.collect()[0]._bad
    df.unpersist()
    # the caller's schema object must not have grown
    assert len(schema.fields) == 2
    import pytest
    with pytest.raises(ValueError):
        read_json(spark, p, corrupt_column="_bad")


def test_xml_roundtrip(spark, tmp_path):
    """Spark 4 native XML source: write a frame as XML, read it back with
    an explicit schema and rowTag, and get the same multiset — the S1/S2
    scan family extended to the third text format."""
    from pyspark_bigdata_sars_cov_2_analysis_spark.io.readers import read_xml
    from pyspark_bigdata_sars_cov_2_analysis_spark.plans.registry import table

    n = table(spark, SF_TEST, "nation").select(
        "n_nationkey", "n_name", "n_regionkey"
    )
    path = str(tmp_path / "nation_xml")
    n.write.format("xml").option("rowTag", "nation").mode("overwrite").save(path)
    back = read_xml(
        spark,
        path,
        "nation",
        schema="n_nationkey int, n_name string, n_regionkey int",
    )
    assert sorted(map(tuple, back.collect())) == sorted(map(tuple, n.collect()))


def test_range_sorted_write_disjoint_file_ranges(spark, tmp_path):
    """write_range_sorted must produce files whose footer min/max ranges
    on the sort column are pairwise disjoint (the zone-map layout a
    pushed range predicate prunes against), and the re-read data must be
    the same multiset. An unsorted write of the same frame is the
    negative control — its per-file ranges all overlap."""
    import pyarrow.parquet as pq

    from pyspark_bigdata_sars_cov_2_analysis_spark.io.writers import (
        write_range_sorted,
    )
    from pyspark_bigdata_sars_cov_2_analysis_spark.plans.registry import table

    o = table(spark, SF_TEST, "orders").select("o_orderkey", "o_totalprice")

    def file_ranges(path):
        import glob
        out = []
        for f in sorted(glob.glob(f"{path}/*.parquet")):
            md = pq.read_metadata(f)
            idx = md.schema.names.index("o_totalprice")
            lo = min(md.row_group(i).column(idx).statistics.min
                     for i in range(md.num_row_groups))
            hi = max(md.row_group(i).column(idx).statistics.max
                     for i in range(md.num_row_groups))
            out.append((lo, hi))
        return out

    sorted_path = str(tmp_path / "sorted")
    write_range_sorted(o, sorted_path, "o_totalprice", n_partitions=4)
    ranges = sorted(file_ranges(sorted_path))
    assert len(ranges) >= 3, ranges
    for (_, hi_a), (lo_b, _) in zip(ranges, ranges[1:]):
        assert hi_a <= lo_b, f"overlapping file ranges: {ranges}"

    plain_path = str(tmp_path / "plain")
    o.repartition(4).write.parquet(plain_path)
    plain = sorted(file_ranges(plain_path))
    overlaps = sum(
        1 for (_, hi_a), (lo_b, _) in zip(plain, plain[1:]) if hi_a > lo_b
    )
    assert overlaps > 0, plain  # control: hash layout has no clustering

    got = sorted(
        r.o_orderkey for r in spark.read.parquet(sorted_path).collect()
    )
    want = sorted(r.o_orderkey for r in o.collect())
    assert got == want


def test_hot_shingle_corpus_dispatches_prefix(spark):
    """hot_every plants a shingle with document frequency n/h — the skew
    regime where the measured auto-dispatch must choose the prefix
    variant (the README probe corpus: at n=20k/hot_every=2 prefix is
    3.4× faster than naive, 24.4s→7.1s, identical 200 pairs). Pins both
    the planted skew (l_max == n/h) and the dispatch decision."""
    from pyspark_bigdata_sars_cov_2_analysis_spark.io.pysource import (
        register_synthetic_docs,
    )
    from pyspark_bigdata_sars_cov_2_analysis_spark.llmdata.dedup import (
        choose_jaccard_variant,
    )

    register_synthetic_docs(spark)
    hot = (
        spark.read.format("synthetic_docs")
        .option("n", 1000).option("parts", 4).option("hot_every", 2).load()
    )
    # exact stat pin needs the full scan; the default (sampled) chooser
    # must reach the same decision
    variant, stats = choose_jaccard_variant(
        hot, "doc_id", "text", threshold=0.7, sample_fraction=None
    )
    assert stats["l_max"] == 500, stats  # the planted hot shingle
    assert variant == "prefix", stats
    variant_sampled, _ = choose_jaccard_variant(
        hot, "doc_id", "text", threshold=0.7
    )
    assert variant_sampled == "prefix"
    # the same corpus WITHOUT the hot shingle must dispatch naive — the
    # decision is driven by the planted skew, not corpus size
    plain = (
        spark.read.format("synthetic_docs")
        .option("n", 1000).option("parts", 4).load()
    )
    for frac in (None, 0.25):
        variant_plain, stats_plain = choose_jaccard_variant(
            plain, "doc_id", "text", threshold=0.7, sample_fraction=frac
        )
        assert variant_plain == "naive", (frac, stats_plain)


_AUDIT_PROBE = r"""
import json, sys
sys.path.insert(0, {repo!r})
from pyspark.sql import SparkSession
from pyspark.sql import functions as F

spark = (
    SparkSession.builder.master("local[2]")
    .appName("audit-metrics-probe")
    .config("spark.ui.enabled", "false")
    .getOrCreate()
)
from pyspark_bigdata_sars_cov_2_analysis_spark.io.writers import (
    write_json_single_file,
)
from pyspark_bigdata_sars_cov_2_analysis_spark.plans.registry import table

li = (
    table(spark, {sf!r}, "lineitem")
    .where(F.col("l_quantity") < 30)
    .select("l_orderkey", "l_quantity", "l_tax", "l_returnflag")
)
metrics = write_json_single_file(
    li,
    {out!r},
    audit_metrics={{
        "n_rows": F.count(F.lit(1)),
        "qty_total": F.sum("l_quantity"),
        "null_taxes": F.sum(F.col("l_tax").isNull().cast("int")),
    }},
)
truth = li.agg(
    F.count(F.lit(1)).alias("n"),
    F.sum("l_quantity").alias("q"),
    F.sum(F.col("l_tax").isNull().cast("int")).alias("nc"),
).collect()[0]
written = spark.read.json({out!r}).count()
print("AUDIT:" + json.dumps({{
    "metrics": {{k: float(v) for k, v in metrics.items()}},
    "n": float(truth.n), "q": float(truth.q), "nc": float(truth.nc),
    "written": written,
}}))
spark.stop()
"""


def test_write_json_audit_metrics(tmp_path):
    """X-family operational pattern, promoted to engine API:
    ``write_json_single_file(..., audit_metrics=...)`` attaches an
    ``Observation`` so audit metrics (row counts, sums, null tallies)
    accumulate DURING the write job — at 100 TB this replaces a second
    full-scan validation pass with a free piggyback on the write.

    Runs in an isolated interpreter (the ``test_env_contract`` subprocess
    pattern) because the first ``observe()`` on a session initializes its
    non-serializable ``ObservationManager``, after which MLlib models
    whose ``trainingSummary`` references the session fail task
    serialization (``NotSerializableException: ObservationManager`` —
    this broke ``pipelines/clinical.py``'s bench when the round-6 demo
    ran on the shared fixture). See the warning in ``io/writers.py``."""
    import subprocess
    import sys

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    out = str(tmp_path / "audited")
    proc = subprocess.run(
        [sys.executable, "-c",
         _AUDIT_PROBE.format(repo=repo, sf=SF_TEST, out=out)],
        capture_output=True, text=True, timeout=300, cwd=repo,
    )
    lines = [l for l in proc.stdout.splitlines() if l.startswith("AUDIT:")]
    assert lines, f"probe produced no audit line\n{proc.stdout}\n{proc.stderr}"
    got = json.loads(lines[-1][len("AUDIT:"):])
    m = got["metrics"]
    assert m["n_rows"] == got["n"]
    assert abs(m["qty_total"] - got["q"]) < 1e-6
    assert m["null_taxes"] == got["nc"]
    # the write itself happened, in the same job the metrics rode on
    assert got["written"] == got["n"] > 0


def test_quantized_sum_arrow_null_elements():
    """u08 worker edge cases, driven as plain Arrow batches (no Spark):
    a NULL list row AND a null element INSIDE a list must both yield
    NULL qsum (F.aggregate-style propagation). Before the round-7 fix,
    element nulls became NaN whose int64 cast is undefined garbage."""
    import pyarrow as pa

    from pyspark_bigdata_sars_cov_2_analysis_spark.udf.pandas_udfs import (
        quantized_sum_arrow,
    )

    emb = pa.array(
        [[0.5, 1.0], None, [0.25, None], []],
        type=pa.list_(pa.float64()),
    )
    batch = pa.RecordBatch.from_arrays(
        [pa.array([1, 2, 3, 4], type=pa.int64()), emb],
        ["vec_id", "embedding"],
    )
    (out,) = list(quantized_sum_arrow(iter([batch])))
    assert out.column("qsum").to_pylist() == [16384 + 32768, None, None, 0]
    # sliced batches keep absolute offsets into the shared values buffer
    (tail,) = list(quantized_sum_arrow(iter([batch.slice(2)])))
    assert tail.column("qsum").to_pylist() == [None, 0]


def test_zorder_value_bit_exact(spark):
    """zorder_value must implement the exact Morton interleave (x bits at
    even positions, y at odd) — checked against an independent pure-Python
    reference over a sweep of coordinates, including the grid corners."""
    def z_ref(x, y, bits=8):
        z = 0
        for i in range(bits):
            z |= ((x >> i) & 1) << (2 * i)
            z |= ((y >> i) & 1) << (2 * i + 1)
        return z

    pts = [(0, 0), (1, 0), (0, 1), (3, 5), (255, 0), (0, 255), (255, 255),
           (170, 85), (128, 64)]
    df = spark.createDataFrame(pts, "x: long, y: long")
    got = {
        (r.x, r.y): r.z
        for r in df.select(
            "x", "y",
            sorts.zorder_value([F.col("x"), F.col("y")], bits=8).alias("z"),
        ).collect()
    }
    assert got == {(x, y): z_ref(x, y) for x, y in pts}


def test_zorder_write_bounds_both_dims(spark, tmp_path):
    """write_zorder's defining property vs a 1-D range sort: on a full
    256×256 grid split into 16 files, EVERY z-ordered file's footer
    min/max must bound BOTH dimensions to a small tile, while the
    x-sorted control bounds x but leaves y spanning the full 0..255 range
    in every file. This is the layout fact that lets one copy of a 100 TB
    table serve pushed predicates on either column."""
    import pyarrow.parquet as pq

    from pyspark_bigdata_sars_cov_2_analysis_spark.io.writers import (
        write_range_sorted,
        write_zorder,
    )

    grid = spark.range(0, 256 * 256).select(
        (F.col("id") % 256).alias("x"), (F.col("id") / 256).cast("long").alias("y")
    )

    def ranges(path, col):
        out = []
        for f in sorted(glob.glob(f"{path}/*.parquet")):
            md = pq.read_metadata(f)
            idx = md.schema.names.index(col)
            lo = min(md.row_group(i).column(idx).statistics.min
                     for i in range(md.num_row_groups))
            hi = max(md.row_group(i).column(idx).statistics.max
                     for i in range(md.num_row_groups))
            out.append((lo, hi))
        return out

    def admitting(path, col, v):
        """Files a zone-map reader must open for the predicate col = v."""
        return sum(1 for lo, hi in ranges(path, col) if lo <= v <= hi)

    zpath = str(tmp_path / "zorder")
    write_zorder(grid, zpath, ["x", "y"], bits=8, n_partitions=16)
    xpath = str(tmp_path / "xsorted")
    write_range_sorted(grid, xpath, "x", n_partitions=16)
    n_z = len(ranges(zpath, "x"))
    n_x = len(ranges(xpath, "x"))
    assert n_z >= 8 and n_x >= 8, (n_z, n_x)

    # The z-curve jumps across the full coordinate range at major quadrant
    # boundaries, so one or two files legitimately span everything — the
    # layout property is about PRUNING COUNTS, not per-file worst case:
    # a point predicate on EITHER dimension must let the footer stats
    # skip most z-ordered files, while the 1-D control prunes only its
    # sort column and must open EVERY file for the other one.
    assert admitting(zpath, "x", 100) <= n_z // 2
    assert admitting(zpath, "y", 100) <= n_z // 2
    assert admitting(xpath, "x", 100) <= 2          # 1-D sort: x is perfect
    assert admitting(xpath, "y", 100) == n_x        # ...but y is unprunable
    # and MOST z-files are genuinely tight tiles in both dims
    for col in ("x", "y"):
        tight = sorted(hi - lo for lo, hi in ranges(zpath, col))
        assert tight[n_z // 2] <= 128, tight

    # round-trip multiset check
    assert spark.read.parquet(zpath).count() == 256 * 256
    got = spark.read.parquet(zpath).agg(
        F.sum(F.col("x") * 65536 + F.col("y")).alias("s")
    ).first().s
    want = grid.agg(F.sum(F.col("x") * 65536 + F.col("y")).alias("s")).first().s
    assert got == want


def test_time_range_frame_gap_semantics(spark):
    """w07's reason to exist: on gapped days a ROWS frame silently pulls
    stale rows across the gap while a RANGE frame shrinks. Planted series
    day 1,2,3,10 (n=1 each): at day 10 ROWS-3 sums 4, RANGE-3-days sums 1."""
    from pyspark.sql.window import Window

    daily = spark.createDataFrame(
        [("a", "2021-01-01", 1), ("a", "2021-01-02", 1),
         ("a", "2021-01-03", 1), ("a", "2021-01-10", 1)],
        "event_type: string, day: string, n: long",
    ).select("event_type", F.to_date("day").alias("d"), "n")
    rows_w = Window.partitionBy("event_type").orderBy("d").rowsBetween(-3, 0)
    range_w = (
        Window.partitionBy("event_type")
        .orderBy(F.unix_date(F.col("d")))
        .rangeBetween(-3, 0)
    )
    out = {
        r.d.isoformat(): (r.rows_sum, r.range_sum)
        for r in daily.select(
            "d",
            F.sum("n").over(rows_w).alias("rows_sum"),
            F.sum("n").over(range_w).alias("range_sum"),
        ).collect()
    }
    assert out["2021-01-03"] == (3, 3)   # contiguous: frames agree
    assert out["2021-01-10"] == (4, 1)   # gapped: ROWS leaks, RANGE shrinks


def test_parquet_merge_schema_read(spark, tmp_path):
    """The read side of u12's schema evolution: a table whose later files
    carry an extra column must surface it with mergeSchema (old files
    null-padded), while documenting that the default single-footer read
    may drop it. Written as two append generations of one directory."""
    from pyspark_bigdata_sars_cov_2_analysis_spark.io.readers import (
        read_parquet,
    )

    path = str(tmp_path / "evolving")
    spark.createDataFrame(
        [(1, "a"), (2, "b")], "id: long, v: string"
    ).write.parquet(path)
    spark.createDataFrame(
        [(3, "c", 30.0)], "id: long, v: string, score: double"
    ).write.mode("append").parquet(path)

    merged = read_parquet(spark, path, merge_schema=True)
    assert set(merged.columns) == {"id", "v", "score"}
    rows = {r.id: r.score for r in merged.collect()}
    assert rows == {1: None, 2: None, 3: 30.0}
    # and the whole multiset survives
    assert sorted(r.id for r in merged.collect()) == [1, 2, 3]


def test_csv_roundtrip_preserves_values(spark, tmp_path):
    """S1 write side: header CSV out, schema-declared read back, same
    multiset (CSV carries no types, so the read declares them — the
    same contract read_csv documents)."""
    from pyspark_bigdata_sars_cov_2_analysis_spark.io.writers import write_csv

    df = spark.createDataFrame(
        [(1, "a", 1.5), (2, "b,with,commas", -2.25), (3, None, 0.0)],
        "id: long, name: string, score: double",
    )
    out = str(tmp_path / "csv_out")
    write_csv(df, out)
    back = spark.read.option("header", "true").schema(
        "id long, name string, score double"
    ).csv(out)
    assert sorted(map(tuple, back.collect())) == sorted(map(tuple, df.collect()))


def test_compact_parquet_reduces_files_preserves_rows(spark, tmp_path):
    """The small-files maintenance pass: 32 tiny part files compact into
    4 with the identical multiset, count-verified before the swap, and
    no stray staging dirs left behind."""
    from pyspark_bigdata_sars_cov_2_analysis_spark.io.writers import (
        compact_parquet,
    )

    path = str(tmp_path / "fragmented")
    spark.range(0, 10_000).repartition(32).write.parquet(path)
    assert len(glob.glob(f"{path}/part-*.parquet")) == 32

    n = compact_parquet(spark, path, n_files=4)
    assert n == 10_000
    assert len(glob.glob(f"{path}/part-*.parquet")) <= 4
    got = spark.read.parquet(path).agg(F.sum("id").alias("s")).first().s
    assert got == sum(range(10_000))
    assert not os.path.exists(path + "_compacting")
    assert not os.path.exists(path + "_precompact")


def test_write_parquet_sized_bounds_file_sizes(spark, tmp_path):
    """write_parquet_sized must split output so every file lands at or
    under ~target (probe-measured bytes/row -> maxRecordsPerFile), and
    the probe dir must not survive. Wide string rows make the size
    predictable; 1 MB target over ~8 MB of data forces >= 4 files."""
    import os as _os

    from pyspark_bigdata_sars_cov_2_analysis_spark.io.writers import (
        write_parquet_sized,
    )

    # incompressible rows (distinct hex) so on-disk bytes/row is real
    df = spark.range(0, 40_000).select(
        "id",
        F.concat(
            *[
                F.md5(F.concat(F.lit(str(i)), F.col("id").cast("string")))
                for i in range(6)
            ]
        ).alias("pad"),
    ).repartition(2)
    out = str(tmp_path / "sized")
    cap = write_parquet_sized(df, out, target_file_mb=1, sample_rows=5_000)
    assert cap >= 1
    files = glob.glob(f"{out}/*.parquet")
    assert len(files) >= 4, files
    for f in files:
        assert _os.path.getsize(f) <= 2 * 1024 * 1024, (f, _os.path.getsize(f))
    assert spark.read.parquet(out).count() == 40_000
    assert not _os.path.exists(out + "_sizing")


def test_merge_upsert_parquet(spark, tmp_path):
    """MERGE semantics on a path table: matched keys replaced, new keys
    inserted, untouched keys intact; duplicate update keys rejected
    before anything is written."""
    import pytest as _pytest

    from pyspark_bigdata_sars_cov_2_analysis_spark.io.writers import (
        merge_upsert_parquet,
    )

    path = str(tmp_path / "target")
    spark.createDataFrame(
        [(1, "a", 10.0), (2, "b", 20.0), (3, "c", 30.0)],
        "id: long, v: string, score: double",
    ).write.parquet(path)

    updates = spark.createDataFrame(
        [(2, "B2", 22.0), (9, "new", 90.0)],
        "id: long, v: string, score: double",
    )
    stats = merge_upsert_parquet(spark, path, updates, ["id"])
    assert stats == {"updated": 1, "inserted": 1, "rows": 4}
    got = {r.id: (r.v, r.score) for r in spark.read.parquet(path).collect()}
    assert got == {
        1: ("a", 10.0), 2: ("B2", 22.0), 3: ("c", 30.0), 9: ("new", 90.0)
    }

    bad = spark.createDataFrame(
        [(5, "x", 1.0), (5, "y", 2.0)], "id: long, v: string, score: double"
    )
    with _pytest.raises(ValueError, match="duplicate key"):
        merge_upsert_parquet(spark, path, bad, ["id"])
    # the failed merge left the table untouched
    assert spark.read.parquet(path).count() == 4


def test_zorder_constant_column_degrades_gracefully(spark, tmp_path):
    """A constant clustered column (span 0) must not divide by zero —
    the writer pins the span to 1 and the layout degrades to ordering
    on the varying column only."""
    from pyspark_bigdata_sars_cov_2_analysis_spark.io.writers import (
        write_zorder,
    )

    df = spark.range(0, 1000).select(
        F.lit(7).alias("x"), (F.col("id") % 64).alias("y")
    )
    out = str(tmp_path / "const_dim")
    write_zorder(df, out, ["x", "y"], bits=6, n_partitions=4)
    assert spark.read.parquet(out).count() == 1000


def test_merge_upsert_empty_updates_is_noop(spark, tmp_path):
    from pyspark_bigdata_sars_cov_2_analysis_spark.io.writers import (
        merge_upsert_parquet,
    )

    path = str(tmp_path / "t")
    spark.createDataFrame([(1, "a")], "id: long, v: string").write.parquet(path)
    empty = spark.createDataFrame([], "id: long, v: string")
    stats = merge_upsert_parquet(spark, path, empty, ["id"])
    assert stats == {"updated": 0, "inserted": 0, "rows": 1}
    assert [tuple(r) for r in spark.read.parquet(path).collect()] == [(1, "a")]


def test_countmin_unseen_probe_estimates_zero(spark):
    """A probe item whose buckets were never touched must estimate 0
    (the left-join/coalesce path) — never NULL, never a phantom count."""
    from pyspark_bigdata_sars_cov_2_analysis_spark.llmdata import sketches

    cms = sketches.countmin_table(
        spark.createDataFrame([("alpha", 5)], "item: string, cnt: long"),
        "item",
        "cnt",
    )
    probes = spark.createDataFrame(
        [("alpha",), ("never-seen-item-xyz",)], "item: string"
    )
    est = {
        r.item: r.est
        for r in sketches.countmin_estimate(cms, probes, "item").collect()
    }
    assert est["alpha"] >= 5
    assert est["never-seen-item-xyz"] == 0


def test_zorder_value_random_sweep_matches_reference(spark):
    """200 seeded-random coordinate pairs (full 16-bit range, 2 and 3
    dimensions) must interleave identically to the pure-Python reference
    — the broad companion to the corner-point test."""
    import random as _random

    rng = _random.Random(20260814)

    def z_ref(coords, bits):
        z = 0
        n = len(coords)
        for i in range(bits):
            for j, c in enumerate(coords):
                z |= ((c >> i) & 1) << (i * n + j)
        return z

    for dims, bits in ((2, 16), (3, 10)):
        pts = [
            tuple(rng.randrange(1 << bits) for _ in range(dims))
            for _ in range(100)
        ]
        schema = ", ".join(f"c{j}: long" for j in range(dims))
        df = spark.createDataFrame(pts, schema)
        got = [
            r.z
            for r in df.select(
                sorts.zorder_value(
                    [F.col(f"c{j}") for j in range(dims)], bits=bits
                ).alias("z")
            ).collect()
        ]
        want = [z_ref(p, bits) for p in pts]
        assert sorted(got) == sorted(want), (dims, bits)


def test_zorder_empty_frame_writes_empty(spark, tmp_path):
    from pyspark_bigdata_sars_cov_2_analysis_spark.io.writers import (
        write_zorder,
    )

    out = str(tmp_path / "empty_z")
    write_zorder(
        spark.createDataFrame([], "x: long, y: long"), out, ["x", "y"]
    )
    assert spark.read.parquet(out).count() == 0


def test_audit_parquet_layout_detects_fragmentation(spark, tmp_path):
    """The compaction detector: a 32-way fragmented write must show a
    high small-file fraction; after compact_parquet the same audit goes
    clean — the detect → fix loop as one assertion chain."""
    from pyspark_bigdata_sars_cov_2_analysis_spark.io.writers import (
        audit_parquet_layout,
        compact_parquet,
    )

    path = str(tmp_path / "frag")
    spark.range(0, 20_000).repartition(32).write.parquet(path)
    before = audit_parquet_layout(path, small_file_mb=1)
    assert before["n_files"] == 32
    assert before["small_file_fraction"] == 1.0

    compact_parquet(spark, path, n_files=2)
    after = audit_parquet_layout(path, small_file_mb=1)
    assert after["n_files"] <= 2
    assert after["total_mb"] > 0
    # empty dir edge
    empty = audit_parquet_layout(str(tmp_path / "nope"))
    assert empty == {"n_files": 0, "total_mb": 0.0, "small_file_fraction": 0.0}


def test_zorder_null_dimensions_handled(spark, tmp_path):
    """ADVICE r7: (a) an all-NULL clustering column is a constant span —
    never a TypeError, never an unclustered fallback for the other dims;
    (b) row-level NULL coordinates coalesce to the grid minimum instead
    of clustering arbitrarily; (c) an all-NULL FIRST column must not
    silently skip clustering of a live second column."""
    from pyspark_bigdata_sars_cov_2_analysis_spark.io.writers import (
        write_zorder,
    )

    rows = [(i, None if i % 7 == 0 else i * 3, None) for i in range(256)]
    df = spark.createDataFrame(rows, "x long, y long, z long")

    # all-NULL SECOND column (z): previously TypeError at hi - lo
    out1 = str(tmp_path / "z_null_second")
    write_zorder(df, out1, ["x", "z"], bits=6, n_partitions=4)
    assert spark.read.parquet(out1).count() == 256

    # all-NULL FIRST column: previously written entirely unclustered;
    # now x must still bound per-file ranges
    out2 = str(tmp_path / "z_null_first")
    write_zorder(df, out2, ["z", "x"], bits=6, n_partitions=4)
    import glob as _glob

    import pyarrow.parquet as pq

    spans = []
    for f in _glob.glob(out2 + "/*.parquet"):
        md = pq.read_metadata(f)
        if md.num_rows == 0:
            continue
        st = md.row_group(0).column(1).statistics  # x column
        spans.append(st.max - st.min)
    full_span = 255
    assert spans and all(s < full_span for s in spans), spans

    # NULL row-level coordinates (y) land with the minimum cell, and the
    # write round-trips every row including the NULLs
    out3 = str(tmp_path / "z_null_rows")
    write_zorder(df, out3, ["x", "y"], bits=6, n_partitions=4)
    back = spark.read.parquet(out3)
    assert back.count() == 256
    assert back.where("y IS NULL").count() == 37


def test_merge_upsert_duplicate_key_target_stats(spark, tmp_path):
    """ADVICE r7: on a target holding DUPLICATE keys, the stats must
    count keys — updated + inserted == n_updates, inserted never
    negative — while the row-count verification still uses matched rows
    (a matched key replaces ALL its target rows)."""
    from pyspark_bigdata_sars_cov_2_analysis_spark.io.writers import (
        merge_upsert_parquet,
    )

    path = str(tmp_path / "dup_target")
    spark.createDataFrame(
        [(1, "a"), (1, "a-dup"), (2, "b"), (3, "c")], "id long, v string"
    ).write.parquet(path)
    updates = spark.createDataFrame(
        [(1, "A"), (9, "I")], "id long, v string"
    )
    stats = merge_upsert_parquet(spark, path, updates, ["id"])
    # key 1 matched (2 target rows replaced by 1), key 9 inserted
    assert stats == {"updated": 1, "inserted": 1, "rows": 4}
    got = sorted(map(tuple, spark.read.parquet(path).collect()))
    assert got == [(1, "A"), (2, "b"), (3, "c"), (9, "I")]


def test_recover_staged_swap_rolls_forward_and_back(spark, tmp_path):
    """ADVICE r7: a crash between the two swap renames must leave a
    recoverable state, not a missing table. Simulate each crash point
    against the marker protocol and assert recover_staged_swap restores
    the table (forward when the verified staged dir survived, back to
    the backup otherwise) and is a no-op when nothing is wrong."""
    import json as _json
    import os as _os
    import shutil

    from pyspark_bigdata_sars_cov_2_analysis_spark.io.writers import (
        recover_staged_swap,
    )

    def mktable(p, tag):
        spark.createDataFrame([(1, tag)], "id long, v string").write.mode(
            "overwrite"
        ).parquet(p)

    # crash AFTER first rename (table moved to backup, staged intact)
    path = str(tmp_path / "t1")
    staged, backup = path + "_merging", path + "_premerge"
    mktable(staged, "new")
    mktable(backup, "old")
    with open(path + ".swap-in-progress", "w") as f:
        _json.dump({"path": path, "staged": staged, "backup": backup}, f)
    assert recover_staged_swap(path) == {"action": "rolled_forward"}
    assert spark.read.parquet(path).collect()[0].v == "new"
    assert not _os.path.exists(path + ".swap-in-progress")
    assert not _os.path.exists(backup)

    # staged dir lost too (e.g. crash during its move): roll back
    path2 = str(tmp_path / "t2")
    backup2 = path2 + "_premerge"
    mktable(backup2, "old")
    with open(path2 + ".swap-in-progress", "w") as f:
        _json.dump(
            {"path": path2, "staged": path2 + "_merging", "backup": backup2},
            f,
        )
    assert recover_staged_swap(path2) == {"action": "rolled_back"}
    assert spark.read.parquet(path2).collect()[0].v == "old"

    # healthy table: no marker -> no-op
    assert recover_staged_swap(path2)["action"] == "none"
    shutil.rmtree(path2)


def test_write_parquet_sized_probe_spans_partitions(spark, tmp_path):
    """ADVICE r7: the sizing probe must NOT be a global prefix. Data
    sorted so early partitions hold narrow rows and late partitions wide
    ones previously made the probe underestimate bytes/row and blow the
    size target; the per-partition-head probe keeps every file at or
    under ~2x target even on that adversarial layout."""
    import glob as _glob
    import os as _os

    from pyspark.sql import functions as F

    from pyspark_bigdata_sars_cov_2_analysis_spark.io.writers import (
        write_parquet_sized,
    )

    # 8 range-partitions ordered by payload width: first partitions ~10B
    # rows, last ~8KB rows (incompressible hex so parquet can't erase
    # the width gradient)
    df = (
        spark.range(16_000)
        .withColumn(
            "payload",
            F.sha2(F.col("id").cast("string"), 512).substr(
                F.lit(1), (F.col("id") / F.lit(2)).cast("int")
            ),
        )
        .repartitionByRange(8, "id")
        .sortWithinPartitions("id")
    )
    out = str(tmp_path / "sized")
    write_parquet_sized(df, out, target_file_mb=1, sample_rows=4_000)
    sizes = [
        _os.path.getsize(f) for f in _glob.glob(out + "/*.parquet")
    ]
    assert sizes and max(sizes) <= 2 * 1024 * 1024, sorted(sizes)[-3:]


def test_jsonl_snapshot_version_race_fails_safe(spark, tmp_path):
    """ADVICE r7: if another writer grabs the computed snapshot version
    first, the commit must NOT overwrite it — O_EXCL makes the loser
    retry with the next number, preserving both histories. The retry
    loop is driven DIRECTLY against a planted collision (_write_snapshot
    is the unit the commit hook calls — the hook itself runs in a
    separate Python worker, where a squatted higher version is just
    max+1'd past without ever entering the except branch), then the
    end-to-end sink behavior over a squatted version is verified too."""
    import json as _json
    import os as _os

    from pyspark_bigdata_sars_cov_2_analysis_spark.io import jsonl_sink

    # unit: plant the EXACT version _next_version will pick, so the 'x'
    # open must raise FileExistsError and the loop must walk past it
    race = str(tmp_path / "race")
    _os.makedirs(race)
    with open(_os.path.join(race, "_manifest-00001.json"), "w") as f:
        _json.dump({"version": 1, "parts": [], "rows": 0}, f)
    assert jsonl_sink._next_version(race) == 2
    foreign = {"version": 2, "parts": ["foreign.jsonl"], "rows": 99}
    with open(_os.path.join(race, "_manifest-00002.json"), "w") as f:
        _json.dump(foreign, f)  # the racing writer landed first
    payload = jsonl_sink._write_snapshot(race, ["mine.jsonl"], 7)
    assert payload["version"] == 3  # retried past the collision
    with open(_os.path.join(race, "_manifest-00002.json")) as f:
        assert _json.load(f) == foreign  # loser never overwrote
    with open(_os.path.join(race, "_manifest-00003.json")) as f:
        assert _json.load(f) == payload

    # end-to-end: a squatted future version shifts the next commit up
    jsonl_sink.register_jsonl_sink(spark)
    path = str(tmp_path / "sink")
    spark.range(3).write.format("jsonl_dir").mode("append").option(
        "path", path
    ).save()
    with open(_os.path.join(path, "_manifest-00002.json"), "w") as f:
        _json.dump(foreign, f)
    spark.range(5).write.format("jsonl_dir").mode("append").option(
        "path", path
    ).save()
    with open(_os.path.join(path, "_manifest-00002.json")) as f:
        assert _json.load(f) == foreign  # untouched
    with open(_os.path.join(path, "_manifest-00003.json")) as f:
        assert _json.load(f)["rows"] == 5
    with open(_os.path.join(path, "_SUCCESS")) as f:
        assert _json.load(f)["version"] == 3


def test_merge_upsert_self_heals_crashed_swap(spark, tmp_path):
    """A maintenance job restarted after a mid-swap crash must just
    work: merge_upsert_parquet (and compact_parquet) roll the table
    forward from the marker before reading it."""
    import json as _json

    from pyspark_bigdata_sars_cov_2_analysis_spark.io.writers import (
        merge_upsert_parquet,
    )

    path = str(tmp_path / "t")
    staged, backup = path + "_merging", path + "_premerge"
    spark.createDataFrame(
        [(1, "new"), (2, "b")], "id long, v string"
    ).write.parquet(staged)
    spark.createDataFrame([(1, "old")], "id long, v string").write.parquet(
        backup
    )
    with open(path + ".swap-in-progress", "w") as f:
        _json.dump({"path": path, "staged": staged, "backup": backup}, f)

    updates = spark.createDataFrame([(2, "B")], "id long, v string")
    stats = merge_upsert_parquet(spark, path, updates, ["id"])
    assert stats == {"updated": 1, "inserted": 0, "rows": 2}
    got = sorted(map(tuple, spark.read.parquet(path).collect()))
    assert got == [(1, "new"), (2, "B")]


def test_recover_staged_swap_cleanup_branch(spark, tmp_path):
    """Crash AFTER the second rename but before marker removal: the
    table is already in place — recovery must only clean the marker and
    leftover backup, never touch the table."""
    import json as _json
    import os as _os

    from pyspark_bigdata_sars_cov_2_analysis_spark.io.writers import (
        recover_staged_swap,
    )

    path = str(tmp_path / "t")
    backup = path + "_premerge"
    spark.createDataFrame([(1, "new")], "id long, v string").write.parquet(
        path
    )
    spark.createDataFrame([(1, "old")], "id long, v string").write.parquet(
        backup
    )
    with open(path + ".swap-in-progress", "w") as f:
        _json.dump(
            {"path": path, "staged": path + "_merging", "backup": backup}, f
        )
    assert recover_staged_swap(path) == {"action": "cleanup"}
    assert spark.read.parquet(path).collect()[0].v == "new"
    assert not _os.path.exists(backup)
    assert not _os.path.exists(path + ".swap-in-progress")


def test_python_datasource_filter_pushdown(spark):
    """Spark 4.1 Python DSv2 filter pushdown (review r9): range
    predicates on doc_id narrow the GENERATION range — the connector-side
    twin of parquet row-group pruning. Pins three things: (1) the
    pushdown reader narrows [lo, hi) exactly and yields back every
    filter it cannot handle exactly (non-doc_id, non-int); (2) an
    end-to-end filtered read equals the plain reader's on the same
    predicate (handled filters are NOT re-applied by Spark, so handling
    must be exact); (3) the DEFAULT reader does not even define
    pushFilters — Spark refuses any reader that defines it while
    spark.sql.python.filterPushdown.enabled is false, so folding it into
    the base class would break every vanilla-session consumer."""
    from pyspark.sql.datasource import (
        EqualTo,
        GreaterThanOrEqual,
        IsNotNull,
        LessThan,
    )

    from pyspark_bigdata_sars_cov_2_analysis_spark.io.pysource import (
        SyntheticDocsPushdownReader,
        SyntheticDocsReader,
        register_synthetic_docs,
    )

    assert "pushFilters" not in SyntheticDocsReader.__dict__
    r = SyntheticDocsPushdownReader({"n": "10000"})
    left = list(
        r.pushFilters(
            [
                GreaterThanOrEqual(("doc_id",), 9990),
                LessThan(("doc_id",), 9995),
                IsNotNull(("lang",)),
            ]
        )
    )
    assert (r.lo, r.hi) == (9990, 9995)
    assert left == [IsNotNull(("lang",))]
    got = sorted(
        doc_id for p in r.partitions() for (doc_id, *_rest) in r.read(p)
    )
    assert got == list(range(9990, 9995))
    # contradictory bounds generate nothing
    r2 = SyntheticDocsPushdownReader({"n": "100"})
    list(r2.pushFilters([EqualTo(("doc_id",), 5), EqualTo(("doc_id",), 6)]))
    assert [row for p in r2.partitions() for row in r2.read(p)] == []
    # bool is an int subclass (ADVICE r9): EqualTo(doc_id, True) must be
    # YIELDED BACK for Spark to evaluate, never claimed and narrowed to
    # [1, 2) — claiming it would silently drop every other row
    r3 = SyntheticDocsPushdownReader({"n": "100"})
    boolf = EqualTo(("doc_id",), True)
    assert list(r3.pushFilters([boolf])) == [boolf]
    assert (r3.lo, r3.hi) == (0, 100)

    register_synthetic_docs(spark)
    old = spark.conf.get("spark.sql.python.filterPushdown.enabled", None)
    spark.conf.set("spark.sql.python.filterPushdown.enabled", "true")
    try:
        pred = "doc_id >= 9990 AND doc_id < 9995"
        pushed = (
            spark.read.format("synthetic_docs")
            .option("n", 10000)
            .option("pushdown", "true")
            .load()
            .filter(pred)
            .collect()
        )
        plain = (
            spark.read.format("synthetic_docs")
            .option("n", 10000)
            .load()
            .filter(pred)
            .collect()
        )
        assert sorted(map(tuple, pushed)) == sorted(map(tuple, plain))
        assert len(pushed) == 5
    finally:
        if old is None:
            spark.conf.unset("spark.sql.python.filterPushdown.enabled")
        else:
            spark.conf.set("spark.sql.python.filterPushdown.enabled", old)


def test_synthetic_docs_dup_ground_truth_survives_hot_every(spark):
    """Review r14: the hot prefix was keyed on doc_id, so with BOTH
    knobs set a planted pair where exactly one id was divisible by
    hot_every got the prefix on one side only — the copies were no
    longer exact duplicates and the documented two-copy-group count
    undercounted. Keyed on the BASE id now: copies stay byte-identical
    under any knob combination."""
    from pyspark_bigdata_sars_cov_2_analysis_spark.io.pysource import (
        register_synthetic_docs,
    )

    register_synthetic_docs(spark)
    n, k = 400, 5
    docs = (
        spark.read.format("synthetic_docs")
        .option("n", n).option("parts", 4)
        .option("dup_every", k).option("hot_every", 2)
        .load()
    )
    groups = (
        docs.groupBy("text").count().where("count >= 2").collect()
    )
    expected = len(range(0, n - 1, k))
    assert len(groups) == expected, (
        f"hot_every broke the dup_every ground truth: "
        f"{len(groups)} != {expected}"
    )
    assert all(r["count"] == 2 for r in groups)


def test_synthetic_docs_stream_refuses_dup_every_one(spark):
    """Review r14: the streaming reader skipped the dup_every=1
    validation the batch reader enforces, so a streamed-vs-batch
    comparison of 'the same corpus' diverged (batch raised, stream
    yielded zero planted duplicates). Both construct through the shared
    validator now."""
    import pytest

    from pyspark_bigdata_sars_cov_2_analysis_spark.io.pysource import (
        SyntheticDocsStreamReader,
    )

    with pytest.raises(ValueError, match="dup_every=1"):
        SyntheticDocsStreamReader({"dup_every": "1"})
