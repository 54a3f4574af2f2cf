"""Property-based tests (hypothesis) — the randomized layer the reference's
test strategy lacked (SURVEY.md §5 'Absent'). Each property runs many
generated cases through the REAL Spark operators on one shared session."""

from __future__ import annotations

import pandas as pd
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from autonomous_orchestrator_ai_spark.functions.enrich import region_expr
from autonomous_orchestrator_ai_spark.functions.text import (
    quality_score,
    token_count,
    word_shingles,
)
from autonomous_orchestrator_ai_spark.operators.asof import asof_join
from autonomous_orchestrator_ai_spark.operators.transform import quarantine_split

SETTINGS = dict(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture, HealthCheck.too_slow],
)

REGIONS = {"North America", "Europe", "APAC", "South America", "Other"}

text_strategy = st.text(
    alphabet=st.characters(blacklist_categories=("Cs",), max_codepoint=0x2FFF),
    max_size=120,
)


@given(countries=st.lists(st.text(max_size=3) | st.none(), min_size=1, max_size=8))
@settings(**SETTINGS)
def test_region_decode_is_total(spark, countries):
    """Any country value (including junk and NULL) maps to exactly one of
    the five regions — the decode never produces NULL or surprises."""
    df = spark.createDataFrame([(c,) for c in countries], "country: string")
    got = [r[0] for r in df.select(region_expr()).collect()]
    assert all(g in REGIONS for g in got)


@given(
    rows=st.lists(
        st.tuples(st.integers(0, 10**6), st.floats(-1e6, 1e6) | st.none()),
        min_size=1,
        max_size=20,
    ),
    threshold=st.floats(-100, 100),
)
@settings(**SETTINGS)
def test_quarantine_split_is_a_partition(spark, rows, threshold):
    """quarantine_split(df, cond) always partitions df: the two sides are
    disjoint and their union is the input — even with NULLs in the
    condition column."""
    df = spark.createDataFrame(rows, "id: long, v: double")
    q, c = quarantine_split(df, f"v > {threshold}")
    q_ids = sorted(r["id"] for r in q.select("id").collect())
    c_ids = sorted(r["id"] for r in c.select("id").collect())
    all_ids = sorted(r["id"] for r in df.select("id").collect())
    assert sorted(q_ids + c_ids) == all_ids


@given(texts=st.lists(text_strategy, min_size=1, max_size=6))
@settings(**SETTINGS)
def test_text_metric_invariants(spark, texts):
    """token_count >= 0; quality in [0,1]; shingle count in
    [1, max(1, tokens-2)] for every input, arbitrary unicode included."""
    df = spark.createDataFrame([(t,) for t in texts], "text: string")
    rows = df.select(
        token_count("text").alias("n"),
        F.round(quality_score("text"), 9).alias("q"),
        F.size(word_shingles("text", 3)).alias("s"),
    ).collect()
    for r in rows:
        assert r["n"] >= 0
        assert 0.0 <= r["q"] <= 1.0
        assert 1 <= r["s"] <= max(1, r["n"] - 2) or (r["n"] == 0 and r["s"] == 1)


@given(
    left_ts=st.lists(st.integers(0, 1000), min_size=1, max_size=12),
    right_ts=st.lists(st.integers(0, 1000), min_size=0, max_size=12),
)
@settings(**SETTINGS)
def test_asof_join_matches_pandas_merge_asof(spark, left_ts, right_ts):
    """asof_join == pd.merge_asof (backward, inclusive) on a single key."""
    left = spark.createDataFrame([(1, t) for t in left_ts], "k: long, ts: long")
    right = spark.createDataFrame(
        [(1, t) for t in sorted(set(right_ts))], "k: long, ts: long"
    )

    got = {
        r["ts"]: r["ts_asof"]
        for r in asof_join(left, right, on="k", left_ts="ts", right_ts="ts",
                           right_cols=[]).collect()
    }

    lp = pd.DataFrame({"k": 1, "ts": sorted(left_ts)})
    rp = pd.DataFrame({"k": 1, "rts": sorted(set(right_ts))})
    if len(rp):
        merged = pd.merge_asof(lp, rp, left_on="ts", right_on="rts", by="k")
        expected = dict(zip(merged["ts"], merged["rts"]))
    else:
        expected = {t: None for t in left_ts}
    for t in left_ts:
        e = expected.get(t)
        e = None if pd.isna(e) else int(e)
        assert got[t] == e, (t, got[t], e)


@given(
    text=st.text(
        alphabet=st.characters(blacklist_categories=("Cs",), max_codepoint=0x2FFF),
        min_size=1,
        max_size=200,
    ),
    size=st.integers(1, 50),
)
@settings(**SETTINGS)
def test_chunking_reconstructs_text(spark, text, size):
    """With stride == size (no overlap), concatenating the chunks in
    chunk_idx order reproduces the document exactly — nothing dropped,
    nothing duplicated."""
    from autonomous_orchestrator_ai_spark.operators.chunking import chunk_text

    df = spark.createDataFrame([(1, text)], "doc_id: bigint, text: string")
    rows = chunk_text(df, "text", size=size, stride=size).orderBy("chunk_idx").collect()
    assert "".join(r.chunk_text for r in rows) == text
    assert all(len(r.chunk_text) <= size for r in rows)


@given(
    obs=st.lists(
        st.tuples(st.integers(0, 40), st.floats(-100, 100)),
        min_size=1,
        max_size=15,
        unique_by=lambda t: t[0],
    ),
)
@settings(**SETTINGS)
def test_gapfill_is_dense_and_carries_forward(spark, obs):
    """The gap-filled series covers every bucket in [min, max] exactly
    once, and every filled value equals the most recent observation."""
    import datetime as dt

    from pyspark.sql import functions as F

    from autonomous_orchestrator_ai_spark.operators.gapfill import (
        time_bucket_gapfill,
    )

    base = dt.datetime(2024, 1, 1)
    df = spark.createDataFrame(
        [("k", base + dt.timedelta(minutes=10 * m), v) for m, v in obs],
        "k: string, ts: timestamp, v: double",
    )
    out = time_bucket_gapfill(df, "ts", 600, ["k"], F.min("v"), "v").orderBy("bucket").collect()
    buckets = [r.bucket for r in out]
    lo, hi = min(m for m, _ in obs), max(m for m, _ in obs)
    assert len(buckets) == hi - lo + 1
    assert len(set(buckets)) == len(buckets)
    expected = dict(sorted(obs))
    last = None
    for r in out:
        m = (r.bucket - base).total_seconds() / 600
        if m in expected:
            last = expected[m]
            assert not r.gap_filled
        else:
            assert r.gap_filled
        assert r.v_filled == last


@given(
    values=st.lists(st.integers(0, 1000), min_size=1, max_size=30),
    t1=st.integers(0, 1000),
    t2=st.integers(0, 1000),
)
@settings(**SETTINGS)
def test_filter_funnel_conserves_rows(spark, values, t1, t2):
    """Funnel accounting is exact for ANY rule set: each stage's n_out is
    the next stage's n_in, and total = final survivors + all drops."""
    from autonomous_orchestrator_ai_spark.operators.curation import filter_funnel

    df = spark.createDataFrame([(v,) for v in values], "v: long")
    rules = [("r1", F.col("v") >= t1), ("r2", F.col("v") < t2)]
    out = sorted(filter_funnel(df, rules).collect(), key=lambda r: r.stage)
    assert out[0].n_in == len(values)
    for a, b in zip(out, out[1:]):
        assert a.n_out == b.n_in
        assert a.n_in - a.n_dropped == a.n_out
    assert sum(r.n_dropped for r in out) + out[-1].n_out == len(values)
    # funnel semantics match a sequential filter
    survivors = [v for v in values if v >= t1 and v < t2]
    assert out[-1].n_out == len(survivors)


@given(
    ids=st.lists(st.integers(0, 10**6), min_size=1, max_size=40, unique=True),
    n_groups=st.integers(1, 4),
    cap=st.integers(1, 6),
)
@settings(**SETTINGS)
def test_cap_per_group_bounds_and_subset(spark, ids, n_groups, cap):
    """Cap output: per-group count = min(cap, group size); kept rows are a
    subset of the input; selection is stable under re-runs."""
    from autonomous_orchestrator_ai_spark.operators.curation import cap_per_group

    rows = [(i, f"g{i % n_groups}") for i in ids]
    df = spark.createDataFrame(rows, "id: long, g: string")
    kept = cap_per_group(df, "g", "id", cap).collect()
    from collections import Counter

    by_group = Counter(r.g for r in kept)
    input_sizes = Counter(g for _, g in rows)
    for g, n in input_sizes.items():
        assert by_group[g] == min(cap, n)
    assert {(r.id, r.g) for r in kept} <= set(rows)


@given(
    ids=st.lists(st.integers(0, 10**6), min_size=1, max_size=40, unique=True),
    n_shards=st.integers(1, 32),
)
@settings(**SETTINGS)
def test_shard_assignment_total_and_in_range(spark, ids, n_shards):
    from autonomous_orchestrator_ai_spark.operators.curation import (
        shard_assignment,
    )

    df = spark.createDataFrame([(i,) for i in ids], "id: long")
    got = df.select(shard_assignment(F.col("id"), n_shards).alias("s")).collect()
    assert len(got) == len(ids)
    assert all(r.s is not None and 0 <= r.s < n_shards for r in got)


@given(
    avail=st.lists(
        st.tuples(st.integers(0, 3), st.integers(1, 10**6)),
        min_size=1,
        max_size=6,
    ),
    target=st.integers(1, 10**7),
)
@settings(**SETTINGS)
def test_mixture_allocations_sum_to_target(spark, avail, target):
    """Listed sources' allocations sum to ~target (weights normalized);
    epochs > 1 iff allocation exceeds availability."""
    from autonomous_orchestrator_ai_spark.operators.curation import (
        mixture_epoch_plan,
    )

    rows = [(f"s{i}", t) for i, (_, t) in enumerate(avail)]
    weights = {f"s{i}": float(w + 1) for i, (w, _) in enumerate(avail)}
    df = spark.createDataFrame(rows, "source: string, available_tokens: long")
    out = mixture_epoch_plan(df, weights, target).collect()
    total_alloc = sum(r.allocated_tokens for r in out)
    assert abs(total_alloc - target) < 0.02 * target + 1
    for r in out:
        assert r.oversampled == (r.allocated_tokens > r.available_tokens)


@given(
    edges=st.lists(
        st.tuples(st.integers(0, 7), st.integers(0, 7)),
        min_size=1,
        max_size=20,
    )
)
@settings(max_examples=15, deadline=None, suppress_health_check=list(HealthCheck))
def test_triangle_stats_matches_bruteforce(spark, edges):
    from itertools import combinations

    from autonomous_orchestrator_ai_spark.operators.graph import triangle_stats

    undirected = {tuple(sorted(e)) for e in edges if e[0] != e[1]}
    if not undirected:
        return
    nodes = sorted({n for e in undirected for n in e})
    tri = sum(
        1
        for a, b, c in combinations(nodes, 3)
        if (a, b) in undirected and (b, c) in undirected and (a, c) in undirected
    )
    deg = {n: sum(1 for e in undirected if n in e) for n in nodes}
    wedges = sum(d * (d - 1) // 2 for d in deg.values())
    row = triangle_stats(
        spark.createDataFrame(list(undirected), "src long, dst long")
    ).collect()[0]
    assert row["n_nodes"] == len(nodes)
    assert row["n_edges"] == len(undirected)
    assert row["n_wedges"] == wedges
    assert row["n_triangles"] == tri


@given(
    series=st.lists(
        st.tuples(
            st.integers(0, 9),  # day index
            st.decimals(
                min_value="0.01", max_value="99.99", places=2
            ),
        ),
        min_size=2,
        max_size=24,
    )
)
@settings(max_examples=10, deadline=None, suppress_health_check=list(HealthCheck))
def test_cusum_changepoint_matches_numpy(spark, series):
    """value_cusum_changepoint's exact-integer argmax == a float
    recomputation with numpy on the same daily totals."""
    import numpy as np

    from autonomous_orchestrator_ai_spark.plans.timeseries_queries import (
        value_cusum_changepoint,
    )
    import datetime

    rows = [
        (
            1000 + i,
            datetime.datetime(2024, 3, 1 + d, 12, 0, 0),
            7,
            "purchase",
            float(v),
            "{}",
        )
        for i, (d, v) in enumerate(series)
    ]
    df = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    )
    import tempfile, os

    with tempfile.TemporaryDirectory() as tmp:
        df.write.parquet(os.path.join(tmp, "events.parquet"))
        got = value_cusum_changepoint(spark, tmp).collect()
    assert len(got) == 1
    r = got[0]
    # numpy reference on exact cent-scaled daily totals
    days = sorted({d for d, _ in series})
    totals = np.array(
        [
            sum(int(v * 10000) for dd, v in series if dd == d)
            for d in days
        ],
        dtype=np.int64,
    )
    n = len(totals)
    prefix = np.cumsum(totals)
    d_idx = np.arange(1, n + 1)
    num = n * prefix - d_idx * totals.sum()
    best = int(np.lexsort((d_idx, -np.abs(num)))[0])
    assert r["n_days"] == n
    assert r["changepoint_day"] == f"2024-03-{days[best] + 1:02d}"
    expect = abs(int(num[best])) / n / 10000.0
    assert abs(r["max_abs_cusum"] - round(expect, 6)) < 1e-9


# --- vendored codec round-trip properties (pure Python, no Spark session) --

pixel_bytes = st.binary(min_size=0, max_size=3 * 9 * 7)


@given(
    w=st.integers(min_value=1, max_value=9),
    h=st.integers(min_value=1, max_value=7),
    data=st.data(),
)
@settings(**SETTINGS)
def test_bmp_roundtrip_property(w, h, data):
    """encode->decode is the identity for ANY pixel content at ANY
    dimensions (covers every row-padding remainder by construction)."""
    from autonomous_orchestrator_ai_spark.operators.bmp_codec import (
        decode_bmp,
        encode_bmp,
    )

    rgb = data.draw(st.binary(min_size=3 * w * h, max_size=3 * w * h))
    assert decode_bmp(encode_bmp(w, h, rgb)) == (w, h, rgb)


@given(
    channels=st.integers(min_value=1, max_value=3),
    rate=st.sampled_from([8000, 16000, 44100]),
    bits=st.sampled_from([8, 16]),
    frames=st.lists(
        st.integers(min_value=-128, max_value=127), min_size=0, max_size=64
    ),
)
@settings(**SETTINGS)
def test_wav_roundtrip_property(channels, rate, bits, frames):
    """encode->decode is the identity for any PCM content (both bit
    depths, any channel layout, including the empty clip)."""
    from autonomous_orchestrator_ai_spark.operators.wav_codec import (
        decode_wav,
        encode_wav,
    )

    samples = frames * channels  # divisible by channels by construction
    got = decode_wav(encode_wav(rate, channels, samples, bits=bits))
    assert got == (rate, channels, bits, samples)


@given(
    w=st.integers(min_value=1, max_value=6),
    h=st.integers(min_value=1, max_value=6),
    nw=st.integers(min_value=1, max_value=6),
    nh=st.integers(min_value=1, max_value=6),
    data=st.data(),
)
@settings(**SETTINGS)
def test_resize_nearest_properties(w, h, nw, nh, data):
    """Nearest-neighbor resize: output size is exact, every output pixel
    is some input pixel, and same-size resize is the identity."""
    from autonomous_orchestrator_ai_spark.operators.bmp_codec import (
        resize_nearest,
    )

    rgb = data.draw(st.binary(min_size=3 * w * h, max_size=3 * w * h))
    out = resize_nearest(w, h, rgb, nw, nh)
    assert len(out) == 3 * nw * nh
    in_pixels = {rgb[3 * i : 3 * i + 3] for i in range(w * h)}
    assert all(out[3 * i : 3 * i + 3] in in_pixels for i in range(nw * nh))
    if (nw, nh) == (w, h):
        assert out == rgb
