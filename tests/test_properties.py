"""Property-based tests (hypothesis) for pure driver-side logic:
file election invariants and line building. Spark-free, so hypothesis
can run hundreds of cases quickly."""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st

from file_appender_spark.config import AppendSinkConfig
from file_appender_spark.sinks.append_text import FileInfo, elect_incomplete_files

names = st.from_regex(r"f-[0-9]{1,13}", fullmatch=True)
sizes = st.integers(min_value=0, max_value=10 * 1024 * 1024)


@given(st.lists(st.tuples(names, sizes), max_size=30), st.integers(0, 10**13))
@settings(max_examples=200, deadline=None)
def test_election_invariants(files, run_ts):
    cfg = AppendSinkConfig(
        output_dir="/x", file_prefix="f", size_threshold_mb=1, age_threshold_min=60
    )
    # real directory listings have unique names
    sizes_by_name = dict(files)
    files = list(sizes_by_name.items())
    elected = elect_incomplete_files(files, cfg, run_ts)
    for name in elected:
        # every elected file parses, is under threshold, and is young
        info = FileInfo.parse(name, sizes_by_name[name], "f")
        assert info is not None
        assert sizes_by_name[name] < cfg.size_threshold_bytes
        assert run_ts - info.create_time_ms < cfg.age_threshold_ms
    # sorted by (name-prefix, createTime)
    keys = [
        (n.rsplit("-", 1)[0], int(n.rsplit("-", 1)[-1]), n) for n in elected
    ]
    assert keys == sorted(keys)


@given(st.lists(st.tuples(names, sizes), max_size=30), st.integers(0, 10**13))
@settings(max_examples=100, deadline=None)
def test_election_zero_thresholds_keep_everything_parseable(files, run_ts):
    cfg = AppendSinkConfig(
        output_dir="/x", file_prefix="f", size_threshold_mb=0, age_threshold_min=0
    )
    elected = elect_incomplete_files(files, cfg, run_ts)
    parseable = {n for n, s in files if FileInfo.parse(n, s, "f")}
    assert set(elected) == parseable


@given(
    st.lists(
        st.one_of(st.none(), st.text(alphabet="abcXYZ0123456789 .:", max_size=20)),
        min_size=1,
        max_size=8,
    )
)
@settings(max_examples=100, deadline=None)
def test_line_join_semantics_reference_model(values):
    """Pure-python model of the serializer's §1.4 rules: null -> '',
    separator join. (The Spark expression itself is covered in
    test_serialize.py; this pins the model the expression implements.)"""
    rendered = [("" if v is None else v) for v in values]
    line = ",".join(rendered)
    # invariants: separator count equals field count - 1; nulls never
    # produce the string 'None'
    assert line.count(",") >= len(values) - 1
    assert "None" not in [r for v, r in zip(values, rendered) if v is None]


_line_texts = st.text(alphabet="abcXYZ09;| .", max_size=12)


@given(st.lists(_line_texts, max_size=20), st.data())
@settings(max_examples=150, deadline=None)
def test_stream_offsets_respect_line_boundaries(lines, data):
    """The streaming tail's core invariant, under EVERY possible
    mid-append cut point: offsets only land on newline boundaries, a
    partial trailing line is never consumed, and two reads (before
    and after the rest of the append arrives) reconstruct exactly the
    full line sequence."""
    import os
    import tempfile

    from pyspark.sql import types as T

    from file_appender_spark.sources.append_text_datasource import (
        AppendTextStreamReader,
    )

    schema = T.StructType([T.StructField("s", T.StringType())])
    payload = b"".join(s.encode() + b"\n" for s in lines)
    cut = data.draw(st.integers(min_value=0, max_value=len(payload)))
    with tempfile.TemporaryDirectory() as d:
        path = os.path.join(d, "f-1000")
        with open(path, "wb") as f:
            f.write(payload[:cut])
        reader = AppendTextStreamReader(schema, {"path": d, "sep": ","})
        it1, off1 = reader.read({})
        rows1 = list(it1)
        n1 = off1.get("f-1000", 0)
        assert n1 == 0 or payload[:n1].endswith(b"\n")
        assert n1 <= cut  # never reads past what exists
        with open(path, "ab") as f:
            f.write(payload[cut:])
        it2, off2 = reader.read(off1)
        rows2 = list(it2)
        # "" serialized null -> reads back as None (the sink's inverse)
        expect = [s if s != "" else None for s in lines]
        assert [r[0] for r in rows1 + rows2] == expect
        # and replay between the recorded offsets is identical
        replay = list(reader.readBetweenOffsets({}, off1)) + list(
            reader.readBetweenOffsets(off1, off2)
        )
        assert replay == rows1 + rows2


# --- SRP banding policy properties (hypothesis over the pure math) ---


@given(
    st.integers(min_value=2, max_value=1_000_000_000),
    st.floats(min_value=0.5, max_value=0.999),
)
@settings(max_examples=60, deadline=None)
def test_srp_policy_meets_constraints(n_rows, threshold):
    """For any corpus size and sensible threshold, the banding policy
    keeps expected random candidates per row bounded and, unless it
    hit the band cap, meets the recall target; recall for identical
    vectors is always exactly 1."""
    from file_appender_spark.operators.similarity import srp_params_for, srp_recall

    bits, bands = srp_params_for(n_rows, threshold, min_recall=0.9)
    r = bits // bands
    assert bits % bands == 0 and r >= 2
    # precision: expected junk candidates per row stay bounded — a row
    # can only pair with the OTHER n-1 rows (hypothesis found the
    # off-by-one at n_rows=9, where n vs n-1 is a 12% difference)
    assert bands * 0.5**r * (n_rows - 1) <= 4.0 + 1e-9
    # recall target met unless the policy capped out
    if bands < 256:
        assert srp_recall(threshold, bits, bands) >= 0.9
    assert srp_recall(1.0, bits, bands) == 1.0
    # monotonicity: more bands never hurt recall at fixed bits/band
    assert srp_recall(threshold, r * bands * 2, bands * 2) >= srp_recall(
        threshold, bits, bands
    ) - 1e-12


# ---------------------------------------------------------------------------
# sizing policies (pure arithmetic): graph out-degree cap + image bucket cap
# ---------------------------------------------------------------------------


@given(
    st.integers(min_value=1, max_value=10**14),
    st.floats(min_value=0.5, max_value=10_000.0, allow_nan=False),
)
@settings(max_examples=300, deadline=None)
def test_graph_params_invariants(n_edges, target):
    from file_appender_spark.operators.graph import graph_params_for

    p = graph_params_for(n_edges, target_wedges_per_edge=target)
    assert p.max_degree >= 2
    # the linear bound the cap guarantees never undershoots the ask by
    # more than the integer-rounding half-step
    assert p.wedge_bound_per_edge == (p.max_degree - 1) / 2.0
    assert p.wedge_bound_per_edge >= target - 0.5
    assert p.exact_below_edges == p.max_degree * p.max_degree // 2
    # monotone: asking for more wedge budget never shrinks the cap
    p2 = graph_params_for(n_edges, target_wedges_per_edge=target * 2)
    assert p2.max_degree >= p.max_degree


@given(
    st.integers(min_value=1, max_value=10**14),
    st.floats(min_value=2.0, max_value=100_000.0, allow_nan=False),
)
@settings(max_examples=300, deadline=None)
def test_band_bucket_cap_invariants(n_items, target):
    from file_appender_spark.operators.imagehash import (
        ahash_params_for,
        band_bucket_cap_for,
    )

    cap = band_bucket_cap_for(n_items, target_pairs_per_item=target)
    # worst-case candidate pairs per item stay within the asked budget
    # (every bucket at cap -> pairs/item = 2*(cap-1)) unless the
    # expectation floor binds, in which case the cap tracks it
    grid = ahash_params_for(n_items)
    expected = n_items / 2.0 ** (grid // 4)
    assert cap >= int(target // 2) + 1
    assert cap >= 8 * expected - 1  # ceil never undershoots
    # the cap never clips an honest bucket: it sits far above the
    # policy grid's expected population
    assert cap > 4 * expected
