"""operators/imagehash.py — average perceptual hash + banded Hamming
near-dup: pure-Python reference equivalence, planted duplicates,
pigeonhole recall, and the bucket-cap skew guard."""

from __future__ import annotations

from pyspark.sql import functions as F

from file_appender_spark.operators.imagehash import (
    ahash_from_cells,
    ahash_neardup,
    ahash_wide,
)


def _ref_ahash(payload: bytes):
    """Pure-Python reference of the exact published pipeline: strided
    byte-sum cells, integer mean threshold, 4 x 16-bit bands."""
    cells = [0] * 64
    for i, b in enumerate(payload):
        cells[i % 64] += b
    total = sum(cells)
    bits = [1 if 64 * c > total else 0 for c in cells]
    bands = [
        sum(bits[16 * k + j] << j for j in range(16)) for k in range(4)
    ]
    return bands, sum(bits)


def _payload_df(spark, rows):
    return spark.createDataFrame(
        [(i, bytearray(p)) for i, p in rows], "id long, payload binary"
    )


def test_ahash_matches_pure_python_reference(spark):
    payloads = [
        (1, bytes(range(256)) * 3),
        (2, b"the quick brown fox jumps over the lazy dog" * 7),
        (3, bytes([7] * 40)),  # shorter than the 64-cell grid
        (4, bytes([255, 0] * 200)),
    ]
    out = {
        r["id"]: r
        for r in ahash_wide(_payload_df(spark, payloads), "id", "payload").collect()
    }
    for i, p in payloads:
        bands, pop = _ref_ahash(p)
        row = out[i]
        assert [row[f"b{k}"] for k in range(4)] == bands, i
        assert row["popcount"] == pop
        assert row["n_bytes"] == len(p)


def test_exact_duplicate_payloads_pair_at_hamming_zero(spark):
    base = b"some binary payload with enough bytes to fill the grid " * 4
    other = bytes(range(200))
    df = _payload_df(spark, [(1, base), (2, base), (3, other)])
    pairs = {
        (r["d1"], r["d2"]): r["hamming"]
        for r in ahash_neardup(df, "id", "payload", max_hamming=8).collect()
    }
    assert pairs.get((1, 2)) == 0
    assert (1, 3) not in pairs and (2, 3) not in pairs


def test_pigeonhole_recall_within_three_bits(spark):
    """Any pair within Hamming 3 of the 64-bit hash must share one of
    the 4 bands, so banding finds it with recall 1 — verified by
    planting a payload whose hash differs in <= 3 bits."""
    base = bytearray(bytes(range(256)) * 2)
    mutated = bytearray(base)
    # push three cells across the mean threshold: zero out strides
    for stride in (5, 21, 47):
        for i in range(stride, len(mutated), 64):
            mutated[i] = 0
    df = _payload_df(spark, [(1, bytes(base)), (2, bytes(mutated))])
    wide = {r["id"]: r for r in ahash_wide(df, "id", "payload").collect()}
    ham = sum(
        bin(wide[1][f"b{k}"] ^ wide[2][f"b{k}"]).count("1") for k in range(4)
    )
    if 1 <= ham <= 3:  # the planted mutation's actual bit flips
        found = ahash_neardup(df, "id", "payload", max_hamming=3).collect()
        assert [(r["d1"], r["d2"]) for r in found] == [(1, 2)]
    else:  # mutation crossed more thresholds than planted — still must verify exactly
        found = ahash_neardup(df, "id", "payload", max_hamming=64).collect()
        assert all(r["hamming"] == ham for r in found)


def test_band_bucket_cap_drops_degenerate_buckets(spark):
    dup = b"identical payload repeated across the corpus " * 3
    rows = [(i, dup) for i in range(1, 6)] + [(10, bytes(range(150)))]
    df = _payload_df(spark, rows)
    uncapped = ahash_neardup(df, "id", "payload", max_hamming=8).count()
    capped = ahash_neardup(
        df, "id", "payload", max_hamming=8, band_bucket_cap=3
    ).count()
    assert uncapped == 10  # C(5,2) identical pairs
    assert capped == 0  # every band bucket of the clones exceeds the cap


def test_ahash_from_cells_matches_payload_path(spark):
    """The external-decoder seam: feeding the SAME strided cells
    through ahash_from_cells reproduces ahash_bands exactly."""
    p = bytes(range(256)) * 2
    df = _payload_df(spark, [(1, p)])
    cells = [0] * 64
    for i, b in enumerate(p):
        cells[i % 64] += b
    cells_df = spark.createDataFrame(
        [(1, c, v) for c, v in enumerate(cells)], "id long, c int, cell long"
    )
    via_cells = {
        (r["bi"]): (r["bv"], r["pop"])
        for r in ahash_from_cells(cells_df, "id").collect()
    }
    bands, pop = _ref_ahash(p)
    assert [via_cells[k][0] for k in range(4)] == bands
    assert sum(via_cells[k][1] for k in range(4)) == pop
