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
    """Pure-Python reference of the exact declared pipeline: strided
    byte cells, cross-multiplied MEAN threshold (cell/k > total/n as
    cell*n > total*k), 4 x 16-bit bands."""
    cells = [0] * 64
    ks = [0] * 64
    for i, b in enumerate(payload):
        cells[i % 64] += b
        ks[i % 64] += 1
    total, n = sum(cells), len(payload)
    bits = [
        1 if cells[c] * n > total * ks[c] else 0 for c in range(64)
    ]
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


def test_imagedup_ingest_across_batches(spark, tmp_path):
    """aHash image ingest on the shared store protocol: exact-copy
    payload of an earlier batch suppressed, fresh payload admitted,
    empty payload passes through unstored, retry re-emits."""
    from file_appender_spark.operators.neardup_ingest import imagedup_ingest_batch

    store = str(tmp_path / "imgstore")
    p1 = b"first image-ish payload with plenty of bytes " * 4
    p2 = bytes(range(256))
    b1 = _payload_df(spark, [(1, p1), (2, p2)])
    a1 = imagedup_ingest_batch(spark, b1, store, id_col="id")
    assert a1.count() == 2

    p3 = b"a genuinely different payload about something else " * 3
    b2 = spark.createDataFrame(
        [(11, bytearray(p1)), (12, bytearray(b"")), (13, bytearray(p3))],
        "id long, payload binary",
    )
    a2 = imagedup_ingest_batch(spark, b2, store, id_col="id")
    got = sorted(r["id"] for r in a2.collect())
    assert got == [12, 13]  # exact copy suppressed; empty + fresh admitted

    a2_retry = imagedup_ingest_batch(spark, b2, store, id_col="id")
    assert sorted(r["id"] for r in a2_retry.collect()) == [12, 13]

    # the empty payload must NOT be in the store (no signature row)
    stored = spark.read.parquet(store)
    assert stored.filter(stored["id"] == 12).count() == 0


def test_imagedup_within_batch_min_id_wins(spark, tmp_path):
    from file_appender_spark.operators.neardup_ingest import imagedup_ingest_batch

    store = str(tmp_path / "imgstore2")
    dup = b"identical bytes across three ids in one batch " * 3
    b = _payload_df(spark, [(5, dup), (3, dup), (9, dup)])
    a = imagedup_ingest_batch(spark, b, store, id_col="id")
    assert sorted(r["id"] for r in a.collect()) == [3]


def test_ahash_params_policy_monotone():
    from file_appender_spark.operators.imagehash import ahash_params_for

    assert ahash_params_for(200) == 64  # band 16 >= log2(200)+8
    assert ahash_params_for(100_000) == 128
    assert ahash_params_for(10_000_000) == 128
    assert ahash_params_for(10**14) == 256  # 100 TB-of-images territory
    # monotone nondecreasing in n
    grids = [ahash_params_for(n) for n in (10, 1_000, 10**5, 10**8, 10**14)]
    assert grids == sorted(grids)


def test_ahash_sized_finds_planted_pair_at_wider_grid(spark):
    from file_appender_spark.operators.imagehash import (
        ahash_neardup_sized,
        ahash_params_for,
    )

    # force the 128-cell grid by declaring a large corpus size
    n_items = 100_000
    assert ahash_params_for(n_items) == 128
    base = bytes((i * 37 + 11) % 256 for i in range(600))
    other = bytes((i * 101 + 5) % 256 for i in range(600))
    df = _payload_df(spark, [(1, base), (2, base), (3, other)])
    pairs = {
        (r["d1"], r["d2"]): r["hamming"]
        for r in ahash_neardup_sized(
            df, "id", "payload", n_items=n_items, max_hamming=3
        ).collect()
    }
    assert pairs.get((1, 2)) == 0  # exact copy at hamming 0 on the 128-bit hash
    assert (1, 3) not in pairs and (2, 3) not in pairs
