"""Multimodal column operators (north-star mandate).

The data model: media travels as an opaque ``binary`` payload column
plus a typed metadata struct (mime, origin, n_bytes), content-addressed
by sha256. All Spark-side plumbing — schema, partition-preserving
``mapInPandas`` decode, Arrow batch shapes, feature schemas — is real
and tested; the codec calls themselves are STUBBED (the image/audio
libraries are not in this container): ``decode_stub="fake"`` produces
deterministic pseudo-features from the payload hash, ``"raise"``
raises NotImplementedError exactly where a Pillow/librosa call would
go.
"""

from __future__ import annotations

import hashlib

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

def feature_schema(id_col: str = "doc_id") -> str:
    return (
        f"{id_col} long, content_hash string, n_bytes long, mime string, "
        "width int, height int, n_channels int, feat array<float>"
    )


FEATURE_SCHEMA = feature_schema()


def frame_payload(
    df: DataFrame, id_col: str, payload_col, mime: str, origin_col: str
) -> DataFrame:
    """Wrap raw bytes into the engine's multimodal frame: payload +
    metadata struct + sha256 content address."""
    return df.select(
        F.col(id_col),
        payload_col.alias("payload"),
        F.struct(
            F.lit(mime).alias("mime"),
            F.col(origin_col).alias("origin"),
            F.length(payload_col).alias("n_bytes"),
        ).alias("meta"),
        F.sha2(payload_col, 256).alias("content_hash"),
    )


def decode_features(
    framed: DataFrame,
    decode_stub: str = "fake",
    feat_dim: int = 8,
    id_col: str = "doc_id",
) -> DataFrame:
    """Decode payloads to fixed-size features via ``mapInPandas``.

    Scale notes: partition-preserving (no shuffle); one Arrow batch in,
    one out; the per-batch loop is where a vectorized codec (PIL /
    torchvision / ffmpeg) would run. With ``"fake"``, features are the
    first ``feat_dim`` bytes of sha256(payload) scaled to [0,1) —
    deterministic, so the plumbing is testable end to end."""

    def run(batches):
        import pandas as pd

        for pdf in batches:
            rows = []
            for _, r in pdf.iterrows():
                payload = bytes(r["payload"])
                if decode_stub == "raise":
                    raise NotImplementedError(
                        "media codec not available in this environment; "
                        "plug a PIL/librosa decoder here"
                    )
                digest = hashlib.sha256(payload).digest()
                feat = [b / 255.0 for b in digest[:feat_dim]]
                rows.append(
                    {
                        id_col: r[id_col],
                        "content_hash": r["content_hash"],
                        "n_bytes": int(r["meta"]["n_bytes"]),
                        "mime": r["meta"]["mime"],
                        # fake geometry derived from content hash —
                        # a real decoder reads these from the codec
                        "width": 1 + digest[0] % 64,
                        "height": 1 + digest[1] % 64,
                        "n_channels": 3,
                        "feat": feat,
                    }
                )
            yield pd.DataFrame(rows)

    return framed.mapInPandas(run, schema=feature_schema(id_col))


def sample_frames(
    framed: DataFrame,
    n_frames: int = 4,
    decode_stub: str = "fake",
    id_col: str = "doc_id",
) -> DataFrame:
    """One-to-many frame sampling (the video path): each payload
    yields ``n_frames`` rows, one per uniformly-sampled frame.

    Scale notes: ``mapInPandas`` with a 1->N output batch shape —
    still partition-preserving (no shuffle), and the fan-out factor
    is a constant, so downstream cardinality is predictable
    (n_inputs * n_frames). With the ``"fake"`` codec a "frame" is the
    sha256 of the payload's i-th byte-slice — deterministic and
    content-derived, so tests pin exact values; ``"raise"`` marks the
    ffmpeg/pyav call site."""

    def run(batches):
        import pandas as pd

        for pdf in batches:
            rows = []
            for _, r in pdf.iterrows():
                payload = bytes(r["payload"])
                if decode_stub == "raise":
                    raise NotImplementedError(
                        "video codec not available in this environment; "
                        "plug an ffmpeg/pyav frame sampler here"
                    )
                n = max(len(payload), 1)
                step = max(n // n_frames, 1)
                for i in range(n_frames):
                    chunk = payload[i * step : (i + 1) * step] or b"\x00"
                    rows.append(
                        {
                            id_col: r[id_col],
                            "frame_idx": i,
                            "frame_offset": min(i * step, n - 1),
                            "frame_hash": hashlib.sha256(chunk).hexdigest(),
                            "frame_bytes": len(chunk),
                        }
                    )
            yield pd.DataFrame(rows)

    return framed.mapInPandas(
        run,
        schema=(
            f"{id_col} long, frame_idx int, frame_offset long, "
            "frame_hash string, frame_bytes long"
        ),
    )


def resize_payload(
    framed: DataFrame,
    width: int,
    height: int,
    decode_stub: str = "fake",
    id_col: str = "doc_id",
) -> DataFrame:
    """Payload-to-payload transform (the resize path): emits a new
    frame with transformed bytes, updated metadata and a NEW content
    hash (content addressing means any byte change re-addresses).

    Scale notes: payload-in/payload-out keeps the operator closed
    under composition (resize |> decode_features |> ...); no shuffle.
    The ``"fake"`` codec derives exactly width*height*3 bytes from
    the source hash so size accounting is test-pinned."""

    def run(batches):
        import pandas as pd

        target = width * height * 3
        for pdf in batches:
            rows = []
            for _, r in pdf.iterrows():
                payload = bytes(r["payload"])
                if decode_stub == "raise":
                    raise NotImplementedError(
                        "image codec not available in this environment; "
                        "plug a PIL resize here"
                    )
                seed = hashlib.sha256(payload).digest()
                buf = (seed * (target // len(seed) + 1))[:target]
                rows.append(
                    {
                        id_col: r[id_col],
                        "payload": buf,
                        "mime": r["meta"]["mime"],
                        "origin": r["meta"]["origin"],
                        "width": width,
                        "height": height,
                    }
                )
            yield pd.DataFrame(rows)

    out = framed.mapInPandas(
        run,
        schema=(
            f"{id_col} long, payload binary, mime string, origin string, "
            "width int, height int"
        ),
    )
    return out.select(
        F.col(id_col),
        F.col("payload"),
        F.struct(
            F.col("mime"),
            F.col("origin"),
            F.length("payload").alias("n_bytes"),
            F.col("width"),
            F.col("height"),
        ).alias("meta"),
        F.sha2("payload", 256).alias("content_hash"),
    )
