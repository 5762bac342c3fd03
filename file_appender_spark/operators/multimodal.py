"""Multimodal column operators (north-star mandate).

The data model: media travels as an opaque ``binary`` payload column
plus a typed metadata struct (mime, origin, n_bytes), content-addressed
by sha256. All Spark-side plumbing — schema, partition-preserving
``mapInPandas`` decode, Arrow batch shapes, feature schemas — is real
and tested. The codec seam has three modes:

- ``decode_stub="fake"``: deterministic pseudo-features derived from
  the payload hash — the plumbing is testable end to end without any
  media library in the container.
- ``decode_stub="pil"``: a REAL image decode/resize via Pillow, gated
  behind an import-try. Tests ``importorskip`` it; when Pillow is
  absent the operator raises ImportError at plan-build time (not
  mid-job on the executors).
- ``decode_stub="raise"``: marks the codec call site with
  NotImplementedError for media kinds with no in-container library
  (audio/video).

Per-item codec work is inherently row-wise, but the batch loops use
column-level ``zip`` over the Arrow-backed pandas frame — never
``pdf.iterrows()`` (which materializes a Series per row and was the
one row-at-a-time Python loop flagged in the round-1 review).
"""

from __future__ import annotations

import hashlib

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _pil_or_raise():
    """Import Pillow at plan-build time so a missing library fails on
    the driver with a clear message, not inside an executor task."""
    try:
        from PIL import Image  # noqa: F401

        return Image
    except ImportError as exc:  # pragma: no cover - env-dependent
        raise ImportError(
            "decode_stub='pil' needs Pillow; install it or use the "
            "deterministic 'fake' codec"
        ) from exc


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
    one out; the per-batch loop is where the codec runs. ``"pil"``
    decodes real images (geometry from the codec, features = the
    row-major mean-pooled grayscale grid at ``feat_dim`` cells);
    ``"fake"`` derives features from sha256(payload) so the plumbing is
    deterministic end to end."""
    if decode_stub == "pil":
        _pil_or_raise()

    def run(batches):
        import pandas as pd

        for pdf in batches:
            ids, hashes, bn, bm, w, h, nc, feats = [], [], [], [], [], [], [], []
            metas = pdf["meta"]
            for doc_id, payload, content_hash, meta in zip(
                pdf[id_col], pdf["payload"], pdf["content_hash"], metas
            ):
                payload = bytes(payload)
                if decode_stub == "raise":
                    raise NotImplementedError(
                        "media codec not available in this environment; "
                        "plug a PIL/librosa decoder here"
                    )
                if decode_stub == "pil":
                    import io

                    import numpy as np
                    from PIL import Image

                    img = Image.open(io.BytesIO(payload))
                    gray = np.asarray(img.convert("L"), dtype="float32") / 255.0
                    # mean-pool to feat_dim cells (row-major over a
                    # feat_dim x 1 grid of horizontal bands); images
                    # shorter than feat_dim rows are row-repeated
                    # first — array_split would otherwise produce
                    # empty bands whose mean is a silent NaN
                    if gray.shape[0] < feat_dim:
                        reps = -(-feat_dim // max(gray.shape[0], 1))
                        gray = np.repeat(gray, reps, axis=0)
                    bands = np.array_split(gray, feat_dim, axis=0)
                    feat = [float(b.mean()) for b in bands]
                    width, height = img.size
                    channels = len(img.getbands())
                else:
                    digest = hashlib.sha256(payload).digest()
                    feat = [b / 255.0 for b in digest[:feat_dim]]
                    # fake geometry derived from content hash — a real
                    # decoder reads these from the codec
                    width = 1 + digest[0] % 64
                    height = 1 + digest[1] % 64
                    channels = 3
                ids.append(doc_id)
                hashes.append(content_hash)
                bn.append(int(meta["n_bytes"]))
                bm.append(meta["mime"])
                w.append(width)
                h.append(height)
                nc.append(channels)
                feats.append(feat)
            yield pd.DataFrame(
                {
                    id_col: ids,
                    "content_hash": hashes,
                    "n_bytes": bn,
                    "mime": bm,
                    "width": w,
                    "height": h,
                    "n_channels": nc,
                    "feat": feats,
                }
            )

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
    ffmpeg/pyav call site (no video library ships in this container)."""

    def run(batches):
        import pandas as pd

        for pdf in batches:
            ids, idxs, offs, fhash, fbytes = [], [], [], [], []
            for doc_id, payload in zip(pdf[id_col], pdf["payload"]):
                payload = bytes(payload)
                if decode_stub == "raise":
                    raise NotImplementedError(
                        "video codec not available in this environment; "
                        "plug an ffmpeg/pyav frame sampler here"
                    )
                n = max(len(payload), 1)
                step = max(n // n_frames, 1)
                for i in range(n_frames):
                    chunk = payload[i * step : (i + 1) * step] or b"\x00"
                    ids.append(doc_id)
                    idxs.append(i)
                    offs.append(min(i * step, n - 1))
                    fhash.append(hashlib.sha256(chunk).hexdigest())
                    fbytes.append(len(chunk))
            yield pd.DataFrame(
                {
                    id_col: ids,
                    "frame_idx": idxs,
                    "frame_offset": offs,
                    "frame_hash": fhash,
                    "frame_bytes": fbytes,
                }
            )

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
    ``"pil"`` runs a real ``Image.resize`` and re-encodes PNG;
    ``"fake"`` derives exactly width*height*3 bytes from the source
    hash so size accounting is test-pinned."""
    if decode_stub == "pil":
        _pil_or_raise()

    def run(batches):
        import pandas as pd

        target = width * height * 3
        for pdf in batches:
            ids, payloads, mimes, origins = [], [], [], []
            for doc_id, payload, meta in zip(
                pdf[id_col], pdf["payload"], pdf["meta"]
            ):
                payload = bytes(payload)
                if decode_stub == "raise":
                    raise NotImplementedError(
                        "image codec not available in this environment; "
                        "plug a PIL resize here"
                    )
                if decode_stub == "pil":
                    import io

                    from PIL import Image

                    img = Image.open(io.BytesIO(payload)).resize((width, height))
                    out = io.BytesIO()
                    img.save(out, format="PNG")
                    buf = out.getvalue()
                    mime = "image/png"
                else:
                    seed = hashlib.sha256(payload).digest()
                    buf = (seed * (target // len(seed) + 1))[:target]
                    mime = meta["mime"]
                ids.append(doc_id)
                payloads.append(buf)
                mimes.append(mime)
                origins.append(meta["origin"])
            yield pd.DataFrame(
                {
                    id_col: ids,
                    "payload": payloads,
                    "mime": mimes,
                    "origin": origins,
                    "width": [width] * len(ids),
                    "height": [height] * len(ids),
                }
            )

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
