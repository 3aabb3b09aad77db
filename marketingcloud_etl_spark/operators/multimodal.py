"""Multimodal column handling (BASELINE north-star).

Media payloads ride as opaque ``binary`` columns next to a typed
metadata struct; decode / feature-extraction runs as Arrow-batched
``mapInPandas`` so each task streams record batches without
materializing a partition. The actual codec step is STUBBED (image /
audio libraries are not in this environment — see ``decode_stub``):
the Spark-side plumbing (schema, batch iteration, partitioning,
deterministic fake features) is real and tested.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

FEATURE_SCHEMA = (
    "doc_id long, media_type string, n_bytes long, payload_digest string, "
    "width int, height int, feat_mean double"
)


def decode_stub(payload: bytes) -> dict:
    """Deterministic fake decoder. A real deployment swaps this for
    PIL/ffmpeg/torchaudio; everything downstream is codec-agnostic.
    Raises NotImplementedError for media types we don't fake."""
    digest = hashlib.md5(payload).hexdigest()
    # fake "dimensions" and a pooled feature derived from the digest so
    # results are reproducible and schema-faithful
    width = int(digest[:4], 16) % 1920 + 1
    height = int(digest[4:8], 16) % 1080 + 1
    feat_mean = int(digest[8:16], 16) / float(0xFFFFFFFF)
    return {"width": width, "height": height, "feat_mean": feat_mean}


def attach_binary_payload(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Fixture adapter: treat the utf-8 text bytes as an opaque media
    payload with a metadata struct — the shape a real image/audio table
    would have (payload binary, meta struct<media_type,codec>)."""
    return df.withColumn("payload", F.encode(F.col(text_col), "utf-8")).withColumn(
        "meta",
        F.struct(F.lit("image/fake").alias("media_type"), F.lit("raw").alias("codec")),
    )


def extract_features(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """mapInPandas feature extraction over binary payloads.

    Batches arrive as Arrow record batches; output schema is fixed
    (FEATURE_SCHEMA) so Catalyst can prune/plan around the Python stage.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = [decode_stub(p if isinstance(p, bytes) else bytes(p)) for p in pdf["payload"]]
            out = pd.DataFrame(
                {
                    "doc_id": pdf[id_col].astype("int64"),
                    "media_type": [m["media_type"] for m in pdf["meta"]],
                    "n_bytes": [len(p) for p in pdf["payload"]],
                    "payload_digest": [
                        hashlib.md5(p if isinstance(p, bytes) else bytes(p)).hexdigest()
                        for p in pdf["payload"]
                    ],
                    "width": [f["width"] for f in feats],
                    "height": [f["height"] for f in feats],
                    "feat_mean": [f["feat_mean"] for f in feats],
                }
            )
            yield out

    return df.select(id_col, "payload", "meta").mapInPandas(run, schema=FEATURE_SCHEMA)


FRAME_SCHEMA = "doc_id long, frame_no int, frame_offset long, frame_digest string"


def frame_sample(df: DataFrame, id_col: str = "doc_id", frame_bytes: int = 64, max_frames: int = 8) -> DataFrame:
    """One-to-many frame sampling over binary payloads via mapInPandas:
    the payload is treated as a fake video whose "frames" are
    fixed-width byte windows; up to ``max_frames`` frames sample
    evenly across the payload (deterministic offsets + digests).

    A real deployment swaps the window slicing for ffmpeg keyframe
    extraction; the Spark shape is the part that matters at scale —
    binary in, bounded typed fan-out per record, Arrow-batched, no
    driver involvement."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, nos, offs, digs = [], [], [], []
            for doc_id, payload in zip(pdf[id_col], pdf["payload"]):
                p = payload if isinstance(payload, bytes) else bytes(payload)
                n_frames = min(max_frames, max(1, len(p) // frame_bytes))
                stride = max(1, (len(p) - frame_bytes) // max(1, n_frames - 1)) if n_frames > 1 else 0
                for i in range(n_frames):
                    off = i * stride
                    ids.append(int(doc_id))
                    nos.append(i)
                    offs.append(off)
                    digs.append(hashlib.md5(p[off : off + frame_bytes]).hexdigest())
            yield pd.DataFrame(
                {"doc_id": ids, "frame_no": nos, "frame_offset": offs, "frame_digest": digs}
            )

    return df.select(id_col, "payload").mapInPandas(run, schema=FRAME_SCHEMA)


def resize_plan(df: DataFrame, target_w: int, target_h: int) -> DataFrame:
    """Decode-free resize planning: given extracted (width, height)
    metadata, compute the aspect-preserving output dims + scale factor
    as plain columns (stays in codegen). The actual pixel resample
    belongs inside the decode UDF; this keeps the planning relational
    so Catalyst can filter/prune on it (e.g. skip no-op resizes)."""
    scale = F.least(
        F.lit(float(target_w)) / F.col("width"), F.lit(float(target_h)) / F.col("height")
    )
    return (
        df.withColumn("scale", F.round(scale, 6))
        .withColumn("out_w", F.greatest(F.floor(F.col("width") * scale), F.lit(1)).cast("int"))
        .withColumn("out_h", F.greatest(F.floor(F.col("height") * scale), F.lit(1)).cast("int"))
        .withColumn("is_noop", (F.col("out_w") == F.col("width")) & (F.col("out_h") == F.col("height")))
    )


def pcm_window_energy(
    df: DataFrame,
    id_col: str = "vec_id",
    payload_col: str = "payload",
    window_samples: int = 64,
    quiet_below_milli: int = 18_918_000,
) -> DataFrame:
    """Windowed RMS energy over little-endian 16-bit PCM payloads — the
    audio half of the multimodal surface (images go through
    extract_features/frame_sample): each binary payload is decoded
    with ``np.frombuffer`` inside mapInPandas (the real Arrow-batched
    decode path a soundfile/ffmpeg front-end would use), split into
    fixed windows, and each window emits floor(1000·rms) plus a
    silence flag — the voice-activity-style pre-filter an audio
    curation pipeline runs before expensive transcription.

    Exactness contract (what lets q354 hash against a SQL oracle):
    squares and their sum are integers < 2⁵³, so float64 addition is
    exact in ANY order; /window_samples is a power-of-two division
    (exact); IEEE sqrt is correctly rounded — both engines produce the
    identical double, and floor(×1000) the identical integer. Per-row
    narrow stage, no shuffle; batches stream through Arrow."""
    import pandas as pd

    out_schema = (
        f"{id_col} bigint, window_idx int, energy_milli bigint, "
        "is_quiet boolean, n_samples int"
    )

    def gen(batches):
        import math

        import numpy as np

        for pdf in batches:
            rows = []
            for vid, payload in zip(pdf[id_col], pdf[payload_col]):
                s = np.frombuffer(bytes(payload), dtype="<i2").astype(np.float64)
                n_win = len(s) // window_samples
                for w in range(n_win):
                    chunk = s[w * window_samples : (w + 1) * window_samples]
                    rms = math.sqrt(float(np.sum(chunk * chunk)) / window_samples)
                    em = math.floor(rms * 1000.0)
                    rows.append((int(vid), w, em, em < quiet_below_milli, window_samples))
            yield pd.DataFrame(
                rows,
                columns=[id_col, "window_idx", "energy_milli", "is_quiet", "n_samples"],
            )

    return df.select(id_col, payload_col).mapInPandas(gen, out_schema)


PATCH_SCHEMA = (
    "doc_id long, px int, py int, pw int, ph int, patch_digest string"
)


def patch_grid(
    feats: DataFrame, patch: int = 256, id_col: str = "doc_id"
) -> DataFrame:
    """ViT-style PATCH EXTRACTION over decoded image metadata: each
    (width × height) image fans out to its ceil(w/p) × ceil(h/p) patch
    grid — one row per patch with its grid coordinates, ACTUAL
    dimensions (edge patches are clipped, so Σ pw·ph = w·h exactly),
    and a deterministic per-patch digest standing in for the pixel
    tile a real decoder would emit. Arrow-batched ``mapInPandas``
    one-to-many, the q73 frame-sampling shape applied to the spatial
    axis: binary-derived metadata in, bounded typed fan-out out
    (≤ ceil(1920/p)·ceil(1080/p) per record), no driver involvement.
    A real deployment swaps the digest for the tile bytes/tensor; the
    schema, batch iteration, and fan-out bound are the part that
    matters at scale."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, pxs, pys, pws, phs, digs = [], [], [], [], [], []
            for doc_id, dig, w, h in zip(
                pdf[id_col], pdf["payload_digest"], pdf["width"], pdf["height"]
            ):
                w, h = int(w), int(h)
                for py in range((h + patch - 1) // patch):
                    for px in range((w + patch - 1) // patch):
                        ids.append(int(doc_id))
                        pxs.append(px)
                        pys.append(py)
                        pws.append(min(patch, w - px * patch))
                        phs.append(min(patch, h - py * patch))
                        digs.append(
                            hashlib.md5(f"{dig}:{px}:{py}".encode()).hexdigest()
                        )
            yield pd.DataFrame(
                {
                    "doc_id": ids,
                    "px": pxs,
                    "py": pys,
                    "pw": pws,
                    "ph": phs,
                    "patch_digest": digs,
                }
            )

    return feats.select(id_col, "payload_digest", "width", "height").mapInPandas(
        run, schema=PATCH_SCHEMA
    )
