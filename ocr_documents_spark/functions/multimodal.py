"""Multimodal column plumbing: typed metadata + feature extraction over
opaque media references.

The engine treats image/PDF-page/audio content as opaque payloads addressed
by ``media_ref`` (at production scale: an object-store key next to a
``binary`` column), with decode / feature-extract / resize implemented as
Arrow-batched pandas UDFs.  The image/audio libraries are NOT in this
container, so the raw-byte decode seam is STUBBED (``decode_image_bytes``
raises ``NotImplementedError``); the synthetic ``m:`` refs decode through
the deterministic seam in extractors/media.py.  Everything Spark-side —
schema, UDF signature, Arrow batch shape, where the explode/regroup happens
— is real and tested (tests/test_queries spot checks + q32).

Reference lineage: EasyOCR's (bbox, text, conf) token stream and the
image-quality metrics (backend/ocr_service.py:38-52,
backend/image_quality_checker.py:56-62) are exactly this per-media typed
metadata.
"""

from __future__ import annotations

from typing import List

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import (DoubleType, IntegerType, StringType,
                               StructField, StructType)

MEDIA_META_TYPE = StructType([
    StructField("w", IntegerType()),
    StructField("h", IntegerType()),
    StructField("blur", DoubleType()),
    StructField("brightness", DoubleType()),
    StructField("contrast", DoubleType()),
    StructField("skew", DoubleType()),
    StructField("n_tokens", IntegerType()),
    StructField("mean_token_conf", DoubleType()),
])


def decode_image_bytes(data: bytes) -> dict:
    """Production decode slot (cv2/PIL): bytes -> pixel array + metrics.

    STUB — the container has no imaging libraries.  A deployment installs
    cv2 on executors and replaces this body; the UDFs below are already
    batch-shaped for it.
    """
    raise NotImplementedError(
        "raw image decode requires cv2/PIL on executors; this sandbox "
        "carries media metadata inside the deterministic m:<...> refs")


# --- frame sampling (video-shaped media) ----------------------------------
# A media payload's token rows stand in for a clip's frames (25 fps ->
# ts_ms = idx * 40); production replaces the payload parse with
# cv2.VideoCapture grabs at the SAME sampled indices.  The sampling math,
# schema, mapInPandas batch shape, and the post-UDF native resize are the
# real deliverable and are value-checked against a pure-oracle golden
# parquet (q47).

FRAME_MS = 40          # 25 fps stand-in clock

FRAME_SAMPLE_SCHEMA = StructType([
    StructField("doc_id", StringType()),
    StructField("media_offset", IntegerType()),
    StructField("frame_idx", IntegerType()),
    StructField("ts_ms", IntegerType()),
    StructField("frame_text", StringType()),
    StructField("frame_conf", DoubleType()),
    StructField("w", IntegerType()),
    StructField("h", IntegerType()),
])


def sample_frame_indices(n_frames: int, k: int) -> List[int]:
    """Uniform k-point sampling with both endpoints, exact integer math
    (floor division, so every engine/runtime agrees); fewer than k frames
    -> all of them."""
    if n_frames <= 0:
        return []
    if n_frames <= k or k == 1:
        return list(range(n_frames)) if k > 1 else [0]
    out = []
    for i in range(k):
        idx = (i * (n_frames - 1)) // (k - 1)
        if not out or idx != out[-1]:
            out.append(idx)
    return out


def frame_rows_for_ref(media_ref: str, k: int) -> List[dict]:
    """Pure per-ref frame sampler (shared by the Spark UDF and the golden
    oracle).  Frames are the payload's tokens in (y, x) decode order;
    unreadable payloads yield no frames (a corrupt clip must not kill
    the job)."""
    import base64
    import json
    import zlib
    try:
        doc_id, offset, payload = media_ref.split(":", 3)[1:4]
        doc = json.loads(zlib.decompress(base64.b64decode(payload)))
    except Exception:
        return []
    qc = doc.get("qc", {})
    frames = sorted(doc.get("tokens", []), key=lambda t: (t[0], t[1]))
    return [{"doc_id": doc_id, "media_offset": int(offset),
             "frame_idx": i, "ts_ms": i * FRAME_MS,
             "frame_text": str(frames[i][2]),
             "frame_conf": float(frames[i][3]),
             "w": int(qc.get("w", 0)), "h": int(qc.get("h", 0))}
            for i in sample_frame_indices(len(frames), k)]


def sample_frames(media: DataFrame, k: int = 4,
                  ref_col: str = "media_ref") -> DataFrame:
    """media(…, media_ref) -> one row per sampled frame, via mapInPandas
    (row-count-changing, so a scalar UDF can't express it).  No shuffle:
    sampling is per-ref; parallelism comes from the input partitioning.
    """
    def fn(batches):
        for pdf in batches:
            rows: List[dict] = []
            for ref in pdf[ref_col]:
                rows.extend(frame_rows_for_ref(ref or "", k))
            yield pd.DataFrame(
                rows, columns=[f.name for f in FRAME_SAMPLE_SCHEMA])
    return media.mapInPandas(fn, FRAME_SAMPLE_SCHEMA)


def resize_dims(w: Column, h: Column, target: int) -> Column:
    """Aspect-preserving letterbox resize arithmetic, all-native and in
    exact integer math (floor of w*target/long_side) so any engine
    reproduces it bit-for-bit: -> struct(out_w, out_h).  The pixel
    resample itself happens wherever the bytes are decoded (cv2 slot);
    planning the target geometry is engine work and belongs here."""
    long_side = F.greatest(w, h)
    out_w = F.greatest(F.floor(w * target / long_side).cast("int"), F.lit(1))
    out_h = F.greatest(F.floor(h * target / long_side).cast("int"), F.lit(1))
    zero = (w <= 0) | (h <= 0)
    return F.struct(
        F.when(zero, F.lit(0)).otherwise(out_w).alias("out_w"),
        F.when(zero, F.lit(0)).otherwise(out_h).alias("out_h"))


def media_meta_for_ref(ref) -> dict:
    """Pure per-ref metadata decode — the single implementation behind the
    :func:`media_meta` Arrow UDF AND the q32 golden-parquet oracle, so both
    sides of the driver's value check ride identical arithmetic.
    Unreadable payloads yield the all-zero QC row (fails every downstream
    gate) rather than raising — corrupt objects must not kill a 10^12-doc
    job."""
    import json
    import base64
    import zlib

    from ocr_documents_spark.extractors.media import _QC_UNREADABLE

    qc, tokens = dict(_QC_UNREADABLE), []
    if ref is not None:
        try:
            payload = ref.split(":", 3)[3]
            doc = json.loads(zlib.decompress(base64.b64decode(payload)))
            qc = doc.get("qc", qc)
            tokens = doc.get("tokens", [])
        except Exception:
            pass
    confs = [float(t[3]) for t in tokens]
    return {
        "w": int(qc.get("w", 0)), "h": int(qc.get("h", 0)),
        "blur": float(qc.get("blur", 0.0)),
        "brightness": float(qc.get("brightness", 0.0)),
        "contrast": float(qc.get("contrast", 0.0)),
        "skew": float(qc.get("skew", 0.0)),
        "n_tokens": len(tokens),
        "mean_token_conf":
            round(sum(confs) / len(confs), 6) if confs else 0.0,
    }


@pandas_udf(MEDIA_META_TYPE)
def media_meta(media_ref: pd.Series) -> pd.DataFrame:
    """Per-media typed metadata (dimensions, quality metrics, token census).

    Arrow-batched; one decode per ref (media_meta_for_ref).
    """
    rows = [media_meta_for_ref(ref) for ref in media_ref.to_numpy()]
    return pd.DataFrame(rows, columns=[f.name for f in MEDIA_META_TYPE])
