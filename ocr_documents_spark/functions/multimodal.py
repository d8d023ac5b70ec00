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

import pandas as pd
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import (DoubleType, IntegerType, StructField,
                               StructType)

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


@pandas_udf(MEDIA_META_TYPE)
def media_meta(media_ref: pd.Series) -> pd.DataFrame:
    """Per-media typed metadata (dimensions, quality metrics, token census).

    Arrow-batched; one decode per ref.  Unreadable payloads yield the
    all-zero QC row (fails every downstream gate) rather than erroring the
    task — corrupt objects must not kill a 10^12-doc job.
    """
    import json
    import base64
    import zlib

    from ocr_documents_spark.extractors.media import _QC_UNREADABLE

    cols = {k: [] for k in ("w", "h", "blur", "brightness", "contrast",
                            "skew", "n_tokens", "mean_token_conf")}
    for ref in media_ref.to_numpy():
        qc, tokens = dict(_QC_UNREADABLE), []
        if ref is not None:
            try:
                payload = ref.split(":", 3)[3]
                doc = json.loads(zlib.decompress(base64.b64decode(payload)))
                qc = doc.get("qc", qc)
                tokens = doc.get("tokens", [])
            except Exception:
                pass
        cols["w"].append(int(qc.get("w", 0)))
        cols["h"].append(int(qc.get("h", 0)))
        cols["blur"].append(float(qc.get("blur", 0.0)))
        cols["brightness"].append(float(qc.get("brightness", 0.0)))
        cols["contrast"].append(float(qc.get("contrast", 0.0)))
        cols["skew"].append(float(qc.get("skew", 0.0)))
        cols["n_tokens"].append(len(tokens))
        confs = [float(t[3]) for t in tokens]
        cols["mean_token_conf"].append(
            round(sum(confs) / len(confs), 6) if confs else 0.0)
    return pd.DataFrame(cols)
