"""O1-O4: span text recovery as an Arrow-batched pandas UDF.

Runs after ``posexplode(spans)`` at span granularity, so a media-heavy
document's spans are recovered in parallel across tasks (the skew unit per
SURVEY.md §4.2).  Text spans pass through with the 85.0 born-digital
confidence; media spans go through the deterministic decode seam in
extractors/media.py (production slot: pytesseract/easyocr per batch).

This is a SCALAR pandas UDF over three string columns returning a struct —
all traffic rides Arrow; no per-row Python UDF anywhere in the pipeline.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import DoubleType, StringType, StructField, StructType

from ..extractors.media import decode_media_ref
from ..extractors.pipeline_pure import TEXT_SPAN_CONFIDENCE

RECOVERED_TYPE = StructType([
    StructField("text", StringType()),
    StructField("confidence", DoubleType()),
    StructField("w", DoubleType()),
    StructField("h", DoubleType()),
    StructField("blur", DoubleType()),
    StructField("brightness", DoubleType()),
    StructField("contrast", DoubleType()),
    StructField("skew", DoubleType()),
])


@pandas_udf(RECOVERED_TYPE)
def recover_span(kind: pd.Series, text: pd.Series, media_ref: pd.Series) -> pd.DataFrame:
    n = len(kind)
    out = {
        "text": [""] * n, "confidence": [0.0] * n,
        "w": [None] * n, "h": [None] * n, "blur": [None] * n,
        "brightness": [None] * n, "contrast": [None] * n, "skew": [None] * n,
    }
    kinds = kind.to_numpy()
    texts = text.to_numpy()
    refs = media_ref.to_numpy()
    for i in range(n):
        if kinds[i] == "media":
            page_text, conf, qc = decode_media_ref(refs[i] or "")
            out["text"][i] = page_text
            out["confidence"][i] = conf
            out["w"][i] = float(qc.get("w", 0))
            out["h"][i] = float(qc.get("h", 0))
            out["blur"][i] = float(qc.get("blur", 0.0))
            out["brightness"][i] = float(qc.get("brightness", 0.0))
            out["contrast"][i] = float(qc.get("contrast", 0.0))
            out["skew"][i] = float(qc.get("skew", 0.0))
        else:
            out["text"][i] = texts[i] if texts[i] is not None else ""
            out["confidence"][i] = TEXT_SPAN_CONFIDENCE
    return pd.DataFrame(out)
