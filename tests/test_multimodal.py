"""Multimodal frame-sample + resize plumbing (functions/multimodal.py)."""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st

from ocr_documents_spark.functions.multimodal import (FRAME_MS,
                                                      frame_rows_for_ref,
                                                      sample_frame_indices)


@settings(max_examples=200, deadline=None)
@given(st.integers(min_value=0, max_value=5000),
       st.integers(min_value=1, max_value=16))
def test_sample_indices_invariants(n, k):
    idxs = sample_frame_indices(n, k)
    if n == 0:
        assert idxs == []
        return
    assert idxs == sorted(set(idxs))                 # strictly increasing
    assert all(0 <= i < n for i in idxs)
    assert len(idxs) <= max(k, 1)
    assert idxs[0] == 0                              # first frame always
    if n > k > 1:
        assert idxs[-1] == n - 1                     # last frame too
    if n <= k and k > 1:
        assert idxs == list(range(n))                # short clip: all


def test_corrupt_ref_yields_no_frames():
    assert frame_rows_for_ref("m:doc:0:!!notbase64!!", 4) == []
    assert frame_rows_for_ref("", 4) == []


def test_frame_rows_decode_order_and_clock():
    from ocr_documents_spark.extractors.media import encode_media_ref
    tokens = [[20, 1, "late", 0.5], [0, 1, "early", 0.25],
              [10, 1, "mid", 0.75]]
    ref = encode_media_ref("d7", 3, tokens, {"w": 640, "h": 480})
    rows = frame_rows_for_ref(ref, 4)
    assert [r["frame_text"] for r in rows] == ["early", "mid", "late"]
    assert [r["ts_ms"] for r in rows] == [0, FRAME_MS, 2 * FRAME_MS]
    assert rows[0]["doc_id"] == "d7" and rows[0]["media_offset"] == 3
    assert rows[0]["frame_conf"] == 0.25


def test_resize_dims_native(spark):
    from pyspark.sql import functions as F

    from ocr_documents_spark.functions.multimodal import resize_dims
    df = spark.createDataFrame(
        [(1240, 920), (920, 1240), (224, 224), (1, 5000), (0, 480)],
        "w int, h int")
    got = [(r["rz"]["out_w"], r["rz"]["out_h"]) for r in
           df.select(resize_dims(F.col("w"), F.col("h"), 224)
                     .alias("rz")).collect()]
    exp = []
    for w, h in [(1240, 920), (920, 1240), (224, 224), (1, 5000), (0, 480)]:
        if w <= 0 or h <= 0:
            exp.append((0, 0))
        else:
            ls = max(w, h)
            exp.append((max(1, w * 224 // ls), max(1, h * 224 // ls)))
    assert got == exp
    assert got[0] == (224, 166) and got[3] == (1, 224)
