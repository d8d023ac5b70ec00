"""Q1-Q6: the quality gate as native Catalyst column expressions.

The gate is pure scalar arithmetic over the first media span's metrics, so
it stays JVM-side inside whole-stage codegen instead of crossing into
Python.  Semantics mirror extractors/quality.py exactly (thresholds from
/root/reference/backend/image_quality_checker.py:22-30, composite score
:204-240, pass ladder :69-142); tests/test_gate.py property-checks the two
implementations against each other.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from ..extractors.quality import THRESHOLDS as T


def quality_score_col(w: Column, h: Column, blur: Column,
                      brightness: Column, contrast: Column) -> Column:
    """Composite 0-100 quality score (Q6), built-in expressions only."""
    blur_pen = (
        F.when(blur >= T["blur_threshold"] * 2, F.lit(0.0))
        .when(blur >= T["blur_threshold"], F.lit(15.0))
        .otherwise(F.lit(30.0))
    )
    optimal = (T["brightness_min"] + T["brightness_max"]) / 2
    bright_pen = F.least(F.lit(25.0), F.abs(brightness - optimal) / optimal * 50)
    contrast_pen = (
        F.when(contrast < T["contrast_min"], F.lit(25.0))
        .when(contrast < T["contrast_min"] * 1.5, F.lit(15.0))
        .otherwise(F.lit(0.0))
    )
    res_pen = (
        F.when((w < T["min_width"]) | (h < T["min_height"]), F.lit(20.0))
        .when((w < T["min_width"] * 1.5) | (h < T["min_height"] * 1.5), F.lit(10.0))
        .otherwise(F.lit(0.0))
    )
    score = F.lit(100.0) - blur_pen - bright_pen - contrast_pen - res_pen
    return F.greatest(F.lit(0.0), F.least(F.lit(100.0), score))


def quality_passed_col(w: Column, h: Column, blur: Column,
                       brightness: Column, contrast: Column) -> Column:
    """Conjunctive gate (hard thresholds AND composite score >= 50)."""
    return (
        (w >= T["min_width"]) & (h >= T["min_height"])
        & (blur >= T["blur_threshold"])
        & (brightness >= T["brightness_min"]) & (brightness <= T["brightness_max"])
        & (contrast >= T["contrast_min"])
        & (quality_score_col(w, h, blur, brightness, contrast) >= 50.0)
    )
