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


def _compact(items: list[Column]) -> Column:
    """Ordered array of the non-null items (JVM-side, no UDF)."""
    return F.filter(F.array(*items), lambda x: x.isNotNull())


def quality_issues_col(w: Column, h: Column, blur: Column,
                       brightness: Column, contrast: Column) -> Column:
    """Q5 fail messages, byte-identical to extractors/quality.quality_report
    (reference order + format strings, image_quality_checker.py:69-142).
    Java's %.1f matches Python's for the 1-decimal-exact fixture metrics."""
    null = F.lit(None).cast("string")
    score = quality_score_col(w, h, blur, brightness, contrast)
    resolution = F.when(
        (w < T["min_width"]) | (h < T["min_height"]),
        F.format_string(
            "Image resolution too low (%dx%d). Minimum required: %dx%d",
            w.cast("int"), h.cast("int"),
            F.lit(T["min_width"]), F.lit(T["min_height"]))).otherwise(null)
    blurry = F.when(
        blur < T["blur_threshold"],
        F.format_string("Image is blurry (score: %.1f). Minimum required: %s",
                        blur, F.lit(str(T["blur_threshold"])))).otherwise(null)
    dark = F.when(
        brightness < T["brightness_min"],
        F.format_string("Image too dark (brightness: %.1f). "
                        "Minimum required: %d",
                        brightness, F.lit(T["brightness_min"]))) \
        .when(
        brightness > T["brightness_max"],
        F.format_string("Image too bright/overexposed (brightness: %.1f). "
                        "Maximum allowed: %d",
                        brightness, F.lit(T["brightness_max"]))).otherwise(null)
    low_contrast = F.when(
        contrast < T["contrast_min"],
        F.format_string("Image has low contrast (score: %.1f). "
                        "Minimum required: %d",
                        contrast, F.lit(T["contrast_min"]))).otherwise(null)
    hard = _compact([resolution, blurry, dark, low_contrast])
    poor = F.when((score < 50.0) & (F.size(hard) == 0),
                  F.array(F.lit("Overall image quality is poor"))) \
        .otherwise(F.array().cast("array<string>"))
    return F.concat(hard, poor)


def quality_warnings_col(w: Column, h: Column, blur: Column,
                         brightness: Column, contrast: Column,
                         skew: Column) -> Column:
    """Q5 warn channel (skew > 5deg, borderline blur, score in [50, 70))."""
    null = F.lit(None).cast("string")
    score = quality_score_col(w, h, blur, brightness, contrast)
    borderline = F.when(
        (blur >= T["blur_threshold"]) & (blur < T["blur_threshold"] * 1.5),
        F.lit("Image sharpness is borderline. Results may vary.")) \
        .otherwise(null)
    rotated = F.when(
        F.abs(skew) > 5.0,
        F.format_string("Document appears rotated by %.1f°. "
                        "This may affect extraction accuracy.", skew)) \
        .otherwise(null)
    not_optimal = F.when(
        (score >= 50.0) & (score < 70.0),
        F.lit("Image quality is acceptable but not optimal")).otherwise(null)
    return _compact([borderline, rotated, not_optimal])
