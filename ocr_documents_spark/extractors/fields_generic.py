"""Generic field-extraction primitives (F1/F2 in SURVEY.md §2.5).

Pure text functions; Python ``re`` semantics are part of the per-row
invariant (lazy quantifiers, lookaheads, IGNORECASE|MULTILINE|DOTALL combos),
which is why the Spark side runs these same functions inside Arrow-batched
pandas UDFs instead of translating them to Java regex.
"""

from __future__ import annotations

import re
from typing import Dict, List, Optional, Tuple

_IMD = re.IGNORECASE | re.MULTILINE | re.DOTALL

# F2 label:value miner (reference: backend/ocr_service.py:89) and the
# next-label truncation list (:99).
_KV_PATTERN = re.compile(
    r"([A-Za-z][A-Za-z\s&/]{2,30}?)\s*:+\s*([A-Z0-9][^\n:]{3,50}?)(?:\n|$|(?=[A-Z][a-z]+\s*:))",
    re.MULTILINE,
)
_KV_STOP = re.compile(
    r"\s+(?:Name|Date|ID|Number|Sex|Nationality|Card|Expiry|Issue)"
)


def first_pattern_match(text: str, patterns: List[str]) -> Tuple[str, float]:
    """Ordered regex cascade; first hit wins with confidence 90.0
    (reference: backend/ocr_service.py:63-77).

    The reference takes ``group(1)`` whenever the pattern has groups; a
    pattern whose first group is optional and unmatched would raise there
    (blanket-except -> 'failed').  We treat a None group as a miss and keep
    cascading — documented deviation, keeps the operator total.
    """
    for pattern in patterns:
        match = re.search(pattern, text, _IMD)
        if match:
            value = match.group(1) if match.groups() else match.group(0)
            if value is None:
                continue
            return value.strip(), 90.0
    return "", 0.0


def extract_config_fallback(text: str, field_patterns: Dict[str, List[str]]) -> Dict:
    """Config-table extractor for LABOR_CONTRACT / PURCHASE_ORDER
    (intended logic for the dead dispatch branches, SURVEY.md §2.6 T12/T13)."""
    out: Dict[str, Dict] = {}
    for field, patterns in field_patterns.items():
        value, conf = first_pattern_match(text, patterns)
        if value:
            out[field] = {"value": value, "confidence": conf, "source": "CONFIG_PATTERN"}
    return out


def mine_key_value_pairs(text: str) -> Dict:
    """Schema-free "Label : Value" mining, confidence 85.0
    (reference: backend/ocr_service.py:79-124)."""
    mined: Dict[str, Dict] = {}
    for match in _KV_PATTERN.finditer(text):
        key = match.group(1).strip()
        value = _KV_STOP.split(match.group(2).strip())[0].strip()

        field = key.lower().replace(" ", "_").replace("&", "and").replace("/", "_")
        if len(field) < 3 or field.startswith("_") or any(c.isdigit() for c in field[:3]):
            continue
        if len(value) < 2 or len(value) > 100 or value.isspace():
            continue
        if sum(not c.isalnum() and not c.isspace() for c in value) > len(value) * 0.4:
            continue
        mined[field] = {"value": value, "confidence": 85.0, "original_label": key}
    return mined
