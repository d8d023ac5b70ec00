"""PDF/layout parse: recursive XY-cut reading order over token boxes.

The pipeline's O2 ordering (sort tokens by (y, x), reference
backend/ocr_service.py:41) is exactly right for single-column scans but
interleaves the columns of a multi-column page.  This module implements
the classic recursive XY-cut page-segmentation algorithm (Nagy & Seth,
"Hierarchical representation of optically scanned documents", ICPR 1984;
standard in every layout-analysis survey): project token boxes onto each
axis, split the page at the widest whitespace band, recurse — horizontal
cuts read top-to-bottom, vertical cuts left-to-right — and leaves fall
back to the (y, x) sort.  A full-width header followed by two staggered
columns therefore reads header, then the whole left column, then the
whole right column, which no flat sort can produce.

Pure stdlib, shared verbatim by the Spark operator
(operators/layout.py) and the tests — the same single-source-of-truth
design as pipeline_pure.  No reference analogue (the reference never
segments pages); built from the published algorithm.
"""

from __future__ import annotations

from typing import List, Optional, Sequence, Tuple

# a whitespace band narrower than this is inter-line/inter-word spacing,
# not a layout boundary (in the same units as the box coordinates)
MIN_GAP = 15.0

Box = Tuple[float, float, float, float]   # (x0, y0, x1, y1)


def largest_gap(intervals: Sequence[Tuple[float, float]]
                ) -> Optional[Tuple[float, float]]:
    """Widest whitespace band strictly inside the union of intervals.

    -> (size, cut_position) or None when the occupied spans merge into one.
    """
    spans = sorted(intervals)
    merged: List[List[float]] = []
    for lo, hi in spans:
        if merged and lo <= merged[-1][1]:
            merged[-1][1] = max(merged[-1][1], hi)
        else:
            merged.append([lo, hi])
    best: Optional[Tuple[float, float]] = None
    for (_, hi), (lo, _) in zip(merged, merged[1:]):
        size = lo - hi
        if best is None or size > best[0]:
            best = (size, (hi + lo) / 2.0)
    return best


def xy_cut_order(boxes: Sequence[Box], min_gap: float = MIN_GAP) -> List[int]:
    """-> indices of ``boxes`` in reading order.

    At each level the wider of the two whitespace bands wins (ties go to
    the horizontal cut, preserving top-to-bottom reading); a region with
    no band >= min_gap is a leaf, emitted in (y0, x0) order.  Each cut
    strictly partitions a region between occupied spans, so both sides
    are non-empty and recursion terminates.
    """
    def cut(idxs: List[int]) -> List[int]:
        if len(idxs) <= 1:
            return idxs
        hgap = largest_gap([(boxes[i][1], boxes[i][3]) for i in idxs])
        vgap = largest_gap([(boxes[i][0], boxes[i][2]) for i in idxs])
        h_ok = hgap is not None and hgap[0] >= min_gap
        v_ok = vgap is not None and vgap[0] >= min_gap
        if h_ok and (not v_ok or hgap[0] >= vgap[0]):
            top = [i for i in idxs if boxes[i][3] <= hgap[1]]
            bottom = [i for i in idxs if boxes[i][3] > hgap[1]]
            return cut(top) + cut(bottom)
        if v_ok:
            left = [i for i in idxs if boxes[i][2] <= vgap[1]]
            right = [i for i in idxs if boxes[i][2] > vgap[1]]
            return cut(left) + cut(right)
        return sorted(idxs, key=lambda i: (boxes[i][1], boxes[i][0]))

    return cut(list(range(len(boxes))))


def naive_order(boxes: Sequence[Box]) -> List[int]:
    """The flat (y0, x0) sort — O2's ordering, the baseline XY-cut beats
    on multi-column layouts."""
    return sorted(range(len(boxes)), key=lambda i: (boxes[i][1], boxes[i][0]))


# --- deterministic page-geometry synthesis (fixtures + q41 input) ---------
# A word list becomes a page with a full-width header band and two
# staggered columns; word order IS reading order by construction, so the
# cross-engine oracle is exact.  The numbers below are chosen so that:
#  * the header-to-body band (28 units) and the column gap (190) exceed
#    MIN_GAP while line spacing (3-10) stays below it;
#  * header boxes bridge the column gap, so the first cut MUST be
#    horizontal;
#  * the right column's 7-unit stagger makes the flat (y, x) sort
#    interleave the columns — only a column-aware cut restores order.

HDR_BASE, HDR_MOD = 3, 3          # header word count: 3 + doc_id % 3
HDR_PITCH, HDR_W = 220, 210       # header x layout (full-width bridge;
                                  # inter-word gaps of 10 stay below
                                  # MIN_GAP so the header never splits
                                  # vertically)
HDR_Y0, HDR_Y1 = 2.0, 12.0
BODY_Y0, ROW_PITCH, TOK_H = 40, 20, 10
COL_W, RIGHT_X0, RIGHT_STAGGER = 300, 520, 7
X_JITTER_PITCH, X_JITTER_MOD = 10, 4


def header_count(doc_id: int) -> int:
    return HDR_BASE + int(doc_id) % HDR_MOD


def synthesize_token_boxes(doc_id: int, words: Sequence[str]
                           ) -> List[Tuple[float, float, float, float, str]]:
    """words (reading order) -> scattered (x0, y0, x1, y1, word) boxes."""
    hdr = header_count(doc_id)
    n_body = max(0, len(words) - hdr)
    n_left = (n_body + 1) // 2
    out = []
    for i, w in enumerate(words):
        if i < hdr:
            x0, y0 = float(i * HDR_PITCH), HDR_Y0
            x1, y1 = x0 + HDR_W, HDR_Y1
        else:
            j = i - hdr
            if j < n_left:
                x0 = float((j % X_JITTER_MOD) * X_JITTER_PITCH)
                y0 = float(BODY_Y0 + j * ROW_PITCH)
            else:
                k = j - n_left
                x0 = float(RIGHT_X0 + (k % X_JITTER_MOD) * X_JITTER_PITCH)
                y0 = float(BODY_Y0 + RIGHT_STAGGER + k * ROW_PITCH)
            x1, y1 = x0 + COL_W, y0 + TOK_H
        out.append((x0, y0, x1, y1, w))
    return out


def reading_order_words(boxes_with_words) -> List[str]:
    """(x0, y0, x1, y1, word) boxes (any order) -> words in reading order."""
    geom = [(b[0], b[1], b[2], b[3]) for b in boxes_with_words]
    return [boxes_with_words[i][4] for i in xy_cut_order(geom)]
