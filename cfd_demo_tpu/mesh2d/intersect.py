"""Segment/quad intersection kit (host-side, float64).

Rebuild of the reference's intersection helpers
(/root/reference/src/utils/intersection.rs:3-130): orientation sign
with epsilon-collinearity, segment-segment intersection with the
collinear special cases, unique-point solve via the 2x2 line system,
and segment-vs-axis-aligned-quad with collinear-overlap projection and
corner deduplication.

Points are (x, y) tuples / 2-arrays; batch helpers take (N, 2) arrays.
"""
from __future__ import annotations

import sys
from typing import List, Optional, Sequence, Tuple

EPS = sys.float_info.epsilon  # the reference uses f64::EPSILON

Pt = Tuple[float, float]


def orientation(p: Pt, q: Pt, r: Pt) -> int:
    """0 = collinear, 1 = clockwise, 2 = ccw.

    The reference tests |cross| < f64::EPSILON (intersection.rs), an
    ABSOLUTE threshold: with O(1)-magnitude coordinates the rounding
    error of the cross itself can exceed it, making the reported sign
    depend on argument order (e.g. 3.0 - 2.2e-16 rounds back to 3.0,
    so one ordering sees exactly 0 and the reverse sees +-eps --
    found by tests/test_mesh2d_properties.py). A Shewchuk-style static
    error filter fixes that: when |cross| is below the roundoff bound
    of its own terms, the float sign is meaningless, so report
    collinear -- consistently in every argument order."""
    t1 = (q[1] - p[1]) * (r[0] - q[0])
    t2 = (q[0] - p[0]) * (r[1] - q[1])
    val = t1 - t2
    if abs(val) <= 4.0 * EPS * (abs(t1) + abs(t2)) + EPS:
        return 0
    return 1 if val > 0.0 else 2


def _on_segment(p: Pt, q: Pt, r: Pt) -> bool:
    """q within the bounding box of segment p-r (epsilon-expanded)."""
    return (min(p[0], r[0]) - EPS <= q[0] <= max(p[0], r[0]) + EPS
            and min(p[1], r[1]) - EPS <= q[1] <= max(p[1], r[1]) + EPS)


def _canon(p: Pt, q: Pt) -> Tuple[Pt, Pt]:
    return (q, p) if (float(q[0]), float(q[1])) < (float(p[0]),
                                                   float(p[1])) else (p, q)


def segments_intersect(p: Pt, q: Pt, a: Pt, b: Pt) -> bool:
    """Do segments p-q and a-b intersect (incl. touching/collinear)?

    Endpoints and segments are canonicalized (lexicographic) before
    the orientation tests: float orientation is only approximate, so
    without a canonical evaluation order the answer near degenerate
    configurations could depend on argument order (each ordering
    evaluates differently-rounded expressions -- found by
    tests/test_mesh2d_properties.py). Canonical order makes the
    result exactly invariant under endpoint/segment swaps."""
    p, q = _canon(p, q)
    a, b = _canon(a, b)
    if (float(a[0]), float(a[1]), float(b[0]), float(b[1])) < (
            float(p[0]), float(p[1]), float(q[0]), float(q[1])):
        p, q, a, b = a, b, p, q
    o1 = orientation(p, q, a)
    o2 = orientation(p, q, b)
    o3 = orientation(a, b, p)
    o4 = orientation(a, b, q)
    if o1 != o2 and o3 != o4:
        return True
    if o1 == 0 and _on_segment(p, a, q):
        return True
    if o2 == 0 and _on_segment(p, b, q):
        return True
    if o3 == 0 and _on_segment(a, p, b):
        return True
    if o4 == 0 and _on_segment(a, q, b):
        return True
    return False


def segment_intersection(p: Pt, q: Pt, a: Pt, b: Pt) -> Optional[Pt]:
    """Unique intersection point of p-q and a-b, or None when disjoint
    or parallel/collinear (no unique point)."""
    if not segments_intersect(p, q, a, b):
        return None
    a1 = q[1] - p[1]
    b1 = p[0] - q[0]
    c1 = a1 * p[0] + b1 * p[1]
    a2 = b[1] - a[1]
    b2 = a[0] - b[0]
    c2 = a2 * a[0] + b2 * a[1]
    det = a1 * b2 - a2 * b1
    if abs(det) < EPS:
        return None
    return ((b2 * c1 - b1 * c2) / det, (a1 * c2 - a2 * c1) / det)


def quad_edge_intersections(vertices: Sequence[Pt], p1: Pt, p2: Pt) -> List[Pt]:
    """Intersection points of segment p1-p2 with a quad's boundary.

    ``vertices`` are the quad's 4 corners in order (CCW from
    bottom-left). Returns 0..2+ deduplicated points; when the segment is
    collinear with a quad edge, the overlap interval endpoints are
    returned (projection clamped to [0, 1] along p1->p2).
    """
    out: List[Pt] = []

    def push(pt: Pt):
        for o in out:
            if abs(o[0] - pt[0]) < EPS and abs(o[1] - pt[1]) < EPS:
                return
        out.append(pt)

    for i in range(4):
        v1 = vertices[i]
        v2 = vertices[(i + 1) % 4]
        if orientation(p1, p2, v1) == 0 and orientation(p1, p2, v2) == 0:
            dx = p2[0] - p1[0]
            dy = p2[1] - p1[1]
            norm = dx * dx + dy * dy
            if abs(norm) < EPS:
                continue
            t1 = ((v1[0] - p1[0]) * dx + (v1[1] - p1[1]) * dy) / norm
            t2 = ((v2[0] - p1[0]) * dx + (v2[1] - p1[1]) * dy) / norm
            t_start = max(min(t1, t2), 0.0)
            t_end = min(max(t1, t2), 1.0)
            if t_start <= t_end + EPS:
                push((p1[0] + t_start * dx, p1[1] + t_start * dy))
                push((p1[0] + t_end * dx, p1[1] + t_end * dy))
            continue
        pt = segment_intersection(p1, p2, v1, v2)
        if pt is not None:
            push(pt)
    return out
