"""Planar geometry primitives: AABB, Quad, Polygon with holes.

Rebuild of /root/reference/src/quad_mesh/{point,aabb,quad,polygon}.rs
with NumPy-vectorized containment: polygons store their ring as an
(N, 2) float64 array and `contains_points` ray-casts a whole batch of
query points at once (the reference tests one point per call,
polygon.rs:80-105) -- the rasterizers and the mesh inside-filter batch
millions of queries through it.
"""
from __future__ import annotations

import dataclasses
import math
from typing import List, Optional, Sequence, Tuple

import numpy as np

from .intersect import segments_intersect


class PolygonError(ValueError):
    pass


class NotEnoughVertices(PolygonError):
    pass


class SelfIntersecting(PolygonError):
    pass


class InvalidHole(PolygonError):
    pass


@dataclasses.dataclass(frozen=True)
class AABB:
    """Center + half-extents box (aabb.rs:5-89). Axis convention
    follows the reference: 'top_left' is (cx - hw, cy - hh)."""

    cx: float
    cy: float
    half_width: float
    half_height: float

    @property
    def width(self) -> float:
        return 2.0 * self.half_width

    @property
    def height(self) -> float:
        return 2.0 * self.half_height

    @property
    def top_left(self):
        return (self.cx - self.half_width, self.cy - self.half_height)

    @property
    def top_right(self):
        return (self.cx + self.half_width, self.cy - self.half_height)

    @property
    def bottom_left(self):
        return (self.cx - self.half_width, self.cy + self.half_height)

    @property
    def bottom_right(self):
        return (self.cx + self.half_width, self.cy + self.half_height)

    @property
    def center(self):
        return (self.cx, self.cy)

    def contains(self, p) -> bool:
        return (self.cx - self.half_width <= p[0] <= self.cx + self.half_width
                and self.cy - self.half_height <= p[1] <= self.cy + self.half_height)

    def intersects(self, other: "AABB") -> bool:
        return (self.cx + self.half_width >= other.cx - other.half_width
                and self.cx - self.half_width <= other.cx + other.half_width
                and self.cy - self.half_height <= other.cy + other.half_height
                and self.cy + self.half_height >= other.cy - other.half_height)

    def intersects_segment(self, a, b) -> bool:
        tl, tr = self.top_left, self.top_right
        bl, br = self.bottom_left, self.bottom_right
        return (segments_intersect(a, b, tl, tr)
                or segments_intersect(a, b, tr, br)
                or segments_intersect(a, b, br, bl)
                or segments_intersect(a, b, bl, tl))

    def corners(self):
        return (self.top_left, self.top_right, self.bottom_left,
                self.bottom_right)

    def to_polygon(self) -> "Polygon":
        return Polygon.rect(self.cx - self.half_width,
                            self.cy - self.half_height,
                            self.width, self.height)


@dataclasses.dataclass(frozen=True)
class Quad:
    """Axis-ordered quadrilateral (quad.rs:4-45)."""

    bottom_left: Tuple[float, float]
    bottom_right: Tuple[float, float]
    top_right: Tuple[float, float]
    top_left: Tuple[float, float]

    @staticmethod
    def rect(center, half_width: float, half_height: float) -> "Quad":
        left, right = center[0] - half_width, center[0] + half_width
        bottom, top = center[1] - half_height, center[1] + half_height
        return Quad((left, bottom), (right, bottom), (right, top),
                    (left, top))

    @property
    def vertices(self):
        """CCW from bottom-left (quad.rs:38-45)."""
        return (self.bottom_left, self.bottom_right, self.top_right,
                self.top_left)


def _ring_self_intersects(pts: np.ndarray) -> bool:
    """Any two non-adjacent edges of the closed ring intersect
    (polygon.rs:211-233)."""
    n = len(pts)
    if n < 4:
        return False
    for i in range(n):
        p1, q1 = pts[i], pts[(i + 1) % n]
        for j in range(i + 1, n):
            if j == i or (j + 1) % n == i or (i + 1) % n == j:
                continue
            p2, q2 = pts[j], pts[(j + 1) % n]
            if segments_intersect(tuple(p1), tuple(q1), tuple(p2), tuple(q2)):
                return True
    return False


class Polygon:
    """Simple polygon with optional holes (polygon.rs:4-208).

    Construction validates >= 3 vertices and non-self-intersection.
    The (vertex_buffer, vertices) indexed form of the reference is
    accepted; internally the ring is a dense (N, 2) array.
    """

    def __init__(self, points: Sequence, indices: Optional[Sequence[int]] = None):
        buf = np.asarray(points, dtype=np.float64).reshape(-1, 2)
        ring = buf[np.asarray(indices, dtype=np.int64)] if indices is not None else buf
        if len(ring) < 3:
            raise NotEnoughVertices(f"polygon needs >= 3 vertices, got {len(ring)}")
        if _ring_self_intersects(ring):
            raise SelfIntersecting("polygon ring self-intersects")
        self.ring: np.ndarray = ring
        self.holes: List[Polygon] = []

    # --- constructors (polygon.rs:42-66) ---

    @staticmethod
    def rect(x: float, y: float, w: float, h: float) -> "Polygon":
        return Polygon([(x, y), (x + w, y), (x + w, y + h), (x, y + h)])

    @staticmethod
    def regular(center, radius: float, n: int, start_angle: float = 0.0) -> "Polygon":
        theta = np.arange(n) * (2.0 * math.pi / n) + start_angle
        pts = np.stack([center[0] + radius * np.cos(theta),
                        center[1] + radius * np.sin(theta)], axis=1)
        return Polygon(pts)

    # --- holes (polygon.rs:68-78) ---

    def add_hole(self, hole: "Polygon") -> None:
        if not bool(np.all(self.contains_points(hole.ring))):
            raise InvalidHole("hole vertex outside the parent polygon")
        self.holes.append(hole)

    # --- containment (polygon.rs:80-105), vectorized ---

    def contains_points(self, points) -> np.ndarray:
        """Ray-cast containment for an (N, 2) batch; hole-interior
        points count as outside. Matches the reference's half-open edge
        rule ((a.y > p.y) != (b.y > p.y), strict p.x < x_intersect).

        Large batches go through the native C++ core (mesh2d.native)
        when the toolchain built it; results are identical."""
        p = np.asarray(points, dtype=np.float64).reshape(-1, 2)
        if len(p) >= 4096:
            from . import native
            got = native.contains_points(self, p)
            if got is not None:
                return got
        a = self.ring
        b = np.roll(self.ring, -1, axis=0)
        py = p[:, 1][:, None]
        px = p[:, 0][:, None]
        crosses = (a[None, :, 1] > py) != (b[None, :, 1] > py)
        with np.errstate(divide="ignore", invalid="ignore"):
            x_int = a[None, :, 0] + (py - a[None, :, 1]) * (
                (b[None, :, 0] - a[None, :, 0])
                / (b[None, :, 1] - a[None, :, 1]))
        hits = crosses & (px < x_int)
        inside = (hits.sum(axis=1) % 2) == 1
        for hole in self.holes:
            inside &= ~hole.contains_points(p)
        return inside

    def contains_point(self, p) -> bool:
        return bool(self.contains_points(np.asarray(p).reshape(1, 2))[0])

    # --- AABB interaction (polygon.rs:107-135) ---

    def intersects_aabb(self, box: AABB) -> bool:
        pts = list(box.corners()) + [box.center]
        return bool(np.any(self.contains_points(np.asarray(pts))))

    def edges_intersect_aabb(self, box: AABB) -> bool:
        for a, b in self.edges():
            if box.intersects_segment(a, b):
                return True
        return any(h.edges_intersect_aabb(box) for h in self.holes)

    # --- bounds (polygon.rs:152-186) ---

    def bounding_box(self) -> AABB:
        lo = self.ring.min(axis=0)
        hi = self.ring.max(axis=0)
        c = 0.5 * (lo + hi)
        half = 0.5 * (hi - lo)
        return AABB(c[0], c[1], half[0], half[1])

    def bounding_square(self) -> AABB:
        bb = self.bounding_box()
        half = max(bb.half_width, bb.half_height)
        return AABB(bb.cx, bb.cy, half, half)

    # --- edges (polygon.rs:188-197) ---

    def edges(self):
        n = len(self.ring)
        return [(tuple(self.ring[i]), tuple(self.ring[(i + 1) % n]))
                for i in range(n)]
