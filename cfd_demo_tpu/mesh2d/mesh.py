"""SoA/CSR quad mesh built from a quadtree (host-side).

Rebuild of /root/reference/src/quad_mesh/mesh.rs:
  * leaves gathered from the quadtree (mesh.rs:358-372)
  * cells kept when the center or any corner is inside the polygon
    (mesh.rs:56-76) -- batched through Polygon.contains_points
  * per-face neighbor lists (east/west/north/south) flattened into CSR
    range + index arrays (mesh.rs:135-169)
  * cell-edge x polygon-edge intersection points in CSR
    (mesh.rs:172-209)
  * cell cursor API and full bounding box (mesh.rs:230-341)

The reference's O(N^2) adjacency scan (mesh.rs:106-132) is replaced by
face-coordinate bucketing: cells are grouped by their quantized
west/east/south/north face coordinate, so each cell only tests the
cells whose opposite face lies on the same line -- O(N * k) with k the
cells per face line. Matching uses the same eps=1e-6 coincidence rule
and strict interval overlap as the reference.
"""
from __future__ import annotations

import dataclasses
from collections import defaultdict
from typing import Callable, Dict, List, Tuple

import numpy as np

from .geometry import AABB, Polygon, Quad
from .intersect import quad_edge_intersections
from .quadtree import QuadTree

EPS_NEIGHBOR = 1e-6  # mesh.rs:110


@dataclasses.dataclass(frozen=True)
class Cell:
    """View of one cell (mesh.rs:34-47)."""

    index: int
    center: Tuple[float, float]
    quad: Quad
    east: np.ndarray
    west: np.ndarray
    north: np.ndarray
    south: np.ndarray
    intersections: np.ndarray  # (k, 2)


def _csr(lists: List[List[int]]) -> Tuple[np.ndarray, np.ndarray]:
    counts = np.array([len(l) for l in lists], dtype=np.int64)
    offsets = np.zeros(len(lists) + 1, dtype=np.int64)
    np.cumsum(counts, out=offsets[1:])
    flat = np.array([j for l in lists for j in l], dtype=np.int64)
    return offsets, flat


def _bucket(coords: np.ndarray) -> Dict[int, List[int]]:
    """Group cell indices by quantized coordinate (eps-safe lookup
    checks the adjacent buckets too)."""
    q = np.round(coords / EPS_NEIGHBOR).astype(np.int64)
    groups: Dict[int, List[int]] = defaultdict(list)
    for i, key in enumerate(q):
        groups[int(key)].append(i)
    return groups


class QuadMesh:
    def __init__(self, centers: np.ndarray, half_w: np.ndarray,
                 half_h: np.ndarray, neighbors, intersections):
        self.centers = centers          # (n, 2)
        self.half_w = half_w            # (n,)
        self.half_h = half_h
        (self.east_off, self.east_idx,
         self.west_off, self.west_idx,
         self.north_off, self.north_idx,
         self.south_off, self.south_idx) = neighbors
        self.int_off, self.int_pts = intersections

    # ------------------------------------------------------------------
    @staticmethod
    def from_polygon(polygon: Polygon, feature_size: float,
                     max_cell_size: float) -> "QuadMesh":
        """Tesselate + build in one step, using the native C++
        tesselator when available (no Python QuadTree materialized);
        falls back to tesselate() + from_quadtree()."""
        from . import native
        leaves = native.tesselate_leaves(polygon, feature_size,
                                         max_cell_size)
        if leaves is None:
            from .quadtree import tesselate
            return QuadMesh.from_quadtree(
                tesselate(polygon, feature_size, max_cell_size), polygon)
        return QuadMesh._from_leaf_arrays(
            leaves[:, 0:2].copy(), leaves[:, 2].copy(),
            leaves[:, 3].copy(), polygon)

    @staticmethod
    def from_quadtree(root: QuadTree, polygon: Polygon) -> "QuadMesh":
        leaves = root.leaves()
        if not leaves:
            return QuadMesh(np.zeros((0, 2)), np.zeros(0), np.zeros(0),
                            tuple(np.zeros(0, np.int64) for _ in range(8)),
                            (np.zeros(1, np.int64), np.zeros((0, 2))))
        centers = np.array([[l.boundary.cx, l.boundary.cy] for l in leaves])
        half_w = np.array([l.boundary.half_width for l in leaves])
        half_h = np.array([l.boundary.half_height for l in leaves])
        return QuadMesh._from_leaf_arrays(centers, half_w, half_h, polygon)

    @staticmethod
    def _from_leaf_arrays(centers: np.ndarray, half_w: np.ndarray,
                          half_h: np.ndarray,
                          polygon: Polygon) -> "QuadMesh":
        # Inside filter: center or any corner inside (mesh.rs:56-76).
        corners = np.stack([
            centers + np.stack([-half_w, -half_h], axis=1),
            centers + np.stack([-half_w, half_h], axis=1),
            centers + np.stack([half_w, -half_h], axis=1),
            centers + np.stack([half_w, half_h], axis=1),
        ])  # (4, n, 2)
        keep = polygon.contains_points(centers)
        for c in corners:
            keep |= polygon.contains_points(c)
        centers = centers[keep]
        half_w = half_w[keep]
        half_h = half_h[keep]
        n = len(centers)

        xmin = centers[:, 0] - half_w
        xmax = centers[:, 0] + half_w
        ymin = centers[:, 1] - half_h
        ymax = centers[:, 1] + half_h

        from . import native as _native
        use_native = _native.available()

        def face_neighbors_native(face_id):
            return _native.face_adjacency(centers, half_w, half_h, face_id,
                                          EPS_NEIGHBOR)

        def face_neighbors(my_face, their_face, lo, hi):
            """Indices j whose ``their_face`` coincides with cell i's
            ``my_face`` and whose (lo, hi) interval strictly overlaps
            cell i's (mesh.rs:117-132)."""
            buckets = _bucket(their_face)
            lists: List[List[int]] = []
            for i in range(n):
                key = int(round(my_face[i] / EPS_NEIGHBOR))
                cand: List[int] = []
                for d in (-1, 0, 1):
                    cand.extend(buckets.get(key + d, ()))
                out = [int(j) for j in cand
                       if j != i
                       and abs(their_face[j] - my_face[i]) < EPS_NEIGHBOR
                       and lo[i] < hi[j] and hi[i] > lo[j]]
                lists.append(out)
            return _csr(lists)

        if use_native:
            east_off, east_idx = face_neighbors_native(0)
            west_off, west_idx = face_neighbors_native(1)
            north_off, north_idx = face_neighbors_native(2)
            south_off, south_idx = face_neighbors_native(3)
        else:
            east_off, east_idx = face_neighbors(xmax, xmin, ymin, ymax)
            west_off, west_idx = face_neighbors(xmin, xmax, ymin, ymax)
            north_off, north_idx = face_neighbors(ymax, ymin, xmin, xmax)
            south_off, south_idx = face_neighbors(ymin, ymax, xmin, xmax)

        # Cell-edge x polygon-edge intersections (mesh.rs:172-209).
        all_edges = polygon.edges()
        for hole in polygon.holes:
            all_edges.extend(hole.edges())
        pts_lists: List[List[Tuple[float, float]]] = []
        for i in range(n):
            quad = Quad.rect(tuple(centers[i]), half_w[i], half_h[i])
            # Cheap reject: edge bounding box vs cell box.
            pts: List[Tuple[float, float]] = []
            for (a, b) in all_edges:
                if (max(a[0], b[0]) < xmin[i] - EPS_NEIGHBOR
                        or min(a[0], b[0]) > xmax[i] + EPS_NEIGHBOR
                        or max(a[1], b[1]) < ymin[i] - EPS_NEIGHBOR
                        or min(a[1], b[1]) > ymax[i] + EPS_NEIGHBOR):
                    continue
                pts.extend(quad_edge_intersections(quad.vertices, a, b))
            pts_lists.append(pts)
        counts = np.array([len(p) for p in pts_lists], dtype=np.int64)
        int_off = np.zeros(n + 1, dtype=np.int64)
        np.cumsum(counts, out=int_off[1:])
        flat = [p for lst in pts_lists for p in lst]
        int_pts = (np.array(flat, dtype=np.float64).reshape(-1, 2)
                   if flat else np.zeros((0, 2)))

        return QuadMesh(
            centers, half_w, half_h,
            (east_off, east_idx, west_off, west_idx,
             north_off, north_idx, south_off, south_idx),
            (int_off, int_pts))

    # ------------------------------------------------------------------
    @property
    def num_cells(self) -> int:
        return len(self.centers)

    def cell(self, i: int) -> Cell:
        """Cell view (mesh.rs:230-291 visit_cell)."""
        sl = lambda off, idx: idx[off[i]:off[i + 1]]
        return Cell(
            index=i,
            center=tuple(self.centers[i]),
            quad=Quad.rect(tuple(self.centers[i]), self.half_w[i],
                           self.half_h[i]),
            east=sl(self.east_off, self.east_idx),
            west=sl(self.west_off, self.west_idx),
            north=sl(self.north_off, self.north_idx),
            south=sl(self.south_off, self.south_idx),
            intersections=self.int_pts[self.int_off[i]:self.int_off[i + 1]])

    def visit_all_cells(self, visit: Callable[[Cell], None]) -> None:
        for i in range(self.num_cells):
            visit(self.cell(i))

    def cell_geometry_intersections(self, i: int) -> np.ndarray:
        return self.int_pts[self.int_off[i]:self.int_off[i + 1]]

    def full_bounding_box(self) -> AABB:
        """mesh.rs:293-341."""
        if self.num_cells == 0:
            return AABB(0.0, 0.0, 0.0, 0.0)
        lo_x = float(np.min(self.centers[:, 0] - self.half_w))
        hi_x = float(np.max(self.centers[:, 0] + self.half_w))
        lo_y = float(np.min(self.centers[:, 1] - self.half_h))
        hi_y = float(np.max(self.centers[:, 1] + self.half_h))
        return AABB(0.5 * (lo_x + hi_x), 0.5 * (lo_y + hi_y),
                    0.5 * (hi_x - lo_x), 0.5 * (hi_y - lo_y))
