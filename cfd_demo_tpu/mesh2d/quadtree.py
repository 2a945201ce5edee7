"""Adaptive quadtree tesselation over a polygon.

Rebuild of /root/reference/src/quad_mesh/quad_tree.rs:5-100: starting
from the polygon's bounding square, a cell splits 4-way while (a) its
size exceeds ``max_cell_size``, or (b) a polygon (or hole) edge crosses
it and its size exceeds ``feature_size``.

The recursion is iterative (explicit stack) so deep refinements don't
hit Python's recursion limit; leaves are emitted directly into SoA
arrays (the tree itself is kept for the tree-view rasterizer).
"""
from __future__ import annotations

import dataclasses
from typing import List, Optional, Tuple

from .geometry import AABB, Polygon


@dataclasses.dataclass
class QuadTree:
    boundary: AABB
    children: Optional[Tuple["QuadTree", "QuadTree", "QuadTree", "QuadTree"]] = None

    @property
    def is_leaf(self) -> bool:
        return self.children is None

    def leaves(self) -> List["QuadTree"]:
        out: List[QuadTree] = []
        stack = [self]
        while stack:
            node = stack.pop()
            if node.is_leaf:
                out.append(node)
            else:
                stack.extend(node.children)
        return out


def tesselate(polygon: Polygon, feature_size: float,
              max_cell_size: float) -> QuadTree:
    """quad_tree.rs:17-100. Split criterion (quad_tree.rs:23-33):
    refine while an edge crosses the cell down to ``feature_size``;
    always refine cells larger than ``max_cell_size``."""
    root = QuadTree(polygon.bounding_square())
    stack = [root]
    while stack:
        node = stack.pop()
        b = node.boundary
        cell_size = min(b.width, b.height)
        crosses = polygon.edges_intersect_aabb(b)
        if (cell_size <= feature_size or not crosses) and cell_size <= max_cell_size:
            continue
        hw = b.half_width / 2.0
        hh = b.half_height / 2.0
        node.children = tuple(
            QuadTree(AABB(b.cx + sx * hw, b.cy + sy * hh, hw, hh))
            for sy in (-1.0, 1.0) for sx in (-1.0, 1.0))
        stack.extend(node.children)
    return root
