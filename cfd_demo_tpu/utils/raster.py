"""Host-side rasterizers for geometry views.

Rebuild of /root/reference/src/utils/{drawing,polygon_rasterizer,
mesh_rasterizer,quad_tree_rasterizer}.rs. Images are (h, w, 3) uint8
NumPy arrays. The polygon fill batches all pixels through the
vectorized ray-cast (the reference tests one pixel at a time,
polygon_rasterizer.rs:44-103).
"""
from __future__ import annotations

from typing import Tuple

import numpy as np

from ..mesh2d.geometry import Polygon
from ..mesh2d.mesh import QuadMesh
from ..mesh2d.quadtree import QuadTree

WHITE = (255, 255, 255)
BLACK = (0, 0, 0)
LIGHT_BLUE = (173, 216, 230)   # egui LIGHT_BLUE fill (polygon_rasterizer.rs:69)
ORANGE = (255, 165, 0)         # intersection diamonds (mesh_rasterizer.rs)


def draw_line(img: np.ndarray, x0: int, y0: int, x1: int, y1: int,
              color: Tuple[int, int, int]) -> None:
    """Bresenham (drawing.rs:2-41)."""
    h, w, _ = img.shape
    dx = abs(x1 - x0)
    dy = -abs(y1 - y0)
    sx = 1 if x0 < x1 else -1
    sy = 1 if y0 < y1 else -1
    err = dx + dy
    x, y = x0, y0
    while True:
        if 0 <= x < w and 0 <= y < h:
            img[y, x] = color
        if x == x1 and y == y1:
            break
        e2 = 2 * err
        if e2 >= dy:
            err += dy
            x += sx
        if e2 <= dx:
            err += dx
            y += sy


def draw_diamond(img: np.ndarray, cx: int, cy: int,
                 color: Tuple[int, int, int], radius: int = 4) -> None:
    """Manhattan-distance diamond (drawing.rs:45-78)."""
    h, w, _ = img.shape
    for dy in range(-radius, radius + 1):
        for dx in range(-radius, radius + 1):
            if abs(dx) + abs(dy) <= radius:
                x, y = cx + dx, cy + dy
                if 0 <= x < w and 0 <= y < h:
                    img[y, x] = color


class RasterTransform:
    """World -> pixel mapping for a target image size, preserving the
    reference convention (y axis up in world, down in image)."""

    def __init__(self, bounds, width: int, height: int):
        (self.x0, self.y0), (self.x1, self.y1) = bounds
        self.w, self.h = width, height

    @staticmethod
    def for_polygon(polygon: Polygon, width: int, height: int):
        bb = polygon.bounding_box()
        return RasterTransform(((bb.cx - bb.half_width, bb.cy - bb.half_height),
                                (bb.cx + bb.half_width, bb.cy + bb.half_height)),
                               width, height)

    def to_px(self, x: float, y: float) -> Tuple[int, int]:
        px = (x - self.x0) / max(self.x1 - self.x0, 1e-300) * (self.w - 1)
        py = (1.0 - (y - self.y0) / max(self.y1 - self.y0, 1e-300)) * (self.h - 1)
        return int(round(px)), int(round(py))

    def pixel_centers(self) -> np.ndarray:
        """(h*w, 2) world coordinates of every pixel center."""
        xs = self.x0 + (np.arange(self.w) + 0.0) / max(self.w - 1, 1) * (self.x1 - self.x0)
        ys = self.y1 - (np.arange(self.h) + 0.0) / max(self.h - 1, 1) * (self.y1 - self.y0)
        X, Y = np.meshgrid(xs, ys)
        return np.stack([X.ravel(), Y.ravel()], axis=1)


def rasterize_polygon(polygon: Polygon, width: int = 600, height: int = 200,
                      fill=LIGHT_BLUE, edge=BLACK,
                      background=WHITE) -> np.ndarray:
    """Filled polygon with hole cutouts + edge lines
    (polygon_rasterizer.rs:44-103), batched containment."""
    img = np.full((height, width, 3), background, np.uint8)
    t = RasterTransform.for_polygon(polygon, width, height)
    inside = polygon.contains_points(t.pixel_centers()).reshape(height, width)
    img[inside] = fill
    for ring in [polygon] + polygon.holes:
        for (a, b) in ring.edges():
            draw_line(img, *t.to_px(*a), *t.to_px(*b), edge)
    return img


def rasterize_mesh(mesh: QuadMesh, width: int = 600, height: int = 200,
                   background: np.ndarray | None = None,
                   bounds=None) -> np.ndarray:
    """Cell outlines + orange diamonds at polygon-intersection points
    (mesh_rasterizer.rs:8-57)."""
    if background is not None:
        img = background.copy()
        height, width, _ = img.shape
    else:
        img = np.full((height, width, 3), WHITE, np.uint8)
    if bounds is None:
        bb = mesh.full_bounding_box()
        bounds = ((bb.cx - bb.half_width, bb.cy - bb.half_height),
                  (bb.cx + bb.half_width, bb.cy + bb.half_height))
    t = RasterTransform(bounds, width, height)
    for i in range(mesh.num_cells):
        c = mesh.cell(i)
        vs = list(c.quad.vertices)
        for k in range(4):
            a, b = vs[k], vs[(k + 1) % 4]
            draw_line(img, *t.to_px(*a), *t.to_px(*b), BLACK)
    for pt in mesh.int_pts:
        draw_diamond(img, *t.to_px(pt[0], pt[1]), ORANGE, radius=3)
    return img


def rasterize_quadtree(tree: QuadTree, width: int = 600, height: int = 200,
                       bounds=None) -> np.ndarray:
    """Leaf-cell outlines (quad_tree_rasterizer.rs:6-59)."""
    img = np.full((height, width, 3), WHITE, np.uint8)
    b = tree.boundary
    if bounds is None:
        bounds = ((b.cx - b.half_width, b.cy - b.half_height),
                  (b.cx + b.half_width, b.cy + b.half_height))
    t = RasterTransform(bounds, width, height)
    for leaf in tree.leaves():
        lb = leaf.boundary
        x0, y0 = t.to_px(lb.cx - lb.half_width, lb.cy - lb.half_height)
        x1, y1 = t.to_px(lb.cx + lb.half_width, lb.cy + lb.half_height)
        draw_line(img, x0, y0, x1, y0, BLACK)
        draw_line(img, x1, y0, x1, y1, BLACK)
        draw_line(img, x1, y1, x0, y1, BLACK)
        draw_line(img, x0, y1, x0, y0, BLACK)
    return img
