"""Geometry / adaptive meshing subsystem (host-side, NumPy).

Rebuild of the reference's quad_mesh track (SURVEY.md section 2.4):
polygons with holes, adaptive quadtree tesselation, and the SoA/CSR
quad mesh that feeds the mesh view.
"""
from .geometry import (AABB, InvalidHole, NotEnoughVertices, Polygon,
                       PolygonError, Quad, SelfIntersecting)
from .intersect import (orientation, quad_edge_intersections,
                        segment_intersection, segments_intersect)
from .mesh import Cell, QuadMesh
from .quadtree import QuadTree, tesselate
