"""Coordinate-box geometry (reference
deepchem/utils/coordinate_box_utils.py).  The CoordinateBox class
itself lives in ``dock/binding_pocket.py`` (it is the pocket-finder's
output type); this module adds the reference's module-level box
algebra and hull-face boxing.
"""

from __future__ import annotations

from typing import List, Tuple

import numpy as np

from deepchem_tpu.dock.binding_pocket import (CoordinateBox,
                                              merge_overlapping_boxes)

__all__ = ['CoordinateBox', 'merge_overlapping_boxes',
           'intersect_interval', 'intersection', 'union',
           'get_face_boxes']


def intersect_interval(interval1: Tuple[float, float],
                       interval2: Tuple[float, float]
                       ) -> Tuple[float, float]:
    """Intersection of two 1-D intervals; (0, 0) when disjoint
    (reference coordinate_box_utils.py:204).

    >>> intersect_interval((0, 3), (2, 5))
    (2, 3)
    >>> intersect_interval((0, 1), (2, 5))
    (0, 0)
    """
    x1_min, x1_max = interval1
    x2_min, x2_max = interval2
    if x1_max < x2_min or x2_max < x1_min:
        return (0, 0)
    return (max(x1_min, x2_min), min(x1_max, x2_max))


def intersection(box1: CoordinateBox, box2: CoordinateBox
                 ) -> CoordinateBox:
    """Intersection box of two boxes (reference
    coordinate_box_utils.py:235)."""
    return CoordinateBox(
        intersect_interval(box1.x_range, box2.x_range),
        intersect_interval(box1.y_range, box2.y_range),
        intersect_interval(box1.z_range, box2.z_range))


def union(box1: CoordinateBox, box2: CoordinateBox) -> CoordinateBox:
    """Smallest box containing both boxes (reference
    coordinate_box_utils.py:257)."""
    return box1.union(box2)


def get_face_boxes(coords: np.ndarray, pad: float = 5.0
                   ) -> List[CoordinateBox]:
    """One padded bounding box per convex-hull face of ``coords``
    (reference coordinate_box_utils.py:319) — the geometric primitive
    behind ConvexHullPocketFinder."""
    from scipy.spatial import ConvexHull
    coords = np.asarray(coords, dtype=float)
    hull = ConvexHull(coords)
    boxes = []
    for simplex in hull.simplices:
        pts = coords[simplex]
        mins = pts.min(axis=0) - pad
        maxs = pts.max(axis=0) + pad
        boxes.append(CoordinateBox((mins[0], maxs[0]),
                                   (mins[1], maxs[1]),
                                   (mins[2], maxs[2])))
    return boxes
