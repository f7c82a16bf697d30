"""Binding pocket discovery (reference deepchem/dock/binding_pocket.py:81
ConvexHullPocketFinder)."""

from __future__ import annotations

import logging
from typing import List, Optional, Tuple

import numpy as np

logger = logging.getLogger(__name__)


class CoordinateBox:
    """An axis-aligned box (reference utils/coordinate_box_utils.py)."""

    def __init__(self, x_range: Tuple[float, float],
                 y_range: Tuple[float, float],
                 z_range: Tuple[float, float]):
        self.x_range = tuple(sorted(x_range))
        self.y_range = tuple(sorted(y_range))
        self.z_range = tuple(sorted(z_range))

    def __contains__(self, point) -> bool:
        x, y, z = point
        return (self.x_range[0] <= x <= self.x_range[1] and
                self.y_range[0] <= y <= self.y_range[1] and
                self.z_range[0] <= z <= self.z_range[1])

    def contains(self, coords) -> bool:
        """True when every coordinate lies inside the box (reference
        utils/coordinate_box_utils.py CoordinateBox.contains)."""
        coords = np.atleast_2d(np.asarray(coords, dtype=float))
        return bool(all(tuple(c) in self for c in coords))

    def center(self) -> Tuple[float, float, float]:
        return (sum(self.x_range) / 2, sum(self.y_range) / 2,
                sum(self.z_range) / 2)

    def volume(self) -> float:
        return ((self.x_range[1] - self.x_range[0]) *
                (self.y_range[1] - self.y_range[0]) *
                (self.z_range[1] - self.z_range[0]))

    def union(self, other: 'CoordinateBox') -> 'CoordinateBox':
        return CoordinateBox(
            (min(self.x_range[0], other.x_range[0]),
             max(self.x_range[1], other.x_range[1])),
            (min(self.y_range[0], other.y_range[0]),
             max(self.y_range[1], other.y_range[1])),
            (min(self.z_range[0], other.z_range[0]),
             max(self.z_range[1], other.z_range[1])))

    def intersects(self, other: 'CoordinateBox') -> bool:
        return not (
            self.x_range[1] < other.x_range[0] or
            other.x_range[1] < self.x_range[0] or
            self.y_range[1] < other.y_range[0] or
            other.y_range[1] < self.y_range[0] or
            self.z_range[1] < other.z_range[0] or
            other.z_range[1] < self.z_range[0])


def merge_overlapping_boxes(boxes: List[CoordinateBox],
                            threshold: float = 0.8) -> List[CoordinateBox]:
    """(reference coordinate_box_utils merge_overlapping_boxes)"""
    out: List[CoordinateBox] = []
    for box in boxes:
        merged = False
        for i, kept in enumerate(out):
            if box.intersects(kept):
                out[i] = kept.union(box)
                merged = True
                break
        if not merged:
            out.append(box)
    return out


class BindingPocketFinder:
    """Abstract pocket finder (reference binding_pocket.py:55)."""

    def find_pockets(self, molecule):
        raise NotImplementedError


class ConvexHullPocketFinder(BindingPocketFinder):
    """Convex-hull-based pocket finder (reference binding_pocket.py:81):
    compute the protein's convex hull, box the hull faces, merge
    overlapping boxes."""

    def __init__(self, scoring_model=None, pad: float = 5.0):
        self.scoring_model = scoring_model
        self.pad = pad

    def find_all_pockets(self, protein_coords: np.ndarray
                         ) -> List[CoordinateBox]:
        from scipy.spatial import ConvexHull
        coords = np.asarray(protein_coords, dtype=float)
        hull = ConvexHull(coords)
        boxes = []
        for simplex in hull.simplices:
            pts = coords[simplex]
            mins = pts.min(axis=0) - self.pad
            maxs = pts.max(axis=0) + self.pad
            boxes.append(CoordinateBox((mins[0], maxs[0]),
                                       (mins[1], maxs[1]),
                                       (mins[2], maxs[2])))
        return merge_overlapping_boxes(boxes)

    def find_pockets(self, macromolecule_file_or_coords
                     ) -> List[CoordinateBox]:
        if isinstance(macromolecule_file_or_coords, str):
            coords = _load_coords(macromolecule_file_or_coords)
        else:
            coords = np.asarray(macromolecule_file_or_coords)
        return self.find_all_pockets(coords)


def _load_coords(path: str) -> np.ndarray:
    """Pull atom coordinates from a PDB file (minimal parser)."""
    coords = []
    with open(path) as f:
        for line in f:
            if line.startswith(('ATOM', 'HETATM')):
                try:
                    coords.append((float(line[30:38]),
                                   float(line[38:46]),
                                   float(line[46:54])))
                except ValueError:
                    continue
    return np.asarray(coords)
