"""Geometric manipulation utilities (reference
deepchem/utils/geometry_utils.py: unit vectors, angles, rotations,
centroids)."""

from __future__ import annotations

import numpy as np


def unit_vector(vector: np.ndarray) -> np.ndarray:
    """(reference geometry_utils.py unit_vector)"""
    return vector / np.linalg.norm(vector)


def angle_between(vector_i: np.ndarray, vector_j: np.ndarray) -> float:
    """Angle in radians (reference geometry_utils.py angle_between)."""
    vi = unit_vector(vector_i)
    vj = unit_vector(vector_j)
    return float(np.arccos(np.clip(np.dot(vi, vj), -1.0, 1.0)))


def generate_random_unit_vector() -> np.ndarray:
    """Uniform on the sphere (reference generate_random_unit_vector)."""
    r = np.random.rand(2)
    theta = 2 * np.pi * r[0]
    phi = np.arccos(2 * r[1] - 1)
    return np.array([np.cos(theta) * np.sin(phi),
                     np.sin(theta) * np.sin(phi), np.cos(phi)])


def generate_random_rotation_matrix() -> np.ndarray:
    """(reference generate_random_rotation_matrix)"""
    a = generate_random_unit_vector()
    b = generate_random_unit_vector()
    while np.abs(np.dot(a, b)) > 0.99:
        b = generate_random_unit_vector()
    b -= a * np.dot(a, b)
    b = unit_vector(b)
    c = np.cross(a, b)
    return np.stack([a, b, c])


def rotate_molecules(mol_coordinates_list):
    """Apply one random rotation to each molecule (reference
    rotate_molecules)."""
    R = generate_random_rotation_matrix()
    return [np.asarray(coords) @ R.T for coords in mol_coordinates_list]


def compute_centroid(coordinates: np.ndarray) -> np.ndarray:
    """(reference compute_centroid)"""
    return np.mean(np.asarray(coordinates), axis=0)


def subtract_centroid(xyz: np.ndarray,
                      centroid: np.ndarray) -> np.ndarray:
    """(reference subtract_centroid)"""
    return np.asarray(xyz) - np.asarray(centroid)


def compute_protein_range(coordinates: np.ndarray) -> np.ndarray:
    """(reference compute_protein_range)"""
    c = np.asarray(coordinates)
    return c.max(axis=0) - c.min(axis=0)


def compute_pairwise_distances(coords1: np.ndarray,
                               coords2: np.ndarray) -> np.ndarray:
    """(reference compute_pairwise_distances)"""
    c1 = np.asarray(coords1)
    c2 = np.asarray(coords2)
    d = c1[:, None, :] - c2[None, :, :]
    return np.sqrt(np.maximum(np.sum(d * d, axis=-1), 0))


def is_angle_within_cutoff(vector_i, vector_j, hbond_angle_cutoff
                           ) -> bool:
    """(reference is_angle_within_cutoff)"""
    angle = angle_between(vector_i, vector_j) * 180.0 / np.pi
    return (angle > (180 - hbond_angle_cutoff) and
            angle < (180 + hbond_angle_cutoff))
