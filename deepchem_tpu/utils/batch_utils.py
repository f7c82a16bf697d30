"""Batch assembly helpers (reference deepchem/utils/batch_utils.py:
batch_coulomb_matrix_features, sequence padding helpers)."""

from __future__ import annotations

from typing import List, Sequence, Tuple

import numpy as np


def batch_coulomb_matrix_features(X_b: np.ndarray,
                                  distance_max: float = -1,
                                  distance_min: float = 18,
                                  n_distance: int = 100):
    """Flatten a batch of Coulomb matrices into DTNN inputs (reference
    batch_utils.py batch_coulomb_matrix_features): returns
    (atom_numbers, gaussian distance matrix, atom_membership,
    distance_membership_i, distance_membership_j)."""
    distance = []
    atom_membership = []
    distance_membership_i = []
    distance_membership_j = []
    num_atoms = []
    atom_numbers = []
    start = 0
    for im, molecule in enumerate(X_b):
        m = np.asarray(molecule)
        d = np.diag(m)
        z = np.round(np.power(2 * np.maximum(d, 0), 1 / 2.4)).astype(int)
        n = int(np.sum(z > 0))
        num_atoms.append(n)
        atom_numbers.append(z[:n])
        atom_membership.append(np.full(n, im))
        zz = np.outer(z[:n], z[:n]).astype(float)
        with np.errstate(divide='ignore', invalid='ignore'):
            dist = np.where(m[:n, :n] != 0, zz / np.maximum(
                m[:n, :n], 1e-9), 0.0)
        for i in range(n):
            for j in range(n):
                if i != j:
                    distance.append(dist[i, j])
                    distance_membership_i.append(start + i)
                    distance_membership_j.append(start + j)
        start += n
    # gaussian expansion
    steps = np.linspace(distance_max, distance_min, n_distance)
    width = (distance_min - distance_max) / n_distance
    dvals = np.asarray(distance)[:, None]
    gauss = np.exp(-0.5 * np.square((dvals - steps) / width))
    return (np.concatenate(atom_numbers).astype(np.int32),
            gauss.astype(np.float32),
            np.concatenate(atom_membership).astype(np.int32),
            np.asarray(distance_membership_i, dtype=np.int32),
            np.asarray(distance_membership_j, dtype=np.int32))


def create_input_array(sequences: Sequence[str], max_input_length: int,
                       reverse_input: bool, batch_size: int,
                       input_dict: dict, end_mark) -> np.ndarray:
    """Tokenized, padded encoder input (reference batch_utils.py
    create_input_array)."""
    out = np.zeros((batch_size, max_input_length), dtype=np.float32)
    for i, seq in enumerate(sequences):
        if reverse_input:
            seq = seq[::-1]
        for j, tok in enumerate(list(seq)[:max_input_length]):
            out[i, j] = input_dict.get(tok, 0)
        if len(seq) < max_input_length:
            out[i, len(seq)] = input_dict.get(end_mark, 0)
    return out


def create_output_array(sequences: Sequence[str], max_output_length: int,
                        batch_size: int, output_dict: dict,
                        end_mark) -> np.ndarray:
    """(reference batch_utils.py create_output_array)"""
    out = np.zeros((batch_size, max_output_length), dtype=np.float32)
    for i, seq in enumerate(sequences):
        for j, tok in enumerate(list(seq)[:max_output_length]):
            out[i, j] = output_dict.get(tok, 0)
        for j in range(len(seq), max_output_length):
            out[i, j] = output_dict.get(end_mark, 0)
    return out


def batch_elements(elements, batch_size: int):
    """Yield successive batches from a list (reference
    batch_utils.py:135)."""
    batch = []
    for e in elements:
        batch.append(e)
        if len(batch) == batch_size:
            yield batch
            batch = []
    if batch:
        yield batch
