"""Pose generation via external docking binaries (reference
deepchem/dock/pose_generation.py:241 VinaPoseGenerator, :80
GninaPoseGenerator — subprocess wrappers, gated on the binaries being
installed)."""

from __future__ import annotations

import logging
import os
import shutil
import subprocess
import tempfile
from typing import List, Optional, Tuple, Union

import numpy as np

logger = logging.getLogger(__name__)


class PoseGenerator:
    """Abstract pose generator (reference pose_generation.py:33)."""

    def generate_poses(self, molecular_complex, centroid=None,
                       box_dims=None, exhaustiveness: int = 10,
                       num_modes: int = 9, num_pockets=None,
                       out_dir: Optional[str] = None,
                       generate_scores: bool = False):
        raise NotImplementedError


class VinaPoseGenerator(PoseGenerator):
    """AutoDock Vina wrapper (reference pose_generation.py:241)."""

    def __init__(self, sixty_four_bits: bool = True,
                 pocket_finder=None):
        self.vina_cmd = shutil.which('vina')
        self.pocket_finder = pocket_finder

    def generate_poses(self, molecular_complex: Tuple[str, str],
                       centroid=None, box_dims=None,
                       exhaustiveness: int = 10, num_modes: int = 9,
                       num_pockets=None, out_dir: Optional[str] = None,
                       generate_scores: bool = False):
        if self.vina_cmd is None:
            raise RuntimeError(
                'AutoDock Vina binary not found on PATH; install vina to '
                'use VinaPoseGenerator')
        protein_file, ligand_file = molecular_complex
        if out_dir is None:
            out_dir = tempfile.mkdtemp()
        os.makedirs(out_dir, exist_ok=True)
        if centroid is None:
            from deepchem_tpu.dock.binding_pocket import _load_coords
            coords = _load_coords(protein_file)
            centroid = coords.mean(axis=0)
            if box_dims is None:
                spread = coords.max(axis=0) - coords.min(axis=0)
                box_dims = spread + 5.0
        if box_dims is None:
            box_dims = np.array([20.0, 20.0, 20.0])
        out_pdbqt = os.path.join(out_dir, 'docked.pdbqt')
        log_file = os.path.join(out_dir, 'vina.log')
        cmd = [
            self.vina_cmd,
            '--receptor', protein_file, '--ligand', ligand_file,
            '--center_x', str(centroid[0]), '--center_y', str(centroid[1]),
            '--center_z', str(centroid[2]),
            '--size_x', str(box_dims[0]), '--size_y', str(box_dims[1]),
            '--size_z', str(box_dims[2]),
            '--exhaustiveness', str(exhaustiveness),
            '--num_modes', str(num_modes), '--out', out_pdbqt]
        logger.info('running: %s', ' '.join(cmd))
        subprocess.run(cmd, check=True,
                       stdout=open(log_file, 'w'),
                       stderr=subprocess.STDOUT)
        poses = [out_pdbqt]
        if generate_scores:
            scores = _parse_vina_scores(log_file)
            return poses, scores
        return poses


class GninaPoseGenerator(PoseGenerator):
    """gnina wrapper (reference pose_generation.py:80)."""

    def __init__(self):
        self.gnina_cmd = shutil.which('gnina')

    def generate_poses(self, molecular_complex: Tuple[str, str],
                       centroid=None, box_dims=None,
                       exhaustiveness: int = 10, num_modes: int = 9,
                       num_pockets=None, out_dir: Optional[str] = None,
                       generate_scores: bool = True):
        if self.gnina_cmd is None:
            raise RuntimeError(
                'gnina binary not found on PATH; install gnina to use '
                'GninaPoseGenerator')
        protein_file, ligand_file = molecular_complex
        if out_dir is None:
            out_dir = tempfile.mkdtemp()
        out_sdf = os.path.join(out_dir, 'docked.sdf')
        cmd = [self.gnina_cmd, '-r', protein_file, '-l', ligand_file,
               '--autobox_ligand', protein_file,
               '--exhaustiveness', str(exhaustiveness),
               '--num_modes', str(num_modes), '-o', out_sdf]
        subprocess.run(cmd, check=True, capture_output=True)
        if generate_scores:
            return [out_sdf], []
        return [out_sdf]


def _parse_vina_scores(log_file: str) -> List[float]:
    scores = []
    with open(log_file) as f:
        in_table = False
        for line in f:
            if line.startswith('-----'):
                in_table = True
                continue
            if in_table:
                parts = line.split()
                if len(parts) >= 2 and parts[0].isdigit():
                    try:
                        scores.append(float(parts[1]))
                    except ValueError:
                        pass
    return scores
