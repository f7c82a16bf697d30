"""Protein sequence alignment wrappers (reference
deepchem/utils/sequence_utils.py: hhblits/hhsearch subprocess wrappers +
MSA one-hot profile).  Binaries are optional; profile encoding is
self-contained."""

from __future__ import annotations

import logging
import os
import shutil
import subprocess
from typing import List, Optional

import numpy as np

logger = logging.getLogger(__name__)

AA = list('ACDEFGHIKLMNPQRSTVWY-')


def hhblits(dataset_path: str, database: Optional[str] = None,
            data_dir: Optional[str] = None, evalue: float = 0.001,
            num_iterations: int = 2, num_threads: int = 4) -> str:
    """Run hhblits MSA search (reference sequence_utils.hhblits)."""
    exe = shutil.which('hhblits')
    if exe is None:
        raise RuntimeError('hhblits binary not found on PATH')
    out = os.path.splitext(dataset_path)[0] + '.a3m'
    cmd = [exe, '-i', dataset_path, '-oa3m', out, '-e', str(evalue),
           '-n', str(num_iterations), '-cpu', str(num_threads)]
    if database:
        cmd += ['-d', database]
    subprocess.run(cmd, check=True, capture_output=True)
    return out


def hhsearch(dataset_path: str, database: Optional[str] = None,
             data_dir: Optional[str] = None, evalue: float = 0.001,
             num_iterations: int = 2, num_threads: int = 4) -> str:
    """Run hhsearch template search (reference
    sequence_utils.hhsearch)."""
    exe = shutil.which('hhsearch')
    if exe is None:
        raise RuntimeError('hhsearch binary not found on PATH')
    out = os.path.splitext(dataset_path)[0] + '.hhr'
    cmd = [exe, '-i', dataset_path, '-o', out, '-e', str(evalue),
           '-cpu', str(num_threads)]
    if database:
        cmd += ['-d', database]
    subprocess.run(cmd, check=True, capture_output=True)
    return out


def MSA_to_dataset(msa_path: str):
    """Parse an a3m/fasta MSA into a NumpyDataset of one-hot profiles
    (reference sequence_utils MSA handling)."""
    seqs: List[str] = []
    with open(msa_path) as f:
        cur: List[str] = []
        for line in f:
            line = line.strip()
            if line.startswith('>'):
                if cur:
                    seqs.append(''.join(cur))
                    cur = []
            elif line:
                cur.append(''.join(c for c in line if not c.islower()))
        if cur:
            seqs.append(''.join(cur))
    profile = msa_profile(seqs)
    from deepchem_tpu.data import NumpyDataset
    return NumpyDataset(profile[None])


def msa_profile(seqs: List[str]) -> np.ndarray:
    """Position-frequency profile over the alignment columns."""
    if not seqs:
        return np.zeros((0, len(AA)))
    L = max(len(s) for s in seqs)
    prof = np.zeros((L, len(AA)), dtype=np.float32)
    for s in seqs:
        for i, c in enumerate(s.upper()):
            idx = AA.index(c) if c in AA else len(AA) - 1
            prof[i, idx] += 1
    return prof / max(len(seqs), 1)


def one_hot_protein(seq: str) -> np.ndarray:
    out = np.zeros((len(seq), len(AA)), dtype=np.float32)
    for i, c in enumerate(seq.upper()):
        out[i, AA.index(c) if c in AA else len(AA) - 1] = 1.0
    return out


def system_call(command: str) -> bytes:
    """Run a shell command and return its stdout (reference
    sequence_utils.py:6)."""
    import subprocess
    p = subprocess.Popen([command], stdout=subprocess.PIPE, shell=True)
    return p.stdout.read()
