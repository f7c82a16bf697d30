"""Reference import path ``deepchem/utils/dftutils.py`` (DQC wrapper
names: SpinParam, BaseQCCalc, KSCalc, BaseGrid, hashstr).  The real
quantum-chemistry engine is :mod:`deepchem_tpu.dft` (native integrals +
JAX SCF); this module provides the reference's data structures on top of
it so DQC-shaped code ports over."""

from __future__ import annotations

import hashlib
from dataclasses import dataclass
from typing import Callable, Generic, TypeVar

import numpy as np

from deepchem_tpu.dft.scf import KSCalc as _EngineKSCalc

T = TypeVar('T')


@dataclass
class SpinParam(Generic[T]):
    """Spin-up/spin-down value pair (reference dftutils.py:20)."""

    u: T
    d: T

    def sum(self):
        """u + d (reference dftutils.py:44)."""
        return self.u + self.d

    def reduce(self, fcn: Callable) -> T:
        """fcn(u, d) (reference dftutils.py:51)."""
        return fcn(self.u, self.d)


class BaseQCCalc:
    """Abstract interface of a QC calculation (reference
    dftutils.py:57).  The engine's :class:`deepchem_tpu.dft.scf.KSCalc`
    satisfies it."""

    def energy(self):
        raise NotImplementedError

    def aodm(self):
        raise NotImplementedError

    def get_system(self):
        raise NotImplementedError

    def run(self, **kwargs):
        raise NotImplementedError


class BaseGrid:
    """Abstract integration grid (reference dftutils.py:230): exposes
    the quadrature points and weights.  The engine builds Becke grids on
    DFTSystem construction; this wraps them in the DQC shape."""

    def __init__(self, rgrid=None, dvolume=None):
        self._rgrid = rgrid
        self._dvolume = dvolume

    def get_rgrid(self):
        if self._rgrid is None:
            raise NotImplementedError
        return self._rgrid

    def get_dvolume(self):
        if self._dvolume is None:
            raise NotImplementedError
        return self._dvolume

    @classmethod
    def from_system(cls, system) -> 'BaseGrid':
        """Wrap a DFTSystem's Becke grid."""
        return cls(np.asarray(system.grid_points),
                   np.asarray(system.grid_weights))


class KSCalc:
    """DQC-shaped wrapper around a finished KS calculation (reference
    dftutils.py:140).  Accepts either the engine's KSCalc (preferred) or
    any BaseQCCalc."""

    def __init__(self, qc):
        self.qc = qc

    def energy(self):
        """Total energy (reference dftutils.py:158)."""
        return self.qc.energy()

    def aodmtot(self):
        """Total AO density matrix (reference dftutils.py:166)."""
        dm = self.qc.aodm() if hasattr(self.qc, 'aodm') else self.qc.D
        if isinstance(dm, SpinParam):
            return dm.u + dm.d
        return dm

    def dens(self, rgrid=None):
        """Density on grid points (reference dftutils.py:182)."""
        if isinstance(self.qc, _EngineKSCalc):
            return self.qc.density(rgrid)
        raise NotImplementedError

    def force(self):
        """Nuclear forces = -dE/dR (reference dftutils.py:203); the
        engine computes these analytically."""
        if isinstance(self.qc, _EngineKSCalc):
            from deepchem_tpu.dft.gradients import scf_gradient
            return scf_gradient(self.qc.system)
        raise NotImplementedError


def hashstr(s: str) -> str:
    """Stable hex digest of a string (reference dftutils.py:219)."""
    return str(hashlib.blake2s(str.encode(s)).hexdigest())
