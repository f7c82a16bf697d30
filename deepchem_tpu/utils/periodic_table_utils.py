"""Periodic table data (reference deepchem/utils/periodic_table_utils.py:
atom numbers, masses, radii for the DFT stack)."""

from __future__ import annotations

from deepchem_tpu.chem.mol import (ATOMIC_MASS, ATOMIC_SYMBOL,
                                   PERIODIC_TABLE)

# Bragg-Slater radii in bohr (subset; reference periodic_table_utils)
ATOM_RADII_BOHR = {
    1: 0.47, 2: 0.59, 3: 2.74, 4: 1.98, 5: 1.61, 6: 1.32, 7: 1.23,
    8: 1.13, 9: 1.04, 10: 0.96, 11: 3.02, 12: 2.65, 13: 2.36, 14: 2.08,
    15: 1.89, 16: 1.79, 17: 1.70, 18: 1.61,
}


def get_atomz(element: str) -> int:
    """Symbol -> atomic number (reference periodic_table_utils
    get_atomz)."""
    if isinstance(element, (int,)):
        return int(element)
    return PERIODIC_TABLE[element]


def get_atom_mass(atomz: int) -> float:
    """Atomic mass in a.m.u. (reference get_atom_mass)."""
    return ATOMIC_MASS.get(atomz, 2.0 * atomz)


def get_period(atomz: int) -> int:
    """(reference periodic_table_utils.get_period)"""
    for period, cap in ((1, 2), (2, 10), (3, 18), (4, 36), (5, 54),
                        (6, 86), (7, 118)):
        if atomz <= cap:
            return period
    return 8
