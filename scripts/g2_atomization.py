"""G2-subset atomization energies with the in-repo SCF (VERDICT r2
item 8): LDA / PBE / SCAN in 6-31G on experimental geometries,
compared against experimental atomization energies.

The point is functional-trend validation at small-basis scale: LDA's
famous overbinding should dominate, PBE should cut it, SCAN should cut
it further (Sun et al. 2015 report G3 MAEs LSDA ~84, PBE ~22, SCAN
~4.6 kcal/mol at converged basis — small-basis numbers shift
absolutely, the ORDERING is the check).

Usage: python scripts/g2_atomization.py
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import jax

# force CPU even when the ambient sitecustomize pre-imported jax with
# the tunneled TPU platform (conftest.py recipe) — this is a host-side
# x64 quantum-chemistry script, not a TPU workload
jax.config.update('jax_platforms', 'cpu')
jax.config.update('jax_enable_x64', True)

import numpy as np

from deepchem_tpu.dft.scf import (DFTSystem, KohnShamSCF,
                                  run_unrestricted)

HARTREE_TO_KCAL = 627.5094740631

# experimental geometries (angstrom) + atomization energies (kcal/mol,
# G2/97 experimental values, ZPE-exclusive D_e where available)
MOLECULES = {
    'H2': (['H', 'H'], [[0, 0, 0], [0, 0, 0.7414]], 109.5),
    'LiH': (['Li', 'H'], [[0, 0, 0], [0, 0, 1.5957]], 58.0),
    'CH4': (['C', 'H', 'H', 'H', 'H'],
            [[0, 0, 0], [0.6276, 0.6276, 0.6276],
             [-0.6276, -0.6276, 0.6276], [0.6276, -0.6276, -0.6276],
             [-0.6276, 0.6276, -0.6276]], 419.3),
    'NH3': (['N', 'H', 'H', 'H'],
            [[0, 0, 0.1173], [0, 0.9376, -0.2738],
             [0.8119, -0.4688, -0.2738],
             [-0.8119, -0.4688, -0.2738]], 297.4),
    'H2O': (['O', 'H', 'H'],
            [[0, 0, 0.1173], [0, 0.7572, -0.4692],
             [0, -0.7572, -0.4692]], 232.2),
    'HF': (['H', 'F'], [[0, 0, 0], [0, 0, 0.9168]], 141.1),
    'N2': (['N', 'N'], [[0, 0, 0], [0, 0, 1.0977]], 228.4),
}

ATOM_SPIN = {'H': 1, 'Li': 1, 'C': 2, 'N': 3, 'O': 2, 'F': 1}


def _basis_for(symbols, basis: str) -> str:
    # the in-repo 6-31G table covers H-F except Li/Be/B; those
    # molecules fall back to STO-3G (annotated in the row)
    from deepchem_tpu.dft.basis import BASIS_SETS
    table = BASIS_SETS.get(basis.lower(), {})
    if all(s in table for s in symbols):
        return basis
    return 'sto-3g'


def atom_energy(sym: str, xc: str, basis: str) -> float:
    s = DFTSystem([sym], np.zeros((1, 3)), units='bohr',
                  n_radial=50, grid_level=2,
                  basis=_basis_for([sym], basis))
    return run_unrestricted(s, xc, spin=ATOM_SPIN[sym], iterations=120,
                            mixing=0.3)


def mol_energy(symbols, coords, xc: str, basis: str) -> float:
    s = DFTSystem(symbols, coords, units='angstrom', n_radial=50,
                  grid_level=2, basis=_basis_for(symbols, basis))
    if s.n_elec % 2:
        return run_unrestricted(s, xc, iterations=120, mixing=0.3)
    return float(KohnShamSCF(xc, iterations=120, mixing=0.4)
                 .run(s).energy())


def main(basis: str = '6-31g') -> None:
    xcs = ['lda', 'pbe', 'scan']
    atom_cache = {}
    print(f'# basis={basis}; atomization energies in kcal/mol '
          '(computed - experimental in parens)')
    header = f'{"molecule":<9}{"expt":>8}' + ''.join(
        f'{xc:>18}' for xc in xcs)
    print(header)
    errs = {xc: [] for xc in xcs}
    for name, (symbols, coords, expt) in MOLECULES.items():
        # one consistent basis per molecule (atoms AND molecule)
        mol_basis = _basis_for(symbols, basis)
        tag = '' if mol_basis == basis else '*'
        row = f'{name + tag:<9}{expt:8.1f}'
        for xc in xcs:
            for sym in symbols:
                if (sym, xc, mol_basis) not in atom_cache:
                    atom_cache[(sym, xc, mol_basis)] = atom_energy(
                        sym, xc, mol_basis)
            e_atoms = sum(atom_cache[(s, xc, mol_basis)]
                          for s in symbols)
            e_mol = mol_energy(symbols, coords, xc, mol_basis)
            ae = (e_atoms - e_mol) * HARTREE_TO_KCAL
            errs[xc].append(ae - expt)
            row += f'{ae:9.1f} ({ae - expt:+6.1f})'
        print(row, flush=True)
    print('-' * len(header))
    summary = f'{"MAE/ME":<17}'
    for xc in xcs:
        e = np.asarray(errs[xc])
        summary += f'{np.abs(e).mean():9.1f} {e.mean():+6.1f} '
    print(summary)


if __name__ == '__main__':
    main(sys.argv[1] if len(sys.argv) > 1 else '6-31g')
