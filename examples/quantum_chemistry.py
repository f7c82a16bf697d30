"""End-to-end quantum chemistry with the in-repo differentiable DFT
stack: SCF -> properties -> geometry optimization -> harmonic
frequencies -> correlation, all through the public API.

Run from the repo root: python examples/quantum_chemistry.py
(CPU, ~2 min)
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import jax

# quantum chemistry is a host-side f64 workload
jax.config.update('jax_platforms', 'cpu')
jax.config.update('jax_enable_x64', True)

import numpy as np

from deepchem_tpu.dft import (DFTSystem, KohnShamSCF, scf_gradient,
                              optimize_geometry, harmonic_frequencies,
                              mp2_energy, fci_2e_energy, dipole_moment,
                              mulliken_charges)

BOHR = 0.52917721092

# --- 1. single-point SCF across functionals ---------------------------
water = (['O', 'H', 'H'],
         [[0, 0, 0.1173], [0, 0.7572, -0.4692], [0, -0.7572, -0.4692]])
print('H2O single points (6-31G**):')
for xc in ('hf', 'lda', 'pbe', 'b3lyp', 'scan'):
    s = DFTSystem(*water, units='angstrom', basis='6-31g**')
    e = float(KohnShamSCF(xc, iterations=40).run(s).energy())
    print(f'  {xc:>6}: {e:.6f} Ha')

# --- 2. properties -----------------------------------------------------
s = DFTSystem(*water, units='angstrom', basis='sto-3g')
mu = dipole_moment(s, xc='hf')
q = mulliken_charges(s, xc='hf')
print(f'\ndipole |mu| = {np.linalg.norm(mu) * 2.5417464:.3f} D;'
      f'  Mulliken q(O) = {q[0]:+.3f}')

# --- 3. geometry optimization (analytic gradients) --------------------
e, coords, n = optimize_geometry(
    ['O', 'H', 'H'], [[0, 0, 0.15], [0, 0.8, -0.5], [0, -0.8, -0.5]],
    xc='hf', basis='sto-3g', verbose=False)
r = np.linalg.norm(coords[1] - coords[0]) * BOHR
print(f'\noptimized HF/STO-3G: r(OH) = {r:.4f} A '
      f'(textbook 0.989), E = {e:.6f} Ha, {n} gradient evals')

# --- 4. harmonic frequencies -------------------------------------------
freqs, _ = harmonic_frequencies(['O', 'H', 'H'], coords, xc='hf',
                                basis='sto-3g')
print('frequencies (cm^-1):', np.round(freqs[6:], 0),
      ' (classic HF/STO-3G: 2170 / 4140 / 4391)')

# --- 5. correlation: MP2 + exact FCI on H2 -----------------------------
h2 = DFTSystem(['H', 'H'], [[0, 0, 0], [0, 0, 1.4]], units='bohr')
calc = KohnShamSCF('hf', iterations=60).run(h2)
e_mp2, corr = mp2_energy(h2, calc)
e_fci = fci_2e_energy(h2, calc)
print(f'\nH2/STO-3G: HF {float(calc.energy()):.6f}, '
      f'MP2 corr {corr:.6f}, FCI {e_fci:.6f} '
      f'(Szabo-Ostlund -1.13728)')

# --- 6. RI-J density fitting at benzene scale --------------------------
rc, rh = 1.397, 1.397 + 1.084
ang = np.arange(6) * np.pi / 3
benzene = (['C'] * 6 + ['H'] * 6, np.concatenate([
    np.stack([rc * np.cos(ang), rc * np.sin(ang), np.zeros(6)], 1),
    np.stack([rh * np.cos(ang), rh * np.sin(ang), np.zeros(6)], 1)]))
s = DFTSystem(*benzene, units='angstrom', basis='6-31g',
              density_fit=True, n_radial=40, grid_level=1)
e = float(KohnShamSCF('pbe', iterations=40).run(s).energy())
print(f'\nbenzene PBE/6-31G (RI-J, {s.eri.nbytes // 2**20} MB factors): '
      f'{e:.6f} Ha')

# --- 7. open-shell radicals (unrestricted gradients) --------------------
from deepchem_tpu.dft import scf_gradient_unrestricted
nh2 = DFTSystem(['N', 'H', 'H'],
                [[0, 0, 0], [0, 1.5, 1.1], [0, -1.5, 1.1]],
                units='bohr', basis='sto-3g', n_radial=40, grid_level=1)
e, g = scf_gradient_unrestricted(nh2, xc='pbe', spin=1)
print(f'\nNH2 doublet UPBE: E = {e:.6f} Ha, |grad|max = '
      f'{np.abs(g).max():.4f} Ha/bohr')

# --- 8. excited states: CIS / TDA-TDDFT ---------------------------------
# the f_xc kernel is one autodiff Hessian-vector product of the
# quadrature Exc -- the same two lines serve LDA, GGA, meta-GGA, hybrid
from deepchem_tpu.dft import tda_excitations
s = DFTSystem(*water, units='angstrom', basis='6-31g',
              n_radial=40, grid_level=1)
for xc in ('hf', 'pbe'):
    res = tda_excitations(s, xc=xc, nstates=3)
    label = 'CIS' if xc == 'hf' else f'TDA-{xc.upper()}'
    print(f'{label:9s} singlets (eV): '
          + ', '.join(f'{e:.2f} (f={f:.3f})' for e, f in
                      zip(res.energies_ev(), res.oscillator_strengths)))
print('experiment: first singlet of water ~7.4 eV')

# --- 9. coupled cluster: the gold standard, checked against exact FCI --
from deepchem_tpu.dft import ccsd_energy, ccsd_t_energy, fci_energy
s = DFTSystem(*water, units='angstrom', basis='sto-3g',
              n_radial=12, grid_level=0)
calc = KohnShamSCF('hf', iterations=100).run(s)
e_ccsd, corr = ccsd_energy(s, calc)
e_t, _, de_t = ccsd_t_energy(s, calc)
e_fci = fci_energy(s, calc)
print(f'\nH2O/STO-3G: CCSD {e_ccsd:.6f}  CCSD(T) {e_t:.6f}  '
      f'FCI {e_fci:.6f}')
print(f'CCSD recovers {100 * corr / (e_fci - float(calc.energy())):.2f}%'
      ' of the exact correlation energy')
