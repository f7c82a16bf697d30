"""Coupled-cluster (CCSD) and general determinant full CI.

The validation chain is self-contained, no external reference data:

- ``fci_energy`` builds the molecular Hamiltonian in the COMPLETE
  determinant space (all alpha-string x beta-string occupations) using
  spin-summed excitation operators on bitstrings — mechanical
  second-quantized algebra with bit-count signs instead of hand-cased
  Slater-Condon rules, so there is nothing to mis-transcribe.  For two
  electrons it must (and does) agree with the independent closed-form
  singlet-pair FCI (dft/posthf.py fci_2e_energy) to machine precision.
- ``ccsd_energy`` implements spin-orbital CCSD.  Exactness ladders pin
  it: for ANY 2-electron system CCSD is exact (equals FCI); its first
  iteration from t=0 is exactly MP2; and on >2-electron systems it must
  land between MP2 and the determinant FCI, close to FCI.

Reference anchor: the reference stops at the SCF (DQC port,
utils/dft_utils/qccalc/); correlation methods are new capability.
"""

from __future__ import annotations

from itertools import combinations
from typing import Optional, Tuple

import numpy as np

from deepchem_tpu.dft.scf import DFTSystem, KohnShamSCF
from deepchem_tpu.dft.posthf import _mo_coeffs


def _mo_integrals(system: DFTSystem, calc):
    """(h_mo [n,n], (pq|rs)_mo [n,n,n,n], C, mo_e) in chemists'
    notation."""
    C, mo_e = _mo_coeffs(system, calc)
    h = C.T @ (system.T + system.V) @ C
    eri = np.einsum('pi,qj,rk,sl,pqrs->ijkl', C, C, C, C, system.eri,
                    optimize=True)
    return h, eri, C, mo_e


# ---------------------------------------------------------------- FCI

def _apply_E(bits: int, p: int, q: int) -> Tuple[int, int]:
    """E_pq = a^+_p a_q on one spin bitstring: returns (new_bits,
    sign), sign 0 if annihilated."""
    if not (bits >> q) & 1:
        return 0, 0
    sign = (-1) ** bin(bits & ((1 << q) - 1)).count('1')
    bits &= ~(1 << q)
    if (bits >> p) & 1:
        return 0, 0
    sign *= (-1) ** bin(bits & ((1 << p) - 1)).count('1')
    return bits | (1 << p), sign


def fci_energy(system: DFTSystem, calc=None, n_roots: int = 1,
               spin: Optional[int] = None, iterations: int = 100):
    """Exact ground-state (and optionally excited) total energies by
    full diagonalization over ALL determinants with the given
    S_z = spin/2 (default: 0 for even electron counts, 1/2 for odd).

    H = sum h_pq E_pq + 1/2 sum (pq|rs) [E_pq E_rs - d_qr E_ps] with
    the spin-summed E_pq applied as bitstring algebra.  Dimension is
    C(n, na) * C(n, nb) — intended for small benchmark systems (the
    in-repo exactness oracle for CCSD/MP2), not production use.
    """
    if calc is None and system.n_elec % 2 == 0:
        calc = KohnShamSCF('hf', iterations=iterations).run(system)
    if calc is None:
        # odd electron count: the restricted SCF is undefined, and FCI
        # is invariant to the orthonormal MO choice over the COMPLETE
        # space — Lowdin-orthogonalized AOs serve
        C = np.asarray(system.S_invsqrt)
        h = C.T @ (system.T + system.V) @ C
        eri = np.einsum('pi,qj,rk,sl,pqrs->ijkl', C, C, C, C,
                        system.eri, optimize=True)
    else:
        h, eri, C, mo_e = _mo_integrals(system, calc)
    n = h.shape[0]
    if spin is None:
        spin = system.n_elec % 2
    na = (system.n_elec + spin) // 2
    nb = system.n_elec - na
    strings_a = [sum(1 << o for o in occ)
                 for occ in combinations(range(n), na)]
    strings_b = [sum(1 << o for o in occ)
                 for occ in combinations(range(n), nb)]
    idx_a = {s: i for i, s in enumerate(strings_a)}
    idx_b = {s: i for i, s in enumerate(strings_b)}
    ma, mb = len(strings_a), len(strings_b)
    dim = ma * mb
    if dim > 20000:
        raise ValueError(f'FCI space {dim} too large for the dense '
                         'oracle (cap 20000)')

    # precompute single-excitation tables per spin string:
    # exc[string] = list of (p, q, new_string_index, sign)
    def exc_table(strings, idx):
        out = []
        for s in strings:
            lst = []
            for q in range(n):
                if not (s >> q) & 1:
                    continue
                for p in range(n):
                    nb_, sg = _apply_E(s, p, q)
                    if sg != 0:
                        lst.append((p, q, idx[nb_], sg))
            out.append(lst)
        return out

    exc_a = exc_table(strings_a, idx_a)
    exc_b = exc_table(strings_b, idx_b)

    # effective one-body: h_pq - 1/2 sum_r (pr|rq) (absorbs the
    # -d_qr E_ps contraction term)
    heff = h - 0.5 * np.einsum('prrq->pq', eri)

    H = np.zeros((dim, dim))

    def add(ia, ib, ja, jb, val):
        H[ia * mb + ib, ja * mb + jb] += val

    # one-body + same-spin two-body via double application of E^sigma
    for ia, sa in enumerate(strings_a):
        singles = exc_a[ia]
        for (p, q, ja, sg) in singles:
            for ib in range(mb):
                add(ia, ib, ja, ib, sg * heff[p, q])
        # 1/2 (pq|rs) E^a_pq E^a_rs : apply rs first, then pq
        for (r, s, ka, sg1) in singles:
            for (p, q, ja, sg2) in exc_a[ka]:
                v = 0.5 * eri[p, q, r, s] * sg1 * sg2
                if v != 0.0:
                    for ib in range(mb):
                        add(ia, ib, ja, ib, v)
    for ib, sb in enumerate(strings_b):
        singles = exc_b[ib]
        for (p, q, jb, sg) in singles:
            for ia in range(ma):
                add(ia, ib, ia, jb, sg * heff[p, q])
        for (r, s, kb, sg1) in singles:
            for (p, q, jb, sg2) in exc_b[kb]:
                v = 0.5 * eri[p, q, r, s] * sg1 * sg2
                if v != 0.0:
                    for ia in range(ma):
                        add(ia, ib, ia, jb, v)
    # opposite-spin two-body: (pq|rs) E^a_pq E^b_rs (each pair commutes)
    for ia in range(ma):
        for (p, q, ja, sg_a) in exc_a[ia]:
            for ib in range(mb):
                for (r, s, jb, sg_b) in exc_b[ib]:
                    add(ia, ib, ja, jb,
                        eri[p, q, r, s] * sg_a * sg_b)

    w = np.linalg.eigvalsh(H)
    roots = w[:n_roots] + system.e_nuc
    return float(roots[0]) if n_roots == 1 else roots


# --------------------------------------------------------------- CCSD

def _spin_orbital_blocks(h, eri, mo_e, n_elec):
    """Antisymmetrized spin-orbital integrals <pq||rs> (physicists')
    and the occupied/virtual split.  Spin orbitals interleave
    (spatial, spin): so p = 2*P + sigma."""
    n = h.shape[0]
    nso = 2 * n
    # <pq|rs>_phys = (pr|qs)_chem * spin deltas
    eri_so = np.zeros((nso, nso, nso, nso))
    for P in range(n):
        for Q in range(n):
            for R in range(n):
                for S in range(n):
                    v = eri[P, R, Q, S]     # (PR|QS) chem -> <PQ|RS>
                    if v == 0.0:
                        continue
                    for s1 in (0, 1):
                        for s2 in (0, 1):
                            eri_so[2 * P + s1, 2 * Q + s2,
                                   2 * R + s1, 2 * S + s2] = v
    aso = eri_so - eri_so.transpose(0, 1, 3, 2)     # <pq||rs>
    e_so = np.repeat(mo_e, 2)
    o = slice(0, n_elec)
    v = slice(n_elec, nso)
    return aso, e_so, o, v


def _ccsd_kernel(aso, e_so, no, cc_maxiter=100, tol=1e-10):
    """Spin-orbital CCSD amplitude iteration (Stanton-Gauss-Watts-
    Bartlett intermediates) on generic antisymmetrized integrals:
    works for RHF references (doubled spatial orbitals) and UHF
    references (per-spin orbitals) alike — the equations only see
    <pq||rs>, the orbital energies, and the occupied count.
    Returns (e_corr, e_mp2, t1, t2)."""
    nso = aso.shape[0]
    nv = nso - no
    o = slice(0, no)
    v = slice(no, nso)
    eo, ev = e_so[o], e_so[v]
    Dia = eo[:, None] - ev[None, :]
    Dijab = (eo[:, None, None, None] + eo[None, :, None, None]
             - ev[None, None, :, None] - ev[None, None, None, :])

    oooo = aso[o, o, o, o]
    ooov = aso[o, o, o, v]
    oovv = aso[o, o, v, v]
    ovov = aso[o, v, o, v]
    ovvv = aso[o, v, v, v]
    vvvv = aso[v, v, v, v]

    vvvo = aso[v, v, v, o]
    ovoo = aso[o, v, o, o]
    ovvo = aso[o, v, v, o]

    t1 = np.zeros((no, nv))
    t2 = oovv / Dijab
    e_mp2 = 0.25 * np.einsum('ijab,ijab->', oovv, t2)

    def energy(t1, t2):
        return (0.25 * np.einsum('ijab,ijab->', oovv, t2)
                + 0.5 * np.einsum('ijab,ia,jb->', oovv, t1, t1))

    def P_ab(x):
        return x - x.transpose(0, 1, 3, 2)

    def P_ij(x):
        return x - x.transpose(1, 0, 2, 3)

    # Stanton-Gauss-Watts-Bartlett intermediates; f_ov = 0 exactly
    # (the MO coefficients diagonalize the converged Fock matrix)
    e_prev = e_mp2
    for _ in range(cc_maxiter):
        tau_t = t2 + 0.5 * (np.einsum('ia,jb->ijab', t1, t1)
                            - np.einsum('ib,ja->ijab', t1, t1))
        tau = t2 + (np.einsum('ia,jb->ijab', t1, t1)
                    - np.einsum('ib,ja->ijab', t1, t1))
        Fae = (np.einsum('mafe,mf->ae', ovvv, t1)
               - 0.5 * np.einsum('mnef,mnaf->ae', oovv, tau_t))
        Fmi = (np.einsum('mnie,ne->mi', ooov, t1)
               + 0.5 * np.einsum('mnef,inef->mi', oovv, tau_t))
        Fme = np.einsum('mnef,nf->me', oovv, t1)

        Wmnij = (oooo
                 + np.einsum('mnie,je->mnij', ooov, t1)
                 - np.einsum('mnje,ie->mnij', ooov, t1)
                 + 0.25 * np.einsum('mnef,ijef->mnij', oovv, tau))
        # <am||ef> = -<ma||ef>
        Wabef = (vvvv
                 + np.einsum('maef,mb->abef', ovvv, t1)
                 - np.einsum('mbef,ma->abef', ovvv, t1)
                 + 0.25 * np.einsum('mnef,mnab->abef', oovv, tau))
        # <mn||ej> = -<mn||je>
        Wmbej = (ovvo
                 + np.einsum('mbef,jf->mbej', ovvv, t1)
                 + np.einsum('mnje,nb->mbej', ooov, t1)
                 - np.einsum('mnef,jnfb->mbej', oovv,
                             0.5 * t2
                             + np.einsum('jf,nb->jnfb', t1, t1)))

        rhs1 = (np.einsum('ie,ae->ia', t1, Fae)
                - np.einsum('ma,mi->ia', t1, Fmi)
                + np.einsum('imae,me->ia', t2, Fme)
                - np.einsum('naif,nf->ia', ovov, t1)
                - 0.5 * np.einsum('imef,maef->ia', t2, ovvv)
                - 0.5 * np.einsum('mnae,mnie->ia', t2, ooov))
        t1_new = rhs1 / Dia

        rhs2 = oovv.copy()
        rhs2 += P_ab(np.einsum(
            'ijae,be->ijab', t2,
            Fae - 0.5 * np.einsum('mb,me->be', t1, Fme)))
        rhs2 -= P_ij(np.einsum(
            'imab,mj->ijab', t2,
            Fmi + 0.5 * np.einsum('je,me->mj', t1, Fme)))
        rhs2 += 0.5 * np.einsum('mnab,mnij->ijab', tau, Wmnij)
        rhs2 += 0.5 * np.einsum('ijef,abef->ijab', tau, Wabef)
        rhs2 += P_ij(P_ab(
            np.einsum('imae,mbej->ijab', t2, Wmbej)
            - np.einsum('ie,ma,mbej->ijab', t1, t1, ovvo)))
        rhs2 += P_ij(np.einsum('ie,abej->ijab', t1, vvvo))
        rhs2 -= P_ab(np.einsum('ma,mbij->ijab', t1, ovoo))
        t2_new = rhs2 / Dijab

        t1, t2 = t1_new, t2_new
        e_corr = float(energy(t1, t2))
        if abs(e_corr - e_prev) < tol:
            break
        e_prev = e_corr
    return e_corr, float(e_mp2), t1, t2


def _triples_correction(aso, e_so, no, t1, t2):
    """Perturbative (T) energy from converged CCSD amplitudes on
    generic spin-orbital blocks."""
    nso = aso.shape[0]
    o = slice(0, no)
    v = slice(no, nso)
    eo, ev = e_so[o], e_so[v]
    oovv = aso[o, o, v, v]
    vovv = aso[v, o, v, v]
    ovoo = aso[o, v, o, o]
    D3 = (eo[:, None, None, None, None, None]
          + eo[None, :, None, None, None, None]
          + eo[None, None, :, None, None, None]
          - ev[None, None, None, :, None, None]
          - ev[None, None, None, None, :, None]
          - ev[None, None, None, None, None, :])

    def P_i_jk(x):
        return (x - x.transpose(1, 0, 2, 3, 4, 5)
                - x.transpose(2, 1, 0, 3, 4, 5))

    def P_a_bc(x):
        return (x - x.transpose(0, 1, 2, 4, 3, 5)
                - x.transpose(0, 1, 2, 5, 4, 3))

    t3d = P_i_jk(P_a_bc(np.einsum('ia,jkbc->ijkabc', t1, oovv))) / D3
    conn = (np.einsum('jkae,eibc->ijkabc', t2, vovv)
            - np.einsum('imbc,majk->ijkabc', t2, ovoo))
    t3c = P_i_jk(P_a_bc(conn)) / D3
    return float(np.einsum('ijkabc,ijkabc->', t3c * D3, t3c + t3d)
                 / 36.0)


def ccsd_energy(system: DFTSystem, calc=None, iterations: int = 100,
                cc_maxiter: int = 100, tol: float = 1e-10,
                return_amplitudes: bool = False):
    """Closed-shell CCSD total energy via the spin-orbital amplitude
    equations.  Returns (E_total, E_corr).  Exactness pins (tests):
    2-electron systems equal FCI; iteration 1 from t=0 equals MP2;
    larger systems land between MP2 and the determinant FCI.
    """
    if calc is None:
        calc = KohnShamSCF('hf', iterations=iterations).run(system)
    h, eri, C, mo_e = _mo_integrals(system, calc)
    aso, e_so, o, v = _spin_orbital_blocks(h, eri, mo_e, system.n_elec)
    e_corr, _, t1, t2 = _ccsd_kernel(aso, e_so, system.n_elec,
                                     cc_maxiter, tol)
    out = (float(calc.energy()) + e_corr, e_corr)
    if return_amplitudes:
        out = out + ((t1, t2),)
    return out


def ccsd_t_energy(system: DFTSystem, calc=None, iterations: int = 100,
                  cc_maxiter: int = 100, tol: float = 1e-10):
    """CCSD(T): CCSD plus the perturbative connected-triples correction
    (the 'gold standard' of single-reference quantum chemistry).
    Returns (E_total, E_ccsd_corr, E_t).  Exactness pins: a 2-electron
    system has no triples (E(T) = 0 identically), and E(T) must move
    CCSD toward the determinant FCI."""
    if calc is None:
        calc = KohnShamSCF('hf', iterations=iterations).run(system)
    h, eri, C, mo_e = _mo_integrals(system, calc)
    aso, e_so, o, v = _spin_orbital_blocks(h, eri, mo_e, system.n_elec)
    e_corr, _, t1, t2 = _ccsd_kernel(aso, e_so, system.n_elec,
                                     cc_maxiter, tol)
    e_t = _triples_correction(aso, e_so, system.n_elec, t1, t2)
    return float(calc.energy()) + e_corr + e_t, e_corr, e_t


# ------------------------------------------------- open-shell (UHF)

def _uhf_spin_orbitals(system: DFTSystem, spin: Optional[int] = None,
                       iterations: int = 200):
    """UHF reference for open-shell correlation: runs the unrestricted
    HF loop, rebuilds the per-spin Fock matrices, and returns
    (E_uhf_total, Cso [nbf, nso], e_so [nso], n_occ) with spin
    orbitals ordered occupied-first (alpha then beta), each energy-
    sorted, and the antisymmetrized integrals built with PER-SPIN
    spatial orbitals (spin masks kill alpha-beta exchange blocks)."""
    import jax.numpy as jnp
    from deepchem_tpu.dft.scf import (scf_loop_unrestricted_stable as
                                      scf_loop_unrestricted,
                                      _ATOM_SPIN)
    if spin is None:
        if len(system.symbols) == 1:
            spin = _ATOM_SPIN.get(system.charges[0],
                                  system.n_elec % 2)
        else:
            spin = system.n_elec % 2
    na = (system.n_elec + spin) // 2
    nb = system.n_elec - na
    E, (Da, Db), _ = scf_loop_unrestricted(
        jnp.asarray(system.T + system.V),
        jnp.asarray(system.S_invsqrt), jnp.asarray(system.eri),
        na, nb, exc_fn=None, hf_exchange=1.0,
        iterations=iterations, mixing=0.4)
    Da = np.asarray(Da, dtype=np.float64)
    Db = np.asarray(Db, dtype=np.float64)
    H = system.T + system.V
    J = np.einsum('ijkl,kl->ij', system.eri, Da + Db)
    Ka = np.einsum('ikjl,kl->ij', system.eri, Da)
    Kb = np.einsum('ikjl,kl->ij', system.eri, Db)
    Sih = system.S_invsqrt
    orbs = {}
    for key, (F, nocc) in (('a', (H + J - Ka, na)),
                           ('b', (H + J - Kb, nb))):
        w, Cp = np.linalg.eigh(Sih.T @ F @ Sih)
        orbs[key] = (Sih @ Cp, w, nocc)
    nbf = H.shape[0]
    cols, energies, spins = [], [], []
    # occupied block (alpha occ, beta occ), then virtual block
    for occ_pass in (True, False):
        for key, sp in (('a', 0), ('b', 1)):
            C, w, nocc = orbs[key]
            rng = range(nocc) if occ_pass else range(nocc, nbf)
            for i in rng:
                cols.append(C[:, i])
                energies.append(w[i])
                spins.append(sp)
    Cso = np.stack(cols, axis=1)
    e_so = np.asarray(energies)
    spins = np.asarray(spins)
    # chemists' (pq|rs) over spin orbitals, then physicists' antisym
    chem = np.einsum('ui,vj,xk,yl,uvxy->ijkl', Cso, Cso, Cso, Cso,
                     system.eri, optimize=True)
    same = (spins[:, None] == spins[None, :]).astype(np.float64)
    chem = chem * same[:, :, None, None] * same[None, None, :, :]
    phys = chem.transpose(0, 2, 1, 3)       # <pq|rs> = (pr|qs)
    aso = phys - phys.transpose(0, 1, 3, 2)
    return float(E) + system.e_nuc, aso, e_so, system.n_elec


def ump2_energy(system: DFTSystem, spin: Optional[int] = None,
                iterations: int = 200):
    """Open-shell (UHF-reference) MP2: returns (E_total, E_corr).
    For spin=0 on a closed shell it equals the restricted mp2_energy
    exactly (pinned in tests)."""
    e_uhf, aso, e_so, nel = _uhf_spin_orbitals(system, spin,
                                               iterations)
    o = slice(0, nel)
    v = slice(nel, aso.shape[0])
    eo, ev = e_so[o], e_so[v]
    D = (eo[:, None, None, None] + eo[None, :, None, None]
         - ev[None, None, :, None] - ev[None, None, None, :])
    oovv = aso[o, o, v, v]
    e2 = 0.25 * float(np.einsum('ijab,ijab->', oovv, oovv / D))
    return e_uhf + e2, e2


def uccsd_energy(system: DFTSystem, spin: Optional[int] = None,
                 iterations: int = 200, cc_maxiter: int = 200,
                 tol: float = 1e-10):
    """Open-shell (UHF-reference) CCSD: the SAME spin-orbital kernel as
    the closed-shell path, fed per-spin orbitals.  Returns
    (E_total, E_corr)."""
    e_uhf, aso, e_so, nel = _uhf_spin_orbitals(system, spin,
                                               iterations)
    e_corr, _, t1, t2 = _ccsd_kernel(aso, e_so, nel, cc_maxiter, tol)
    return e_uhf + e_corr, e_corr


def uccsd_t_energy(system: DFTSystem, spin: Optional[int] = None,
                   iterations: int = 200, cc_maxiter: int = 200,
                   tol: float = 1e-10):
    """Open-shell CCSD(T).  Returns (E_total, E_ccsd_corr, E_t)."""
    e_uhf, aso, e_so, nel = _uhf_spin_orbitals(system, spin,
                                               iterations)
    e_corr, _, t1, t2 = _ccsd_kernel(aso, e_so, nel, cc_maxiter, tol)
    e_t = _triples_correction(aso, e_so, nel, t1, t2)
    return e_uhf + e_corr + e_t, e_corr, e_t
