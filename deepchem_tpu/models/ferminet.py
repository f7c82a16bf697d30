"""FermiNet: neural-network wavefunction VMC (reference
deepchem/models/torch_models/ferminet.py FerminetModel + Ferminet blocks in
torch_models/layers.py:5329,5485).

Compact TPU redesign: one-/two-electron feature streams, isotropic
exponential envelopes, a block determinant per spin channel, and
variational Monte Carlo with the standard stop-gradient energy estimator —
all inside jitted/vmapped computations; electron configurations come from
deepchem_tpu.utils.electron_sampler.
"""

from __future__ import annotations

import logging
from typing import List, Optional, Sequence, Tuple

import numpy as np

import jax
import jax.numpy as jnp
import optax
import flax.linen as nn

from deepchem_tpu.utils.electron_sampler import ElectronSampler

logger = logging.getLogger(__name__)


class _FermiNetwork(nn.Module):
    """Log-magnitude wavefunction log|psi|(x) for one configuration."""
    nuclei: np.ndarray             # [M, 3]
    charges: np.ndarray            # [M]
    n_up: int
    n_down: int
    hidden: int = 32
    n_layers: int = 2
    n_dets: int = 4

    @nn.compact
    def __call__(self, x):
        """x: [N, 3] one electron configuration -> scalar log|psi|."""
        nuc = jnp.asarray(self.nuclei, jnp.float32)
        N = self.n_up + self.n_down
        # one-electron features: r_iI vectors + norms
        diff = x[:, None, :] - nuc[None, :, :]           # [N, M, 3]
        r = jnp.linalg.norm(diff + 1e-12, axis=-1)       # [N, M]
        h1 = jnp.concatenate(
            [diff.reshape(N, -1), r], axis=-1)
        for _ in range(self.n_layers):
            # mean-field coupling: concat per-electron mean of the stream
            g = jnp.mean(h1, axis=0, keepdims=True).repeat(N, axis=0)
            h1 = jnp.tanh(nn.Dense(self.hidden)(
                jnp.concatenate([h1, g], axis=-1)))
        # orbitals with exponential envelopes per determinant
        orbitals = []
        for spin, (start, cnt) in enumerate(
                [(0, self.n_up), (self.n_up, self.n_down)]):
            if cnt == 0:
                continue
            phi = nn.Dense(self.n_dets * cnt)(h1[start:start + cnt])
            phi = phi.reshape(cnt, self.n_dets, cnt)     # [e, d, orb]
            # envelopes: sum_I pi exp(-sigma * r_iI)
            sigma = self.param(f'sigma_{spin}', nn.initializers.ones,
                               (self.n_dets, cnt, len(self.charges)))
            pi = self.param(f'pi_{spin}', nn.initializers.ones,
                            (self.n_dets, cnt, len(self.charges)))
            env = jnp.einsum(
                'dkm,ikm->idk', pi,
                jnp.exp(-jnp.einsum(
                    'dkm,im->ikm', jnp.abs(sigma),
                    r[start:start + cnt])))
            orbitals.append(phi * env)                   # [e, d, orb]
        # determinant per spin channel and det index
        logdets = jnp.zeros(self.n_dets)
        signs = jnp.ones(self.n_dets)
        for orb in orbitals:
            mats = jnp.transpose(orb, (1, 0, 2))         # [d, e, orb]
            s, ld = jnp.linalg.slogdet(mats)
            signs = signs * s
            logdets = logdets + ld
        # log|sum_d w_d det_d| via logsumexp
        w = self.param('det_weights', nn.initializers.ones,
                       (self.n_dets,))
        m = jnp.max(logdets)
        total = jnp.sum(w * signs * jnp.exp(logdets - m))
        return m + jnp.log(jnp.abs(total) + 1e-30)


class FerminetModel:
    """(reference ferminet.py FerminetModel contract: nucleon coordinates +
    element symbols + spin/charge; train() runs VMC; final_energy)."""

    def __init__(self, nucleon_coordinates: Sequence,
                 spin: int = 0, ion_charge: int = 0,
                 seed: int = 0, batch_no: int = 64,
                 hidden: int = 32, n_layers: int = 2, n_dets: int = 4,
                 learning_rate: float = 3e-3):
        from deepchem_tpu.chem.mol import PERIODIC_TABLE
        symbols = [s for s, _ in nucleon_coordinates]
        coords = np.asarray([c for _, c in nucleon_coordinates],
                            dtype=np.float32)
        charges = np.asarray([PERIODIC_TABLE[s] for s in symbols],
                             dtype=np.float32)
        n_elec = int(charges.sum()) - ion_charge
        n_up = (n_elec + spin) // 2
        n_down = n_elec - n_up
        self.nuclei = coords
        self.charges = charges
        self.symbols = symbols
        self.n_up, self.n_down = n_up, n_down
        self.net = _FermiNetwork(nuclei=coords, charges=charges,
                                 n_up=n_up, n_down=n_down,
                                 hidden=hidden, n_layers=n_layers,
                                 n_dets=n_dets)
        self._rng = jax.random.PRNGKey(seed)
        x0 = jnp.zeros((n_elec, 3))
        self.params = self.net.init({'params': self._rng}, x0)
        self._optax = optax.adam(learning_rate)
        self.opt_state = self._optax.init(self.params)
        self.batch_no = batch_no

        def logpsi(params, x):
            return self.net.apply(params, x)
        self._logpsi = logpsi
        self._psi2 = jax.jit(jax.vmap(
            lambda x: jnp.exp(2.0 * logpsi(self.params, x))))
        self.molecule = ElectronSampler(
            coords, lambda x: self._psi2_fn(x), seed=seed,
            batch_no=batch_no, steps=10, std=0.3)
        counts = self._electrons_per_nucleus(n_elec)
        self.molecule.gauss_initialize_position(counts, stddev=0.5)
        self.final_energy: Optional[float] = None
        self._train_step = None

    def _electrons_per_nucleus(self, n_elec: int) -> np.ndarray:
        charges = self.charges.astype(int)
        counts = np.zeros(len(charges), dtype=int)
        remaining = n_elec
        i = 0
        while remaining > 0:
            if counts[i % len(charges)] < charges[i % len(charges)] or \
                    (counts >= charges).all():
                counts[i % len(charges)] += 1
                remaining -= 1
            i += 1
        return counts.reshape(-1, 1)

    def _psi2_fn(self, x):
        return jax.jit(jax.vmap(
            lambda xi: jnp.exp(2.0 * self._logpsi(self.params, xi))))(x)

    def local_energy(self, params, x):
        """E_L = -0.5 laplacian(psi)/psi + V (per configuration)."""
        def lp(flat):
            return self._logpsi(params, flat.reshape(-1, 3))
        flat = x.reshape(-1)
        grad = jax.grad(lp)(flat)
        # laplacian of log psi via Hutchinson-free exact trace (small dims)
        def gi(f_):
            return jax.grad(lp)(f_)
        diag = jnp.diagonal(jax.jacfwd(gi)(flat))
        lap_logpsi = jnp.sum(diag)
        kinetic = -0.5 * (lap_logpsi + jnp.sum(grad ** 2))
        # potential: e-n, e-e, n-n
        nuc = jnp.asarray(self.nuclei)
        q = jnp.asarray(self.charges)
        r_en = jnp.linalg.norm(x[:, None, :] - nuc[None, :, :] + 1e-12,
                               axis=-1)
        v_en = -jnp.sum(q[None, :] / r_en)
        n = x.shape[0]
        r_ee = jnp.linalg.norm(
            x[:, None, :] - x[None, :, :] + 1e-12, axis=-1)
        iu = jnp.triu_indices(n, 1)
        v_ee = jnp.sum(1.0 / r_ee[iu])
        r_nn = jnp.linalg.norm(
            nuc[:, None, :] - nuc[None, :, :] + 1e-12, axis=-1)
        m = len(self.charges)
        if m > 1:
            iun = jnp.triu_indices(m, 1)
            v_nn = jnp.sum(jnp.outer(q, q)[iun] / r_nn[iun])
        else:
            v_nn = 0.0
        return kinetic + v_en + v_ee + v_nn

    def _make_train_step(self):
        net = self

        def step(params, opt_state, x):
            e_l = jax.vmap(lambda xi: net.local_energy(params, xi))(x)
            e_l = jnp.clip(e_l, jnp.median(e_l) - 5 * jnp.std(e_l),
                           jnp.median(e_l) + 5 * jnp.std(e_l))
            e_mean = jnp.mean(e_l)

            def loss_fn(p):
                logpsi = jax.vmap(lambda xi: net._logpsi(p, xi))(x)
                return 2.0 * jnp.mean(
                    jax.lax.stop_gradient(e_l - e_mean) * logpsi)
            grads = jax.grad(loss_fn)(params)
            updates, opt_state = net._optax.update(grads, opt_state,
                                                   params)
            params = optax.apply_updates(params, updates)
            return params, opt_state, e_mean
        return jax.jit(step)

    def random_walk(self, x: np.ndarray) -> np.ndarray:
        """Sampler hook: |psi|^2 at electron configurations (reference
        torch ferminet.py:493 — the callback the electron sampler calls
        at every Metropolis step)."""
        return np.asarray(self._psi2_fn(np.asarray(x, dtype=np.float32)))

    def prepare_hf_solution(self) -> None:
        """Solve HF for this molecule with the in-repo SCF engine and
        keep the occupied-orbital coefficients for pretraining targets
        (reference torch ferminet.py:450 uses pySCF; here the native
        STO-3G HF stack does the same job with zero dependencies)."""
        from deepchem_tpu.dft.scf import (DFTSystem, KohnShamSCF,
                                          scf_loop_unrestricted_stable)
        import jax.numpy as _jnp
        system = DFTSystem(self.symbols, self.nuclei, units='bohr',
                           charge=int(self.charges.sum()
                                      - self.n_up - self.n_down))
        S = system.S

        def occupied(D_spin, n_occ):
            # natural orbitals of a spin density: S^1/2 D S^1/2 = U w U^T,
            # C = S^-1/2 U; idempotent D gives w in {0, 1}
            s_val, s_vec = np.linalg.eigh(S)
            s_half = s_vec @ np.diag(np.sqrt(s_val)) @ s_vec.T
            s_inv_half = s_vec @ np.diag(1.0 / np.sqrt(s_val)) @ s_vec.T
            w, U = np.linalg.eigh(s_half @ D_spin @ s_half)
            order = np.argsort(w)[::-1][:n_occ]
            return s_inv_half @ U[:, order]

        if self.n_up == self.n_down:
            calc = KohnShamSCF(xc='hf').run(system)
            Da = np.asarray(calc.D) / 2.0
            Db = Da
        else:
            solver = KohnShamSCF(xc='hf')
            _, (Da, Db), _ = scf_loop_unrestricted_stable(
                _jnp.asarray(system.T + system.V),
                _jnp.asarray(system.S_invsqrt), _jnp.asarray(system.eri),
                self.n_up, self.n_down, exc_fn=solver.exc_fn,
                phi=_jnp.asarray(system.phi),
                dphi=_jnp.asarray(system.dphi),
                weights=_jnp.asarray(system.grid_weights),
                use_sigma=solver.use_sigma, hf_exchange=1.0)
            Da, Db = np.asarray(Da), np.asarray(Db)
        self._hf_basis = system.basis
        self._hf_C_up = occupied(Da, self.n_up)
        self._hf_C_down = (occupied(Db, self.n_down)
                           if self.n_down else
                           np.zeros((S.shape[0], 0)))

    def evaluate_hf(self, x: np.ndarray
                    ) -> Tuple[np.ndarray, np.ndarray]:
        """Occupied HF orbital values at sampled electron positions
        (reference torch ferminet.py:422) — the pretraining target.
        x: [..., n_elec, 3] (Bohr, the model's frame).  Returns
        (up [..., n_up, n_up], down [..., n_down, n_down]): orbital j
        evaluated at (up|down) electron i."""
        if not hasattr(self, '_hf_C_up'):
            self.prepare_hf_solution()
        from deepchem_tpu.dft.integrals import ao_values
        x = np.asarray(x, dtype=np.float64)
        lead = x.shape[:-2]
        pts = x.reshape(-1, 3)
        phi, _ = ao_values(self._hf_basis, pts)
        mo_up = (phi @ self._hf_C_up).reshape(
            lead + (x.shape[-2], self.n_up))
        mo_down = (phi @ self._hf_C_down).reshape(
            lead + (x.shape[-2], self.n_down))
        return (mo_up[..., :self.n_up, :],
                mo_down[..., self.n_up:, :])

    def prepare_train(self, burn_in: int = 10) -> None:
        """Burn in the sampler and build the jitted VMC step (reference
        torch ferminet.py:533)."""
        for _ in range(burn_in):
            self.molecule.move()
        if self._train_step is None:
            self._train_step = self._make_train_step()

    def train(self, iterations: int = 100,
              burn_in: int = 10) -> float:
        """VMC optimization (reference ferminet.py train)."""
        self.prepare_train(burn_in)
        energy = 0.0
        for it in range(iterations):
            self.molecule.move()
            self.params, self.opt_state, e = self._train_step(
                self.params, self.opt_state, self.molecule.x)
            energy = float(e)
            if (it + 1) % 20 == 0:
                logger.info('VMC iter %d: E = %.4f Ha', it + 1, energy)
        self.final_energy = energy
        return energy
