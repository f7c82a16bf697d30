"""XCModel: train neural XC functionals on density data.

Redesign of reference deepchem/models/dft/dftxc.py:89 (XCModel trains an
NN-XC against DFT entries — atomization energies / density profiles via the
DQC SCF).  This model trains against density-grid targets: each sample
provides (rho[, sigma], grid weights) and a target XC energy — the
'DensityProfileLoss'-style supervision of the reference (losses.py:1266).
For end-to-end training THROUGH a self-consistent field (the reference's
XCNNSCF path), see deepchem_tpu/dft/scf.py: ``XCNNSCF.energy_fn`` returns a
params -> total-energy function differentiable through the whole SCF.
"""

from __future__ import annotations

from typing import Optional, Sequence

import numpy as np

import jax
import jax.numpy as jnp
import flax.linen as nn

from deepchem_tpu.data import Dataset
from deepchem_tpu.dft.nnxc import NNLDA, NNPBE
from deepchem_tpu.models.jax_model import JaxModel


class _XCEnergyModule(nn.Module):
    xc: nn.Module
    use_sigma: bool

    @nn.compact
    def __call__(self, rho, weights, sigma=None, training: bool = False):
        if self.use_sigma:
            exc = self.xc(rho, sigma)
        else:
            exc = self.xc(rho)
        # integrate energy density over the grid
        return jnp.sum(exc * weights, axis=-1, keepdims=True)


class XCModel(JaxModel):
    """Train a neural XC functional (reference dftxc.py:89 contract).

    X per sample: (rho [G], weights [G]) or (rho, weights, sigma) stacked
    as a (2 or 3, G) array; y: target XC energy.
    """

    def __init__(self, xcstr: str = 'lda_x', nnmodel: Optional[nn.Module]
                 = None, batch_size: int = 16, **kwargs):
        self.xcstr = xcstr
        self.use_sigma = 'pbe' in xcstr.lower() or 'gga' in xcstr.lower()
        if nnmodel is None:
            nnmodel = NNPBE() if self.use_sigma else NNLDA()
        module = _XCEnergyModule(xc=nnmodel, use_sigma=self.use_sigma)
        from deepchem_tpu.models.losses import L2Loss
        super().__init__(module, L2Loss(), output_types=['prediction'],
                         batch_size=batch_size, **kwargs)
        self.n_tasks = 1
        self.mode = 'regression'

    def default_generator(self, dataset: Dataset, epochs: int = 1,
                          mode: str = 'fit', deterministic: bool = True,
                          pad_batches: bool = True):
        for epoch in range(epochs):
            for (X_b, y_b, w_b, ids_b) in dataset.iterbatches(
                    batch_size=self.batch_size,
                    deterministic=deterministic,
                    pad_batches=pad_batches):
                X_b = np.asarray(X_b, dtype=np.float32)
                rho = X_b[:, 0]
                wts = X_b[:, 1]
                if self.use_sigma and X_b.shape[1] > 2:
                    sigma = X_b[:, 2]
                    yield ([rho, wts, sigma], [y_b], [w_b])
                else:
                    yield ([rho, wts], [y_b], [w_b])

    def get_num_tasks(self):
        return 1

    def get_task_type(self):
        return 'regression'

    # -- training THROUGH the SCF on reference entry types -------------
    def _entry_value_fn(self, entry, scf):
        """DFTEntry -> (params -> predicted quantity), differentiable
        through the SCF (reference dftxc.py:89 XCModel forward over
        entry.get_val)."""
        systems = entry.get_systems()
        if entry.e_type == 'dm':
            return scf.density_matrix_fn(systems[0])
        if entry.e_type == 'dens':
            return scf.density_fn(systems[0])
        fns = [scf.system_energy_fn(s, sp)
               for s, sp in zip(systems, entry.spins)]
        if entry.e_type in ('ae', 'ie') and len(systems) > 1:
            def val(params):
                return entry.combine_energies(
                    [f(params) for f in fns])
            return val
        if entry.e_type == 'ae':
            from deepchem_tpu.dft.scf import DFTSystem
            atom_fns = []
            for sym, count in entry.atom_systems():
                asys = DFTSystem([sym], np.zeros((1, 3)), units='bohr',
                                 **entry._kw)
                atom_fns.append((count,
                                 scf.system_energy_fn(asys, 0)))

            def val(params):
                e_mol = sum(f(params) for f in fns)
                e_at = sum(c * f(params) for c, f in atom_fns)
                return e_at - e_mol
            return val

        def val(params):
            return sum(f(params) for f in fns)
        return val

    def fit_entries(self, entries, nb_epoch: int = 25,
                    iterations: int = 25,
                    learning_rate: Optional[float] = None):
        """Train the neural functional end-to-end THROUGH the SCF on
        DFTEntry objects of any reference entry type (ae/ie/e/dm/dens)
        — gradients flow through every SCF iteration of every system
        (the reference's XCNNSCF/dftxc path).  Returns per-epoch
        losses; trained functional params land in ``self.xc_params``.
        """
        import optax
        from deepchem_tpu.dft.scf import XCNNSCF
        if hasattr(entries, 'X'):        # Dataset from DFTYamlLoader
            entries = list(entries.X)
        nnxc = self.module.xc
        rng = self._next_rng()
        dummy = jnp.full(8, 0.3)
        if self.use_sigma:
            params = nnxc.init(rng, dummy, dummy)
        else:
            params = nnxc.init(rng, dummy)
        scf = XCNNSCF(nnxc, params, use_sigma=self.use_sigma,
                      iterations=iterations)
        targets = []
        for e in entries:
            vf = self._entry_value_fn(e, scf)
            tv = jnp.asarray(e.get_true_val())
            targets.append((vf, tv, e.get_weight()))

        def loss_fn(params):
            total = 0.0
            for vf, tv, w in targets:
                pred = vf(params)
                total = total + w * jnp.mean((pred - tv) ** 2)
            return total / len(targets)

        lr = learning_rate if learning_rate is not None else \
            self.optimizer.learning_rate \
            if isinstance(getattr(self.optimizer, 'learning_rate', None),
                          float) else 1e-3
        opt = optax.adam(lr)
        opt_state = opt.init(params)

        @jax.jit
        def step(params, opt_state):
            loss, grads = jax.value_and_grad(loss_fn)(params)
            updates, opt_state = opt.update(grads, opt_state, params)
            return optax.apply_updates(params, updates), opt_state, loss
        losses = []
        for _ in range(nb_epoch):
            params, opt_state, loss = step(params, opt_state)
            losses.append(float(loss))
        self.xc_params = params
        self._scf_iterations = iterations
        return losses

    def predict_entries(self, entries, iterations: Optional[int] = None):
        """Evaluate each entry's quantity with the trained functional."""
        from deepchem_tpu.dft.scf import XCNNSCF
        if hasattr(entries, 'X'):
            entries = list(entries.X)
        if not hasattr(self, 'xc_params'):
            raise ValueError('call fit_entries first')
        scf = XCNNSCF(self.module.xc, self.xc_params,
                      use_sigma=self.use_sigma,
                      iterations=iterations or self._scf_iterations)
        out = []
        for e in entries:
            vf = jax.jit(self._entry_value_fn(e, scf))
            out.append(np.asarray(vf(self.xc_params)))
        return out
