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
