"""LAMB optimizer under the reference import path (reference
``deepchem/utils/optimizer_utils.py`` implements a torch LambOptimizer;
here LAMB is optax.lamb wired into the engine's Optimizer interface, so
it plugs into any JaxModel via ``optimizer=``)."""

import optax

from deepchem_tpu.models.optimizers import Optimizer, _lr


class LambOptimizer(Optimizer):
    """Layer-wise Adaptive Moments for large-batch training (You et al.
    2019; reference optimizer_utils.py:11)."""

    def __init__(self, learning_rate=0.001, beta1: float = 0.9,
                 beta2: float = 0.999, epsilon: float = 1e-6,
                 weight_decay: float = 0.0):
        super().__init__(learning_rate)
        self.beta1 = beta1
        self.beta2 = beta2
        self.epsilon = epsilon
        self.weight_decay = weight_decay

    def _create_optax_optimizer(self):
        return optax.lamb(_lr(self.learning_rate), b1=self.beta1,
                          b2=self.beta2, eps=self.epsilon,
                          weight_decay=self.weight_decay)


Lamb = LambOptimizer
