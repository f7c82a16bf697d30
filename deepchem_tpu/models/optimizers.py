"""Optimizers and learning-rate schedules over optax.

Redesign of reference deepchem/models/optimizers.py (881 LoC): the reference
keeps per-backend creators (_create_tf/pytorch/jax_optimizer); here each
Optimizer builds exactly one optax GradientTransformation
(``_create_optax_optimizer``), and each LearningRateSchedule builds an optax
schedule (``_create_optax_schedule``).
"""

from __future__ import annotations

from typing import Optional, Sequence, Union

import optax


class LearningRateSchedule:
    """Base class (reference optimizers.py:66)."""

    def _create_optax_schedule(self):
        raise NotImplementedError


class ExponentialDecay(LearningRateSchedule):
    """(reference optimizers.py:504)"""

    def __init__(self, initial_rate: float, decay_rate: float,
                 decay_steps: int, staircase: bool = True):
        self.initial_rate = initial_rate
        self.decay_rate = decay_rate
        self.decay_steps = decay_steps
        self.staircase = staircase

    def _create_optax_schedule(self):
        return optax.exponential_decay(
            init_value=self.initial_rate, transition_steps=self.decay_steps,
            decay_rate=self.decay_rate, staircase=self.staircase)


class PolynomialDecay(LearningRateSchedule):
    """(reference optimizers.py:639)"""

    def __init__(self, initial_rate: float, final_rate: float,
                 decay_steps: int, power: float = 1.0):
        self.initial_rate = initial_rate
        self.final_rate = final_rate
        self.decay_steps = decay_steps
        self.power = power

    def _create_optax_schedule(self):
        return optax.polynomial_schedule(
            init_value=self.initial_rate, end_value=self.final_rate,
            power=self.power, transition_steps=self.decay_steps)


class LinearCosineDecay(LearningRateSchedule):
    """(reference optimizers.py:695)"""

    def __init__(self, initial_rate: float, decay_steps: int,
                 alpha: float = 0.0, beta: float = 0.001,
                 num_periods: float = 0.5):
        self.initial_rate = initial_rate
        self.decay_steps = decay_steps
        self.alpha = alpha
        self.beta = beta
        self.num_periods = num_periods

    def _create_optax_schedule(self):
        import math

        def schedule(step):
            import jax.numpy as jnp
            t = jnp.minimum(step, self.decay_steps) / self.decay_steps
            linear = 1.0 - t
            cosine = 0.5 * (1.0 + jnp.cos(
                2.0 * math.pi * self.num_periods * t))
            decayed = (self.alpha + linear) * cosine + self.beta
            return self.initial_rate * decayed
        return schedule


class PiecewiseConstantSchedule(LearningRateSchedule):
    """(reference optimizers.py:750)"""

    def __init__(self, initial_rate: float,
                 boundaries_and_scales: Optional[dict] = None):
        self.initial_rate = initial_rate
        self.boundaries_and_scales = boundaries_and_scales or {}

    def _create_optax_schedule(self):
        return optax.piecewise_constant_schedule(
            init_value=self.initial_rate,
            boundaries_and_scales=self.boundaries_and_scales)


class LambdaLRWithWarmup(LearningRateSchedule):
    """Linear warmup then linear decay (reference optimizers.py:557,
    mirroring HF transformers' get_linear_schedule_with_warmup)."""

    def __init__(self, initial_rate: float, num_warmup_steps: int,
                 num_training_steps: Optional[int] = None):
        self.initial_rate = initial_rate
        self.num_warmup_steps = num_warmup_steps
        self.num_training_steps = num_training_steps

    def _create_optax_schedule(self):
        if self.num_training_steps is None:
            return optax.linear_schedule(
                init_value=0.0, end_value=self.initial_rate,
                transition_steps=max(1, self.num_warmup_steps))
        warmup = optax.linear_schedule(
            0.0, self.initial_rate, max(1, self.num_warmup_steps))
        decay = optax.linear_schedule(
            self.initial_rate, 0.0,
            max(1, self.num_training_steps - self.num_warmup_steps))
        return optax.join_schedules([warmup, decay],
                                    [self.num_warmup_steps])


def _lr(learning_rate: Union[float, LearningRateSchedule]):
    if isinstance(learning_rate, LearningRateSchedule):
        return learning_rate._create_optax_schedule()
    return learning_rate


class Optimizer:
    """Base class (reference optimizers.py:28)."""

    def __init__(self, learning_rate: Union[float, LearningRateSchedule]):
        self.learning_rate = learning_rate

    def _create_optax_optimizer(self) -> optax.GradientTransformation:
        raise NotImplementedError

    def _wrap_opt_state(self, base_state, params, pert):
        """Hook: optimizers with extra per-layer state (K-FAC curvature
        factors) wrap the optax state here; default passthrough."""
        return base_state


class Adam(Optimizer):
    """(reference optimizers.py:190)"""

    def __init__(self, learning_rate=0.001, beta1: float = 0.9,
                 beta2: float = 0.999, epsilon: float = 1e-8):
        super().__init__(learning_rate)
        self.beta1, self.beta2, self.epsilon = beta1, beta2, epsilon

    def _create_optax_optimizer(self):
        return optax.adam(_lr(self.learning_rate), b1=self.beta1,
                          b2=self.beta2, eps=self.epsilon)


class SparseAdam(Adam):
    """optax.adam handles sparse-ish updates fine on TPU (reference
    optimizers.py:260 exists for torch embeddings)."""


class AdamW(Optimizer):
    """(reference optimizers.py:310)"""

    def __init__(self, learning_rate=0.001, weight_decay: float = 0.01,
                 beta1: float = 0.9, beta2: float = 0.999,
                 epsilon: float = 1e-8, amsgrad: bool = False):
        super().__init__(learning_rate)
        self.weight_decay = weight_decay
        self.beta1, self.beta2, self.epsilon = beta1, beta2, epsilon
        self.amsgrad = amsgrad

    def _create_optax_optimizer(self):
        return optax.adamw(_lr(self.learning_rate), b1=self.beta1,
                           b2=self.beta2, eps=self.epsilon,
                           weight_decay=self.weight_decay)


class AdaGrad(Optimizer):
    """(reference optimizers.py:115)"""

    def __init__(self, learning_rate=0.001,
                 initial_accumulator_value: float = 0.1,
                 epsilon: float = 1e-10):
        super().__init__(learning_rate)
        self.initial_accumulator_value = initial_accumulator_value
        self.epsilon = epsilon

    def _create_optax_optimizer(self):
        return optax.adagrad(
            _lr(self.learning_rate),
            initial_accumulator_value=self.initial_accumulator_value,
            eps=self.epsilon)


class RMSProp(Optimizer):
    """(reference optimizers.py:390)"""

    def __init__(self, learning_rate=0.001, momentum: float = 0.0,
                 decay: float = 0.9, epsilon: float = 1e-10):
        super().__init__(learning_rate)
        self.momentum, self.decay, self.epsilon = momentum, decay, epsilon

    def _create_optax_optimizer(self):
        return optax.rmsprop(_lr(self.learning_rate), decay=self.decay,
                             eps=self.epsilon, momentum=self.momentum)


class GradientDescent(Optimizer):
    """(reference optimizers.py:460)"""

    def __init__(self, learning_rate=0.001):
        super().__init__(learning_rate)

    def _create_optax_optimizer(self):
        return optax.sgd(_lr(self.learning_rate))


class Lamb(Optimizer):
    """(reference optimizers.py:817)"""

    def __init__(self, learning_rate=0.001, beta1: float = 0.9,
                 beta2: float = 0.999, epsilon: float = 1e-6,
                 weight_decay: float = 0.01):
        super().__init__(learning_rate)
        self.beta1, self.beta2 = beta1, beta2
        self.epsilon = epsilon
        self.weight_decay = weight_decay

    def _create_optax_optimizer(self):
        return optax.lamb(_lr(self.learning_rate), b1=self.beta1,
                          b2=self.beta2, eps=self.epsilon,
                          weight_decay=self.weight_decay)


# Real K-FAC lives in deepchem_tpu/models/kfac.py (block-diagonal
# Kronecker-factored curvature via flax sow/perturb probes); imported at
# the bottom of this module to avoid a circular import.
from deepchem_tpu.models.kfac import KFAC    # noqa: E402,F401
