"""Model-agnostic meta-learning (reference deepchem/metalearning/maml.py:13
MetaLearner/MAML and torch_maml.py:20).

TPU-first: the inner adaptation loop is differentiated *through* with
jax.grad-of-grad in one jitted meta-step — no tape bookkeeping like the
reference's framework ports.
"""

from __future__ import annotations

import logging
import os
import pickle
from typing import Callable, List, Optional, Sequence, Tuple

import numpy as np

import jax
import jax.numpy as jnp
import optax

logger = logging.getLogger(__name__)


class MetaLearner:
    """Task-distribution interface (reference metalearning/maml.py
    MetaLearner).

    Subclasses implement:
    - ``compute_model(inputs, variables, training) -> (loss, outputs)``
    - ``variables`` property: the initial pytree of parameters
    - ``select_task()``: switch the active task
    - ``get_batch() -> inputs``: a batch for the current task
    """

    @property
    def variables(self):
        raise NotImplementedError

    def parameters(self):
        """Iterate trainable parameter leaves (reference
        torch_maml.py:69 contract; here the leaves of ``variables``)."""
        import jax as _jax
        return iter(_jax.tree_util.tree_leaves(self.variables))

    def compute_model(self, inputs, variables, training
                      ) -> Tuple[jnp.ndarray, Sequence[jnp.ndarray]]:
        raise NotImplementedError

    def select_task(self) -> None:
        pass

    def get_batch(self):
        raise NotImplementedError


class MAML:
    """(reference maml.py:13; fit/train_on_current_task/
    restore contract)"""

    def __init__(self, learner: MetaLearner,
                 learning_rate: float = 0.001,
                 optimization_steps: int = 1,
                 meta_batch_size: int = 10,
                 optimizer=None, model_dir: Optional[str] = None):
        self.learner = learner
        self.learning_rate = learning_rate
        self.optimization_steps = optimization_steps
        self.meta_batch_size = meta_batch_size
        if model_dir is None:
            import tempfile
            model_dir = tempfile.mkdtemp()
        os.makedirs(model_dir, exist_ok=True)
        self.model_dir = model_dir
        self._optax = optax.adam(learning_rate) if optimizer is None \
            else optimizer._create_optax_optimizer()
        self._params = learner.variables
        self._opt_state = self._optax.init(self._params)
        self._meta_step = None

    def _make_meta_step(self):
        learner = self.learner
        inner_lr = self.learning_rate
        n_inner = self.optimization_steps

        def inner_adapt(params, batch):
            def loss_fn(p):
                loss, _ = learner.compute_model(batch, p, training=True)
                return loss
            for _ in range(n_inner):
                grads = jax.grad(loss_fn)(params)
                params = jax.tree.map(lambda p, g: p - inner_lr * g,
                                      params, grads)
            return params

        def meta_step(params, opt_state, support_batch, query_batch):
            def meta_loss(p):
                adapted = inner_adapt(p, support_batch)
                loss, _ = learner.compute_model(query_batch, adapted,
                                                training=True)
                return loss
            loss, grads = jax.value_and_grad(meta_loss)(params)
            updates, opt_state = self._optax.update(grads, opt_state,
                                                    params)
            params = optax.apply_updates(params, updates)
            return params, opt_state, loss
        return jax.jit(meta_step)

    def fit(self, steps: int, max_checkpoints_to_keep: int = 5,
            checkpoint_interval: int = 600,
            restore: bool = False) -> None:
        """Meta-train (reference maml.py fit)."""
        if restore:
            self.restore()
        if self._meta_step is None:
            self._meta_step = self._make_meta_step()
        losses = []
        for i in range(steps):
            for _ in range(self.meta_batch_size):
                self.learner.select_task()
                support = self.learner.get_batch()
                query = self.learner.get_batch()
                support = [jnp.asarray(np.asarray(b, dtype=np.float32))
                           for b in support]
                query = [jnp.asarray(np.asarray(b, dtype=np.float32))
                         for b in query]
                self._params, self._opt_state, loss = self._meta_step(
                    self._params, self._opt_state, support, query)
                losses.append(float(loss))
            if (i + 1) % 100 == 0:
                logger.info('meta-step %d: loss %g', i + 1,
                            np.mean(losses[-100:]))
        self.save_checkpoint(max_checkpoints_to_keep)

    def train_on_current_task(self, optimization_steps: int = 1,
                              restore: bool = True) -> None:
        """Inner-loop adapt on the current task (reference maml.py)."""
        if restore:
            self.restore()
        batch = self.learner.get_batch()
        batch = [jnp.asarray(np.asarray(b, dtype=np.float32))
                 for b in batch]

        def loss_fn(p):
            loss, _ = self.learner.compute_model(batch, p, training=True)
            return loss
        for _ in range(optimization_steps):
            grads = jax.grad(loss_fn)(self._params)
            self._params = jax.tree.map(
                lambda p, g: p - self.learning_rate * g, self._params,
                grads)

    def predict_on_batch(self, inputs) -> Sequence[np.ndarray]:
        inputs = [jnp.asarray(np.asarray(b, dtype=np.float32))
                  for b in inputs]
        loss, outputs = self.learner.compute_model(inputs, self._params,
                                                   training=False)
        return [np.asarray(o) for o in outputs]

    def save_checkpoint(self, max_checkpoints_to_keep: int = 5) -> None:
        path = os.path.join(self.model_dir, 'maml_checkpoint.pkl')
        with open(path, 'wb') as f:
            pickle.dump({'params': jax.tree.map(np.asarray, self._params),
                         'opt_state': jax.tree.map(np.asarray,
                                                   self._opt_state)}, f)

    def get_checkpoints(self):
        """Paths of saved checkpoints in model_dir (reference
        metalearning/torch_maml.py get_checkpoints)."""
        path = os.path.join(self.model_dir, 'maml_checkpoint.pkl')
        return [path] if os.path.exists(path) else []

    def restore(self) -> None:
        path = os.path.join(self.model_dir, 'maml_checkpoint.pkl')
        if not os.path.exists(path):
            return
        with open(path, 'rb') as f:
            data = pickle.load(f)
        self._params = jax.tree.map(jnp.asarray, data['params'])
        self._opt_state = jax.tree.map(jnp.asarray, data['opt_state'])
