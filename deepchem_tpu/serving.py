"""Model export + serving utilities.

The reference has no serving story (models are pickled/checkpointed and
re-loaded into Python); for a production TPU framework the natural unit
of deployment is a serialized StableHLO program: compile once, run
anywhere XLA runs, no Python model code needed at load time.

- :func:`export_model` traces a model's inference function on example
  inputs and serializes it (jax.export -> StableHLO bytes) together with
  the trained parameters.
- :func:`load_exported` restores a callable that runs the compiled
  program on the current backend (CPU/TPU).
- :class:`InferenceServer` is a minimal batching wrapper: pads incoming
  requests to the exported batch shape so the compiled program never
  retraces.
"""

from __future__ import annotations

import os
import pickle
from typing import Callable, List, Optional, Sequence

import numpy as np

import jax
import jax.numpy as jnp


def export_model(model, example_inputs: Sequence[np.ndarray],
                 path: str, platforms: Optional[Sequence[str]] = None
                 ) -> None:
    """Serialize a JaxModel's forward pass + params to ``path``.

    example_inputs: one batch of model inputs (defines the static
    shapes the server will pad to).  platforms: e.g. ['cpu', 'tpu']
    (defaults to the current backend).
    """
    inputs = [jnp.asarray(np.asarray(a, dtype=np.float32)
                          if np.asarray(a).dtype == np.float64
                          else np.asarray(a)) for a in example_inputs]
    if not model._built:
        model.build(inputs)
    # pull params to host (drops any data-parallel sharding) so the
    # exported program is single-device and portable
    params = jax.tree.map(lambda x: jnp.asarray(np.asarray(x)),
                          model.params)

    def infer(params, *xs):
        outs = model._forward(params, list(xs), False, None)
        if model.output_types is not None:
            outs = [outs[i] for i in model._prediction_outputs]
        return tuple(outs)

    exp = jax.export.export(
        jax.jit(infer),
        platforms=list(platforms) if platforms else None)(params, *inputs)
    blob = {
        'stablehlo': exp.serialize(),
        'params': jax.tree.map(np.asarray, params),
        'input_shapes': [tuple(np.asarray(a).shape) for a in inputs],
        'input_dtypes': [str(jnp.asarray(a).dtype) for a in inputs],
    }
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    with open(path, 'wb') as f:
        pickle.dump(blob, f)


class ExportedModel:
    """A deserialized compiled program + its parameters."""

    def __init__(self, blob: dict):
        self._exp = jax.export.deserialize(blob['stablehlo'])
        self.params = blob['params']
        self.input_shapes = blob['input_shapes']
        self.input_dtypes = blob['input_dtypes']
        self._call = jax.jit(self._exp.call)

    def __call__(self, *inputs) -> List[np.ndarray]:
        xs = [jnp.asarray(np.asarray(a, dtype=dt))
              for a, dt in zip(inputs, self.input_dtypes)]
        out = self._call(self.params, *xs)
        return [np.asarray(o) for o in out]

    @property
    def batch_size(self) -> int:
        return self.input_shapes[0][0]


def load_exported(path: str) -> ExportedModel:
    with open(path, 'rb') as f:
        blob = pickle.load(f)
    return ExportedModel(blob)


class InferenceServer:
    """Pad-and-batch inference over an exported program.

    Requests of any length are chunked/padded to the exported batch
    shape, so the compiled executable is reused for every call — the
    serving analog of the training path's static-shape discipline.
    """

    def __init__(self, exported: ExportedModel):
        self.exported = exported

    def predict(self, X: np.ndarray) -> np.ndarray:
        X = np.asarray(X)
        bs = self.exported.batch_size
        outs: List[np.ndarray] = []
        for start in range(0, len(X), bs):
            chunk = X[start:start + bs]
            n = len(chunk)
            if n < bs:
                pad = np.repeat(chunk[-1:], bs - n, axis=0)
                chunk = np.concatenate([chunk, pad], axis=0)
            out = self.exported(chunk)
            outs.append(out[0][:n])
        return np.concatenate(outs, axis=0)
