"""8-device sharding semantics, run in a subprocess so XLA device-count
flags apply cleanly (VERDICT r1 item 10; SURVEY.md section 4 distributed-
testing prescription).

The script trains the dense-DP MultitaskClassifier and the graph-DP
GraphConvModel on a fixed seed under N in {1, 8} virtual CPU devices and
prints the final losses; the test asserts parity within tolerance — data
parallelism must be a pure re-layout of the same math.
"""
import json
import os
import subprocess
import sys

import numpy as np

_SCRIPT = r"""
import json, sys
import numpy as np
import jax
jax.config.update('jax_platforms', 'cpu')

from deepchem_tpu.data import NumpyDataset
from deepchem_tpu.feat import GraphData
from deepchem_tpu.models import MultitaskClassifier, GraphConvModel
from jax.sharding import Mesh

n_devices = int(sys.argv[1])
devices = jax.devices()[:n_devices]
assert len(devices) == n_devices, (n_devices, jax.devices())
mesh = Mesh(np.array(devices), ('data',)) if n_devices > 1 else None

rng = np.random.RandomState(0)
batch_size = 16
X = rng.rand(2 * batch_size, 24).astype(np.float32)
y = rng.randint(0, 2, (2 * batch_size, 3)).astype(float)
ds = NumpyDataset(X, y)
m = MultitaskClassifier(n_tasks=3, n_features=24, layer_sizes=[16],
                        dropouts=0.0, batch_size=batch_size, seed=3)
m.mesh = mesh
m.fit(ds, nb_epoch=3, checkpoint_interval=0, deterministic=True)
dense_loss = m.all_losses[-1]
dense_pred = m.predict(ds)

def graph(i):
    nf = rng.rand(4 + i % 3, 75).astype(np.float32)
    n = len(nf)
    src = np.arange(n - 1)
    ei = np.stack([np.concatenate([src, src + 1]),
                   np.concatenate([src + 1, src])])
    return GraphData(nf, ei)

grng = np.random.RandomState(1)
graphs = np.empty(2 * batch_size, dtype=object)
for i in range(2 * batch_size):
    graphs[i] = graph(i)
gy = grng.randint(0, 2, (2 * batch_size, 1)).astype(float)
gds = NumpyDataset(graphs, gy)
g = GraphConvModel(n_tasks=1, batch_size=batch_size, mode='classification',
                   graph_conv_layers=[8, 8], dense_layer_size=8, seed=3)
g.mesh = mesh
if mesh is not None:
    g._graph_shards = n_devices
g.node_quantum = 64
g.edge_quantum = 64
g.fit(gds, nb_epoch=2, checkpoint_interval=0, deterministic=True)
graph_loss = g.all_losses[-1]
gpred = g.predict(gds)
print('RESULT ' + json.dumps({
    'dense_loss': float(dense_loss),
    'dense_pred_mean': float(np.mean(dense_pred)),
    'graph_loss': float(graph_loss),
    'graph_pred_mean': float(np.mean(gpred)),
}))
"""


def _run(n_devices: int) -> dict:
    env = dict(os.environ)
    env['JAX_PLATFORMS'] = 'cpu'
    flags = [f for f in env.get('XLA_FLAGS', '').split()
             if '--xla_force_host_platform_device_count' not in f]
    flags.append(f'--xla_force_host_platform_device_count={n_devices}')
    env['XLA_FLAGS'] = ' '.join(flags)
    proc = subprocess.run(
        [sys.executable, '-c', _SCRIPT, str(n_devices)],
        env=env, capture_output=True, text=True, timeout=540,
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    assert proc.returncode == 0, proc.stderr[-3000:]
    line = [ln for ln in proc.stdout.splitlines()
            if ln.startswith('RESULT ')][-1]
    return json.loads(line[len('RESULT '):])


def test_8device_parity_with_single_device():
    r1 = _run(1)
    r8 = _run(8)
    assert np.isclose(r1['dense_loss'], r8['dense_loss'], rtol=2e-3), (r1, r8)
    assert np.isclose(r1['graph_loss'], r8['graph_loss'], rtol=2e-2), (r1, r8)
    assert np.isclose(r1['dense_pred_mean'], r8['dense_pred_mean'],
                      rtol=2e-3)
    assert np.isclose(r1['graph_pred_mean'], r8['graph_pred_mean'],
                      rtol=2e-2)
