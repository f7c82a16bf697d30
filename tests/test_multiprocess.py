"""Multi-host runtime validation on a local 2-process CPU cluster
(VERDICT r4 item 4; reference models/trainer.py:56-104 num_nodes +
data/pytorch_datasets.py:9 rank sharding).

Spawns two fresh Python processes that join a jax.distributed cluster
over localhost (gloo CPU collectives), then asserts (a) a cross-process
all-reduce sums contributions from both processes and (b) a 2-process
``model.distribute(global_mesh()).fit(process_shard(ds))`` reproduces
the single-process loss trajectory.
"""

import json
import os
import socket
import subprocess
import sys
import textwrap

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _free_port() -> int:
    s = socket.socket()
    s.bind(('localhost', 0))
    port = s.getsockname()[1]
    s.close()
    return port


def _run_cluster(worker_src: str, n_procs: int = 2, timeout: int = 420):
    """Run ``worker_src`` in n fresh processes joined into one cluster;
    returns the per-process stdout lines starting with 'RESULT '."""
    port = _free_port()
    procs = []
    for pid in range(n_procs):
        env = dict(os.environ)
        env['JAX_PLATFORMS'] = 'cpu'
        env['XLA_FLAGS'] = '--xla_force_host_platform_device_count=1'
        env['JAX_ENABLE_X64'] = '0'
        env['DCTPU_COORD'] = f'localhost:{port}'
        env['DCTPU_NPROC'] = str(n_procs)
        env['DCTPU_PID'] = str(pid)
        env['PYTHONPATH'] = REPO + os.pathsep + env.get('PYTHONPATH', '')
        procs.append(subprocess.Popen(
            [sys.executable, '-c', worker_src], env=env, cwd=REPO,
            stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True))
    outs = []
    for p in procs:
        try:
            out, err = p.communicate(timeout=timeout)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            pytest.fail('cluster worker timed out')
        assert p.returncode == 0, f'worker failed:\n{err[-3000:]}'
        outs.append([ln for ln in out.splitlines()
                     if ln.startswith('RESULT ')])
    return outs


_PRELUDE = """
import os, json
import numpy as np
import jax
jax.config.update('jax_platforms', 'cpu')
from deepchem_tpu.parallel import init_distributed, global_mesh
pi, pc = init_distributed(coordinator_address=os.environ['DCTPU_COORD'],
                          num_processes=int(os.environ['DCTPU_NPROC']),
                          process_id=int(os.environ['DCTPU_PID']))
assert pc == int(os.environ['DCTPU_NPROC']), (pi, pc)
"""


def test_cross_process_allreduce():
    src = _PRELUDE + textwrap.dedent("""
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P
    mesh = global_mesh()
    local = np.full((2,), float(pi + 1), np.float32)
    arr = jax.make_array_from_process_local_data(
        NamedSharding(mesh, P('data')), local)
    total = jax.jit(jnp.sum,
                    out_shardings=NamedSharding(mesh, P()))(arr)
    print('RESULT', json.dumps({'sum': float(total.addressable_data(0)),
                                'pi': pi, 'ndev': len(jax.devices())}))
    """)
    outs = _run_cluster(src)
    for lines in outs:
        assert lines, outs
        res = json.loads(lines[0].split(' ', 1)[1])
        assert res['ndev'] == 2
        # 2*1 (proc 0) + 2*2 (proc 1)
        assert res['sum'] == pytest.approx(6.0)


def test_two_process_fit_matches_single_process():
    """distribute(global_mesh()) + process_shard: the 2-process loss
    trajectory equals the single-process one on the same data."""
    src = _PRELUDE + textwrap.dedent("""
    from deepchem_tpu.data import NumpyDataset
    from deepchem_tpu.models import MultitaskClassifier
    from deepchem_tpu.parallel import process_shard

    rng = np.random.RandomState(7)
    n, f = 32, 8
    X = rng.rand(n, f).astype(np.float32)
    y = rng.randint(0, 2, (n, 2)).astype(np.float32)
    ds = NumpyDataset(X, y)

    B = 4   # per-process batch; global batch = 8
    model = MultitaskClassifier(n_tasks=2, n_features=f,
                                layer_sizes=[16], dropouts=0.0,
                                batch_size=B, seed=0,
                                learning_rate=0.01)
    model.distribute(global_mesh())
    local = process_shard(ds, batch_size=B)
    assert len(local) == n // pc, len(local)
    losses = []
    model.fit(local, nb_epoch=2, deterministic=True,
              checkpoint_interval=0, all_losses=losses)
    hist = [float(v) for v in model._losses_history]
    print('RESULT', json.dumps({'hist': hist, 'pi': pi}))
    """)
    outs = _run_cluster(src)
    hists = []
    for lines in outs:
        assert lines, outs
        hists.append(json.loads(lines[0].split(' ', 1)[1])['hist'])
    # both processes observed the SAME global loss trajectory
    assert np.allclose(hists[0], hists[1], atol=1e-6), hists

    # single-process reference on the full dataset with the global batch
    from deepchem_tpu.data import NumpyDataset
    from deepchem_tpu.models import MultitaskClassifier
    rng = np.random.RandomState(7)
    n, f = 32, 8
    X = rng.rand(n, f).astype(np.float32)
    y = rng.randint(0, 2, (n, 2)).astype(np.float32)
    ds = NumpyDataset(X, y)
    ref = MultitaskClassifier(n_tasks=2, n_features=f, layer_sizes=[16],
                              dropouts=0.0, batch_size=8, seed=0,
                              learning_rate=0.01)
    ref_losses = []
    ref.fit(ds, nb_epoch=2, deterministic=True, checkpoint_interval=0,
            all_losses=ref_losses)
    ref_hist = [float(v) for v in ref._losses_history]
    assert np.allclose(ref_hist, hists[0], atol=1e-4), \
        (ref_hist, hists[0])


def test_process_shard_indices_block_interleave():
    from deepchem_tpu.parallel import process_shard_indices
    # 16 rows, batch 4, 2 procs: global batches of 8 -> proc p takes the
    # p-th half of every 8-row window
    i0 = process_shard_indices(16, batch_size=4, process_index=0,
                               process_count=2)
    i1 = process_shard_indices(16, batch_size=4, process_index=1,
                               process_count=2)
    assert i0.tolist() == [0, 1, 2, 3, 8, 9, 10, 11]
    assert i1.tolist() == [4, 5, 6, 7, 12, 13, 14, 15]
    # strided fallback (reference rank sharding)
    s = process_shard_indices(7, process_index=1, process_count=3)
    assert s.tolist() == [1, 4]
    # single process: identity
    assert process_shard_indices(5, process_count=1).tolist() == \
        [0, 1, 2, 3, 4]


def test_init_distributed_single_process_noop():
    from deepchem_tpu.parallel import init_distributed
    pi, pc = init_distributed()
    assert (pi, pc) == (0, 1)
