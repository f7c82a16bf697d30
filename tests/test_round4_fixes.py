"""Round-4 regression tests: dryrun platform pinning + advisor fixes.

The round-3 incident: the driver's env claimed ``JAX_PLATFORMS=cpu`` with
an 8-device virtual mesh, but the ambient TPU plugin bound the backend
anyway and ``dryrun_multichip`` — which trusted the env vars — dispatched
an eager op onto a version-skewed chip and died.  The fix verifies the
LIVE backend (``jax.default_backend()`` + device count) after pinning
``jax.config``, and falls back to a clean subprocess when the pin did not
take.  ``test_dryrun_survives_lying_env`` reproduces the failure class.
"""
import json
import os
import subprocess
import sys
import textwrap

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_dryrun_survives_lying_env(tmp_path):
    """Env vars claim a 2-device CPU mesh; the live backend has only 1
    device (initialized before the flag appeared).  The old code trusted
    the env, went direct, and crashed; the fixed code must verify the
    live backend, detect the mismatch, and complete via the subprocess
    fallback."""
    script = textwrap.dedent("""
        import os, sys
        os.environ.pop('XLA_FLAGS', None)
        os.environ['JAX_PLATFORMS'] = 'cpu'
        import jax
        jax.config.update('jax_platforms', 'cpu')
        assert jax.default_backend() == 'cpu'
        assert len(jax.devices()) == 1, jax.devices()  # backend frozen at 1
        # Now the env starts lying, the way the round-3 driver's did: it
        # promises a mesh the live backend cannot deliver.
        os.environ['XLA_FLAGS'] = '--xla_force_host_platform_device_count=2'
        sys.path.insert(0, %r)
        import __graft_entry__
        __graft_entry__.dryrun_multichip(2)
        print('DRYRUN_SURVIVED')
    """ % REPO)
    env = {k: v for k, v in os.environ.items()
           if k not in ('XLA_FLAGS', 'JAX_PLATFORMS', '_DCTPU_DRYRUN_CHILD')}
    env['JAX_PLATFORMS'] = 'cpu'
    proc = subprocess.run([sys.executable, '-c', script], env=env,
                          cwd=REPO, capture_output=True, text=True,
                          timeout=1200)
    assert proc.returncode == 0, proc.stderr[-3000:]
    assert 'DRYRUN_SURVIVED' in proc.stdout, proc.stdout


def test_pin_cpu_backend_reports_live_state():
    """In-process: the pin helper must report the LIVE backend, not the
    env.  Under the test mesh (2 CPU devices) it must accept n<=2 and
    reject n>2 even if the env is edited to claim more."""
    sys.path.insert(0, REPO)
    try:
        import __graft_entry__
        assert __graft_entry__._pin_cpu_backend(2)
        old = os.environ.get('XLA_FLAGS')
        os.environ['XLA_FLAGS'] = '--xla_force_host_platform_device_count=64'
        try:
            assert not __graft_entry__._pin_cpu_backend(64)
        finally:
            if old is None:
                os.environ.pop('XLA_FLAGS', None)
            else:
                os.environ['XLA_FLAGS'] = old
    finally:
        sys.path.remove(REPO)


def test_density_fn_pins_f32():
    """ADVICE r3: XCNNSCF.density_fn's grid einsum ran outside any
    f32_matmuls scope, so dens-entry neural-XC targets contracted at
    bf16 MXU precision on TPU.  Assert the lowered IR of the returned
    closure carries HIGHEST-precision dots under an ambient bf16
    default (the same pin discipline as scf_loop)."""
    import re
    import jax
    from deepchem_tpu.dft import DFTSystem, NNLDA, XCNNSCF

    h2 = DFTSystem(['H', 'H'], np.array([[0., 0., 0.], [0., 0., 1.4]]),
                   units='bohr', n_radial=20, grid_level=1)
    nn = NNLDA(hidden=(4,))
    params = nn.init(jax.random.PRNGKey(0), np.ones(4))
    dens = XCNNSCF(nn, params, iterations=3).density_fn(h2)
    with jax.default_matmul_precision('bfloat16'):
        ir = jax.jit(dens).lower(params).as_text()
    dots = re.findall(r'precision = \[(\w+), (\w+)\]', ir)
    assert dots and all(p == ('HIGHEST', 'HIGHEST') for p in dots)


def test_pipeline_data_axis_divisibility():
    """ADVICE r3: an indivisible per-microbatch batch on a data-parallel
    pipeline mesh must raise a clear ValueError, not an opaque shard_map
    sharding error."""
    import jax
    import jax.numpy as jnp
    from deepchem_tpu.parallel.pp import (get_pipeline_mesh, pipeline_apply,
                                          stack_stage_params)
    if len(jax.devices()) < 2:
        pytest.skip('needs 2 devices')
    # 1 stage x 2 data: B=6, M=3 -> per-microbatch 2 rows ok; B=6, M=2
    # -> 3 rows, not divisible by data=2
    mesh = get_pipeline_mesh(1, devices=jax.devices()[:2], data_parallel=2)
    stages = [{'w': jnp.eye(4)}]
    fn = lambda p, h: h @ p['w']  # noqa: E731
    x = jnp.ones((6, 4))
    with pytest.raises(ValueError, match='data-parallel'):
        pipeline_apply(fn, stack_stage_params(stages), x, mesh,
                       n_microbatches=2)


def test_differential_diff_missing_family(tmp_path):
    """ADVICE r3: diff() must flag (not KeyError) when a family is
    missing from one dump."""
    sys.path.insert(0, os.path.join(REPO, 'scripts'))
    try:
        import tpu_cpu_differential as sweep
    finally:
        sys.path.remove(os.path.join(REPO, 'scripts'))
    name = sweep.FAMILIES[0][0]
    a = {name: {'losses': [1.0], 'pred_head': [0.5]}}
    b = {name: {'losses': [1.0]}}  # pred_head missing: older dump
    pa, pb = tmp_path / 'a.json', tmp_path / 'b.json'
    pa.write_text(json.dumps(a))
    pb.write_text(json.dumps(b))
    with pytest.raises(SystemExit):
        sweep.diff(str(pa), str(pb))
