"""Persistent XLA compilation cache for the training engine.

TPU compile latency is the dominant cold-start cost of the device-resident
training path: the MUV scale run (SCALE_MUV.json) spent 630 s of its 989 s
wall-clock compiling the epoch scan, and the reference-anchor bench pays a
200-500 s warmup on the tunneled dev backend.  XLA ships a content-addressed
persistent cache keyed on (HLO, compile options, backend version); wiring it
under the framework's data directory turns every recurring compile — same
model family, same padded batch shapes — into a disk hit across processes
and across days.  The reference has no analogue (its engines are eager);
this is a TPU-native production feature, in the spirit of
jax_compilation_cache_dir's intended deployment.

Activation: automatic on first engine construction (JaxModel.__init__),
controlled by ``DEEPCHEM_COMPILE_CACHE``:

- unset        -> cache under ``<data_dir>/xla_cache`` (data dir honors
                  ``DEEPCHEM_DATA_DIR`` like every other framework cache)
- a path       -> cache there
- ``0``/``off`` -> disabled

Safe by construction: the cache is only consulted for bit-identical HLO +
compile options + runtime version, so a stale entry can never produce wrong
numerics — the worst case is a miss.  Entries smaller than 1 s of compile
time are not persisted (they'd cost more in IO than they save).
"""

import logging
import os
import threading

logger = logging.getLogger(__name__)

_lock = threading.Lock()
_enabled_dir = None


def enable_compile_cache(cache_dir=None) -> str:
    """Idempotently point JAX's persistent compilation cache at a
    framework-owned directory and return it ('' when disabled).

    Must run before the first compilation it should capture; the engine
    calls it from ``JaxModel.__init__`` so every model construction is
    early enough for that model's own compiles.
    """
    global _enabled_dir
    with _lock:
        if _enabled_dir is not None:
            return _enabled_dir
        env = os.environ.get('DEEPCHEM_COMPILE_CACHE')
        if env is not None and env.strip().lower() in ('0', 'off', 'false',
                                                       'none', ''):
            _enabled_dir = ''
            return _enabled_dir
        if cache_dir is None:
            if env:
                cache_dir = env
            else:
                # auto-enable only for accelerator backends: CPU
                # compiles are cheap, and XLA:CPU AOT entries embed
                # machine features that warn on reload (observed:
                # "+prefer-no-gather is not supported on the host")
                import jax
                if jax.default_backend() == 'cpu':
                    _enabled_dir = ''
                    return _enabled_dir
                from deepchem_tpu.utils.data_utils import get_data_dir
                cache_dir = os.path.join(get_data_dir(), 'xla_cache')
        try:
            os.makedirs(cache_dir, exist_ok=True)
            import jax
            jax.config.update('jax_compilation_cache_dir', cache_dir)
            # persist EVERYTHING, even sub-second compiles: on the
            # tunneled dev backend the remote compile service's latency
            # is wildly variable (measured 0.5 s to 300 s for the SAME
            # tiny program), so any non-persisted program is a warm-run
            # latency lottery; local-disk IO is orders cheaper
            jax.config.update('jax_persistent_cache_min_compile_time_secs',
                              0.0)
            jax.config.update('jax_persistent_cache_min_entry_size_bytes',
                              0)
            _enabled_dir = cache_dir
            logger.debug('persistent XLA compile cache at %s', cache_dir)
        except Exception as exc:  # pragma: no cover - config name drift
            # never let cache wiring break model construction
            logger.debug('compile cache not enabled: %s', exc)
            _enabled_dir = ''
        return _enabled_dir
