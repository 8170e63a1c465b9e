"""Profiling / timing utilities.

Parity: /root/reference/mmdet/utils/profiling.py (`profile_time`, a
CUDA-event context manager) — TPU-native equivalents: a wall-clock context
manager with a forced device sync, and a `jax.profiler` trace wrapper whose
output loads in TensorBoard/XProf (SURVEY.md §5.1).
"""
from __future__ import annotations

import contextlib
import time

import jax
import numpy as np


def device_sync(x=None):
    """Barrier that works under the axon tunnel (block_until_ready is not a
    reliable barrier there): force a tiny host transfer."""
    if x is None:
        x = jax.device_put(0.0)
    leaves = jax.tree_util.tree_leaves(x)
    if leaves:
        np.asarray(jax.numpy.ravel(leaves[0])[:1])


@contextlib.contextmanager
def profile_time(name: str, stream=None, sync_value=None):
    start = time.perf_counter()
    try:
        yield
    finally:
        device_sync(sync_value)
        elapsed = time.perf_counter() - start
        print(f'{name}: elapsed {elapsed * 1000:.3f} ms')


@contextlib.contextmanager
def trace(log_dir: str = '/tmp/ld_tpu_trace'):
    """Capture a jax.profiler trace around a code block."""
    jax.profiler.start_trace(log_dir)
    try:
        yield log_dir
    finally:
        jax.profiler.stop_trace()


def collect_env() -> dict:
    """Environment summary. Parity: mmdet.utils.collect_env."""
    import platform
    import ld_tpu
    info = {
        'python': platform.python_version(),
        'jax': jax.__version__,
        'devices': [str(d) for d in jax.devices()],
        'default_backend': jax.default_backend(),
        'ld_tpu': ld_tpu.__version__,
    }
    try:
        import flax
        import optax
        info['flax'] = flax.__version__
        info['optax'] = optax.__version__
    except ImportError:
        pass
    return info


def setup_jax_cache(root=None, min_compile_secs=1.0):
    """Point jax's persistent compilation cache at <repo>/.jax_cache.

    Shared by bench.py and the analysis tools — big inference/train graphs
    take minutes to build on this host, the cache makes reruns start in
    seconds."""
    import os
    import jax
    if root is None:
        root = os.path.join(os.path.dirname(os.path.dirname(
            os.path.dirname(os.path.abspath(__file__)))), '.jax_cache')
    jax.config.update('jax_compilation_cache_dir', os.path.abspath(root))
    jax.config.update('jax_persistent_cache_min_compile_time_secs',
                      min_compile_secs)
