"""Platform selection helpers.

The image's site hook registers the experimental 'axon' TPU-tunnel PJRT
plugin and points ``jax_platforms`` at it from ``sitecustomize`` — so a
shell-level ``JAX_PLATFORMS=cpu`` is NOT enough to keep a tool off the
tunnel (the config value set at import time wins over the env var, and a
dead tunnel blocks backend init indefinitely). Every CPU-safe tool path
(dry runs, host-side estimators, tests) must call :func:`force_cpu`
*before its first jax computation* — it flips both the env var (for any
subprocesses) and the live ``jax_platforms`` config.
"""
import os


def force_cpu(host_devices: int | None = None) -> None:
    """Pin jax to the host CPU platform; safe to call repeatedly.

    Must run before the first backend initialization (any jax
    computation / ``jax.devices()``); after that, jax raises on
    platform changes.

    host_devices: optionally force a virtual multi-device CPU platform
    (``--xla_force_host_platform_device_count``) for sharding tests.
    """
    os.environ['JAX_PLATFORMS'] = 'cpu'
    if host_devices is not None:
        flags = os.environ.get('XLA_FLAGS', '')
        if '--xla_force_host_platform_device_count' not in flags:
            os.environ['XLA_FLAGS'] = (
                f'{flags} --xla_force_host_platform_device_count='
                f'{host_devices}').strip()
    import jax
    jax.config.update('jax_platforms', 'cpu')
