"""GPipe pipeline parallelism: exactness of forward and gradients vs the
sequential stack (pipelining is a schedule, not an approximation)."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from ld_tpu.parallel import create_mesh
from ld_tpu.parallel.pipeline import gpipe

pytestmark = pytest.mark.slow  # compile-heavy; excluded from -m "not slow"



def _stage(params, x):
    w, b = params
    return jax.nn.relu(x @ w + b) + x  # residual MLP block


def _make(s=4, m=8, bsz=4, d=16, seed=0):
    rs = np.random.RandomState(seed)
    w = jnp.asarray(rs.randn(s, d, d).astype(np.float32) * 0.1)
    b = jnp.asarray(rs.randn(s, d).astype(np.float32) * 0.1)
    xs = jnp.asarray(rs.randn(m, bsz, d).astype(np.float32))
    return (w, b), xs


def _sequential(params, xs):
    w, b = params
    y = xs
    for i in range(w.shape[0]):
        y = jax.vmap(lambda x: _stage((w[i], b[i]), x))(y)
    return y


@pytest.mark.parametrize('s', [2, 4])
def test_gpipe_forward_exact(s):
    mesh = create_mesh(('pipe', ), devices=jax.devices()[:s])
    params, xs = _make(s=s)
    out = jax.jit(lambda p, x: gpipe(_stage, p, x, mesh))(params, xs)
    ref = _sequential(params, xs)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-6, atol=1e-6)


def test_gpipe_grads_exact():
    s = 4
    mesh = create_mesh(('pipe', ), devices=jax.devices()[:s])
    params, xs = _make(s=s)

    def loss_pp(p):
        return jnp.mean(gpipe(_stage, p, xs, mesh) ** 2)

    def loss_seq(p):
        return jnp.mean(_sequential(p, xs) ** 2)

    l_pp, g_pp = jax.jit(jax.value_and_grad(loss_pp))(params)
    l_sq, g_sq = jax.value_and_grad(loss_seq)(params)
    np.testing.assert_allclose(float(l_pp), float(l_sq), rtol=1e-6)
    for a, b in zip(jax.tree_util.tree_leaves(g_pp),
                    jax.tree_util.tree_leaves(g_sq)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-6)


def test_gpipe_composes_with_data_axis():
    # 'pipe' x 'data' 2-D mesh: microbatch batch dim sharded over 'data'
    from jax.sharding import PartitionSpec as P
    mesh = create_mesh(('pipe', 'data'), (4, 2),
                       devices=jax.devices()[:8])
    params, xs = _make(s=4)
    out = jax.jit(lambda p, x: gpipe(_stage, p, x, mesh,
                                     xs_spec=P('data')))(params, xs)
    ref = _sequential(params, xs)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-6, atol=1e-6)
