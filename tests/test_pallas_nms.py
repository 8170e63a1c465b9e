"""Pallas NMS kernel vs the XLA cluster-NMS reference (interpret mode)."""
import numpy as np
import jax.numpy as jnp
from ld_tpu.ops.pallas_nms import pallas_nms_keep
from ld_tpu.ops.nms import _cluster_nms_keep

rng = np.random.RandomState(0)


def test_pallas_nms_matches_xla():
    for trial in range(5):
        K = 64
        xy = rng.uniform(0, 100, (K, 2)); wh = rng.uniform(5, 40, (K, 2))
        boxes = np.concatenate([xy, xy+wh], -1).astype(np.float32)
        scores = np.sort(rng.uniform(0.01, 1, K).astype(np.float32))[::-1].copy()
        valid = scores > 0.1
        want = np.asarray(_cluster_nms_keep(jnp.asarray(boxes), jnp.asarray(scores), 0.5, valid=jnp.asarray(valid)))
        got = np.asarray(pallas_nms_keep(jnp.asarray(boxes), jnp.asarray(valid), 0.5, interpret=True))
        np.testing.assert_array_equal(got, want, err_msg=str(trial))
