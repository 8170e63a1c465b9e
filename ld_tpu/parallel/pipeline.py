"""Pipeline parallelism (GPipe) over a `pipe` mesh axis.

TPU-native microbatch pipelining: the S stages of a homogeneous layer
stack live on S devices along the 'pipe' mesh axis (each device holds
1/S of the stage parameters); M microbatches stream through, and at
every tick each device applies its stage and hands its activation to
the next device with a single `lax.ppermute` hop over ICI. The whole
schedule — fill, steady state, drain — is one `lax.scan` inside one
`shard_map`, so it jits, differentiates (jax.grad flows backwards
through the ppermute chain, which is exactly the reverse pipeline
schedule), and composes with a 'data' axis sharding the microbatch
contents.

Scope: GPipe requires shape-homogeneous stages (the activation that
crosses the stage boundary must have one static shape). Transformer-ish
stacks qualify; detection backbones do NOT (ResNet stages change
resolution and width at every stage boundary), which is why the
reference stack has no pipeline mode either — for the detector itself
use dp/fsdp/sp/tp (`parallel.train_step.jit_train_step`). This module
makes PP a first-class capability for the models where it applies and
for big homogeneous teachers.

Bubble accounting (scaling-book recipe): utilization = M / (M + S - 1);
pick M >= 4*S for <20% bubble.
"""
from __future__ import annotations

from typing import Any, Callable

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P


def stack_stage_params(layer_params: list) -> Any:
    """Stack per-layer param pytrees (identical structure) for `gpipe`.

    Takes the L parameter trees of a homogeneous layer stack (e.g. the
    `enc{i}` subtrees of a DETR head) and returns one pytree whose leaves
    have a leading dim L — reshape/group that dim to (S, L//S, ...) to run
    L layers as S pipeline stages of L//S sub-layers each.
    """
    return jax.tree_util.tree_map(lambda *ls: jnp.stack(ls), *layer_params)


def gpipe(stage_fn: Callable[[Any, jnp.ndarray], jnp.ndarray],
          stacked_params: Any,
          microbatches: jnp.ndarray,
          mesh: Mesh,
          axis: str = 'pipe',
          xs_spec: P = P()) -> jnp.ndarray:
    """Run `microbatches` through S pipelined stages of `stage_fn`.

    Args:
        stage_fn: (stage_params, x) -> y with y.shape == x.shape.
        stacked_params: pytree whose leaves have leading dim S (stage i's
            parameters at index i); sharded over `axis`.
        microbatches: (M, ...) — M microbatches, identical shapes.
        mesh: mesh containing `axis` (other axes may shard the microbatch
            contents via `xs_spec`).
        axis: name of the pipeline mesh axis.
        xs_spec: PartitionSpec for microbatches[0]'s dims 1.. (e.g.
            P(None, 'data') to keep the per-microbatch batch dim sharded
            over a data axis).

    Returns:
        (M, ...) outputs — microbatch j holds
        stage_{S-1}(... stage_0(microbatches[j])), replicated over `axis`.
    """
    s = mesh.shape[axis]
    m = microbatches.shape[0]

    param_specs = jax.tree_util.tree_map(lambda _: P(axis), stacked_params)

    def local(params, xs):
        # params leaves arrive as (1, ...) local slices
        params = jax.tree_util.tree_map(lambda p: p[0], params)
        idx = jax.lax.axis_index(axis)
        state = jnp.zeros_like(xs[0])
        outs = jnp.zeros_like(xs)

        def tick(carry, t):
            state, outs = carry
            # stage 0 injects microbatch t; later stages consume the
            # activation ppermute'd in at the end of tick t-1, which is
            # stage idx-1's output for microbatch t-idx
            inp = jnp.where(idx == 0, xs[jnp.minimum(t, m - 1)], state)
            y = stage_fn(params, inp)
            # the last stage finishes microbatch t-(S-1) at tick t.
            # Read-modify-write ONE slot: masking the single slice (not a
            # full-buffer where) keeps per-tick write traffic O(slice)
            # instead of O(M) — O(M) vs O(M^2) over the schedule.
            slot = jnp.clip(t - (s - 1), 0, m - 1)
            cur = jax.lax.dynamic_slice_in_dim(outs, slot, 1, axis=0)
            write = (idx == s - 1) & (t >= s - 1)
            outs = jax.lax.dynamic_update_slice_in_dim(
                outs, jnp.where(write, y[None], cur), slot, axis=0)
            state = jax.lax.ppermute(
                y, axis, [(i, (i + 1) % s) for i in range(s)])
            return (state, outs), None

        (_, outs), _ = jax.lax.scan(tick, (state, outs),
                                    jnp.arange(m + s - 1))
        # outs is only populated on the last stage; make it replicated
        # over the pipe axis (one masked psum — outputs are zeros
        # elsewhere, so the sum IS the last stage's buffer)
        return jax.lax.psum(
            jnp.where(idx == s - 1, outs, jnp.zeros_like(outs)), axis)

    spec_xs = P(None, *xs_spec)
    return jax.shard_map(local, mesh=mesh,
                         in_specs=(param_specs, spec_xs),
                         out_specs=spec_xs,
                         check_vma=False)(stacked_params, microbatches)
