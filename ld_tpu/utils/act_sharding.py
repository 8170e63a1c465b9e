"""Trace-time activation-resharding context for spatially-partitioned steps.

Under sp (image H sharded over the 'sp' mesh axis — `jit_train_step(sp=True)`)
the backbone/neck/head convs run spatially sharded (the FLOPs-heavy part,
where GSPMD halo exchange is cheap and the layout is right). The loss math,
however, operates on flattened (batch, anchors, c) tensors whose reshapes
XLA's SPMD partitioner cannot keep in the {data, sp} layout — it falls back
to "involuntary full rematerialization" (replicate-then-repartition) on every
tiny loss reshape, which is both slow and reassociates reductions differently
from the data-parallel step (observed 7.5e-4 relative loss drift vs dp1).

Fix: reshard ONCE, at the flatten funnel every head's loss goes through
(`flatten_levels` / `flatten_levels_anchors`), from the sp layout to
batch-only sharding. One clean all-gather over 'sp' per head output; all
loss math then computes in exactly the dp layout, so sp numerics ≡ dp
numerics. The loss is O(anchors) elementwise work — negligible next to the
conv stack — so gathering it costs nothing measurable.

The context is set at TRACE time by the sp wrapper in
`ld_tpu/parallel/train_step.py:jit_train_step`; model code only calls
`reshard_for_loss`, which is a no-op outside an sp trace. Lives in utils
(not parallel) so model code can import it without a cycle.
"""
from __future__ import annotations

from contextlib import contextmanager

_LOSS_SHARDING = [None]
_SP_STAGE = [None]  # (sp_sharding, data_sharding, gather_stage)


@contextmanager
def loss_sharding_scope(sharding):
    """Activate `sharding` (a NamedSharding, batch-axis only) for the
    duration of a trace; nested scopes restore the previous value."""
    prev = _LOSS_SHARDING[0]
    _LOSS_SHARDING[0] = sharding
    try:
        yield
    finally:
        _LOSS_SHARDING[0] = prev


def reshard_for_loss(x):
    """Constrain `x` to the active loss sharding (no-op when none is set).

    Called on the (B, anchors, c) output of the head flatten funnels so the
    constraint is applied exactly once per flattened tensor."""
    sh = _LOSS_SHARDING[0]
    if sh is None:
        return x
    import jax
    return jax.lax.with_sharding_constraint(x, sh)


@contextmanager
def sp_stage_scope(sp_sharding, data_sharding, gather_stage: int = 1):
    """Activate per-stage spatial-partitioning resharding for a trace.

    Spatial partitioning only pays on the HIGH-RESOLUTION backbone stages —
    that is where the activation memory and the conv FLOPs are; on the deep
    small maps (layer3/4 of an 800x1344 input are <=100 rows) halo overhead
    dominates, AND the XLA SPMD partitioner was bisected to produce WRONG
    kernel gradients for convs on small H-sharded maps (sp-only grads drift
    8.4e-3 absolute on layer3/4 kernels while layer1/2 are exact — a
    partitioner bug, not fp reassociation; see
    tests/test_parallel.py::test_sp_grads_match_dp1). So:

      * stage outputs with index < gather_stage stay (data, sp)-sharded;
      * the output of stage `gather_stage` (and everything after) is
        constrained to batch-only — ONE all-gather over 'sp' at the last
        high-res stage boundary, placed so both consumers (next stage and
        the FPN lateral) read the gathered copy.
    """
    prev = _SP_STAGE[0]
    _SP_STAGE[0] = (sp_sharding, data_sharding, gather_stage)
    try:
        yield
    finally:
        _SP_STAGE[0] = prev


def reshard_stage(x, stage: int):
    """Constrain a backbone stage output under an sp trace (no-op
    otherwise). `stage` is the 0-based residual-stage index; the stem
    passes -1 (always sp-resident)."""
    ctx = _SP_STAGE[0]
    if ctx is None:
        return x
    sp_sh, data_sh, gather_stage = ctx
    import jax
    return jax.lax.with_sharding_constraint(
        x, sp_sh if stage < gather_stage else data_sh)


def reshard_export(x, stage: int):
    """Constrain a backbone output that is EXPORTED to the neck (an
    `out_indices` member) under an sp trace; no-op otherwise.

    Stage outputs below `gather_stage` stay spatially sharded on the
    in-backbone path (`reshard_stage`), but the copy handed to the neck
    must be batch-only: FPN lateral convs may be fsdp/tp-sharded along
    C_in/C_out, and channel-sharded weights + H-sharded activations is the
    known SPMD-partitioner miscompile this module exists to dodge (see
    sp_resident_param_patterns). E.g. cascade/HTC backbones export stage 0
    (out_indices=(0,1,2,3)) while gather_stage=1 keeps it sp-resident
    in-backbone. One extra 'sp' all-gather of that map, correctness for
    every out_indices shape."""
    ctx = _SP_STAGE[0]
    if ctx is None:
        return x
    _, data_sh, gather_stage = ctx
    if stage >= gather_stage:
        return x  # already batch-only via reshard_stage
    import jax
    return jax.lax.with_sharding_constraint(x, data_sh)


def sp_resident_param_patterns(gather_stage: int = 1):
    """keystr substrings of backbone params whose activations remain
    spatially sharded under `sp_stage_scope(gather_stage)` — these leaves
    must NOT be fsdp/tp-sharded (sharded weights + H-sharded activations
    miscompile under the current partitioner; see param_sharding)."""
    pats = ["['backbone']['conv1']", "['backbone']['norm1']",
            "['backbone']['stem"]
    for s in range(gather_stage + 1):
        pats.append(f"['backbone']['layer{s + 1}_")
    return tuple(pats)
