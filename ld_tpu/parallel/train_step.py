"""SPMD training step: pure (state, batch) -> (state, metrics) under pjit.

Replaces the reference's runner/DDP iteration
(/root/reference/mmdet/models/detectors/base.py:220 train_step +
mmcv OptimizerHook backward/step + DDP bucket all-reduce): here the whole
iteration — student forward, teacher forward, loss, backward, optimizer —
is ONE compiled XLA program. The batch is sharded over the 'data' mesh axis;
every cross-replica reduction (gradient psum, the loss-normalization sums
that the reference implements as `reduce_mean` NCCL calls at
mmdet/core/utils/dist_utils.py:63, and the log-var all-reduce at
base.py:211-216) is just a global reduction that XLA lowers to ICI
collectives automatically.
"""
from __future__ import annotations

from typing import Any, Dict, NamedTuple, Optional

import jax
import jax.numpy as jnp
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from .mesh import data_sharding, replicated


class TrainState(NamedTuple):
    params: Any
    batch_stats: Any
    opt_state: Any
    step: jnp.ndarray


def create_train_state(detector, rng, optimizer,
                       input_shape=(1, 64, 64, 3)) -> TrainState:
    variables = detector.init_variables(rng, input_shape)
    params = variables['params']
    batch_stats = variables.get('batch_stats', {})
    return TrainState(params=params, batch_stats=batch_stats,
                      opt_state=optimizer.init(params),
                      step=jnp.zeros((), jnp.int32))


def make_train_step(detector, optimizer, has_teacher: bool = False,
                    remat: bool = False, seed: int = 0):
    """Build the pure train-step function (to be jitted/pjitted by caller).

    remat=True rematerializes the STUDENT forward (backbone/neck/head
    towers) during backward via jax.checkpoint scoped inside the detector's
    train-mode apply: activation memory for the deep conv stack drops to
    O(1) at ~1/3 extra student-forward FLOPs. The teacher forward
    (gradient-free, stop_gradient) and the loss math are never
    rematerialized — checkpointing the whole loss_fn instead re-ran the
    teacher too and measured 2.35x step time (docs/PERF.md).

    seed drives the per-step RNG (ROI sampling etc.): key =
    fold_in(PRNGKey(seed), step) — the reference threads its global seed
    through every sampler the same way (mmdet/apis/train.py:18)."""
    import inspect
    takes_rng = 'rng' in inspect.signature(
        detector.forward_train).parameters
    def train_step(state: TrainState, batch: Dict,
                   teacher_variables: Optional[Dict] = None):
        # scope the remat policy at the detector's student forward (see
        # SingleStageDetector.apply / TwoStageDetector.extract); set at
        # trace time so several step fns built from one detector object
        # each trace with their own policy
        detector._remat = bool(remat)

        def loss_fn(params):
            detector._last_batch_stats = None  # cleared pre-call: a stale
            # stash from an earlier trace must never leak into this one
            variables = {'params': params,
                         'batch_stats': state.batch_stats}
            kwargs = {}
            if takes_rng:
                # per-step rng so ROI sampling varies across iterations
                kwargs['rng'] = jax.random.fold_in(
                    jax.random.PRNGKey(seed), state.step)
            if has_teacher:
                losses = detector.forward_train(
                    variables, batch, teacher_variables=teacher_variables,
                    **kwargs)
            else:
                losses = detector.forward_train(variables, batch, **kwargs)
            # reference _parse_losses (base.py:185): only keys containing
            # 'loss' join the objective; other entries are logged metrics
            total = sum(jnp.asarray(v) for k, v in losses.items()
                        if 'loss' in k)
            # live-BN detectors stash momentum-updated stats during apply
            # (single_stage.py apply, train=True); thread them as aux so
            # norm_eval=False training actually updates running statistics
            new_stats = getattr(detector, '_last_batch_stats', None)
            return total, (losses, new_stats)

        (total, (losses, new_stats)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state.params)
        updates, opt_state = optimizer.update(grads, state.opt_state,
                                              state.params)
        params = optax.apply_updates(state.params, updates)
        metrics = dict(losses)
        metrics['loss'] = total
        new_state = TrainState(
            params=params,
            batch_stats=state.batch_stats if new_stats is None else new_stats,
            opt_state=opt_state, step=state.step + 1)
        return new_state, metrics

    return train_step


def jit_train_step(train_step, mesh: Mesh, has_teacher: bool = False,
                   fsdp: bool = False, state: TrainState = None,
                   sp: bool = False, tp: bool = False,
                   teacher_variables=None):
    """pjit the step over the mesh. Parallelism axes (all composable):

    * batch dim sharded over 'data' (plain DP);
    * fsdp=True — ZeRO-3: params + optimizer state split along each
      leaf's largest divisible dim over 'data' (all-gather-at-use +
      reduce-scatter-on-grads inserted by XLA);
    * sp=True — spatial partitioning: the image H axis is sharded over
      the 'sp' mesh axis (GSPMD halo exchange on every conv). THE
      TPU-native way to scale 800x1344 detection past per-chip activation
      memory / latency — the reference has no analogue (NCCL DDP cannot
      split one image across GPUs);
    * tp=True — tensor parallelism: every param leaf's last divisible
      dim (C_out) is sharded over the 'model' axis — student, optimizer
      state AND the read-only teacher (pass `teacher_variables` to derive
      its tree), so a big teacher costs 1/n_model memory per chip.

    `state` (abstract or concrete TrainState) is required for fsdp/tp to
    derive per-leaf sharding trees.

    sp and tp are mutually exclusive for now: composing them miscomputes
    under the current XLA CPU SPMD partitioner (minimal repro: ONE
    conv_general_dilated with H-sharded activations and C_out-sharded
    weights returns garbage, diff == scale, while either sharding alone —
    or C_in-sharded weights — is exact to 1e-6; see
    tests/test_parallel.py::test_sp_tp_composition_guard). Each axis is
    numerics-validated against the replicated step independently."""
    from .mesh import param_sharding
    if sp and tp:
        raise NotImplementedError(
            'sp (spatial partitioning) and tp (tensor parallelism) cannot '
            'be composed yet: XLA SPMD miscompiles convolutions whose '
            'activations are spatially sharded AND whose weights are '
            'C_out-sharded (verified by minimal repro, see '
            'jit_train_step docstring). Use sp or tp, each composable '
            'with dp and fsdp.')
    repl = replicated(mesh)
    batch_sh = data_sharding(mesh)
    sp_gather_stage = 1
    if sp:
        assert 'sp' in mesh.axis_names, mesh.axis_names
        sp_sh = NamedSharding(mesh, P('data', 'sp'))
        # Layout policy (see utils/act_sharding.py): the image and the
        # high-res backbone stages (stem..layer{gather_stage+1}) run
        # (data, sp)-sharded — that is where the activation memory and conv
        # FLOPs live; ONE all-gather over 'sp' at the gather_stage boundary
        # puts the deep small maps, FPN, head and loss in the plain dp
        # layout. Besides being the right cost model (halo overhead
        # dominates on small maps), this dodges two bisected XLA SPMD
        # partitioner bugs: wrong kernel grads for convs on small H-sharded
        # maps, and wrong forwards for channel-sharded weights + H-sharded
        # activations (why fsdp/tp leave sp-resident params replicated).
        loss_sh = NamedSharding(mesh, P('data'))
        inner_step = train_step

        def train_step(state, batch, *rest):  # noqa: F811
            from ld_tpu.utils.act_sharding import (loss_sharding_scope,
                                                   sp_stage_scope)
            batch = dict(batch, image=jax.lax.with_sharding_constraint(
                batch['image'], sp_sh))
            with sp_stage_scope(sp_sh, loss_sh, sp_gather_stage), \
                    loss_sharding_scope(loss_sh):
                return inner_step(state, batch, *rest)

    if tp:
        assert 'model' in mesh.axis_names, mesh.axis_names
    if fsdp or tp:
        assert state is not None, 'fsdp/tp need the TrainState pytree'
        from ld_tpu.utils.act_sharding import sp_resident_param_patterns
        kw = dict(fsdp_axis='data' if fsdp else None,
                  tp_axis='model' if tp else None,
                  # sharded weights + H-sharded activations miscompile
                  # under SPMD: sp-resident stage params stay replicated
                  exclude_substrings=(sp_resident_param_patterns(
                      sp_gather_stage) if sp else ()))
        state_sh = TrainState(
            params=param_sharding(mesh, state.params, **kw),
            batch_stats=jax.tree_util.tree_map(lambda _: repl,
                                               state.batch_stats),
            opt_state=param_sharding(mesh, state.opt_state, **kw),
            step=repl)
    else:
        state_sh = repl
    teacher_sh = repl
    if tp and has_teacher and teacher_variables is not None:
        teacher_sh = param_sharding(mesh, teacher_variables,
                                    tp_axis='model')
    out_sh = (state_sh, repl)
    if has_teacher:
        return jax.jit(train_step,
                       in_shardings=(state_sh, batch_sh, teacher_sh),
                       out_shardings=out_sh,
                       donate_argnums=(0, ))
    return jax.jit(train_step, in_shardings=(state_sh, batch_sh),
                   out_shardings=out_sh,
                   donate_argnums=(0, ))


def make_eval_step(detector):
    def eval_step(variables: Dict, batch: Dict):
        return detector.forward_test(variables, batch, rescale=True)

    return eval_step
