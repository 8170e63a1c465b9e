"""Training-step wall-clock benchmark (device-side scanned steps).

Counterpart of tools/analysis_tools/benchmark.py for the TRAIN path
(the reference publishes no train step-time; its speed story is
README.md:44's "no inference cost"). Measures the full compiled step —
student forward+backward, frozen-teacher forward, losses, SGD — by
scanning K steps inside one jit call with the TrainState as the scan
carry, so weights cross the host<->device link once and two-point
differencing (K vs 3K) cancels the constant dispatch/upload cost. This
is the measurement recipe that works through relay-attached TPUs where
per-dispatch argument re-upload would otherwise dominate (docs/PERF.md).

Usage:
    python tools/analysis_tools/benchmark_train.py CONFIG \
        [--batch 8] [--hw 800 1344] [--k 4] [--remat] [--gts 40]
"""
import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                '..', '..'))

import jax
import jax.numpy as jnp
import numpy as np


def main():
    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    ap.add_argument('config')
    ap.add_argument('--batch', type=int, default=8)
    ap.add_argument('--hw', type=int, nargs=2, default=(800, 1344))
    ap.add_argument('--k', type=int, default=4,
                    help='steps per timed jit call')
    ap.add_argument('--reps', type=int, default=3,
                    help='two-point pairs to median over (tunnel noise)')
    ap.add_argument('--gts', type=int, default=40,
                    help='padded GT boxes per image')
    ap.add_argument('--remat', action='store_true')
    ap.add_argument('--fp32-towers', action='store_true',
                    help='disable the default bf16 backbone/neck compute')
    ap.add_argument('--level-pack', action='store_true',
                    help='run the GFL head tower on ONE packed all-level '
                         'canvas (student AND teacher); see '
                         'ld_tpu/models/heads/packed_tower.py')
    ap.add_argument('--bf16-head', action='store_true',
                    help='run the 4+4 conv-GN head towers in bf16 too '
                         '(student AND teacher); predictions are cast back '
                         'to fp32 before every loss/decode '
                         '(gfl_head.py GFLHeadNet), so only the tower '
                         'compute is reduced-precision')
    ap.add_argument('--bf16-teacher-head', action='store_true',
                    help='bf16 head tower for the TEACHER only (its '
                         'predictions are soft targets under '
                         'stop_gradient; the student head stays fp32)')
    ap.add_argument('--no-fold-teacher-bn', dest='fold_teacher_bn',
                    action='store_false', default=True,
                    help='skip folding the frozen teacher BN stats into '
                         'its conv kernels (utils/fuse_conv_bn.py; the '
                         'fold is value-identical — the teacher is '
                         'inference-only — and is applied by default, '
                         'matching apis/train.py)')
    args = ap.parse_args()

    from ld_tpu.utils.profiling import setup_jax_cache
    setup_jax_cache()

    import optax
    from ld_tpu import Config
    from ld_tpu.models import build_detector
    from ld_tpu.parallel import create_train_state, make_train_step

    H, W = args.hw
    B, K = args.batch, args.k
    cfg = Config.fromfile(args.config)
    mc = cfg.model.to_dict() if hasattr(cfg.model, 'to_dict') else \
        dict(cfg.model)
    # resolve the teacher config to a plain dict so the same tower knobs
    # can be applied to it (the frozen teacher is the single largest step
    # component — an fp32 R101 teacher would dominate the measurement)
    model_cfgs = [mc]
    if isinstance(mc.get('teacher_config'), str):
        from ld_tpu.models.detectors.kd_one_stage import _resolve_config
        tc = Config.fromfile(_resolve_config(mc['teacher_config']))
        tc = tc.to_dict() if hasattr(tc, 'to_dict') else dict(tc)
        mc['teacher_config'] = tc
        model_cfgs.append(tc['model'])
    for m in model_cfgs:
        if not args.fp32_towers:
            for key in ('backbone', 'neck'):
                if key in m and isinstance(m[key], dict):
                    m[key]['dtype'] = jnp.bfloat16
        if args.level_pack:
            m['bbox_head']['level_pack'] = True
        if args.bf16_head:
            m['bbox_head']['dtype'] = jnp.bfloat16
    if args.bf16_teacher_head and len(model_cfgs) > 1:
        model_cfgs[-1]['bbox_head']['dtype'] = jnp.bfloat16
    det = build_detector(mc)
    has_teacher = hasattr(det, 'teacher')

    opt = optax.sgd(learning_rate=0.01, momentum=0.9)
    state = create_train_state(det, jax.random.PRNGKey(0), opt,
                               input_shape=(1, 64, 96, 3))
    tv = det.init_teacher_variables(jax.random.PRNGKey(1), (1, 64, 96, 3)) \
        if has_teacher else None
    if tv is not None and args.fold_teacher_bn:
        from ld_tpu.utils.fuse_conv_bn import fuse_conv_bn
        tv = fuse_conv_bn(tv)
    step_fn = make_train_step(det, opt, has_teacher=has_teacher,
                              remat=args.remat)

    rs = np.random.RandomState(0)
    G = args.gts
    # R distinct batches rotated through the scan: with ONE reused batch
    # every batch-dependent subcomputation is loop-invariant and XLA's LICM
    # hoists it out of the scan — measured 34.5 "ms/step" for the full LD
    # step with the folded teacher, below the student-only MXU floor
    # (~53 ms at the chip's measured 195.8 TFLOP/s peak), because the
    # teacher forward ran ONCE for K steps. Real training feeds a new
    # batch every step; rotating buffers restores that property.
    R = 2
    gt = np.zeros((R, B, G, 4), np.float32)
    gt[..., :2] = rs.uniform(0, 300, (R, B, G, 2))
    gt[..., 2:] = gt[..., :2] + rs.uniform(60, 400, (R, B, G, 2))
    batches = dict(
        image=jnp.asarray(rs.randn(R, B, H, W, 3).astype(np.float32)),
        gt_bboxes=jnp.asarray(gt),
        gt_labels=jnp.asarray(rs.randint(0, 80, (R, B, G)).astype(np.int32)),
        gt_valid=jnp.asarray(np.ones((R, B, G), bool)),
        img_hw=jnp.asarray(np.tile([[[H, W]]], (R, B, 1)).astype(np.float32)))

    def loop(n):
        @jax.jit
        def run(state, batches, tv):
            def body(s, i):
                batch = jax.tree_util.tree_map(
                    lambda x: jax.lax.dynamic_index_in_dim(
                        x, i, 0, keepdims=False), batches)
                s2, metrics = step_fn(s, batch, tv) if has_teacher else \
                    step_fn(s, batch)
                return s2, metrics['loss']
            return jax.lax.scan(body, state, jnp.arange(n) % R)
        return run

    r1, r3 = loop(K), loop(3 * K)
    print('compiling...', flush=True)
    t0 = time.perf_counter()
    _, losses = r1(state, batches, tv)
    np.asarray(losses)
    print(f'compile+first: {time.perf_counter() - t0:.1f}s '
          f'loss={np.asarray(losses)[-1]:.3f}', flush=True)
    _, losses = r3(state, batches, tv)
    np.asarray(losses)

    # repeat the two-point pair and take the MEDIAN: a single K-vs-3K pair
    # is defenseless against tunnel latency spikes (one r5 run measured a
    # NEGATIVE step time when a spike landed inside the K window)
    samples = []
    for _ in range(args.reps):
        t0 = time.perf_counter()
        _, losses = r1(state, batches, tv)
        np.asarray(losses)
        t1 = time.perf_counter()
        _, losses = r3(state, batches, tv)
        np.asarray(losses)
        t2 = time.perf_counter()
        samples.append(((t2 - t1) - (t1 - t0)) / (2 * K))
    per_step = float(np.median(samples))
    spread = (max(samples) - min(samples)) / 2 * 1000
    print(f'{os.path.basename(args.config)} train step @ batch {B} '
          f'{H}x{W}{" remat" if args.remat else ""}: '
          f'{per_step * 1000:.1f} ms/step = {B / per_step:.1f} img/s/chip '
          f'(median of {args.reps}, spread +-{spread:.1f} ms)')


if __name__ == '__main__':
    main()
