# Runtime defaults. Parity: /root/reference/configs/_base_/default_runtime.py,
# with TPU-native replacements: orbax checkpoints, SPMD mesh instead of NCCL.
checkpoint_config = dict(interval=1)
log_config = dict(interval=50, hooks=[dict(type='TextLoggerHook')])
# mesh axes for jax.sharding: data-parallel over all chips by default
mesh = dict(axes=dict(data=-1))
dist_params = dict(backend='xla')  # collectives compiled into the step fn
log_level = 'INFO'
load_from = None
resume_from = None
workflow = [('train', 1)]
seed = 0
dtype = 'bfloat16'   # compute dtype for backbone/neck/head towers
