from .mesh import (create_mesh, data_sharding, device_prefetch,
                   fsdp_sharding, param_sharding, replicated, shard_batch)
from .distributed import init_distributed, is_main_process, all_gather_host
from .optim import build_optimizer, build_lr_schedule, frozen_mask
from .train_step import (TrainState, create_train_state, make_train_step,
                         jit_train_step, make_eval_step)
from .pipeline import gpipe

__all__ = [
    'gpipe',
    'create_mesh', 'data_sharding', 'device_prefetch', 'fsdp_sharding',
    'param_sharding', 'replicated', 'shard_batch',
    'build_optimizer', 'build_lr_schedule', 'frozen_mask', 'TrainState',
    'create_train_state', 'make_train_step', 'jit_train_step',
    'make_eval_step', 'init_distributed', 'is_main_process',
    'all_gather_host'
]
