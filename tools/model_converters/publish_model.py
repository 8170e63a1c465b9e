#!/usr/bin/env python
"""Strip a training checkpoint to inference variables (.npz) + content hash.

Parity: /root/reference/tools/model_converters/publish_model.py.
"""
import argparse
import hashlib
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__)))))


def main():
    p = argparse.ArgumentParser()
    p.add_argument('work_dir', help='training work dir with checkpoints/')
    p.add_argument('out_file')
    args = p.parse_args()
    from ld_tpu.utils.checkpoint import save_variables
    import orbax.checkpoint as ocp
    path = os.path.abspath(os.path.join(args.work_dir, 'checkpoints'))
    mngr = ocp.CheckpointManager(path)
    step = mngr.latest_step()
    restored = mngr.restore(step)
    variables = {'params': restored['params'],
                 'batch_stats': restored.get('batch_stats', {})}
    out = args.out_file
    if not out.endswith('.npz'):
        out += '.npz'
    save_variables(out, variables)
    sha = hashlib.sha256(open(out, 'rb').read()).hexdigest()[:8]
    final = out.replace('.npz', f'-{sha}.npz')
    os.rename(out, final)
    print(f'published step {step} -> {final}')


if __name__ == '__main__':
    main()
