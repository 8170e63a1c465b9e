#!/usr/bin/env python
"""Print a fully-merged config. Parity: /root/reference/tools/misc/print_config.py."""
import argparse
import os
import sys
import pprint

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__)))))

from ld_tpu import Config

p = argparse.ArgumentParser()
p.add_argument('config')
args = p.parse_args()
cfg = Config.fromfile(args.config)
pprint.pprint(cfg.to_dict(), width=100)
