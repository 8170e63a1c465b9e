# Multi-scale training 480..800, per-image — kept as a backward-compat
# alias: per-IMAGE range sampling became the DEFAULT of
# ./mstrain_480_800.py after the miniature A/B measured per-batch
# sampling AP-negative (docs/EXPERIMENTS.md). Configs and runbooks that
# pinned this base for AP-parity keep exact reference semantics either way.
_base_ = './mstrain_480_800.py'
