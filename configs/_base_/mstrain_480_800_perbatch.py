# Multi-scale training 480..800 with per-BATCH scale sampling — the
# opt-in speed knob. One scale per batch (drawn deterministically from
# seed+epoch) lets small-scale batches run in small static pad buckets:
# ~1.29x faster epochs than per-image sampling (docs/PERF.md).
#
# NOT the default: the miniature-scale A/B (docs/EXPERIMENTS.md,
# tools/analysis_tools/mstrain_ab_experiment.py) measured per-batch
# sampling substantially AP-NEGATIVE vs the reference's per-image draw
# (correlated scale noise across the whole batch destabilizes training at
# small step counts). Use only when epoch throughput matters more than
# last-fraction AP, and validate on your task.
_base_ = './mstrain_480_800.py'
scale_sampling = 'batch'
