"""The AP-parity runbook's dry-run must stay green (VERDICT r03 Next #4):
it proves, without mounted data or published checkpoints, that every
BASELINE.md row is turn-key — each row's shape-faithful synthesized
checkpoint (R18/R34 BasicBlock, R50/R101 Bottleneck, R101-DCN offsets,
GFLV2 reg_conf, VOC 20-class heads) converts strictly and validates
leaf-for-leaf against the config-built model, and representative rows
drive the full eval / LD-train-step path."""
import pytest
import sys

pytestmark = pytest.mark.slow  # compile-heavy; excluded from -m "not slow"


def _rows():
    sys.path.insert(0, 'tools')
    from ap_parity_runbook import ROWS, dry_run_row
    return ROWS, dry_run_row


def test_runbook_all_rows_convert(tmp_path):
    """Strict convert + leaf-for-leaf validation for EVERY row."""
    ROWS, dry_run_row = _rows()
    for name, row in ROWS.items():
        dry_run_row(name, row, str(tmp_path), convert_only=True)


@pytest.mark.parametrize('name', ['gfl_r50_1x', 'ldv2_r50_1x',
                                  'ld_r18_voc', 'ld_x101_dcn_self_2x',
                                  'im_defeat_r50'])
def test_runbook_full_dry_run(tmp_path, name):
    """Full dry-run (eval / one real LD train step) on one zero-train
    COCO row, the GFLV2-student row, the VOC train row, the grouped-DCN
    ResNeXt self-LD row and one imitation-ablation arm (r5 additions)."""
    ROWS, dry_run_row = _rows()
    dry_run_row(name, ROWS[name], str(tmp_path))
