"""The AP-parity runbook's dry-run must stay green (VERDICT r02 Next #4):
it proves, without COCO or published checkpoints, that real GFL-R50,
GFL-R101 and R101-DCN checkpoints (shape-faithful synthesized stand-ins)
convert strictly, validate leaf-for-leaf against the config-built models,
evaluate, and drive one LD train step as the teacher."""
import pytest
import sys

pytestmark = pytest.mark.slow  # compile-heavy; excluded from -m "not slow"



def test_runbook_dry_run(tmp_path):
    sys.path.insert(0, 'tools')
    from ap_parity_runbook import dry_run
    dry_run(str(tmp_path))
