"""Opt-in synthetic-SF oracle gate: generates tools/synth_sf.py data
(off-fixture distributions — 8 series, 45 days, adversarial documents,
different embedding id range) and runs the FULL oracle comparison on
it.  Heavy (~4 min, a whole extra SF sweep), so it only runs when
SYNTH_GATE=1 — the quick loop is::

    python tools/synth_sf.py /tmp/synth_sf && \
    python tools/oracle_check.py /tmp/synth_sf

This sweep is what caught the hard-coded ``vec_id = 0`` query-vector
probe in the sim_topk family (fixture ids start at 0; any other id
range crashed the query)."""

import os
import subprocess
import sys

import pytest

pytestmark = pytest.mark.skipif(
    not os.environ.get("SYNTH_GATE"),
    reason="set SYNTH_GATE=1 to run the full synthetic-SF oracle sweep",
)

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_synthetic_sf_oracle_gate(tmp_path):
    out = str(tmp_path / "synth_sf")
    gen = subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", "synth_sf.py"), out],
        capture_output=True, text=True, timeout=300,
    )
    assert gen.returncode == 0, gen.stderr[-2000:]
    chk = subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", "oracle_check.py"), out],
        capture_output=True, text=True, timeout=1200, cwd=REPO,
    )
    assert chk.returncode == 0, chk.stdout[-3000:] + chk.stderr[-2000:]
    assert "all checked queries match" in chk.stdout
