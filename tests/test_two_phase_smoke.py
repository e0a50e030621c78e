"""The one-command two-phase recipe smoke (phase-1 -> transplant -> phase-2
-> eval) runs green end-to-end on synthetic data."""

import sys
import pytest

pytestmark = pytest.mark.slow


def test_two_phase_smoke_cli(tmp_path, monkeypatch, capsys):
    from istnet_tpu.cli import two_phase_smoke

    monkeypatch.setattr(sys, "argv", [
        "two_phase_smoke", "--work_dir", str(tmp_path), "--iters", "1"])
    two_phase_smoke.main()
    out = capsys.readouterr().out
    assert "TWO_PHASE_SMOKE OK" in out
    assert "2 result pkls" in out
