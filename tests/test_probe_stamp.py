"""Hardware-probe stamp mechanics (tools/probe_stamp.py).

The stamp is the snapshot gate's evidence that the Pallas surface was
re-probed on real hardware after its last change (VERDICT r4 #4). The
hardware run itself can't execute here — these tests pin the
machinery: content-hash sensitivity, CPU-refusal, and the check()
verdicts the gate script acts on.
"""

import importlib.util
import json
import os
import sys

import pytest

_SPEC = importlib.util.spec_from_file_location(
    "probe_stamp",
    os.path.join(os.path.dirname(__file__), "..", "tools",
                 "probe_stamp.py"))
probe_stamp = importlib.util.module_from_spec(_SPEC)
_SPEC.loader.exec_module(probe_stamp)


@pytest.fixture
def sandbox(tmp_path, monkeypatch):
    """Redirect the stamp file and the probed surface to a temp dir."""
    f1 = tmp_path / "kernel.py"
    f2 = tmp_path / "core.py"
    f1.write_text("a = 1\n")
    f2.write_text("b = 2\n")
    monkeypatch.setattr(probe_stamp, "STAMP", str(tmp_path / "PROBE_STAMP"))
    monkeypatch.setattr(probe_stamp, "surface_files",
                        lambda: [str(f1), str(f2)])
    return f1, f2


def test_hash_tracks_content(sandbox):
    f1, _ = sandbox
    h0 = probe_stamp.surface_hash()
    assert h0 == probe_stamp.surface_hash()      # deterministic
    f1.write_text("a = 999\n")
    assert probe_stamp.surface_hash() != h0      # any edit invalidates


def test_record_refuses_cpu_backend(sandbox, capsys):
    # the suite runs on CPU (conftest) — record() must refuse to stamp
    probe_stamp.record("interval_precision", {"p3_batch": 1e-3})
    assert not os.path.exists(probe_stamp.STAMP)
    assert "NOT stamping" in capsys.readouterr().out


def _force_stamp(probes):
    """Write a stamp directly (what record() does on real hardware)."""
    stamp = {"surface_sha": probe_stamp.surface_hash(),
             "probes": {p: {"payload": {}} for p in probes}}
    with open(probe_stamp.STAMP, "w") as f:
        json.dump(stamp, f)


def test_check_verdicts(sandbox, capsys):
    f1, _ = sandbox
    assert probe_stamp.check() == 1              # no stamp at all
    assert "never been hardware-probed" in capsys.readouterr().out

    _force_stamp(["interval_precision"])         # one probe missing
    assert probe_stamp.check() == 1
    assert "cap512" in capsys.readouterr().out

    _force_stamp(probe_stamp.REQUIRED_PROBES)    # complete + current
    assert probe_stamp.check() == 0

    f1.write_text("a = 3\n")                     # surface edited
    assert probe_stamp.check() == 1
    assert "surface changed" in capsys.readouterr().out


def test_real_surface_covers_pallas_files():
    files = [os.path.basename(p) for p in probe_stamp.surface_files()]
    assert "fused_posterior.py" in files
    assert "fused_expander.py" in files
    assert "safe_opt_core.py" in files
    assert "config.py" in files
    for p in probe_stamp.surface_files():
        assert os.path.exists(p)
