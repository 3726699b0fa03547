"""Demo CLI end-to-end (SURVEY.md §3.5 script-entry equivalent)."""

import os
import subprocess
import sys

import numpy as np

ENV = {**os.environ, "IE_MP_TPU_PLATFORM": "cpu"}

from imageenhancement_mp_tpu import ref


def _run_cli(tmp_path, img, ops):
    inp = tmp_path / "in.npy"
    out = tmp_path / "out.npy"
    np.save(inp, img)
    r = subprocess.run(
        [sys.executable, "-m", "imageenhancement_mp_tpu.cli", str(inp), "-o", str(out)]
        + [a for op in ops for a in ("--op", op)],
        capture_output=True,
        text=True,
        timeout=300,
        env=ENV,
    )
    assert r.returncode == 0, r.stderr[-500:]
    return np.load(out)


def test_cli_pipeline(tmp_path, rng):
    img = rng.integers(0, 256, (48, 56), dtype=np.uint8)
    got = _run_cli(tmp_path, img, ["median:3", "unsharp:1.0"])
    want = ref.unsharp_mask(ref.median_blur(img, 3), 1.0)
    assert np.abs(got.astype(int) - want.astype(int)).max() <= 1


def test_cli_unknown_op(tmp_path, rng):
    inp = tmp_path / "in.npy"
    np.save(inp, rng.integers(0, 256, (8, 8), dtype=np.uint8))
    r = subprocess.run(
        [sys.executable, "-m", "imageenhancement_mp_tpu.cli", str(inp), "--op", "bogus"],
        capture_output=True,
        text=True,
        timeout=120,
        env=ENV,
    )
    assert r.returncode == 2
    assert "unknown op" in r.stderr


def test_selftest_passes_on_cpu():
    r = subprocess.run(
        [sys.executable, "-m", "imageenhancement_mp_tpu.selftest", "--size", "48x53"],
        capture_output=True,
        text=True,
        timeout=300,
        env=ENV,
    )
    assert r.returncode == 0, r.stderr[-400:]
    assert "SELFTEST PASS" in r.stdout


def test_cli_batch_mode(tmp_path, rng):
    ins = []
    for i in range(3):
        p = tmp_path / f"b{i}.npy"
        np.save(p, rng.integers(0, 256, (24, 31), dtype=np.uint8))
        ins.append(str(p))
    outdir = tmp_path / "outs"
    r = subprocess.run(
        [sys.executable, "-m", "imageenhancement_mp_tpu.cli", *ins,
         "-o", str(outdir), "--op", "stretch"],
        capture_output=True, text=True, timeout=300, env=ENV,
    )
    assert r.returncode == 0, r.stderr[-400:]
    assert len(list(outdir.glob("*.npy"))) == 3
