"""Opt-in end-to-end pipeline smoke (ROBIR_SLOW_TESTS=1).

Runs tools/shadow_pipeline.py --fast (all five stages + relighting on the
procedural two-sphere scene, ~3-4 min on the CPU mesh) and asserts the
metric emission contract — the per-metric quality gates live in the tool's
full-schedule TPU runs recorded in STATUS.md.
"""

import json
import os
import subprocess
import sys

import pytest

pytestmark = pytest.mark.slow

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.mark.skipif(not os.environ.get("ROBIR_SLOW_TESTS"),
                    reason="set ROBIR_SLOW_TESTS=1 to run (~4 min)")
def test_fast_pipeline_end_to_end(tmp_path):
    out = str(tmp_path / "sp")
    env = dict(os.environ,
               ROBIR_PLATFORM="cpu",
               XLA_FLAGS="--xla_force_host_platform_device_count=8")
    proc = subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", "shadow_pipeline.py"),
         "--out", out, "--fast"],
        capture_output=True, text=True, timeout=2400, env=env)
    assert proc.returncode == 0, proc.stdout[-3000:] + proc.stderr[-2000:]
    metrics = json.load(open(os.path.join(out, "pipeline_metrics.json")))
    for key in ("neus_test", "mesh_err_median", "vis_mean_at_lit_front",
                "albedo_shadow_lit_ratio_cesr", "albedo_chroma_cos_cesr",
                "albedo_psnr_cesr", "albedo_map_psnr_cesr", "relight"):
        assert key in metrics, key
    assert "mean_relit_psnr_masked" in metrics["relight"]
    # quality gates checked and green (the pipeline exits 1 on a gate
    # failure, so returncode==0 above is itself the regression gate)
    assert metrics["gates"]["checked"] and not metrics["gates"]["failures"]
