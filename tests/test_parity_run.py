"""End-to-end test for the real-data parity harness.

Runs ``tpu_reid.tools.parity_run`` exactly as a user would
(`main(["--synthetic", "--baseline", ...])`): generates a Market-layout
workload + tiny CLIP checkpoint, extracts features, runs the framework's
on-device retrieval tail AND the bundled numpy re-implementation of the
reference's evaluation math (reference: evaluate.py:29-88), and asserts
they agree. Also checks the BASELINE.json "published" record is written.
"""

import json

import numpy as np
import pytest

from tpu_reid.tools import parity_run


def test_ref_cmc_map_short_kept_rows():
    """Queries whose keep-filter leaves fewer than max_rank gallery rows
    must pad the CMC curve, not crash (the round-3 regression)."""
    # 1 query, 3 gallery rows; one gallery row is same-pid same-cam (dropped)
    dist = np.array([[0.1, 0.2, 0.3]])
    q_pids, g_pids = np.array([7]), np.array([7, 7, 5])
    q_cams, g_cams = np.array([0]), np.array([0, 1, 0])
    cmc, mAP = parity_run.ref_cmc_map(
        dist, q_pids, g_pids, q_cams, g_cams, max_rank=10
    )
    assert cmc.shape == (3,)  # max_rank clamps to n_g
    # kept rows = [g1 (pid7,cam1), g2 (pid5,cam0)]; hit at rank 1
    np.testing.assert_allclose(cmc, [1.0, 1.0, 1.0])
    assert mAP == 1.0

    # now force kept rows < max_rank after the n_g clamp: 5 gallery rows,
    # 2 dropped -> found has 3 entries but max_rank stays 5
    dist = np.array([[0.1, 0.2, 0.3, 0.4, 0.5]])
    g_pids = np.array([7, 7, 5, 7, 6])
    g_cams = np.array([0, 0, 0, 1, 0])
    cmc, mAP = parity_run.ref_cmc_map(
        dist, q_pids, g_pids, q_cams, g_cams, max_rank=5
    )
    assert cmc.shape == (5,)
    np.testing.assert_allclose(cmc, [0.0, 1.0, 1.0, 1.0, 1.0])


@pytest.mark.slow
def test_parity_run_synthetic_end_to_end(tmp_path):
    baseline = tmp_path / "BASELINE.json"
    baseline.write_text(json.dumps({"published": {}}))
    result = parity_run.main([
        "--synthetic",
        "--synthetic_dir", str(tmp_path / "assets"),
        "--baseline", str(baseline),
        "--bs", "16",
    ])
    assert result["synthetic"] is True
    assert result["n_query"] == 12 and result["n_gallery"] == 48
    # the harness asserts this internally too; restate the contract here
    assert result["max_abs_diff"] <= 2e-3
    rec = json.loads(baseline.read_text())["published"]["market1501_synthetic"]
    assert rec["framework"]["mAP"] == pytest.approx(
        rec["reference_math"]["mAP"], abs=2e-3
    )


@pytest.mark.slow
def test_parity_run_synthetic_mm(tmp_path):
    """Multimodal (image+text fused) scoring path through the same harness."""
    result = parity_run.main([
        "--synthetic",
        "--synthetic_dir", str(tmp_path / "assets"),
        "--mm",
        "--bs", "16",
    ])
    assert result["max_abs_diff"] <= 2e-3
    assert ", mm" in result["protocol"]


@pytest.mark.slow
def test_runbook_synthetic_dry_run(tmp_path, monkeypatch):
    """The real-assets runbook (VERDICT r4 #9) dry-runs locally: --synthetic
    delegates to the identical parity harness and writes the published
    record, proving the one-command path a connected machine would run."""
    from tpu_reid.tools import runbook_market_parity as rb

    baseline = tmp_path / "BASELINE.json"
    monkeypatch.chdir(tmp_path)
    result = rb.main(["--synthetic", "--baseline", str(baseline)])
    assert result["max_abs_diff"] <= 2e-3
    rec = json.loads(baseline.read_text())["published"]["market1501_synthetic"]
    assert rec["synthetic"] is True


@pytest.mark.slow
def test_difficulty_knob_separates_retrieval_quality(tmp_path):
    """synth_market --difficulty must make retrieval measurably harder —
    the knob exists so trained-mode quality deltas are resolvable instead
    of every config saturating at Rank-1 = 1.0 (VERDICT r2 weak #2 /
    r4 #4). Frozen-tower mAP on the same tiny workload: difficulty 0
    lands mid-high, difficulty 0.8 (the calibrated full-scale setting,
    BASELINE.md) collapses toward chance, with a wide separation.
    CPU-measured windows: d=0.0 -> mAP 0.418 / R1 0.675, d=0.8 ->
    mAP 0.093 / R1 0.050 (deterministic seeds)."""
    import numpy as np

    from tpu_reid.tools.synth_market import write_images

    assets = parity_run.make_synthetic_assets(str(tmp_path / "assets"))
    results = {}
    for d in (0.0, 0.8):
        root = tmp_path / f"d{d}"
        write_images(str(root / "Market1501"), np.random.RandomState(0),
                     10, 20, 40, 160, (64, 32), difficulty=d)
        r = parity_run.main([
            "--root", str(root),
            "--model_path", assets["model_path"],
            "--bpe_path", assets["bpe_path"],
            "--height", "64", "--stride", "8", "--bs", "20",
        ])
        results[d] = r["framework"]["mAP"]
    assert 0.30 <= results[0.0] <= 0.55, results
    assert 0.04 <= results[0.8] <= 0.20, results
    assert results[0.0] - results[0.8] > 0.2, results
