"""Multi-host extraction tests (parallel/multihost.py).

The e2e test runs TWO real OS processes, each with 2 virtual CPU devices,
joined into one 4-device global mesh via jax.distributed (gloo
collectives) — the same process topology as a 2-host TPU pod slice. Both
hosts must produce identical results, and those must match the
single-process sweep over the same dataset.
"""

import json
import os
import socket
import subprocess
import sys

import numpy as np
import pytest

pytestmark = pytest.mark.slow  # every test spawns 2-process gloo children

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_host_slice_records_partition():
    from tpu_reid.parallel.multihost import host_slice_records

    records = [(f"p{i}", i, i % 5, 0, i) for i in range(13)]
    B, nproc = 6, 3
    per_host = B // nproc
    slices = [host_slice_records(records, B, p, nproc) for p in range(nproc)]
    n_valid, nb = slices[0][1], slices[0][2]
    assert n_valid == 13 and nb == 3
    assert all(s[1:] == (n_valid, nb) for s in slices)
    # reassembling the per-host streams in mesh order must reproduce the
    # wrap-around-padded global order
    padded = records + records[: nb * B - len(records)]
    rebuilt = [None] * (nb * B)
    for p, (host_records, _, _) in enumerate(slices):
        assert len(host_records) == nb * per_host
        for i in range(nb):
            for j in range(per_host):
                rebuilt[i * B + p * per_host + j] = host_records[
                    i * per_host + j
                ]
    assert rebuilt == padded


def test_host_slice_records_exact_fit():
    from tpu_reid.parallel.multihost import host_slice_records

    records = list(range(8))
    h0, n, nb = host_slice_records(records, 4, 0, 2)
    h1, _, _ = host_slice_records(records, 4, 1, 2)
    assert (n, nb) == (8, 2)
    assert h0 == [0, 1, 4, 5] and h1 == [2, 3, 6, 7]


@pytest.fixture(scope="module")
def assets(tmp_path_factory):
    """Market-1501-layout synthetic dataset + tiny CLIP checkpoint."""
    import torch
    from PIL import Image

    import tests.torch_oracle as oracle
    from tpu_reid.models.tokenizer import write_test_merges

    root = tmp_path_factory.mktemp("mh")
    base = root / "Market1501"
    rng = np.random.RandomState(0)
    for sub in ("bounding_box_train", "query", "bounding_box_test"):
        (base / sub).mkdir(parents=True)
    # train: 4 ids x 6 images (enough for the PK sampler at bs 8 / K 4)
    for pid, cam in [(1, 1), (2, 2), (3, 3), (4, 1)]:
        for k in range(6):
            Image.fromarray(
                rng.randint(0, 255, (64, 32, 3), np.uint8)
            ).save(
                base / "bounding_box_train"
                / f"{pid:04d}_c{cam}s1_{k:06d}_00.jpg"
            )
    for pid, cam in [(1, 1), (2, 2), (3, 3)]:
        Image.fromarray(
            rng.randint(0, 255, (64, 32, 3), np.uint8)
        ).save(base / "query" / f"{pid:04d}_c2s1_000000_00.jpg")
        # 3 gallery images per id -> 9 total: NOT a multiple of the global
        # batch 4, so the wrap-around padding path is exercised
        for k in range(3):
            Image.fromarray(
                rng.randint(0, 255, (64, 32, 3), np.uint8)
            ).save(
                base / "bounding_box_test"
                / f"{pid:04d}_c{1 + (k + pid) % 3}s1_{k:06d}_00.jpg"
            )

    sd = oracle.make_clip_state_dict(
        np.random.RandomState(1), vision_width=64, vision_layers=2, patch=8,
        grid=4, text_width=128, text_layers=2, vocab=520, context=77,
        embed_dim=32,
    )
    ckpt = str(root / "tiny_clip.pth")
    torch.save({k: torch.from_numpy(v) for k, v in sd.items()}, ckpt)
    merges = str(root / "merges.txt.gz")
    write_test_merges(merges, [("p", "h"), ("ph", "o"), ("o", "f</w>")])
    return {"root": str(root), "ckpt": ckpt, "merges": merges}


def _cli_argv(assets, extra):
    return [
        "--root", assets["root"],
        "--model_path", assets["ckpt"],
        "--bpe_path", assets["merges"],
        "--height", "32", "--stride", "8", "--bs", "4",
        "--test_dataset", "market1501",
    ] + extra


def _clean_env(n_local_devices):
    """Subprocess env with its own n-device CPU backend — free of this
    pytest process's jax state and of any accelerator plugin."""
    env = {
        k: v for k, v in os.environ.items()
        if not k.startswith(("AXON", "PALLAS_AXON", "TPU_", "_AXON"))
    }
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = (
        f"--xla_force_host_platform_device_count={n_local_devices}"
    )
    env["PYTHONPATH"] = os.pathsep.join(
        [REPO] + [
            p for p in env.get("PYTHONPATH", "").split(os.pathsep)
            if p and os.path.basename(p.rstrip("/")) != ".axon_site"
        ]
    )
    return env


def _spawn_host(assets, port, host_id, n_hosts, log_dir, n_local_devices=2):
    env = _clean_env(n_local_devices)
    cmd = [sys.executable, "-m", "tpu_reid.cli.zero_shot"] + _cli_argv(
        assets,
        ["--multihost", f"127.0.0.1:{port}",
         "--num_hosts", str(n_hosts), "--host_id", str(host_id),
         "--log_dir", log_dir],
    )
    return subprocess.Popen(
        cmd, env=env, cwd=REPO,
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
    )


def _result_of(log_dir):
    with open(os.path.join(log_dir, "metrics.jsonl")) as fh:
        events = [json.loads(line) for line in fh]
    results = [e for e in events if e["event"] == "result"]
    assert len(results) == 1
    return results[0]


def _free_port():
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def test_multihost_cli_matches_single_process(assets, tmp_path, monkeypatch):
    port = _free_port()
    logs = [str(tmp_path / f"host{i}") for i in range(2)]
    procs = [_spawn_host(assets, port, i, 2, logs[i]) for i in range(2)]
    outs = []
    try:
        for p in procs:
            out, _ = p.communicate(timeout=900)
            outs.append(out)
    finally:
        for p in procs:
            if p.poll() is None:
                p.kill()
    for p, out in zip(procs, outs):
        assert p.returncode == 0, f"host process failed:\n{out[-4000:]}"

    r0, r1 = _result_of(logs[0]), _result_of(logs[1])
    # every host computes the tail on the same all-gathered features
    for key in ("mAP", "rank1", "rank5", "rank10", "mINP"):
        assert r0[key] == r1[key], (key, r0, r1)
    assert r0["host"] == 0 and r1["host"] == 1

    # single-process reference sweep (this pytest process's 8-device CPU
    # backend, no mesh) over the same dataset + checkpoint
    from tpu_reid.cli import zero_shot as cli

    monkeypatch.setattr(sys, "argv", ["zero_shot"] + _cli_argv(assets, []))
    cmc, mAP = cli.main()
    assert abs(r0["mAP"] - float(mAP)) < 1e-5, (r0["mAP"], float(mAP))
    assert abs(r0["rank1"] - float(cmc[0])) < 1e-5


def _train_argv(assets, save_path, extra):
    return [
        "--root", assets["root"],
        "--model_path", assets["ckpt"],
        "--bpe_path", assets["merges"],
        "--height", "32", "--stride", "8", "--bs", "8",
        "--epochs_stage1", "1", "--epochs_stage2", "1",
        "--training_mode", "coop",
        "--save_path", save_path,
    ] + extra


def test_multihost_training_cli_matches_single_process(
    assets, tmp_path, monkeypatch
):
    """The FULL two-stage prompt-learning CLI over a 2-process mesh:
    cached stage-1 (multi-host feature precompute), stage-2 (cross-process
    gradient psum), orbax multihost checkpointing into ONE shared
    directory, and the all-gathered final evaluation — must reproduce the
    single-process --devices 4 run."""
    port = _free_port()
    logs = [str(tmp_path / f"train_h{i}") for i in range(2)]
    save = str(tmp_path / "ckpt_mh")
    env = _clean_env(2)
    procs = []
    for hid in range(2):
        cmd = [sys.executable, "-m", "tpu_reid.cli.prompt_learning"]
        cmd += _train_argv(assets, save, [
            "--multihost", f"127.0.0.1:{port}",
            "--num_hosts", "2", "--host_id", str(hid),
            "--log_dir", logs[hid],
        ])
        procs.append(subprocess.Popen(
            cmd, env=env, cwd=REPO,
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
        ))
    outs = []
    try:
        for p in procs:
            out, _ = p.communicate(timeout=1200)
            outs.append(out)
    finally:
        for p in procs:
            if p.poll() is None:
                p.kill()
    for p, out in zip(procs, outs):
        assert p.returncode == 0, f"training host failed:\n{out[-5000:]}"

    r0, r1 = _result_of(logs[0]), _result_of(logs[1])
    for key in ("mAP", "rank1", "rank5", "rank10", "mINP"):
        assert r0[key] == r1[key], (key, r0, r1)

    # single-process reference: --devices 4 = the same data-axis width
    from tpu_reid.cli import prompt_learning as cli

    monkeypatch.setattr(
        sys, "argv",
        ["prompt_learning"] + _train_argv(
            assets, str(tmp_path / "ckpt_sp"), ["--devices", "4"]
        ),
    )
    cmc, mAP = cli.main()
    assert abs(r0["mAP"] - float(mAP)) < 1e-5, (r0["mAP"], float(mAP))
    assert abs(r0["rank1"] - float(cmc[0])) < 1e-5


@pytest.fixture(scope="module")
def mt_assets(tmp_path_factory):
    """Market + Duke layouts + tiny checkpoint for the multitask CLI."""
    import torch
    from PIL import Image

    import tests.torch_oracle as oracle
    from tpu_reid.models.tokenizer import write_test_merges

    root = tmp_path_factory.mktemp("mh_mt")
    rng = np.random.RandomState(0)
    for name in ("Market1501", "DukeMTMC-reID"):
        base = root / name
        for sub in ("bounding_box_train", "query", "bounding_box_test"):
            (base / sub).mkdir(parents=True)
        for pid, cam, n in [(1, 1, 4), (2, 2, 4)]:
            for k in range(n):
                Image.fromarray(
                    rng.randint(0, 255, (64, 32, 3), np.uint8)
                ).save(
                    base / "bounding_box_train"
                    / f"{pid:04d}_c{cam}s1_{k:06d}_00.jpg"
                )
        for pid in (1, 2):
            Image.fromarray(
                rng.randint(0, 255, (64, 32, 3), np.uint8)
            ).save(base / "query" / f"{pid:04d}_c2s1_000000_00.jpg")
            for k in range(2):
                Image.fromarray(
                    rng.randint(0, 255, (64, 32, 3), np.uint8)
                ).save(
                    base / "bounding_box_test"
                    / f"{pid:04d}_c{1 + k}s1_{k:06d}_00.jpg"
                )
    sd = oracle.make_clip_state_dict(
        np.random.RandomState(1), vision_width=64, vision_layers=2, patch=8,
        grid=4, text_width=128, text_layers=2, vocab=520, context=77,
        embed_dim=32,
    )
    ckpt = str(root / "tiny.pth")
    torch.save({k: torch.from_numpy(v) for k, v in sd.items()}, ckpt)
    merges = str(root / "m.gz")
    write_test_merges(merges, [("p", "h"), ("ph", "o")])
    return {"root": str(root), "ckpt": ckpt, "merges": merges}


def _mt_argv(mt_assets, save_path, extra):
    return [
        "--root", mt_assets["root"],
        "--model_path", mt_assets["ckpt"],
        "--bpe_path", mt_assets["merges"],
        "--variant", "hard", "--height", "32", "--stride", "8",
        "--bs", "8", "--epochs_stage1", "1", "--epochs_stage2", "1",
        "--save_path", save_path,
    ] + extra


def test_multihost_multitask_cli_matches_single_process(
    mt_assets, tmp_path, monkeypatch
):
    """The multitask hard-sharing CLI (dual prompt learners, per-task
    heads, XBM state threading) over a 2-process mesh reproduces the
    single-process --devices 4 run."""
    port = _free_port()
    logs = [str(tmp_path / f"mt_h{i}") for i in range(2)]
    save = str(tmp_path / "ck_mh")
    env = _clean_env(2)
    procs = []
    for hid in range(2):
        cmd = [sys.executable, "-m", "tpu_reid.cli.multitask"]
        cmd += _mt_argv(mt_assets, save, [
            "--multihost", f"127.0.0.1:{port}",
            "--num_hosts", "2", "--host_id", str(hid),
            "--log_dir", logs[hid],
        ])
        procs.append(subprocess.Popen(
            cmd, env=env, cwd=REPO,
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
        ))
    outs = []
    try:
        for p in procs:
            out, _ = p.communicate(timeout=1200)
            outs.append(out)
    finally:
        for p in procs:
            if p.poll() is None:
                p.kill()
    for p, out in zip(procs, outs):
        assert p.returncode == 0, f"multitask host failed:\n{out[-5000:]}"

    r0, r1 = _result_of(logs[0]), _result_of(logs[1])
    for key in ("mAP", "rank1", "mINP"):
        assert r0[key] == r1[key], (key, r0, r1)

    from tpu_reid.cli import multitask as cli

    monkeypatch.setattr(
        sys, "argv",
        ["multitask"] + _mt_argv(
            mt_assets, str(tmp_path / "ck_sp"), ["--devices", "4"]
        ),
    )
    cmc, mAP = cli.main()
    assert abs(r0["mAP"] - float(mAP)) < 1e-5, (r0["mAP"], float(mAP))


def test_multihost_training_matches_single_process(tmp_path):
    """2-process training parity: stage-2 (3 steps) + live stage-1 of the
    tiny flagship over a 2x2-device process-spanning mesh must reproduce
    the single-process 4-device mesh loss trajectory — the cross-process
    gradient psum (ICI within a host, DCN across) must not change the
    math."""
    port = _free_port()
    outs = [str(tmp_path / f"loss{i}.json") for i in range(2)]
    child = os.path.join(REPO, "tests", "_mh_train_child.py")
    env = _clean_env(2)
    procs = [
        subprocess.Popen(
            [sys.executable, child, str(i), "2", str(port), outs[i]],
            env=env, cwd=REPO,
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
        )
        for i in range(2)
    ]
    texts = []
    try:
        for p in procs:
            out, _ = p.communicate(timeout=900)
            texts.append(out)
    finally:
        for p in procs:
            if p.poll() is None:
                p.kill()
    for p, out in zip(procs, texts):
        assert p.returncode == 0, f"training child failed:\n{out[-4000:]}"

    with open(outs[0]) as fh:
        l0 = json.load(fh)
    with open(outs[1]) as fh:
        l1 = json.load(fh)
    assert l0 == l1, (l0, l1)  # every process sees the same global loss

    # single-process reference over a 4-device mesh (same global devices)
    import jax

    from tests._mh_train_child import run
    from tpu_reid.parallel.mesh import make_mesh, replicate, shard_batch

    mesh = make_mesh(devices=jax.devices()[:4])
    ref = run(
        mesh,
        lambda t: shard_batch(mesh, t),
        lambda t: replicate(mesh, t),
        1,
    )
    np.testing.assert_allclose(l0, ref, rtol=1e-5, atol=1e-6)
