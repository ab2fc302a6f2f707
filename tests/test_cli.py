"""End-to-end CLI tests: zero-shot eval and two-stage prompt learning on a
synthetic Market-1501-layout dataset with a tiny random CLIP checkpoint."""

import os
import sys

import numpy as np
import pytest

import tests.torch_oracle as oracle

pytestmark = pytest.mark.slow  # CLI e2e runs; one smoke stays fast


@pytest.fixture(scope="module")
def assets(tmp_path_factory):
    """Synthetic dataset + checkpoint + merges + attributes."""
    from PIL import Image

    from tpu_reid.models.tokenizer import write_test_merges

    root = tmp_path_factory.mktemp("cli")
    base = root / "Market1501"
    rng = np.random.RandomState(0)
    for sub in ("bounding_box_train", "query", "bounding_box_test"):
        (base / sub).mkdir(parents=True)
    i = 0
    for pid, cam, n in [(1, 1, 6), (2, 2, 6), (3, 3, 6), (4, 1, 6)]:
        for k in range(n):
            Image.fromarray(
                rng.randint(0, 255, (64, 32, 3), np.uint8)
            ).save(base / "bounding_box_train" / f"{pid:04d}_c{cam}s1_{k:06d}_00.jpg")
            i += 1
    for pid in (1, 2, 3):
        Image.fromarray(
            rng.randint(0, 255, (64, 32, 3), np.uint8)
        ).save(base / "query" / f"{pid:04d}_c2s1_{0:06d}_00.jpg")
        for k in range(3):
            Image.fromarray(
                rng.randint(0, 255, (64, 32, 3), np.uint8)
            ).save(base / "bounding_box_test" / f"{pid:04d}_c{1 + k % 3}s1_{k:06d}_00.jpg")

    # tiny CLIP checkpoint in torch format
    import torch

    sd = oracle.make_clip_state_dict(
        np.random.RandomState(1), vision_width=64, vision_layers=2, patch=8,
        grid=4, text_width=128, text_layers=2, vocab=520, context=77,
        embed_dim=32,
    )
    ckpt = str(root / "tiny_clip.pth")
    torch.save({k: torch.from_numpy(v) for k, v in sd.items()}, ckpt)

    merges = str(root / "merges.txt.gz")
    write_test_merges(merges, [("p", "h"), ("ph", "o"), ("o", "f</w>")])

    # attribute mat with 3 identities named 0001..0003
    from scipy import io as sio

    n = 3
    rows = {}
    names10 = ["age", "backpack", "bag", "handbag", "clothes", "down", "up",
               "hair", "hat", "gender"]
    for nm in names10:
        rows[nm] = [[1 + (j % 2) for j in range(n)]]
    for c in range(8):
        rows[f"up{c}"] = [[1 for _ in range(n)]]
    for c in range(9):
        rows[f"down{c}"] = [[1 for _ in range(n)]]
    idx_cell = np.empty((1, n), object)
    for j in range(n):
        idx_cell[0, j] = np.array([f"{j + 1:04d}"])
    rows["image_index"] = [idx_cell]
    split = np.array([tuple(rows[k] for k in rows)],
                     dtype=[(k, object) for k in rows])
    mat = np.array([[(split,)]], dtype=[("train", object)])
    attr = str(root / "market_attribute.mat")
    sio.savemat(attr, {"market_attribute": mat})

    return {"root": str(root), "ckpt": ckpt, "merges": merges, "attr": attr}


@pytest.mark.fast
def test_zero_shot_cli(assets, monkeypatch):
    from tpu_reid.cli import zero_shot as cli

    monkeypatch.setattr(
        sys, "argv",
        ["zero_shot",
         "--root", assets["root"],
         "--model_path", assets["ckpt"],
         "--bpe_path", assets["merges"],
         "--attributes", assets["attr"],
         "--height", "32", "--stride", "8", "--bs", "4",
         "--test_dataset", "market1501"],
    )
    cmc, mAP = cli.main()
    assert 0.0 <= mAP <= 1.0
    assert cmc.shape[0] == 9  # gallery has 9 images (< max_rank)


def test_zero_shot_cli_fast_softmax(assets, monkeypatch):
    """--fast_softmax (production surface for the throughput softmax
    profile) runs end to end and lands within a bounded retrieval-quality
    delta of the exact path on the same workload."""
    from tpu_reid.cli import zero_shot as cli
    from tpu_reid.ops import attention as A

    argv = ["zero_shot",
            "--root", assets["root"],
            "--model_path", assets["ckpt"],
            "--bpe_path", assets["merges"],
            "--attributes", assets["attr"],
            "--height", "32", "--stride", "8", "--bs", "4",
            "--test_dataset", "market1501"]
    monkeypatch.setattr(sys, "argv", argv)
    _, mAP_exact = cli.main()
    monkeypatch.setattr(sys, "argv", argv + ["--fast_softmax"])
    try:
        _, mAP_fast = cli.main()
    finally:
        A.set_fast_softmax(False)  # module-global: don't leak into others
    # bf16-prob softmax on a random tiny tower: retrieval quality must not
    # move materially (full-scale measured delta recorded in BASELINE.md)
    assert abs(float(mAP_fast) - float(mAP_exact)) < 0.02


def test_zero_shot_cli_mm_augmented(assets, monkeypatch):
    from tpu_reid.cli import zero_shot as cli

    monkeypatch.setattr(
        sys, "argv",
        ["zero_shot",
         "--root", assets["root"],
         "--model_path", assets["ckpt"],
         "--bpe_path", assets["merges"],
         "--attributes", assets["attr"],
         "--augmented_template", "--mm",
         "--height", "32", "--stride", "8", "--bs", "4"],
    )
    cmc, mAP = cli.main()
    assert 0.0 <= mAP <= 1.0


@pytest.mark.parametrize("mode", ["coop", "ivlp", "adapter", "maple"])
def test_prompt_learning_cli(assets, monkeypatch, tmp_path, mode):
    from tpu_reid.cli import prompt_learning as cli

    monkeypatch.setattr(
        sys, "argv",
        ["prompt_learning",
         "--root", assets["root"],
         "--model_path", assets["ckpt"],
         "--bpe_path", assets["merges"],
         "--height", "32", "--stride", "8", "--bs", "8",
         "--epochs_stage1", "1", "--epochs_stage2", "1",
         "--training_mode", mode,
         "--save_path", str(tmp_path / "ckpts")],
    )
    cmc, mAP = cli.main()
    assert 0.0 <= mAP <= 1.0
    # checkpoints written
    ckdir = tmp_path / "ckpts" / mode / "market1501"
    assert ckdir.exists() and any(ckdir.iterdir())


def test_prompt_learning_resume(assets, monkeypatch, tmp_path):
    """--resume restores the newest stage checkpoint and skips training."""
    from tpu_reid.cli import prompt_learning as cli

    argv = [
        "prompt_learning",
        "--root", assets["root"],
        "--model_path", assets["ckpt"],
        "--bpe_path", assets["merges"],
        "--height", "32", "--stride", "8", "--bs", "8",
        "--epochs_stage1", "1", "--epochs_stage2", "1",
        "--training_mode", "coop",
        "--save_path", str(tmp_path / "ck"),
    ]
    monkeypatch.setattr(sys, "argv", argv)
    cmc1, mAP1 = cli.main()
    # resume: both stages already complete -> no retraining, same result
    monkeypatch.setattr(sys, "argv", argv + ["--resume"])
    cmc2, mAP2 = cli.main()
    assert abs(mAP1 - mAP2) < 1e-5


def test_zero_shot_cli_rn50(assets, monkeypatch, tmp_path):
    """RN50 checkpoint end to end: shape-inferred ModifiedResNet tower."""
    import torch

    from tpu_reid.cli import zero_shot as cli

    sd = oracle.make_rn50_state_dict(np.random.RandomState(7))
    ckpt = str(tmp_path / "tiny_rn50.pth")
    torch.save({k: torch.from_numpy(v) for k, v in sd.items()}, ckpt)
    monkeypatch.setattr(
        sys, "argv",
        ["zero_shot",
         "--root", assets["root"],
         "--model_path", ckpt,
         "--bpe_path", assets["merges"],
         "--attributes", assets["attr"],
         "--height", "64", "--bs", "4"],
    )
    cmc, mAP = cli.main()
    assert 0.0 <= mAP <= 1.0


def test_prompt_learning_cli_bf16(assets, monkeypatch, tmp_path):
    """--dtype bf16: training runs with bf16 activations (fp32 master
    params), the TPU analog of the reference's fp16 AMP
    (prompt_learning.py:404,450-453)."""
    from tpu_reid.cli import prompt_learning as cli

    monkeypatch.setattr(
        sys, "argv",
        ["prompt_learning",
         "--root", assets["root"],
         "--model_path", assets["ckpt"],
         "--bpe_path", assets["merges"],
         "--height", "32", "--stride", "8", "--bs", "8",
         "--epochs_stage1", "1", "--epochs_stage2", "1",
         "--training_mode", "ivlp", "--dtype", "bf16",
         "--save_path", str(tmp_path / "ckpts")],
    )
    cmc, mAP = cli.main()
    assert 0.0 <= mAP <= 1.0


def test_prompt_learning_cli_captions(assets, monkeypatch, tmp_path):
    """--captions_file: two-stage training with per-identity GPT-4o-style
    caption prompts — the VLPromptLearnerGPT4o capability the reference
    defines but never wires into any entry point (reference:
    maple.py:93-169)."""
    from tpu_reid.cli import prompt_learning as cli

    caps = tmp_path / "prompts_market1501.txt"
    caps.write_text(
        "\n".join(
            f"{i}: A photo of a person wearing outfit number {i} with "
            f"distinctive style {i}."
            for i in range(4)  # 4 train identities in the fixture
        )
    )
    monkeypatch.setattr(
        sys, "argv",
        ["prompt_learning",
         "--root", assets["root"],
         "--model_path", assets["ckpt"],
         "--bpe_path", assets["merges"],
         "--height", "32", "--stride", "8", "--bs", "8",
         "--epochs_stage1", "1", "--epochs_stage2", "1",
         "--training_mode", "ivlp",
         "--captions_file", str(caps),
         "--save_path", str(tmp_path / "ckpts")],
    )
    cmc, mAP = cli.main()
    assert 0.0 <= mAP <= 1.0


def test_prompt_learning_cli_augmented_prompts(assets, monkeypatch, tmp_path):
    """--augmented_prompts: 4 article-variant templates with shared
    per-class ctx, text features mean-pooled over the template axis — the
    PromptLearnerAugmented/TextEncoderAugmented pair the reference defines
    (coop.py:12-59, text_encoder.py:27-53) but never instantiates."""
    from tpu_reid.cli import prompt_learning as cli

    monkeypatch.setattr(
        sys, "argv",
        ["prompt_learning",
         "--root", assets["root"],
         "--model_path", assets["ckpt"],
         "--bpe_path", assets["merges"],
         "--height", "32", "--stride", "8", "--bs", "8",
         "--epochs_stage1", "1", "--epochs_stage2", "1",
         "--training_mode", "coop", "--augmented_prompts",
         "--save_path", str(tmp_path / "ckpts")],
    )
    cmc, mAP = cli.main()
    assert 0.0 <= mAP <= 1.0


def test_prompt_learning_cli_eval_every(assets, monkeypatch, tmp_path):
    """--eval_every N: full retrieval evaluation mid-training (stage 2),
    recorded in the JSONL metric log — training-time evaluation cadence
    the reference lacks (it evaluates only once, at the end)."""
    import json

    from tpu_reid.cli import prompt_learning as cli

    log_dir = tmp_path / "logs"
    monkeypatch.setattr(
        sys, "argv",
        ["prompt_learning",
         "--root", assets["root"],
         "--model_path", assets["ckpt"],
         "--bpe_path", assets["merges"],
         "--height", "32", "--stride", "8", "--bs", "8",
         "--epochs_stage1", "1", "--epochs_stage2", "2",
         "--training_mode", "coop", "--eval_every", "1", "--keep_best",
         "--log_dir", str(log_dir),
         "--save_path", str(tmp_path / "ckpts")],
    )
    cmc, mAP = cli.main()
    assert 0.0 <= mAP <= 1.0
    recs = [json.loads(ln) for ln in
            (log_dir / "metrics.jsonl").read_text().splitlines()]
    evals = [r for r in recs if r["event"] == "eval"]
    # epoch 1 of 2 evaluates mid-training; epoch 2 is the final test pass
    assert [e["stage2_epoch"] for e in evals] == [1]
    assert 0.0 <= evals[0]["mAP"] <= 1.0 and 0.0 <= evals[0]["mINP"] <= 1.0
    # --keep_best: the best-mAP params live under .../best and carry the
    # winning epoch + mAP
    bests = [r for r in recs if r["event"] == "best"]
    assert bests and bests[-1]["mAP"] == max(
        [e["mAP"] for e in evals] + [mAP]
    )
    from tpu_reid.runtime.checkpoint import CheckpointManager

    bmgr = CheckpointManager(
        str(tmp_path / "ckpts" / "coop" / "market1501" / "best"),
        save_interval=1,
    )
    payload = bmgr.restore()
    assert abs(payload["mAP"] - bests[-1]["mAP"]) < 1e-9
    assert "params" in payload
    bmgr.close()


def test_prompt_learning_cli_jpm(assets, monkeypatch, tmp_path):
    """--jpm: two-stage training + eval with the TransReID jigsaw-patch
    branch wired in as a 4th feature level (the reference defines the JPM
    tower but never wires it into an entry point; reference:
    coop.py:230-277, jpm.py)."""
    from tpu_reid.cli import prompt_learning as cli

    monkeypatch.setattr(
        sys, "argv",
        ["prompt_learning",
         "--root", assets["root"],
         "--model_path", assets["ckpt"],
         "--bpe_path", assets["merges"],
         "--height", "32", "--stride", "8", "--bs", "8",
         "--epochs_stage1", "1", "--epochs_stage2", "1",
         "--training_mode", "coop", "--jpm",
         "--save_path", str(tmp_path / "ckpts")],
    )
    cmc, mAP = cli.main()
    assert 0.0 <= mAP <= 1.0


def test_prompt_learning_cli_sie(assets, monkeypatch, tmp_path):
    """--sie_camera --sie_view: camera-x-viewpoint SIE embedding through
    the live (ivlp) stage-1 path, stage 2 and SIE-aware eval extraction
    (the cv_emb hook every reference tower accepts but never feeds,
    coop.py:210-211)."""
    from tpu_reid.cli import prompt_learning as cli

    monkeypatch.setattr(
        sys, "argv",
        ["prompt_learning",
         "--root", assets["root"],
         "--model_path", assets["ckpt"],
         "--bpe_path", assets["merges"],
         "--height", "32", "--stride", "8", "--bs", "8",
         "--epochs_stage1", "1", "--epochs_stage2", "1",
         "--training_mode", "ivlp", "--sie_camera", "--sie_view",
         "--sie_coe", "2.0",
         "--save_path", str(tmp_path / "ckpts")],
    )
    cmc, mAP = cli.main()
    assert 0.0 <= mAP <= 1.0


def test_prompt_learning_cli_sie_mesh(assets, monkeypatch, tmp_path):
    """--sie_camera with --devices 2: camera ids shard over the mesh in the
    cached (coop) stage-1 precompute, the stage-2 step and extraction."""
    from tpu_reid.cli import prompt_learning as cli

    monkeypatch.setattr(
        sys, "argv",
        ["prompt_learning",
         "--root", assets["root"],
         "--model_path", assets["ckpt"],
         "--bpe_path", assets["merges"],
         "--height", "32", "--stride", "8", "--bs", "8",
         "--epochs_stage1", "1", "--epochs_stage2", "1",
         "--training_mode", "coop", "--sie_camera", "--devices", "2",
         "--save_path", str(tmp_path / "ckpts")],
    )
    cmc, mAP = cli.main()
    assert 0.0 <= mAP <= 1.0


def test_prompt_learning_promptsrc_metaclip_teacher(assets, monkeypatch,
                                                    tmp_path):
    """promptsrc with --zs_weights: the frozen ZS teacher loads from a
    SEPARATE HF-layout .bin checkpoint (the reference's MetaCLIP teacher
    intent, prompt_learning.py:695) and actually changes the distill
    target vs the default copy-of-student teacher."""
    import numpy as np
    import torch

    import tests.torch_oracle as oracle
    from tpu_reid.cli import prompt_learning as cli

    # a second, different checkpoint in HF .bin layout (same architecture)
    sd2 = oracle.make_clip_state_dict(
        np.random.RandomState(7), vision_width=64, vision_layers=2, patch=8,
        grid=4, text_width=128, text_layers=2, vocab=520, context=77,
        embed_dim=32,
    )
    teacher = str(tmp_path / "metaclip_teacher.bin")
    torch.save({k: torch.from_numpy(v) for k, v in sd2.items()}, teacher)

    argv = ["prompt_learning",
            "--root", assets["root"],
            "--model_path", assets["ckpt"],
            "--bpe_path", assets["merges"],
            "--height", "32", "--stride", "8", "--bs", "8",
            "--epochs_stage1", "1", "--epochs_stage2", "1",
            "--training_mode", "promptsrc",
            "--zs_weights", teacher,
            "--save_path", str(tmp_path / "ckpts")]
    monkeypatch.setattr(sys, "argv", argv)
    cmc, mAP = cli.main()
    assert 0.0 <= mAP <= 1.0

    # the teacher tower really is the second checkpoint, not a student copy
    from tpu_reid.data.datasets import get_dataset

    n_cls = get_dataset(assets["root"], "market1501").num_train_pids
    mcfg, params, _ = cli.build_model(
        type("A", (), {
            "height": 32, "ratio": 0.5, "stride": 8, "vpt_ctx": 2,
            "training_mode": "promptsrc", "model_path": assets["ckpt"],
            "bpe_path": assets["merges"], "pretrained_vpt": None,
            "zs_weights": teacher, "train_dataset": "market1501",
            "seed": 0,
        })(), n_cls)
    assert not np.allclose(
        np.asarray(params["zs_visual"]["proj"]),
        np.asarray(params["clip"]["visual"]["proj"]),
    )


def test_zero_shot_cli_devices(assets, monkeypatch):
    """--devices 8: extraction runs through shard_map over the 8-device
    mesh (conftest CPU mesh) end to end; the batch is padded+masked across
    devices (gallery of 9 does not divide 8)."""
    from tpu_reid.cli import zero_shot as cli

    monkeypatch.setattr(
        sys, "argv",
        ["zero_shot",
         "--root", assets["root"],
         "--model_path", assets["ckpt"],
         "--bpe_path", assets["merges"],
         "--attributes", assets["attr"],
         "--height", "32", "--stride", "8", "--bs", "8",
         "--devices", "8",
         "--test_dataset", "market1501"],
    )
    cmc, mAP = cli.main()
    assert 0.0 <= mAP <= 1.0
    assert cmc.shape[0] == 9


def test_prompt_learning_cli_devices(assets, monkeypatch, tmp_path):
    """--devices 8: both training stages (sharded-jit steps, gradient psum
    from shardings) and the extraction sweep run over the mesh in one CLI
    invocation."""
    from tpu_reid.cli import prompt_learning as cli

    monkeypatch.setattr(
        sys, "argv",
        ["prompt_learning",
         "--root", assets["root"],
         "--model_path", assets["ckpt"],
         "--bpe_path", assets["merges"],
         "--height", "32", "--stride", "8", "--bs", "8",
         "--devices", "8",
         "--epochs_stage1", "1", "--epochs_stage2", "1",
         "--training_mode", "coop",
         "--save_path", str(tmp_path / "ckpts")],
    )
    cmc, mAP = cli.main()
    assert 0.0 <= mAP <= 1.0


def test_prompt_learning_cli_veri(assets, monkeypatch, tmp_path):
    """Vehicle family e2e: VeRi parser (keypoint views + gb2312 type XML),
    car-type-conditioned per-class prompts (VLPromptLearnerVeri geometry,
    selected automatically for --train_dataset veri) through both training
    stages and eval."""
    from tpu_reid.tools.synth_market import write_images_veri

    write_images_veri(
        str(tmp_path / "VeRi"), np.random.RandomState(0),
        n_train_ids=2, n_test_ids=2, n_query=4, n_gallery=8, hw=(64, 32),
    )

    from tpu_reid.cli import prompt_learning as cli

    monkeypatch.setattr(
        sys, "argv",
        ["prompt_learning",
         "--root", str(tmp_path),
         "--model_path", assets["ckpt"],
         "--bpe_path", assets["merges"],
         "--height", "32", "--ratio", "1.0", "--stride", "8", "--bs", "8",
         "--epochs_stage1", "1", "--epochs_stage2", "1",
         "--training_mode", "ivlp",
         "--train_dataset", "veri",
         "--save_path", str(tmp_path / "ckpts")],
    )
    cmc, mAP = cli.main()
    assert 0.0 <= mAP <= 1.0


def test_zero_shot_cli_tp(assets, monkeypatch, tmp_path):
    """--devices 4 --tp 2: 2-D-parallel extraction — batch over 'data',
    ViT attention heads + MLP hidden over 'model' (parallel/tp.py) — and
    the result must match the plain single-device run exactly."""
    import torch

    # 2 heads so the tower splits over model=2 (width 128 -> heads 2)
    sd = oracle.make_clip_state_dict(
        np.random.RandomState(5), vision_width=128, vision_layers=2,
        patch=8, grid=4, text_width=128, text_layers=2, vocab=520,
        context=77, embed_dim=32,
    )
    ckpt = str(tmp_path / "tiny_2h.pth")
    torch.save({k: torch.from_numpy(v) for k, v in sd.items()}, ckpt)

    from tpu_reid.cli import zero_shot as cli

    argv = [
        "zero_shot",
        "--root", assets["root"],
        "--model_path", ckpt,
        "--bpe_path", assets["merges"],
        "--attributes", assets["attr"],
        "--height", "32", "--stride", "8", "--bs", "8",
        "--test_dataset", "market1501",
    ]
    monkeypatch.setattr(sys, "argv", argv)
    cmc_plain, map_plain = cli.main()
    monkeypatch.setattr(sys, "argv", argv + ["--devices", "4", "--tp", "2"])
    cmc_tp, map_tp = cli.main()
    np.testing.assert_allclose(cmc_tp, cmc_plain, atol=1e-5)
    assert abs(map_tp - map_plain) < 1e-5


def test_zero_shot_cli_vehicleid_personx_msmt17v1(assets, monkeypatch, tmp_path):
    """Remaining dataset families end to end through the zero-shot CLI:
    VehicleID (seeded one-random-gallery-image-per-id protocol), PersonX
    (three rendered-view subsets), MSMT17-V1 (glob-driven, query==gallery
    per the reference's V1 class, dataset_msmt17.py:110-112)."""
    from PIL import Image

    from tpu_reid.tools.synth_market import (
        write_images_personx, write_images_vehicleid,
    )

    rng = np.random.RandomState(0)
    write_images_vehicleid(
        str(tmp_path / "VehicleID_V1.0"), rng,
        n_train_ids=2, n_test_ids=3, n_query=6, n_gallery=3, hw=(64, 32),
    )
    write_images_personx(
        str(tmp_path / "PersonX_v1"), rng,
        n_train_ids=2, n_test_ids=2, n_query=4, n_gallery=6, hw=(64, 32),
    )
    v1 = tmp_path / "MSMT17_V1"
    for sub in ("bounding_box_train", "bounding_box_test"):
        (v1 / sub).mkdir(parents=True)
    for pid in (1, 2):
        for k in range(3):
            Image.fromarray(
                rng.randint(0, 255, (64, 32, 3), np.uint8)
            ).save(v1 / "bounding_box_train" / f"{pid:04d}_c{1 + k}_{k:06d}.jpg")
            Image.fromarray(
                rng.randint(0, 255, (64, 32, 3), np.uint8)
            ).save(v1 / "bounding_box_test" / f"{pid:04d}_c{1 + k}_{k:06d}.jpg")

    from tpu_reid.cli import zero_shot as cli

    for ds in ("vehicleid", "personx", "msmt17_v1"):
        monkeypatch.setattr(
            sys, "argv",
            ["zero_shot",
             "--root", str(tmp_path),
             "--model_path", assets["ckpt"],
             "--bpe_path", assets["merges"],
             "--height", "32", "--stride", "8", "--bs", "4",
             "--test_dataset", ds],
        )
        cmc, mAP = cli.main()
        assert 0.0 <= mAP <= 1.0, ds


def test_prompt_learning_cli_devices_bf16(assets, monkeypatch, tmp_path):
    """--devices 8 + --dtype bf16: sharded training steps with bf16
    activations / fp32 master params compose."""
    from tpu_reid.cli import prompt_learning as cli

    monkeypatch.setattr(
        sys, "argv",
        ["prompt_learning",
         "--root", assets["root"],
         "--model_path", assets["ckpt"],
         "--bpe_path", assets["merges"],
         "--height", "32", "--stride", "8", "--bs", "8",
         "--devices", "8", "--dtype", "bf16",
         "--epochs_stage1", "1", "--epochs_stage2", "1",
         "--training_mode", "ivlp",
         "--save_path", str(tmp_path / "ckpts")],
    )
    cmc, mAP = cli.main()
    assert 0.0 <= mAP <= 1.0


def test_prompt_learning_cli_cache_device(assets, monkeypatch, tmp_path):
    """--cache_device: whole train split staged in device memory once,
    epochs served as on-device gathers (data/device_cache.py). Must land
    the same final metrics pipeline as the host-loader path."""
    from tpu_reid.cli import prompt_learning as cli

    monkeypatch.setattr(
        sys, "argv",
        ["prompt_learning",
         "--root", assets["root"],
         "--model_path", assets["ckpt"],
         "--bpe_path", assets["merges"],
         "--height", "32", "--stride", "8", "--bs", "8",
         "--epochs_stage1", "1", "--epochs_stage2", "1",
         "--training_mode", "coop", "--cache_device",
         "--save_path", str(tmp_path / "ckpts")],
    )
    cmc, mAP = cli.main()
    assert 0.0 <= mAP <= 1.0


def test_prompt_learning_cli_cache_device_sharded(assets, monkeypatch,
                                                  tmp_path):
    """--cache_device + --devices 8: the train split is row-sharded over
    the mesh's "data" axis and epochs serve batch-sharded on-device
    gathers into the sharded train steps (VERDICT r4 #6)."""
    from tpu_reid.cli import prompt_learning as cli

    monkeypatch.setattr(
        sys, "argv",
        ["prompt_learning",
         "--root", assets["root"],
         "--model_path", assets["ckpt"],
         "--bpe_path", assets["merges"],
         "--height", "32", "--stride", "8", "--bs", "8",
         "--devices", "8",
         "--epochs_stage1", "1", "--epochs_stage2", "1",
         "--training_mode", "coop", "--cache_device",
         "--save_path", str(tmp_path / "ckpts")],
    )
    cmc, mAP = cli.main()
    assert 0.0 <= mAP <= 1.0


def test_prompt_learning_resume_with_cache_device(assets, monkeypatch,
                                                  tmp_path):
    """--cache_device (chunked-scan epochs, live ivlp stage 1) composes
    with --resume: the resumed run restores the completed checkpoints and
    reproduces the result (r5)."""
    from tpu_reid.cli import prompt_learning as cli

    argv = [
        "prompt_learning",
        "--root", assets["root"],
        "--model_path", assets["ckpt"],
        "--bpe_path", assets["merges"],
        "--height", "32", "--stride", "8", "--bs", "8",
        "--epochs_stage1", "1", "--epochs_stage2", "1",
        "--training_mode", "ivlp", "--cache_device",
        "--save_path", str(tmp_path / "ck"),
    ]
    monkeypatch.setattr(sys, "argv", argv)
    cmc1, mAP1 = cli.main()
    monkeypatch.setattr(sys, "argv", argv + ["--resume"])
    cmc2, mAP2 = cli.main()
    assert abs(mAP1 - mAP2) < 1e-5
