"""ModifiedResNet tower + BNNeck/Adapter head tests."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from tpu_reid.configs import ResNetConfig
from tpu_reid.models import heads as H
from tpu_reid.models import resnet as R


CFG = ResNetConfig(layers=(1, 1, 1, 1), width=16, output_dim=12,
                   h_grid=4, w_grid=2)


@pytest.mark.slow
def test_resnet_shapes():
    params = R.init_resnet(jax.random.key(0), CFG)
    images = jnp.zeros((2, 64, 32, 3))
    x3, x4, xproj = R.apply_resnet(params, CFG, images)
    # stem /4, layer2 /2, layer3 /2 -> /16; layer4 stride 1 keeps /16
    assert x3.shape == (2, 4, 2, 16 * 4 * 4)
    assert x4.shape == (2, 4, 2, 16 * 8 * 4)
    assert xproj.shape == (2, 1 + 4 * 2, 12)


def test_batch_norm_matches_torch():
    import torch
    import torch.nn.functional as F

    rng = np.random.RandomState(0)
    x = rng.randn(8, 5).astype(np.float32)
    p = {
        "scale": jnp.asarray(rng.randn(5).astype(np.float32)),
        "bias": jnp.asarray(rng.randn(5).astype(np.float32)),
        "mean": jnp.asarray(rng.randn(5).astype(np.float32)),
        "var": jnp.asarray(np.abs(rng.randn(5)).astype(np.float32) + 0.5),
    }
    # inference mode
    y, _ = R.batch_norm(p, jnp.asarray(x))
    ref = F.batch_norm(
        torch.from_numpy(x),
        torch.from_numpy(np.asarray(p["mean"])),
        torch.from_numpy(np.asarray(p["var"])),
        torch.from_numpy(np.asarray(p["scale"])),
        torch.from_numpy(np.asarray(p["bias"])),
        training=False,
    ).numpy()
    np.testing.assert_allclose(np.asarray(y), ref, atol=1e-5, rtol=1e-5)

    # train mode: batch stats + torch-convention running update
    y, new = R.batch_norm(p, jnp.asarray(x), train=True)
    rm = torch.from_numpy(np.asarray(p["mean"])).clone()
    rv = torch.from_numpy(np.asarray(p["var"])).clone()
    ref = F.batch_norm(
        torch.from_numpy(x), rm, rv,
        torch.from_numpy(np.asarray(p["scale"])),
        torch.from_numpy(np.asarray(p["bias"])),
        training=True, momentum=0.1,
    ).numpy()
    np.testing.assert_allclose(np.asarray(y), ref, atol=1e-5, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(new["mean"]), rm.numpy(), atol=1e-5)
    np.testing.assert_allclose(np.asarray(new["var"]), rv.numpy(), atol=1e-4,
                               rtol=1e-4)


@pytest.mark.slow
def test_bottleneck_residual_identity_path():
    # stride-1, matching channels -> no downsample branch in params
    p = R.init_bottleneck(jax.random.key(1), 16 * 4, 16, stride=1)
    assert "down_conv" not in p
    p2 = R.init_bottleneck(jax.random.key(1), 16, 16, stride=2)
    assert "down_conv" in p2


@pytest.mark.slow
def test_classifier_head():
    params = H.init_classifier(jax.random.key(0), n_classes=9)
    out = H.apply_classifier(
        params, jnp.ones((4, 768)), jnp.ones((4, 512)), train=False
    )
    assert out["logits"].shape == (4, 9)
    assert out["logits_proj"].shape == (4, 9)
    assert out["bn_feat"].shape == (4, 768)
    assert out["new_stats"]["bn"] is None
    out_t = H.apply_classifier(
        params, jnp.ones((4, 768)), jnp.ones((4, 512)), train=True
    )
    assert out_t["new_stats"]["bn"] is not None


def test_adapter_blend():
    p = H.init_adapter(jax.random.key(0), dim=8, reduction=2)
    x = jnp.ones((3, 8))
    y = H.apply_adapter(p, x, ratio=0.0)
    np.testing.assert_allclose(np.asarray(y), np.asarray(x))  # pure residual
    y2 = H.apply_adapter(p, x, ratio=0.2)
    assert not np.allclose(np.asarray(y2), np.asarray(x))
