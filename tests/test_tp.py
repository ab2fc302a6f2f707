"""Tensor-parallel tower vs the single-device reference implementation.

Runs on the 8-virtual-device CPU mesh as a 2x4 ("data" x "model") grid:
4-way head/hidden sharding with explicit psums must reproduce the
plain apply_vit forward bit-for-bit (fp32 tolerance).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

from tpu_reid.configs import VisionConfig
from tpu_reid.models import layers as L
from tpu_reid.models import vit as V
from tpu_reid.parallel import tp
from tpu_reid.parallel.mesh import make_mesh

RNG = np.random.default_rng(0)


def _cfg_params(width=64, layers=3, heads=4):
    hg, wg = VisionConfig.grid_for((32, 16), 8, 8)
    cfg = VisionConfig(layers=layers, width=width, patch_size=8, stride=8,
                       h_grid=hg, w_grid=wg, output_dim=32, n_heads=heads)
    params = V.init_vit(jax.random.PRNGKey(3), cfg)
    return cfg, params


def test_tp_layout_roundtrip_single_block():
    """tp_residual_block under a 1-device psum axis == residual_block."""
    d, h = 48, 4
    p = L.init_block(jax.random.PRNGKey(5), d, 2)
    stacked = jax.tree.map(lambda a: a[None], p)
    tp_p = jax.tree.map(lambda a: a[0], tp.tp_layout(stacked, h))
    x = jnp.asarray(RNG.normal(size=(2, 9, d)) * 0.3, jnp.float32)

    mesh1 = make_mesh(n_data=1, n_model=1, devices=jax.devices()[:1])
    from tpu_reid.parallel.mesh import shard_map_nocheck

    got = shard_map_nocheck(
        lambda pp, xx: tp.tp_residual_block(pp, xx),
        mesh=mesh1, in_specs=(P(), P()), out_specs=P(),
    )(tp_p, x)
    want = L.residual_block(p, x, h)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-5)


@pytest.mark.slow
def test_tp_vit_matches_plain_on_2x4_mesh():
    """apply_vit_tp over model=4 sharding == apply_vit, all three levels."""
    cfg, params = _cfg_params()
    mesh = make_mesh(n_data=2, n_model=4)
    assert mesh.devices.shape == (2, 4)
    images = jnp.asarray(RNG.normal(size=(4, 32, 16, 3)), jnp.float32)

    x11, x12, xproj = V.apply_vit(params, cfg, images)

    params_tp = tp.tp_visual_layout(params, cfg.n_heads)
    params_tp = tp.shard_tp_visual(mesh, params_tp)
    from tpu_reid.parallel.mesh import shard_map_nocheck

    specs = tp.tp_visual_specs(params_tp)
    t11, t12, tproj = jax.jit(
        shard_map_nocheck(
            lambda pp, xx: tp.apply_vit_tp(pp, cfg, xx),
            mesh=mesh, in_specs=(specs, P("data")),
            out_specs=(P("data"), P("data"), P("data")),
        )
    )(params_tp, jax.device_put(
        images, jax.sharding.NamedSharding(mesh, P("data"))))
    np.testing.assert_allclose(np.asarray(t11), np.asarray(x11), atol=2e-5)
    np.testing.assert_allclose(np.asarray(t12), np.asarray(x12), atol=2e-5)
    np.testing.assert_allclose(np.asarray(tproj), np.asarray(xproj),
                               atol=2e-5)


@pytest.mark.slow
def test_tp_extractor_flip_tta_matches_plain():
    """End-to-end 2-D extractor (cls_only fast path + flip TTA) equals the
    single-device zero-shot embedding."""
    cfg, params = _cfg_params()
    mesh = make_mesh(n_data=2, n_model=4)
    images = jnp.asarray(RNG.normal(size=(4, 32, 16, 3)), jnp.float32)

    def embed_plain(x):
        _, x12, xproj = V.apply_vit(params, cfg, x, cls_only=True)
        return jnp.concatenate([x12[:, 0], xproj[:, 0]], axis=-1)

    want = (embed_plain(images) + embed_plain(images[:, :, ::-1])) * 0.5

    params_tp = tp.shard_tp_visual(
        mesh, tp.tp_visual_layout(params, cfg.n_heads)
    )
    extract = tp.make_tp_extractor(mesh, cfg, preprocess=None,
                                   flip_tta=True, dtype=jnp.float32)
    got = extract(params_tp, jax.device_put(
        images, jax.sharding.NamedSharding(mesh, P("data"))))
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-5)
