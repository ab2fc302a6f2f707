"""Data layer tests: parsers on synthetic datasets, PK sampler properties,
attribute prompt rendering, transforms, loader."""

import os

import numpy as np
import pytest

from tpu_reid.data import attributes as A
from tpu_reid.data import datasets as D
from tpu_reid.data import transforms as T
from tpu_reid.data.loader import BatchLoader
from tpu_reid.data.sampler import PKSampler


# ---------------------------------------------------------------------------
# synthetic dataset fixtures
# ---------------------------------------------------------------------------


def _write_jpg(path, seed, hw=(64, 32)):
    from PIL import Image

    rng = np.random.RandomState(seed)
    Image.fromarray(rng.randint(0, 255, hw + (3,), np.uint8)).save(path)


@pytest.fixture(scope="module")
def market_root(tmp_path_factory):
    root = tmp_path_factory.mktemp("data")
    base = root / "Market1501"
    for sub in ("bounding_box_train", "query", "bounding_box_test"):
        (base / sub).mkdir(parents=True)
    # train: pids 5,9,12 across cams; one junk pid -1
    i = 0
    for pid, cam, seq, n in [(5, 1, 1, 5), (9, 2, 1, 4), (12, 3, 2, 3)]:
        for k in range(n):
            _write_jpg(base / "bounding_box_train" / f"{pid:04d}_c{cam}s{seq}_{k:06d}_00.jpg", i)
            i += 1
    _write_jpg(base / "bounding_box_train" / "-1_c1s1_000000_00.jpg", 99)
    for pid, cam in [(5, 2), (9, 1)]:
        _write_jpg(base / "query" / f"{pid:04d}_c{cam}s1_000000_00.jpg", i)
        i += 1
    for pid, cam, n in [(5, 1, 2), (5, 3, 2), (9, 2, 2), (12, 1, 1)]:
        for k in range(n):
            _write_jpg(base / "bounding_box_test" / f"{pid:04d}_c{cam}s1_{k:06d}_00.jpg", i)
            i += 1
    return str(root)


def test_market_parser(market_root):
    ds = D.load_market1501(market_root)
    assert ds.num_train_pids == 3
    assert len(ds.train) == 12  # junk -1 dropped
    # relabeled to contiguous 0..2 (sorted pid order)
    assert sorted({r[1] for r in ds.train}) == [0, 1, 2]
    # query keeps raw pids, camid is 0-based
    assert {r[1] for r in ds.query} == {5, 9}
    assert all(0 <= r[2] <= 5 for r in ds.query)
    # seqid parsed and 0-based
    assert {r[3] for r in ds.train} == {0, 1}
    stats = ds.stats()
    assert stats["gallery"][1] == 7
    assert "market1501" in ds.describe()


def test_get_dataset_dispatch(market_root):
    ds = D.get_dataset(market_root, "market1501")
    assert ds.name == "market1501"
    with pytest.raises(NotImplementedError):
        D.get_dataset(market_root, "nope")


def test_merge_datasets(market_root):
    a = D.load_market1501(market_root)
    merged = D.merge_datasets(a, a)
    assert merged.num_train_pids == 6
    assert len(merged.train) == 24
    # second copy's labels offset by 3
    assert sorted({r[1] for r in merged.train}) == list(range(6))


@pytest.fixture(scope="module")
def vehicleid_root(tmp_path_factory):
    root = tmp_path_factory.mktemp("vid")
    base = root / "VehicleID_V1.0"
    (base / "image").mkdir(parents=True)
    (base / "train_test_split").mkdir()
    train_lines, test_lines = [], []
    img_i = 0
    for pid in range(13164):  # reference asserts exactly 13164 train ids
        name = f"{img_i:07d}"
        train_lines.append(f"{name} {pid}")
        img_i += 1
    # only materialize a few actual images (loader opens lazily)
    for pid in range(800):
        for k in range(2):
            name = f"t{pid:05d}{k}"
            test_lines.append(f"{name} {pid}")
    (base / "train_test_split" / "train_list.txt").write_text(
        "\n".join(train_lines)
    )
    (base / "train_test_split" / "test_list_800.txt").write_text(
        "\n".join(test_lines)
    )
    return str(root)


def test_vehicleid_split_deterministic(vehicleid_root):
    ds1 = D.load_vehicleid(vehicleid_root, seed=3)
    ds2 = D.load_vehicleid(vehicleid_root, seed=3)
    assert [r[0] for r in ds1.gallery] == [r[0] for r in ds2.gallery]
    # one gallery image per test id, remainder in query
    assert len(ds1.gallery) == 800
    assert len(ds1.query) == 800
    # distinct synthetic camids so cross-camera filtering keeps matches
    assert {r[2] for r in ds1.query} == {0}
    assert {r[2] for r in ds1.gallery} == {1}


# ---------------------------------------------------------------------------
# PK sampler
# ---------------------------------------------------------------------------


def test_pk_sampler_structure():
    labels = np.repeat(np.arange(10), [3, 8, 4, 4, 5, 2, 9, 4, 4, 7])
    s = PKSampler(labels, batch_size=16, num_instances=4, seed=0)
    seen = set()
    for batch in s.epoch():
        assert len(batch) == 16
        pids = labels[batch]
        uniq, counts = np.unique(pids, return_counts=True)
        assert len(uniq) == 4  # P identities
        assert (counts == 4).all()  # K instances each
        seen.update(batch.tolist())
    # identities with >= K images contribute their full groups over the epoch
    assert len(seen) > 16


def test_pk_sampler_oversamples_small_ids():
    labels = [0, 0, 0, 0, 1]  # id 1 has 1 image < K
    s = PKSampler(labels, batch_size=8, num_instances=4, seed=1)
    batches = list(s.epoch())
    flat = np.concatenate(batches)
    assert (flat == 4).sum() == 4  # id 1's single image repeated to fill K


def test_pk_sampler_deterministic():
    labels = np.repeat(np.arange(6), 5)
    a = [b.tolist() for b in PKSampler(labels, 8, 4, seed=7).epoch()]
    b = [b.tolist() for b in PKSampler(labels, 8, 4, seed=7).epoch()]
    assert a == b


# ---------------------------------------------------------------------------
# attribute prompts
# ---------------------------------------------------------------------------


@pytest.fixture(scope="module")
def attr_mat(tmp_path_factory):
    """Synthesize market_attribute.mat with the reference's positional
    layout: struct market_attribute.{split}.{27 rows + image_index}."""
    from scipy import io as sio

    n = 3
    rows = {}
    # age, backpack, bag, handbag, clothes, down, sleeve, hair, hat, gender
    rows["age"] = [[1, 3, 2]]
    rows["backpack"] = [[2, 1, 1]]
    rows["bag"] = [[1, 2, 1]]
    rows["handbag"] = [[1, 1, 1]]
    rows["clothes"] = [[2, 1, 2]]
    rows["down"] = [[1, 2, 1]]
    rows["up"] = [[1, 1, 2]]
    rows["hair"] = [[2, 1, 1]]
    rows["hat"] = [[1, 1, 2]]
    rows["gender"] = [[1, 2, 1]]
    for i, c in enumerate(
        ["upblack", "upwhite", "upred", "uppurple", "upyellow", "upgray",
         "upblue", "upgreen"]
    ):
        rows[c] = [[2 if (j == 0 and i == 2) or (j > 0 and i == 0) else 1
                    for j in range(n)]]
    for i, c in enumerate(
        ["downblack", "downwhite", "downpink", "downpurple", "downyellow",
         "downgray", "downblue", "downgreen", "downbrown"]
    ):
        rows[c] = [[2 if i == 5 else 1 for _ in range(n)]]
    rows["image_index"] = [np.array(
        [np.array(["0001"]), np.array(["0002"]), np.array(["0005"])],
        dtype=object,
    )]
    split = np.array(
        [tuple(rows[k] for k in rows)],
        dtype=[(k, object) for k in rows],
    )
    mat = np.array([[(split, split)]],
                   dtype=[("train", object), ("test", object)])
    path = str(tmp_path_factory.mktemp("attr") / "market_attribute.mat")
    sio.savemat(path, {"market_attribute": mat})
    return path


def test_get_prompts(attr_mat):
    ids, prompts = A.get_prompts(attr_mat)
    assert ids == ["0001", "0002", "0005"]
    # identity 0: age=1 young, gender=1 male, hair=2 long, sleeve(up)=1 long,
    # clothes=2 pants, down=1 long, upred!=1 -> red, downgray -> gray,
    # hat=1 none, backpack=2 carried
    assert prompts["0001"] == (
        "a young male person no.0 with long hair, red long sleeve, gray long "
        "pants, carrying a backpack."
    )
    # identity 2: hat=2 -> wearing a hat; nothing carried -> strip trailing comma
    assert prompts["0005"].endswith("wearing a hat.")
    # identity 1: bag carried
    assert "carrying a bag" in prompts["0002"]


def test_get_prompts_augmented(attr_mat):
    ids, prompts = A.get_prompts_augmented(attr_mat)
    assert all(len(v) == 56 for v in prompts.values())
    # 7 sentence templates x (4 motion variants x 2 orderings)
    assert prompts["0001"][0].startswith("itap of a young male person no.0")
    assert "wearing nothing on head" in prompts["0001"][0]
    assert "carrying a backpack" in prompts["0001"][0]


def test_get_prompts_simple():
    ids, prompts = A.get_prompts_simple(["a", "b"], 2)
    assert len(prompts["a"]) == 7
    assert "person no.0" in prompts["a"][0]


# ---------------------------------------------------------------------------
# transforms
# ---------------------------------------------------------------------------


def test_host_test_transform():
    img = np.random.RandomState(0).randint(0, 255, (100, 40, 3), np.uint8)
    x = T.host_test_transform(img, (64, 32), "vit")
    assert x.shape == (64, 32, 3)
    assert -1.01 <= x.min() and x.max() <= 1.01  # (x-0.5)/0.5 range
    x_rn = T.host_test_transform(img, (64, 32), "rn")
    assert not np.allclose(x, x_rn)


def test_host_train_transform_bounds():
    rng = np.random.default_rng(0)
    img = np.random.RandomState(1).randint(0, 255, (80, 40, 3), np.uint8)
    for _ in range(5):
        x = T.host_train_transform(img, (64, 32), rng)
        assert x.shape == (64, 32, 3)
        assert np.isfinite(x).all()


def test_device_eval_matches_host_resize():
    import jax.numpy as jnp

    img = np.random.RandomState(2).randint(0, 255, (4, 64, 32, 3), np.uint8)
    pp = T.DevicePreprocess((64, 32), "vit")
    dev = np.asarray(pp.eval_batch(jnp.asarray(img)))
    host = np.stack([T.host_test_transform(i, (64, 32)) for i in img])
    # same-size resize is identity; normalization must agree exactly
    np.testing.assert_allclose(dev, host, atol=1e-5)


def test_device_flip():
    import jax.numpy as jnp

    img = np.random.RandomState(3).randint(0, 255, (2, 32, 16, 3), np.uint8)
    pp = T.DevicePreprocess((32, 16), "vit")
    flipped = np.asarray(pp.eval_flip_batch(jnp.asarray(img)))
    plain = np.asarray(pp.eval_batch(jnp.asarray(img)))
    np.testing.assert_allclose(flipped, plain[:, :, ::-1], atol=1e-5)


@pytest.mark.slow
def test_device_random_erasing():
    import jax
    import jax.numpy as jnp

    x = jnp.zeros((8, 32, 16, 3))
    y = np.asarray(T.random_erasing(x, jax.random.key(0), prob=1.0))
    changed = (y != 0).any(axis=(1, 2, 3))
    assert changed.all()  # every image got a noise rectangle
    frac = (y != 0).mean(axis=(1, 2, 3))
    assert (frac <= 0.55).all()  # erased area bounded by ~1/3 + rounding
    y2 = np.asarray(T.random_erasing(x, jax.random.key(0), prob=0.0))
    assert (y2 == 0).all()


@pytest.mark.slow
def test_train_batch_shapes():
    import jax
    import jax.numpy as jnp

    img = np.random.RandomState(4).randint(0, 255, (4, 64, 32, 3), np.uint8)
    pp = T.DevicePreprocess((64, 32), "vit")
    out = np.asarray(pp.train_batch(jnp.asarray(img), jax.random.key(1)))
    assert out.shape == (4, 64, 32, 3)
    assert np.isfinite(out).all()


# ---------------------------------------------------------------------------
# loader
# ---------------------------------------------------------------------------


def test_batch_loader(market_root):
    ds = D.load_market1501(market_root)
    loader = BatchLoader(ds.train, batch_size=5, size_hw=(64, 32), seed=0)
    batches = list(loader)
    assert len(batches) == len(loader) == 3  # 12 records, bs 5
    assert batches[0].images.shape == (5, 64, 32, 3)
    assert batches[0].images.dtype == np.uint8
    assert batches[0].valid.all()
    # padded tail
    assert batches[-1].n_valid == 2
    assert not batches[-1].valid[2:].any()
    total = sum(b.n_valid for b in batches)
    assert total == 12


def test_batch_loader_pk_order(market_root):
    ds = D.load_market1501(market_root)
    labels = [r[1] for r in ds.train]
    sampler = PKSampler(labels, batch_size=4, num_instances=2, seed=0)
    loader = BatchLoader(
        ds.train, batch_size=4, size_hw=(32, 16), order=sampler.epoch()
    )
    for b in loader:
        uniq, counts = np.unique(b.pids[b.valid], return_counts=True)
        assert (counts == 2).all()


def test_batch_loader_transform(market_root):
    ds = D.load_market1501(market_root)
    loader = BatchLoader(
        ds.query, batch_size=2, size_hw=(32, 16),
        transform=lambda im: T.host_test_transform(im, (32, 16)),
    )
    b = next(iter(loader))
    assert b.images.dtype == np.float32


def test_caption_prompts_tool(attr_mat, tmp_path, monkeypatch):
    import sys

    from tpu_reid.models.prompts import read_caption_prompts
    from tpu_reid.tools import caption_prompts as tool

    out = str(tmp_path / "prompts.txt")
    monkeypatch.setattr(
        sys, "argv",
        ["caption_prompts", "--n_cls", "3", "--attributes", attr_mat,
         "--out", out],
    )
    tool.main()
    prompts = read_caption_prompts(out, 3)
    assert len(prompts) == 3
    assert prompts[0].startswith("A photo of")

    out2 = str(tmp_path / "generic.txt")
    monkeypatch.setattr(
        sys, "argv", ["caption_prompts", "--n_cls", "5", "--out", out2]
    )
    tool.main()
    assert len(read_caption_prompts(out2, 5)) == 5


def test_fetch_model_table():
    from tpu_reid.weights.fetch import MODELS, available_models

    assert "ViT-B/16" in available_models()
    for url in MODELS.values():
        sha = url.split("/")[-2]
        assert len(sha) == 64  # checksum embedded in every URL


def test_synth_generator_layouts(tmp_path):
    """The synthetic-workload generator's duke/veri layouts satisfy the real
    parsers' contracts (filenames, keypoint files, gb2312 label XMLs)."""
    import numpy as np

    from tpu_reid.data.datasets import get_dataset
    from tpu_reid.tools.synth_market import (
        write_images_duke, write_images_veri,
    )

    rng = np.random.RandomState(3)
    write_images_duke(str(tmp_path / "DukeMTMC-reID"), rng, 4, 3, 6, 12,
                      (32, 16))
    duke = get_dataset(str(tmp_path), "dukemtmc")
    assert duke.num_train_pids == 4
    assert len(duke.query) == 6 and len(duke.gallery) == 12

    write_images_veri(str(tmp_path / "VeRi"), rng, 5, 4, 8, 16, (32, 32))
    veri = get_dataset(str(tmp_path), "veri")
    assert veri.num_train_pids == 5
    assert len(veri.query) == 8 and len(veri.gallery) == 16
    # every train pid got a usable car type for PromptLearnerVeri
    assert len(veri.car_types_train) == 5
    assert all(t for t in veri.car_types_train)
    # viewpoint annotations survive the keypoint round-trip
    assert all(0 <= r[3] <= 7 for r in veri.train)

    from tpu_reid.tools.synth_market import write_images_msmt

    write_images_msmt(str(tmp_path / "MSMT17_V2"), rng, 5, 4, 8, 20,
                      (32, 16))
    msmt = get_dataset(str(tmp_path), "msmt17")
    assert msmt.num_train_pids == 5  # train+val merged, contiguous pids
    assert len(msmt.query) == 8 and len(msmt.gallery) == 20

    from tpu_reid.tools.synth_market import write_images_vehicleid

    write_images_vehicleid(str(tmp_path / "VehicleID_V1.0"), rng, 4, 5, 10,
                           0, (32, 32))
    vid = get_dataset(str(tmp_path), "vehicleid")
    assert vid.num_train_pids == 4
    # protocol: one random gallery image per test id, the rest are queries
    assert len(vid.gallery) == 5
    assert len(vid.query) == 5 * 2  # per_test=3 -> 2 queries/id
    assert {r[2] for r in vid.query} == {0}
    assert {r[2] for r in vid.gallery} == {1}

    from tpu_reid.tools.synth_market import write_images_personx

    write_images_personx(str(tmp_path / "PersonX_v1"), rng, 4, 3, 6, 12,
                         (32, 16))
    px = get_dataset(str(tmp_path), "personx")
    assert px.num_train_pids == 4
    assert len(px.query) == 6 and len(px.gallery) == 12


def test_device_cache_matches_host_loader(market_root):
    """DeviceImageCache batches must be bit-identical to the host
    BatchLoader path: same resize at build time, same PK order, same
    padding/validity contract (data/device_cache.py)."""
    import jax.numpy as jnp

    from tpu_reid.data.device_cache import DeviceImageCache
    from tpu_reid.data.loader import BatchLoader
    from tpu_reid.data.sampler import PKSampler

    ds = D.load_market1501(market_root)
    hw = (32, 16)
    cache = DeviceImageCache(ds.train, hw, chunk=5)
    assert cache.n == len(ds.train)

    labels = [r[1] for r in ds.train]
    sampler = PKSampler(labels, 8, 4, seed=3)
    order = list(sampler.epoch())
    host = list(BatchLoader(ds.train, 8, hw, order=iter(order)))
    dev = list(cache.epoch_index_batches(order, 8))
    assert len(host) == len(dev)
    for hb, (sel, pids, camids, valid) in zip(host, dev):
        np.testing.assert_array_equal(hb.valid, valid)
        np.testing.assert_array_equal(hb.pids, pids)
        np.testing.assert_array_equal(hb.camids, camids)
        imgs = np.asarray(cache.gather(sel))
        # padded rows: loader zero-fills, cache gathers row 0 — both are
        # masked by valid everywhere downstream; compare valid rows only
        np.testing.assert_array_equal(hb.images[valid], imgs[valid])

    # sequential (stage-1 epoch-0) order, tail padded
    host = list(BatchLoader(ds.train, 5, hw))
    dev = list(cache.epoch_index_batches(np.arange(cache.n), 5))
    for hb, (sel, pids, _c, valid) in zip(host, dev):
        np.testing.assert_array_equal(hb.valid, valid)
        np.testing.assert_array_equal(hb.pids, pids)
        np.testing.assert_array_equal(
            hb.images[valid], np.asarray(cache.gather(sel))[valid]
        )


def test_device_cache_mesh_sharded(market_root):
    """Mesh-sharded cache (8-device "data" axis): the resident split is
    row-sharded across chips, gathers come back batch-sharded, and batches
    stay bit-identical to the host BatchLoader path (VERDICT r4 #6)."""
    import jax
    from jax.sharding import PartitionSpec as P

    from tpu_reid.data.device_cache import DeviceImageCache
    from tpu_reid.data.loader import BatchLoader
    from tpu_reid.data.sampler import PKSampler
    from tpu_reid.parallel.mesh import make_mesh

    ds = D.load_market1501(market_root)
    hw = (32, 16)
    mesh = make_mesh(n_data=8)
    cache = DeviceImageCache(ds.train, hw, chunk=5, mesh=mesh)

    # resident images are sharded over "data" (row-padded to divisibility)
    assert cache.images.shape[0] % 8 == 0
    spec = cache.images.sharding.spec
    assert spec == P("data") or tuple(spec)[:1] == ("data",)

    labels = [r[1] for r in ds.train]
    order = list(PKSampler(labels, 8, 4, seed=3).epoch())
    host = list(BatchLoader(ds.train, 8, hw, order=iter(order)))
    dev = list(cache.epoch_index_batches(order, 8))
    assert len(host) == len(dev)
    for hb, (sel, pids, camids, valid) in zip(host, dev):
        got = cache.gather(sel)
        # gathered batch is batch-sharded over the same axis
        gspec = got.sharding.spec
        assert gspec == P("data") or tuple(gspec)[:1] == ("data",)
        np.testing.assert_array_equal(hb.pids, pids)
        np.testing.assert_array_equal(
            hb.images[valid], np.asarray(got)[valid]
        )
