"""Native C++ loader tests: build, decode parity vs PIL, resize parity,
throughput sanity, and BatchLoader integration."""

import os
import time

import numpy as np
import pytest

from tpu_reid import native


pytestmark = pytest.mark.skipif(
    not native.available(), reason="no C++ toolchain / libjpeg"
)


@pytest.fixture(scope="module")
def jpegs(tmp_path_factory):
    from PIL import Image

    d = tmp_path_factory.mktemp("jpgs")
    rng = np.random.RandomState(0)
    paths = []
    for i, (h, w) in enumerate([(128, 64), (99, 47), (256, 128), (37, 21)]):
        # smooth-ish content so JPEG round-trip noise stays small
        base = rng.randint(0, 255, (8, 4, 3), np.uint8)
        img = np.asarray(
            Image.fromarray(base).resize((w, h), Image.BILINEAR), np.uint8
        )
        p = str(d / f"img{i}.jpg")
        Image.fromarray(img).save(p, quality=95)
        paths.append(p)
    return paths


def test_decode_matches_pil(jpegs):
    from PIL import Image

    ours = native.decode_jpeg(jpegs[0])
    ref = np.asarray(Image.open(jpegs[0]).convert("RGB"))
    assert ours.shape == ref.shape
    # same libjpeg underneath -> identical pixels
    np.testing.assert_array_equal(ours, ref)


def test_resize_matches_pil(jpegs):
    from PIL import Image

    out = native.decode_resize_batch(jpegs, (64, 32))
    for i, p in enumerate(jpegs):
        ref = np.asarray(
            Image.open(p).convert("RGB").resize((32, 64), Image.BICUBIC),
            np.float32,
        )
        diff = np.abs(out[i].astype(np.float32) - ref)
        assert diff.mean() < 0.6, f"img {i}: mean diff {diff.mean()}"
        assert np.percentile(diff, 99) <= 2.0, f"img {i}"


def test_failed_decode_zero_fills(jpegs, tmp_path):
    bad = str(tmp_path / "not_a_jpeg.jpg")
    with open(bad, "w") as f:
        f.write("nope")
    out = native.decode_resize_batch([jpegs[0], bad], (32, 16))
    assert out[0].any()
    assert not out[1].any()
    with pytest.raises(ValueError):
        native.decode_resize_batch([bad], (32, 16))


def test_batch_loader_native_backend(jpegs):
    from tpu_reid.data.loader import BatchLoader

    records = [(p, i, 0, 0, i) for i, p in enumerate(jpegs)]
    loader = BatchLoader(records, batch_size=3, size_hw=(64, 32),
                         backend="native")
    assert loader._native
    batches = list(loader)
    assert batches[0].images.shape == (3, 64, 32, 3)
    assert batches[0].images.any()
    # parity with the PIL backend
    loader_pil = BatchLoader(records, batch_size=3, size_hw=(64, 32),
                             backend="pil")
    b_pil = next(iter(loader_pil))
    diff = np.abs(
        batches[0].images.astype(np.float32)
        - b_pil.images.astype(np.float32)
    )
    assert diff.mean() < 0.6


def test_native_throughput(jpegs):
    # sanity: native decodes a 256-image batch without pathologic slowness
    paths = (jpegs * 64)[:256]
    t0 = time.perf_counter()
    out = native.decode_resize_batch(paths, (256, 128))
    dt = time.perf_counter() - t0
    assert out.shape[0] == 256
    rate = 256 / dt
    print(f"native decode+resize: {rate:.0f} img/s")
    assert rate > 200  # very loose lower bound


def test_decode_pool_matches_batch(tmp_path):
    """Persistent-pool path == per-call pool path, across multiple batches
    on one pool (workers park and re-wake)."""
    native = pytest.importorskip("tpu_reid.native")
    if not native.available():
        pytest.skip("native loader unavailable")
    from PIL import Image

    rng = np.random.default_rng(5)
    paths = []
    for i in range(6):
        p = tmp_path / f"im{i}.jpg"
        Image.fromarray(
            rng.integers(0, 255, (40 + i, 30, 3), np.uint8)
        ).save(p, quality=95)
        paths.append(str(p))

    pool = native.DecodePool(2)
    try:
        for batch in (paths[:3], paths[3:], paths):  # reuse across batches
            got = pool.run(batch, (32, 16))
            want = native.decode_resize_batch(batch, (32, 16))
            np.testing.assert_array_equal(got, want)
    finally:
        pool.close()


@pytest.mark.slow
def test_decode_pool_under_tsan(jpegs, tmp_path):
    """Race-detection pass for the native thread pool (SURVEY §5): build
    loader.cc + tsan_harness.cc with -fsanitize=thread and hammer the
    transient pool, persistent-pool job handoff, concurrent pools on host
    threads, and create/destroy churn. Any data race TSan finds fails the
    run (halt_on_error)."""
    import subprocess

    src_dir = os.path.dirname(os.path.abspath(native.__file__))
    exe = str(tmp_path / "tsan_harness")
    build = subprocess.run(
        ["g++", "-O1", "-g", "-fsanitize=thread", "-std=c++17",
         os.path.join(src_dir, "loader.cc"),
         os.path.join(src_dir, "tsan_harness.cc"),
         "-o", exe, "-ljpeg", "-lpthread"],
        capture_output=True, text=True,
    )
    if build.returncode != 0:
        if "tsan" in build.stderr or "sanitize" in build.stderr:
            pytest.skip(f"no TSan runtime in this toolchain: {build.stderr}")
        raise AssertionError(f"harness build failed: {build.stderr}")

    env = dict(os.environ, TSAN_OPTIONS="halt_on_error=1 exitcode=66")
    run = subprocess.run(
        [exe] + list(jpegs), capture_output=True, text=True, env=env,
        timeout=300,
    )
    assert "WARNING: ThreadSanitizer" not in run.stderr, run.stderr
    assert run.returncode == 0, (
        f"rc={run.returncode}\nstdout={run.stdout}\nstderr={run.stderr}"
    )
    assert "all phases OK" in run.stdout
