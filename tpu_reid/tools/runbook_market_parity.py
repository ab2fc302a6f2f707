"""Real-assets parity runbook: fetch ViT-B/16 + Market-1501 assets, run
the parity harness, write BASELINE.json's ``published["market1501"]``.

This is the one-command closure of the north-star check "mAP within 0.1
of the PyTorch reference on Market-1501" (reference protocol:
evaluate.py:29-135) for a machine WITH network egress and/or the dataset
on disk — the build environment here has neither, so the numbers cannot
be generated in-repo; this script is the documented, locally-dry-runnable
path to produce them.

    # connected machine, dataset already on disk:
    python -m tpu_reid.tools.runbook_market_parity \
        --root /data/reid --baseline BASELINE.json

    # local dry-run (zero egress, synthetic workload, same code path):
    python -m tpu_reid.tools.runbook_market_parity --synthetic

What it does:
  1. downloads the OpenAI ViT-B/16 checkpoint (sha256-verified,
     weights/fetch.py — URL table mirrors reference clip_custom.py:26-35),
  2. downloads the CLIP BPE vocab and the Market-1501 attribute
     annotations (public GitHub raw files),
  3. verifies ``<root>/Market1501`` exists (the dataset itself is
     distributed via per-user links — Google Drive / academic mirrors —
     and cannot be fetched unattended; clear instructions print if
     missing),
  4. runs tools/parity_run: extracts features once, evaluates through
     BOTH this framework's on-device tail and an independent numpy
     re-implementation of the reference's CMC/mAP math, asserts their
     agreement, and writes ``published["market1501"]``.
"""

from __future__ import annotations

import argparse
import os
import sys
import urllib.request

# public, stable raw-file URLs (not per-user download links)
BPE_URL = (
    "https://github.com/openai/CLIP/raw/main/clip/"
    "bpe_simple_vocab_16e6.txt.gz"
)
ATTR_URL = (
    "https://github.com/vana77/Market-1501_Attribute/raw/master/"
    "market_attribute.mat"
)

MARKET_HELP = """\
Market-1501 not found at {path}.

The dataset is distributed through per-user links (no stable public URL):
  * request/download 'Market-1501-v15.09.15.zip' from the dataset page
    (Zheng et al., ICCV'15) or the academic mirrors linked from
    paperswithcode.com/dataset/market-1501,
  * unzip so that {path}/bounding_box_train, /query and
    /bounding_box_test exist (rename Market-1501-v15.09.15 -> Market1501
    or pass --root pointing at its parent).
Then re-run this command.
"""


def _fetch(url: str, target: str) -> str:
    if os.path.isfile(target):
        return target
    os.makedirs(os.path.dirname(target), exist_ok=True)
    print(f"fetching {url}")
    with urllib.request.urlopen(url) as src, open(target, "wb") as dst:
        dst.write(src.read())
    return target


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--root", type=str, default=None,
                   help="dataset root containing Market1501/")
    p.add_argument("--cache", type=str, default="~/.cache/tpu_reid",
                   help="download cache for checkpoint/vocab/attributes")
    p.add_argument("--baseline", type=str, default="BASELINE.json")
    p.add_argument("--bs", default=64, type=int)
    p.add_argument("--synthetic", action="store_true",
                   help="zero-egress dry-run of the identical harness on "
                        "a generated Market-layout workload")
    args = p.parse_args(argv)

    from tpu_reid.tools import parity_run

    if args.synthetic:
        # the harness generates its own assets; nothing fetched
        return parity_run.main(["--synthetic", "--baseline", args.baseline])

    assert args.root, "--root is required (or pass --synthetic)"
    cache = os.path.expanduser(args.cache)

    from tpu_reid.weights.fetch import download

    model_path = download("ViT-B/16", root=cache)
    bpe_path = _fetch(
        BPE_URL, os.path.join(cache, "bpe_simple_vocab_16e6.txt.gz")
    )
    attr_path = _fetch(
        ATTR_URL, os.path.join(cache, "market_attribute.mat")
    )

    market = os.path.join(args.root, "Market1501")
    if not os.path.isdir(os.path.join(market, "bounding_box_train")):
        sys.stderr.write(MARKET_HELP.format(path=market))
        return 2

    return parity_run.main([
        "--root", args.root,
        "--model_path", model_path,
        "--bpe_path", bpe_path,
        "--attributes", attr_path,
        "--augmented_template",
        "--test_dataset", "market1501",
        "--bs", str(args.bs),
        "--height", "256",
        "--baseline", args.baseline,
    ])


if __name__ == "__main__":
    raise SystemExit(main())
