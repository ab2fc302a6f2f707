"""Checkpoint acquisition: the OpenAI CLIP model table + verified download.

Behavioral equivalent of the reference's clip_custom.py:26-65 (URL table,
sha256-prefixed URLs, checksum-verified download with progress). Downloads
only run when the environment has egress; everything else in the framework
takes explicit local paths.
"""

from __future__ import annotations

import hashlib
import os
import urllib.request
import warnings

# sha256 is the first path component of each URL (reference: clip_custom.py:26-35)
MODELS = {
    "RN50": "https://openaipublic.azureedge.net/clip/models/afeb0e10f9e5a86da6080e35cf09123aca3b358a0c3e3b6c78a7b63bc04b6762/RN50.pt",
    "RN101": "https://openaipublic.azureedge.net/clip/models/8fa8567bab74a42d41c5915025a8e4538c3bdbe8804a470a72f30b0d94fab599/RN101.pt",
    "RN50x4": "https://openaipublic.azureedge.net/clip/models/7e526bd135e493cef0776de27d5f42653e6b4c8bf9e0f653bb11773263205fdd/RN50x4.pt",
    "RN50x16": "https://openaipublic.azureedge.net/clip/models/52378b407f34354e150460fe41077663dd5b39c54cd0bfd2b27167a4a06ec9aa/RN50x16.pt",
    "ViT-B/32": "https://openaipublic.azureedge.net/clip/models/40d365715913c9da98579312b702a82c18be219cc2a73407c4526f58eba950af/ViT-B-32.pt",
    "ViT-B/16": "https://openaipublic.azureedge.net/clip/models/5806e77cd80f8b59890b7e101eabd078d9fb84e6937f9e85e4ecb61988df416f/ViT-B-16.pt",
}


def available_models() -> list[str]:
    return list(MODELS)


def download(name_or_url: str, root: str = "~/.cache/tpu_reid") -> str:
    """Download (or reuse) a checkpoint; verifies the sha256 embedded in the
    URL path. Returns the local file path."""
    url = MODELS.get(name_or_url, name_or_url)
    root = os.path.expanduser(root)
    os.makedirs(root, exist_ok=True)
    filename = os.path.basename(url)
    expected = url.split("/")[-2]
    target = os.path.join(root, filename)

    def sha256(path: str) -> str:
        h = hashlib.sha256()
        with open(path, "rb") as f:
            for chunk in iter(lambda: f.read(1 << 20), b""):
                h.update(chunk)
        return h.hexdigest()

    if os.path.isfile(target):
        if len(expected) == 64 and sha256(target) == expected:
            return target
        warnings.warn(f"{target} exists with wrong checksum; re-downloading")
    with urllib.request.urlopen(url) as src, open(target, "wb") as dst:
        while True:
            chunk = src.read(1 << 20)
            if not chunk:
                break
            dst.write(chunk)
    if len(expected) == 64 and sha256(target) != expected:
        raise RuntimeError(f"checksum mismatch for {target}")
    return target
