"""Offline caption-prompt generator.

Produces the `"label: description"` per-identity prompt files consumed by
the caption prompt learner (models/prompts.read_caption_prompts), playing
the role of the reference's GPT-4o captioning script
(reference: prompt_generator.py:31-96 — which called the OpenAI API per
identity crop; README.md:17 notes the resulting prompts were never
shipped).

Two offline sources:
  * --attributes market_attribute.mat — renders the deterministic
    attribute sentences (same text as the zero-shot prompts),
  * --generic — "person no.{i}" placeholder captions.

An external captioner (VLM API, human annotation) can produce the same
format; this tool is the egress-free default.

    python -m tpu_reid.tools.caption_prompts --n_cls 751 \
        --attributes market_attribute.mat --out prompts_market1501.txt
"""

from __future__ import annotations

import argparse


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--n_cls", required=True, type=int)
    p.add_argument("--attributes", default=None, type=str)
    p.add_argument("--out", required=True, type=str)
    args = p.parse_args()

    if args.attributes:
        from tpu_reid.data.attributes import get_prompts

        ids, prompts = get_prompts(args.attributes)
        lines = [
            f"{i}: A photo of {prompts[ident].lstrip('a ')}"
            for i, ident in enumerate(ids[: args.n_cls])
        ]
        if len(lines) < args.n_cls:
            raise SystemExit(
                f"attribute file covers {len(lines)} identities, "
                f"need {args.n_cls}"
            )
    else:
        lines = [
            f"{i}: A photo of person no.{i}." for i in range(args.n_cls)
        ]

    with open(args.out, "w") as f:
        f.write("\n".join(lines) + "\n")
    print(f"wrote {len(lines)} caption prompts to {args.out}")


if __name__ == "__main__":
    main()
