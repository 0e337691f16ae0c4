"""CLI: compute CLIP zero-shot classification weights from a raw checkpoint.

Makes the reference's CLIP eval configs self-sufficient
(config_clip_openai.yaml points at a raw OpenAI ``ViT-L-14.pt`` which holds
BOTH towers but no classification head): runs the ckpt's own TEXT tower
over the 80-prompt ImageNet ensemble (models/clip_text.py) and writes the
``(embed_dim, n_classes)`` head as ``.npz``.

    python -m robustart_tpu.tools.clip_zero_shot \
        --ckpt ViT-L-14.pt --classnames imagenet_classnames.txt \
        --bpe bpe_simple_vocab_16e6.txt.gz --out zero_shot_weights.npz

Then either point ``saver.pretrain.clip_zero_shot.weights`` at the npz, or
skip this CLI and give ``saver.pretrain.clip_zero_shot.{classnames,bpe}``
directly — the converter computes it inline (torch_convert.py).
"""

from __future__ import annotations

import argparse

import numpy as np


def main(argv=None) -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--ckpt", required=True, help="raw OpenAI CLIP .pt")
    ap.add_argument("--classnames", required=True,
                    help="text file, one class name per line")
    ap.add_argument("--bpe", required=True,
                    help="CLIP BPE merges (bpe_simple_vocab_16e6.txt.gz)")
    ap.add_argument("--out", required=True, help="output .npz path")
    ap.add_argument("--templates", default="",
                    help="optional file of prompt templates ({} = class); "
                         "default: the 80-prompt OpenAI ensemble")
    args = ap.parse_args(argv)

    from robustart_tpu.models.clip_text import (
        OPENAI_IMAGENET_TEMPLATES,
        SimpleTokenizer,
        compute_zero_shot_weights,
    )
    from robustart_tpu.models.torch_convert import read_torch_state_dict

    with open(args.classnames) as f:
        classnames = [ln.strip() for ln in f if ln.strip()]
    templates = OPENAI_IMAGENET_TEMPLATES
    if args.templates:
        with open(args.templates) as f:
            templates = tuple(ln.rstrip("\n") for ln in f if ln.strip())
    sd = read_torch_state_dict(args.ckpt)
    w = compute_zero_shot_weights(
        sd, classnames, templates=templates,
        tokenizer=SimpleTokenizer(args.bpe),
    )
    np.savez(args.out, zero_shot_weights=w)
    print(f"wrote {args.out}: {w.shape} ({len(classnames)} classes, "
          f"{len(templates)} templates)")


if __name__ == "__main__":
    main()
