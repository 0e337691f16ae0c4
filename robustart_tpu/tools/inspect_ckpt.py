"""Checkpoint key inspector + HF-to-state-dict converter.

Covers two small reference utilities:
- nips_benchmark/adv_eval/test.py:1-4 (print checkpoint keys),
- nips_benchmark/batch_eval_adv/load_model.py:1-9 (HF convnext →
  state_dict .pth — here generalized: any torch/flax checkpoint re-saved as a
  plain state dict / msgpack).
"""

from __future__ import annotations

import argparse


def inspect(path: str, limit: int = 40) -> list[str]:
    if path.endswith((".pth", ".pth.tar", ".pt", ".bin")):
        from robustart_tpu.models.torch_convert import read_torch_state_dict

        sd = read_torch_state_dict(path)
        keys = [f"{k}  {tuple(v.shape)}" for k, v in sd.items()]
    else:
        from robustart_tpu.models.torch_convert import flatten
        from robustart_tpu.solvers.base import load_checkpoint

        ckpt = load_checkpoint(path)
        keys = [
            f"{k}  {tuple(getattr(v, 'shape', ()))}"
            for k, v in flatten(ckpt["variables"]).items()
        ]
    for k in keys[:limit]:
        print(k)
    if len(keys) > limit:
        print(f"... ({len(keys)} total)")
    return keys


def main(argv=None):
    parser = argparse.ArgumentParser(description="inspect checkpoint keys")
    parser.add_argument("path")
    parser.add_argument("--limit", type=int, default=40)
    args = parser.parse_args(argv)
    inspect(args.path, args.limit)


if __name__ == "__main__":
    main()
