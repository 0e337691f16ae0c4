"""Grad-CAM / attention-rollout visualization CLI.

Equivalent of the reference's ``prototype/prototype/tools/inference.py``
driven by grad_cam.sh (reference grad_cam.sh:1-16):

    python -m robustart_tpu.tools.inference --config config.yaml \
        -i <imgdir> -o <outdir> [--attn_rollout] [--meta_file meta.txt]

- CNNs: Grad-CAM on the last conv feature map (gradient of the top-class
  logit wrt the activation, channel-weighted ReLU of the map).
- ViTs (``--attn_rollout``): attention rollout — per-layer head-averaged
  attention + identity, normalized and matrix-multiplied through depth
  (Abnar & Zuidema 2020).

Outputs: one heatmap .npy + overlay .png per input image. Runs single
process (the reference fakes SLURM single-rank env for this tool,
grad_cam.sh:2-7; our single-process default needs no faking).
"""

from __future__ import annotations

import argparse
import os
import os.path as osp

import jax
import jax.numpy as jnp
import numpy as np
from PIL import Image

from robustart_tpu.core.config import load_config
from robustart_tpu.core.logging import get_logger
from robustart_tpu.models import create_classifier
from robustart_tpu.solvers.base import load_pretrain_into

logger = get_logger("robustart.inference")


def _last_conv_path(intermediates) -> tuple:
    """Find the deepest 4-D intermediate output (the last conv/stage map)."""
    best = None

    def walk(node, path):
        nonlocal best
        if isinstance(node, dict):
            for k, v in node.items():
                walk(v, path + (k,))
        elif isinstance(node, tuple):
            for v in node:
                walk(v, path)
        else:
            if hasattr(node, "ndim") and node.ndim == 4 and node.shape[1] > 1:
                best = (path, node)

    walk(intermediates, ())
    return best


def _head_weights(params) -> np.ndarray | None:
    """Kernel of the final Dense head (fc / classifier / linear / head)."""
    for name in ("fc", "classifier", "linear", "head"):
        node = params.get(name)
        if isinstance(node, dict) and "kernel" in node:
            return np.asarray(node["kernel"])
    return None


def grad_cam(classifier, image01: np.ndarray) -> np.ndarray:
    """(H, W) Grad-CAM heatmap in [0, 1] for the predicted class.

    Every CNN family in this zoo ends in global-average-pool → Dense, where
    Grad-CAM on the last conv map reduces EXACTLY to CAM with the head
    weights: d score/d feats[h,w,c] = W[c, cls] / (H·W), so the
    channel-weighted map is ReLU(Σ_c feats[...,c] · W[c, cls]).
    """
    from robustart_tpu.models.layers import normalize_01

    x = jnp.asarray(image01)[None]
    logits, state = classifier.module.apply(
        classifier.variables,
        normalize_01(x, classifier.mean, classifier.std),
        train=False,
        capture_intermediates=lambda mdl, _: True,
        mutable=["intermediates"],
    )
    cls = int(jnp.argmax(logits[0]))
    _, feats = _last_conv_path(state["intermediates"])
    w_head = _head_weights(classifier.variables["params"])
    if w_head is None or w_head.shape[0] != feats.shape[-1]:
        raise ValueError(
            "grad_cam needs a GAP→Dense head whose input matches the last "
            "conv map; use --attn_rollout for transformers"
        )
    cam = jnp.maximum(
        jnp.tensordot(feats[0], jnp.asarray(w_head[:, cls]), axes=[[-1], [0]]),
        0.0,
    )
    cam = cam / jnp.maximum(cam.max(), 1e-12)
    return np.asarray(cam)


def attention_rollout(classifier, image01: np.ndarray) -> np.ndarray:
    """(h, w) attention-rollout map for a ViT classifier."""
    from robustart_tpu.models.layers import normalize_01

    x = jnp.asarray(image01)[None]
    module = classifier.module
    if hasattr(module, "attention_impl"):
        # rollout needs the attention maps sown by the einsum path — the
        # fused Pallas kernel (default on TPU eval) never materializes them
        module = module.clone(attention_impl="xla")
    _, state = module.apply(
        classifier.variables,
        normalize_01(x, classifier.mean, classifier.std),
        train=False,
        capture_intermediates=False,
        mutable=["intermediates"],
    )

    attns = []

    def walk(node):
        if isinstance(node, dict):
            for k in sorted(node):
                if k == "attn_weights":
                    attns.append(node[k][0])
                else:
                    walk(node[k])

    walk(state["intermediates"])
    assert attns, "no attention maps captured — is this a ViT?"
    n = attns[0].shape[-1]
    rollout = jnp.eye(n)
    for a in attns:
        a = jnp.mean(a[0], axis=0)  # head average, (n, n)
        a = a + jnp.eye(n)
        a = a / a.sum(axis=-1, keepdims=True)
        rollout = a @ rollout
    cls_attn = rollout[0, 1:]  # cls token's attention over patches
    side = int(np.sqrt(cls_attn.shape[0]))
    cam = cls_attn.reshape(side, side)
    cam = cam / jnp.maximum(cam.max(), 1e-12)
    return np.asarray(cam)


def overlay(image_u8: np.ndarray, cam: np.ndarray) -> np.ndarray:
    """Upsample heatmap to the image and blend as a red overlay."""
    h, w = image_u8.shape[:2]
    cam_img = np.asarray(
        Image.fromarray((cam * 255).astype(np.uint8)).resize((w, h), Image.BILINEAR)
    ).astype(np.float32) / 255.0
    heat = np.zeros_like(image_u8, np.float32)
    heat[..., 0] = cam_img * 255
    return np.clip(0.5 * image_u8 + 0.5 * heat, 0, 255).astype(np.uint8)


def main(argv=None):
    parser = argparse.ArgumentParser(description="Grad-CAM / attention rollout")
    parser.add_argument("--config", required=True)
    parser.add_argument("-i", "--input", required=True, help="image dir or file")
    parser.add_argument("-o", "--output", required=True, help="output dir")
    parser.add_argument("--attn_rollout", action="store_true")
    parser.add_argument("--meta_file", default=None, help="optional 'path label' list")
    args = parser.parse_args(argv)

    cfg = load_config(args.config)
    kwargs = dict(cfg.model.get("kwargs") or {})
    clf = create_classifier(cfg.model.type, rng=0, **kwargs)
    load_pretrain_into(clf, cfg.get("saver"))

    if args.meta_file:
        with open(args.meta_file) as f:
            names = [line.split()[0] for line in f if line.strip()]
        paths = [osp.join(args.input, n) for n in names]
    elif osp.isdir(args.input):
        paths = [
            osp.join(args.input, n)
            for n in sorted(os.listdir(args.input))
            if n.lower().endswith((".jpg", ".jpeg", ".png"))
        ]
    else:
        paths = [args.input]

    os.makedirs(args.output, exist_ok=True)
    for path in paths:
        with Image.open(path) as img:
            img = img.convert("RGB").resize(
                (clf.input_size, clf.input_size), Image.BILINEAR
            )
        arr = np.asarray(img, np.uint8)
        x01 = arr.astype(np.float32) / 255.0
        cam = (
            attention_rollout(clf, x01)
            if args.attn_rollout
            else grad_cam(clf, x01)
        )
        stem = osp.splitext(osp.basename(path))[0]
        np.save(osp.join(args.output, f"{stem}_cam.npy"), cam)
        Image.fromarray(overlay(arr, cam)).save(
            osp.join(args.output, f"{stem}_overlay.png")
        )
        logger.info("wrote %s heatmap", stem)


if __name__ == "__main__":
    main()
