"""RepVGG A0 / B3 — structural re-parameterization VGG.

Parity names: ``repvgg_A0``, ``repvgg_B3`` (reference
exprs/robust_baseline_exp/repvgg/*/config.yaml). Train-time form = 3x3 conv +
1x1 conv + identity branches, each with its own BN; ``reparameterize_params``
folds the branches into one fused 3x3 conv for deployment — the fused form is
a single MXU-friendly conv per layer.
"""

from __future__ import annotations

from typing import Any, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from robustart_tpu.models.layers import conv_kernel_init, global_avg_pool


class RepVGGBlock(nn.Module):
    features: int
    stride: int = 1
    deploy: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        if self.deploy:
            out = nn.Conv(
                self.features, (3, 3), strides=(self.stride, self.stride),
                padding=[(1, 1), (1, 1)], use_bias=True, dtype=self.dtype,
                name="fused",
            )(x)
            return nn.relu(out)

        def bn(name):
            return nn.BatchNorm(
                use_running_average=not train, momentum=0.9, epsilon=1e-5,
                dtype=self.dtype, name=name,
            )

        dense = nn.Conv(
            self.features, (3, 3), strides=(self.stride, self.stride),
            padding=[(1, 1), (1, 1)], use_bias=False, dtype=self.dtype,
            kernel_init=conv_kernel_init, name="conv3x3",
        )(x)
        dense = bn("bn3x3")(dense)
        onexone = nn.Conv(
            self.features, (1, 1), strides=(self.stride, self.stride),
            padding="VALID", use_bias=False, dtype=self.dtype,
            kernel_init=conv_kernel_init, name="conv1x1",
        )(x)
        onexone = bn("bn1x1")(onexone)
        out = dense + onexone
        if self.stride == 1 and x.shape[-1] == self.features:
            out = out + bn("bn_id")(x)
        return nn.relu(out)


class RepVGG(nn.Module):
    num_blocks: Sequence[int]
    width_a: float
    width_b: float
    num_classes: int = 1000
    deploy: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        base = [64, 128, 256, 512]
        widths = [
            int(base[0] * min(self.width_a, 1.0)),
            int(base[1] * self.width_a),
            int(base[2] * self.width_a),
            int(base[3] * self.width_b),
        ]
        x = RepVGGBlock(
            widths[0], stride=2, deploy=self.deploy, dtype=self.dtype,
            name="stage0",
        )(x, train)
        for si, (n, w) in enumerate(zip(self.num_blocks, widths)):
            for bi in range(n):
                x = RepVGGBlock(
                    w, stride=2 if bi == 0 else 1, deploy=self.deploy,
                    dtype=self.dtype, name=f"stage{si + 1}_{bi}",
                )(x, train)
        x = global_avg_pool(x).astype(jnp.float32)
        return nn.Dense(self.num_classes, dtype=jnp.float32, name="linear")(x)


def _fuse_branch(kernel, bn_vars, eps=1e-5):
    """Fold a conv kernel + BN into an equivalent (kernel, bias)."""
    gamma, beta = bn_vars["scale"], bn_vars["bias"]
    mean, var = bn_vars["mean"], bn_vars["var"]
    std = np.sqrt(var + eps)
    fused_k = kernel * (gamma / std).reshape(1, 1, 1, -1)
    fused_b = beta - mean * gamma / std
    return fused_k, fused_b


def reparameterize_params(variables) -> dict:
    """Fold every RepVGGBlock's three branches into one 3x3 conv.

    Returns variables for the ``deploy=True`` module (same block names, each
    holding a single ``fused`` conv with bias).
    """
    params = variables["params"]
    stats = variables.get("batch_stats", {})
    out_params: dict = {}
    for name, block in params.items():
        if "conv3x3" not in block:
            out_params[name] = block  # the classifier head
            continue
        bstats = stats[name]
        k3, b3 = _fuse_branch(
            np.asarray(block["conv3x3"]["kernel"]),
            {k: np.asarray(v) for k, v in {**block["bn3x3"], **bstats["bn3x3"]}.items()},
        )
        k1, b1 = _fuse_branch(
            np.asarray(block["conv1x1"]["kernel"]),
            {k: np.asarray(v) for k, v in {**block["bn1x1"], **bstats["bn1x1"]}.items()},
        )
        # pad 1x1 to 3x3 (center tap)
        k1p = np.zeros_like(k3)
        k1p[1:2, 1:2] = k1
        fused_k = k3 + k1p
        fused_b = b3 + b1
        if "bn_id" in block:
            cin = k3.shape[2]
            ident = np.zeros_like(k3)
            for c in range(cin):
                ident[1, 1, c, c] = 1.0
            kid, bid = _fuse_branch(
                ident,
                {k: np.asarray(v) for k, v in {**block["bn_id"], **bstats["bn_id"]}.items()},
            )
            fused_k = fused_k + kid
            fused_b = fused_b + bid
        out_params[name] = {"fused": {"kernel": fused_k, "bias": fused_b}}
    return {"params": out_params}


def deploy_classifier(clf):
    """Return an eval-only :class:`Classifier` in deploy form.

    Folds every block's three branches (``reparameterize_params``) and swaps
    the module for its ``deploy=True`` twin — one MXU-friendly 3x3 conv +
    bias + relu per block, mathematically identical to the train form (up to
    float rounding). This mirrors the upstream RepVGG deployment conversion
    (the reference evals the train-form torchvision-style module; the fused
    form is the TPU-first eval path — input gradients for attacks are exact
    through it).
    """
    import dataclasses as _dc

    module = clf.module
    if not isinstance(module, RepVGG):
        raise ValueError(f"deploy_classifier expects RepVGG, got {type(module).__name__}")
    if module.deploy:
        return clf
    # params stay f32 (flax param_dtype convention); the deploy module's
    # dtype knob casts inside the conv exactly like the train form
    fused_vars = jax.tree.map(jnp.asarray, reparameterize_params(clf.variables))
    return _dc.replace(
        clf, name=f"{clf.name}@deploy", module=module.clone(deploy=True),
        variables=fused_vars,
    )


def repvgg_A0(**kw):
    kw.pop("bn", None)
    return RepVGG(num_blocks=(2, 4, 14, 1), width_a=0.75, width_b=2.5, **kw)


def repvgg_B3(**kw):
    kw.pop("bn", None)
    return RepVGG(num_blocks=(4, 6, 16, 1), width_a=3.0, width_b=5.0, **kw)
