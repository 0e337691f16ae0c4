"""RegNetX {400m, 800m, 1600m, 3200m, 6400m}.

Parity names: ``regnetx_{400m,800m,1600m,3200m,6400m}`` (reference
exprs/robust_baseline_exp/regnetx/*/config.yaml). Width generation follows
the RegNet quantized-linear rule (Radosavovic et al., "Designing Network
Design Spaces", CVPR 2020; pycls parameterization).
"""

from __future__ import annotations

from typing import Any, Sequence

import numpy as np
import jax
import jax.numpy as jnp
from flax import linen as nn

from robustart_tpu.models.layers import conv_kernel_init, global_avg_pool


def generate_widths(w0: float, wa: float, wm: float, depth: int, group_w: int):
    """Per-stage (widths, depths) from the RegNet u_j = w0 + wa·j rule."""
    ks = np.round(
        np.log((w0 + wa * np.arange(depth)) / w0) / np.log(wm)
    )
    widths = w0 * np.power(wm, ks)
    widths = np.round(widths / 8) * 8
    # adjust to group width compatibility
    widths = [int(min(group_w, w) * round(w / min(group_w, w))) for w in widths]
    stage_widths, stage_depths = [], []
    for w in widths:
        if stage_widths and stage_widths[-1] == w:
            stage_depths[-1] += 1
        else:
            stage_widths.append(w)
            stage_depths.append(1)
    return stage_widths, stage_depths


class XBlock(nn.Module):
    """RegNet bottleneck (b=1) block with grouped 3x3; ``se_ratio`` > 0 adds
    the squeeze-excite of RegNetY (pycls AnyNet Y-block)."""

    features: int
    stride: int
    group_width: int
    se_ratio: float = 0.0
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        def bn(name):
            return nn.BatchNorm(
                use_running_average=not train, momentum=0.9, epsilon=1e-5,
                dtype=self.dtype, name=name,
            )

        conv = lambda f, k, s, g, name, pad: nn.Conv(
            f, (k, k), strides=(s, s), padding=pad, feature_group_count=g,
            use_bias=False, dtype=self.dtype, kernel_init=conv_kernel_init,
            name=name,
        )
        groups = max(1, self.features // self.group_width)
        identity = x
        out = conv(self.features, 1, 1, 1, "conv1", "VALID")(x)
        out = nn.relu(bn("bn1")(out))
        out = conv(self.features, 3, self.stride, groups, "conv2",
                   [(1, 1), (1, 1)])(out)
        out = nn.relu(bn("bn2")(out))
        if self.se_ratio > 0:
            # SE on the block input width (pycls convention)
            squeeze = max(1, int(round(x.shape[-1] * self.se_ratio)))
            s = jnp.mean(out, axis=(1, 2), keepdims=True)
            s = nn.relu(nn.Conv(squeeze, (1, 1), dtype=self.dtype,
                                name="se_reduce")(s))
            s = nn.sigmoid(nn.Conv(self.features, (1, 1), dtype=self.dtype,
                                   name="se_expand")(s))
            out = out * s
        out = conv(self.features, 1, 1, 1, "conv3", "VALID")(out)
        out = bn("bn3")(out)
        if self.stride != 1 or x.shape[-1] != self.features:
            identity = conv(self.features, 1, self.stride, 1, "proj", "VALID")(x)
            identity = bn("proj_bn")(identity)
        return nn.relu(out + identity)


class RegNetX(nn.Module):
    w0: float
    wa: float
    wm: float
    depth: int
    group_width: int
    num_classes: int = 1000
    se_ratio: float = 0.0  # > 0 = RegNetY
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = nn.Conv(
            32, (3, 3), strides=(2, 2), padding=[(1, 1), (1, 1)],
            use_bias=False, dtype=self.dtype, kernel_init=conv_kernel_init,
            name="stem_conv",
        )(x)
        x = nn.BatchNorm(
            use_running_average=not train, momentum=0.9, epsilon=1e-5,
            dtype=self.dtype, name="stem_bn",
        )(x)
        x = nn.relu(x)
        widths, depths = generate_widths(
            self.w0, self.wa, self.wm, self.depth, self.group_width
        )
        for si, (w, d) in enumerate(zip(widths, depths)):
            for bi in range(d):
                x = XBlock(
                    w, stride=2 if bi == 0 else 1,
                    group_width=self.group_width, se_ratio=self.se_ratio,
                    dtype=self.dtype,
                    name=f"s{si + 1}_b{bi + 1}",
                )(x, train)
        x = global_avg_pool(x).astype(jnp.float32)
        return nn.Dense(self.num_classes, dtype=jnp.float32, name="fc")(x)


# pycls RegNetX/Y flop-regime parameters (Y adds SE with ratio 0.25)
_PARAMS = {
    "regnetx_400m": dict(w0=24, wa=24.48, wm=2.54, depth=22, group_width=16),
    "regnetx_800m": dict(w0=56, wa=35.73, wm=2.28, depth=16, group_width=16),
    "regnetx_1600m": dict(w0=80, wa=34.01, wm=2.25, depth=18, group_width=24),
    "regnetx_3200m": dict(w0=88, wa=26.31, wm=2.25, depth=25, group_width=48),
    "regnetx_4000m": dict(w0=96, wa=38.65, wm=2.43, depth=23, group_width=40),
    "regnetx_6400m": dict(w0=184, wa=60.83, wm=2.07, depth=17, group_width=56),
    "regnety_200m": dict(w0=24, wa=36.44, wm=2.49, depth=13, group_width=8,
                         se_ratio=0.25),
    "regnety_400m": dict(w0=48, wa=27.89, wm=2.09, depth=16, group_width=8,
                         se_ratio=0.25),
    "regnety_600m": dict(w0=48, wa=32.54, wm=2.32, depth=15, group_width=16,
                         se_ratio=0.25),
    "regnety_800m": dict(w0=56, wa=38.84, wm=2.4, depth=14, group_width=16,
                         se_ratio=0.25),
    "regnety_1600m": dict(w0=48, wa=20.71, wm=2.65, depth=27, group_width=24,
                          se_ratio=0.25),
    "regnety_3200m": dict(w0=80, wa=42.63, wm=2.66, depth=21, group_width=24,
                          se_ratio=0.25),
    "regnety_4000m": dict(w0=96, wa=31.41, wm=2.24, depth=22, group_width=64,
                          se_ratio=0.25),
    "regnety_6400m": dict(w0=112, wa=33.22, wm=2.27, depth=25, group_width=72,
                          se_ratio=0.25),
}


def _make(name):
    def factory(**kw):
        kw.pop("bn", None)
        return RegNetX(**_PARAMS[name], **kw)

    return factory


REGNET_FACTORIES = {name: _make(name) for name in _PARAMS}
