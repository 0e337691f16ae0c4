"""NAS-derived zoo names (bignas / oneshot_supcell / dmcp / dmna / crnas /
resnet18c) — FLOP-budget-parameterized stand-ins.

The reference batch-evaluates ~1200 NAS-derived checkpoints whose exact
layer-wise widths live in the missing ``prototype`` submodule and checkpoint
metadata (reference exprs/exp/swin/config.yaml:8 enumerates the names;
SURVEY.md §2.7). The architectures are NOT recoverable from the snapshot, so
this module provides *honest stand-ins*:

- ``crnas_resnet{18,50,101}c`` and ``resnet18c_x{0_125,0_25,0_5}`` are
  well-defined public architectures (ResNet-C deep-stem variants,
  He et al. "Bag of Tricks") and are implemented faithfully.
- ``bignas_resnet18_<F>M`` / ``oneshot_supcell_<F>M`` / ``dmcp_resnet18_47M``
  / ``dmna_resnet18_1800M`` resolve to width-scaled ResNet-18 variants whose
  width multiplier is solved analytically so the 224² forward FLOPs match the
  name's budget — the right scale class for fair throughput/robustness
  comparisons, but NOT the bit-exact NAS cell structure (loading a real
  checkpoint of these names requires its width metadata; the converter will
  report every mismatched tensor rather than silently mis-load).
"""

from __future__ import annotations

from functools import partial
from typing import Any, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from robustart_tpu.models.layers import MaxPool2d, conv_kernel_init, global_avg_pool


class ScaledBasicBlock(nn.Module):
    filters: int
    stride: int = 1
    downsample: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        conv = partial(nn.Conv, use_bias=False, dtype=self.dtype,
                       kernel_init=conv_kernel_init)
        bn = partial(nn.BatchNorm, use_running_average=not train,
                     momentum=0.9, epsilon=1e-5, dtype=self.dtype)
        identity = x
        out = conv(self.filters, (3, 3), strides=(self.stride, self.stride),
                   padding=[(1, 1), (1, 1)])(x)
        out = nn.relu(bn()(out))
        out = conv(self.filters, (3, 3), padding=[(1, 1), (1, 1)])(out)
        out = bn()(out)
        if self.downsample or x.shape[-1] != self.filters:
            identity = conv(self.filters, (1, 1),
                            strides=(self.stride, self.stride),
                            padding="VALID")(x)
            identity = bn()(identity)
        return nn.relu(out + identity)


class ScaledResNet18(nn.Module):
    """ResNet-18 topology with scalable stem/stage widths; optional
    ResNet-C deep stem (three 3x3 convs)."""

    widths: Sequence[int] = (64, 128, 256, 512)
    stage_sizes: Sequence[int] = (2, 2, 2, 2)
    deep_stem: bool = False
    num_classes: int = 1000
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        bn = partial(nn.BatchNorm, use_running_average=not train,
                     momentum=0.9, epsilon=1e-5, dtype=self.dtype)
        stem_w = self.widths[0]
        if self.deep_stem:
            for i, (w, s) in enumerate(
                [(stem_w // 2, 2), (stem_w // 2, 1), (stem_w, 1)]
            ):
                x = nn.Conv(max(w, 8), (3, 3), strides=(s, s),
                            padding=[(1, 1), (1, 1)], use_bias=False,
                            dtype=self.dtype, kernel_init=conv_kernel_init,
                            name=f"stem{i}")(x)
                x = nn.relu(bn(name=f"stem_bn{i}")(x))
        else:
            x = nn.Conv(stem_w, (7, 7), strides=(2, 2),
                        padding=[(3, 3), (3, 3)], use_bias=False,
                        dtype=self.dtype, kernel_init=conv_kernel_init,
                        name="conv1")(x)
            x = nn.relu(bn(name="bn1")(x))
        x = MaxPool2d()(x)
        for si, (w, n) in enumerate(zip(self.widths, self.stage_sizes)):
            for bi in range(n):
                x = ScaledBasicBlock(
                    w, stride=2 if (si > 0 and bi == 0) else 1,
                    dtype=self.dtype, name=f"layer{si + 1}_{bi}",
                )(x, train)
        x = global_avg_pool(x).astype(jnp.float32)
        return nn.Dense(self.num_classes, dtype=jnp.float32, name="fc")(x)


def _resnet18_flops(widths, stage_sizes, input_size=224) -> float:
    """Analytic 2·MAC forward FLOPs of the scaled ResNet-18 topology."""
    h = input_size // 2
    flops = 2 * h * h * 3 * widths[0] * 49  # 7x7 stem
    h //= 2  # maxpool
    cin = widths[0]
    for si, (w, n) in enumerate(zip(widths, stage_sizes)):
        for bi in range(n):
            stride = 2 if (si > 0 and bi == 0) else 1
            hout = h // stride
            flops += 2 * hout * hout * cin * w * 9
            flops += 2 * hout * hout * w * w * 9
            if stride != 1 or cin != w:
                flops += 2 * hout * hout * cin * w
            cin = w
            h = hout
    flops += 2 * cin * 1000
    return flops


def _widths_for_budget(mflops: float) -> tuple:
    """Solve a uniform width multiplier so 224² fwd FLOPs ≈ the budget."""
    base = (64, 128, 256, 512)
    lo, hi = 0.01, 4.0
    for _ in range(40):
        mid = (lo + hi) / 2
        widths = tuple(max(8, int(round(w * mid / 8) * 8)) for w in base)
        f = _resnet18_flops(widths, (2, 2, 2, 2)) / 1e6
        if f < mflops:
            lo = mid
        else:
            hi = mid
    return tuple(max(8, int(round(w * lo / 8) * 8)) for w in base)


def make_budgeted_resnet18(mflops: float):
    widths = _widths_for_budget(mflops)

    def factory(**kw):
        kw.pop("bn", None)
        return ScaledResNet18(widths=widths, **kw)

    return factory


def crnas_resnet_c(depth: int):
    stage_sizes = {18: (2, 2, 2, 2), 50: (3, 4, 6, 3), 101: (3, 4, 23, 3)}[depth]

    def factory(**kw):
        kw.pop("bn", None)
        return ScaledResNet18(
            widths=(64, 128, 256, 512), stage_sizes=stage_sizes,
            deep_stem=True, **kw,
        )

    return factory


def resnet18c_scaled(scale: float):
    widths = tuple(max(8, int(64 * 2**i * scale)) for i in range(4))

    def factory(**kw):
        kw.pop("bn", None)
        return ScaledResNet18(widths=widths, deep_stem=True, **kw)

    return factory


# the budget lists the reference enumerates (swin/config.yaml:8)
BIGNAS_BUDGETS = [9, 37, 49, 50, 65, 107, 125, 150, 312, 403, 492, 1555]
BIGNAS_RESNET50_BUDGETS = [2954, 3145, 3811]
ONESHOT_BUDGETS = [9, 27, 37, 55, 70, 91, 96, 113, 168, 304, 1710, 3072]

NAS_FACTORIES = {}
for _b in BIGNAS_BUDGETS:
    NAS_FACTORIES[f"bignas_resnet18_{_b}M"] = make_budgeted_resnet18(_b)
NAS_FACTORIES["bignas_det_resnet18_1930M"] = make_budgeted_resnet18(1930)
for _b in BIGNAS_RESNET50_BUDGETS:
    NAS_FACTORIES[f"bignas_resnet50_{_b}M"] = make_budgeted_resnet18(_b)
for _b in ONESHOT_BUDGETS:
    NAS_FACTORIES[f"oneshot_supcell_{_b}M"] = make_budgeted_resnet18(_b)
NAS_FACTORIES["dmcp_resnet18_47M"] = make_budgeted_resnet18(47)
NAS_FACTORIES["dmna_resnet18_1800M"] = make_budgeted_resnet18(1800)
NAS_FACTORIES["crnas_resnet18c"] = crnas_resnet_c(18)
NAS_FACTORIES["crnas_resnet50c"] = crnas_resnet_c(50)
NAS_FACTORIES["crnas_resnet101c"] = crnas_resnet_c(101)
NAS_FACTORIES["resnet18c_x0_125"] = resnet18c_scaled(0.125)
NAS_FACTORIES["resnet18c_x0_25"] = resnet18c_scaled(0.25)
NAS_FACTORIES["resnet18c_x0_5"] = resnet18c_scaled(0.5)
