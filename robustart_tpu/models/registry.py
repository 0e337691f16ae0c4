"""Model zoo registry — ``get_model(name, **kwargs)``.

Equivalent of the reference's ``prototype.prototype.model.get_model``
(re-exported at reference RobustART/model/__init__.py:1; name vocabulary from
exprs/*/config.yaml ``model.type`` values, SURVEY.md §2.9). Returns a Flax
module; use :func:`create_classifier` for an initialized bundle.
"""

from __future__ import annotations

from typing import Any, Sequence

import jax

from robustart_tpu.core.registry import Registry
from robustart_tpu.models import mlp_mixer, resnet, vit
from robustart_tpu.models.classifier import Classifier, init_classifier
from robustart_tpu.models.layers import (
    CLIP_MEAN,
    CLIP_STD,
    IMAGENET_MEAN,
    IMAGENET_STD,
)

MODELS = Registry("model")

# name → (factory, default input size, mean, std)
_IMAGENET = (IMAGENET_MEAN, IMAGENET_STD)


def _register_family(entries: dict[str, Any], input_size: int = 224,
                     mean_std=_IMAGENET) -> None:
    for name, factory in entries.items():
        MODELS.register(name)(factory)
        _META[name] = {
            "input_size": input_size,
            "mean": mean_std[0],
            "std": mean_std[1],
        }


_META: dict[str, dict[str, Any]] = {}

_register_family(
    {
        # reference names both with and without the `_official` suffix
        "resnet18": resnet.resnet18,
        "resnet18_official": resnet.resnet18,
        "resnet34": resnet.resnet34,
        "resnet34_official": resnet.resnet34,
        "resnet50": resnet.resnet50,
        "resnet50_official": resnet.resnet50,
        "resnet101": resnet.resnet101,
        "resnet101_official": resnet.resnet101,
        "resnet152": resnet.resnet152,
        "resnet152_official": resnet.resnet152,
        "wide_resnet50_2": resnet.wide_resnet50_2,
        "wide_resnet101_2": resnet.wide_resnet101_2,
        "resnext50_32x4d": resnet.resnext50_32x4d,
        "resnext101_32x8d": resnet.resnext101_32x8d,
    }
)
_register_family(
    {
        "vit_b16_224": vit.vit_b16_224,
        "vit_base": vit.vit_b16_224,  # alias used by eval-loop configs
        "vit_b32_224": vit.vit_b32_224,
        "deit_tiny_b16_224": vit.deit_tiny_b16_224,
        "deit_small_b16_224": vit.deit_small_b16_224,
        "deit_base_b16_224": vit.deit_base_b16_224,
    }
)
_register_family(
    {
        "mixer_b16_224": mlp_mixer.mixer_b16_224,
        "mixer_L16_224": mlp_mixer.mixer_L16_224,
    }
)

from robustart_tpu.models import (  # noqa: E402  (grouped registrations)
    densenet,
    efficientnet,
    mobilenet,
    regnet,
    repvgg,
    shufflenet,
)

_register_family(
    {
        "mobilenet_v2": mobilenet.mobilenet_v2,
        "mobilenet_v3": mobilenet.mobilenet_v3,
        "shufflenet_v2_x0_5": shufflenet.shufflenet_v2_x0_5,
        "shufflenet_v2_x1_0": shufflenet.shufflenet_v2_x1_0,
        "shufflenet_v2_x1_5": shufflenet.shufflenet_v2_x1_5,
        "shufflenet_v2_x2_0": shufflenet.shufflenet_v2_x2_0,
        "densenet121": densenet.densenet121,
        "densenet169": densenet.densenet169,
        "densenet201": densenet.densenet201,
        "repvgg_A0": repvgg.repvgg_A0,
        "repvgg_B3": repvgg.repvgg_B3,
    }
)
_register_family(dict(regnet.REGNET_FACTORIES))

from robustart_tpu.models import clip_vit, convnext, swin  # noqa: E402

_register_family(
    {
        "convnext_base": convnext.convnext_base,
        "convnext_base_cvst": convnext.convnext_base,  # CvSt robust ckpts
        "convnextv2_base": convnext.convnextv2_base,
        "swin_tiny": swin.swin_tiny,
        "swin_small": swin.swin_small,
        "swin_base": swin.swin_base,
        "vit_base_cvst": vit.vit_b16_224,  # CvSt robust ViT checkpoints
    }
)
_register_family(
    {
        "clip_vit_l_14": clip_vit.clip_vit_l_14,
        "clip_vit_l_14_fare2_clip": clip_vit.clip_vit_l_14_fare2_clip,
        "clip_vit_l_14_tecoa2_clip": clip_vit.clip_vit_l_14_tecoa2_clip,
    },
    mean_std=(CLIP_MEAN, CLIP_STD),
)

from robustart_tpu.models import googlenet, nas_zoo  # noqa: E402

_register_family({"googlenet": googlenet.googlenet})
_register_family(dict(nas_zoo.NAS_FACTORIES))
# swin eval-list aliases (reference swin/config.yaml:10)
_register_family({"swin_base_224": swin.swin_base})


def _swin_base_384(**kw):
    # Swin-B at 384² uses window 12 (upstream swin_base_patch4_window12_384);
    # 384/4 = 96 spatial is not divisible by the 224-variant's window 7.
    kw.setdefault("window_size", 12)
    return swin.swin_base(**kw)


_register_family({"swin_base_384": _swin_base_384}, input_size=384)


def _mobilenet_v3_named(mode: str, scale: float):
    def factory(**kw):
        kw.pop("bn", None)
        kw.setdefault("dropout", 0.0)
        return mobilenet.mobilenet_v3(mode=mode, scale=scale, **kw)

    return factory


_register_family(
    {
        f"mobilenet_v3_{mode}_x{str(s).replace('.', '_')}":
            _mobilenet_v3_named(mode, s)
        for mode in ("small", "large")
        for s in (0.35, 0.5, 0.75, 1.0, 1.4)
    }
)
for _name, _factory in efficientnet.EFFICIENTNET_FACTORIES.items():
    _variant = _name.replace("efficientnet_", "").replace("_nodrop", "")
    _register_family(
        {_name: _factory}, input_size=efficientnet.SCALING[_variant][2]
    )


def model_names() -> list[str]:
    return MODELS.names()


def model_meta(name: str) -> dict[str, Any]:
    return dict(_META[name])


def get_model(name: str, **kwargs: Any):
    """Build a Flax module by zoo name with reference kwargs vocabulary."""
    return MODELS.create(name, **kwargs)


def create_classifier(
    name: str,
    rng: jax.Array | int = 0,
    input_size: int | None = None,
    mean: Sequence[float] | None = None,
    std: Sequence[float] | None = None,
    **kwargs: Any,
) -> Classifier:
    """Build and initialize a :class:`Classifier` bundle by zoo name."""
    meta = model_meta(name)
    module = get_model(name, **kwargs)
    return init_classifier(
        name,
        module,
        rng=rng,
        input_size=input_size or meta["input_size"],
        mean=mean or meta["mean"],
        std=std or meta["std"],
        num_classes=kwargs.get("num_classes"),
    )
