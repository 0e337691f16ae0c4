"""PyTorch checkpoint → Flax variables conversion.

The reference zoo loads torch ``.pth`` checkpoints with multi-layout
tolerance — dicts keyed ``state_dict`` / ``model`` / ``net`` or raw, with
optional ``module.`` prefixes (reference cifar10/code/test_cifar_c.py:169-187,
test_mul_adversarial.py:257-261). This module reproduces that tolerance and
maps tensors into the Flax module trees of robustart_tpu.models:

- conv weights OIHW → HWIO,
- linear weights (out, in) → (in, out),
- BN weight/bias/running_mean/running_var → scale/bias/mean/var,
- packed qkv kept packed (attention reshape order matches torch's).

Name translation is rule-based per family (ResNet, ViT/DeiT, MLP-Mixer,
and CNN families that follow torch naming).
"""

from __future__ import annotations

import re
from typing import Any

import numpy as np

from robustart_tpu.core.logging import get_logger

logger = get_logger(__name__)


def read_torch_state_dict(path: str) -> dict[str, np.ndarray]:
    """Load a torch checkpoint tolerating the reference's layout zoo."""
    import torch

    obj = torch.load(path, map_location="cpu", weights_only=False)
    for key in ("state_dict", "model", "net"):
        if isinstance(obj, dict) and key in obj and isinstance(obj[key], dict):
            obj = obj[key]
            break
    if not isinstance(obj, dict):
        raise ValueError(f"unrecognized checkpoint layout in {path}")
    out = {}
    for k, v in obj.items():
        if k.startswith("module."):
            k = k[len("module."):]
        # torch MultiheadAttention flattens in_proj params into attribute
        # names; normalize to dotted form for the rule machinery (CLIP)
        k = k.replace("in_proj_weight", "in_proj.weight")
        k = k.replace("in_proj_bias", "in_proj.bias")
        if hasattr(v, "numpy"):
            out[k] = v.detach().cpu().numpy()
    return out


# -- flax tree <-> flat names -------------------------------------------------


def flatten(tree: Any, prefix: str = "") -> dict[str, Any]:
    out = {}
    if isinstance(tree, dict):
        for k, v in tree.items():
            out.update(flatten(v, f"{prefix}{k}/"))
        return out
    out[prefix.rstrip("/")] = tree
    return out


def unflatten(flat: dict[str, Any]) -> dict:
    root: dict = {}
    for name, value in flat.items():
        parts = name.split("/")
        node = root
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = value
    return root


# -- name translation rules ---------------------------------------------------

# Each rule: flax regex -> torch format string (groups reused positionally).


def _resnet_torch_name(flax_name: str) -> str | None:
    """Map a flax ResNet param path to the torchvision key (sans suffix)."""
    n = flax_name
    n = re.sub(r"^layer(\d)_(\d+)/", r"layer\1.\2.", n)
    n = n.replace("downsample_conv", "downsample.0")
    n = n.replace("downsample_bn", "downsample.1")
    # unnamed convs inside blocks: Conv_0/1/2 -> conv1/2/3
    n = re.sub(r"Conv_(\d)", lambda m: f"conv{int(m.group(1)) + 1}", n)
    n = n.replace("/", ".")
    return n


def _vit_torch_name(flax_name: str) -> str | None:
    n = flax_name
    n = re.sub(r"^block(\d+)/", r"blocks.\1.", n)
    n = n.replace("patch_embed", "patch_embed.proj")
    n = n.replace("mlp/fc", "mlp.fc")
    n = n.replace("/", ".")
    return n


def _mixer_torch_name(flax_name: str) -> str | None:
    n = flax_name
    n = re.sub(r"^block(\d+)/", r"blocks.\1.", n)
    n = n.replace("stem", "stem.proj")
    n = n.replace("mlp_tokens/fc", "mlp_tokens.fc")
    n = n.replace("mlp_channels/fc", "mlp_channels.fc")
    n = n.replace("/", ".")
    return n


def _mobilenet_v2_torch_name(flax_name: str) -> str | None:
    """torchvision mobilenet_v2: features.0 stem, features.1-17 inverted
    residuals (Sequential 'conv' with index layout depending on expand_ratio),
    features.18 head conv, classifier.1."""
    n = flax_name
    m = re.match(r"^ConvBNAct_(\d)/(Conv_0|BatchNorm_0)$", n)
    if m:
        feat = "0" if m.group(1) == "0" else "18"
        sub = "0" if m.group(2) == "Conv_0" else "1"
        return f"features.{feat}.{sub}"
    if n == "classifier":
        return "classifier.1"
    m = re.match(r"^InvertedResidualV2_(\d+)/ConvBNAct_(\d)/(Conv_0|BatchNorm_0)$", n)
    if m:
        block = int(m.group(1))
        part = int(m.group(2))
        is_conv = m.group(3) == "Conv_0"
        feat = block + 1
        if block == 0:  # expand_ratio == 1: [dw(0.0,0.1), proj(1), bn(2)]
            layout = {
                (0, True): "conv.0.0", (0, False): "conv.0.1",
                (1, True): "conv.1", (1, False): "conv.2",
            }
        else:  # [expand(0.0,0.1), dw(1.0,1.1), proj(2), bn(3)]
            layout = {
                (0, True): "conv.0.0", (0, False): "conv.0.1",
                (1, True): "conv.1.0", (1, False): "conv.1.1",
                (2, True): "conv.2", (2, False): "conv.3",
            }
        return f"features.{feat}.{layout[(part, is_conv)]}"
    return n.replace("/", ".")


def _densenet_torch_name(flax_name: str) -> str | None:
    """torchvision densenet: features.{conv0,norm0,denseblockB.denselayerL.
    {norm1,conv1,norm2,conv2},transitionB.{norm,conv},norm5}, classifier."""
    n = flax_name
    if n in ("conv0", "norm0", "norm5"):
        return f"features.{n}"
    if n == "classifier":
        return "classifier"
    m = re.match(
        r"^denseblock(\d+)_layer(\d+)/_BNReLUConv_(\d)/(Conv_0|BatchNorm_0)$", n
    )
    if m:
        b, l, half = m.group(1), m.group(2), int(m.group(3))
        kind = "conv" if m.group(4) == "Conv_0" else "norm"
        return f"features.denseblock{b}.denselayer{l}.{kind}{half + 1}"
    m = re.match(r"^transition(\d+)/(Conv_0|BatchNorm_0)$", n)
    if m:
        kind = "conv" if m.group(2) == "Conv_0" else "norm"
        return f"features.transition{m.group(1)}.{kind}"
    return n.replace("/", ".")


def _convnext_torch_name(flax_name: str) -> str | None:
    """facebook ConvNeXt: downsample_layers.i.{0,1}, stages.i.j.{dwconv,norm,
    pwconv1,pwconv2,gamma}, norm, head."""
    n = flax_name
    if n == "stem_conv":
        return "downsample_layers.0.0"
    if n == "stem_norm":
        return "downsample_layers.0.1"
    m = re.match(r"^downsample_norm(\d)$", n)
    if m:
        return f"downsample_layers.{m.group(1)}.0"
    m = re.match(r"^downsample_conv(\d)$", n)
    if m:
        return f"downsample_layers.{m.group(1)}.1"
    if n == "head_norm":
        return "norm"
    if n == "head":
        return "head"
    n = re.sub(r"^stage(\d)_block(\d+)(/|$)", r"stages.\1.\2.", n)
    return n.replace("/", ".").rstrip(".")


def _swin_torch_name(flax_name: str) -> str | None:
    """Official microsoft Swin naming: patch_embed.{proj,norm},
    layers.S.blocks.B.{norm1,attn.*,norm2,mlp.fc*},
    layers.S.downsample.{norm,reduction}, norm, head."""
    n = flax_name
    if n == "patch_embed":
        return "patch_embed.proj"
    if n == "patch_norm":
        return "patch_embed.norm"
    m = re.match(r"^merge_norm(\d)$", n)
    if m:
        return f"layers.{int(m.group(1)) - 1}.downsample.norm"
    m = re.match(r"^merge_reduction(\d)$", n)
    if m:
        return f"layers.{int(m.group(1)) - 1}.downsample.reduction"
    n = re.sub(r"^stage(\d)_block(\d+)/", r"layers.\1.blocks.\2.", n)
    n = n.replace("mlp_fc", "mlp.fc")
    return n.replace("/", ".")


def _clip_torch_name(flax_name: str) -> str | None:
    """OpenAI CLIP visual tower: visual.conv1 patch, visual.transformer.
    resblocks.i.{ln_1,attn.{in_proj,out_proj},ln_2,mlp.{c_fc,c_proj}},
    visual.{ln_pre,ln_post,proj,class_embedding,positional_embedding}."""
    n = flax_name
    if n == "patch_embed":
        return "visual.conv1"
    if n in ("ln_pre", "ln_post"):
        return f"visual.{n}"
    if n in ("class_embedding", "positional_embedding", "proj"):
        return f"visual.{n}"
    m = re.match(r"^resblock(\d+)/(.*)$", n)
    if m:
        i, rest = m.group(1), m.group(2)
        rest = {
            "qkv": "attn.in_proj",
            "out_proj": "attn.out_proj",
            "mlp_fc": "mlp.c_fc",
            "mlp_proj": "mlp.c_proj",
        }.get(rest, rest)
        return f"visual.transformer.resblocks.{i}.{rest}"
    return n.replace("/", ".")


def _shufflenet_torch_name(flax_name: str) -> str | None:
    """torchvision shufflenetv2: conv1.{0,1}, stageS.I.branch{1,2}.J,
    conv5.{0,1}, fc."""
    n = flax_name
    m = re.match(r"^_ConvBN_([01])/(Conv_0|BatchNorm_0)$", n)
    if m:
        top = "conv1" if m.group(1) == "0" else "conv5"
        return f"{top}.{0 if m.group(2) == 'Conv_0' else 1}"
    m = re.match(r"^stage(\d)_(\d+)/_ConvBN_(\d)/(Conv_0|BatchNorm_0)$", n)
    if m:
        stage, block, j = m.group(1), int(m.group(2)), int(m.group(3))
        conv = m.group(4) == "Conv_0"
        if block == 0 and j < 2:  # stride block's branch1: dw, 1x1
            idx = [0, 2][j] + (0 if conv else 1)
            return f"stage{stage}.{block}.branch1.{idx}"
        jj = j - 2 if block == 0 else j  # branch2 sub-index
        idx = [0, 3, 5][jj] + (0 if conv else 1)
        return f"stage{stage}.{block}.branch2.{idx}"
    return n.replace("/", ".")


def _repvgg_torch_name(flax_name: str) -> str | None:
    """DingXiaoH/RepVGG naming: stage0.rbr_{dense,1x1}.{conv,bn},
    rbr_identity, stageS.I.rbr_*, linear."""
    n = flax_name
    n = re.sub(r"^stage(\d)_(\d+)/", r"stage\1.\2.", n)
    n = n.replace("stage0/", "stage0.")
    n = n.replace("conv3x3", "rbr_dense.conv").replace("bn3x3", "rbr_dense.bn")
    n = n.replace("conv1x1", "rbr_1x1.conv").replace("bn1x1", "rbr_1x1.bn")
    n = n.replace("bn_id", "rbr_identity")
    return n.replace("/", ".")


def _make_efficientnet_rule(module):
    """torchvision EfficientNet naming, parameterized by the module's depth
    multiplier: features.0.{0,1} stem, features.{s}.{i}.block.{j} MBConvs
    (j layout depends on expand_ratio), features.8.{0,1} head, classifier.1.
    """
    import math

    from robustart_tpu.models.efficientnet import _BASE_BLOCKS

    def d(n):
        return int(math.ceil(n * module.depth_mult))

    # flat MBConv index -> (feature stage 1..7, intra-stage idx, expand_ratio)
    placement = []
    for si, (expand, _c, repeats, _s, _k) in enumerate(_BASE_BLOCKS):
        for i in range(d(repeats)):
            placement.append((si + 1, i, expand))

    def rule(flax_name: str) -> str:
        n = flax_name
        m = re.match(r"^_ConvBNSiLU_([01])/(Conv_0|BatchNorm_0)$", n)
        if m:
            feat = "0" if m.group(1) == "0" else "8"
            sub = "0" if m.group(2) == "Conv_0" else "1"
            return f"features.{feat}.{sub}"
        if n == "classifier":
            return "classifier.1"
        m = re.match(r"^MBConv_(\d+)/(.+)$", n)
        if m:
            bi = int(m.group(1))
            rest = m.group(2)
            stage, idx, expand = placement[bi]
            # torchvision block Sequential layout
            if expand == 1:  # [dw(0), se(1), project(2)]
                layout = {
                    "_ConvBNSiLU_0/Conv_0": "block.0.0",
                    "_ConvBNSiLU_0/BatchNorm_0": "block.0.1",
                    "se_reduce": "block.1.fc1",
                    "se_expand": "block.1.fc2",
                    "_ConvBNSiLU_1/Conv_0": "block.2.0",
                    "_ConvBNSiLU_1/BatchNorm_0": "block.2.1",
                }
            else:  # [expand(0), dw(1), se(2), project(3)]
                layout = {
                    "_ConvBNSiLU_0/Conv_0": "block.0.0",
                    "_ConvBNSiLU_0/BatchNorm_0": "block.0.1",
                    "_ConvBNSiLU_1/Conv_0": "block.1.0",
                    "_ConvBNSiLU_1/BatchNorm_0": "block.1.1",
                    "se_reduce": "block.2.fc1",
                    "se_expand": "block.2.fc2",
                    "_ConvBNSiLU_2/Conv_0": "block.3.0",
                    "_ConvBNSiLU_2/BatchNorm_0": "block.3.1",
                }
            sub = layout.get(rest, rest.replace("/", "."))
            return f"features.{stage}.{idx}.{sub}"
        return n.replace("/", ".")

    return rule


def _make_regnet_rule(module):
    """pycls RegNet naming: stem.{conv,bn}, sS.bB.{proj,bn,f.{a,a_bn,b,b_bn,
    se.f_ex.{0,2},c,c_bn}}, head.fc."""
    del module

    def rule(flax_name: str) -> str:
        n = flax_name
        if n == "stem_conv":
            return "stem.conv"
        if n == "stem_bn":
            return "stem.bn"
        if n == "fc":
            return "head.fc"
        m = re.match(r"^(s\d+_b\d+)/(.+)$", n)
        if m:
            block = m.group(1).replace("_", ".")
            rest = {
                "conv1": "f.a", "bn1": "f.a_bn",
                "conv2": "f.b", "bn2": "f.b_bn",
                "conv3": "f.c", "bn3": "f.c_bn",
                "proj": "proj", "proj_bn": "bn",
                "se_reduce": "f.se.f_ex.0", "se_expand": "f.se.f_ex.2",
            }.get(m.group(2), m.group(2))
            return f"{block}.{rest}"
        return n.replace("/", ".")

    return rule


_FAMILY_RULES = {
    "ResNet": _resnet_torch_name,
    "CifarResNet": _resnet_torch_name,
    "ShuffleNetV2": _shufflenet_torch_name,
    "RepVGG": _repvgg_torch_name,
    "VisionTransformer": _vit_torch_name,
    "MlpMixer": _mixer_torch_name,
    "MobileNetV2": _mobilenet_v2_torch_name,
    "DenseNet": _densenet_torch_name,
    "ConvNeXt": _convnext_torch_name,
    "SwinTransformer": _swin_torch_name,
    "CLIPVisionClassifier": _clip_torch_name,
}

# families whose rule depends on module hyperparameters
_FAMILY_RULE_FACTORIES = {
    "EfficientNet": _make_efficientnet_rule,
    "RegNetX": _make_regnet_rule,
}

_SUFFIX_MAP = {
    "kernel": "weight",
    "scale": "weight",
    "bias": "bias",
    "mean": "running_mean",
    "var": "running_var",
    "cls_token": "cls_token",
    "pos_embed": "pos_embed",
    # ConvNeXt layer-scale / GRN parameters keep their names in torch
    "gamma": "gamma",
    "beta": "beta",
}


def _swin_merge_fixup(flax_name: str, v: np.ndarray) -> np.ndarray:
    """Reorder patch-merging inputs: microsoft PatchMerging concatenates
    [x0, x1, x2, x3] with x1 = x[1::2, 0::2] and x2 = x[0::2, 1::2]
    (microsoft Swin-Transformer models/swin_transformer.py PatchMerging),
    while our reshape-transpose merge produces [x0, x2, x1, x3]. Swap the
    middle two c-wide groups of the merge LayerNorm params and the
    reduction kernel's input dim (verified by
    tests/test_convert_parity_transformers.py::test_swin_forward_parity)."""
    if not re.match(r".*merge_(norm|reduction)\d+/(scale|bias|kernel)$",
                    flax_name):
        return v
    c = v.shape[0] // 4
    perm = np.concatenate(
        [np.arange(c), 2 * c + np.arange(c), c + np.arange(c),
         3 * c + np.arange(c)]
    )
    return v[perm]


def model_head_dim(module) -> int | None:
    """Attention head dim for transformer families (None for CNNs) — needed
    by the qkv head-major permutation at conversion time."""
    cls = type(module).__name__
    if cls in ("VisionTransformer", "CifarViT"):
        return module.embed_dim // module.num_heads
    if cls == "SwinTransformer":
        # head_dim is constant across stages (dim and heads double together)
        return module.embed_dim // module.num_heads[0]
    if cls == "CLIPVisionClassifier":
        return module.width // module.num_heads
    return None


def _qkv_headmajor_fixup(head_dim: int):
    """Torch packs qkv 3-major — rows [q; k; v], each (H, D) — while our
    models use the head-major (H, 3, D) column order (models/vit.py
    Attention: the Megatron TP layout, so a column shard is a contiguous
    head group). Permute the packed output axis accordingly."""

    def fixup(flax_name: str, v: np.ndarray) -> np.ndarray:
        if not re.search(r"qkv/(kernel|bias)$", flax_name):
            return v
        three_c = v.shape[-1]
        h = three_c // 3 // head_dim
        if flax_name.endswith("kernel"):
            w = v.reshape(v.shape[0], 3, h, head_dim)
            return np.transpose(w, (0, 2, 1, 3)).reshape(v.shape)
        bm = v.reshape(3, h, head_dim)
        return np.transpose(bm, (1, 0, 2)).reshape(v.shape)

    return fixup


def _convert_tensor(flax_name: str, torch_value: np.ndarray, target_shape):
    v = torch_value
    if v.ndim == 4 and flax_name.endswith("kernel"):
        v = np.transpose(v, (2, 3, 1, 0))  # OIHW -> HWIO
    elif v.ndim == 2 and flax_name.endswith("kernel"):
        v = v.T
    if tuple(v.shape) != tuple(target_shape):
        if v.size == int(np.prod(target_shape)):
            v = v.reshape(target_shape)
        else:
            return None
    return v


def convert_state_dict(
    state_dict: dict[str, np.ndarray], variables: Any, family,
    head_dim: int | None = None,
) -> tuple[Any, list[str]]:
    """Convert a torch state dict into the flax ``variables`` structure.

    ``family`` is a family name from ``_FAMILY_RULES`` or a rule callable
    (module-parameterized families use ``resolve_rule``). ``head_dim`` is
    REQUIRED when the target has packed qkv layers (transformers) — pass
    ``model_head_dim(module)`` — so the 3-major → head-major column
    permutation is applied; forgetting it would silently scramble
    attention. Returns (new_variables, missing_names);
    absent/shape-incompatible tensors keep their initialized values and are
    reported.
    """
    rule = _FAMILY_RULES[family] if isinstance(family, str) else family
    flat = flatten(variables)
    fixups = []
    if rule is _swin_torch_name:
        fixups.append(_swin_merge_fixup)
    if any(re.search(r"qkv/(kernel|bias)$", n) for n in flat):
        if head_dim is None:
            raise ValueError(
                "target has packed qkv layers: pass "
                "head_dim=model_head_dim(module) so the head-major "
                "permutation is applied"
            )
        fixups.append(_qkv_headmajor_fixup(head_dim))

    def fixup(name, v):
        for f in fixups:
            v = f(name, v)
        return v
    out = {}
    missing = []
    for name, value in flat.items():
        collection, _, param_path = name.partition("/")
        leaf = param_path.rsplit("/", 1)[-1]
        base = param_path.rsplit("/", 1)[0] if "/" in param_path else ""
        if leaf == "conv1_kernel":  # ResNet s2d stem keeps a flat param
            torch_key = "conv1.weight"
        elif leaf in ("cls_token", "pos_embed"):
            torch_key = leaf
        elif leaf not in _SUFFIX_MAP:
            # whole-leaf params (CLIP embeddings/proj, Swin rpb table):
            # the family rule translates the full path
            torch_key = rule(param_path)
        else:
            suffix = _SUFFIX_MAP.get(leaf)
            torch_base = rule(base) if base else ""
            torch_key = f"{torch_base}.{suffix}" if torch_base else suffix
        src = state_dict.get(torch_key)
        conv = _convert_tensor(name, src, np.shape(value)) if src is not None else None
        if conv is None:
            missing.append(f"{name} <- {torch_key}")
            out[name] = value
        else:
            conv = fixup(name, np.asarray(conv))
            out[name] = np.asarray(conv, dtype=np.asarray(value).dtype)
    return unflatten(out), missing


def resolve_rule(module):
    """Name-translation rule for a Flax module (static or module-aware)."""
    cls = type(module).__name__
    if cls in _FAMILY_RULES:
        return _FAMILY_RULES[cls]
    if cls in _FAMILY_RULE_FACTORIES:
        return _FAMILY_RULE_FACTORIES[cls](module)
    raise ValueError(f"no torch-conversion rules for module family {cls!r}")


def detect_family(module) -> str:
    cls = type(module).__name__
    if cls in _FAMILY_RULES or cls in _FAMILY_RULE_FACTORIES:
        return cls
    raise ValueError(f"no torch-conversion rules for module family {cls!r}")


def load_torch_checkpoint(
    path: str, classifier, clip_zero_shot: dict | None = None
) -> Any:
    """Load + convert a torch checkpoint for a Classifier; returns variables.

    ``clip_zero_shot`` (CLIP vision classifiers only) makes a RAW OpenAI
    checkpoint (vision+text towers, reference config_clip_openai.yaml)
    self-sufficient: the ``zero_shot_weights`` head is computed from the
    ckpt's own text tower over the 80-prompt ensemble. Keys:

    - ``weights``: path to a precomputed ``.npz``/``.npy`` (from
      ``python -m robustart_tpu.tools.clip_zero_shot``), or
    - ``classnames``: text file (one class name per line) +
      ``bpe``: the CLIP BPE merges file (``bpe_simple_vocab_16e6.txt.gz``).
    """
    state_dict = read_torch_state_dict(path)
    rule = resolve_rule(classifier.module)
    variables, missing = convert_state_dict(
        state_dict, classifier.variables, rule,
        head_dim=model_head_dim(classifier.module),
    )
    if (clip_zero_shot
            and type(classifier.module).__name__ == "CLIPVisionClassifier"):
        zs = _resolve_clip_zero_shot(state_dict, clip_zero_shot)
        want = variables["params"]["zero_shot_weights"].shape
        if zs.shape != want:
            raise ValueError(
                f"zero_shot_weights shape {zs.shape} != model head {want}"
            )
        import jax.numpy as jnp

        params = dict(variables["params"])
        params["zero_shot_weights"] = jnp.asarray(zs)
        variables = {**variables, "params": params}
        missing = [m for m in missing if "zero_shot" not in m]
        logger.info("clip zero-shot head: %s classes computed/loaded",
                    zs.shape[1])
    if missing:
        logger.warning(
            "torch ckpt %s: %d tensors not converted (first: %s)",
            path, len(missing), missing[:3],
        )
    return variables


def _resolve_clip_zero_shot(state_dict, spec: dict) -> np.ndarray:
    """(embed_dim, n_classes) head from a precomputed file or the ckpt's
    own text tower (models/clip_text.py)."""
    if spec.get("weights"):
        w = np.load(spec["weights"])
        if hasattr(w, "files"):  # npz
            w = w[w.files[0]]
        return np.asarray(w, np.float32)
    from robustart_tpu.models.clip_text import (
        SimpleTokenizer,
        compute_zero_shot_weights,
    )

    with open(spec["classnames"]) as f:
        classnames = [ln.strip() for ln in f if ln.strip()]
    tok = SimpleTokenizer(spec["bpe"])
    # OpenAI text towers use width//64 heads; ``num_heads`` overrides for
    # non-standard towers
    return compute_zero_shot_weights(
        state_dict, classnames, tokenizer=tok,
        num_heads=spec.get("num_heads"),
    )
