"""Torch→Flax forward-parity fixtures: Swin Transformer (microsoft naming)
and CLIP visual tower (openai naming) — VERDICT r1 item 5.

These catch the silent-permutation class of conversion bug (packed qkv
ordering, patch-merge concat order, in_proj packing) that name-mapping
completeness tests cannot see.
"""

import numpy as np
import torch

from robustart_tpu.models.classifier import init_classifier
from robustart_tpu.models.torch_convert import convert_state_dict

from tests.torch_ref_models import MSSwin, OAIVisionTransformer

MEAN = np.array([0.485, 0.456, 0.406], np.float32)
STD = np.array([0.229, 0.224, 0.225], np.float32)


def test_swin_forward_parity():
    from robustart_tpu.models.swin import SwinTransformer

    torch.manual_seed(7)
    net = MSSwin(img_size=112, embed_dim=24, depths=(2, 2), num_heads=(3, 6),
                 window_size=7, num_classes=10)
    # non-trivial relative position bias (init is zeros)
    with torch.no_grad():
        for name, p in net.named_parameters():
            if "relative_position_bias_table" in name:
                p.normal_(0, 0.5)
    net.eval()
    sd = {k: v.numpy() for k, v in net.state_dict().items()}

    module = SwinTransformer(
        embed_dim=24, depths=(2, 2), num_heads=(3, 6), window_size=7,
        num_classes=10, drop_path=0.0,
    )
    clf = init_classifier("swin_mini", module, rng=0, input_size=112)
    variables, missing = convert_state_dict(
        sd, clf.variables, "SwinTransformer", head_dim=24 // 3
    )
    assert missing == [], missing[:8]
    clf.variables = variables

    x = np.random.default_rng(1).uniform(0, 1, (2, 112, 112, 3))
    x = x.astype(np.float32)
    with torch.no_grad():
        ref = net(
            torch.from_numpy(((x - MEAN) / STD).transpose(0, 3, 1, 2).copy())
        ).numpy()
    ours = np.asarray(clf(x))
    np.testing.assert_allclose(ours, ref, atol=5e-4, rtol=1e-3)


def test_clip_visual_forward_parity():
    from robustart_tpu.models.clip_vit import CLIPVisionClassifier

    torch.manual_seed(8)
    net = OAIVisionTransformer(
        input_resolution=56, patch_size=14, width=64, layers=2, heads=4,
        output_dim=32,
    )
    net.eval()
    sd = {}
    for k, v in net.state_dict().items():
        k = k.replace("in_proj_weight", "in_proj.weight")
        k = k.replace("in_proj_bias", "in_proj.bias")
        sd[f"visual.{k}"] = v.numpy()

    module = CLIPVisionClassifier(
        patch_size=14, width=64, depth=2, num_heads=4, embed_dim=32,
        num_classes=10,
    )
    clf = init_classifier("clip_mini", module, rng=0, input_size=56)
    variables, missing = convert_state_dict(
        sd, clf.variables, "CLIPVisionClassifier", head_dim=64 // 4
    )
    # only the framework-side zero-shot head has no torch counterpart
    assert sorted(m.split(" <- ")[0] for m in missing) == [
        "params/logit_scale",
        "params/zero_shot_weights",
    ], missing
    clf.variables = variables

    x = np.random.default_rng(2).uniform(0, 1, (2, 56, 56, 3)).astype(np.float32)
    with torch.no_grad():
        feats = net(
            torch.from_numpy(((x - MEAN) / STD).transpose(0, 3, 1, 2).copy())
        ).numpy()
    # replicate the zero-shot head on the torch features
    w = np.asarray(variables["params"]["zero_shot_weights"])
    ls = float(np.asarray(variables["params"]["logit_scale"]))
    fn = feats / np.linalg.norm(feats, axis=-1, keepdims=True)
    wn = w / np.linalg.norm(w, axis=0, keepdims=True)
    ref_logits = np.exp(ls) * (fn @ wn)

    ours = np.asarray(clf(x))
    np.testing.assert_allclose(ours, ref_logits, atol=5e-4, rtol=1e-3)
