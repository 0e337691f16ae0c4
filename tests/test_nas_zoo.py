"""NAS-era zoo tests: regnety, googlenet, budgeted stand-ins, eval_list names."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from robustart_tpu.models import create_classifier, model_names
from robustart_tpu.models.nas_zoo import _resnet18_flops, _widths_for_budget

# the full batch-eval list the reference enumerates (swin/config.yaml:8-10)
REFERENCE_EVAL_LIST = [
    "regnetx_3200m", "regnetx_4000m", "regnetx_6400m",
    "regnety_200m", "regnety_400m", "regnety_600m", "regnety_800m",
    "regnety_1600m", "regnety_3200m", "regnety_4000m", "regnety_6400m",
    "bignas_resnet18_9M", "bignas_resnet18_37M", "bignas_resnet18_50M",
    "bignas_resnet18_49M", "bignas_resnet18_65M", "bignas_resnet18_107M",
    "bignas_resnet18_125M", "bignas_resnet18_150M", "bignas_resnet18_312M",
    "bignas_resnet18_403M", "bignas_resnet18_492M", "bignas_resnet18_1555M",
    "bignas_det_resnet18_1930M", "bignas_resnet50_2954M",
    "bignas_resnet50_3145M", "bignas_resnet50_3811M",
    "dmcp_resnet18_47M", "dmna_resnet18_1800M",
    "shufflenet_v2_x0_5", "shufflenet_v2_x1_0", "shufflenet_v2_x1_5",
    "shufflenet_v2_x2_0",
    "oneshot_supcell_9M", "oneshot_supcell_27M", "oneshot_supcell_37M",
    "oneshot_supcell_55M", "oneshot_supcell_70M", "oneshot_supcell_91M",
    "oneshot_supcell_96M", "oneshot_supcell_113M", "oneshot_supcell_168M",
    "oneshot_supcell_304M", "oneshot_supcell_1710M", "oneshot_supcell_3072M",
    "crnas_resnet18c", "crnas_resnet50c", "crnas_resnet101c",
    "efficientnet_b0", "efficientnet_b1", "efficientnet_b2",
    "efficientnet_b3", "efficientnet_b4", "efficientnet_b5",
    "efficientnet_b6", "efficientnet_b7",
    "mobilenet_v3_small_x0_35", "mobilenet_v3_small_x0_5",
    "mobilenet_v3_small_x0_75", "mobilenet_v3_small_x1_0",
    "mobilenet_v3_small_x1_4",
    "mobilenet_v3_large_x0_35", "mobilenet_v3_large_x0_5",
    "mobilenet_v3_large_x0_75", "mobilenet_v3_large_x1_0",
    "mobilenet_v3_large_x1_4",
    "googlenet",
    "swin_base_224", "swin_base_384", "swin_small", "swin_tiny",
    "resnet18c_x0_125", "resnet18c_x0_25", "resnet18c_x0_5",
    "mixer_b16_224", "mixer_L16_224",
]


def test_every_reference_eval_list_name_resolves():
    names = set(model_names())
    missing = [n for n in REFERENCE_EVAL_LIST if n not in names]
    assert not missing, missing


def test_budgeted_widths_hit_flop_targets():
    for budget in (50, 300, 1800):
        widths = _widths_for_budget(budget)
        flops = _resnet18_flops(widths, (2, 2, 2, 2)) / 1e6
        assert 0.5 * budget < flops < 2.0 * budget, (budget, widths, flops)
    # monotone in the budget
    assert _widths_for_budget(50) < _widths_for_budget(500)


@pytest.mark.parametrize(
    "name", ["regnety_400m", "googlenet", "bignas_resnet18_150M",
             "crnas_resnet18c", "resnet18c_x0_25"],
)
def test_nas_models_forward(name):
    clf = create_classifier(name, rng=0, input_size=64, num_classes=10)
    out = clf(jnp.ones((1, 64, 64, 3)) * 0.5)
    assert out.shape == (1, 10)
    assert bool(jnp.isfinite(out).all())


def test_googlenet_param_parity():
    import jax

    # torchvision googlenet (BN, no aux): 6,624,904 params
    clf = create_classifier("googlenet", rng=0, input_size=64)
    n = sum(int(np.prod(p.shape)) for p in jax.tree.leaves(clf.variables["params"]))
    assert n == 6_624_904
