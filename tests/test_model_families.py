"""Tests for the wider CNN zoo: parameter parity + forward shapes."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from robustart_tpu.models import create_classifier, get_model, model_names

SMALL = 64


def _params(clf):
    return sum(int(np.prod(p.shape)) for p in jax.tree.leaves(clf.variables["params"]))


@pytest.mark.parametrize(
    "name,kwargs,expected",
    [
        # torchvision parameter counts
        ("mobilenet_v2", {"scale": 1.0}, 3_504_872),
        ("mobilenet_v3", {"scale": 1.0, "mode": "large"}, 5_483_032),
        ("shufflenet_v2_x1_0", {}, 2_278_604),
        ("densenet121", {}, 7_978_856),
        ("efficientnet_b0", {}, 5_288_548),
    ],
)
def test_param_parity(name, kwargs, expected):
    clf = create_classifier(name, rng=0, input_size=SMALL, **kwargs)
    assert _params(clf) == expected


@pytest.mark.parametrize(
    "name,kwargs",
    [
        ("mobilenet_v2", {"scale": 0.5}),
        ("mobilenet_v3", {"scale": 0.35, "mode": "large", "dropout": 0.0}),
        ("shufflenet_v2_x0_5", {}),
        ("regnetx_400m", {}),
        ("repvgg_A0", {}),
        ("efficientnet_b0_nodrop", {}),
    ],
)
def test_forward_shapes(name, kwargs):
    clf = create_classifier(name, rng=0, input_size=SMALL, **kwargs)
    x = jnp.ones((2, SMALL, SMALL, 3)) * 0.5
    out = clf(x)
    assert out.shape == (2, 1000)
    assert bool(jnp.isfinite(out).all())


def test_reference_config_kwargs_accepted():
    # every family must tolerate the reference's bn kwargs block
    m = get_model(
        "mobilenet_v2", scale=0.75, bn={"use_sync_bn": False, "kwargs": {}}
    )
    assert m is not None


def test_efficientnet_meta_input_sizes():
    from robustart_tpu.models import model_meta

    assert model_meta("efficientnet_b0")["input_size"] == 224
    assert model_meta("efficientnet_b7_nodrop")["input_size"] == 600


def test_repvgg_reparameterization_equivalence():
    from robustart_tpu.models.repvgg import repvgg_A0, reparameterize_params, RepVGG

    module = repvgg_A0(num_classes=10)
    x = jax.random.uniform(jax.random.key(0), (2, 32, 32, 3))
    variables = module.init(jax.random.key(1), x, train=False)
    # randomize BN stats so fusion is non-trivial
    variables = jax.tree.map(
        lambda v: v + 0.05 * np.random.default_rng(0).standard_normal(v.shape).astype(v.dtype)
        if v.ndim >= 1 else v,
        variables,
    )
    ref = module.apply(variables, x, train=False)

    fused_vars = reparameterize_params(variables)
    deploy = RepVGG(
        num_blocks=(2, 4, 14, 1), width_a=0.75, width_b=2.5,
        num_classes=10, deploy=True,
    )
    out = deploy.apply(fused_vars, x, train=False)
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(ref), rtol=1e-4, atol=1e-3
    )


def test_zoo_covers_reference_inventory():
    names = set(model_names())
    required = {
        "mobilenet_v2", "mobilenet_v3",
        "shufflenet_v2_x0_5", "shufflenet_v2_x1_0", "shufflenet_v2_x1_5",
        "shufflenet_v2_x2_0",
        "densenet121", "densenet169", "densenet201",
        "regnetx_400m", "regnetx_800m", "regnetx_1600m", "regnetx_3200m",
        "regnetx_6400m",
        "repvgg_A0", "repvgg_B3",
    } | {f"efficientnet_b{i}" for i in range(8)} | {
        f"efficientnet_b{i}_nodrop" for i in range(8)
    }
    missing = required - names
    assert not missing, missing
