"""AutoAttack component + cascade tests on a tiny model.

Invariants mirrored from the reference's own self-checks
(reference autoattack.py:199-209): eps-ball containment, [0,1] box, no NaNs,
and robust accuracy non-increasing along the cascade.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from robustart_tpu.attacks.autoattack import (
    AutoAttack,
    apgd_attack,
    fab_attack_targeted,
    square_attack_linf,
)
from robustart_tpu.attacks.autoattack.apgd import checkpoint_mask
from robustart_tpu.attacks.autoattack.fab import (
    proj_plane_box_l1,
    proj_plane_box_l2,
    proj_plane_box_linf,
)
from robustart_tpu.models.classifier import init_classifier
from tests.test_attacks import TinyNet, N_CLASSES, SIZE


@pytest.fixture(scope="module")
def clf():
    return init_classifier(
        "tiny", TinyNet(), rng=0, input_size=SIZE, num_classes=N_CLASSES
    )


@pytest.fixture(scope="module")
def batch(clf):
    x = jax.random.uniform(jax.random.key(42), (8, SIZE, SIZE, 3))
    # use the model's own predictions as labels -> 100% clean accuracy
    y = jnp.argmax(clf(x), 1)
    return np.asarray(x), np.asarray(y)


def _fn(clf):
    return lambda v, img: clf.apply_fn(v, img, train=False)


def test_checkpoint_schedule():
    mask = checkpoint_mask(100)
    ws = np.nonzero(mask)[0]
    assert ws[0] == 22  # p_1 = 0.22
    assert all(np.diff(ws) >= 3)  # gaps shrink to the 0.06 floor -> >=6, cap 3
    assert ws[-1] <= 100


EPS = 0.05


@pytest.mark.parametrize("loss", ["ce", "dlr"])
def test_apgd_constraints_and_effect(clf, batch, loss):
    x, y = batch
    x_adv, f_best = apgd_attack(
        _fn(clf), clf.variables, jnp.asarray(x), jnp.asarray(y),
        jax.random.key(0), eps=EPS, norm="Linf", loss=loss, n_iter=20,
    )
    x_adv = np.asarray(x_adv)
    assert np.abs(x_adv - x).max() <= EPS + 1e-6
    assert x_adv.min() >= 0 and x_adv.max() <= 1
    assert np.isfinite(x_adv).all()
    # the attack should fool at least one sample of this weak model
    pred = np.asarray(jnp.argmax(clf(jnp.asarray(x_adv)), 1))
    assert (pred != y).sum() >= 1


def test_apgd_l2(clf, batch):
    x, y = batch
    x_adv, _ = apgd_attack(
        _fn(clf), clf.variables, jnp.asarray(x), jnp.asarray(y),
        jax.random.key(0), eps=1.0, norm="L2", loss="ce", n_iter=10,
    )
    delta = np.asarray(x_adv) - x
    norms = np.sqrt((delta.reshape(8, -1) ** 2).sum(1))
    assert norms.max() <= 1.0 + 1e-4


def test_projection_linf():
    key = jax.random.key(0)
    x0 = jax.random.uniform(key, (4, 6, 6, 3))
    g = jax.random.normal(jax.random.fold_in(key, 1), x0.shape)
    gf = g.reshape(4, -1)
    base = jnp.sum(gf * x0.reshape(4, -1), 1)
    b = base + 0.5
    d = proj_plane_box_linf(x0, g, b)
    x_star = np.asarray(x0 + d)
    # constraint satisfied
    np.testing.assert_allclose(
        (gf * x_star.reshape(4, -1)).sum(1), np.asarray(b), rtol=1e-3
    )
    assert x_star.min() >= -1e-6 and x_star.max() <= 1 + 1e-6
    # minimality: Linf norm should be small (much less than moving everything)
    assert np.abs(np.asarray(d)).max() < 0.5


@pytest.mark.parametrize("proj", [proj_plane_box_l2, proj_plane_box_l1])
def test_projection_l2_l1(proj):
    key = jax.random.key(3)
    x0 = jax.random.uniform(key, (4, 6, 6, 3))
    g = jax.random.normal(jax.random.fold_in(key, 1), x0.shape)
    gf = g.reshape(4, -1)
    base = jnp.sum(gf * x0.reshape(4, -1), 1)
    b = base + 0.4
    d = proj(x0, g, b)
    x_star = np.asarray(x0 + d)
    np.testing.assert_allclose(
        (gf * x_star.reshape(4, -1)).sum(1), np.asarray(b), rtol=1e-2, atol=1e-3
    )
    assert x_star.min() >= -1e-6 and x_star.max() <= 1 + 1e-6


def test_fab_targeted(clf, batch):
    x, y = batch
    logits = np.asarray(clf(jnp.asarray(x)))
    order = np.argsort(-logits, 1)
    targets = np.where(order[:, 0] == y, order[:, 1], order[:, 0])
    x_adv, norms = fab_attack_targeted(
        _fn(clf), clf.variables, jnp.asarray(x), jnp.asarray(y),
        jnp.asarray(targets), jax.random.key(0), eps=0.3, norm="Linf",
        n_iter=10,
    )
    x_adv = np.asarray(x_adv)
    assert np.abs(x_adv - x).max() <= 0.3 + 1e-5
    assert np.isfinite(x_adv).all()


def test_square_attack(clf, batch):
    x, y = batch
    eps = 0.2  # black-box random search needs a bigger budget on few queries
    x_adv = square_attack_linf(
        _fn(clf), clf.variables, jnp.asarray(x), jnp.asarray(y),
        jax.random.key(0), eps=eps, n_queries=500,
    )
    x_adv = np.asarray(x_adv)
    assert np.abs(x_adv - x).max() <= eps + 1e-6
    assert x_adv.min() >= 0 and x_adv.max() <= 1
    pred = np.asarray(jnp.argmax(clf(jnp.asarray(x_adv)), 1))
    assert (pred != y).sum() >= 1  # black-box should fool the weak model


def test_autoattack_cascade(clf, batch):
    x, y = batch
    aa = AutoAttack(
        clf, norm="Linf", eps=EPS, version="standard", verbose=False,
        seed=0, n_iter=10, n_target_classes=2, square_n_queries=100,
    )
    assert aa.attacks_to_run == ["apgd-ce", "apgd-t", "fab-t", "square"]
    clean_acc = aa.clean_accuracy(x, y)
    assert clean_acc == 1.0
    x_adv = aa.run_standard_evaluation(x, y, bs=8)
    assert x_adv.shape == x.shape
    assert np.abs(x_adv - x).max() <= EPS + 1e-5
    robust_acc = aa.clean_accuracy(x_adv, y)
    assert robust_acc < clean_acc  # the ensemble fools the weak model


def test_autoattack_versions():
    clf = init_classifier("t2", TinyNet(), rng=1, input_size=SIZE,
                          num_classes=N_CLASSES)
    aa = AutoAttack(clf, version="rand")
    assert aa.attacks_to_run == ["apgd-ce", "apgd-dlr"] and aa.eot_iter == 20
    aa = AutoAttack(clf, version="plus")
    assert "apgd-t" in aa.attacks_to_run and aa.apgd_n_restarts == 5
    with pytest.raises(ValueError):
        AutoAttack(clf, version="bogus")


def test_square_attack_l2(clf, batch):
    from robustart_tpu.attacks.autoattack import square_attack_l2

    x, y = batch
    eps = 2.0
    x_adv = square_attack_l2(
        _fn(clf), clf.variables, jnp.asarray(x), jnp.asarray(y),
        jax.random.key(0), eps=eps, n_queries=300,
    )
    x_adv = np.asarray(x_adv)
    delta = (x_adv - x).reshape(len(x), -1)
    norms = np.sqrt((delta**2).sum(1))
    assert norms.max() <= eps + 1e-3
    assert x_adv.min() >= 0 and x_adv.max() <= 1
    pred = np.asarray(jnp.argmax(clf(jnp.asarray(x_adv)), 1))
    assert (pred != y).sum() >= 1


def test_autoattack_l2_cascade(clf, batch):
    x, y = batch
    aa = AutoAttack(clf, norm="L2", eps=1.0, version="standard", seed=0,
                    n_iter=5, n_target_classes=1, square_n_queries=50)
    x_adv = aa.run_standard_evaluation(x, y, bs=8)
    delta = (x_adv - x).reshape(len(x), -1)
    assert np.sqrt((delta**2).sum(1)).max() <= 1.0 * 1.001


def test_l1_ball_box_projection():
    from robustart_tpu.attacks.autoattack.apgd import l1_ball_box_projection

    key = jax.random.key(0)
    x0 = jax.random.uniform(key, (4, 6, 6, 3))
    x_adv = x0 + jax.random.normal(jax.random.fold_in(key, 1), x0.shape) * 0.3
    eps = 5.0
    z = np.asarray(l1_ball_box_projection(x0, x_adv, eps))
    l1 = np.abs(z - np.asarray(x0)).reshape(4, -1).sum(1)
    assert l1.max() <= eps + 1e-3
    assert z.min() >= 0 and z.max() <= 1
    # projection is idempotent when already feasible
    inside = x0 + 0.001
    z2 = np.asarray(l1_ball_box_projection(x0, inside, eps))
    np.testing.assert_allclose(z2, np.clip(np.asarray(inside), 0, 1), atol=1e-5)


def test_apgd_l1(clf, batch):
    x, y = batch
    eps = 20.0
    x_adv, _ = apgd_attack(
        _fn(clf), clf.variables, jnp.asarray(x), jnp.asarray(y),
        jax.random.key(0), eps=eps, norm="L1", loss="ce", n_iter=15,
    )
    x_adv = np.asarray(x_adv)
    l1 = np.abs(x_adv - x).reshape(len(x), -1).sum(1)
    assert l1.max() <= eps + 1e-2
    assert x_adv.min() >= 0 and x_adv.max() <= 1
    pred = np.asarray(jnp.argmax(clf(jnp.asarray(x_adv)), 1))
    assert (pred != y).sum() >= 1


def test_fab_untargeted(clf, batch):
    x, y = batch
    x_adv, norms = fab_attack_targeted(
        _fn(clf), clf.variables, jnp.asarray(x), jnp.asarray(y),
        jnp.asarray(y), jax.random.key(0), eps=0.3, norm="Linf",
        n_iter=10, untargeted=True,
    )
    x_adv = np.asarray(x_adv)
    assert np.abs(x_adv - x).max() <= 0.3 + 1e-5
    assert np.isfinite(x_adv).all()


def test_plus_version_attack_set():
    clf2 = init_classifier("t3", TinyNet(), rng=2, input_size=SIZE,
                           num_classes=N_CLASSES)
    aa = AutoAttack(clf2, version="plus")
    assert aa.attacks_to_run == ["apgd-ce", "apgd-dlr", "fab", "square",
                                 "apgd-t", "fab-t"]


def test_eta_l1_construction():
    """η^(s) L1: unit L1 mass, antisymmetric halves (reference
    square.py:173-186), rectangles have 1/(k+1)^4 decay."""
    from robustart_tpu.attacks.autoattack.square import _eta_l1

    for s in (3, 5, 7, 13):
        eta = _eta_l1(s)
        assert eta.shape == (s, s)
        np.testing.assert_allclose(np.abs(eta).sum(), 1.0, rtol=1e-5)
        assert (eta[: s // 2] >= 0).all() and (eta[s // 2 :] <= 0).all()


def test_square_attack_l1(clf, batch):
    from robustart_tpu.attacks.autoattack import square_attack_l1

    x, y = batch
    eps = 25.0  # reference L1 default scale: eps 1600 at 224² ≈ 25 at 16²
    x_adv = square_attack_l1(
        _fn(clf), clf.variables, jnp.asarray(x), jnp.asarray(y),
        jax.random.key(0), eps=eps, n_queries=300,
    )
    x_adv = np.asarray(x_adv)
    l1 = np.abs(x_adv - x).reshape(len(x), -1).sum(1)
    assert l1.max() <= eps + 1e-2
    assert x_adv.min() >= 0 and x_adv.max() <= 1
    assert np.isfinite(x_adv).all()
    # the init alone already perturbs: x_adv must differ from x
    assert l1.min() > 0
    pred = np.asarray(jnp.argmax(clf(jnp.asarray(x_adv)), 1))
    assert (pred != y).sum() >= 1


def test_autoattack_l1_cascade(clf, batch):
    """Full L1 cascade (APGD-L1 + APGD-T-L1 + FAB-T-L1 + Square-L1), jitted;
    L1 containment verified (reference autoattack.py:32 allows norm='L1';
    PGD-L1 budget convention eps=1600 @224², add_noise_utils.py:13)."""
    x, y = batch
    eps = 20.0
    aa = AutoAttack(clf, norm="L1", eps=eps, version="standard", seed=0,
                    n_iter=5, n_target_classes=1, square_n_queries=50)
    clean_acc = aa.clean_accuracy(x, y)
    x_adv = aa.run_standard_evaluation(x, y, bs=8)
    l1 = np.abs(x_adv - x).reshape(len(x), -1).sum(1)
    assert l1.max() <= eps * 1.001
    assert aa.clean_accuracy(x_adv, y) < clean_acc


def test_individual_mode_is_reentrant(clf, batch):
    x, y = batch
    aa = AutoAttack(clf, norm="Linf", eps=EPS, version="standard", seed=0,
                    n_iter=3, n_target_classes=1, square_n_queries=20)
    before = list(aa.attacks_to_run)
    out = aa.run_standard_evaluation_individual(x, y, bs=8)
    assert set(out) == set(before)
    assert aa.attacks_to_run == before
