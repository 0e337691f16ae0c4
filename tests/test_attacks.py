"""Attack correctness tests on a tiny analytically-tractable model.

Strategy (SURVEY.md §4): verify norm constraints, [0,1] box constraints, and
that each attack increases loss / flips predictions on a weak model — the
same invariants the reference's AutoAttack self-checks assert
(reference Attacks/autoattack/autoattack.py:199-209, other_utils.py:15-28).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from flax import linen as nn

from robustart_tpu.attacks import ATTACKS, make_attack_fn
from robustart_tpu.models.classifier import init_classifier

N_CLASSES = 10
SIZE = 16


class TinyNet(nn.Module):
    num_classes: int = N_CLASSES

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = nn.Conv(8, (3, 3), strides=(2, 2))(x)
        x = nn.relu(x)
        x = jnp.mean(x, axis=(1, 2))
        return nn.Dense(self.num_classes)(x)


@pytest.fixture(scope="module")
def clf():
    return init_classifier(
        "tiny", TinyNet(), rng=0, input_size=SIZE, num_classes=N_CLASSES
    )


@pytest.fixture(scope="module")
def batch():
    key = jax.random.key(42)
    x = jax.random.uniform(key, (8, SIZE, SIZE, 3))
    y = jax.random.randint(jax.random.key(7), (8,), 0, N_CLASSES)
    return x, y


def _loss(clf, x, y):
    logits = clf(x)
    logp = jax.nn.log_softmax(logits)
    return -jnp.take_along_axis(logp, y[:, None], axis=1).mean()


@pytest.mark.parametrize("name", ["fgsm", "pgd_linf", "mim_linf"])
def test_linf_attacks_respect_eps_and_box(clf, batch, name):
    x, y = batch
    eps = 8 / 255
    fn = make_attack_fn(name, clf.logits_fn(), jit=False, eps=eps)
    x_adv = fn(clf.variables, x, y, jax.random.key(0))
    linf = jnp.max(jnp.abs(x_adv - x))
    assert float(linf) <= eps + 1e-6
    assert float(x_adv.min()) >= 0.0 and float(x_adv.max()) <= 1.0


def test_pgd_l2_respects_eps_and_box(clf, batch):
    x, y = batch
    eps = 0.5
    fn = make_attack_fn("pgd_l2", clf.logits_fn(), jit=False, eps=eps, steps=10)
    x_adv = fn(clf.variables, x, y, jax.random.key(0))
    delta = (x_adv - x).reshape(8, -1)
    norms = jnp.sqrt(jnp.sum(delta**2, axis=1))
    assert float(norms.max()) <= eps + 1e-4
    assert float(x_adv.min()) >= 0.0 and float(x_adv.max()) <= 1.0


def test_pgd_l1_respects_eps_and_box(clf, batch):
    x, y = batch
    eps = 10.0
    fn = make_attack_fn(
        "pgd_l1", clf.logits_fn(), jit=False, eps=eps, eps_step=1.0, max_iter=10
    )
    x_adv = fn(clf.variables, x, y, jax.random.key(0))
    delta = (x_adv - x).reshape(8, -1)
    norms = jnp.sum(jnp.abs(delta), axis=1)
    assert float(norms.max()) <= eps + 1e-3
    assert float(x_adv.min()) >= 0.0 and float(x_adv.max()) <= 1.0


@pytest.mark.parametrize("name", sorted(ATTACKS))
def test_attacks_increase_loss(clf, batch, name):
    x, y = batch
    kwargs = {}
    if name == "pgd_l2":
        kwargs = {"eps": 2.0}
    elif name == "pgd_l1":
        kwargs = {"eps": 50.0, "eps_step": 10.0}
    fn = make_attack_fn(name, clf.logits_fn(), jit=False, **kwargs)
    x_adv = fn(clf.variables, x, y, jax.random.key(3))
    assert float(_loss(clf, x_adv, y)) > float(_loss(clf, x, y))


def test_attack_jits_and_is_deterministic(clf, batch):
    x, y = batch
    fn = make_attack_fn("pgd_linf", clf.logits_fn(), jit=True, steps=5)
    a1 = fn(clf.variables, x.copy(), y, jax.random.key(0))
    a2 = fn(clf.variables, x.copy(), y, jax.random.key(0))
    np.testing.assert_allclose(np.asarray(a1), np.asarray(a2), atol=1e-6)


def test_attack_runs_sharded_over_mesh(clf, batch, mesh8):
    """Attack loop shards over the data axis of an 8-device mesh (DP eval)."""
    from robustart_tpu.core.dist import shard_batch

    x, y = batch
    sharded = shard_batch({"x": np.asarray(x), "y": np.asarray(y)}, mesh8)
    fn = make_attack_fn("pgd_linf", clf.logits_fn(), jit=True, steps=3)
    x_adv = fn(clf.variables, sharded["x"], sharded["y"], jax.random.key(0))
    assert x_adv.shape == x.shape
    assert float(jnp.max(jnp.abs(x_adv - x))) <= 8 / 255 + 1e-6
