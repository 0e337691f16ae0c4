"""Head-to-head AutoAttack cross-validation against the reference's own
vendored torch suite.

The reference ships the fra31/auto-attack torch implementation at
``RobustART/noise/utils/adv/Attacks/autoattack/`` (autoattack.py:26-284).
Here a tiny CNN is trained in torch, its weights copied into an exactly
equivalent Flax module, and BOTH AutoAttack implementations are run on the
same inputs with the same (reduced) budgets. RNG differences preclude
bitwise parity, so the assertions are outcome-level:

- identical clean-pass flags (deterministic forward, shared weights);
- per-attack robust accuracy within a small tolerance (catches semantic
  drift — wrong loss, wrong projection, wrong cascade bookkeeping — that
  the formula-golden tests in test_autoattack.py cannot);
- full standard-cascade robust accuracy within tolerance for Linf and L2.

The reference code is IMPORTED from /root/reference as an oracle (read-only
dependency of this test), never copied.
"""

import os
import sys

import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn as nn  # noqa: E402

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
from flax import linen as fnn  # noqa: E402

from robustart_tpu.attacks.autoattack import AutoAttack  # noqa: E402
from robustart_tpu.models.classifier import Classifier  # noqa: E402

REF_ATTACKS = "/root/reference/RobustART/noise/utils/adv/Attacks"
pytestmark = pytest.mark.skipif(
    not os.path.isdir(os.path.join(REF_ATTACKS, "autoattack")),
    reason="reference AutoAttack not available",
)

NCLS, SZ = 10, 16
MEAN = np.array([0.485, 0.456, 0.406], np.float32)
STD = np.array([0.229, 0.224, 0.225], np.float32)
EPS_LINF = 6 / 255  # tuned: PGD-20 robust acc ≈ 0.5 on this model/data
EPS_L2 = 0.4
N_EVAL = 64
# reduced budgets, applied identically to both implementations
N_ITER, N_TGT, N_QUERIES = 20, 3, 300


class TorchTinyCNN(nn.Module):
    """Takes ImageNet-normalized input (the reference's NormalizeModel wrap
    applies mean/std, autoattack.py:12-23)."""

    def __init__(self):
        super().__init__()
        self.conv1 = nn.Conv2d(3, 16, 3, stride=2, padding=1)
        self.conv2 = nn.Conv2d(16, 32, 3, stride=2, padding=1)
        self.fc = nn.Linear(32, NCLS)

    def forward(self, x):
        x = torch.relu(self.conv1(x))
        x = torch.relu(self.conv2(x))
        x = x.mean(dim=(2, 3))
        return self.fc(x)


class FlaxTinyCNN(fnn.Module):
    """Exact Flax twin of TorchTinyCNN (normalized NHWC input)."""

    @fnn.compact
    def __call__(self, x, train: bool = False):
        x = fnn.Conv(16, (3, 3), strides=2, padding=((1, 1), (1, 1)),
                     name="conv1")(x)
        x = fnn.relu(x)
        x = fnn.Conv(32, (3, 3), strides=2, padding=((1, 1), (1, 1)),
                     name="conv2")(x)
        x = fnn.relu(x)
        x = x.mean(axis=(1, 2))
        return fnn.Dense(NCLS, name="fc")(x)


def _make_data(n, seed, templates):
    r = np.random.default_rng(seed)
    y = r.integers(0, NCLS, n)
    x = templates[y] + r.normal(0, 0.08, (n, SZ, SZ, 3)).astype(np.float32)
    return np.clip(x, 0, 1).astype(np.float32), y.astype(np.int64)


@pytest.fixture(scope="module")
def shared_model_and_data():
    torch.manual_seed(0)
    rng = np.random.default_rng(0)
    templates = rng.uniform(0.25, 0.75, (NCLS, SZ, SZ, 3)).astype(np.float32)

    net = TorchTinyCNN()
    opt = torch.optim.Adam(net.parameters(), lr=3e-3)
    xtr, ytr = _make_data(2048, 1, templates)
    xt = torch.tensor(((xtr - MEAN) / STD).transpose(0, 3, 1, 2))
    yt = torch.tensor(ytr)
    for step in range(300):
        i = np.random.default_rng(step).integers(0, 2048, 128)
        opt.zero_grad()
        nn.functional.cross_entropy(net(xt[i]), yt[i]).backward()
        opt.step()
    net.eval()

    # copy weights into the Flax twin: OIHW→HWIO, (O,I)→(I,O)
    sd = {k: v.detach().numpy() for k, v in net.state_dict().items()}
    params = {
        "conv1": {"kernel": sd["conv1.weight"].transpose(2, 3, 1, 0),
                  "bias": sd["conv1.bias"]},
        "conv2": {"kernel": sd["conv2.weight"].transpose(2, 3, 1, 0),
                  "bias": sd["conv2.bias"]},
        "fc": {"kernel": sd["fc.weight"].T, "bias": sd["fc.bias"]},
    }
    clf = Classifier(
        name="tiny_cnn", module=FlaxTinyCNN(),
        variables={"params": jax.tree.map(jnp.asarray, params)},
        mean=tuple(MEAN), std=tuple(STD), input_size=SZ, num_classes=NCLS,
    )

    xte, yte = _make_data(N_EVAL, 99, templates)

    # forward parity gate: shared weights must agree before attacking
    with torch.no_grad():
        lt = net(torch.tensor(((xte - MEAN) / STD).transpose(0, 3, 1, 2)))
    lj = clf.apply_fn(clf.variables, jnp.asarray(xte), train=False)
    np.testing.assert_allclose(np.asarray(lj), lt.numpy(), atol=2e-4)
    return net, clf, xte, yte


def _torch_autoattack(net, norm, eps, monkeypatch):
    """Reference AutoAttack on CPU with reduced budgets."""
    if REF_ATTACKS not in sys.path:
        sys.path.insert(0, REF_ATTACKS)
    from autoattack import AutoAttack as TorchAA

    # the reference's NormalizeModel hard-codes .cuda()
    # (autoattack.py:18-19); run it on CPU
    monkeypatch.setattr(torch.Tensor, "cuda",
                        lambda self, *a, **k: self, raising=False)
    # 2021-era code: .view() on non-contiguous CPU grad tensors raises on
    # modern torch (autopgd_base.py:183) — fall back to reshape
    orig_view = torch.Tensor.view

    def safe_view(self, *a, **k):
        try:
            return orig_view(self, *a, **k)
        except RuntimeError:
            return self.reshape(*a, **k)

    monkeypatch.setattr(torch.Tensor, "view", safe_view, raising=False)
    aa = TorchAA(net, norm=norm, eps=eps, version="standard", seed=0,
                 verbose=False, device="cpu")
    aa.apgd.n_iter = N_ITER
    aa.apgd_targeted.n_iter = N_ITER
    aa.apgd_targeted.n_target_classes = N_TGT
    aa.fab.n_iter = N_ITER
    aa.fab.n_target_classes = N_TGT
    aa.square.n_queries = N_QUERIES
    return aa


def _torch_racc(net, x_adv_t, y):
    with torch.no_grad():
        xn = (x_adv_t - torch.tensor(MEAN)[None, :, None, None]) / (
            torch.tensor(STD)[None, :, None, None]
        )
        pred = net(xn).argmax(1).numpy()
    return float((pred == y).mean())


def _jax_racc(clf, x_adv, y):
    pred = np.asarray(
        jnp.argmax(clf.apply_fn(clf.variables, jnp.asarray(x_adv)), 1)
    )
    return float((pred == y).mean())


def _jax_autoattack(clf, norm, eps):
    return AutoAttack(
        clf, norm=norm, eps=eps, version="standard", seed=0,
        n_iter=N_ITER, n_target_classes=N_TGT, square_n_queries=N_QUERIES,
    )


def test_clean_pass_flags_identical(shared_model_and_data):
    net, clf, xte, yte = shared_model_and_data
    with torch.no_grad():
        pt = net(torch.tensor(((xte - MEAN) / STD).transpose(0, 3, 1, 2)))
    pred_t = pt.argmax(1).numpy()
    pred_j = np.asarray(
        jnp.argmax(clf.apply_fn(clf.variables, jnp.asarray(xte)), 1)
    )
    np.testing.assert_array_equal(pred_t, pred_j)


@pytest.mark.parametrize("attack", ["apgd-ce", "apgd-t", "fab-t", "square"])
def test_per_attack_robust_accuracy_agreement(shared_model_and_data,
                                              monkeypatch, attack):
    net, clf, xte, yte = shared_model_and_data
    aa_t = _torch_autoattack(net, "Linf", EPS_LINF, monkeypatch)
    aa_t.attacks_to_run = [attack]
    x_t = torch.tensor(xte.transpose(0, 3, 1, 2))
    adv_t = aa_t.run_standard_evaluation(x_t, torch.tensor(yte), bs=N_EVAL)
    racc_t = _torch_racc(net, adv_t, yte)

    aa_j = _jax_autoattack(clf, "Linf", EPS_LINF)
    adv_j = aa_j.run_standard_evaluation(xte, yte, bs=N_EVAL,
                                         attacks_to_run=[attack])
    racc_j = _jax_racc(clf, adv_j, yte)

    # RNG differs; outcome agreement within 8/64 samples catches semantic
    # drift (a wrong loss or projection moves robust accuracy by tens of pp)
    assert abs(racc_t - racc_j) <= 0.125, (attack, racc_t, racc_j)


@pytest.mark.parametrize("norm,eps", [("Linf", EPS_LINF), ("L2", EPS_L2)])
def test_standard_cascade_robust_accuracy_agreement(shared_model_and_data,
                                                    monkeypatch, norm, eps):
    net, clf, xte, yte = shared_model_and_data
    aa_t = _torch_autoattack(net, norm, eps, monkeypatch)
    x_t = torch.tensor(xte.transpose(0, 3, 1, 2))
    adv_t = aa_t.run_standard_evaluation(x_t, torch.tensor(yte), bs=N_EVAL)
    racc_t = _torch_racc(net, adv_t, yte)

    aa_j = _jax_autoattack(clf, norm, eps)
    adv_j = aa_j.run_standard_evaluation(xte, yte, bs=N_EVAL)
    racc_j = _jax_racc(clf, adv_j, yte)

    assert abs(racc_t - racc_j) <= 0.125, (norm, racc_t, racc_j)
    if norm == "Linf":
        # test power: the chosen eps must leave a non-degenerate robust set
        assert 0.02 <= racc_t <= 0.98

    # both stay inside the eps ball
    for adv in (np.asarray(adv_t.numpy().transpose(0, 2, 3, 1)), adv_j):
        delta = (adv - xte).reshape(N_EVAL, -1)
        if norm == "Linf":
            assert np.abs(delta).max() <= eps * 1.001
        else:
            assert np.sqrt((delta ** 2).sum(1)).max() <= eps * 1.001


def test_mim_robust_accuracy_agreement(shared_model_and_data, monkeypatch):
    """Head-to-head MIM: the reference's own pure-torch `_mim_whitebox`
    (Attacks/imfgsm_attack.py:62-93 — the one gradient attack whose
    reference implementation is runnable without foolbox/ART) vs
    attacks/gradient.py::mim_linf on the shared-weights model. RNG (random
    start) differs → outcome-level agreement."""
    net, clf, xte, yte = shared_model_and_data
    # the reference hard-codes .cuda() in normalize() and the random start
    monkeypatch.setattr(torch.Tensor, "cuda",
                        lambda self, *a, **k: self, raising=False)
    if REF_ATTACKS not in sys.path:
        sys.path.insert(0, REF_ATTACKS)
    # the reference file imports torchvision at module top (unused by
    # _mim_whitebox); torchvision is not installed here — stub it
    import types

    tv = types.ModuleType("torchvision")
    tv.datasets = types.ModuleType("torchvision.datasets")
    tv.transforms = types.ModuleType("torchvision.transforms")
    monkeypatch.setitem(sys.modules, "torchvision", tv)
    monkeypatch.setitem(sys.modules, "torchvision.datasets", tv.datasets)
    monkeypatch.setitem(sys.modules, "torchvision.transforms", tv.transforms)
    from imfgsm_attack import _mim_whitebox

    eps, steps, step = EPS_LINF, 10, 2 / 255
    torch.manual_seed(0)
    x_t = torch.tensor(xte.transpose(0, 3, 1, 2))
    adv_t = _mim_whitebox(net, x_t, torch.tensor(yte), eps, steps, step)
    racc_t = _torch_racc(net, adv_t.detach(), yte)

    from robustart_tpu.attacks.gradient import mim_linf

    adv_j = np.asarray(mim_linf(
        clf.apply_fn, clf.variables, jnp.asarray(xte), jnp.asarray(yte),
        jax.random.key(0), eps=eps, num_steps=steps, step_size=step,
    ))
    racc_j = _jax_racc(clf, adv_j, yte)

    # the attack must actually bite (else agreement is vacuous)
    clean = _jax_racc(clf, xte, yte)
    assert racc_t <= clean - 0.1 and racc_j <= clean - 0.1
    assert abs(racc_t - racc_j) <= 0.125, (racc_t, racc_j)

    # both final perturbations obey the Linf ball and [0,1] clamp
    for adv in (np.asarray(adv_t.detach().numpy().transpose(0, 2, 3, 1)),
                adv_j):
        assert np.abs(adv - xte).max() <= eps * 1.001
        assert adv.min() >= 0.0 and adv.max() <= 1.0


def test_rand_version_eot_robust_accuracy_agreement(shared_model_and_data,
                                                    monkeypatch):
    """Head-to-head `rand` version (APGD-CE + APGD-DLR with EOT gradient
    averaging, reference autoattack.py:281-284) on the shared-weights
    model. EOT budget reduced identically on both sides (20 → 5 passes) —
    the semantics under test is the EOT average + the rand cascade
    bookkeeping, not the stochastic-defense use case (the model is
    deterministic, so disagreement isolates implementation drift)."""
    net, clf, xte, yte = shared_model_and_data
    aa_t = _torch_autoattack(net, "Linf", EPS_LINF, monkeypatch)
    aa_t.version = "rand"
    aa_t.attacks_to_run = ["apgd-ce", "apgd-dlr"]
    aa_t.apgd.n_restarts = 1
    aa_t.apgd.eot_iter = 5
    aa_t.apgd.n_iter = N_ITER
    x_t = torch.tensor(xte.transpose(0, 3, 1, 2))
    adv_t = aa_t.run_standard_evaluation(x_t, torch.tensor(yte), bs=N_EVAL)
    racc_t = _torch_racc(net, adv_t, yte)

    aa_j = AutoAttack(
        clf, norm="Linf", eps=EPS_LINF, version="rand", seed=0,
        n_iter=N_ITER, n_target_classes=N_TGT,
        square_n_queries=N_QUERIES,
    )
    aa_j.eot_iter = 5
    adv_j = aa_j.run_standard_evaluation(xte, yte, bs=N_EVAL)
    racc_j = _jax_racc(clf, adv_j, yte)

    assert abs(racc_t - racc_j) <= 0.125, (racc_t, racc_j)
    # eps-ball containment for the rand cascade too
    for adv in (np.asarray(adv_t.numpy().transpose(0, 2, 3, 1)), adv_j):
        delta = np.abs(adv - xte)
        assert delta.max() <= EPS_LINF * 1.001


def test_plus_version_robust_accuracy_agreement(shared_model_and_data,
                                                monkeypatch):
    """Head-to-head `plus` version (autoattack.py:276-284: apgd-ce,
    apgd-dlr, fab, square, apgd-t, fab-t) — the only cascade covering
    untargeted APGD-DLR and untargeted FAB, neither exercised by the
    standard/rand oracles. Restarts reduced to 1 on BOTH sides (the
    reference's plus uses 5) to keep the runtime test-sized."""
    net, clf, xte, yte = shared_model_and_data
    aa_t = _torch_autoattack(net, "Linf", EPS_LINF, monkeypatch)
    aa_t.version = "plus"
    aa_t.attacks_to_run = ["apgd-ce", "apgd-dlr", "fab", "square",
                           "apgd-t", "fab-t"]
    aa_t.apgd.n_restarts = 1
    aa_t.fab.n_restarts = 1
    x_t = torch.tensor(xte.transpose(0, 3, 1, 2))
    adv_t = aa_t.run_standard_evaluation(x_t, torch.tensor(yte), bs=N_EVAL)
    racc_t = _torch_racc(net, adv_t, yte)

    aa_j = AutoAttack(
        clf, norm="Linf", eps=EPS_LINF, version="plus", seed=0,
        n_iter=N_ITER, n_target_classes=N_TGT, square_n_queries=N_QUERIES,
    )
    aa_j.apgd_n_restarts = 1
    adv_j = aa_j.run_standard_evaluation(xte, yte, bs=N_EVAL)
    racc_j = _jax_racc(clf, adv_j, yte)

    assert abs(racc_t - racc_j) <= 0.125, (racc_t, racc_j)
    for adv in (np.asarray(adv_t.numpy().transpose(0, 2, 3, 1)), adv_j):
        assert np.abs(adv - xte).max() <= EPS_LINF * 1.001


EPS_L1 = 3.0  # tuned: L1 cascade robust acc ≈ 0.73 on this model/data


def _l1_autoattacks(net, clf, monkeypatch):
    """Both suites configured for L1 `standard` (largereps schedule on both
    sides, reference autoattack.py:258-262) with identical reduced budgets
    (n_restarts 1 instead of the reference's 5 — applied to BOTH sides)."""
    aa_t = _torch_autoattack(net, "L1", EPS_L1, monkeypatch)
    aa_t.apgd.n_restarts = 1
    aa_t.apgd_targeted.n_restarts = 1
    aa_j = AutoAttack(
        clf, norm="L1", eps=EPS_L1, version="standard", seed=0,
        n_iter=N_ITER, n_target_classes=N_TGT, square_n_queries=N_QUERIES,
    )
    aa_j.apgd_n_restarts = 1
    assert aa_j.use_largereps  # L1 standard must enable the 3ε→2ε→ε schedule
    return aa_t, aa_j


@pytest.mark.parametrize("attack", ["apgd-ce", "apgd-t", "fab-t"])
def test_l1_per_attack_robust_accuracy_agreement(shared_model_and_data,
                                                 monkeypatch, attack):
    """Head-to-head L1: our adaptive-sparsity L1-APGD (apgd.py::
    apgd_attack_l1, the reference's autopgd_base.py L1 branches) and
    FAB-T-L1 vs the reference's vendored torch suite. Square-L1 is covered
    by the cascade test (at this eps it finds nothing on either side,
    which would be vacuous standalone)."""
    net, clf, xte, yte = shared_model_and_data
    aa_t, aa_j = _l1_autoattacks(net, clf, monkeypatch)
    aa_t.attacks_to_run = [attack]
    x_t = torch.tensor(xte.transpose(0, 3, 1, 2))
    adv_t = aa_t.run_standard_evaluation(x_t, torch.tensor(yte), bs=N_EVAL)
    racc_t = _torch_racc(net, adv_t, yte)

    adv_j = aa_j.run_standard_evaluation(xte, yte, bs=N_EVAL,
                                         attacks_to_run=[attack])
    racc_j = _jax_racc(clf, adv_j, yte)
    assert abs(racc_t - racc_j) <= 0.125, (attack, racc_t, racc_j)
    # the attack must actually bite on both sides (else agreement is vacuous)
    assert racc_t <= 0.98 and racc_j <= 0.98


def test_l1_square_robust_accuracy_agreement(shared_model_and_data,
                                             monkeypatch):
    """Square-L1 head-to-head at eps=8 (at the cascade's eps=3 the
    random-search attack finds nothing on either side within the reduced
    query budget, which would be vacuous — at 8 it bites on both)."""
    net, clf, xte, yte = shared_model_and_data
    aa_t = _torch_autoattack(net, "L1", 8.0, monkeypatch)
    aa_t.attacks_to_run = ["square"]
    x_t = torch.tensor(xte.transpose(0, 3, 1, 2))
    adv_t = aa_t.run_standard_evaluation(x_t, torch.tensor(yte), bs=N_EVAL)
    racc_t = _torch_racc(net, adv_t, yte)

    aa_j = AutoAttack(
        clf, norm="L1", eps=8.0, version="standard", seed=0,
        n_iter=N_ITER, n_target_classes=N_TGT, square_n_queries=N_QUERIES,
    )
    adv_j = aa_j.run_standard_evaluation(xte, yte, bs=N_EVAL,
                                         attacks_to_run=["square"])
    racc_j = _jax_racc(clf, adv_j, yte)
    assert abs(racc_t - racc_j) <= 0.125, (racc_t, racc_j)
    assert racc_t <= 0.98 and racc_j <= 0.98  # must bite on both sides
    for adv in (np.asarray(adv_t.numpy().transpose(0, 2, 3, 1)), adv_j):
        assert np.abs(adv - xte).reshape(N_EVAL, -1).sum(1).max() <= 8.0 * 1.001


def test_l1_standard_cascade_robust_accuracy_agreement(shared_model_and_data,
                                                       monkeypatch):
    """Full L1 standard cascade head-to-head, incl. the largereps APGD
    schedule (reference autopgd_base.py:549-569) + eps-ball containment."""
    net, clf, xte, yte = shared_model_and_data
    aa_t, aa_j = _l1_autoattacks(net, clf, monkeypatch)
    x_t = torch.tensor(xte.transpose(0, 3, 1, 2))
    adv_t = aa_t.run_standard_evaluation(x_t, torch.tensor(yte), bs=N_EVAL)
    racc_t = _torch_racc(net, adv_t, yte)

    adv_j = aa_j.run_standard_evaluation(xte, yte, bs=N_EVAL)
    racc_j = _jax_racc(clf, adv_j, yte)

    assert abs(racc_t - racc_j) <= 0.125, (racc_t, racc_j)
    # test power: eps leaves a non-degenerate robust set
    assert 0.02 <= racc_t <= 0.98

    for adv in (np.asarray(adv_t.numpy().transpose(0, 2, 3, 1)), adv_j):
        delta = (adv - xte).reshape(N_EVAL, -1)
        assert np.abs(delta).sum(1).max() <= EPS_L1 * 1.001


def test_pgd_l1_art_semantics_cross_check(shared_model_and_data):
    """Cross-check pgd_l1 against the reference's ART wrapper semantics
    (reference attack.py:44-49: ProjectedGradientDescentPyTorch norm=1,
    num_random_init=1, normalized preprocessing). ART is not installed in
    this environment (zero egress) — the test auto-activates the day it
    is; until then the L1 path is covered by the formula-golden tests in
    test_autoattack.py (L1 projection/steps) and test_attacks.py."""
    art = pytest.importorskip("art")  # noqa: F841
    from art.attacks.evasion import ProjectedGradientDescentPyTorch
    from art.estimators.classification import PyTorchClassifier

    net, clf, xte, yte = shared_model_and_data
    classifier = PyTorchClassifier(
        model=net, loss=nn.CrossEntropyLoss(),
        input_shape=(3, SZ, SZ), nb_classes=NCLS, clip_values=(0, 1),
        preprocessing=(MEAN, STD), device_type="cpu",
    )
    eps_l1 = 8.0
    attack = ProjectedGradientDescentPyTorch(
        estimator=classifier, norm=1, eps=eps_l1, eps_step=eps_l1 / 4,
        max_iter=N_ITER, num_random_init=1, batch_size=N_EVAL,
        verbose=False,
    )
    adv_t = attack.generate(
        x=xte.transpose(0, 3, 1, 2), y=yte
    ).transpose(0, 2, 3, 1)
    racc_t = _jax_racc(clf, adv_t, yte)

    from robustart_tpu.attacks.gradient import pgd_l1

    adv_j = pgd_l1(
        clf.apply_fn, clf.variables, jnp.asarray(xte), jnp.asarray(yte),
        jax.random.key(0), eps=eps_l1, eps_step=eps_l1 / 4,
        max_iter=N_ITER, num_random_init=1,
    )
    racc_j = _jax_racc(clf, np.asarray(adv_j), yte)
    assert abs(racc_t - racc_j) <= 0.125, (racc_t, racc_j)
