"""Head-to-head calibration-tools cross-validation against the reference's
own numpy/sklearn implementation (RobustART/metrics/calibration_tools.py).

The reference module imports the missing prototype submodule's get_logger
at line 3 — a stub module satisfies the import; everything else is plain
numpy/sklearn, so the functions run as an exact oracle. These functions are
deterministic, so parity here is NUMERIC (near-exact), unlike the
RNG-bearing attack head-to-heads."""

import os
import sys
import types

import numpy as np
import pytest

REF_METRICS = "/root/reference/RobustART/metrics"
pytestmark = pytest.mark.skipif(
    not os.path.isfile(os.path.join(REF_METRICS, "calibration_tools.py")),
    reason="reference calibration_tools not available",
)


@pytest.fixture(scope="module")
def ref_calib():
    # satisfy `from prototype.prototype.utils.misc import get_logger`
    import logging

    misc = types.ModuleType("prototype.prototype.utils.misc")
    misc.get_logger = logging.getLogger
    for name in ("prototype", "prototype.prototype",
                 "prototype.prototype.utils"):
        sys.modules.setdefault(name, types.ModuleType(name))
    sys.modules["prototype.prototype.utils.misc"] = misc
    sys.modules["prototype.prototype.utils"].misc = misc
    if REF_METRICS not in sys.path:
        sys.path.insert(0, REF_METRICS)
    import calibration_tools as ref

    return ref


@pytest.fixture(scope="module")
def data():
    rng = np.random.default_rng(0)
    n = 5000
    confidence = rng.beta(5, 2, n)
    # correctness correlated with confidence (a realistically calibrated-ish
    # model) so the binned errors are non-degenerate
    correct = (rng.uniform(0, 1, n) < confidence * 0.9).astype(np.float64)
    return confidence, correct


def test_calib_err_matches_reference(ref_calib, data):
    from robustart_tpu.metrics.calibration import calib_err

    confidence, correct = data
    for p in ("2", "1", "infty"):
        ours = calib_err(confidence, correct, p=p)
        ref = ref_calib.calib_err(confidence.copy(), correct.copy(), p=p)
        np.testing.assert_allclose(ours, ref, rtol=1e-10, err_msg=p)


def test_aurra_and_soft_f1_match_reference(ref_calib, data):
    from robustart_tpu.metrics.calibration import aurra, soft_f1

    confidence, correct = data
    np.testing.assert_allclose(
        aurra(confidence, correct),
        ref_calib.aurra(confidence.copy(), correct.copy()), rtol=1e-12,
    )
    np.testing.assert_allclose(
        soft_f1(confidence, correct),
        ref_calib.soft_f1(confidence.copy(), correct.copy()), rtol=1e-12,
    )


def test_tune_temp_binary_search_matches_reference(ref_calib):
    from robustart_tpu.metrics.calibration import tune_temp

    rng = np.random.default_rng(1)
    n, k = 800, 10
    labels = rng.integers(0, k, n)
    logits = rng.normal(0, 1, (n, k))
    logits[np.arange(n), labels] += rng.normal(2.5, 0.5, n)  # overconfident

    ours = tune_temp(logits, labels, binary_search=True)
    import torch  # the reference body uses torch tensors

    ref = ref_calib.tune_temp(
        torch.tensor(logits), torch.tensor(labels), binary_search=True
    )
    assert abs(float(ours) - float(ref)) < 1e-3


def test_ood_measures_match_reference(ref_calib):
    from robustart_tpu.metrics.calibration import get_measures

    rng = np.random.default_rng(2)
    pos = rng.normal(1.0, 1.0, 2000)   # in-distribution scores
    neg = rng.normal(-0.5, 1.2, 1500)  # OOD scores
    ours = get_measures(pos, neg)
    ref = ref_calib.get_measures(pos.copy(), neg.copy())
    np.testing.assert_allclose(np.asarray(ours, np.float64),
                               np.asarray(ref, np.float64), rtol=1e-10)
