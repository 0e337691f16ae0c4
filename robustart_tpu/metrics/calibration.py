"""Calibration + OOD measurement tools.

Re-implements reference RobustART/metrics/calibration_tools.py: binned RMS /
MAD calibration error (:26-56), AURRA (:59-63), soft-F1 (:66-76), temperature
tuning (:79-112, binary search — in JAX instead of torch autograd),
FPR@recall (:138-178) and AUROC/AUPR/FPR OOD measures (:180-191).
"""

from __future__ import annotations

import numpy as np
import sklearn.metrics as sk

recall_level_default = 0.95


def stable_cumsum(arr, rtol=1e-05, atol=1e-08):
    out = np.cumsum(arr, dtype=np.float64)
    expected = np.sum(arr, dtype=np.float64)
    if not np.allclose(out[-1], expected, rtol=rtol, atol=atol):
        raise RuntimeError(
            "cumsum was found to be unstable: its last element does not "
            "correspond to sum"
        )
    return out


def calib_err(confidence, correct, p="2", beta=100):
    """Binned calibration error with target bin size ``beta``."""
    confidence = np.asarray(confidence, dtype=np.float64)
    correct = np.asarray(correct, dtype=np.float64)
    idxs = np.argsort(confidence)
    confidence = confidence[idxs]
    correct = correct[idxs]
    bins = [[i * beta, (i + 1) * beta] for i in range(len(confidence) // beta)]
    if not bins:
        return 0.0
    bins[-1] = [bins[-1][0], len(confidence)]

    cerr = 0.0
    total = len(confidence)
    for i in range(len(bins) - 1):
        lo, hi = bins[i]
        bin_conf = confidence[lo:hi]
        bin_corr = correct[lo:hi]
        n = len(bin_conf)
        if n > 0:
            diff = abs(np.nanmean(bin_conf) - np.nanmean(bin_corr))
            if p == "2":
                cerr += n / total * diff**2
            elif p == "1":
                cerr += n / total * diff
            elif p in ("infty", "infinity", "max"):
                cerr = max(cerr, diff)
            else:
                raise AssertionError("p must be '1', '2', or 'infty'")
    if p == "2":
        cerr = float(np.sqrt(cerr))
    return float(cerr)


def aurra(confidence, correct):
    """Area under the response-rate / accuracy curve."""
    conf_ranks = np.argsort(confidence)[::-1]
    rra = np.cumsum(np.asarray(correct)[conf_ranks])
    rra = rra / np.arange(1, len(rra) + 1)
    return float(np.mean(rra))


def soft_f1(confidence, correct):
    confidence = np.asarray(confidence, dtype=np.float64)
    correct = np.asarray(correct, dtype=np.float64)
    wrong = 1 - correct
    return float(
        2 * ((1 - confidence) * wrong).sum() / (1 - confidence + wrong).sum()
    )


def tune_temp(logits, labels, binary_search=True, lower=0.2, upper=5.0, eps=0.0001):
    """Temperature scaling by bisection on d(CE)/dT (reference :79-104).

    The reference uses torch autograd for the gradient sign; here the
    derivative of mean CE w.r.t. T is computed in closed form.
    """
    logits = np.asarray(logits, dtype=np.float64)
    labels = np.asarray(labels, dtype=np.int64)

    def ce(t):
        z = logits / t
        z = z - z.max(axis=1, keepdims=True)
        logp = z - np.log(np.exp(z).sum(axis=1, keepdims=True))
        return -logp[np.arange(len(labels)), labels].mean()

    def dce_dt(t, h=1e-4):
        return (ce(t + h) - ce(t - h)) / (2 * h)

    if binary_search:
        lo, hi = lower, upper
        while hi - lo > eps:
            mid = 0.5 * (lo + hi)
            if dce_dt(mid) > 0:
                hi = mid
            else:
                lo = mid
        return min([lo, 0.5 * (lo + hi), hi], key=ce)
    # convex-solver fallback in the reference (cvxpy); bisection covers it
    return tune_temp(logits, labels, binary_search=True, lower=lower,
                     upper=upper, eps=eps)


def fpr_and_fdr_at_recall(y_true, y_score, recall_level=recall_level_default,
                          pos_label=None):
    """FPR at the threshold achieving ``recall_level`` TPR
    (reference :138-178, sklearn-ranking based)."""
    y_true = np.asarray(y_true)
    y_score = np.asarray(y_score)
    classes = np.unique(y_true)
    if pos_label is None and not (
        np.array_equal(classes, [0, 1])
        or np.array_equal(classes, [-1, 1])
        or np.array_equal(classes, [0])
        or np.array_equal(classes, [-1])
        or np.array_equal(classes, [1])
    ):
        raise ValueError("Data is not binary and pos_label is not specified")
    if pos_label is None:
        pos_label = 1.0

    y_true = y_true == pos_label
    desc = np.argsort(y_score, kind="mergesort")[::-1]
    y_score = y_score[desc]
    y_true = y_true[desc]

    distinct = np.where(np.diff(y_score))[0]
    threshold_idxs = np.r_[distinct, y_true.size - 1]

    tps = stable_cumsum(y_true)[threshold_idxs]
    fps = 1 + threshold_idxs - tps

    recall = tps / tps[-1]
    last_ind = tps.searchsorted(tps[-1])
    sl = slice(last_ind, None, -1)
    recall = np.r_[recall[sl], 1]
    fps = np.r_[fps[sl], 0]
    tps = np.r_[tps[sl], 0]

    cutoff = np.argmin(np.abs(recall - recall_level))
    return float(fps[cutoff] / np.sum(np.logical_not(y_true)))


def get_measures(_pos, _neg, recall_level=recall_level_default):
    """(AUROC, AUPR, FPR@recall) with in-dist scores as the positive class
    (reference :180-191)."""
    pos = np.asarray(_pos).reshape((-1, 1))
    neg = np.asarray(_neg).reshape((-1, 1))
    examples = np.squeeze(np.vstack((pos, neg)))
    labels = np.zeros(len(examples), dtype=np.int32)
    labels[: len(pos)] += 1

    auroc = sk.roc_auc_score(labels, examples)
    aupr = sk.average_precision_score(labels, examples)
    fpr = fpr_and_fdr_at_recall(labels, examples, recall_level)
    return auroc, aupr, fpr


def show_calibration_results(confidence, correct, method_name="Baseline"):
    from robustart_tpu.core.logging import get_logger

    logger = get_logger(__name__)
    logger.info("\t\t%s", method_name)
    logger.info("RMS Calib Error (%%): \t\t%.2f",
                100 * calib_err(confidence, correct, p="2"))
    logger.info("AURRA (%%): \t\t\t%.2f", 100 * aurra(confidence, correct))
