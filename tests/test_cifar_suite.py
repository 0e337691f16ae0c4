"""CIFAR-10 suite tests: models, training loop, and the four test CLIs on
the fake dataset."""

import json

import numpy as np
import pytest
from PIL import Image

from robustart_tpu.cifar10.aug import CIFAR10Policy, RandAugment
from robustart_tpu.cifar10.models import CIFAR_MODELS, get_cifar_model
import jax
import jax.numpy as jnp


def test_model_menu_covers_reference_imports():
    # reference cifar10/code/test_cifar_c.py:42-71 imports
    for name in ["ResNet18", "ResNet34", "ResNet50", "ResNet101", "ResNet152",
                 "vit", "MobileNetV2", "mobilenetv3_small", "mobilenetv3_large"]:
        assert name in CIFAR_MODELS


@pytest.mark.parametrize("name", ["ResNet18", "vit", "MobileNetV2"])
def test_cifar_models_forward(name):
    m = get_cifar_model(name, num_classes=10)
    x = jnp.ones((2, 32, 32, 3)) * 0.4
    variables = m.init({"params": jax.random.key(0)}, x, train=False)
    out = m.apply(variables, x, train=False)
    assert out.shape == (2, 10)
    assert bool(jnp.isfinite(out).all())


def test_augment_policies():
    img = Image.fromarray(
        np.random.default_rng(0).integers(0, 255, (32, 32, 3), np.uint8)
    )
    out = CIFAR10Policy(seed=0)(img)
    assert out.size == (32, 32)
    out = RandAugment(2, 14, seed=0)(img)
    assert out.size == (32, 32)


@pytest.fixture(scope="module")
def trained_ckpt(tmp_path_factory):
    from robustart_tpu.cifar10.train import main

    path = tmp_path_factory.mktemp("cifar_ckpt")
    res = main([
        "--dataset", "fake", "--net", "ResNet18", "--bs", "32",
        "--n_epochs", "2", "--lr", "0.001", "--aug", "none",
        "--path", str(path),
    ])
    return path, res


def test_train_cli(trained_ckpt):
    path, res = trained_ckpt
    assert res["best_acc"] >= 0
    assert (path / f"{res['watermark']}_best.msgpack").exists()
    assert (path / res["log"].split("/")[-1]).exists()


def test_train_cli_advtrain(tmp_path):
    from robustart_tpu.cifar10.train import main

    res = main([
        "--dataset", "fake", "--net", "ResNet18", "--bs", "32",
        "--n_epochs", "1", "--advtrain", "--steps", "2", "--aug", "none",
        "--path", str(tmp_path),
    ])
    assert "advtrain" in res["watermark"]


def test_cifar_c_cli(tmp_path, trained_ckpt):
    from robustart_tpu.cifar10.test_cifar_c import main

    ckpt_path, res = trained_ckpt
    # synthesize a mini CIFAR-10-C: 2 corruptions x (5 sev x 4 imgs)
    rng = np.random.default_rng(0)
    labels = np.arange(20) % 10
    np.save(tmp_path / "labels.npy", labels)
    for c in ["gaussian_noise", "contrast"]:
        np.save(tmp_path / f"{c}.npy",
                rng.integers(0, 255, (20, 32, 32, 3), np.uint8))
    out = main([
        "--model", "ResNet18", "--dataset", "fake",
        "--checkpoint", str(ckpt_path / f"{res['watermark']}_best.msgpack"),
        "--data_dir", str(tmp_path), "--batch_size", "8",
        "--output", str(tmp_path / "c.json"),
    ])
    assert 0.0 <= out["mCE"] <= 1.0
    assert set(out["results"]) == {"gaussian_noise", "contrast"}
    assert (tmp_path / "c.json").exists()


def test_cifar_p_cli(tmp_path, trained_ckpt):
    from robustart_tpu.cifar10.test_cifar_p import main

    ckpt_path, res = trained_ckpt
    rng = np.random.default_rng(0)
    np.save(tmp_path / "gaussian_noise.npy",
            rng.integers(0, 255, (4, 5, 32, 32, 3), np.uint8))
    out = main([
        "--model", "ResNet18", "--dataset", "fake",
        "--checkpoint", str(ckpt_path / f"{res['watermark']}_best.msgpack"),
        "--data_dir", str(tmp_path), "--batch_size", "8",
        "--perturbations", "gaussian_noise",
    ])
    r = out["results"]["gaussian_noise"]
    assert 0.0 <= r["flip_prob"] <= 1.0
    assert r["zipf_dist"] >= 0.0 and r["top5_dist"] >= 0.0


def test_cifar_s_cli(tmp_path, trained_ckpt):
    from robustart_tpu.cifar10.test_cifar_s import main

    ckpt_path, res = trained_ckpt
    out = main([
        "--model", "ResNet18", "--dataset", "fake",
        "--checkpoint", str(ckpt_path / f"{res['watermark']}_best.msgpack"),
        "--batch_size", "16", "--limit", "16",
    ])
    assert len(out["results"]) == 13  # identity + 3 interp x 4 sizes
    assert 0.0 <= out["mean_flip"] <= 1.0


def test_mul_adversarial_cli(tmp_path, trained_ckpt):
    from robustart_tpu.cifar10.test_mul_adversarial import main

    ckpt_path, res = trained_ckpt
    out = main([
        "--model", "ResNet18", "--dataset", "fake",
        "--checkpoint", str(ckpt_path / f"{res['watermark']}_best.msgpack"),
        "--batch_size", "16", "--limit", "32",
        "--attacks", "clean", "fgsm_8", "pgdl2_1.5",
    ])
    assert set(out) == {"clean", "fgsm_8", "pgdl2_1.5"}
    assert all(0 <= v <= 100 for v in out.values())
    # attacks shouldn't increase accuracy
    assert out["fgsm_8"] <= out["clean"] + 1e-9


def test_cifar_p_metric_helpers_match_reference_loops():
    """Golden check: the vectorized dist/ranking_dist/flip_prob equal the
    reference's sequential-loop formulas (reference cifar10/code/
    test_cifar_p.py:116-174), evaluated by a test-local loop oracle."""
    import numpy as np

    from robustart_tpu.cifar10.test_cifar_p import dist, flip_prob, ranking_dist

    rng = np.random.default_rng(0)
    nc, n_vids, n_frames = 10, 5, 7
    ranks = np.stack(
        [np.stack([rng.permutation(nc) + 1 for _ in range(n_frames)])
         for _ in range(n_vids)]
    )
    preds = rng.integers(0, nc, (n_vids, n_frames))

    def dist_ref(sigma, mode):
        identity = np.arange(1, nc + 1)
        if mode == "top5":
            cs = np.cumsum([0] + [1] * 5 + [0] * (nc - 1 - 5))
            return np.sum(np.abs(cs[:5] - cs[sigma - 1][:5]))
        recip = 1.0 / identity
        return np.sum(np.abs(recip - recip[sigma - 1]) * recip)

    def ranking_dist_ref(ranks, noise, mode):
        result = 0.0
        for vid in ranks:
            vals = []
            perm1 = vid[0]
            perm1_inv = np.argsort(perm1)
            for perm2 in vid[1:]:
                vals.append(dist_ref(perm2[perm1_inv], mode))
                if not noise:
                    perm1, perm1_inv = perm2, np.argsort(perm2)
            result += np.mean(vals) / len(ranks)
        return result

    def flip_prob_ref(preds, noise):
        result = 0.0
        for vid in preds:
            vals = []
            prev = vid[0]
            for p in vid[1:]:
                vals.append(int(prev != p))
                if not noise:
                    prev = p
            result += np.mean(vals) / len(preds)
        return result

    for noise in (False, True):
        for mode in ("top5", "zipf"):
            np.testing.assert_allclose(
                ranking_dist(ranks, noise, mode, nc),
                ranking_dist_ref(ranks, noise, mode),
                rtol=1e-12,
            )
        np.testing.assert_allclose(
            flip_prob(preds, noise), flip_prob_ref(preds, noise), rtol=1e-12
        )
