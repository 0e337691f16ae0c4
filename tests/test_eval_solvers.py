"""End-to-end tests of the benchmark eval solvers on the fake backend."""

import json
import os.path as osp

import numpy as np
import pytest

from robustart_tpu.core.config import Config
from robustart_tpu.solvers import (
    BenchmarkEvalAdvSolver,
    ImgnetAOEvalSolver,
    ImgnetPEvalSolver,
    MultiEvalDecoderResizeSolver,
    MultiEvalSolver,
)


def _cfg(tmp_path, **extra_test):
    test = {
        "sampler": {"type": "distributed"},
        "transforms": {"type": "JUSTNORM"},
        "evaluator": {"type": "imagenetc", "kwargs": {"topk": [1, 5]}},
    }
    test.update(extra_test)
    return Config(
        {
            "model": {"type": "resnet18", "kwargs": {"num_classes": 10}},
            "seed": 0,
            "data": {
                "read_from": "fake",
                "fake_size": 16,
                "fake_num_classes": 10,
                "batch_size": 8,
                "num_workers": 2,
                "input_size": 32,
                "test": test,
            },
            "saver": {"results_dir": str(tmp_path / "results")},
        }
    )


def test_multi_eval_solver_online_imagenet_c(tmp_path):
    cfg = _cfg(
        tmp_path,
        imagenet_c_online=True,
        corruptions=["gaussian_noise", "contrast"],
        severities=[1, 3],
    )
    solver = MultiEvalSolver(cfg)
    summary = solver.evaluate()
    assert set(summary["top1_per_corruption"]) == {"gaussian_noise", "contrast"}
    res = tmp_path / "results" / "gaussian_noise" / "1" / "results.txt.all"
    assert res.exists()
    assert len(open(res).readlines()) == 16
    # metric JSON written next to results (reference protocol)
    assert (tmp_path / "results" / "gaussian_noise" / "1" / "metric").exists()
    assert summary["mCE"] is not None

    # idempotent recovery: second run skips existing files, same summary
    summary2 = MultiEvalSolver(cfg).evaluate()
    assert summary2["top1_per_corruption"] == summary["top1_per_corruption"]


def test_multi_eval_online_fused_severities_bitwise(tmp_path):
    """The fused-severities online path (default) writes bitwise-identical
    result files to the per-cell path: each severity keeps its own RNG key
    chain (key(seed·131+s) folded per batch) and the same corrupt→floor→
    forward graph, just stacked into one program per batch."""
    cfg_fused = _cfg(
        tmp_path / "fused",
        imagenet_c_online=True,
        corruptions=["gaussian_noise"],
        severities=[1, 3],
    )
    cfg_cell = _cfg(
        tmp_path / "cell",
        imagenet_c_online=True,
        fuse_severities=False,
        corruptions=["gaussian_noise"],
        severities=[1, 3],
    )
    s_fused = MultiEvalSolver(cfg_fused).evaluate()
    s_cell = MultiEvalSolver(cfg_cell).evaluate()
    assert s_fused["top1_per_corruption"] == s_cell["top1_per_corruption"]
    for sev in (1, 3):
        a = (tmp_path / "fused" / "results" / "gaussian_noise" / str(sev)
             / "results.txt.all").read_text()
        b = (tmp_path / "cell" / "results" / "gaussian_noise" / str(sev)
             / "results.txt.all").read_text()
        assert a == b and len(a.splitlines()) == 16


def test_imgnet_a_o_eval_solver(tmp_path):
    cfg = _cfg(tmp_path, **{"imagenet_a&o": True, "class_subset": list(range(5))})
    solver = ImgnetAOEvalSolver(cfg)
    results = solver.evaluate()
    assert "imagenet-a" in results and "top1" in results["imagenet-a"]
    assert "imagenet-o" in results and "AUPR" in results["imagenet-o"]
    res_a = tmp_path / "results" / "imagenet-a" / "results.txt.all"
    lines = [json.loads(l) for l in open(res_a)]
    assert len(lines[0]["score"]) == 5  # restricted to the class subset


def test_imgnet_p_eval_solver(tmp_path):
    cfg = _cfg(tmp_path, perturbations=["gaussian_noise", "tilt"], n_frames=4)
    solver = ImgnetPEvalSolver(cfg)
    summary = solver.evaluate()
    assert set(summary["per_perturbation"]) == {"gaussian_noise", "tilt"}
    assert 0.0 <= summary["Mean"] <= 1.0
    res = tmp_path / "results" / "tilt" / "results.txt.all"
    lines = [json.loads(l) for l in open(res)]
    assert len(lines) == 16 and len(lines[0]["predictions"]) == 4


def test_multi_eval_decoder_resize_solver(tmp_path):
    cfg = _cfg(
        tmp_path,
        decoders=["pil", "opencv", "ffmpeg"],
        resize_types=["pil-bilinear", "opencv-bilinear"],
        limit_samples=4,
        save_acc_var_neg=True,
        fake_root=str(tmp_path / "s_fake"),
    )
    cfg.data.fake_size = 4
    solver = MultiEvalDecoderResizeSolver(cfg)
    summary = solver.evaluate()
    assert len(summary["per_combo"]) == 6
    assert "Mean" in summary and "Std." in summary and "acc_var_neg" in summary
    # the ffmpeg axis must be annotated with the serving implementation
    assert summary["ffmpeg_decoder_impl"] in ("ffmpeg", "tf-fast-idct")


@pytest.mark.parametrize("attack,eps", [("fgsm", 8.0), ("pgd_linf", 2.0)])
def test_benchmark_eval_adv_whitebox(tmp_path, attack, eps):
    cfg = _cfg(tmp_path)
    solver = BenchmarkEvalAdvSolver(cfg, attack=attack, eps=eps)
    out = solver.evaluate()
    assert 0.0 <= out["AR"] <= 100.0
    assert osp.exists(out["adv_file"]) and osp.exists(out["clean_file"])
    # protocol: AR parse_line reads {"prediction": p, "label": l}
    line = open(out["adv_file"]).readline()
    rec = json.loads(line)
    assert set(rec) == {"prediction", "label"}


def test_benchmark_eval_adv_transfer(tmp_path):
    cfg = _cfg(tmp_path)
    solver = BenchmarkEvalAdvSolver(
        cfg, src_name="resnet18", tgt_name="resnet18", attack="fgsm", eps=8.0
    )
    out = solver.evaluate()
    assert "AR" in out


def test_imgnet_p_online_sequences(tmp_path):
    cfg = _cfg(
        tmp_path,
        imagenet_p_online=True,
        perturbations=["gaussian_noise", "rotate", "brightness"],
        n_frames=3,
    )
    solver = ImgnetPEvalSolver(cfg)
    summary = solver.evaluate()
    assert set(summary["per_perturbation"]) == {
        "gaussian_noise", "rotate", "brightness",
    }
    res = tmp_path / "results" / "rotate" / "results.txt.all"
    lines = [json.loads(l) for l in open(res)]
    assert len(lines) == 16 and len(lines[0]["predictions"]) == 3


def test_imgnet_p_online_fused_matches_split(tmp_path):
    """The single-dispatch fused video program (synth + forward + argmax in
    one fori_loop) writes the same predictions as the split two-dispatch
    form it replaced (imagenet_p_fused: false)."""
    def run(sub, fused):
        cfg = _cfg(
            tmp_path / sub,
            imagenet_p_online=True,
            imagenet_p_fused=fused,
            perturbations=["gaussian_noise", "rotate"],
            n_frames=3,
        )
        cfg.saver = {"results_dir": str(tmp_path / sub / "results")}
        ImgnetPEvalSolver(cfg).evaluate()
        out = {}
        for pert in ("gaussian_noise", "rotate"):
            res = tmp_path / sub / "results" / pert / "results.txt.all"
            out[pert] = [json.loads(l)["predictions"] for l in open(res)]
        return out

    fused = run("fused", True)
    split = run("split", False)
    assert fused == split


def test_benchmark_eval_adv_autoattack(tmp_path):
    cfg = _cfg(tmp_path)
    cfg.autoattack_kwargs = {
        "n_iter": 5, "n_target_classes": 1, "square_n_queries": 20,
    }
    solver = BenchmarkEvalAdvSolver(cfg, attack="autoattack_linf", eps=8.0)
    out = solver.evaluate()
    assert 0.0 <= out["AR"] <= 100.0


def test_imgnet_p_stored_videos(tmp_path):
    """Precomputed ImageNet-P: .npy videos via meta-file dataset."""
    import os
    import os.path as osp

    rng = np.random.default_rng(0)
    pert_dir = tmp_path / "data" / "gaussian_noise"
    pert_dir.mkdir(parents=True)
    meta = pert_dir / "meta.txt"
    with meta.open("w") as f:
        for i in range(4):
            np.save(pert_dir / f"v{i}.npy",
                    rng.integers(0, 255, (3, 32, 32, 3), np.uint8))
            f.write(f"v{i}.npy {i}\n")
    cfg = Config({
        "model": {"type": "resnet18", "kwargs": {"num_classes": 10}},
        "seed": 0,
        "data": {
            "read_from": "fs", "batch_size": 2, "num_workers": 1,
            "input_size": 32,
            "test": {
                "root_dir": str(tmp_path / "data"), "meta_file": str(meta),
                "sampler": {"type": "distributed"},
                "transforms": {"type": "JUSTNORM"},
                "perturbations": ["gaussian_noise"], "n_frames": 3,
            },
        },
        "saver": {"results_dir": str(tmp_path / "results")},
    })
    out = ImgnetPEvalSolver(cfg).evaluate()
    assert "gaussian_noise" in out["per_perturbation"]
    res = tmp_path / "results" / "gaussian_noise" / "results.txt.all"
    lines = [json.loads(l) for l in open(res)]
    assert len(lines) == 4 and len(lines[0]["predictions"]) == 3


def test_loader_surfaces_worker_errors():
    """A failing dataset item must raise, not deadlock the iterator."""
    from robustart_tpu.data.loader import DataLoader

    class Bad:
        def __len__(self):
            return 4

        def __getitem__(self, i):
            raise RuntimeError("boom")

    loader = DataLoader(Bad(), np.arange(4), batch_size=2, num_workers=1)
    with pytest.raises(RuntimeError, match="boom"):
        list(loader)


def test_imgnet_p_stored_mp4_videos(tmp_path):
    """Precomputed ImageNet-P in the PUBLISHED layout: .mp4 perturbation
    videos (Hendrycks ImageNet-P distribution) decoded via cv2."""
    import cv2

    rng = np.random.default_rng(0)
    pert_dir = tmp_path / "data" / "gaussian_noise"
    pert_dir.mkdir(parents=True)
    meta = pert_dir / "meta.txt"
    with meta.open("w") as f:
        for i in range(4):
            path = str(pert_dir / f"v{i}.mp4")
            w = cv2.VideoWriter(
                path, cv2.VideoWriter_fourcc(*"mp4v"), 5, (32, 32)
            )
            assert w.isOpened()
            for _ in range(3):
                w.write(rng.integers(0, 255, (32, 32, 3), np.uint8))
            w.release()
            f.write(f"v{i}.mp4 {i}\n")
    cfg = Config({
        "model": {"type": "resnet18", "kwargs": {"num_classes": 10}},
        "seed": 0,
        "data": {
            "read_from": "fs", "batch_size": 2, "num_workers": 1,
            "input_size": 32,
            "test": {
                "root_dir": str(tmp_path / "data"), "meta_file": str(meta),
                "sampler": {"type": "distributed"},
                "transforms": {"type": "JUSTNORM"},
                "perturbations": ["gaussian_noise"], "n_frames": 3,
            },
        },
        "saver": {"results_dir": str(tmp_path / "results")},
    })
    out = ImgnetPEvalSolver(cfg).evaluate()
    assert "gaussian_noise" in out["per_perturbation"]
    res = tmp_path / "results" / "gaussian_noise" / "results.txt.all"
    lines = [json.loads(l) for l in open(res)]
    assert len(lines) == 4 and len(lines[0]["predictions"]) == 3


def test_perturb_frame_all_defaults_traced():
    """`perturb_frame` (the shared online-P frame synthesizer) must handle
    every DEFAULT_PERTURBATION — including snow, which previously fell
    through to an identity warp — with a TRACED frame index, so a
    lax.fori_loop over frames compiles to one program (the megastep form
    scripts/bench_imagenet_p.py measures)."""
    import jax
    import jax.numpy as jnp

    from robustart_tpu.solvers.imgnet_p_eval_solver import (
        DEFAULT_PERTURBATIONS,
        perturb_frame,
    )

    rng = np.random.default_rng(0)
    x01 = jnp.asarray(rng.uniform(0, 1, (32, 32, 3)), jnp.float32)
    n_frames = 4
    for pert in DEFAULT_PERTURBATIONS:
        def seq_checksum(x):
            def body(f, acc):
                fr = perturb_frame(pert, x, f, jax.random.key(7), n_frames)
                return acc + jnp.sum(fr)

            return jax.lax.fori_loop(0, n_frames, body, jnp.float32(0.0))

        total = float(jax.jit(seq_checksum)(x01))
        assert np.isfinite(total), pert
        # frames must differ across the sequence (no identity fallback):
        # compare frame 0 vs the last frame with a concrete index too
        f0 = np.asarray(perturb_frame(pert, x01, 0, jax.random.key(7),
                                      n_frames))
        fN = np.asarray(perturb_frame(pert, x01, n_frames - 1,
                                      jax.random.key(7), n_frames))
        assert f0.shape == fN.shape == x01.shape, pert
        assert np.abs(fN - f0).max() > 1e-3, f"{pert}: sequence is constant"
