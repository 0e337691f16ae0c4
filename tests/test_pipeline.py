"""GPipe pipeline parallelism: schedule parity, gradients, dp×pp meshes.

The reference has no pipeline parallelism (SURVEY.md §2.11 — DP only);
these tests validate the TPU-native superset in parallel/pipeline.py
against the sequential forward as the oracle, on the 8-virtual-device CPU
mesh (the SURVEY §4 multi-device test strategy).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh, PartitionSpec as P

from robustart_tpu.parallel.pipeline import (
    gpipe,
    shard_pipeline_params,
    split_stages,
    stack_blocks,
    unsplit_stages,
    vit_merge_params,
    vit_pipeline_logits_fn,
    vit_split_params,
)


def _pipe_mesh(pipe=4, data=None):
    devs = np.array(jax.devices()[: pipe * (data or 1)])
    if data:
        return Mesh(devs.reshape(data, pipe), ("data", "pipe"))
    return Mesh(devs, ("pipe",))


def _toy_stage(params_bps, x):
    def body(h, w):
        return jnp.tanh(h @ w), None

    h, _ = jax.lax.scan(body, x, params_bps)
    return h


def _toy_params(depth=8, dim=16, seed=0):
    rng = np.random.default_rng(seed)
    return [
        {"w": jnp.asarray(rng.normal(0, 0.3, (dim, dim)), jnp.float32)}
        for _ in range(depth)
    ]


def _toy_sequential(blocks, x):
    for b in blocks:
        x = jnp.tanh(x @ b["w"])
    return x


class TestGpipeCore:
    def test_matches_sequential(self):
        blocks = _toy_params()
        mesh = _pipe_mesh(4)
        staged = split_stages(stack_blocks(blocks), 4)
        x = jnp.asarray(
            np.random.default_rng(1).normal(0, 1, (12, 16)), jnp.float32
        )
        stage = lambda p, h: _toy_stage(p["w"], h)  # noqa: E731
        got = gpipe(stage, staged, x, mesh=mesh, n_microbatches=6)
        want = _toy_sequential(blocks, x)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=1e-6, atol=1e-6)

    @pytest.mark.parametrize("m", [1, 2, 12])
    def test_any_microbatch_count(self, m):
        # correctness must not depend on M (bubble ticks are masked)
        blocks = _toy_params(depth=4)
        mesh = _pipe_mesh(2)
        staged = split_stages(stack_blocks(blocks), 2)
        x = jnp.asarray(
            np.random.default_rng(2).normal(0, 1, (12, 16)), jnp.float32
        )
        stage = lambda p, h: _toy_stage(p["w"], h)  # noqa: E731
        got = gpipe(stage, staged, x, mesh=mesh, n_microbatches=m)
        want = _toy_sequential(blocks, x)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=1e-6, atol=1e-6)

    def test_gradients_match_sequential(self):
        # the SAME schedule must be reverse-differentiable: grads wrt the
        # staged params and the input agree with the sequential oracle
        blocks = _toy_params(depth=8)
        mesh = _pipe_mesh(4)
        staged = split_stages(stack_blocks(blocks), 4)
        x = jnp.asarray(
            np.random.default_rng(3).normal(0, 1, (8, 16)), jnp.float32
        )
        stage = lambda p, h: _toy_stage(p["w"], h)  # noqa: E731

        def loss_pipe(staged, x):
            y = gpipe(stage, staged, x, mesh=mesh, n_microbatches=4)
            return jnp.sum(y**2)

        def loss_seq(stacked, x):
            def body(h, w):
                return jnp.tanh(h @ w), None

            y, _ = jax.lax.scan(body, x, stacked["w"])
            return jnp.sum(y**2)

        gp, gx = jax.grad(loss_pipe, argnums=(0, 1))(staged, x)
        stacked = stack_blocks(blocks)
        gs, gxs = jax.grad(loss_seq, argnums=(0, 1))(stacked, x)
        np.testing.assert_allclose(
            np.asarray(unsplit_stages(gp)["w"]), np.asarray(gs["w"]),
            rtol=1e-5, atol=1e-6,
        )
        np.testing.assert_allclose(np.asarray(gx), np.asarray(gxs),
                                   rtol=1e-5, atol=1e-6)

    def test_bad_shapes_raise(self):
        blocks = _toy_params(depth=6)
        mesh = _pipe_mesh(4)
        with pytest.raises(ValueError, match="not divisible"):
            split_stages(stack_blocks(blocks), 4)
        staged = split_stages(stack_blocks(_toy_params(depth=8)), 4)
        x = jnp.zeros((10, 16), jnp.float32)
        stage = lambda p, h: _toy_stage(p["w"], h)  # noqa: E731
        with pytest.raises(ValueError, match="n_microbatches"):
            gpipe(stage, staged, x, mesh=mesh, n_microbatches=4)


@pytest.fixture(scope="module")
def tiny_vit():
    from robustart_tpu.models import create_classifier

    return create_classifier("deit_tiny_b16_224", rng=0, input_size=32)


class TestVitPipeline:
    def test_split_merge_roundtrip(self, tiny_vit):
        split = vit_split_params(tiny_vit.variables, tiny_vit.module.depth, 4)
        merged = vit_merge_params(split, tiny_vit.module.depth)
        jax.tree.map(
            lambda a, b: np.testing.assert_array_equal(
                np.asarray(a), np.asarray(b)
            ),
            merged,
            {"params": tiny_vit.variables["params"]},
        )

    def test_logits_match_sequential(self, tiny_vit):
        mesh = _pipe_mesh(4)
        clf = tiny_vit
        split = shard_pipeline_params(
            vit_split_params(clf.variables, clf.module.depth, 4), mesh
        )
        fn = jax.jit(
            vit_pipeline_logits_fn(clf, mesh=mesh, n_microbatches=4)
        )
        x = jnp.asarray(
            np.random.default_rng(5).uniform(0, 1, (8, 32, 32, 3)),
            jnp.float32,
        )
        got = np.asarray(fn(split, x))
        want = np.asarray(clf.apply_fn(clf.variables, x, train=False))
        np.testing.assert_allclose(got, want, rtol=2e-5, atol=2e-5)

    def test_dp_pp_mesh(self, tiny_vit):
        # (data=2, pipe=4): microbatch rows shard over data while stages
        # pipeline over pipe — the production layout for large ViTs
        mesh = _pipe_mesh(4, data=2)
        clf = tiny_vit
        split = shard_pipeline_params(
            vit_split_params(clf.variables, clf.module.depth, 4), mesh
        )
        fn = jax.jit(
            vit_pipeline_logits_fn(
                clf, mesh=mesh, n_microbatches=4, x_spec=P(None, "data")
            )
        )
        x = jnp.asarray(
            np.random.default_rng(6).uniform(0, 1, (8, 32, 32, 3)),
            jnp.float32,
        )
        got = np.asarray(fn(split, x))
        want = np.asarray(clf.apply_fn(clf.variables, x, train=False))
        np.testing.assert_allclose(got, want, rtol=2e-5, atol=2e-5)

    def test_train_step_runs_and_matches_grads(self, tiny_vit):
        # full pp train step: CE loss, grads wrt stacked stage params match
        # the sequential model's per-block grads (the oracle)
        mesh = _pipe_mesh(4)
        clf = tiny_vit
        depth = clf.module.depth
        split = shard_pipeline_params(
            vit_split_params(clf.variables, depth, 4), mesh
        )
        fn = vit_pipeline_logits_fn(clf, mesh=mesh, n_microbatches=4)
        x = jnp.asarray(
            np.random.default_rng(7).uniform(0, 1, (8, 32, 32, 3)),
            jnp.float32,
        )
        y = jnp.asarray(np.arange(8) % 10, jnp.int32)

        def ce(logits, labels):
            logp = jax.nn.log_softmax(logits)
            return -jnp.mean(jnp.take_along_axis(
                logp, labels[:, None], axis=1))

        @jax.jit
        def pipe_loss_grads(split, x, y):
            return jax.value_and_grad(
                lambda s: ce(fn(s, x), y)
            )(split)

        loss_p, grads_p = pipe_loss_grads(split, x, y)

        def seq_loss(variables):
            return ce(clf.apply_fn(variables, x, train=False), y)

        loss_s, grads_s = jax.value_and_grad(seq_loss)(clf.variables)
        assert np.isfinite(float(loss_p))
        np.testing.assert_allclose(float(loss_p), float(loss_s), rtol=1e-5)
        # compare one early and one late block's attention-qkv kernel grad
        gp = unsplit_stages(grads_p["stages"])
        for i in (0, depth - 1):
            want = np.asarray(
                grads_s["params"][f"block{i}"]["attn"]["qkv"]["kernel"]
            )
            got = np.asarray(
                jax.tree.map(lambda v: v[i], gp)["attn"]["qkv"]["kernel"]
            )
            np.testing.assert_allclose(got, want, rtol=2e-4, atol=1e-6)


def test_solver_pipeline_parallel_eval_equivalence(tmp_path):
    """``dist.pipeline_parallel: 4`` through the SOLVER surface: a (2, 4)
    data×pipe mesh must produce the same eval metrics as pure DP — the
    same equivalence bar the tp knob is held to (test_parallel.py)."""
    import os

    import yaml

    from robustart_tpu.solvers.cls_solver import main

    def run(pp, sub):
        cfg = {
            "model": {"type": "deit_tiny_b16_224",
                      "kwargs": {"num_classes": 10, "input_size": 32}},
            "dist": {"pipeline_parallel": pp, "pipeline_microbatches": 2},
            "data": {"type": "imagenet", "read_from": "fake", "fake_size": 16,
                     "fake_num_classes": 10, "batch_size": 8,
                     "input_size": 32, "num_workers": 0,
                     "test": {"evaluator": {"type": "imagenet",
                                            "kwargs": {"topk": [1, 5]}}}},
            "saver": {"save_dir": str(tmp_path / sub / "ck"),
                      "results_path": str(tmp_path / sub / "results.txt.all")},
            "lr_scheduler": {"type": "CosineEpoch", "kwargs": {"max_epoch": 1}},
            "optimizer": {"type": "SGD", "kwargs": {}},
        }
        if pp == 1:
            cfg["dist"] = {}
        p = str(tmp_path / sub / "config.yaml")
        os.makedirs(str(tmp_path / sub), exist_ok=True)
        with open(p, "w") as f:
            yaml.safe_dump(cfg, f)
        return main(["--config", p, "--evaluate"])

    m_dp = run(1, "dp")
    m_pp = run(4, "pp")
    assert m_dp["top1"] == pytest.approx(m_pp["top1"], abs=1e-6)
    assert m_dp["top5"] == pytest.approx(m_pp["top5"], abs=1e-6)


def test_solver_pipeline_parallel_guards(tmp_path):
    """pp×tp is rejected; non-ViT families are rejected at build_model."""
    from robustart_tpu.core.config import Config
    from robustart_tpu.solvers.base import Solver

    base = {
        "data": {"type": "imagenet", "read_from": "fake", "fake_size": 8,
                 "fake_num_classes": 10, "batch_size": 8, "input_size": 32,
                 "num_workers": 0},
        "saver": {"save_dir": str(tmp_path / "ck")},
    }
    with pytest.raises(ValueError, match="mutually exclusive"):
        Solver(Config({**base,
                           "model": {"type": "deit_tiny_b16_224"},
                           "dist": {"pipeline_parallel": 2,
                                    "tensor_parallel": 2}}))
    # a TRAINING solver with pipeline_parallel is rejected outright: only
    # the eval surface consumes the pipe axis (solvers/base.py guard)
    with pytest.raises(ValueError, match="eval surface only"):
        Solver(Config({**base,
                       "model": {"type": "deit_tiny_b16_224"},
                       "dist": {"pipeline_parallel": 2}}))
    s = Solver(Config({**base,
                           "model": {"type": "resnet18_official",
                                     "kwargs": {"num_classes": 10,
                                                "input_size": 32}},
                           "dist": {"pipeline_parallel": 2}}),
               evaluate_only=True)
    with pytest.raises(ValueError, match="ViT family"):
        s.build_model()


class TestVitPipelineTP:
    """Three-axis (data, model, pipe) composition: Megatron TP inside each
    GPipe stage (parallel/pipeline.py vit_tp_*). Beyond the reference
    (DP-only, SURVEY.md 2.11). Uses deit_small (6 heads — divisible by the
    model-axis size 2; deit_tiny's 3 heads are not)."""

    def _mesh3(self):
        devs = np.array(jax.devices()[:8]).reshape(2, 2, 2)
        return Mesh(devs, ("data", "model", "pipe"))

    @pytest.fixture(scope="class")
    def tp_vit(self):
        from robustart_tpu.models import create_classifier

        return create_classifier("deit_small_b16_224", rng=0, input_size=32)

    def test_tp_stage_logits_match_sequential(self, tp_vit):
        tiny_vit = tp_vit
        from robustart_tpu.parallel.pipeline import (
            shard_pipeline_params_tp,
            vit_tp_pipeline_logits_fn,
        )

        mesh = self._mesh3()
        clf = tiny_vit
        split = shard_pipeline_params_tp(
            vit_split_params(clf.variables, clf.module.depth, 2), mesh
        )
        # qkv kernel leaf must actually be model-sharded on its column dim
        spec = split["stages"]["attn"]["qkv"]["kernel"].sharding.spec
        assert spec == P("pipe", None, None, "model"), spec
        fn = jax.jit(
            vit_tp_pipeline_logits_fn(
                clf, mesh=mesh, n_microbatches=4, x_spec=P(None, "data")
            )
        )
        x = jnp.asarray(
            np.random.default_rng(8).uniform(0, 1, (8, 32, 32, 3)),
            jnp.float32,
        )
        got = np.asarray(fn(split, x))
        want = np.asarray(clf.apply_fn(clf.variables, x, train=False))
        np.testing.assert_allclose(got, want, rtol=2e-5, atol=2e-5)

    def test_tp_stage_train_step(self, tp_vit):
        tiny_vit = tp_vit
        from robustart_tpu.parallel.pipeline import (
            shard_pipeline_params_tp,
            vit_tp_pipeline_logits_fn,
        )

        mesh = self._mesh3()
        clf = tiny_vit
        depth = clf.module.depth
        split = shard_pipeline_params_tp(
            vit_split_params(clf.variables, depth, 2), mesh
        )
        fn = vit_tp_pipeline_logits_fn(
            clf, mesh=mesh, n_microbatches=4, x_spec=P(None, "data")
        )
        x = jnp.asarray(
            np.random.default_rng(9).uniform(0, 1, (8, 32, 32, 3)),
            jnp.float32,
        )
        y = jnp.asarray(np.arange(8) % 10, jnp.int32)

        def ce(logits, labels):
            logp = jax.nn.log_softmax(logits)
            return -jnp.mean(jnp.take_along_axis(
                logp, labels[:, None], axis=1))

        @jax.jit
        def step(split, x, y):
            loss, grads = jax.value_and_grad(
                lambda s: ce(fn(s, x), y)
            )(split)
            new = jax.tree.map(lambda p, g: p - 0.01 * g, split, grads)
            return loss, grads, new

        loss_p, grads_p, new = step(split, x, y)

        def seq_loss(variables):
            return ce(clf.apply_fn(variables, x, train=False), y)

        loss_s, grads_s = jax.value_and_grad(seq_loss)(clf.variables)
        np.testing.assert_allclose(float(loss_p), float(loss_s), rtol=1e-5)
        gp = unsplit_stages(grads_p["stages"])
        for i in (0, depth - 1):
            want = np.asarray(
                grads_s["params"][f"block{i}"]["attn"]["qkv"]["kernel"]
            )
            got = np.asarray(
                jax.tree.map(lambda v: v[i], gp)["attn"]["qkv"]["kernel"]
            )
            np.testing.assert_allclose(got, want, rtol=2e-4, atol=1e-6)
        # updated params keep their (pipe, model) shardings
        spec = new["stages"]["attn"]["qkv"]["kernel"].sharding.spec
        assert spec == P("pipe", None, None, "model"), spec
