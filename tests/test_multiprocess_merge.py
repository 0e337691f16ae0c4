"""Multi-PROCESS correctness of the rank-sharded result-merge protocol
(VERDICT r1 item 7): real OS processes, real ``jax.distributed.initialize``,
shared-filesystem sentinels.

The reference's distributed eval writes per-rank result shards merged by
the filesystem (reference imagenet_c_loop_mini/eval.sh:23-25 torchrun 8-rank
eval; SURVEY.md §3.4, §5.8). Round-1 only tested this single-process; the
round-1 multichip failure was exactly the class of bug that only appears
when the code runs the way the launcher runs it.
"""

import json
import os
import os.path as osp
import socket
import subprocess
import sys
import time

import numpy as np
import yaml

REPO = osp.dirname(osp.dirname(osp.abspath(__file__)))


def _free_port():
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def _spawn(script, rank, world, port, extra_env=None):
    env = dict(os.environ)
    env.update(
        {
            "JAX_PLATFORMS": "cpu",
            "XLA_FLAGS": "--xla_force_host_platform_device_count=4",
            "WORLD_SIZE": str(world),
            "RANK": str(rank),
            "MASTER_ADDR": "127.0.0.1",
            "MASTER_PORT": str(port),
            "SKIP_DIST": "0",
            "PYTHONPATH": env.get("PYTHONPATH", "") + os.pathsep + REPO,
        }
    )
    env.update(extra_env or {})
    return subprocess.Popen(
        [sys.executable, "-c", script],
        env=env,
        cwd=REPO,
        stdout=subprocess.PIPE,
        stderr=subprocess.STDOUT,
        text=True,
    )


def test_sentinel_merge_with_straggler(tmp_path):
    """merge() must block on the .done sentinel of a slow rank — never read a
    half-written shard."""
    path = str(tmp_path / "results.txt.all")
    script = """
import os, sys, time
sys.path.insert(0, {repo!r})
from robustart_tpu.solvers.base import ResultWriter

rank = int(os.environ["TEST_RANK"])
w = ResultWriter({path!r}, rank=rank, world_size=3)
for i in range(10):
    w.write({{"rank": rank, "i": i}})
    if rank == 2:
        w._f.flush()
        time.sleep(0.15)  # straggler: shard visible but incomplete for ~1.5s
w.close()
if rank == 0:
    out = w.merge(timeout_s=30)
    n = sum(1 for _ in open(out))
    assert n == 30, n
    print("MERGED", n)
""".format(repo=REPO, path=path)
    procs = []
    for rank in (2, 0, 1):  # start the straggler first, merger early
        env = dict(os.environ)
        env["TEST_RANK"] = str(rank)
        env["JAX_PLATFORMS"] = "cpu"
        procs.append(
            subprocess.Popen(
                [sys.executable, "-c", script], env=env,
                stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
            )
        )
    outs = [p.communicate(timeout=120)[0] for p in procs]
    assert all(p.returncode == 0 for p in procs), outs
    assert any("MERGED 30" in o for o in outs), outs
    lines = [json.loads(l) for l in open(path)]
    assert len(lines) == 30
    # every (rank, i) record exactly once
    assert {(l["rank"], l["i"]) for l in lines} == {
        (r, i) for r in range(3) for i in range(10)
    }


def test_two_process_four_device_solver_eval(tmp_path):
    """Full 2-process × 4-virtual-device cls_solver eval via
    jax.distributed.initialize on the CPU platform: rank-sharded loaders,
    per-rank shards, sentinel merge, every sample exactly once."""
    results = str(tmp_path / "r" / "results.txt.all")
    cfg = {
        "model": {"type": "resnet18", "kwargs": {"num_classes": 10}},
        "data": {
            "type": "imagenet", "read_from": "fake", "fake_size": 24,
            "fake_num_classes": 10, "batch_size": 8, "input_size": 32,
            "num_workers": 0,
            "test": {"evaluator": {"type": "imagenet", "kwargs": {"topk": [1, 5]}}},
        },
        "saver": {
            "save_dir": str(tmp_path / "ck"),
            "results_path": results,
            "val_freq": 1000,
        },
        "lr_scheduler": {"type": "CosineEpoch", "kwargs": {"max_epoch": 1}},
        "optimizer": {"type": "SGD", "kwargs": {}},
    }
    cfg_path = str(tmp_path / "config.yaml")
    with open(cfg_path, "w") as f:
        yaml.safe_dump(cfg, f)

    script = """
import jax
jax.config.update("jax_platforms", "cpu")
from robustart_tpu.solvers.cls_solver import main
metrics = main(["--config", {cfg!r}, "--evaluate"])
import os
print("RANK", os.environ["RANK"], "DEVICES", jax.device_count(),
      "LOCAL", jax.local_device_count(), "METRICS", metrics)
""".format(cfg=cfg_path)

    port = _free_port()
    procs = [_spawn(script, rank, 2, port) for rank in range(2)]
    outs = [p.communicate(timeout=900)[0] for p in procs]
    assert all(p.returncode == 0 for p in procs), "\n---\n".join(outs)
    # global device view: 2 processes x 4 local = 8
    assert any("DEVICES 8 LOCAL 4" in o for o in outs), outs

    lines = [json.loads(l) for l in open(results)]
    assert len(lines) == 24  # every fake sample exactly once across ranks
    assert all("score" in l and "label" in l for l in lines)
    # both rank shards contributed
    for r in (0, 1):
        shard = f"{results}.rank{r}"
        assert osp.exists(shard) and osp.exists(shard + ".done")
        assert sum(1 for _ in open(shard)) == 12


def test_two_process_training_stays_in_sync(tmp_path):
    """2-process × 4-device DDP training: gradient psum spans processes,
    so both ranks' final params must be bit-identical and the loss finite
    (reference 16-rank `spring.submit` training, resnet50/run.sh:2)."""
    cfg = {
        "model": {"type": "resnet18", "kwargs": {"num_classes": 10}},
        "data": {
            "type": "imagenet", "read_from": "fake", "fake_size": 16,
            "fake_num_classes": 10, "batch_size": 8, "input_size": 32,
            "num_workers": 0,
        },
        "saver": {"save_dir": str(tmp_path / "ck"), "val_freq": 10_000,
                  "print_freq": 2},
        "lr_scheduler": {"type": "CosineEpoch",
                         "kwargs": {"base_lr": 0.1, "warmup_lr": 0.1,
                                    "warmup_epoch": 0, "max_epoch": 1}},
        "optimizer": {"type": "SGD", "kwargs": {"momentum": 0.9}},
    }
    cfg_path = str(tmp_path / "config.yaml")
    with open(cfg_path, "w") as f:
        yaml.safe_dump(cfg, f)

    script = """
import jax
jax.config.update("jax_platforms", "cpu")
import numpy as np, os
from robustart_tpu.solvers.cls_solver import ClsSolver
from robustart_tpu.core.config import load_config

solver = ClsSolver(load_config({cfg!r}))
solver.train()
p = jax.device_get(solver._train_state.params)
leaves = jax.tree.leaves(p)
digest = float(sum(np.abs(np.asarray(l)).sum() for l in leaves))
print("RANK", os.environ["RANK"], "DIGEST", repr(digest))
""".format(cfg=cfg_path)

    port = _free_port()
    procs = [_spawn(script, rank, 2, port) for rank in range(2)]
    outs = [p.communicate(timeout=900)[0] for p in procs]
    assert all(p.returncode == 0 for p in procs), "\n---\n".join(outs)
    digests = {}
    for o in outs:
        for line in o.splitlines():
            if line.startswith("RANK"):
                _, r, _, d = line.split()
                digests[r] = d
    assert len(digests) == 2, outs
    assert digests["0"] == digests["1"], digests
    assert float(digests["0"]) > 0 and np.isfinite(float(digests["0"]))


def test_two_process_tensor_parallel_training_checkpoints(tmp_path):
    """Multi-process + tensor-parallel training: model-axis-sharded params
    span non-addressable devices, so checkpoint saves must all-gather on
    EVERY rank before rank 0 writes (regression: device_get on a sharded
    global array raises otherwise)."""
    cfg = {
        "model": {"type": "deit_tiny_b16_224",
                  "kwargs": {"num_classes": 10, "input_size": 32}},
        "dist": {"tensor_parallel": 2},
        "data": {
            "type": "imagenet", "read_from": "fake", "fake_size": 16,
            "fake_num_classes": 10, "batch_size": 4, "input_size": 32,
            "num_workers": 0,
        },
        # val_freq 2 → a MID-train save happens (the crash site)
        "saver": {"save_dir": str(tmp_path / "ck"), "val_freq": 2,
                  "print_freq": 10},
        "lr_scheduler": {"type": "CosineEpoch",
                         "kwargs": {"base_lr": 0.01, "warmup_lr": 0.01,
                                    "warmup_epoch": 0, "max_epoch": 1}},
        "optimizer": {"type": "SGD", "kwargs": {"momentum": 0.9}},
    }
    cfg_path = str(tmp_path / "config.yaml")
    with open(cfg_path, "w") as f:
        yaml.safe_dump(cfg, f)

    script = """
import jax
jax.config.update("jax_platforms", "cpu")
import numpy as np, os
from robustart_tpu.solvers.cls_solver import ClsSolver
from robustart_tpu.core.config import load_config

solver = ClsSolver(load_config({cfg!r}))
solver.train()
p = solver.classifier.variables["params"]
digest = float(sum(np.abs(np.asarray(l)).sum() for l in jax.tree.leaves(p)))
print("RANK", os.environ["RANK"], "DIGEST", repr(digest))
""".format(cfg=cfg_path)

    port = _free_port()
    procs = [_spawn(script, rank, 2, port) for rank in range(2)]
    outs = [p.communicate(timeout=900)[0] for p in procs]
    assert all(p.returncode == 0 for p in procs), "\n---\n".join(outs)
    digests = {}
    for o in outs:
        for line in o.splitlines():
            if line.startswith("RANK"):
                _, r, _, d = line.split()
                digests[r] = d
    assert len(digests) == 2 and digests["0"] == digests["1"], digests
    assert osp.exists(osp.join(str(tmp_path / "ck"), "ckpt.msgpack"))
