"""Shared solver runtime: model building, checkpoints, result files, eval loop.

This is the TPU-native equivalent of the reference's ``prototype`` solver
runtime (the missing submodule whose API is reconstructed in SURVEY.md §2.9).
Key properties kept from the reference design:

- per-sample JSON-lines result files (``results.txt.all``) as the durable
  interface to the metric layer (SURVEY.md §1);
- rank-sharded result writing merged by rank 0 over the filesystem
  (SURVEY.md §5.8);
- ``saver.pretrain{path, ignore{key, model}}`` warm-start semantics
  (reference resnet50/config.yaml:69-79);
- idempotent-by-filesystem recovery: completed result files are skipped
  (reference batch_eval_adv_transfer_auto_arch.sh:22-34).
"""

from __future__ import annotations

import json
import os
import os.path as osp
import re
import time
from typing import Any, Callable, Iterable

import jax
import jax.numpy as jnp
import numpy as np
from flax import serialization

from robustart_tpu.core.config import Config, load_config
from robustart_tpu.core.dist import (
    DistContext,
    batch_sharding,
    get_mesh,
    init_distributed,
)
from robustart_tpu.core.logging import get_logger
from robustart_tpu.models import create_classifier

logger = get_logger("robustart.solver")


# ---------------------------------------------------------------------------
# checkpoints (flax msgpack; torch-checkpoint conversion lives in
# models/torch_convert.py and is dispatched here by file extension)
# ---------------------------------------------------------------------------


def save_checkpoint(path: str, variables: Any, extra: dict | None = None) -> None:
    os.makedirs(osp.dirname(osp.abspath(path)), exist_ok=True)
    payload = {"variables": variables, "extra": extra or {}}
    # to_state_dict turns optax namedtuples/pytrees into plain dicts so the
    # payload is msgpack-serializable; None leaves are dropped by pruning
    payload = serialization.to_state_dict(payload)

    def prune(tree):
        if isinstance(tree, dict):
            return {k: prune(v) for k, v in tree.items() if v is not None}
        return np.asarray(tree)

    with open(path, "wb") as f:
        f.write(serialization.msgpack_serialize(prune(payload)))


def load_checkpoint(path: str) -> dict:
    with open(path, "rb") as f:
        return serialization.msgpack_restore(f.read())


def _tree_flatten_with_names(tree, prefix=""):
    out = {}
    if isinstance(tree, dict):
        for k, v in tree.items():
            out.update(_tree_flatten_with_names(v, f"{prefix}{k}." if prefix or k else k))
        return out
    out[prefix.rstrip(".")] = tree
    return out


def apply_pretrain(
    variables: Any,
    ckpt_variables: Any,
    ignore_keys: Iterable[str] = (),
    ignore_model: Iterable[str] = (),
) -> Any:
    """Warm-start with ``saver.pretrain.ignore`` semantics: per-tensor skip
    patterns (``ignore.model``, e.g. the fc head on class-count changes) and
    shape-mismatch tolerance (reference resnet50/config.yaml:69-79)."""
    flat_new = _tree_flatten_with_names(variables)
    flat_ckpt = _tree_flatten_with_names(ckpt_variables)
    patterns = [re.compile(p) for p in ignore_model]
    merged = {}
    n_loaded = 0
    for name, value in flat_new.items():
        src = flat_ckpt.get(name)
        skip = any(p.search(name) for p in patterns)
        if src is not None and not skip and np.shape(src) == np.shape(value):
            merged[name] = jnp.asarray(src)
            n_loaded += 1
        else:
            if src is not None and not skip:
                logger.warning("pretrain: shape mismatch for %s, keeping init", name)
            merged[name] = value
    logger.info("pretrain: loaded %d/%d tensors", n_loaded, len(flat_new))

    def rebuild(tree, prefix=""):
        if isinstance(tree, dict):
            return {k: rebuild(v, f"{prefix}{k}.") for k, v in tree.items()}
        return merged[prefix.rstrip(".")]

    return rebuild(variables)


def select_eval_variables(ckpt: dict, use_ema: bool | None = None) -> Any:
    """Pick the eval weights out of a loaded checkpoint dict.

    The reference's ``ema`` technique axis exists to benchmark the
    EMA-averaged weights (reference
    exprs/nips_benchmark/ema/resnet50/config.yaml:30-32, decay 0.9999), so
    evaluating an EMA-trained checkpoint defaults to the EMA copy.

    ``use_ema``: ``None`` = auto (EMA when the checkpoint carries a
    non-empty ``ema_params``), ``True`` = require EMA (error when absent),
    ``False`` = always the raw weights.
    """
    variables = ckpt.get("variables") or {}
    state = (ckpt.get("extra") or {}).get("state") or {}
    ema = state.get("ema_params") or {}
    if use_ema is False:
        return variables
    if not ema:
        if use_ema:
            raise ValueError(
                "model.use_ema: true but the checkpoint has no ema_params"
            )
        return variables
    out = dict(variables)
    out["params"] = ema
    logger.info(
        "eval: using EMA weights from checkpoint (model.use_ema=%s)", use_ema
    )
    return out


TORCH_CKPT_EXTS = (".pth", ".pth.tar", ".pt", ".bin")


def newest_checkpoint(ckpt_dir: str) -> str:
    """Newest checkpoint file in a directory (``--ckpt-filePath <dir>``).

    Prefers the framework's own ``*.msgpack`` saves over torch warm-start
    files sitting in the same dir, then picks by mtime — lexicographic
    order would rank ``ckpt_e9`` after ``ckpt_e10`` and ``.pth`` after
    ``.msgpack``.
    """
    own = [f for f in os.listdir(ckpt_dir) if f.endswith(".msgpack")]
    cands = own or [
        f for f in os.listdir(ckpt_dir) if f.endswith(TORCH_CKPT_EXTS)
    ]
    if not cands:
        raise FileNotFoundError(
            f"no checkpoint (*.msgpack or torch) in {ckpt_dir}"
        )
    return max((osp.join(ckpt_dir, f) for f in cands), key=osp.getmtime)


def load_eval_variables(path: str, classifier, use_ema: bool | None = None,
                        clip_zero_shot: dict | None = None):
    """Load eval weights from OUR msgpack layout or a FOREIGN torch
    checkpoint, mirroring the reference's own resume tolerance — dicts keyed
    ``state_dict``/``model``/``net`` or a raw state dict, with optional
    ``module.`` prefixes (reference cifar10/code/test_cifar_c.py:169-187).

    Torch extensions dispatch to the conversion layer; a msgpack payload
    missing the ``{variables, extra}`` wrapper (i.e. a bare variables dict
    with a ``params`` key) is accepted as raw weights.
    """
    if path.endswith(TORCH_CKPT_EXTS):
        from robustart_tpu.models.torch_convert import load_torch_checkpoint

        logger.info("loading foreign torch checkpoint %s", path)
        return load_torch_checkpoint(path, classifier,
                                     clip_zero_shot=clip_zero_shot)
    ckpt = load_checkpoint(path)
    if "variables" not in ckpt and "params" in ckpt:
        logger.info("raw-variables checkpoint layout detected (%s)", path)
        return ckpt if use_ema is not True else select_eval_variables(
            {"variables": ckpt}, use_ema
        )
    return select_eval_variables(ckpt, use_ema)


def load_pretrain_into(classifier, saver_cfg, use_ema: bool | None = None) -> None:
    """Load ``saver.pretrain.path`` (flax msgpack or torch .pth) in place."""
    pretrain = (saver_cfg or {}).get("pretrain") or {}
    path = pretrain.get("path")
    if not path:
        return
    ignore = pretrain.get("ignore") or {}
    # ``saver.pretrain.clip_zero_shot``: {weights} or {classnames, bpe} —
    # builds the zero-shot head from a raw OpenAI CLIP ckpt (text tower)
    ckpt_vars = load_eval_variables(
        path, classifier, use_ema,
        clip_zero_shot=pretrain.get("clip_zero_shot"),
    )
    classifier.variables = apply_pretrain(
        classifier.variables,
        ckpt_vars,
        ignore_keys=ignore.get("key", []) or [],
        ignore_model=ignore.get("model", []) or [],
    )


# ---------------------------------------------------------------------------
# result files
# ---------------------------------------------------------------------------


class ResultWriter:
    """Rank-sharded JSON-lines result writer with rank-0 merge.

    Writes ``<path>.rank<k>`` shards; ``merge()`` on rank 0 concatenates them
    into the final file (ordering across ranks follows the interleaved
    ``distributed`` sampler so the merge re-interleaves by sample index when
    provided). Produces the exact protocol the evaluators consume
    (reference imagenetc_evaluator.py:35-49).
    """

    def __init__(self, path: str, rank: int = 0, world_size: int = 1):
        self.path = path
        self.rank = rank
        self.world_size = world_size
        os.makedirs(osp.dirname(osp.abspath(path)), exist_ok=True)
        self.shard_path = f"{path}.rank{rank}" if world_size > 1 else path
        self._f = open(self.shard_path, "w")

    def write(self, record: dict) -> None:
        self._f.write(json.dumps(record) + "\n")

    def write_batch(self, records: Iterable[dict]) -> None:
        for r in records:
            self.write(r)

    def close(self) -> None:
        self._f.flush()
        self._f.close()
        if self.world_size > 1:
            # completion sentinel: merge must not read half-written shards
            with open(self.shard_path + ".done", "w") as f:
                f.write("done")

    def merge(self, timeout_s: float = 600.0) -> str:
        """rank 0: merge shards (call after all ranks closed; on one process
        this is a no-op). The filesystem is the barrier (reference-style,
        SURVEY.md §5.8): each rank's ``.done`` sentinel signals completion."""
        if not self._f.closed:
            self.close()
        if self.world_size == 1:
            return self.path
        if self.rank != 0:
            return self.path
        deadline = time.time() + timeout_s
        with open(self.path, "w") as out:
            for r in range(self.world_size):
                shard = f"{self.path}.rank{r}"
                while not osp.exists(shard + ".done"):
                    if time.time() > deadline:
                        raise TimeoutError(
                            f"rank {r} shard never completed: {shard}"
                        )
                    time.sleep(0.2)
                with open(shard) as f:
                    out.write(f.read())
        return self.path


# ---------------------------------------------------------------------------
# solver base
# ---------------------------------------------------------------------------


class Solver:
    """Config-driven solver base: dist init, mesh, model, data, eval loop."""

    def __init__(self, config: Config | str, evaluate_only: bool = False):
        self.cfg = load_config(config) if isinstance(config, str) else config
        self.dist: DistContext = init_distributed()
        # per-process (addressable-device) mesh: solver data-parallelism is
        # rank-sharded at the data/file layer (distributed_indices +
        # ResultWriter merge), so each process shards its local batch over
        # its own devices — no cross-process arrays needed, and
        # ``jax.device_put`` stays valid under multi-process jax.distributed.
        # ``dist.tensor_parallel: N`` adds a model axis: 2-D dense kernels
        # shard over it (parallel/sharding.py tp rules — beyond the
        # reference's DP-only stack, for large ViT/Mixer configs).
        local = jax.local_devices()
        self.tensor_parallel = int(
            self.cfg.get_path("dist.tensor_parallel") or 1
        )
        if self.tensor_parallel > 1:
            if len(local) % self.tensor_parallel:
                raise ValueError(
                    f"tensor_parallel={self.tensor_parallel} does not divide "
                    f"{len(local)} local devices"
                )
            self.mesh = get_mesh(
                ("data", "model"),
                mesh_shape=(
                    len(local) // self.tensor_parallel, self.tensor_parallel
                ),
                devices=local,
            )
        else:
            self.mesh = get_mesh(("data",), devices=local)
        # ``dist.pipeline_parallel: S`` (ViT family, eval surface): GPipe
        # microbatch pipeline over a ``pipe`` axis (parallel/pipeline.py) —
        # for depth-dominated models whose replicated weights outgrow one
        # chip. Beyond the reference (DP-only, SURVEY.md §2.11).
        self.pipeline_parallel = int(
            self.cfg.get_path("dist.pipeline_parallel") or 1
        )
        if self.pipeline_parallel > 1:
            if self.tensor_parallel > 1:
                raise ValueError(
                    "dist.pipeline_parallel and dist.tensor_parallel are "
                    "mutually exclusive"
                )
            if len(local) % self.pipeline_parallel:
                raise ValueError(
                    f"pipeline_parallel={self.pipeline_parallel} does not "
                    f"divide {len(local)} local devices"
                )
            self.mesh = get_mesh(
                ("data", "pipe"),
                mesh_shape=(
                    len(local) // self.pipeline_parallel,
                    self.pipeline_parallel,
                ),
                devices=local,
            )
        self.evaluate_only = evaluate_only
        if self.pipeline_parallel > 1 and not evaluate_only:
            # Only the eval path consumes the ``pipe`` axis; a training run
            # would shard batches over ``data`` alone and silently replicate
            # identical DP work across the pipe fold. Surface it loudly,
            # mirroring the int8/train incompatibility.
            raise ValueError(
                "dist.pipeline_parallel applies to the eval surface only "
                f"(pipeline_parallel={self.pipeline_parallel} with a "
                "training solver would waste the pipe-axis devices on "
                "replicated DP work); use parallel.pipeline.pp_train_step "
                "directly for pipelined training, or drop the knob"
            )
        self.rank = self.dist.rank
        self.world_size = self.dist.world_size
        self.classifier = None
        self._eval_fn = None
        self._eval_pure = None

    # -- model --
    def build_model(self, seed: int = 0):
        mcfg = self.cfg.model
        kwargs = dict(mcfg.get("kwargs") or {})
        # model.dtype: bf16 halves eval HBM traffic and doubles MXU rate
        # (f32 default keeps reference-exact logits; opt in per config)
        dtype = mcfg.get("dtype")
        if dtype:
            kwargs["dtype"] = {
                "bf16": jnp.bfloat16, "bfloat16": jnp.bfloat16,
                "f32": jnp.float32, "float32": jnp.float32,
            }[str(dtype)]
        self.classifier = create_classifier(mcfg.type, rng=seed, **kwargs)
        load_pretrain_into(
            self.classifier, self.cfg.get("saver"),
            use_ema=mcfg.get("use_ema"),
        )
        if self.tensor_parallel > 1:
            from robustart_tpu.parallel.sharding import shard_params

            module = self.classifier.module
            # the fused Pallas kernels consume whole weight arrays, so a
            # model-sharded kernel would be all-gathered at every call —
            # under TP the einsum path is the one the Megatron col/row
            # sharding actually accelerates (config kwargs can override).
            # attention_impl: ViT/Swin/CLIP; mlp_impl: ConvNeXt/Mixer.
            user_kw = mcfg.get("kwargs") or {}
            force_xla = {
                knob: "xla"
                for knob in ("attention_impl", "mlp_impl")
                if hasattr(module, knob) and knob not in user_kw
            }
            if force_xla:
                self.classifier.module = module.clone(**force_xla)
            self.classifier.variables = shard_params(
                self.classifier.variables, self.mesh
            )
        if self.pipeline_parallel > 1:
            from robustart_tpu.models.vit import VisionTransformer

            if not isinstance(self.classifier.module, VisionTransformer):
                raise ValueError(
                    "dist.pipeline_parallel currently supports the ViT "
                    f"family only, got {type(self.classifier.module).__name__}"
                )
            if self.classifier.module.depth % self.pipeline_parallel:
                raise ValueError(
                    f"depth {self.classifier.module.depth} not divisible by "
                    f"pipeline_parallel={self.pipeline_parallel}"
                )
        return self.classifier

    # -- jitted eval step --
    def eval_fn(self) -> Callable:
        """Jitted (variables, u8 images, …) → logits with data-sharded batch.

        uint8 NHWC enters the device; /255 normalization and the model's own
        mean/std fuse into the first conv under XLA.
        """
        if self._eval_fn is not None:
            return self._eval_fn
        # every eval surface funnels through here (and through
        # maybe_quantize, which also calls it) — RepVGG gets the
        # re-parameterized deploy form before the fn is built
        self.maybe_deploy()
        if self.pipeline_parallel > 1:
            self._eval_fn = self._build_pipeline_eval_fn()
            return self._eval_fn
        clf = self.classifier
        mesh = self.mesh

        @jax.jit
        def fn(variables, images_u8):
            x = images_u8.astype(jnp.float32) / 255.0
            return clf.apply_fn(variables, x, train=False)

        n_data = int(mesh.shape["data"])

        def wrapped(variables, images_u8):
            if images_u8.shape[0] % n_data == 0:
                images_u8 = jax.device_put(
                    images_u8, batch_sharding(mesh, images_u8.ndim)
                )
            return fn(variables, images_u8)

        self._eval_fn = wrapped
        return wrapped

    def eval_pure(self):
        """``(pure_fn, params)`` — the UN-jitted eval forward, for fusing
        into larger single-dispatch programs (ImageNet-P online videos fuse
        frame synthesis + forward + argmax into one ``fori_loop`` program;
        two dispatches per frame otherwise). ``pure_fn(params, u8_images)``
        returns logits; ``params`` is the variables tree, or the quantized
        param struct after ``maybe_quantize`` swapped the int8 path in.
        Returns None when the eval forward is not one pure fn (pipeline
        parallel stages dispatch per microbatch).
        """
        self.maybe_deploy()
        if self.pipeline_parallel > 1:
            return None
        if self._eval_pure is not None:
            return self._eval_pure
        clf = self.classifier

        def fn(variables, images_u8):
            x = images_u8.astype(jnp.float32) / 255.0
            return clf.apply_fn(variables, x, train=False)

        self._eval_pure = (fn, self.classifier.variables)
        return self._eval_pure

    def _build_pipeline_eval_fn(self) -> Callable:
        """Eval forward with the ViT trunk GPipe'd over the ``pipe`` axis.

        ``dist.pipeline_microbatches`` (default 4·S) sets M; batches are
        zero-padded up to a multiple of M·n_data (GPipe needs B % M == 0
        and microbatch rows to shard evenly over ``data``) and the pad
        logits sliced off. The split/sharded param copy is cached per
        ``variables`` identity so eval_list checkpoint swaps re-split.
        """
        from jax.sharding import PartitionSpec as P

        from robustart_tpu.parallel.pipeline import (
            shard_pipeline_params,
            vit_pipeline_logits_fn,
            vit_split_params,
        )

        clf = self.classifier
        pp = self.pipeline_parallel
        mesh = self.mesh
        m = int(self.cfg.get_path("dist.pipeline_microbatches") or 4 * pp)
        n_data = int(mesh.shape["data"])
        quantum = m * n_data
        logits_fn = vit_pipeline_logits_fn(
            clf, mesh=mesh, n_microbatches=m, x_spec=P(None, "data")
        )

        @jax.jit
        def fn(split, images_u8):
            x = images_u8.astype(jnp.float32) / 255.0
            return logits_fn(split, x)

        # Cache holds (variables_obj, split): a strong reference to the key
        # object plus an explicit identity check, so a freed dict whose id()
        # is reused by a later checkpoint can never serve stale params.
        cache: list[tuple[Any, Any]] = []

        def wrapped(variables, images_u8):
            if not cache or cache[0][0] is not variables:
                cache.clear()
                cache.append((
                    variables,
                    shard_pipeline_params(
                        vit_split_params(variables, clf.module.depth, pp),
                        mesh,
                    ),
                ))
            split = cache[0][1]
            b = images_u8.shape[0]
            pad = (-b) % quantum
            if pad:
                images_u8 = jnp.concatenate(
                    [
                        jnp.asarray(images_u8),
                        jnp.zeros((pad, *images_u8.shape[1:]),
                                  jnp.asarray(images_u8).dtype),
                    ]
                )
            out = fn(split, images_u8)
            return out[:b] if pad else out

        return wrapped

    def maybe_quantize(self, loader) -> bool:
        """Swap the eval forward for the int8 PTQ path when the config asks
        (``model.quantize: int8``; ``model.quantize_calib_batches``: N, def 2).

        Calibrates activation scales on the first batches of ``loader`` (the
        eval distribution — corrupted images when evaluating corruptions).
        Supported families (models/quantize*.py): ResNet (incl. WideResNet/
        ResNeXt), ViT/DeiT, MobileNetV2, MobileNetV3 (large/small),
        EfficientNet, DenseNet, RegNetX/Y, RepVGG (deploy form),
        ShuffleNetV2, MLP-Mixer, ConvNeXt (V1+V2), and Swin; others log a
        warning and keep the float path. Eval-only: the int8 graph has no useful gradients, so
        attack solvers must not enable it. Under multi-process eval every
        rank calibrates on its own data shard, then rank 0's scales are
        broadcast so all ranks run ONE int8 model (merged results must not
        mix per-rank calibrations). Returns True when the swap happened.
        """
        self.maybe_deploy()
        mode = self.cfg.get_path("model.quantize")
        if mode in (None, False, "none"):
            return False
        if mode != "int8":
            raise ValueError(f"unknown model.quantize mode {mode!r}")
        if self.pipeline_parallel > 1:
            raise ValueError(
                "model.quantize: int8 is incompatible with "
                "dist.pipeline_parallel (the PTQ graph is not staged)"
            )
        n_batches = int(
            self.cfg.get_path("model.quantize_calib_batches") or 2
        )
        calib = []
        for i, batch in enumerate(loader):
            calib.append(np.asarray(batch.image)[np.asarray(batch.mask)])
            if i + 1 >= n_batches:
                break
        calib = np.concatenate(calib)
        q = self.build_quantized(calib)
        if q is None:
            return False
        qparams = q.qparams
        if self.world_size > 1:
            from jax.experimental import multihost_utils

            qparams = multihost_utils.broadcast_one_to_all(qparams)
        qparams = jax.device_put(qparams)
        jfn = jax.jit(q.apply_fn)
        mesh = self.mesh
        n_data = int(mesh.shape["data"])

        def wrapped(variables, images_u8):
            del variables  # int8 path carries its own quantized params
            if images_u8.shape[0] % n_data == 0:
                images_u8 = jax.device_put(
                    images_u8, batch_sharding(mesh, images_u8.ndim)
                )
            return jfn(qparams, images_u8)

        self._eval_fn = wrapped
        self._eval_pure = (q.apply_fn, qparams)
        logger.info("int8 eval path enabled (%s, calib %d images)",
                    q.name, len(calib))
        return True

    def maybe_deploy(self) -> bool:
        """RepVGG evals run the re-parameterized deploy form by default.

        Structural re-parameterization (upstream RepVGG's deployment
        conversion; models/repvgg.py::reparameterize_params) folds the
        3x3+1x1+identity branches into one MXU-friendly conv per block —
        mathematically identical logits, ~2x fewer conv launches. Input
        gradients (attacks) are exact through the fused form. Opt out with
        ``model.deploy: false``. Runs after checkpoint load (called from
        maybe_quantize, which every eval path goes through); eval_list
        builds a fresh solver per entry so the swap never sees a stale
        train-form checkpoint."""
        from robustart_tpu.models.repvgg import RepVGG, deploy_classifier

        module = getattr(self.classifier, "module", None)
        if not isinstance(module, RepVGG) or module.deploy:
            return False
        if self.cfg.get_path("model.deploy") is False:
            return False
        if self.tensor_parallel > 1:
            return False  # tp sharding rules target the train-form tree
        self.classifier = deploy_classifier(self.classifier)
        self._eval_fn = None  # rebuild on the fused module
        self._eval_pure = None
        logger.info(
            "RepVGG: eval uses the re-parameterized deploy form "
            "(model.deploy: false keeps the train form)"
        )
        return True

    def build_quantized(self, calib_images_u8):
        """int8-PTQ the classifier on ``calib_images_u8`` (uint8 NHWC from
        the eval distribution). Returns the quantized classifier, or None
        for unsupported families (with a warning)."""
        from robustart_tpu.models.densenet import DenseNet
        from robustart_tpu.models.efficientnet import EfficientNet
        from robustart_tpu.models.mobilenet import MobileNetV2
        from robustart_tpu.models.regnet import RegNetX
        from robustart_tpu.models.resnet import ResNet
        from robustart_tpu.models.vit import VisionTransformer

        module = self.classifier.module
        bs = min(64, len(calib_images_u8))
        if isinstance(module, ResNet):
            from robustart_tpu.models.quantize import quantize_classifier

            return quantize_classifier(
                self.classifier, calib_images_u8, calib_batch_size=bs
            )
        if isinstance(module, VisionTransformer):
            from robustart_tpu.models.quantize_vit import quantize_vit

            self._refuse_int8_fused_family("VisionTransformer")
            return quantize_vit(
                self.classifier, calib_images_u8, calib_batch_size=bs
            )
        if isinstance(module, MobileNetV2):
            from robustart_tpu.models.quantize_mobilenet import (
                quantize_mobilenet_v2,
            )

            self._warn_int8_pessimization("MobileNetV2")
            return quantize_mobilenet_v2(
                self.classifier, calib_images_u8, calib_batch_size=bs
            )
        from robustart_tpu.models.mobilenet import MobileNetV3

        if isinstance(module, MobileNetV3):
            from robustart_tpu.models.quantize_mobilenet_v3 import (
                quantize_mobilenet_v3,
            )

            self._warn_int8_pessimization("MobileNetV3")
            return quantize_mobilenet_v3(
                self.classifier, calib_images_u8, calib_batch_size=bs
            )
        if isinstance(module, EfficientNet):
            from robustart_tpu.models.quantize_efficientnet import (
                quantize_efficientnet,
            )

            self._warn_int8_pessimization("EfficientNet")
            return quantize_efficientnet(
                self.classifier, calib_images_u8, calib_batch_size=bs
            )
        if isinstance(module, DenseNet):
            from robustart_tpu.models.quantize_densenet import (
                quantize_densenet,
            )

            self._warn_int8_pessimization("DenseNet")
            return quantize_densenet(
                self.classifier, calib_images_u8, calib_batch_size=bs
            )
        if isinstance(module, RegNetX):
            from robustart_tpu.models.quantize_regnet import quantize_regnet

            self._warn_int8_pessimization("RegNetX")
            return quantize_regnet(
                self.classifier, calib_images_u8, calib_batch_size=bs
            )
        from robustart_tpu.models.repvgg import RepVGG

        if isinstance(module, RepVGG):
            from robustart_tpu.models.quantize_repvgg import quantize_repvgg

            return quantize_repvgg(
                self.classifier, calib_images_u8, calib_batch_size=bs
            )
        from robustart_tpu.models.shufflenet import ShuffleNetV2

        if isinstance(module, ShuffleNetV2):
            from robustart_tpu.models.quantize_shufflenet import (
                quantize_shufflenet,
            )

            self._warn_int8_pessimization("ShuffleNetV2")
            return quantize_shufflenet(
                self.classifier, calib_images_u8, calib_batch_size=bs
            )
        from robustart_tpu.models.mlp_mixer import MlpMixer

        if isinstance(module, MlpMixer):
            from robustart_tpu.models.quantize_mixer import quantize_mixer

            self._refuse_int8_fused_family("MlpMixer")
            return quantize_mixer(
                self.classifier, calib_images_u8, calib_batch_size=bs
            )
        from robustart_tpu.models.convnext import ConvNeXt

        if isinstance(module, ConvNeXt):
            from robustart_tpu.models.quantize_convnext import (
                quantize_convnext,
            )

            return quantize_convnext(
                self.classifier, calib_images_u8, calib_batch_size=bs
            )
        from robustart_tpu.models.swin import SwinTransformer

        if isinstance(module, SwinTransformer):
            from robustart_tpu.models.quantize_swin import quantize_swin

            self._refuse_int8_fused_family("SwinTransformer")
            return quantize_swin(
                self.classifier, calib_images_u8, calib_batch_size=bs
            )
        logger.warning(
            "model.quantize: int8 unsupported for %s — keeping float eval",
            type(module).__name__,
        )
        return None

    # measured on the real chip at 224², benchmarks/RESULTS.md: families
    # whose int8 path trades throughput for the 4x weight footprint. value =
    # (crossover batch or None if slower at every measured batch, summary)
    _INT8_MEASURED_PESSIMIZATIONS = {
        "MobileNetV2": (512, "VPU-bound depthwise convs; int8 epilogues "
                             "need >=512 batch to amortize"),
        "EfficientNet": (None, "~15% slower than bf16 at batch 256 (SE/SiLU "
                               "f32 epilogues dominate)"),
        "DenseNet": (None, "~40% slower than bf16 at batch 256 (f32 BN/relu "
                           "prologues + requant at small channel counts)"),
        "RegNetX": (None, "~5% slower than bf16 at batch 256"),
        "ShuffleNetV2": (None, "depthwise-heavy like MobileNetV2; expect "
                               "the f32 requant passes to dominate at "
                               "small batches (not yet chip-measured)"),
        "MobileNetV3": (512, "depthwise-heavy like MobileNetV2 plus f32 "
                             "SE/hardswish epilogues; expect a similar "
                             ">=512 crossover (not yet chip-measured)"),
    }

    # fused-bf16-kernel families where int8 CANNOT win on this chip: the
    # whole-block Pallas kernels already hold the residual stream in VMEM,
    # and the chip's int8 MXU advantage on ViT-shaped dot_generals is only
    # ~1.2x bf16 (vs 1.76x for convs) — less than the requant epilogues an
    # int8 block must add between matmuls. Measured: int8 vit_b16 1,950 vs
    # fused bf16 3,371 img/s; swin 1,081 vs 1,639; mixer 3,699 vs 4,446
    # (benchmarks/RESULTS.md; scripts/probe_int8_matmul.py for the
    # dot_general rates). maybe_quantize therefore REFUSES these families
    # unless model.quantize_force: true (the 4x-smaller weights can still
    # be worth it for memory-bound serving).
    _INT8_FUSED_REFUSALS = ("VisionTransformer", "SwinTransformer",
                            "MlpMixer")

    def _refuse_int8_fused_family(self, family: str) -> None:
        if bool(self.cfg.get_path("model.quantize_force")):
            logger.warning(
                "int8 %s forced (model.quantize_force): measured SLOWER "
                "than the fused bf16 path on this chip "
                "(benchmarks/RESULTS.md)", family,
            )
            return
        raise ValueError(
            f"model.quantize: int8 refused for {family}: the fused bf16 "
            "block-kernel path is measured FASTER on this chip (vit_b16 "
            "3,371 bf16 vs 1,950 int8 img/s; swin 1,639 vs 1,081; mixer "
            "4,446 vs 3,699 — benchmarks/RESULTS.md), and the int8 MXU "
            "rate on transformer-shaped dot_generals (~1.2x bf16) cannot "
            "repay the requant epilogues a fused int8 block would add. "
            "Set model.quantize_force: true to accept the slowdown for "
            "the 4x smaller weights."
        )

    def _warn_int8_pessimization(self, family: str) -> None:
        crossover, why = self._INT8_MEASURED_PESSIMIZATIONS[family]
        batch = int(self.cfg.get_path("data.batch_size") or 0)
        if crossover is not None and batch >= crossover:
            return
        logger.warning(
            "int8 %s at batch %d measured SLOWER than bf16 on this chip "
            "(%s; benchmarks/RESULTS.md) — int8 still wins 4x on weight "
            "footprint; drop model.quantize for throughput",
            family, batch, why,
        )

    def run_eval_loop(
        self,
        loader,
        writer: ResultWriter,
        record_fn: Callable[[np.ndarray, np.ndarray, np.ndarray], Iterable[dict]] | None = None,
        limit_samples: int | None = None,
    ) -> int:
        """Forward-only loop: batches → logits → JSON-lines records.

        Default record: {"score": [...logits...], "label": l} per valid
        sample — the evaluator-facing protocol (SURVEY.md §3.4).
        """
        eval_fn = self.eval_fn()
        variables = self.classifier.variables
        n_written = 0
        t0 = time.time()
        n_images = 0
        for batch in loader:
            logits = np.asarray(eval_fn(variables, batch.image))
            mask = batch.mask
            n_images += int(mask.sum())
            if record_fn is None:
                records = (
                    {"score": logits[i].tolist(), "label": int(batch.label[i])}
                    for i in range(len(mask))
                    if mask[i]
                )
            else:
                records = record_fn(logits, batch.label, mask)
            for rec in records:
                writer.write(rec)
                n_written += 1
                if limit_samples and n_written >= limit_samples:
                    break
            if limit_samples and n_written >= limit_samples:
                break
        dt = time.time() - t0
        logger.info(
            "eval loop: %d samples in %.2fs (%.1f img/s)",
            n_written, dt, n_images / max(dt, 1e-9),
        )
        return n_written


def standard_solver_argparser(description: str):
    """The reference solver CLI surface (README.md:91; eval.sh usage):
    --config --evaluate --recover --ckpt-filePath."""
    import argparse

    parser = argparse.ArgumentParser(description=description)
    parser.add_argument("--config", required=True, help="yaml config path")
    parser.add_argument("--evaluate", action="store_true", help="eval only")
    parser.add_argument("--recover", default=None, help="checkpoint to resume")
    parser.add_argument(
        "--ckpt-filePath", dest="ckpt_filePath", default=None,
        help="checkpoint file/dir for evaluation",
    )
    return parser
