"""``imgnet_a_o_eval_solver`` — ImageNet-A accuracy + ImageNet-O OOD dump.

Reference equivalent: ``prototype.prototype.solver.imgnet_a_o_eval_solver``
(usage: reference train/__init__.py:1, exprs/exp/imagenet-a_o-loop/eval.sh:24,
config flag ``imagenet_a&o: True`` at config_vit_base.yaml:80; SURVEY.md
§2.9). Behavior:

- **ImageNet-A** (naturally adversarial, 200-class subset of the 1k space):
  forward the A set, restrict logits to the subset (``data.test.class_subset``
  — list of class indices or a path to one-index-per-line file), write
  {'score', 'label'} lines for the ImageNetAEvaluator.
- **ImageNet-O** (OOD): forward the in-distribution val set and the O set,
  dump max-softmax confidence records {'confidence', 'correct',
  'num_correct'} per batch for the ImageNetOEvaluator AUPR.
"""

from __future__ import annotations

import os.path as osp

import jax
import jax.numpy as jnp
import numpy as np

from robustart_tpu.core.logging import get_logger
from robustart_tpu.data import build_dataloader
from robustart_tpu.metrics import ImageNetAEvaluator, ImageNetOEvaluator
from robustart_tpu.solvers.base import ResultWriter, Solver, standard_solver_argparser

logger = get_logger("robustart.a_o_eval")


def _load_subset(spec) -> np.ndarray | None:
    if spec is None:
        return None
    if isinstance(spec, str):
        with open(spec) as f:
            return np.array([int(x) for x in f.read().split()], np.int32)
    return np.asarray(list(spec), np.int32)


class ImgnetAOEvalSolver(Solver):
    def evaluate(self, ckpt_path: str | None = None) -> dict:
        cfg = self.cfg
        if self.classifier is None:
            self.build_model(seed=int(cfg.get("seed", 0)))
        out_root = cfg.get_path("saver.results_dir", "results/imagenet-a_o")
        test_cfg = cfg.data.get("test", {})
        limit = test_cfg.get("limit_samples")
        results = {}

        subset = _load_subset(test_cfg.get("class_subset"))

        # ---- ImageNet-A: accuracy over the (possibly restricted) label space
        res_a = osp.join(out_root, "imagenet-a", "results.txt.all")
        loader = build_dataloader(
            cfg.data, "test", self.rank, self.world_size,
            seed=int(cfg.get("seed", 0)),
        )
        writer = ResultWriter(res_a, self.rank, self.world_size)

        def record_a(logits, labels, mask):
            scores = logits[:, subset] if subset is not None else logits
            for i in range(len(mask)):
                if mask[i]:
                    yield {"score": scores[i].tolist(), "label": int(labels[i])}

        self.run_eval_loop(loader, writer, record_fn=record_a, limit_samples=limit)
        writer.close()
        merged_a = writer.merge()
        if self.rank == 0:
            ev_a = ImageNetAEvaluator()
            results["imagenet-a"] = ev_a.eval(merged_a)
            logger.info("ImageNet-A: %s", results["imagenet-a"])

        # ---- ImageNet-O: confidence dumps for in-dist and out-dist sets
        o_cfg = test_cfg.get("imagenet_o") or {}
        if o_cfg or test_cfg.get("imagenet_a&o") or cfg.get_path("data.test_out"):
            res_in = osp.join(out_root, "imagenet-o", "results_in.txt.all")
            res_out = osp.join(out_root, "imagenet-o", "results_out.txt.all")
            self._confidence_dump(cfg.data, "test", res_in, limit)
            out_split = "test_out" if "test_out" in cfg.data else "test"
            self._confidence_dump(cfg.data, out_split, res_out, limit)
            if self.rank == 0:
                ev_o = ImageNetOEvaluator()
                results["imagenet-o"] = ev_o.eval(
                    res_file_in=res_in, res_file_out=res_out
                )
                logger.info("ImageNet-O: %s", results["imagenet-o"])
        return results

    def _confidence_dump(self, data_cfg, split, res_file, limit):
        loader = build_dataloader(
            data_cfg, split, self.rank, self.world_size,
            seed=int(self.cfg.get("seed", 0)),
        )
        eval_fn = self.eval_fn()
        variables = self.classifier.variables
        # the confidence protocol only needs (max softmax prob, argmax) per
        # sample — reduce on device and fetch 2·B scalars, not B×1000 logits
        pure = self.eval_pure()
        if pure is None:
            def stats_fn(variables, images_u8):
                probs = np.asarray(
                    jax.nn.softmax(eval_fn(variables, images_u8), axis=-1)
                )
                return probs.max(axis=-1), probs.argmax(axis=-1)
        else:
            import jax.numpy as jnp

            pure_fn, eval_params = pure
            jfn = jax.jit(lambda p, u8: (
                jnp.max(jax.nn.softmax(pure_fn(p, u8), -1), -1),
                jnp.argmax(pure_fn(p, u8), -1),
            ))

            state = {"fused": True}

            def stats_fn(variables, images_u8):
                if state["fused"]:
                    try:
                        conf, pred = jfn(eval_params, jnp.asarray(images_u8))
                        return np.asarray(conf), np.asarray(pred)
                    except jax.errors.JaxRuntimeError as e:
                        # fusion-emitter abort kills only the compile helper;
                        # fall back to host-side reductions over logits
                        logger.warning(
                            "fused confidence program failed to compile "
                            "(%s); falling back to host reductions",
                            str(e).splitlines()[0][:160],
                        )
                        state["fused"] = False
                probs = np.asarray(
                    jax.nn.softmax(eval_fn(variables, images_u8), axis=-1)
                )
                return probs.max(axis=-1), probs.argmax(axis=-1)

        writer = ResultWriter(res_file, self.rank, self.world_size)
        n = 0
        for batch in loader:
            conf, pred = stats_fn(variables, batch.image)
            mask = batch.mask
            correct = (pred == batch.label) & mask
            record = {
                "confidence": conf[mask].tolist(),
                "correct": correct[mask].astype(int).tolist(),
                "num_correct": int(correct.sum()),
            }
            writer.write(record)
            n += int(mask.sum())
            if limit and n >= limit:
                break
        writer.close()
        writer.merge()


def main(argv=None):
    parser = standard_solver_argparser("robustart imgnet_a_o_eval_solver")
    args = parser.parse_args(argv)
    return ImgnetAOEvalSolver(args.config, True).evaluate(args.ckpt_filePath)


if __name__ == "__main__":
    main()
