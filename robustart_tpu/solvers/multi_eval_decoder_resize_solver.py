"""``multi_eval_decoder_resize_solver`` — ImageNet-S system-noise loop.

Reference equivalent: the solver driven by
exprs/exp/imagenet_s_loop/eval.sh:24 with ``limit_samples`` and
``save_acc_var_neg`` flags (config_vit_base.yaml:80,87; SURVEY.md §2.9).
Loops decoder {pil, opencv[, ffmpeg]} × resize {6 PIL + 5 OpenCV modes},
re-decoding the raw val images host-side with each combo (decode parity IS
the benchmark — imagenet_s_gen.py:177-220), forwards on device, writes one
results file per combo, and aggregates mean/std top-1 via ImageNetSEvaluator.

``read_from: fake`` mode synthesizes a tiny JPEG set on the fly so the full
combo loop is testable without ImageNet.
"""

from __future__ import annotations

import json
import os
import os.path as osp
import shutil

import numpy as np
from PIL import Image

from robustart_tpu.core.logging import get_logger
from robustart_tpu.data import DataLoader, MetaFileDataset, distributed_indices
from robustart_tpu.metrics import ImageNetSEvaluator
from robustart_tpu.noise.imagenet_s import (
    RESIZE_TYPES,
    decode_image,
    ImageTransfer,
    pil_resize_mode_dict,
    cv_resize_mode_dict,
)
from robustart_tpu.solvers.base import ResultWriter, Solver, standard_solver_argparser

logger = get_logger("robustart.s_eval")

# all three reference decoder axes (reference imagenet_s_gen.py:177-220);
# the 'ffmpeg' axis falls back to the fast-IDCT substitute decoder when the
# binary is absent (see noise/imagenet_s.py::ffmpeg_decoder_impl)
DEFAULT_DECODERS = ("pil", "opencv", "ffmpeg")
DEFAULT_RESIZES = RESIZE_TYPES


class _CombinationDataset:
    """Wraps raw (path, label) metas; decodes+resizes with one combo."""

    def __init__(self, root_dir, meta_file, decoder, resize_type, size=224):
        self.metas = []
        with open(meta_file) as f:
            for line in f:
                line = line.rstrip()
                if line:
                    name, label = line.split()
                    self.metas.append((name, int(label)))
        self.root_dir = root_dir
        self.decoder = decoder
        self.resize_type = resize_type
        self.size = size
        self.labels = np.array([l for _, l in self.metas])

    def __len__(self):
        return len(self.metas)

    def __getitem__(self, idx):
        name, label = self.metas[idx]
        t = ImageTransfer(
            file_path=osp.join(self.root_dir, name),
            decoder_type=self.decoder,
            resize_type=self.resize_type,
            resize=self.size,
            transform_type="val",
            return_online=True,
        )
        return {
            "image": t.getimage(),
            "label": label,
            "filename": name,
            "index": idx,
        }


class MultiEvalDecoderResizeSolver(Solver):
    def evaluate(self, ckpt_path: str | None = None) -> dict:
        cfg = self.cfg
        if self.classifier is None:
            self.build_model(seed=int(cfg.get("seed", 0)))
        test_cfg = cfg.data.get("test", {})
        out_root = cfg.get_path("saver.results_dir", "results/imagenet-s")
        limit = test_cfg.get("limit_samples")
        decoders = list(test_cfg.get("decoders", DEFAULT_DECODERS))
        resizes = list(test_cfg.get("resize_types", DEFAULT_RESIZES))
        input_size = int(cfg.data.get("input_size", 224))

        root_dir, meta_file = self._resolve_data(test_cfg, input_size)

        evaluator = ImageNetSEvaluator()
        for decoder in decoders:
            for resize_type in resizes:
                # a combo is only valid within its library family? No — the
                # reference crosses all decoders with all resize modes.
                res_file = osp.join(
                    out_root, decoder, resize_type, "results.txt.all"
                )
                if not osp.exists(res_file):
                    ds = _CombinationDataset(
                        root_dir, meta_file, decoder, resize_type, input_size
                    )
                    idx = distributed_indices(len(ds), self.rank, self.world_size)
                    if limit:
                        idx = idx[:limit]
                    loader = DataLoader(
                        ds, idx, int(cfg.data.get("batch_size", 32)),
                        transform=None,
                        num_workers=int(cfg.data.get("num_workers", 4)),
                    )
                    writer = ResultWriter(res_file, self.rank, self.world_size)
                    self.run_eval_loop(loader, writer)
                    writer.close()
                    writer.merge()
                if self.rank == 0:
                    out = evaluator.eval(
                        res_file, decoder_type=decoder, resize_type=resize_type
                    )
                    logger.info("ImageNet-S %s/%s: %s", decoder, resize_type, out)
        if self.rank != 0:
            return {}
        from robustart_tpu.noise.imagenet_s import ffmpeg_decoder_impl

        summary = {
            "per_combo": {
                f"{d}/{r}": v for (d, r), v in evaluator.metric.metric.items()
            },
            **evaluator.get_mean(),
            **evaluator.get_std(),
        }
        if "ffmpeg" in decoders:
            # annotate which implementation served the ffmpeg axis so
            # mean/std stability metrics are comparable-or-flagged
            summary["ffmpeg_decoder_impl"] = ffmpeg_decoder_impl()
        if test_cfg.get("save_acc_var_neg"):
            # reference flag: store accuracy-variance (negated, higher=stabler)
            summary["acc_var_neg"] = -float(
                np.var(list(evaluator.metric.metric.values()))
            )
        os.makedirs(out_root, exist_ok=True)
        with open(osp.join(out_root, "summary.json"), "w") as f:
            json.dump(summary, f, indent=2)
        logger.info("ImageNet-S summary: %s", summary)
        return summary

    def _resolve_data(self, test_cfg, input_size):
        if self.cfg.data.get("read_from") == "fake":
            # synthesize a small JPEG val set once
            tmp_root = test_cfg.get("fake_root", "/tmp/robustart_s_fake")
            meta = osp.join(tmp_root, "meta.txt")
            n = int(self.cfg.data.get("fake_size", 8))
            if not osp.exists(meta):
                os.makedirs(tmp_root, exist_ok=True)
                rng = np.random.default_rng(0)
                with open(meta, "w") as f:
                    for i in range(n):
                        arr = rng.integers(
                            0, 255, size=(280, 320, 3), dtype=np.uint8
                        )
                        name = f"img_{i}.jpg"
                        Image.fromarray(arr).save(
                            osp.join(tmp_root, name), "JPEG", quality=92
                        )
                        f.write(f"{name} {i % 10}\n")
            return tmp_root, meta
        return test_cfg["root_dir"], test_cfg["meta_file"]


def main(argv=None):
    parser = standard_solver_argparser(
        "robustart multi_eval_decoder_resize_solver (ImageNet-S)"
    )
    args = parser.parse_args(argv)
    return MultiEvalDecoderResizeSolver(args.config, True).evaluate(
        args.ckpt_filePath
    )


if __name__ == "__main__":
    main()
