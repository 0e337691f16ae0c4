#!/bin/bash
# Post-recovery TPU validation battery — run after a TPU-worker wedge/restart
# to re-certify the hardware paths (WORKLOG round 3: the worker wedged with
# executions hanging at fetch; this queue accumulated while it was down).
#
# Order: cheapest liveness first, then the standing regression battery, the
# headline bench, the zoo sweep (refreshes benchmarks/RESULTS.md incl. the
# not-yet-chip-validated int8 families 9-12 and the new CLIP/MobileNetV3
# rows), and finally the opt-in DenseNet whole-block kernel trial (the
# compile that preceded the wedge — keep it LAST so a repeat wedge doesn't
# block the rest).
set -e
cd "$(dirname "$0")/.."

echo "== 1. liveness =="
timeout 120 python -c "
import jax, jax.numpy as jnp
print(jax.devices())
print('sum:', float(jnp.ones((8, 8)).sum()))"

echo "== 2. solver battery (real chip) =="
bash scripts/run_all_benchmarks.sh /tmp/robustart_chip_reval

echo "== 3. headline bench =="
python bench.py

echo "== 4. model-zoo sweep (bf16 + int8 rows, CLIP + MobileNetV3) =="
timeout 5400 python scripts/bench_models.py

echo "== 5. fused-train step rate (zero-rate ViT adv-train gate) =="
timeout 1200 python scripts/bench_train_step.py || true

echo "== 5b. attack-generation throughput (AR cost driver) =="
timeout 1800 python scripts/bench_attacks.py || true

echo "== 6. DenseNet whole-block Pallas kernel trial (wedge suspect, last) =="
timeout 900 python - <<'PY' || echo "dense-block kernel trial FAILED (keep opt-in)"
import jax, jax.numpy as jnp, numpy as np, time
from robustart_tpu.models import create_classifier
from robustart_tpu.models.densenet import fused_eval_forward

clf = create_classifier("densenet121", rng=0, input_size=224,
                        dtype=jnp.bfloat16)
clf_p = create_classifier("densenet121", rng=0, input_size=224,
                          dtype=jnp.bfloat16)
clf_p.module = clf_p.module.clone(block_impl="pallas")
rng = np.random.default_rng(0)
x = jnp.asarray(rng.uniform(0, 1, (64, 224, 224, 3)), jnp.float32)
ref = np.asarray(clf.apply_fn(clf.variables, x, train=False), np.float32)
got = np.asarray(clf_p.apply_fn(clf_p.variables, x, train=False), np.float32)
agree = float((ref.argmax(1) == got.argmax(1)).mean())
print("argmax agreement:", agree, "max|d|:", float(np.abs(ref - got).max()))
assert agree >= 0.99
PY

echo "ALL CHIP VALIDATION PASSED"
