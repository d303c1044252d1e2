"""Training-step throughput benchmark for the reference's recipes.

Measures the jitted train-step wall time (readback-timed: remote-attached
TPU runtimes can report block_until_ready early) for each recipe at its
reference batch size (BASELINE.md Training recipes row) plus validation
steps, and writes BENCH_TRAIN.json at the repo root.  The reference's
training loops are eager TF on one GPU (train_spade_256.py:70-114); these
are single compiled XLA programs with donated state buffers.

    python scripts/train_benchmark.py [--recipes spade_256,cnn_256,...]
        [--steps 8] [--out BENCH_TRAIN.json]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

DEFAULT_RECIPES = ("spade_256", "spade_512", "spade_no_kl_512",
                   "cnn_256", "cnn_512", "pix2pix")


def measure_recipe(name: str, steps: int) -> dict:
    import jax
    import numpy as np

    from moonsuperresolution_tpu.config import RECIPES
    from moonsuperresolution_tpu.data.sampler import SyntheticSampler
    from moonsuperresolution_tpu.train.trainers import make_trainer

    cfg = RECIPES[name]
    # bf16 compute: the production choice on TPU (fidelity path keeps f32
    # statistics); the reference trains f32 on V100.
    import dataclasses

    cfg = dataclasses.replace(
        cfg, model=dataclasses.replace(cfg.model, compute_dtype="bfloat16"))
    tr = make_trainer(cfg)
    state = tr.init(jax.random.PRNGKey(0))

    hw = cfg.model.image_size
    b = cfg.batch_size
    s = SyntheticSampler(hw=hw, seed=0, num_samples=max(2 * b, 8))
    it = s.batches(b, steps + 2)
    batches = [next(it) for _ in range(steps + 2)]

    # Warmup: compile + first step.
    state, metrics, fake = tr.train_step(state, *batches[0],
                                         jax.random.PRNGKey(1))
    float(np.asarray(fake).mean())  # drain the pipeline

    t0 = time.perf_counter()
    for i in range(1, steps + 1):
        state, metrics, fake = tr.train_step(state, *batches[i],
                                             jax.random.PRNGKey(1 + i))
    float(np.asarray(fake).mean())  # readback: force full drain
    dt = (time.perf_counter() - t0) / steps

    # Validation step time (no grads, no donation).  val_step returns
    # (metrics dict, fake image) — see train/loop.py:230.
    vsrc, vtgt = batches[-1]
    vm, vf = tr.val_step(state.params, vsrc, vtgt, jax.random.PRNGKey(99))
    jax.block_until_ready((vm, vf))
    t0 = time.perf_counter()
    for i in range(steps):
        vm, vf = tr.val_step(state.params, vsrc, vtgt, jax.random.PRNGKey(i))
    float(np.asarray(vf).mean())  # readback: force full drain
    vdt = (time.perf_counter() - t0) / steps

    return {
        "recipe": name,
        "batch_size": b,
        "image_size": hw,
        "train_step_ms": round(dt * 1e3, 1),
        "samples_per_s": round(b / dt, 1),
        "val_step_ms": round(vdt * 1e3, 1),
    }


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--recipes", type=str, default=",".join(DEFAULT_RECIPES))
    p.add_argument("--steps", type=int, default=8)
    p.add_argument("--out", type=str, default=os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "BENCH_TRAIN.json"))
    a = p.parse_args()

    import jax

    results = []
    for name in a.recipes.split(","):
        r = measure_recipe(name.strip(), a.steps)
        results.append(r)
        print(json.dumps(r), flush=True)

    rec = {
        "device": str(jax.devices()[0]),
        "compute_dtype": "bfloat16",
        "note": ("jitted single-program steps with donated state, "
                 "readback-timed over --steps steps after compile; "
                 "reference loops are eager TF 2.x on one V100 "
                 "(train_spade_256.py:70-114)"),
        "results": results,
    }
    with open(a.out, "w") as f:
        json.dump(rec, f, indent=1)
    print("wrote", a.out)


if __name__ == "__main__":
    main()
