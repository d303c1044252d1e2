"""Ablation timings for the int8 inference path on the real TPU chip.

Times, at the production config (512/64, batch 16):
  1. quantized generator forward alone (encoder + int8 generator)
  2. bf16 generator forward alone
  3. the full tile program (prep + forwards + fold) int8_static
so the non-generator fraction and the int8/bf16 conv-bound gap are visible.

Optionally dumps the optimized HLO of the quantized forward to
/tmp/int8_fwd_hlo.txt for fusion inspection (PROF_HLO=1).
"""

from __future__ import annotations

import os
import time

import jax
import jax.numpy as jnp
import numpy as np


def timeit(fn, *args, iters=8, warmup=2):
    for _ in range(warmup):
        out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters


def stage(msg):
    print(f"[{time.strftime('%H:%M:%S')}] {msg}", flush=True)


def main():
    image_size, batch = 512, int(os.environ.get("PROF_BATCH", "16"))
    from moonsuperresolution_tpu.config import DSRConfig, ModelConfig, TrainConfig
    from moonsuperresolution_tpu.infer.engine import DEMSuperResolution
    from moonsuperresolution_tpu.models.networks import sample_latent
    from moonsuperresolution_tpu.models.quant import QuantizedSpadeGenerator
    from moonsuperresolution_tpu.train.trainers import GauGANTrainer

    cfg = TrainConfig(
        model=ModelConfig(variant="gaugan", image_size=image_size,
                          latent_dim=256, compute_dtype="bfloat16"),
        batch_size=batch,
    )
    stage("building trainer")
    trainer = GauGANTrainer(cfg)
    stage("init params (remote compile + run)")
    params = trainer.init(jax.random.PRNGKey(0)).params
    params = {"generator": params["generator"], "encoder": params["encoder"]}

    qgen = QuantizedSpadeGenerator(
        image_size=image_size,
        acc_dtype=os.environ.get("PROF_INT8_ACC", "bfloat16"))
    stage("quantize weights")
    qg = qgen.quantize(params["generator"])

    rng_c = np.random.default_rng(0)
    src = jnp.asarray(rng_c.uniform(-0.5, 0.5,
                                    (batch, image_size, image_size, 2)),
                      jnp.float32)
    stage("encoder forward")
    mean, logvar = trainer.encoder.apply({"params": params["encoder"]}, src)
    z = sample_latent(jax.random.PRNGKey(0), mean, logvar)
    stage("calibrate (jit compile + run)")
    qg = qgen.calibrate(qg, z, src)
    stage("timing int8 forward")

    # --- 1. int8 generator forward alone (static scales)
    @jax.jit
    def int8_fwd(qg, z, src):
        return qgen.apply(qg, z, src)

    t_int8 = timeit(int8_fwd, qg, z, src)
    print(f"int8 gen fwd:  {t_int8*1e3:8.2f} ms  "
          f"({batch/t_int8:7.1f} patches/s)")

    # --- 2. bf16 generator forward alone
    @jax.jit
    def bf16_fwd(p, z, src):
        return trainer.generator.apply({"params": p}, z, src)

    t_bf16 = timeit(bf16_fwd, params["generator"], z, src)
    print(f"bf16 gen fwd:  {t_bf16*1e3:8.2f} ms  "
          f"({batch/t_bf16:7.1f} patches/s)  ratio {t_bf16/t_int8:.2f}x")

    # --- 3. encoder alone
    @jax.jit
    def enc_fwd(p, src):
        return trainer.encoder.apply({"params": p}, src)

    t_enc = timeit(enc_fwd, params["encoder"], src)
    print(f"encoder fwd:   {t_enc*1e3:8.2f} ms")

    if os.environ.get("PROF_HLO") == "1":
        txt = int8_fwd.lower(qg, z, src).compile().as_text()
        with open("/tmp/int8_fwd_hlo.txt", "w") as f:
            f.write(txt)
        print("HLO written to /tmp/int8_fwd_hlo.txt", len(txt), "bytes")

    if os.environ.get("PROF_TRACE") == "1":
        # Device trace of the int8 forward; per-op self-times parsed out of
        # the xspace with tensorboard_plugin_profile so the conclusions can
        # go in PROFILE.md without a TensorBoard UI.
        trace_dir = "/tmp/int8_trace"
        import glob
        import shutil
        shutil.rmtree(trace_dir, ignore_errors=True)
        with jax.profiler.trace(trace_dir):
            for _ in range(4):
                out = int8_fwd(qg, z, src)
            jax.block_until_ready(out)
        xs = glob.glob(os.path.join(trace_dir, "**", "*.xplane.pb"),
                       recursive=True)
        print("xspace files:", xs)
        # Per-op aggregation: scripts/parse_xplane.py <trace_dir> --steps 4
        # --hlo /tmp/int8_fwd_hlo.txt  (the tensorboard_plugin_profile
        # converter is broken against this image's protobuf/TF pair).

    # --- 4. full tile program, int8_static
    def model_fn(p, source, rng):
        mean, logvar = trainer.encoder.apply({"params": p["encoder"]}, source)
        zz = sample_latent(rng, mean, logvar)
        return qgen.apply(p["generator"], zz, source)[..., 0]

    eng_params = dict(params, generator=qg)
    dsr = DSRConfig(image_size=image_size, stride=image_size // 8,
                    batch_size=batch, tile_size=1024,
                    compute_dtype="bfloat16")
    engine = DEMSuperResolution(dsr, model=model_fn, model_params=eng_params)
    g = engine.geom
    rng = np.random.default_rng(0)
    engine.img_padded = (rng.standard_normal((g.slab, g.slab)) * 30
                         + 128).astype(np.float32)
    engine.dem_padded = (rng.standard_normal((g.slab, g.slab)) * 50
                         + 1500).astype(np.float32)
    engine.dem_shape = (1024, 1024)

    out = engine.process_tile(0, 0)
    float(np.asarray(out[0]).mean())
    if os.environ.get("PROF_TRACE_TILE") == "1":
        # Device trace of ONE full tile program (extraction + packed scan +
        # fold): parse with scripts/parse_xplane.py --steps 1
        # --hlo /tmp/tile_hlo.txt for source-line attribution.
        import shutil
        shutil.rmtree("/tmp/tile_trace", ignore_errors=True)
        slab_i = jnp.asarray(engine.img_padded[: g.slab, : g.slab])
        slab_d = jnp.asarray(engine.dem_padded[: g.slab, : g.slab])
        rng0 = jax.random.PRNGKey(0)
        txt = engine._tile_fn.lower(
            engine._device_params, slab_i, slab_d, rng0
        ).compile().as_text()
        with open("/tmp/tile_hlo.txt", "w") as f:
            f.write(txt)
        with jax.profiler.trace("/tmp/tile_trace"):
            out = engine.process_tile(0, 0)
            float(np.asarray(out[0]).mean())
        stage("tile trace -> /tmp/tile_trace, HLO -> /tmp/tile_hlo.txt")
    n_tiles = 3
    t0 = time.perf_counter()
    for _ in range(n_tiles):
        out = engine.process_tile(0, 0)
        float(np.asarray(out[0]).mean())
    dt = (time.perf_counter() - t0) / n_tiles
    n_patches = g.grid * g.grid
    print(f"tile program:  {dt*1e3:8.2f} ms/tile "
          f"({n_patches/dt:7.1f} patches/s, {n_patches} patches)")
    gen_time = n_patches / batch * t_int8
    print(f"  generator share: {gen_time/dt*100:.1f}%  "
          f"(non-gen: {(dt-gen_time)*1e3:.1f} ms)")


if __name__ == "__main__":
    main()
