"""Int8 generator: structure, determinism, and deviation vs the f32 path."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from moonsuperresolution_tpu.models.networks import SpadeGenerator
from moonsuperresolution_tpu.models.quant import (
    QuantizedSpadeGenerator,
    _quant_act_per_tensor,
    _quant_kernel_per_channel,
)

IMG = 64


@pytest.fixture(scope="module")
def gen_and_params():
    gen = SpadeGenerator(image_size=IMG)
    rng = np.random.default_rng(0)
    z = jnp.asarray(rng.standard_normal((2, 16)), jnp.float32)
    src = jnp.asarray(rng.standard_normal((2, IMG, IMG, 2)) * 0.3,
                      jnp.float32)
    params = gen.init(jax.random.PRNGKey(0), z, src)["params"]
    return gen, params, z, src


def test_kernel_quantization_roundtrip():
    rng = np.random.default_rng(1)
    k = jnp.asarray(rng.standard_normal((3, 3, 8, 16)) * 0.2, jnp.float32)
    kq, scale = _quant_kernel_per_channel(k)
    assert kq.dtype == jnp.int8 and scale.shape == (16,)
    err = np.abs(np.asarray(kq, np.float32) * np.asarray(scale) - np.asarray(k))
    # quantization error bounded by half a step per channel
    assert (err <= 0.5 * np.asarray(scale)[None, None, None] + 1e-7).all()
    # per-channel max hits 127 exactly (symmetric scheme)
    assert (np.abs(np.asarray(kq)).max(axis=(0, 1, 2)) == 127).all()


def test_activation_quantization():
    x = jnp.asarray([[0.5, -2.0, 1.0]], jnp.float32)
    xq, s = _quant_act_per_tensor(x)
    assert xq.dtype == jnp.int8
    np.testing.assert_allclose(float(s), 2.0 / 127.0, rtol=1e-6)
    np.testing.assert_array_equal(np.asarray(xq), [[32, -127, 64]])


def test_int8_generator_close_to_f32(gen_and_params):
    """The int8 forward must track the f32 forward closely: this bounds the
    fidelity cost of the opt-in speed mode.  The DEM output lives in
    [-0.5, 0.5]; require small relative deviation in that range."""
    gen, params, z, src = gen_and_params
    ref = np.asarray(gen.apply({"params": params}, z, src))

    qgen = QuantizedSpadeGenerator(image_size=IMG, dtype=jnp.float32)
    qparams = qgen.quantize(params)
    out = np.asarray(jax.jit(qgen.apply)(qparams, z, src))

    assert out.shape == ref.shape
    span = ref.max() - ref.min()
    rel_rmse = np.sqrt(np.mean((out - ref) ** 2)) / max(span, 1e-9)
    assert rel_rmse < 0.02, rel_rmse
    # quantization must actually change something (sensitivity guard)
    assert not np.array_equal(out, ref)


def test_int8_bf16_acc_close_to_int32_acc(gen_and_params):
    """acc_dtype="bfloat16" (conv results materialized bf16 — the production
    speed mode) must stay close to the exact int32-accumulator path AND
    within the same overall bound vs the f32 reference."""
    gen, params, z, src = gen_and_params
    ref = np.asarray(gen.apply({"params": params}, z, src))

    q32 = QuantizedSpadeGenerator(image_size=IMG, dtype=jnp.float32)
    qbf = QuantizedSpadeGenerator(image_size=IMG, dtype=jnp.float32,
                                  acc_dtype="bfloat16")
    qparams = q32.quantize(params)
    out32 = np.asarray(jax.jit(q32.apply)(qparams, z, src))
    outbf = np.asarray(jax.jit(qbf.apply)(qparams, z, src))

    span = ref.max() - ref.min()
    rel_vs_int32 = np.sqrt(np.mean((outbf - out32) ** 2)) / max(span, 1e-9)
    rel_vs_ref = np.sqrt(np.mean((outbf - ref) ** 2)) / max(span, 1e-9)
    assert rel_vs_int32 < 0.01, rel_vs_int32
    assert rel_vs_ref < 0.02, rel_vs_ref


def test_int8_deterministic(gen_and_params):
    gen, params, z, src = gen_and_params
    qgen = QuantizedSpadeGenerator(image_size=IMG, dtype=jnp.float32)
    qparams = qgen.quantize(params)
    a = np.asarray(qgen.apply(qparams, z, src))
    b = np.asarray(qgen.apply(qparams, z, src))
    np.testing.assert_array_equal(a, b)


def test_static_scales_close_to_dynamic(gen_and_params):
    """Calibrated static activation scales must track the dynamic-quant
    forward closely on in-range inputs and eliminate nothing semantically
    (just the per-conv max reductions)."""
    gen, params, z, src = gen_and_params
    qgen = QuantizedSpadeGenerator(image_size=IMG, dtype=jnp.float32)
    qparams = qgen.quantize(params)
    q_static = qgen.calibrate(qparams, z, src)
    assert "act_scales" in q_static and len(q_static["act_scales"]) >= 20

    dyn = np.asarray(qgen.apply(qparams, z, src))
    stat = np.asarray(jax.jit(qgen.apply)(q_static, z, src))
    span = dyn.max() - dyn.min()
    rel = np.sqrt(np.mean((dyn - stat) ** 2)) / max(span, 1e-9)
    assert rel < 0.01, rel

    # calibrating twice keeps scales monotone non-decreasing (conv-input
    # sites are scalars, ".gb" requant sites are per-channel vectors)
    q2 = qgen.calibrate(q_static, z, src * 1.5)
    for k, v in q_static["act_scales"].items():
        if k.endswith("_inv"):  # derived inverses shrink as scales grow
            continue
        assert np.all(np.asarray(q2["act_scales"][k])
                      >= np.asarray(v) * 0.999), k


def test_engine_int8_load(tmp_path, gen_and_params):
    """load_model_fn(quantize="int8") end to end through a checkpoint."""
    from moonsuperresolution_tpu.config import ModelConfig, TrainConfig
    from moonsuperresolution_tpu.infer.engine import load_model_fn
    from moonsuperresolution_tpu.train.trainers import GauGANTrainer
    from moonsuperresolution_tpu.utils.checkpoint import save_params

    cfg = TrainConfig(
        model=ModelConfig(variant="cnn_spade", image_size=IMG, latent_dim=16),
        batch_size=2,
    )
    trainer = GauGANTrainer(cfg)
    state = trainer.init(jax.random.PRNGKey(0))
    ckpt = str(tmp_path / "ckpt")
    save_params(ckpt, jax.device_get(state.params))

    fn_q, p_q = load_model_fn(ckpt, "cnn_spade", IMG, latent_dim=16,
                              quantize="int8")
    fn_f, p_f = load_model_fn(ckpt, "cnn_spade", IMG, latent_dim=16,
                              compute_dtype="float32")
    rng = np.random.default_rng(2)
    src = jnp.asarray(rng.standard_normal((2, IMG, IMG, 2)) * 0.3,
                      jnp.float32)
    key = jax.random.PRNGKey(1)
    out_q = np.asarray(fn_q(p_q, src, key))
    out_f = np.asarray(fn_f(p_f, src, key))
    assert out_q.shape == out_f.shape == (2, IMG, IMG)
    span = out_f.max() - out_f.min()
    rel = np.sqrt(np.mean((out_q - out_f) ** 2)) / max(span, 1e-9)
    assert rel < 0.03, rel


def test_engine_real_patch_calibration(tmp_path):
    """int8_static re-calibrates its activation scales on REAL patches from
    the target raster before the first tile (ADVICE r2: synthetic-noise
    scales can clip structured activations).  The engine side is tested
    with a stand-in model exposing ``calibrate_on`` — int8 conv execution
    on XLA:CPU is ~100x slower than f32, so driving the real int8 engine
    here would take tens of minutes; the int8 ``calibrate()`` semantics
    themselves are pinned by the direct tests above, and the real
    int8_static load path runs on TPU via bench.py / the full-map bench."""
    import os

    from moonsuperresolution_tpu.config import DSRConfig
    from moonsuperresolution_tpu.geo import write_geotiff
    from moonsuperresolution_tpu.infer.engine import DEMSuperResolution

    cv2 = pytest.importorskip("cv2")

    rng = np.random.default_rng(0)
    h, w = 200, 260
    dem = cv2.resize(rng.standard_normal((5, 7)).astype(np.float32),
                     (w, h), interpolation=cv2.INTER_CUBIC) * 100 + 1500
    ort = (cv2.resize(rng.standard_normal((10, 13)).astype(np.float32),
                      (w, h), interpolation=cv2.INTER_CUBIC) * 40 + 128
           ).clip(1, 255)
    dem[40:44, 50:54] = -32768.0  # a hole: some patches invalid
    td = str(tmp_path)
    gt = (0.0, 1.0, 0.0, 0.0, 0.0, -1.0)
    write_geotiff(os.path.join(td, "run-DEM.tif"), dem, gt, "P", -32768.0)
    write_geotiff(os.path.join(td, "run-DRG.tif"), ort, gt, "P", -32768.0)

    calls = []

    def fake_model(params, source, rng_):
        return source[..., 1]

    def calibrate_on(params, batch):
        calls.append(np.asarray(batch))
        return dict(params, calibrated=np.float32(1.0))

    fake_model.calibrate_on = calibrate_on

    cfg = DSRConfig(image_size=IMG, stride=8, batch_size=16, tile_size=128,
                    source_folder_path=td, map_name="t", save_path=None)
    eng = DEMSuperResolution(cfg, model=fake_model, model_params={})
    eng.process_map(progress=False)

    # invoked exactly once, before any tile, with real normalized patches
    assert len(calls) == 1
    assert getattr(eng, "_calibrated", False)
    batch = calls[0]
    assert batch.ndim == 4 and batch.shape[-1] == 2 and 1 <= len(batch) <= 8
    assert batch.shape[1:3] == (IMG, IMG)
    # per-patch min-max normalization to [-0.5, 0.5], no nodata inside
    for p in batch:
        for c in range(2):
            assert np.isclose(p[..., c].min(), -0.5, atol=1e-5)
            assert np.isclose(p[..., c].max(), 0.5, atol=1e-5)
    assert "calibrated" in eng.model_params
