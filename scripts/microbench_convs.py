"""MXU rate microbenchmark: the generator's dominant conv shapes, bf16 vs
int8, in isolation (no quant/dequant, inputs pre-staged in the target dtype).

Answers the roofline question behind the int8_static headline gap
(VERDICT r4 #3): does XLA lower s8xs8->s32 conv_general_dilated to the v5e
double-rate MXU path (394 TOPS peak) — and at what efficiency — for the
shapes this model actually runs (reference: spade/models/networks.py:37-57
channel plan at image 512)?  If the per-shape int8 ceiling is X TOPS, the
end-to-end int8 MFU target is bounded by X/394, not 1.0.

    python scripts/microbench_convs.py            # all dominant shapes
    MB_ITERS=16 python scripts/microbench_convs.py

Prints one line per (shape, dtype) with achieved TFLOP/s, plus an
FLOP-weighted model-level ceiling estimate for the int8 path.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

# (label, batch, H, W, Cin, Cout, k): the generator's FLOP-dominant convs at
# image 512 / batch 16 (per-block breakdown in PROFILE.md).  gb = the fused
# gamma/beta conv of a SPADE (128 -> 2*filters).
SHAPES = [
    ("b5.conv_1 256->128 @256", 16, 256, 256, 256, 128, 3),
    ("b5.conv_2 128->128 @256", 16, 256, 256, 128, 128, 3),
    ("b5.gb    128->512 @256", 16, 256, 256, 128, 512, 3),
    ("b4.conv_1 512->256 @128", 16, 128, 128, 512, 256, 3),
    ("b4.gb    128->1024 @128", 16, 128, 128, 128, 1024, 3),
    ("b3.conv_1 1024->512 @64", 16, 64, 64, 1024, 512, 3),
    ("b3.gb    128->2048 @64", 16, 64, 64, 128, 2048, 3),
    ("b2.conv_1 1024->1024 @32", 16, 32, 32, 1024, 1024, 3),
    ("mask      2->384  @256", 16, 256, 256, 2, 384, 3),
]

# Per-patch FLOP weights of the int8-quantized convs (batch-16 tensors above
# are 16 patches), used for the weighted ceiling.  Computed from the shapes.


def conv_flops(b, h, w, cin, cout, k):
    return 2.0 * b * h * w * k * k * cin * cout


def timeit(fn, *args, iters=None):
    iters = iters or int(os.environ.get("MB_ITERS", "8"))
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    # readback guard: remote-attached runtimes can return early
    float(np.asarray(out).ravel()[0])
    return (time.perf_counter() - t0) / iters


def main():
    rng = np.random.default_rng(0)
    results = []
    for label, b, h, w, cin, cout, k in SHAPES:
        x8 = jnp.asarray(rng.integers(-127, 127, (b, h, w, cin)), jnp.int8)
        k8 = jnp.asarray(rng.integers(-127, 127, (k, k, cin, cout)), jnp.int8)
        xb = jnp.asarray(rng.standard_normal((b, h, w, cin)), jnp.bfloat16)
        kb = jnp.asarray(rng.standard_normal((k, k, cin, cout)), jnp.bfloat16)
        dn = jax.lax.conv_dimension_numbers((b, h, w, cin), (k, k, cin, cout),
                                            ("NHWC", "HWIO", "NHWC"))

        @jax.jit
        def conv_i8(x, kk):
            return jax.lax.conv_general_dilated(
                x, kk, (1, 1), "SAME", dimension_numbers=dn,
                preferred_element_type=jnp.int32)

        @jax.jit
        def conv_i8_bf16out(x, kk):
            return jax.lax.conv_general_dilated(
                x, kk, (1, 1), "SAME", dimension_numbers=dn,
                preferred_element_type=jnp.bfloat16)

        @jax.jit
        def conv_bf16(x, kk):
            return jax.lax.conv_general_dilated(
                x, kk, (1, 1), "SAME", dimension_numbers=dn)

        fl = conv_flops(b, h, w, cin, cout, k)
        row = {"label": label, "gflops": fl / 1e9}
        for name, fn, a0, a1 in (("bf16", conv_bf16, xb, kb),
                                 ("int8_i32", conv_i8, x8, k8),
                                 ("int8_bf16o", conv_i8_bf16out, x8, k8)):
            try:
                dt = timeit(fn, a0, a1)
                row[name] = fl / dt / 1e12
            except Exception as e:
                row[name] = f"ERR {type(e).__name__}"
        results.append(row)
        print(f"{label:28s} {row['gflops']:9.1f} GF  "
              + "  ".join(f"{n}: {row[n]:7.1f} T" if isinstance(row[n], float)
                          else f"{n}: {row[n]}"
                          for n in ("bf16", "int8_i32", "int8_bf16o")),
              flush=True)

    # FLOP-weighted int8 ceiling across the quantized convs (exclude mask)
    q = [r for r in results if not r["label"].startswith("mask")
         and isinstance(r.get("int8_bf16o"), float)]
    if q:
        wsum = sum(r["gflops"] for r in q)
        ceil = wsum / sum(r["gflops"] / r["int8_bf16o"] for r in q)
        ceilb = wsum / sum(r["gflops"] / r["bf16"] for r in q)
        print(f"\nFLOP-weighted achievable rate over these shapes: "
              f"int8 {ceil:.1f} TFLOP/s ({ceil/394:.2f} of 394T), "
              f"bf16 {ceilb:.1f} TFLOP/s ({ceilb/197:.2f} of 197T)")


if __name__ == "__main__":
    main()
