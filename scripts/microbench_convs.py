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


def timeit(conv, x, k, iters=None):
    """Time ``iters`` dependent conv executions INSIDE one jitted program.

    The axon runtime is a tunneled TPU: per-dispatch round-trip latency is
    seconds, so timing eager per-call (the first version of this script)
    measures the tunnel, not the MXU.  Here a fori_loop perturbs the KERNEL
    with the previous iteration's first output element — a true data
    dependency that forces re-execution (no CSE/hoisting) at negligible
    overhead (the kernel is KB-sized; the conv reads MBs)."""
    # 64 dependent convs per program: the ~25 ms tunnel dispatch RTT is
    # then <10% of even the fastest shape's loop time.
    iters = iters or int(os.environ.get("MB_ITERS", "64"))

    @jax.jit
    def many(x, k):
        def body(i, carry):
            kk, feed = carry
            kk = (kk + feed).astype(k.dtype)
            y = conv(x, kk)
            # The dependency must CONSUME EVERY OUTPUT element or XLA
            # dead-code-eliminates the conv down to the consumed slice
            # (a y[0]-only feed measured 1400 "TFLOP/s").  max() touches
            # all of y and, unlike a channel-sum, cannot be folded back
            # into the conv (sum_c y = conv(x, sum_c k)).  Cost: one
            # memory-bandwidth pass over y per iteration — the reported
            # rates are conservative by bytes(y)/819GB/s per conv (~5-15%,
            # ~35% for the output-heavy gb shapes).
            f = jnp.max(y).astype(jnp.float32)
            # feed in {-1, 0, 1}: keeps int8 kernels from saturating
            return kk, jnp.clip(f, -1, 1).astype(k.dtype)
        kk, _ = jax.lax.fori_loop(
            0, iters, body, (k, jnp.asarray(0, k.dtype)))
        # Return ONE scalar: np.asarray on the full conv output would drag
        # hundreds of MB through the tunnel and dominate the measurement.
        return jnp.max(conv(x, kk)).astype(jnp.float32)

    # TWO readback-timed warmups: block_until_ready can return before the
    # tunnel drains, and the first real execution absorbs a pathologically
    # slow lazy upload of the inputs (measured ~134 s for 537 MB — the
    # steady-state tunnel moves >500 MB/s, first-touch does not).
    float(np.asarray(many(x, k)))
    float(np.asarray(many(x, k)))
    t0 = time.perf_counter()
    out = many(x, k)
    float(np.asarray(out))  # readback: tunnel can return early
    return (time.perf_counter() - t0) / (iters + 1)


def main():
    results = []
    for label, b, h, w, cin, cout, k in SHAPES:
        # Inputs are generated ON DEVICE: a host->device upload of these
        # tensors pays a ~4 MB/s first-touch penalty through the tunnel
        # (134 s for 537 MB, measured) that dwarfs everything else.
        key = jax.random.PRNGKey(0)
        kx, kk_, kxb, kkb = jax.random.split(key, 4)
        x8 = jax.random.randint(kx, (b, h, w, cin), -127, 127, jnp.int32
                                ).astype(jnp.int8)
        k8 = jax.random.randint(kk_, (k, k, cin, cout), -127, 127, jnp.int32
                                ).astype(jnp.int8)
        xb = jax.random.normal(kxb, (b, h, w, cin), jnp.bfloat16)
        kb = jax.random.normal(kkb, (k, k, cin, cout), jnp.bfloat16)
        jax.block_until_ready((x8, k8, xb, kb))
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
