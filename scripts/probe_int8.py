"""int8-MXU probe: is quantized inference a win for the DiffNet stack?

The v5e datasheet rates the MXU at 2x int8 ops vs bf16 FLOPs, which
would make a quantized DiffNet attractive for the parity-PLMS sampling
scan (~80% of end-to-end wall time at B=32). This probe measures, on
the real chip, with the tunnel-safe host-fetch sync from
`utils/profiling.sync` (NOT `block_until_ready`, which can return
before execution completes on the axon tunnel):

  1. the achievable bf16 matmul rate (calibration ceiling),
  2. the int8 matmul rate including the mandatory requantization,
  3. a DiffNet-shaped gated residual block in bf16 vs int8
     (conv k=3 C->2C, tanh*sigmoid gate, 1x1 back to C).

STATUS (measured 2026-08-19, 1x TPU v5e via axon tunnel):

  bf16 c@w 4096^3 x50 (scan-chained):   114.0 TF/s   <- observed ceiling
  int8 + shift-requant, same shape:     157.6 TOP/s  <- only 1.38x
  DiffNet-ish block bf16 (B=32,T=1024): 45.0 TF/s (0.668 ms)
  DiffNet-ish block int8 (dyn. quant):  47.9 TOP/s (0.627 ms)  <- +6%

Verdict: **measured negative** - int8 is NOT the 2x of the datasheet on
this part (1.38x on pure matmul), and at the DiffNet arithmetic
intensity (C=256) the per-step quantize/dequantize elementwise traffic
eats nearly all of that, leaving +5% before any accuracy loss. The real
in-graph DiffNet already runs at ~124 TF/s effective (probe_diffusion:
834 ms / 200 NFE / 20 layers at B=24), i.e. ABOVE the standalone bf16
block rate here thanks to XLA fusion across layers - so the parity
sampling path is compute-saturated in bf16 and a quantized denoiser
would trade audible quality risk for ~nothing. Decision recorded in
BASELINE.md next to the fused-MRF negative result; bf16 stays the
inference dtype.

Run: python scripts/probe_int8.py   (env: PROBE_TRIALS, default 3)
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax
    import jax.numpy as jnp
    from jax import lax

    cache_dir = os.environ.get("JAX_CACHE_DIR", "/tmp/bisinger_jax_cache")
    os.makedirs(cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from bisinger_tpu.utils.profiling import sync

    trials = int(os.environ.get("PROBE_TRIALS", 3))

    def timeit(f, *args):
        o = f(*args)
        sync(o)
        ts = []
        for _ in range(trials):
            t0 = time.perf_counter()
            o = f(*args)
            sync(o)
            ts.append(time.perf_counter() - t0)
        return min(ts)

    key = jax.random.PRNGKey(0)
    ITERS = 50

    # 1/2: square matmul chain, bf16 vs int8+requant
    M = K = N = 4096
    flops = 2 * M * K * N * ITERS
    x = jax.random.normal(key, (M, K), jnp.bfloat16)
    w = jax.random.normal(key, (K, N), jnp.bfloat16) * 0.015
    f_bf = jax.jit(
        lambda x, w: lax.scan(
            lambda c, _: (c @ w, None), x, None, length=ITERS
        )[0].sum()
    )
    t = timeit(f_bf, x, w)
    print(f"bf16 c@w {M}^3 x{ITERS}: {t*1e3:.1f} ms -> {flops/t/1e12:.1f} TF/s")

    xi = (jax.random.normal(key, (M, K)) * 10).astype(jnp.int8)
    wi = (jax.random.normal(key, (K, N)) * 10).astype(jnp.int8)

    def i8_step(c, w):
        y = lax.dot_general(
            c, w, (((1,), (0,)), ((), ())), preferred_element_type=jnp.int32
        )
        return (y >> 10).astype(jnp.int8)

    f_i8 = jax.jit(
        lambda x, w: lax.scan(
            lambda c, _: (i8_step(c, w), None), x, None, length=ITERS
        )[0].astype(jnp.int32).sum()
    )
    t = timeit(f_i8, xi, wi)
    print(f"int8 + shift-requant: {t*1e3:.1f} ms -> {flops/t/1e12:.1f} TOP/s")

    # 3: DiffNet-shaped gated residual block (models/diffnet.py
    # ResidualBlock at bench shapes B=32, T=1024, C=256)
    B, T, C = 32, 1024, 256
    xc = jax.random.normal(key, (B, T, C), jnp.bfloat16)
    wc = jax.random.normal(key, (3, C, 2 * C), jnp.bfloat16) * 0.05
    wo = jax.random.normal(key, (C, C), jnp.bfloat16) * 0.06
    cflops = (2 * B * T * 3 * C * 2 * C + 2 * B * T * C * C) * ITERS

    def blk(c, wc, wo):
        y = lax.conv_general_dilated(
            c, wc, (1,), "SAME", dimension_numbers=("NWC", "WIO", "NWC")
        )
        g = jnp.tanh(y[..., :C]) * jax.nn.sigmoid(y[..., C:])
        return g @ wo

    f_blk = jax.jit(
        lambda x, wc, wo: lax.scan(
            lambda c, _: (blk(c, wc, wo), None), x, None, length=ITERS
        )[0].sum()
    )
    t = timeit(f_blk, xc, wc, wo)
    print(
        f"DiffNet-ish blk bf16: {t*1e3:.1f} ms -> {cflops/t/1e12:.1f} TF/s"
        f" ({t/ITERS*1e3:.3f} ms/blk)"
    )

    # int8 variant: int8 convs, int32 accum, bf16 gate, dynamic requant
    xci = (jax.random.normal(key, (B, T, C)) * 10).astype(jnp.int8)
    wci = (jax.random.normal(key, (3, C, 2 * C)) * 10).astype(jnp.int8)
    woi = (jax.random.normal(key, (C, C)) * 10).astype(jnp.int8)

    def blk8(c, wc, wo):
        y = lax.conv_general_dilated(
            c, wc, (1,), "SAME",
            dimension_numbers=("NWC", "WIO", "NWC"),
            preferred_element_type=jnp.int32,
        )
        yf = y.astype(jnp.bfloat16) * jnp.bfloat16(2**-10)
        g = jnp.tanh(yf[..., :C]) * jax.nn.sigmoid(yf[..., C:])
        gi = jnp.clip(jnp.round(g * 127), -127, 127).astype(jnp.int8)
        z = lax.dot_general(
            gi, wo, (((2,), (0,)), ((), ())),
            preferred_element_type=jnp.int32,
        )
        return (z >> 8).astype(jnp.int8)

    f_blk8 = jax.jit(
        lambda x, wc, wo: lax.scan(
            lambda c, _: (blk8(c, wc, wo), None), x, None, length=ITERS
        )[0].astype(jnp.int32).sum()
    )
    t = timeit(f_blk8, xci, wci, woi)
    print(
        f"DiffNet-ish blk int8: {t*1e3:.1f} ms -> {cflops/t/1e12:.1f} TOP/s"
        f" ({t/ITERS*1e3:.3f} ms/blk)"
    )


if __name__ == "__main__":
    main()
