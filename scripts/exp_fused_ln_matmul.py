"""Experiment (verdict #3): fuse LN + AdaLN modulate into the qkv matmul's
input read.  XLA already epilogue-fuses gate/residual/bias into the matmuls
(profile: fusion.161, convolution_add_fusion.*); the remaining separate
elementwise pass is the LN-stats + normalize + modulate producer
(convert_reduce_fusion.9, ~24 us/block).  A Pallas matmul with an LN
prologue removes that pass IF its matmul speed matches XLA's (~170 TFLOP/s
at [2048,1024]x[1024,3072]).

A/B: XLA (LN+modulate then matmul) vs Pallas fused kernel.
Run: PYTHONPATH=/root/repo:/root/.axon_site python scripts/exp_fused_ln_matmul.py
"""

import functools
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from f5_tts_tpu.utils.compile_cache import enable_persistent_cache

enable_persistent_cache()


def _kernel(x_ref, w_ref, b_ref, sc_ref, sh_ref, o_ref, *, bk_lanes):
    # x [bm, K] raw (pre-norm); w [K, bn]; sc/sh [1, K] modulate row; b [1, bn]
    x = x_ref[...].astype(jnp.float32)
    mu = jnp.mean(x, axis=-1, keepdims=True)
    xc = x - mu
    var = jnp.mean(xc * xc, axis=-1, keepdims=True)
    norm = xc * jax.lax.rsqrt(var + 1e-6)
    norm = norm * sc_ref[...].astype(jnp.float32) + sh_ref[...].astype(jnp.float32)
    o_ref[...] = (
        jax.lax.dot_general(norm.astype(jnp.bfloat16), w_ref[...],
                            (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32)
        + b_ref[...].astype(jnp.float32)
    ).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("bm", "bn"))
def fused_ln_matmul(x, w, bias, scale1p, shift, bm: int, bn: int):
    M, K = x.shape
    _, N = w.shape
    kernel = functools.partial(_kernel, bk_lanes=K)
    return pl.pallas_call(
        kernel,
        grid=(M // bm, N // bn),
        in_specs=[
            pl.BlockSpec((bm, K), lambda i, j: (i, 0)),
            pl.BlockSpec((K, bn), lambda i, j: (0, j)),
            pl.BlockSpec((1, bn), lambda i, j: (0, j)),
            pl.BlockSpec((1, K), lambda i, j: (0, 0)),
            pl.BlockSpec((1, K), lambda i, j: (0, 0)),
        ],
        out_specs=pl.BlockSpec((bm, bn), lambda i, j: (i, j)),
        out_shape=jax.ShapeDtypeStruct((M, N), x.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel"),
        ),
    )(x, w, bias, scale1p, shift)


def xla_ref(x, w, bias, scale1p, shift):
    xf = x.astype(jnp.float32)
    mu = jnp.mean(xf, axis=-1, keepdims=True)
    xc = xf - mu
    var = jnp.mean(xc * xc, axis=-1, keepdims=True)
    norm = xc * jax.lax.rsqrt(var + 1e-6) * scale1p + shift
    return (norm.astype(jnp.bfloat16) @ w + bias).astype(x.dtype)


def timed_loop(fn, x0, iters, *consts):
    @jax.jit
    def loop(x, *cs):
        def body(c, _):
            y = fn(c, *cs)
            # feed the result back into the carry so the scan body is NOT
            # loop-invariant (XLA hoists invariant bodies out of the loop)
            return c + y[:, : c.shape[1]].astype(c.dtype) * 1e-6, ()

        out, _ = jax.lax.scan(body, x, None, length=iters)
        return jnp.sum(out.astype(jnp.float32))

    loop(x0, *consts).block_until_ready()
    t0 = time.perf_counter()
    loop(x0, *consts).block_until_ready()
    return (time.perf_counter() - t0) / iters


def main():
    M, K, N = 2048, 1024, 3072
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((M, K)), jnp.bfloat16)
    w = jnp.asarray(rng.standard_normal((K, N)) * 0.02, jnp.bfloat16)
    bias = jnp.asarray(rng.standard_normal((1, N)) * 0.01, jnp.float32)
    sc = jnp.asarray(1 + rng.standard_normal((1, K)) * 0.1, jnp.float32)
    sh = jnp.asarray(rng.standard_normal((1, K)) * 0.1, jnp.float32)

    want = np.asarray(xla_ref(x, w, bias, sc, sh), np.float32)
    for bm, bn in ((256, 512), (128, 512), (256, 256)):
        got = np.asarray(fused_ln_matmul(x, w, bias, sc, sh, bm, bn), np.float32)
        mae = np.abs(got - want).mean()
        per = timed_loop(lambda c, ww: fused_ln_matmul(c, ww, bias, sc, sh, bm, bn), x, 2000, w)
        print(f"pallas bm={bm} bn={bn}: {per*1e6:7.1f} us/call  (MAE {mae:.1e})")
    per = timed_loop(lambda c, ww: xla_ref(c, ww, bias, sc, sh), x, 2000, w)
    print(f"xla LN+modulate+matmul: {per*1e6:7.1f} us/call")


if __name__ == "__main__":
    main()
