"""Experiment: software-pipelined flash kernel — issue chunk j+1's qk dot
before chunk j's softmax/pv so the MXU dot overlaps the VPU softmax.
A/B vs the committed _kernel at bq=1024, bk=512.

Run: PYTHONPATH=/root/repo:/root/.axon_site python scripts/exp_pipelined_flash.py
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

from f5_tts_tpu.ops.flash_attention import LOG2E, NEG_BIG, _flash, _out_struct


def _kernel_pipe(lens_ref, q_ref, k_ref, v_ref, o_ref, *, scale, block_k, n_kv, heads):
    bh = pl.program_id(0)
    b = bh // heads
    kv_len = lens_ref[b]
    q = (q_ref[0].astype(jnp.float32) * (scale * LOG2E)).astype(jnp.bfloat16)
    bq, dh = q.shape
    m = jnp.full((bq, 1), NEG_BIG, jnp.float32)
    l = jnp.zeros((bq, 1), jnp.float32)
    acc = jnp.zeros((bq, dh), jnp.float32)
    nc = n_kv // block_k

    def qk(j):
        k = k_ref[0, pl.ds(j * block_k, block_k), :].astype(jnp.bfloat16)
        s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32)
        col = jax.lax.broadcasted_iota(jnp.int32, (bq, block_k), 1) + j * block_k
        return jnp.where(col < kv_len, s, NEG_BIG)

    s_cur = qk(0)
    for j in range(nc):
        s_next = qk(j + 1) if j + 1 < nc else None
        v = v_ref[0, pl.ds(j * block_k, block_k), :].astype(jnp.bfloat16)
        m_new = jnp.maximum(m, jnp.max(s_cur, axis=-1, keepdims=True))
        p = jnp.exp2(s_cur - m_new)
        alpha = jnp.exp2(m - m_new)
        l = l * alpha + jnp.sum(p, axis=-1, keepdims=True)
        acc = acc * alpha + jax.lax.dot_general(
            p.astype(jnp.bfloat16), v, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        m = m_new
        s_cur = s_next
    o_ref[0] = (acc / jnp.maximum(l, 1e-30)).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("block_q", "block_k"))
def _flash_pipe(q, k, v, lens, block_q: int, block_k: int):
    b, h, n, dh = q.shape
    scale = dh**-0.5
    qf, kf, vf = (x.reshape(b * h, n, dh) for x in (q, k, v))
    kernel = functools.partial(_kernel_pipe, scale=scale, block_k=block_k, n_kv=n, heads=h)
    out = pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(b * h, n // block_q),
            in_specs=[
                pl.BlockSpec((1, block_q, dh), lambda bh, iq, *_: (bh, iq, 0)),
                pl.BlockSpec((1, n, dh), lambda bh, iq, *_: (bh, 0, 0)),
                pl.BlockSpec((1, n, dh), lambda bh, iq, *_: (bh, 0, 0)),
            ],
            out_specs=pl.BlockSpec((1, block_q, dh), lambda bh, iq, *_: (bh, iq, 0)),
        ),
        out_shape=_out_struct(qf, (b * h, n, dh)),
        compiler_params=pltpu.CompilerParams(dimension_semantics=("parallel", "arbitrary")),
    )(lens, qf, kf, vf)
    return out.reshape(b, h, n, dh)


def timed_loop(make_step, x0, iters):
    @jax.jit
    def loop(x):
        def body(c, _):
            y = make_step(c)
            return x + y * 1e-6, ()

        out, _ = jax.lax.scan(body, x, None, length=iters)
        return jnp.sum(out.astype(jnp.float32))

    loop(x0).block_until_ready()
    t0 = time.perf_counter()
    loop(x0).block_until_ready()
    return (time.perf_counter() - t0) / iters


def main():
    b, h, n, dh = 2, 16, 1024, 64
    rng = np.random.default_rng(0)
    q0, k0, v0 = (jnp.asarray(rng.standard_normal((b, h, n, dh)), jnp.bfloat16) for _ in range(3))
    lens = jnp.asarray([n, n - 200], jnp.int32)

    want = _flash(q0, k0, v0, lens, 1024, 512)
    got = _flash_pipe(q0, k0, v0, lens, 1024, 512)
    mae = float(jnp.mean(jnp.abs(want.astype(jnp.float32) - got.astype(jnp.float32))))
    print(f"MAE vs committed kernel: {mae:.2e}")
    for bq, bk in ((1024, 512), (1024, 256)):
        per = timed_loop(lambda x: _flash_pipe(x, k0, v0, lens, bq, bk), q0, 3000)
        print(f"pipe bq={bq} bk={bk}: {per*1e6:7.1f} us/call")
    per = timed_loop(lambda x: _flash(x, k0, v0, lens, 1024, 512), q0, 3000)
    print(f"base bq=1024 bk=512: {per*1e6:7.1f} us/call")


if __name__ == "__main__":
    main()
