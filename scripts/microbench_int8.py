"""Does XLA:TPU (v5e) run int8 convs/matmuls faster than bf16?

Decides whether a TRT-int8-equivalent quantized inference path can break
the conv-bound ceiling (reference ships TRT fp16; TRT int8 would be its
next step — see reference README.md:460-503 for the fp16 numbers).

v5e peak: 197 TFLOP/s bf16, 394 TOP/s int8 (2x). If XLA lowers
int8xint8->int32 dots to the MXU at rate, a quantized backbone doubles
the conv roofline.

Each op is repeated K times INSIDE one jit via a data-dependent scan
(per-dispatch tunnel RPC is ~ms — it would dominate a sub-3 ms kernel).
"""
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

from maskrcnn_tf2_tpu.utils.compile_cache import enable as enable_cache

enable_cache()

K = 32  # in-graph repetitions per dispatch


def chain(op, perturb):
    """Run op K times with a data-dependent ~zero carry (defeats hoisting)."""

    def fn(*args):
        def body(c, _):
            y = op(perturb(args[0], c), *args[1:])
            # The carry must (a) consume ALL of y — else XLA dead-code
            # eliminates every output element but one — and (b) not be
            # constant-foldable to zero. A full reduction costs one HBM pass
            # over y per step, small vs the matmul FLOPs.
            if y.dtype == jnp.int32:
                c2 = (y.sum(dtype=jnp.int32) >> 30).astype(c.dtype)  # small
            else:
                c2 = (y.sum(dtype=jnp.float32) * 1e-38).astype(c.dtype)
            return c2, None
        c, _ = jax.lax.scan(body, jnp.zeros((), args[0].dtype
                                            if args[0].dtype != jnp.int8
                                            else jnp.int8), None, length=K)
        return c

    return jax.jit(fn)


def timeit(fn, *args, iters=5):
    out = fn(*args)
    jax.block_until_ready(out)
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(iters):
            out = fn(*args)
        np.asarray(jax.device_get(out))
        best = min(best, (time.perf_counter() - t0) / (iters * K))
    return best


def main():
    print("devices:", jax.devices())
    rs = np.random.RandomState(0)

    n = 4096
    a_f = jnp.asarray(rs.randn(n, n), jnp.bfloat16)
    b_f = jnp.asarray(rs.randn(n, n), jnp.bfloat16)
    a_i = jnp.asarray(rs.randint(-4, 4, (n, n)), jnp.int8)
    b_i = jnp.asarray(rs.randint(-4, 4, (n, n)), jnp.int8)

    mm_f = chain(lambda a, b: jnp.dot(a, b), lambda a, c: a + c)
    mm_i = chain(
        lambda a, b: jax.lax.dot_general(
            a, b, (((1,), (0,)), ((), ())), preferred_element_type=jnp.int32
        ),
        lambda a, c: a + c,
    )
    flops = 2 * n**3
    t = timeit(mm_f, a_f, b_f)
    print(f"matmul {n}^3 bf16 : {t*1e3:8.3f} ms  {flops/t/1e12:7.1f} TFLOP/s")
    t = timeit(mm_i, a_i, b_i)
    print(f"matmul {n}^3 int8 : {t*1e3:8.3f} ms  {flops/t/1e12:7.1f} TOP/s")

    b, h, w, c = 32, 64, 64, 256
    x_f = jnp.asarray(rs.randn(b, h, w, c), jnp.bfloat16)
    k_f = jnp.asarray(rs.randn(3, 3, c, c), jnp.bfloat16)
    x_i = jnp.asarray(rs.randint(-4, 4, (b, h, w, c)), jnp.int8)
    k_i = jnp.asarray(rs.randint(-4, 4, (3, 3, c, c)), jnp.int8)

    def conv(pet):
        return lambda x, k: jax.lax.conv_general_dilated(
            x, k, (1, 1), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=pet,
        )

    cflops = 2 * b * h * w * c * c * 9
    t = timeit(chain(conv(jnp.float32), lambda a, c: a + c), x_f, k_f)
    print(f"conv3x3 256 bf16  : {t*1e3:8.3f} ms  {cflops/t/1e12:7.1f} TFLOP/s")
    t = timeit(chain(conv(jnp.int32), lambda a, c: a + c), x_i, k_i)
    print(f"conv3x3 256 int8  : {t*1e3:8.3f} ms  {cflops/t/1e12:7.1f} TOP/s")

    # Apples-to-apples: both variants end in a bf16 epilogue, so the
    # carry-reduction cost (one HBM pass over a bf16 y) is identical and
    # the delta is pure MXU rate.
    def conv_deq(x, k):
        y = conv(jnp.int32)(x, k)
        return (y.astype(jnp.float32) * 2e-4).astype(jnp.bfloat16)

    def conv_scale(x, k):
        y = conv(jnp.float32)(x, k)
        return (y * 2e-4).astype(jnp.bfloat16)

    t = timeit(chain(conv_scale, lambda a, c: a + c), x_f, k_f)
    print(f"conv3x3 bf16+scale: {t*1e3:8.3f} ms  {cflops/t/1e12:7.1f} TFLOP/s")
    t = timeit(chain(conv_deq, lambda a, c: a + c), x_i, k_i)
    print(f"conv3x3 int8+deq  : {t*1e3:8.3f} ms  {cflops/t/1e12:7.1f} TOP/s")

    # and the matmul pair
    def mm_deq(a, b):
        y = jax.lax.dot_general(a, b, (((1,), (0,)), ((), ())),
                                preferred_element_type=jnp.int32)
        return (y.astype(jnp.float32) * 2e-4).astype(jnp.bfloat16)

    def mm_scale(a, b):
        y = jax.lax.dot_general(a, b, (((1,), (0,)), ((), ())),
                                preferred_element_type=jnp.float32)
        return (y * 2e-4).astype(jnp.bfloat16)

    t = timeit(chain(mm_scale, lambda a, c: a + c), a_f, b_f)
    print(f"matmul bf16+scale : {t*1e3:8.3f} ms  {flops/t/1e12:7.1f} TFLOP/s")
    t = timeit(chain(mm_deq, lambda a, c: a + c), a_i, b_i)
    print(f"matmul int8+deq   : {t*1e3:8.3f} ms  {flops/t/1e12:7.1f} TOP/s")


if __name__ == "__main__":
    main()
