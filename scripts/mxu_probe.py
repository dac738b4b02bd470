"""Probe MXU cost granularity on the real TPU: time [M,K]@[K,N] bf16 matmuls
inside a Pallas kernel loop for varying M, to calibrate the windowed-kernel
cost model (is cost ~ ceil(M/128) or ~ M/8?)."""

import time

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def make_bench(M, K, N, iters):
    # a is [8*M, K]; each iteration slices a different M-row panel so the dot
    # cannot be hoisted out of the loop (8 independent slices -> throughput,
    # not latency-chain)
    def kernel(a_ref, b_ref, o_ref):
        acc = jnp.zeros((M, N), jnp.float32)

        def body(i, acc):
            a = a_ref[pl.ds((i % 8) * M, M), :]
            return acc + jax.lax.dot_general(
                a, b_ref[:], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )

        acc = jax.lax.fori_loop(0, iters, body, acc)
        o_ref[:] = acc

    @jax.jit
    def run(a, b):
        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((M, N), jnp.float32),
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )(a, b)

    return run


def main():
    ITERS = 200000
    K, N = 128, 768
    print(f"K={K} N={N} iters={ITERS} dtype=bfloat16")
    for M in (8, 16, 32, 64, 128, 144, 192, 256):
        a = jnp.ones((8 * M, K), jnp.bfloat16)
        b = jnp.ones((K, N), jnp.bfloat16)
        f = make_bench(M, K, N, ITERS)
        jax.block_until_ready(f(a, b))
        t0 = time.perf_counter()
        for _ in range(3):
            out = f(a, b)
        jax.block_until_ready(out)
        dt = (time.perf_counter() - t0) / 3 / ITERS
        macs = M * K * N
        print(
            f"M={M:4d}: {dt*1e9:8.1f} ns/matmul  {macs/dt/1e12:7.2f} TMAC/s  "
            f"ns/Mrow={dt*1e9/M:6.2f}"
        )


if __name__ == "__main__":
    main()
