"""Measure bare lax.scan per-iteration overhead on the chip.

docs/PERF.md r2 attributes ~1.9 ms/iteration to 'scan overhead' even for
an empty body. If that number is real it caps the orbit bench at ~500 fps
regardless of kernel speed; if it was a profiling artifact the serving
budget has ~1.9 ms/frame unaccounted.

Method: each body is timed at TWO scan lengths (N and 4N) inside one jit
each; the MARGINAL cost (t4N - tN) / 3N cancels the per-dispatch tunnel
latency (~30-40 ms/call in this environment), which would otherwise
masquerade as per-iteration cost. Bodies: empty carry, carry + small
vector op, carry + one 512² image sum.

Usage: python scripts/bench_scan_overhead.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax


def timed(fn, *args, iters=8):
    fn(*args)  # compile + warm
    t0 = time.perf_counter()
    for _ in range(iters):
        float(fn(*args))
    return (time.perf_counter() - t0) / iters


def make(body_fn, n):
    @jax.jit
    def run(x, *extra):
        def body(c, i):
            return body_fn(c, i, *extra), None
        c, _ = lax.scan(body, x, jnp.arange(n, dtype=jnp.float32))
        return c
    return run


def main():
    N = 128
    v = jnp.ones((1024,), jnp.float32)
    img = jnp.ones((3, 512, 512), jnp.float32)

    cases = (
        ("empty", lambda c, i: c + 1.0, ()),
        ("small", lambda c, i, vv: c + jnp.sum(vv * i), (v,)),
        ("image-sum", lambda c, i, im: c + jnp.sum(im * i), (img,)),
    )
    for name, body, extra in cases:
        t1 = timed(make(body, N), 0.0, *extra)
        t4 = timed(make(body, 4 * N), 0.0, *extra)
        marginal = (t4 - t1) / (3 * N)
        print(f"{name:<10} N={N}: {t1 * 1e3:8.2f} ms  "
              f"4N: {t4 * 1e3:8.2f} ms  "
              f"marginal {marginal * 1e6:8.1f} us/iteration")


if __name__ == "__main__":
    main()
