"""Measure bare lax.scan per-iteration overhead on the chip.

docs/PERF.md r2 attributes ~1.9 ms/iteration to 'scan overhead' even for
an empty body. If that number is real it caps the orbit bench at ~500 fps
regardless of kernel speed; if it was a profiling artifact the serving
budget has ~1.9 ms/frame unaccounted. Three scans, 128 iterations each:
empty carry, carry + small vector op, carry + one 512^2 image sum.

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


def timed(fn, *args, iters=4):
    fn(*args)  # compile + warm
    t0 = time.perf_counter()
    for _ in range(iters):
        float(fn(*args))
    return (time.perf_counter() - t0) / iters


def main():
    N = 128

    @jax.jit
    def empty(x):
        def body(c, i):
            return c + 1.0, None
        c, _ = lax.scan(body, x, jnp.arange(N, dtype=jnp.float32))
        return c

    @jax.jit
    def small(x, v):
        def body(c, i):
            return c + jnp.sum(v * i), None
        c, _ = lax.scan(body, x, jnp.arange(N, dtype=jnp.float32))
        return c

    @jax.jit
    def image(x, img):
        def body(c, i):
            return c + jnp.sum(img * i), None
        c, _ = lax.scan(body, x, jnp.arange(N, dtype=jnp.float32))
        return c

    v = jnp.ones((1024,), jnp.float32)
    img = jnp.ones((3, 512, 512), jnp.float32)
    for name, t in (("empty", timed(empty, 0.0)),
                    ("small", timed(small, 0.0, v)),
                    ("image-sum", timed(image, 0.0, img))):
        print(f"{name:<10} {t * 1e3:8.2f} ms total  "
              f"{t * 1e6 / N:8.1f} us/iteration")


if __name__ == "__main__":
    main()
