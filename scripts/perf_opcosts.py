"""Trusted in-jit op costs: each op repeated R times inside ONE jit via
fori_loop with data dependence (so XLA can't hoist/DCE), minus an empty-loop
baseline. Avoids the ~1.7 ms per-dispatch floor of the axon tunnel that
poisons single-op timings (see memory: axon-tpu-measurement-discipline).

Run alone on the chip: python scripts/perf_opcosts.py
"""
import sys
import time
from functools import partial
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))

import jax

jax.config.update("jax_compilation_cache_dir", str(Path(__file__).parent.parent / ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp
import numpy as np

R = 16


def bench_loop(name, body, init, iters=10):
    """body: (i, carry) -> carry with the op inside; carry keeps data deps."""
    f = jax.jit(lambda c: jax.lax.fori_loop(0, R, body, c))
    c = jax.block_until_ready(f(init))  # compile
    t0 = time.perf_counter()
    for _ in range(iters):
        c = f(c)
    jax.block_until_ready(c)
    per_call = (time.perf_counter() - t0) / iters
    print(f"{name}: {(per_call) / R * 1e3:.3f} ms/op  (call {per_call*1e3:.2f} ms)", flush=True)


def main():
    rng = np.random.default_rng(0)
    M16 = 1_600_000
    M4 = 400_000
    keys = jnp.asarray(rng.integers(0, 6e7, M16, dtype=np.int32))
    keys4 = jnp.asarray(rng.integers(0, 6e7, M4, dtype=np.int32))
    gid = jnp.asarray(rng.integers(0, 100_000, M16, dtype=np.int32))
    idx4 = jnp.asarray(rng.permutation(M4).astype(np.int32))
    idx64 = jnp.asarray(rng.integers(0, 640_000, 640_000, dtype=np.int32))
    rows = jnp.asarray(rng.normal(size=(640_000, 16)).astype(np.float32))
    rows4 = jnp.asarray(rng.normal(size=(M4, 10)).astype(np.float32))
    offs = jnp.sort(jnp.asarray(rng.integers(0, M4, 100_000, dtype=np.int32)))

    # baseline: empty loop with a trivial carry op
    bench_loop("baseline add", lambda i, c: c + 1, keys4)

    bench_loop("sort 1-op 1.6M", lambda i, c: jax.lax.sort(c + i), keys)
    bench_loop(
        "sort 2-op 1.6M",
        lambda i, c: jax.lax.sort((c[0] + i, c[1]), num_keys=1),
        (keys, gid),
    )
    bench_loop("sort 1-op 400k", lambda i, c: jax.lax.sort(c + i), keys4)
    bench_loop("argsort 100k", lambda i, c: jnp.argsort(c + i).astype(jnp.int32), jnp.asarray(rng.integers(0, 1 << 30, 100_000, dtype=np.int32)))

    bench_loop("gather scalar 400k", lambda i, c: (c[0], c[0][(c[1] + i) % M4]), (keys4, idx4))
    bench_loop(
        "gather scalar 1.6M",
        lambda i, c: (c[0], c[0][(c[1] + i) % M16]),
        (keys, jnp.asarray(rng.permutation(M16).astype(np.int32))),
    )
    bench_loop(
        "row gather 640k x16f",
        lambda i, c: (jnp.roll(c[0], 1, 0), c[1], c[0][c[1]]),
        (rows, idx64, rows),
    )
    bench_loop(
        "row scatter-add 640k x16f",
        lambda i, c: (c[0], c[1], jnp.zeros((100_000, 16)).at[c[1] % 100_000].add(c[0] + i)),
        (rows, idx64, jnp.zeros((100_000, 16))),
    )
    bench_loop(
        "row scatter unique-perm 640k x16f",
        lambda i, c: (
            c[0], c[1],
            jnp.zeros((640_000, 16)).at[c[1]].set(c[0] + i, unique_indices=True, mode="drop"),
        ),
        (rows, jnp.asarray(rng.permutation(640_000).astype(np.int32)), jnp.zeros((640_000, 16))),
    )
    bench_loop("cumsum 400k i32", lambda i, c: jnp.cumsum(c + i), keys4)
    bench_loop("cummax 400k i32", lambda i, c: jax.lax.cummax(c + i), keys4)
    bench_loop("cumsum rows 400k x10f", lambda i, c: jnp.cumsum(c + i, axis=0), rows4)
    bench_loop(
        "scatter ones 100k->400k",
        lambda i, c: (c[0], jnp.zeros(M4 + 1, jnp.int32).at[(c[0] + i) % M4].add(1)),
        (offs, jnp.zeros(M4 + 1, jnp.int32)),
    )
    # the K=16 padded key build (elementwise over (16, N))
    lox = jnp.asarray(rng.integers(0, 24, 100_000, dtype=np.int32))
    bench_loop(
        "(16,N) keybuild elementwise",
        lambda i, c: (c[0], (c[0][None, :] + jnp.arange(16, dtype=jnp.int32)[:, None] * 25 + i).reshape(-1)),
        (lox, keys),
    )


if __name__ == "__main__":
    main()
