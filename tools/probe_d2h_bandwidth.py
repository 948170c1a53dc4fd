"""Device->host transfer probe on axon: does issuing multiple pulls
concurrently (copy_to_host_async, or a thread pool) beat the serial
per-leaf np.asarray the host_staged checkpoint save uses?

Context: at stage-3 geometry the per-save pull blocks the train loop for
~410 s (~10 GB => ~25 MB/s). If transfers pipeline, the Checkpointer can
overlap them; if not, the tunnel bandwidth is the wall and only byte
reduction helps (partition-aware saves already cut ~5.3 GB)."""
import sys, pathlib, time
sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))
from concurrent.futures import ThreadPoolExecutor

import jax
import jax.numpy as jnp
import numpy as np

N_ARR, MB = 8, 64
shape = (MB * 1024 * 1024 // 2 // 128, 128)  # bf16 => MB each


def fresh_arrays(seed):
    # distinct values each trial: identical (executable, inputs) pairs can
    # be served from the axon relay cache (CLAUDE.md)
    key = jax.random.PRNGKey(seed)
    xs = [
        jax.random.normal(jax.random.fold_in(key, i), shape, jnp.bfloat16)
        for i in range(N_ARR)
    ]
    jax.block_until_ready(xs)
    # hard-sync: axon block_until_ready can return early
    for x in xs:
        float(x[0, 0].astype(jnp.float32))
    return xs


def timed(name, fn, seed):
    xs = fresh_arrays(seed)
    t0 = time.perf_counter()
    out = fn(xs)
    dt = time.perf_counter() - t0
    tot = sum(o.nbytes for o in out) / 1e6
    print(f"{name:30s} {dt:7.2f} s   {tot / dt:8.1f} MB/s")
    return dt


def serial(xs):
    return [np.asarray(x) for x in xs]


def async_then_read(xs):
    for x in xs:
        try:
            x.copy_to_host_async()
        except Exception as e:
            print("  (copy_to_host_async unsupported:", e, ")")
            break
    return [np.asarray(x) for x in xs]


def threaded(n):
    def run(xs):
        with ThreadPoolExecutor(n) as ex:
            return list(ex.map(np.asarray, xs))
    return run


if __name__ == "__main__":
    print(f"{N_ARR} x {MB} MB bf16 arrays, platform={jax.devices()[0].platform}")
    timed("serial np.asarray", serial, 0)
    timed("copy_to_host_async + read", async_then_read, 1)
    timed("thread pool x2", threaded(2), 2)
    timed("thread pool x4", threaded(4), 3)
    timed("thread pool x8", threaded(8), 4)
    # second serial pass guards against warmup effects ordering the result
    timed("serial np.asarray (again)", serial, 5)
