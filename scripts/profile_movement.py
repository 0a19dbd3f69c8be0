"""Data-movement primitive measurements for the MSM engine redesign.

All variants materialize their outputs (dependent on all inputs) and are
timed with a repeat-loop inside one jit so the ~28 ms axon dispatch
overhead amortizes.  Reports marginal ns/row.
"""
import os as _os, sys as _sys
_sys.path.insert(0, _os.path.abspath(_os.path.join(_os.path.dirname(__file__), "..")))

import functools
import numpy as np
import jax
import jax.numpy as jnp

from tpu_ec.utils.measure import timeit

N = 1 << 22
REPS = 4


def timed(name, jfn, args, rows, reps=REPS):
    out = jax.block_until_ready(jfn(*args))
    dt = timeit(lambda: jax.block_until_ready(jfn(*args)), iters=3, warmup=1)
    per = (dt - 0.0285) / reps / rows * 1e9  # subtract measured dispatch overhead
    print(f"{name:46s} {dt*1e3:9.2f} ms total  ~{per:7.2f} ns/row marginal")
    return out


def rep_loop(fn, reps=REPS):
    """Chain fn dependently reps times inside one jit."""
    @jax.jit
    def run(*args):
        x = args
        for _ in range(reps):
            x = fn(*x)
        return x
    return run


def main():
    rng = np.random.default_rng(0)
    key = jnp.asarray(rng.integers(0, 1 << 15, N, dtype=np.int32))
    idx = jnp.arange(N, dtype=jnp.int32)
    perm = jnp.asarray(rng.permutation(N).astype(np.int32))

    # 1. narrow sort (key, idx)
    def f_sort(k, i):
        k2, i2 = jax.lax.sort_key_val(k, i)
        return k2, i2 + 1
    timed("sort (key, idx)", rep_loop(f_sort), (key, idx), N)

    # 2. wide-payload sort: key + 48 u32 columns, all materialized
    data48 = jnp.asarray(rng.integers(0, 1 << 16, (N, 48), dtype=np.uint32))
    def f_wsort(k, d):
        outs = jax.lax.sort([k] + [d[:, j] for j in range(48)], num_keys=1)
        return outs[0] + 1, jnp.stack(outs[1:], axis=1)
    timed("sort + 48-col payload (materialized)", rep_loop(f_wsort), (key, data48), N)

    # 3. row gather variants
    def f_g48(d, p):
        return d[p] + 1, (p + 1) % N
    timed("gather rows (N,48)", rep_loop(f_g48), (data48, perm), N)

    data128 = jnp.asarray(rng.integers(0, 1 << 16, (N, 128), dtype=np.uint32))
    def f_g128(d, p):
        return d[p] + 1, (p + 1) % N
    timed("gather rows (N,128)", rep_loop(f_g128), (data128, perm), N)

    def f_gtake(d, p):
        return jnp.take(d, p, axis=0) + 1, (p + 1) % N
    timed("jnp.take rows (N,48)", rep_loop(f_gtake), (data48, perm), N)

    # 4. per-column loop gather (48 x 1-col gathers)
    def f_gcols(d, p):
        cols = [d[:, j][p] for j in range(48)]
        return jnp.stack(cols, axis=1) + 1, (p + 1) % N
    timed("48 x 1-col gathers", rep_loop(f_gcols), (data48, perm), N)

    # 5. monotone compaction gather: keep every other row (N/2 out)
    mono = jnp.asarray((np.arange(N // 2) * 2).astype(np.int32))
    def f_mono(d, p):
        return d[p] + 1, p
    jfn = rep_loop(f_mono)
    timed("monotone gather stride-2 (N/2 rows out)", jfn, (data48, mono), N // 2)

    # 6. one-hot int8 MXU gather, block-local: (512,1024) @ (1024,96B)
    #    emulate: blocks of 1024 rows -> 512 selected
    B_IN, B_OUT = 1024, 512
    nb = N // B_IN
    sel = jnp.asarray(rng.integers(0, B_IN, (nb, B_OUT), dtype=np.int32))
    bytes_ = jnp.asarray(rng.integers(0, 127, (nb, B_IN, 96), dtype=np.int8))
    def f_onehot(bts, s):
        oh = jax.nn.one_hot(s, B_IN, dtype=jnp.int8)  # (nb, B_OUT, B_IN)
        out = jax.lax.dot_general(
            oh, bts, (((2,), (1,)), ((0,), (0,))), preferred_element_type=jnp.int32
        )  # (nb, B_OUT, 96)
        return bts, (s + 1) % B_IN, out
    @jax.jit
    def run_onehot(bts, s):
        o = None
        for _ in range(REPS):
            bts, s, o = f_onehot(bts, s)
        return o
    out = jax.block_until_ready(run_onehot(bytes_, sel))
    dt = timeit(lambda: jax.block_until_ready(run_onehot(bytes_, sel)), iters=3, warmup=1)
    rows = nb * B_OUT
    print(f"{'one-hot int8 MXU block gather (1024->512)':46s} {dt*1e3:9.2f} ms total  ~{(dt-0.0285)/REPS/rows*1e9:7.2f} ns/row marginal")

    # 7. dynamic_slice chain (contiguous block moves, sanity)
    def f_slice(d, p):
        return jnp.concatenate([d[N // 2:], d[:N // 2]]) + 1, p
    timed("concat halves (pure copy)", rep_loop(f_slice), (data48, perm), N)


if __name__ == "__main__":
    main()
