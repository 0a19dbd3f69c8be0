"""TPU: digit-matmul NTT correctness + throughput (vs 1e8 elem/s SOL)."""
import os as _os, sys as _sys

_sys.path.insert(0, _os.path.abspath(_os.path.join(_os.path.dirname(__file__), "..")))
import random
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

from tpu_ec.fields import BLS12_381_FR, field_ops
from tpu_ec.ops.ntt import ntt_ref
from tpu_ec.ops.ntt_digit import digit_consts, digit_ntt_planes, get_digit_domain
from tpu_ec.utils.measure import timeit

spec = BLS12_381_FR
f = field_ops(spec)
leaf = int(sys.argv[1]) if len(sys.argv) > 1 else 7
sizes = [int(s) for s in sys.argv[2:]] or [20]

# correctness gate at 2^12 on chip
log_c = 12
dom = get_digit_domain(spec, log_c, False, min(leaf, log_c))
consts = jax.tree_util.tree_map(jax.device_put, digit_consts(dom))
fn = jax.jit(lambda xp, c: digit_ntt_planes(spec, xp, leaf=min(leaf, log_c), consts=c))
r = random.Random(9)
vals = [r.randrange(spec.modulus) for _ in range(1 << log_c)]
x = f.from_ints(vals)
xp = jnp.swapaxes(x, 0, 1)
t0 = time.perf_counter()
y = fn(xp, consts)
ok = f.to_ints(jnp.swapaxes(y, 0, 1)) == ntt_ref(spec, vals)
print(f"digit NTT leaf={leaf} 2^{log_c} bit-exact={ok} ({time.perf_counter()-t0:.1f}s)", flush=True)
assert ok

for log_n in sizes:
    n = 1 << log_n
    dom = get_digit_domain(spec, log_n, False, leaf)
    consts = jax.tree_util.tree_map(jax.device_put, digit_consts(dom))
    fn = jax.jit(lambda xp, c: digit_ntt_planes(spec, xp, leaf=leaf, consts=c))
    rng = np.random.default_rng(5)
    xp = jnp.asarray(rng.integers(0, 1 << 16, (f.L, n), dtype=np.uint32))
    if log_n >= 25:
        # near the HBM limit the tunnel does not return a finished run's
        # buffers fast enough for a second dispatch: compile without
        # executing, then time exactly ONE execution
        from tpu_ec.utils.measure import hard_sync

        t0 = time.perf_counter()
        compiled = fn.lower(xp, consts).compile()
        print(f"  compile 2^{log_n}: {time.perf_counter()-t0:.1f}s", flush=True)
        t0 = time.perf_counter()
        out = compiled(xp, consts)
        hard_sync(out)
        dt = time.perf_counter() - t0
    else:
        t0 = time.perf_counter()
        y = fn(xp, consts)
        jax.block_until_ready(y)
        print(f"  compile 2^{log_n}: {time.perf_counter()-t0:.1f}s", flush=True)
        dt = timeit(lambda a: fn(a, consts), xp, iters=5, warmup=1)
    print(
        f"  digit NTT leaf={leaf} 2^{log_n}: {n/dt/1e6:.2f} M elem/s "
        f"({dt*1e3:.1f} ms)  vs_SOL={n/dt/1e8:.2f}",
        flush=True,
    )
