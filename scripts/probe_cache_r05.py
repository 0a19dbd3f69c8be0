"""Round-5 chip probe: is the persistent compile cache warm for the MSM
engines?  Times first vs second call of pair/scan at 2^14 so the round's
chip-job queue can be budgeted (r4 measured ~25-50 min per cold pair
compile through the axon tunnel)."""

import os
import sys
import time

_root = os.path.abspath(os.path.join(os.path.dirname(__file__), ".."))
sys.path.insert(0, _root)
sys.path.insert(0, os.path.join(_root, "scripts"))

t0 = time.time()
import jax  # noqa: E402

from tpu_ec.curves.params import BLS12_381_G1  # noqa: E402
from tpu_ec.ops.msm import MultiexpKernel  # noqa: E402
from tpu_ec.utils.cache import enable_compilation_cache  # noqa: E402

print(f"imports: {time.time()-t0:.1f}s", flush=True)

t0 = time.time()
from bench_msm_tpu import gen_inputs  # noqa: E402

bases, scalars, aff, s_u64 = gen_inputs(1 << 14, seed=14)
print(f"gen_inputs 2^14: {time.time()-t0:.1f}s", flush=True)

enable_compilation_cache()
kern = MultiexpKernel(BLS12_381_G1)

for method in ("pair", "scan"):
    t0 = time.time()
    out = kern.multiexp(bases, scalars, method=method)
    jax.block_until_ready(jax.tree_util.tree_leaves(out)[0])
    print(f"{method} 2^14 first call: {time.time()-t0:.1f}s", flush=True)
    t0 = time.time()
    out = kern.multiexp(bases, scalars, method=method)
    jax.block_until_ready(jax.tree_util.tree_leaves(out)[0])
    print(f"{method} 2^14 second call: {time.time()-t0:.3f}s", flush=True)
print("probe done", flush=True)
