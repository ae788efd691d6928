"""One process of the 2-process multi-host test (run by test_multihost.py).

Usage: python multihost_worker.py <port> <process_id>

Each process owns ONE CPU device; jax.distributed.initialize stitches them
into a 2-device global platform with gloo cross-process collectives — the
CPU stand-in for a 2-host TPU deployment (BASELINE config #5,
parallel/multihost.py).  The worker runs a TP=2 packed (3-bit) forward and
a cached prefill+decode step through shard_map across the PROCESS
boundary and checks both against the local single-device reference.
"""

import os
import sys

port, pid = sys.argv[1], int(sys.argv[2])
os.environ["JAX_PLATFORMS"] = "cpu"
# exactly one local device per process — the multihost point
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=1"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_cpu_collectives_implementation", "gloo")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from owq_tpu.parallel.multihost import initialize, is_primary, pod_mesh  # noqa: E402

initialize(f"localhost:{port}", num_processes=2, process_id=pid)
assert jax.process_count() == 2, jax.process_count()
assert jax.device_count() == 2, jax.device_count()
assert jax.local_device_count() == 1
assert is_primary() == (pid == 0)

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

from owq_tpu.models.synthetic import build_synthetic, synthetic_config  # noqa: E402
from owq_tpu.models.transformer import forward  # noqa: E402
from owq_tpu.parallel.partition import (make_tp_decode, make_tp_forward,  # noqa: E402
                                        place_params, shard_model_tp)

cfg = synthetic_config("llama-tiny", max_pos=64)
params = build_synthetic(cfg, bits=3, dtype=jnp.float32)

rng = np.random.default_rng(0)
ids = rng.integers(0, cfg.vocab_size, size=(1, 16)).astype(np.int32)

# local single-device reference (identical on both processes — the build is
# deterministic)
ref, _ = forward(params, cfg, jnp.asarray(ids), dtype=jnp.float32)
ref = np.asarray(ref)

mesh = pod_mesh(dp=1, tp=2)
import copy  # noqa: E402

params_tp, _ = shard_model_tp(copy.deepcopy(params), cfg, 2)
params_tp = place_params(params_tp, mesh, cfg)

# --- TP forward across the process boundary ---
fwd = make_tp_forward(mesh, cfg, params_tp, kernel="xla", dtype=jnp.float32)
out = fwd(params_tp, jnp.asarray(ids))
np.testing.assert_allclose(np.asarray(out), ref, rtol=2e-4, atol=2e-4)

# --- TP cached prefill + decode step (the serving hot path) ---
step, make_cache = make_tp_decode(mesh, cfg, params_tp, kernel="xla",
                                  dtype=jnp.float32)
cache = make_cache(1, 32, cache_dtype=jnp.float32)
_, cache = step(params_tp, jnp.asarray(ids[:, :15]), cache)
logits, cache = step(params_tp, jnp.asarray(ids[:, 15:16]), cache)
np.testing.assert_allclose(np.asarray(logits)[0], ref[0, -1],
                           rtol=2e-4, atol=2e-4)

# --- continuous-batching Engine across the process boundary ---------------
# (VERDICT r4 item 8: the closest this rig gets to BASELINE #6's multi-host
# serving claim.)  Both processes run the identical host-side slot
# bookkeeping on seeded-identical prompts; prefill / slot insert / windowed
# decode all shard_map over the 2-process mesh with gloo collectives, and
# the greedy outputs must match a local single-device decode exactly.
from owq_tpu.runtime.batching import Engine  # noqa: E402
from owq_tpu.runtime.generate import generate  # noqa: E402

prompts = [rng.integers(0, cfg.vocab_size, size=(n,)).astype(np.int32)
           for n in (9, 5, 3)]
want = [generate(params, cfg, p[None, :], 5, max_len=48,
                 cache_dtype=jnp.float32)[0].tolist() for p in prompts]
eng = Engine(copy.deepcopy(params), cfg, max_batch=2, max_len=48,
             kernel="xla", cache_dtype=jnp.float32,
             compute_dtype=jnp.float32, prompt_buckets=(16,), mesh=mesh)
out = eng.run(prompts, max_new_tokens=5)
assert [out[i] for i in sorted(out)] == want, (out, want)
print(f"MULTIHOST_ENGINE_OK {pid}", flush=True)

print(f"MULTIHOST_OK {pid}", flush=True)
