"""Run the tile autotuner on the real chip for the three bench kernels
(VERDICT round-3 item 6 'done' gate): fused matmul roofline
(bf16 4096x4096, save_z=False), deep-sweep training layer
(bf16 4096x4096, save_z=True), and the flagship megakernel
(f32 784/300/100/10 @ 8192).  Persists winners to the default on-disk
cache so bench.py consumes them via the pick_tiles hit path."""
import json
import time

import jax.numpy as jnp

from tensor_ops_tpu.ops.autotune import (autotune_linear,
                                         autotune_mlp_train_step,
                                         default_cache_path)
from tensor_ops_tpu.ops.pallas_kernels import pick_tiles

print("cache:", default_cache_path())

t0 = time.time()
print("== fused matmul roofline: linear 4096x4096 bf16 relu (no z) ==")
print("  heuristic:", pick_tiles(4096, 4096, 4096, False, jnp.bfloat16))
best = autotune_linear(4096, 4096, 4096, save_z=False, dtype=jnp.bfloat16,
                       act="relu", verbose=True)
print("  winner:", best, f"({time.time()-t0:.0f}s)")

t0 = time.time()
print("== deep-sweep layer: linear 4096x4096 bf16 relu (save_z) ==")
print("  heuristic:", pick_tiles(4096, 4096, 4096, True, jnp.bfloat16))
best = autotune_linear(4096, 4096, 4096, save_z=True, dtype=jnp.bfloat16,
                       act="relu", verbose=True)
print("  winner:", best, f"({time.time()-t0:.0f}s)")

t0 = time.time()
print("== megakernel: fused_mlp_train_step 784/300/100/10 @ 8192 ==")
best = autotune_mlp_train_step(8192, [784, 300, 100, 10],
                               ["logistic", "logistic", "identity"],
                               lr=0.02, verbose=True)
print("  winner block_b:", best, f"({time.time()-t0:.0f}s)")

print(json.dumps(json.load(open(default_cache_path())), indent=1))
