"""Run the round-5 serving-kernel autotune sweeps on the real chip
(VERDICT r4 #4): fused_linear_w8 / fused_linear_w8a8 at the contested
serving shape (4096x4096, batch 16 — BENCH.md int8 section), the w8a8
megakernel's (block_o, block_k), and the Pallas Elman step's batch tile
at the BENCH.md recurrent shapes.

Persists winners to ~/.cache/tensor_ops_tpu/tiles.json under the keys
the kernels' trace-time probes read; print the sweep so BENCH.md can
record the delta (or the confirmed no-delta).

Run serially on the TPU:  python scratch/tune_serving.py
"""
from __future__ import annotations

import json
import sys

sys.path.insert(0, ".")

from tensor_ops_tpu.ops.autotune import (autotune_linear_w8,  # noqa: E402
                                         autotune_linear_w8a8,
                                         autotune_mlp_w8a8,
                                         autotune_rnn_step)

B, N, L = 16, 4096, 4  # the weight-streaming-bound serving shape

print("== fused_linear_w8 (int8 weights, f32 acts) 16x4096x4096 ==")
best = autotune_linear_w8(B, N, N, act="relu", verbose=True)
print(json.dumps({"linear_w8": best}), flush=True)

print("== fused_linear_w8a8 (int8 x int8 MXU) 16x4096x4096 ==")
best = autotune_linear_w8a8(B, N, N, act="relu", verbose=True)
print(json.dumps({"linear_w8a8": best}), flush=True)

print("== w8a8 megakernel (4 layers 4096^2, batch 16) ==")
best = autotune_mlp_w8a8(B, N, L, hidden_act="relu", verbose=True)
print(json.dumps({"mlp_w8a8": best}), flush=True)

for bb, hid in ((256, 256), (512, 1024), (1024, 2048)):
    print(f"== pallas Elman step B={bb} hidden={hid} ==")
    try:
        best = autotune_rnn_step(bb, hid, hid, verbose=True)
    except RuntimeError as e:
        # hidden=2048 f32: resident weights (32 MiB) exceed the ~16 MiB
        # scoped-VMEM limit under current libtpu — every candidate
        # rejects; the kernel now refuses the shape eagerly and
        # FusedRNN's default impl="xla" covers it (faster anyway).
        print(json.dumps({f"rnn_step_{bb}x{hid}": None,
                          "rejected": str(e)[:120]}), flush=True)
        continue
    print(json.dumps({f"rnn_step_{bb}x{hid}": best}), flush=True)

print("DONE")
