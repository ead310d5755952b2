"""Capacity demo: a BPTT workload whose carry tape exceeds the v5e's
16GB HBM (B=1024 x n=1024 x h=4096 f32 = 17.2GB) — expected to
RESOURCE_EXHAUST on-device and run with offload_activations."""
import sys, os, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np
import jax, jax.numpy as jnp

from tensor_ops_tpu.backend.jax_backend import JaxBackend
from tensor_ops_tpu.backend.rng import Rng
from tensor_ops_tpu.models import act_logistic, squared_error
from tensor_ops_tpu.models.recurrent import gen_net as gen_rnet
from tensor_ops_tpu.ops import ir

be = JaxBackend(dtype=jnp.float32)
B, n, h, io = 1024, 1024, 4096, 64
net = gen_rnet(be, io, io, [(h, act_logistic(), act_logistic())],
               act_logistic(), None, Rng(be, seed=0))
loss = squared_error(io)
r = np.random.default_rng(1)
xs = be.asarray(r.uniform(-1, 1, size=(B, n, io)).astype(np.float32))
ts = be.asarray(r.uniform(-1, 1, size=(B, n, io)).astype(np.float32))
k = len(net.states)

def run(off):
    g = net._seq_graph(loss, n, offload_tape=off)
    def one(x, t, *sp):
        grads = ir.grad(g, be, (x,) + sp + (t,))
        return grads[1:-1]  # state+param grads only (dxs dead -> DCE'd)
    vm = jax.vmap(one, in_axes=(0, 0) + (None,) * (k + len(net.params)))
    def step(xb, tb, states, params):
        grads = vm(xb, tb, *states, *params)
        return tuple(jnp.mean(gr, axis=0) for gr in grads)
    fn = jax.jit(step)
    t0 = time.perf_counter()
    out = fn(xs, ts, net.states, net.params)
    jax.block_until_ready(out)
    return time.perf_counter() - t0

try:
    dt = run(False)
    print(f"[{time.perf_counter():.0f}s] on-device tape: RAN anyway in {dt:.1f}s (unexpected)")
except Exception as e:
    msg = str(e).replace("\n", " ")[:160]
    print(f"[{time.perf_counter():.0f}s] on-device tape: {type(e).__name__}: {msg}")

try:
    dt = run(True)
    print(f"[{time.perf_counter():.0f}s] host-streamed tape: one vmapped grad step in {dt:.1f}s "
          f"(first call incl. compile)")
    # steady-state
    import time as _t
    g = None
except Exception as e:
    msg = str(e).replace("\n", " ")[:200]
    print(f"[{time.perf_counter():.0f}s] host-streamed tape FAILED: {type(e).__name__}: {msg}")
