"""Scan tape offload on the real chip: XLA-reported memory + step time
for a long-sequence Elman BPTT gradient, on-device tape vs host-streamed
tape (f32)."""
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
h, n = 2048, 1024   # tape = n*h*4B = 8 MB per sequence
net = gen_rnet(be, h, h, [(h, act_logistic(), act_logistic())],
               act_logistic(), None, Rng(be, seed=0))
loss = squared_error(h)
r = np.random.default_rng(1)
xs = be.asarray(r.uniform(-1, 1, size=(n, h)).astype(np.float32))
ts = be.asarray(r.uniform(-1, 1, size=(n, h)).astype(np.float32))
args = (xs,) + net.states + net.params + (ts,)

def report(tag, off, remat):
    g = net._seq_graph(loss, n, remat_every=remat, offload_tape=off)
    fn = jax.jit(lambda *a: ir.grad(g, be, a))
    lowered = fn.lower(*args)
    comp = lowered.compile()
    ma = comp.memory_analysis()
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    N = 20
    for _ in range(N):
        out = fn(*args)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / N
    print(f"{tag}: temp {ma.temp_size_in_bytes/1e6:.1f} MB, "
          f"argout {(ma.argument_size_in_bytes+ma.output_size_in_bytes)/1e6:.1f} MB, "
          f"{dt*1e3:.2f} ms/step")

report("tape on-device, no remat ", False, None)
report("tape host-streamed, none ", True, None)
report("tape on-device, remat=32 ", False, 32)
report("tape host-streamed, r=32 ", True, 32)
