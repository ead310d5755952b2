"""Measure the donation win on the real chip: XLA memory analysis of a
wide-MLP adam step compiled with and without donated training state."""

import numpy as np

import tensor_ops_tpu as T
from tensor_ops_tpu.backend.rng import Rng
from tensor_ops_tpu.models import act_logistic, act_softmax, cross_entropy, gen_net
from tensor_ops_tpu.models.optim import adam
from tensor_ops_tpu.models.trainer import make_opt_step

be = T.JaxBackend(dtype=np.float32)
W, B, O = 4096, 4096, 16
net = gen_net(be, W, O, [(W, act_logistic()), (W, act_logistic())],
              act_softmax(), Rng(be, seed=0))
X = np.random.default_rng(0).uniform(-1, 1, size=(B, W)).astype(np.float32)
Y = np.eye(O, dtype=np.float32)[np.random.default_rng(1).integers(0, O, B)]
xb, yb = be.asarray(X), be.asarray(Y)
opt = adam()

for donate in (False, True):
    step = make_opt_step(net, cross_entropy(O), be, opt, donate=donate)
    o0 = opt.init(net.params)
    import jax.numpy as jnp
    p0 = tuple(jnp.copy(p) for p in net.params)
    lowered = step.lower(0.05, xb, yb, o0, p0)
    ma = lowered.compile().memory_analysis()
    print(f"donate={donate}:")
    vals = {}
    for f in ("argument_size_in_bytes", "output_size_in_bytes",
              "temp_size_in_bytes", "alias_size_in_bytes",
              "generated_code_size_in_bytes"):
        v = getattr(ma, f, None)
        vals[f] = v
        if v is not None:
            print(f"  {f}: {v/1e6:.1f} MB")
    need = ("argument_size_in_bytes", "output_size_in_bytes",
            "temp_size_in_bytes", "alias_size_in_bytes")
    if all(vals[f] is not None for f in need):
        tot = (vals["argument_size_in_bytes"] + vals["output_size_in_bytes"]
               + vals["temp_size_in_bytes"] - vals["alias_size_in_bytes"])
        print(f"  peak program footprint (arg+out+temp-alias): "
              f"{tot/1e6:.1f} MB")
    else:
        print("  (total skipped: backend memory_analysis lacks some fields)")
