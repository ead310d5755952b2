"""Probe: can lax.scan emit per-step outputs into pinned-host memory
(forward) and slice them back per-step (backward) on this TPU/JAX?"""
import sys, os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np
import jax
import jax.numpy as jnp

Host = jax.memory.Space.Host
Dev = jax.memory.Space.Device

n, d = 16, 8
W = jnp.asarray(np.random.default_rng(0).normal(size=(d, d)) * 0.3, jnp.float32)
xs = jnp.asarray(np.random.default_rng(1).normal(size=(n, d)), jnp.float32)
s0 = jnp.zeros((d,), jnp.float32)

def fwd_plain(W, s0, xs):
    def f(c, x):
        nc = jnp.tanh(W @ c + x)
        return nc, c  # emit carry-in
    s_fin, carries = jax.lax.scan(f, s0, xs)
    return s_fin, carries

def fwd_offload(W, s0, xs):
    def f(c, x):
        nc = jnp.tanh(W @ c + x)
        return nc, jax.device_put(c, Host)  # emit carry-in TO HOST
    s_fin, carries = jax.lax.scan(f, s0, xs)
    return s_fin, carries

def bwd_stream(W, carries, g):
    # scan over host-resident carries, device_put each slice back
    def f(ct, scanned):
        c_host, = scanned
        c = jax.device_put(c_host, Dev)
        z = W @ c
        dz = (1 - jnp.tanh(z) ** 2)  # not the real vjp; just structure
        return ct + dz.sum() * 0, c * 0 + ct
    out = jax.lax.scan(f, 0.0, (carries,), reverse=True)
    return out[0]

print("1) plain fwd:", jax.jit(fwd_plain)(W, s0, xs)[0].sum())
try:
    f2 = jax.jit(fwd_offload)
    s_fin, carries = f2(W, s0, xs)
    jax.block_until_ready(carries)
    print("2) fwd emit-to-host OK; carries memkind:", carries.sharding.memory_kind)
except Exception as e:
    print("2) fwd emit-to-host FAILED:", type(e).__name__, str(e)[:300])
    carries = None

if carries is not None:
    try:
        r = jax.jit(bwd_stream)(W, carries, 0.0)
        print("3) bwd stream-from-host OK:", float(r))
    except Exception as e:
        print("3) bwd stream FAILED:", type(e).__name__, str(e)[:300])

# 4) whole combined program: fwd emit-to-host + bwd stream in ONE jit
def combined(W, s0, xs):
    s_fin, carries = fwd_offload(W, s0, xs)
    return s_fin.sum() + bwd_stream(W, carries, 0.0)
try:
    print("4) combined one-jit:", float(jax.jit(combined)(W, s0, xs)))
except Exception as e:
    print("4) combined FAILED:", type(e).__name__, str(e)[:300])
