"""Optimizers.

The reference knows only per-sample SGD (``p - r*g`` inline in
``trainNetwork``, ``FeedForward.hs:141-147``).  The rebuild keeps that as
the default and adds the standard accelerator-era updaters as pure
pytree-of-arrays transforms (jit-friendly, state threaded explicitly —
usable inside ``lax.fori_loop`` training loops)."""

from __future__ import annotations

from typing import Any, Callable, NamedTuple, Optional, Tuple

Params = Tuple[Any, ...]
Grads = Tuple[Any, ...]


class Optimizer(NamedTuple):
    """(init, update): update(state, params, grads, lr) -> (state, new_params).

    ``hyper`` is the structural identity of the update rule (the
    hyperparameters the factory closed over): two optimizers with equal
    (name, hyper) must compute identical updates, letting jit caches
    survive reconstruction (``fit(..., optimizer=adam())`` in a loop).
    Custom optimizers may leave it None to key caches by object identity."""

    init: Callable[[Params], Any]
    update: Callable[[Any, Params, Grads, float], Tuple[Any, Params]]
    name: str = "optimizer"
    hyper: Optional[tuple] = None
    # keep the batch gradients on the replicated run's layout under
    # ZeRO stages >= 2 (identical all-reduce summation order, at
    # all-reduce-instead-of-reduce-scatter cost and no gradient memory
    # sharding) — what quantized-moment optimizers set, whose block
    # thresholds amplify reduction-order epsilon
    # (adam8bit(exact_reduction=True))
    exact_reduction: bool = False

    def struct_key(self) -> tuple:
        if self.hyper is not None:
            return (self.name, self.hyper)
        return (self.name, "id", id(self.update))


def sgd() -> Optimizer:
    """Plain SGD — the reference's update rule."""

    def init(params):
        return ()

    def update(state, params, grads, lr):
        return (), tuple(p - lr * g for p, g in zip(params, grads))

    return Optimizer(init, update, "sgd", hyper=())


def momentum(beta: float = 0.9, nesterov: bool = False) -> Optimizer:
    def init(params):
        return tuple(p * 0 for p in params)

    def update(state, params, grads, lr):
        vel = tuple(beta * v + g for v, g in zip(state, grads))
        if nesterov:
            step = tuple(beta * v + g for v, g in zip(vel, grads))
        else:
            step = vel
        return vel, tuple(p - lr * s for p, s in zip(params, step))

    return Optimizer(init, update, "momentum", hyper=(beta, nesterov))


def _adam_impl(b1: float, b2: float, eps: float, weight_decay: float):
    """The one adam update both :func:`adam` and :func:`adamw` wrap —
    the bias-correction/step math lives exactly once.  ``weight_decay``
    is DECOUPLED (multiplies the parameter, never the moments); 0.0
    reproduces classic adam bit-for-bit (``x + 0.0*p == x`` for finite
    params)."""

    def init(params):
        return (
            0,
            tuple(p * 0 for p in params),
            tuple(p * 0 for p in params),
        )

    def update(state, params, grads, lr):
        t, m, v = state
        t = t + 1
        m = tuple(b1 * mi + (1 - b1) * g for mi, g in zip(m, grads))
        v = tuple(b2 * vi + (1 - b2) * g * g for vi, g in zip(v, grads))
        # bias correction
        mc = tuple(mi / (1 - b1**t) for mi in m)
        vc = tuple(vi / (1 - b2**t) for vi in v)
        new_params = tuple(
            p - lr * (mi / ((vi**0.5) + eps) + weight_decay * p)
            for p, mi, vi in zip(params, mc, vc)
        )
        return (t, m, v), new_params

    return init, update


def adam(b1: float = 0.9, b2: float = 0.999, eps: float = 1e-8) -> Optimizer:
    init, update = _adam_impl(b1, b2, eps, 0.0)
    return Optimizer(init, update, "adam", hyper=(b1, b2, eps))


def adamw(b1: float = 0.9, b2: float = 0.999, eps: float = 1e-8,
          weight_decay: float = 0.01) -> Optimizer:
    """AdamW — adam with DECOUPLED weight decay (Loshchilov & Hutter):
    the decay multiplies the parameter directly (``p -= lr*wd*p``)
    instead of entering the gradient/moment statistics, so the
    regularization strength is independent of the adaptive scaling.
    The production default for transformer-era training; ``adam()``
    stays the unregularized classic."""
    init, update = _adam_impl(b1, b2, eps, weight_decay)
    return Optimizer(init, update, "adamw", hyper=(b1, b2, eps,
                                                   weight_decay))


def adam8bit(b1: float = 0.9, b2: float = 0.999, eps: float = 1e-8,
             block: int = 256,
             stochastic_rounding: bool = False,
             exact_reduction: bool = False) -> Optimizer:
    """Adam with BLOCK-WISE 8-BIT moments (the bitsandbytes recipe,
    simplified to symmetric per-block absmax): m and v are stored as
    int8 with one f32 scale per ``block`` elements — 4x less optimizer
    HBM than f32 adam (8x vs f64), on top of whatever ZeRO-1 sharding
    divides.  The update dequantizes, steps in full precision, and
    requantizes; params stay full-precision masters, so only the
    moment HISTORY is approximate (~0.4% of block absmax per element).
    Deterministic — the crash/resume bit-exactness property holds —
    but NOT numerically identical to ``adam()``: convergence is the
    contract (tested), not 1e-9 equality.

    ``stochastic_rounding=True`` requantizes the FIRST moment with
    UNBIASED stochastic rounding (``floor(x/s + u)``, u ~ U(0,1)): a
    moment increment smaller than half a quantization step — which
    nearest-rounding silently drops FOREVER (an element whose block
    holds one large moment can stall at zero) — survives in
    expectation.  The SECOND moment instead rounds UP (ceil): v sits
    under a square root in the step's denominator, so UNDERestimating
    it (which unbiased rounding does half the time, occasionally to
    zero) explodes steps, while overestimating by at most one quantum
    only makes them conservative — and the overestimate self-anneals
    as the block's absmax shrinks.  The SR noise is COUNTER-BASED
    (derived from the step index and the leaf index alone, not a
    carried rng state), so the state layout, checkpoints,
    ``moment_footprint``, and crash/resume BIT-exactness are all
    unchanged: the same step at the same index rounds identically in
    any resume chain.  Off by default (nearest rounding).

    ``exact_reduction=True`` makes the optimizer equal the REPLICATED
    run bit-for-bit under ZeRO stages >= 2 as well: the trainer then
    leaves the gradients on the replicated run's layout, so the
    batch-gradient reduction is the replicated run's own all-reduce
    (identical summation order) instead of a reduce-scatter whose
    different partial-sum grouping perturbs gradients by epsilon — a
    perturbation the int8 block-quantization thresholds amplify to
    ~1e-3 (the measured default band, ``test_optim8bit.py``; sharding
    annotations alone CANNOT pin the order — measured, the partitioned
    programs differ in value-dependent ulps either way).  The
    documented cost: all-reduce bytes (2x the reduce-scatter) and no
    gradient memory sharding — stage-2-exact has ZeRO-1's memory
    profile; stage-3-exact keeps the dominant param+moment sharding.
    The fast ~1e-3 default stays the default.

    State: ``(t, ((mq, ms, vq, vs), ...))`` with ``mq/vq``
    ``(n_blocks, block)`` int8 and ``ms/vs`` ``(n_blocks, 1)`` f32 —
    plain arrays, so checkpoints, ``_restore_opt_state`` re-placement,
    and ``zero1_place`` (shards the block axis over ``data``) all work
    unchanged."""

    def _xp(ref):
        try:
            import jax
            import jax.numpy as jnp

            if isinstance(ref, jax.Array):
                return jnp
        except ImportError:
            pass
        import numpy as np

        return np

    _SR_SALT = 0xA8B17  # stream id: "adam8bit" SR noise, fixed forever

    def _sr_uniform(xp, t, stream, shape):
        """Counter-based U(0,1) noise for stochastic rounding — a pure
        function of (step t, leaf stream id), so requantization is
        reproducible bit-for-bit across crash/resume chains."""
        if xp.__name__ == "jax.numpy":
            import jax

            key = jax.random.fold_in(
                jax.random.fold_in(jax.random.PRNGKey(_SR_SALT), t),
                stream)
            return jax.random.uniform(key, shape)
        import numpy as _np

        return _np.random.default_rng(
            (_SR_SALT, int(t), int(stream))).uniform(size=shape)

    def _q(x, xp, t=None, stream=0, mode="nearest"):
        # x: (n_blocks, block) f32 -> int8 codes + per-block scale
        s = xp.max(xp.abs(x), axis=1, keepdims=True) / 127.0
        safe = xp.where(s > 0, s, 1.0)
        y = x / safe
        if mode == "sr" and t is not None:
            # unbiased: E[floor(y + u)] == y for u ~ U(0,1)
            y = xp.floor(y + _sr_uniform(xp, t, stream, x.shape))
        elif mode == "ceil":
            # away-from-zero: |dequantized| >= |true| (denominator-safe)
            y = xp.sign(y) * xp.ceil(xp.abs(y))
        else:
            y = xp.rint(y)
        q = xp.clip(y, -127, 127).astype("int8")
        return q, s.astype(x.dtype)

    def _blocks(g, xp):
        n = g.size
        nb = -(-n // block)
        flat = xp.ravel(g)
        if nb * block != n:
            flat = xp.concatenate(
                [flat, xp.zeros((nb * block - n,), flat.dtype)])
        return flat.reshape(nb, block)

    def init(params):
        state = []
        for p in params:
            xp = _xp(p)
            z = _blocks(p * 0, xp)
            zq, zs = _q(z, xp)
            state.append((zq, zs, zq, zs))
        return (0, tuple(state))

    def update(state, params, grads, lr):
        t, qs = state
        t = t + 1
        new_qs: list = []
        new_params: list = []
        for idx, (p, g, (mq, ms, vq, vs)) in enumerate(
                zip(params, grads, qs)):
            xp = _xp(g)
            gb = _blocks(g, xp)
            m = b1 * (mq * ms) + (1 - b1) * gb
            v = b2 * (vq * vs) + (1 - b2) * gb * gb
            mc = m / (1 - b1**t)
            vc = v / (1 - b2**t)
            step = (lr * mc / (vc**0.5 + eps)).reshape(-1)[: p.size]
            new_params.append(p - step.reshape(p.shape))
            mmode = "sr" if stochastic_rounding else "nearest"
            vmode = "ceil" if stochastic_rounding else "nearest"
            mq2, ms2 = _q(m, xp, t=t, stream=2 * idx, mode=mmode)
            vq2, vs2 = _q(v, xp, t=t, stream=2 * idx + 1, mode=vmode)
            new_qs.append((mq2, ms2, vq2, vs2))
        return (t, tuple(new_qs)), tuple(new_params)

    # hyper keeps its historical 4-tuple shape for the default (so
    # struct_key-validated checkpoints stay loadable); SR appends a
    # flag, exact_reduction a marker (it changes the GRADIENT values
    # the update sees under ZeRO>=2, so it must key jit caches and
    # checkpoint validation even though the update rule is unchanged)
    hyper = ((b1, b2, eps, block, True) if stochastic_rounding
             else (b1, b2, eps, block))
    if exact_reduction:
        hyper = hyper + ("exact",)
    return Optimizer(init, update, "adam8bit", hyper=hyper,
                     exact_reduction=exact_reduction)


def moment_footprint(opt: Optional[Optimizer], dtype_bytes: int) -> float:
    """Bytes of optimizer state PER PARAMETER ELEMENT — the accounting
    ``training_memory_report`` and ``plan_meshes`` share: 0 for sgd,
    one full-precision buffer for momentum, two for adam, two 1-byte
    code buffers plus per-block scales for adam8bit.  Unknown stateful
    optimizers default to adam's footprint."""
    if opt is None or opt.name == "sgd":
        return 0.0
    if opt.name == "momentum":
        return float(dtype_bytes)
    if opt.name == "adam8bit":
        block = opt.hyper[3] if opt.hyper else 256
        return 2.0 * (1.0 + dtype_bytes / block)
    return 2.0 * dtype_bytes


def clip_by_global_norm(grads: Grads, max_norm: float) -> Grads:
    """Scale the gradient pytree so its global L2 norm is <= max_norm
    (jit-friendly: works on numpy and traced jax arrays alike)."""
    import numpy as np

    total = 0.0
    for g in grads:
        total = total + (g * g).sum()
    norm = total ** 0.5
    if isinstance(norm, (float, np.floating, np.ndarray)):
        scale = min(max_norm / (float(norm) + 1e-12), 1.0)
    else:  # traced jax value — keep it jit-friendly
        import jax.numpy as jnp

        scale = jnp.minimum(max_norm / (norm + 1e-12), 1.0)
    return tuple(g * scale for g in grads)


def cosine_schedule(base_lr: float, total_steps: int, final_frac: float = 0.0):
    """lr(step): cosine decay from base_lr to final_frac * base_lr."""
    import math

    def lr(step: int) -> float:
        t = min(step, total_steps) / max(total_steps, 1)
        return base_lr * (final_frac + (1 - final_frac)
                          * 0.5 * (1 + math.cos(math.pi * t)))

    return lr


def exponential_schedule(base_lr: float, decay: float, every: int = 1):
    """lr(step) = base_lr * decay**(step // every)."""

    def lr(step: int) -> float:
        return base_lr * decay ** (step // every)

    return lr
