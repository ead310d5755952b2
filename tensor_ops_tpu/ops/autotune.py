"""Measured Pallas tile autotuning with a persistent on-disk cache.

``pick_tiles``' static heuristic (``pallas_kernels.py``) encodes ONE
measured sweep on one device generation; this module replaces trust in
that table with measurement on *this* machine: enumerate the VMEM-legal
tile candidates around the heuristic, time the real kernel on each
(min-of-rounds wall clock on device arrays), and persist the winner to
a small JSON cache keyed by (kernel, shape, dtype, device kind).  The
hand-tuned config is always among the candidates, so the tuned result
can only match or beat the heuristic (modulo timing noise).

The hot-path lookup (``get_tuned``) is read-only and costs a dict probe
at TRACE time (the file loads once per process) — nothing is ever
measured implicitly; tuning runs only through the explicit
``autotune_*`` entry points (or ``bench.py --autotune``).

Cache location: ``$TENSOR_OPS_TPU_TILE_CACHE`` or
``~/.cache/tensor_ops_tpu/tiles.json``.  The file is written atomically
(tmp + rename) and merged on write, so concurrent tuners lose at worst
one entry, never the file.

Role model: the reference delegates its GEMM tiling to OpenBLAS'
build-time kernels (``src/TensorOps/BLAS/HMat.hs``); on TPU the tiling
IS the kernel parameterization, so it must be measured per device.
"""

from __future__ import annotations

import json
import os
import time
from typing import Dict, List, Optional, Sequence, Tuple

LANE = 128
SUBLANE = 8


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def default_cache_path() -> str:
    env = os.environ.get("TENSOR_OPS_TPU_TILE_CACHE")
    if env:
        return env
    return os.path.join(os.path.expanduser("~"), ".cache",
                        "tensor_ops_tpu", "tiles.json")


class TileCache:
    """Tiny JSON key->entry store with atomic merge-on-write.

    Entries are ``{"tiles": [...], "us": float, "candidates": int}`` —
    the winning config plus provenance (measured microseconds, sweep
    size) so a reader can audit what the tuner saw."""

    def __init__(self, path: Optional[str] = None):
        self.path = path or default_cache_path()
        self._data: Optional[Dict[str, dict]] = None

    def _load(self) -> Dict[str, dict]:
        if self._data is None:
            try:
                with open(self.path) as f:
                    self._data = json.load(f)
            except (OSError, ValueError):
                self._data = {}
        return self._data

    def get(self, key: str) -> Optional[dict]:
        return self._load().get(key)

    def put(self, key: str, entry: dict) -> None:
        # merge against the file's current contents so two processes
        # tuning different shapes both land
        try:
            with open(self.path) as f:
                on_disk = json.load(f)
        except (OSError, ValueError):
            on_disk = {}
        on_disk[key] = entry
        os.makedirs(os.path.dirname(os.path.abspath(self.path)),
                    exist_ok=True)
        tmp = f"{self.path}.{os.getpid()}.tmp"
        try:
            with open(tmp, "w") as f:
                json.dump(on_disk, f, indent=0, sort_keys=True)
            os.replace(tmp, self.path)
        except BaseException:
            try:
                os.unlink(tmp)
            except OSError:
                pass
            raise
        self._data = on_disk

    def invalidate(self) -> None:
        self._data = None


_CACHE = TileCache()


def _device_kind() -> str:
    import jax

    return jax.devices()[0].device_kind.replace(" ", "_")


def make_key(kernel: str, **params) -> str:
    parts = [kernel] + [f"{k}={params[k]}" for k in sorted(params)]
    parts.append(f"dev={_device_kind()}")
    return "|".join(parts)


_PACKAGED_PATH = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                              "tuned_tiles.json")
_packaged: Optional[Dict[str, dict]] = None


def _packaged_tiles() -> Dict[str, dict]:
    """Read-only tuning table shipped WITH the package
    (``ops/tuned_tiles.json``): winners measured on known device kinds
    (key includes ``dev=``, so a different chip never matches).  The
    user cache always wins over it — this is the fallback for fresh
    machines/homes where no ``autotune_*`` run has populated
    ``~/.cache`` yet."""
    global _packaged
    if _packaged is None:
        try:
            with open(_PACKAGED_PATH) as f:
                _packaged = json.load(f)
        except (OSError, ValueError):
            _packaged = {}
    return _packaged


def get_tuned(kernel: str, **params) -> Optional[tuple]:
    """Hot-path cache probe used by ``pick_tiles`` and the mlp kernels;
    returns the tuned config tuple or None (never measures).  Probes
    the user cache first, then the packaged table."""
    key = make_key(kernel, **params)
    entry = _CACHE.get(key)
    if entry is None:
        entry = _packaged_tiles().get(key)
    if entry is None:
        return None
    return tuple(entry["tiles"])


def _diff_time_us(loop_fn, small: int = 4, big: int = 12,
                  rounds: int = 3, min_signal_s: float = 0.15) -> float:
    """Per-iteration microseconds by DIFFERENTIAL loop-carried timing
    (BENCH.md "Methodology"): ``loop_fn(n)`` runs n chained kernel
    iterations (loop-carried state — XLA cannot hoist the kernel as
    loop-invariant) and blocks; the per-step time is
    (t_big - t_small)/(big - small), which cancels dispatch, tunnel
    RTT, and host overhead.  Naive repeated-dispatch timing through
    the axon tunnel reports physically impossible numbers (measured
    13.5us for a 4096^3 GEMM == 10 PFLOP/s on a 197 TF chip) — never
    trust it.  ``loop_fn`` MUST synchronize by fetching a scalar to
    host (``float(out[0, 0])``): ``jax.block_until_ready`` is a no-op
    on tunneled remote buffers (measured: n=100 iterations of that
    GEMM "completed" in 0.0s under block_until_ready; the same loop
    walls 1.9ms/step once a scalar fetch forces the sync)."""
    loop_fn(small)  # compile (n is a traced bound: one program)
    while True:
        t_small = t_big = float("inf")
        for _ in range(rounds):
            t0 = time.perf_counter()
            loop_fn(small)
            t_small = min(t_small, time.perf_counter() - t0)
            t0 = time.perf_counter()
            loop_fn(big)
            t_big = min(t_big, time.perf_counter() - t0)
        # the tunnel's per-call RTT jitters by ~±10 ms: the differential
        # only means something once it towers over that.  Escalating n
        # reuses the SAME compiled program (traced bound).
        if t_big - t_small > min_signal_s or big >= 65536:
            return max(t_big - t_small, 1e-9) / (big - small) * 1e6
        small, big = big, big * 8


def _fold(y, width: int, x):
    """Fold a kernel output back into the loop carry (shape (B, width),
    dtype of x): a cheap non-elidable elementwise mix so iteration i+1
    truly depends on iteration i."""
    import jax.numpy as jnp

    if y.shape[1] >= width:
        upd = y[:, :width]
    else:
        reps = -(-width // y.shape[1])
        upd = jnp.tile(y, (1, reps))[:, :width]
    return x * 0.5 + upd.astype(x.dtype) * 0.5


def linear_candidates(B: int, K: int, O: int, save_z: bool,
                      dtype_bytes: int = 4,
                      vmem_budget: int = 48 * 1024 * 1024
                      ) -> List[Tuple[int, int, int]]:
    """VMEM-legal (block_b, block_o, block_k) sweep around the
    heuristic: powers of two clipped to the (padded) problem dims, with
    the double-buffered block footprint bounded by ``vmem_budget``
    (the pallas_call runs under a 56 MB Mosaic limit — leave headroom
    for semaphores and the compiler's own scratch)."""
    Bp, Kp, Op = _round_up(B, SUBLANE), _round_up(K, LANE), _round_up(O, LANE)
    tbs = sorted({min(t, Bp) for t in (128, 256, 512, 1024)})
    tos = sorted({min(t, Op) for t in (256, 512, 1024)})
    tks = sorted({min(t, Kp) for t in (512, 1024, 2048)}
                 | ({Kp} if Kp <= 8192 else set()))
    out = []
    for tb in tbs:
        for to in tos:
            for tk in tks:
                if Bp % tb or Op % to or Kp % tk:
                    # pick_tiles pads to the tile, but a sweep entry
                    # that forces extra padding competes unfairly —
                    # keep only exact tilings of the padded dims
                    continue
                vmem = (2 * (tb * tk + to * tk) * dtype_bytes  # in blocks
                        + tb * to * 4                          # accumulator
                        + 2 * tb * to * dtype_bytes            # y out
                        + (2 * tb * to * 4 if save_z else 0))  # z out
                if vmem > vmem_budget:
                    continue
                out.append((tb, to, tk))
    return out


def autotune_linear(B: int, K: int, O: int, *, save_z: bool = False,
                    dtype=None, precision: str = "default",
                    act: str = "logistic", cache: Optional[TileCache] = None,
                    verbose: bool = False) -> Tuple[int, int, int]:
    """Measure every legal tile config for ``fused_linear``'s shape and
    persist the winner; returns (block_b, block_o, block_k).  The
    heuristic's pick is always in the sweep (floor on regression)."""
    import jax.numpy as jnp

    from .pallas_kernels import _fused_linear_padded, _pad2, pick_tiles

    cache = cache or _CACHE
    dtype = dtype or jnp.float32
    dname = jnp.dtype(dtype).name
    key = make_key("linear", B=B, K=K, O=O, save_z=int(save_z), dtype=dname)
    cands = linear_candidates(B, K, O, save_z,
                              dtype_bytes=jnp.dtype(dtype).itemsize)
    heur = pick_tiles(B, K, O, save_z)
    if heur not in cands:
        cands.append(heur)

    import jax
    from jax import lax

    x = jnp.zeros((B, K), dtype)
    w = jnp.zeros((O, K), dtype)
    results = []
    for tiles in cands:
        tb, to, tk = tiles
        xp = _pad2(x, tb, tk)
        wp = _pad2(w, to, tk)
        bp = jnp.zeros((1, wp.shape[0]), jnp.float32)
        Kp = xp.shape[1]

        @jax.jit
        def run(xp, wp, bp, n, _t=tiles):
            def body(i, xc):
                y, _ = _fused_linear_padded(xc, wp, bp, act, _t[0],
                                            save_z, precision, tiles=_t)
                return _fold(y, Kp, xc)

            return lax.fori_loop(0, n, body, xp)

        def loop_fn(n, _run=run, _xp=xp, _wp=wp, _bp=bp):
            # scalar fetch = the only true sync through the tunnel
            return float(_run(_xp, _wp, _bp, n)[0, 0].astype(jnp.float32))

        try:
            us = _diff_time_us(loop_fn)
        except Exception as e:  # Mosaic can reject extreme configs
            if verbose:
                print(f"  tiles {tiles}: rejected ({type(e).__name__})")
            continue
        results.append((us, tiles))
        if verbose:
            print(f"  tiles {tiles}: {us:.1f}us")
    if not results:
        raise RuntimeError(f"no tile candidate compiled for {key}")
    best_us, best = min(results)
    cache.put(key, {"tiles": list(best), "us": round(best_us, 2),
                    "candidates": len(results)})
    return best


def autotune_mlp_train_step(B: int, dims: Sequence[int],
                            acts: Sequence[str], *, lr: float = 0.05,
                            precision: str = "default",
                            cache: Optional[TileCache] = None,
                            verbose: bool = False) -> int:
    """Sweep the megakernel's batch tile; persists and returns the
    winning ``block_b`` for ``fused_mlp_train_step``."""
    import jax
    import jax.numpy as jnp

    from .pallas_kernels import fused_mlp_train_step

    cache = cache or _CACHE
    key = make_key("mlp_train", B=B, dims="x".join(map(str, dims)),
                   precision=precision)
    ws = [jnp.zeros((dims[k + 1], dims[k]), jnp.float32)
          for k in range(len(dims) - 1)]
    bs = [jnp.zeros((dims[k + 1],), jnp.float32)
          for k in range(len(dims) - 1)]
    x = jnp.zeros((B, dims[0]), jnp.float32)
    y = jnp.zeros((B, dims[-1]), jnp.float32)
    cands = sorted({min(t, _round_up(B, SUBLANE))
                    for t in (256, 512, 1024, 2048)})
    results = []
    from jax import lax

    for bb in cands:

        @jax.jit
        def run(x, y, ws0, bs0, n, _bb=bb):
            def body(i, carry):
                cw, cb = carry
                _, nw, nb = fused_mlp_train_step(
                    x, y, list(cw), list(cb), lr, list(acts),
                    block_b=_bb, precision=precision)
                return tuple(nw), tuple(nb)

            return lax.fori_loop(0, n, body, (tuple(ws0), tuple(bs0)))

        def loop_fn(n, _run=run):
            out = _run(x, y, tuple(ws), tuple(bs), n)
            return float(out[0][0][0, 0])  # scalar fetch = true sync

        try:
            us = _diff_time_us(loop_fn)
        except Exception as e:
            if verbose:
                print(f"  block_b {bb}: rejected ({type(e).__name__})")
            continue
        results.append((us, bb))
        if verbose:
            print(f"  block_b {bb}: {us:.1f}us")
    if not results:
        raise RuntimeError(f"no block_b candidate compiled for {key}")
    best_us, best = min(results)
    cache.put(key, {"tiles": [best], "us": round(best_us, 2),
                    "candidates": len(results)})
    return best


def _sweep_and_persist(key: str, results: List[Tuple[float, tuple]],
                       cache: TileCache) -> tuple:
    """Shared tail of every autotune entry: pick the fastest measured
    config, persist it with provenance, return it."""
    if not results:
        raise RuntimeError(f"no candidate compiled for {key}")
    best_us, best = min(results)
    cache.put(key, {"tiles": list(best), "us": round(best_us, 2),
                    "candidates": len(results)})
    return best


def int8_linear_candidates(B: int, K: int, O: int, *, x_bytes: int,
                           vmem_budget: int = 48 * 1024 * 1024
                           ) -> List[Tuple[int, int, int]]:
    """(block_b, block_o, block_k) sweep for the int8-weight linears.
    int8 blocks tile (32, 128) minimum, so the batch tile is a
    32-multiple when the activations are int8 too (``x_bytes == 1``,
    the w8a8 kernel); the f32-activation w8 kernel keeps the 8-sublane
    rule.  Weight blocks are 1 byte/elem — the VMEM bound admits much
    deeper K than the f32 sweep."""
    b_step = 32 if x_bytes == 1 else SUBLANE
    Bp = _round_up(B, b_step)
    Kp, Op = _round_up(K, LANE), _round_up(O, LANE)
    tbs = sorted({min(t, Bp) for t in (32, 64, 128, 256, 512)})
    tos = sorted({min(t, Op) for t in (256, 512, 1024, 2048, 4096)})
    tks = sorted({min(t, Kp) for t in (256, 512, 1024, 2048)}
                 | ({Kp} if Kp <= 8192 else set()))
    out = []
    for tb in tbs:
        if tb % b_step:
            continue
        for to in tos:
            for tk in tks:
                if Op % to or Kp % tk:
                    continue
                vmem = (2 * (tb * tk * x_bytes + to * tk)   # in blocks
                        + tb * to * 4                       # accumulator
                        + 2 * tb * to * 4)                  # y out (f32)
                if vmem > vmem_budget:
                    continue
                out.append((tb, to, tk))
    return out


def autotune_linear_w8(B: int, K: int, O: int, *, act: str = "identity",
                       precision: str = "default",
                       cache: Optional[TileCache] = None,
                       verbose: bool = False) -> Tuple[int, int, int]:
    """Measure tile configs for ``fused_linear_w8`` (int8 weights
    dequantized in-kernel, f32 activations) and persist the winner
    under the ``linear_w8`` key ``pick_tiles(kernel='linear_w8')``
    probes."""
    import jax
    import jax.numpy as jnp
    from jax import lax

    from .pallas_kernels import fused_linear_w8, pick_tiles

    cache = cache or _CACHE
    key = make_key("linear_w8", B=B, K=K, O=O, save_z=0, dtype="float32")
    cands = int8_linear_candidates(B, K, O, x_bytes=4)
    heur = pick_tiles(B, K, O, kernel="linear_w8")
    if heur not in cands:
        cands.append(heur)
    x = jnp.zeros((B, K), jnp.float32)
    wq = jnp.zeros((O, K), jnp.int8)
    sc = jnp.ones((O, 1), jnp.float32)
    b = jnp.zeros((O,), jnp.float32)
    results = []
    for tiles in cands:

        @jax.jit
        def run(x, wq, sc, b, n, _t=tiles):
            def body(i, xc):
                y = fused_linear_w8(xc, wq, sc, b, act, precision, tiles=_t)
                return _fold(y, K, xc)

            return lax.fori_loop(0, n, body, x)

        def loop_fn(n, _run=run):
            return float(_run(x, wq, sc, b, n)[0, 0])  # scalar fetch sync

        try:
            us = _diff_time_us(loop_fn)
        except Exception as e:  # Mosaic can reject extreme configs
            if verbose:
                print(f"  tiles {tiles}: rejected ({type(e).__name__})")
            continue
        results.append((us, tiles))
        if verbose:
            print(f"  tiles {tiles}: {us:.1f}us")
    return _sweep_and_persist(key, results, cache)


def autotune_linear_w8a8(B: int, K: int, O: int, *, act: str = "identity",
                         cache: Optional[TileCache] = None,
                         verbose: bool = False) -> Tuple[int, int, int]:
    """Measure tile configs for ``fused_linear_w8a8`` (int8 x int8 on
    the MXU; activations quantized per call, the serving recipe) and
    persist under the key its trace-time probe reads."""
    import jax
    import jax.numpy as jnp
    from jax import lax

    from .pallas_kernels import fused_linear_w8a8

    cache = cache or _CACHE
    key = make_key("linear_w8a8", B=B, K=K, O=O)
    cands = int8_linear_candidates(B, K, O, x_bytes=1)
    heur = (min(_round_up(B, 32), 512), min(_round_up(O, LANE), 2048),
            min(_round_up(K, LANE), 1024))
    if heur not in cands:
        cands.append(heur)
    x = jnp.zeros((B, K), jnp.float32)
    wq = jnp.zeros((O, K), jnp.int8)
    sc = jnp.ones((O, 1), jnp.float32)
    b = jnp.zeros((O,), jnp.float32)
    results = []
    for tiles in cands:

        @jax.jit
        def run(x, wq, sc, b, n, _t=tiles):
            def body(i, xc):
                y = fused_linear_w8a8(xc, wq, sc, b, act, tiles=_t)
                return _fold(y, K, xc)

            return lax.fori_loop(0, n, body, x)

        def loop_fn(n, _run=run):
            return float(_run(x, wq, sc, b, n)[0, 0])

        try:
            us = _diff_time_us(loop_fn)
        except Exception as e:
            if verbose:
                print(f"  tiles {tiles}: rejected ({type(e).__name__})")
            continue
        results.append((us, tiles))
        if verbose:
            print(f"  tiles {tiles}: {us:.1f}us")
    return _sweep_and_persist(key, results, cache)


def autotune_mlp_w8a8(B: int, N: int, L: int, *, hidden_act: str = "relu",
                      cache: Optional[TileCache] = None,
                      verbose: bool = False) -> Tuple[int, int]:
    """Sweep the w8a8 serving megakernel's weight-block tiles
    (block_o, block_k) — the contested serving kernel (BENCH.md int8
    section).  The batch never tiles (VMEM-resident whole), so these
    two dims set the HBM weight-stream pattern, the only thing that
    matters at the weight-bound serving shape."""
    import jax
    import jax.numpy as jnp
    from jax import lax

    from .pallas_kernels import fused_mlp_w8a8_forward

    cache = cache or _CACHE
    key = make_key("mlp_w8a8", B=B, N=N, L=L)
    Bp = _round_up(max(B, 1), 32)
    cands = []
    for to in (512, 1024, 2048, 4096):
        for tk in (256, 512, 1024, 2048, 4096):
            if to > N or tk > N or N % to or N % tk:
                continue
            vmem = (Bp * N * 5          # resident h_i8 + h_f32
                    + 2 * to * tk       # double-buffered weight block
                    + Bp * to * 8       # int32 acc + f32 out block
                    + Bp * 16)
            if vmem > 48 * 1024 * 1024:
                continue
            cands.append((to, tk))
    heur = (min(N, 2048), min(N, 1024))
    if heur not in cands:
        cands.append(heur)
    wqs = jnp.zeros((L, N, N), jnp.int8)
    sws = jnp.ones((L, N), jnp.float32)
    bs = jnp.zeros((L, N), jnp.float32)
    x = jnp.zeros((B, N), jnp.float32)
    results = []
    for tiles in cands:

        @jax.jit
        def run(x, wqs, sws, bs, n, _t=tiles):
            def body(i, xc):
                y = fused_mlp_w8a8_forward(xc, wqs, sws, bs, hidden_act,
                                           tiles=_t)
                return _fold(y, N, xc)

            return lax.fori_loop(0, n, body, x)

        def loop_fn(n, _run=run):
            return float(_run(x, wqs, sws, bs, n)[0, 0])

        try:
            us = _diff_time_us(loop_fn)
        except Exception as e:
            if verbose:
                print(f"  tiles {tiles}: rejected ({type(e).__name__})")
            continue
        results.append((us, tiles))
        if verbose:
            print(f"  tiles {tiles}: {us:.1f}us")
    return _sweep_and_persist(key, results, cache)


def autotune_rnn_step(B: int, I: int, O: int, *, act: str = "logistic",
                      precision: str = "default",
                      cache: Optional[TileCache] = None,
                      verbose: bool = False) -> Tuple[int]:
    """Sweep the fused Elman step's batch tile (its only free
    parameter: both weight matrices are VMEM-resident whole)."""
    import jax
    import jax.numpy as jnp
    from jax import lax

    from .pallas_kernels import _rnn_step_impl

    cache = cache or _CACHE
    key = make_key("rnn_step", B=B, I=I, O=O)
    Bp = _round_up(B, SUBLANE)
    cands = sorted({min(t, Bp) for t in (64, 128, 256, 512, 1024)})
    x = jnp.zeros((B, I), jnp.float32)
    s0 = jnp.zeros((B, O), jnp.float32)
    wx = jnp.zeros((O, I), jnp.float32)
    ws = jnp.zeros((O, O), jnp.float32)
    b = jnp.zeros((O,), jnp.float32)
    results = []
    for bb in cands:

        @jax.jit
        def run(x, s0, wx, ws, b, n, _bb=bb):
            def body(i, s):
                _, snew, _ = _rnn_step_impl(x, s, wx, ws, b, act,
                                            precision, block_b=_bb)
                return snew

            return lax.fori_loop(0, n, body, s0)

        def loop_fn(n, _run=run):
            return float(_run(x, s0, wx, ws, b, n)[0, 0])

        try:
            us = _diff_time_us(loop_fn)
        except Exception as e:
            if verbose:
                print(f"  block_b {bb}: rejected ({type(e).__name__})")
            continue
        results.append((us, (bb,)))
        if verbose:
            print(f"  block_b {bb}: {us:.1f}us")
    return _sweep_and_persist(key, results, cache)


def autotune_mlp_forward(B: int, dims: Sequence[int], acts: Sequence[str],
                         *, softmax_out: bool = True,
                         precision: str = "default",
                         cache: Optional[TileCache] = None,
                         verbose: bool = False) -> int:
    """Sweep the fused whole-MLP forward's batch tile; persists and
    returns the winning ``block_b`` for ``fused_mlp_forward``."""
    import jax
    import jax.numpy as jnp

    from .pallas_kernels import fused_mlp_forward

    cache = cache or _CACHE
    key = make_key("mlp_fwd", B=B, dims="x".join(map(str, dims)),
                   softmax=int(softmax_out), precision=precision)
    ws = [jnp.zeros((dims[k + 1], dims[k]), jnp.float32)
          for k in range(len(dims) - 1)]
    bs = [jnp.zeros((dims[k + 1],), jnp.float32)
          for k in range(len(dims) - 1)]
    x = jnp.zeros((B, dims[0]), jnp.float32)
    cands = sorted({min(t, _round_up(B, SUBLANE))
                    for t in (128, 256, 512, 1024)})
    results = []
    from jax import lax

    for bb in cands:

        @jax.jit
        def run(x, ws0, bs0, n, _bb=bb):
            def body(i, xc):
                y = fused_mlp_forward(xc, list(ws0), list(bs0), list(acts),
                                      softmax_out=softmax_out,
                                      block_b=_bb, precision=precision)
                return _fold(y, xc.shape[1], xc)

            return lax.fori_loop(0, n, body, x)

        def loop_fn(n, _run=run):
            # scalar fetch = true sync
            return float(_run(x, tuple(ws), tuple(bs), n)[0, 0])

        try:
            us = _diff_time_us(loop_fn)
        except Exception as e:
            if verbose:
                print(f"  block_b {bb}: rejected ({type(e).__name__})")
            continue
        results.append((us, bb))
        if verbose:
            print(f"  block_b {bb}: {us:.1f}us")
    if not results:
        raise RuntimeError(f"no block_b candidate compiled for {key}")
    best_us, best = min(results)
    cache.put(key, {"tiles": [best], "us": round(best_us, 2),
                    "candidates": len(results)})
    return best
