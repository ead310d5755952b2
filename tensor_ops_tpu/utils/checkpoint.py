"""Checkpoint / resume.

The reference has none — networks exist only in memory and training runs
to Ctrl-C (``trainEpoch`` recurses forever, ``app/MNIST.hs:297-313``;
SURVEY.md §5).  The rebuild adds minimal, dependency-free save/restore:
parameters (+ optional states) go to a single ``.npz`` with a small JSON
manifest, keyed so a Network/RecurrentNetwork/FusedMLP round-trips
against the same architecture.
"""

from __future__ import annotations

import json
import os
from typing import Any, Dict, Optional, Tuple

import numpy as np


def save_arrays(path: str, arrays: Dict[str, Any], meta: Optional[dict] = None) -> None:
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    np_arrays = {k: np.asarray(v) for k, v in arrays.items()}
    np_arrays["__meta__"] = np.frombuffer(
        json.dumps(meta or {}).encode(), dtype=np.uint8
    )
    # write to a sibling temp file and os.replace() into place: a crash
    # mid-write must never leave a torn checkpoint where a resumable one
    # stood (rename is atomic on POSIX).  Writing through a file handle
    # also stops np.savez appending ".npz" and diverging from the path
    # load_arrays will open.
    tmp = f"{path}.{os.getpid()}.tmp"
    try:
        with open(tmp, "wb") as f:
            np.savez(f, **np_arrays)
        os.replace(tmp, path)
    except BaseException:
        try:
            os.unlink(tmp)
        except OSError:
            pass
        raise


_ASYNC_POOL = None


def save_arrays_async(path: str, arrays: Dict[str, Any],
                      meta: Optional[dict] = None):
    """Checkpoint without blocking the training loop: device arrays are
    fetched to host synchronously (cheap), the file write happens on a
    background thread.  Returns a Future; call ``.result()`` to join."""
    global _ASYNC_POOL
    import concurrent.futures

    if _ASYNC_POOL is None:
        _ASYNC_POOL = concurrent.futures.ThreadPoolExecutor(
            max_workers=1, thread_name_prefix="ckpt")
    host_arrays = {k: np.asarray(v) for k, v in arrays.items()}
    return _ASYNC_POOL.submit(save_arrays, path, host_arrays, meta)


def load_arrays(path: str) -> Tuple[Dict[str, np.ndarray], dict]:
    with np.load(path) as z:
        meta = json.loads(bytes(z["__meta__"]).decode()) if "__meta__" in z else {}
        arrays = {k: z[k] for k in z.files if k != "__meta__"}
    return arrays, meta


def load_meta(path: str) -> dict:
    """Just the JSON manifest of a checkpoint file — the cheap peek
    ``fit(resume=True)`` uses to adopt recorded decisions (e.g. the
    ``mp_route`` the saving run measured) BEFORE committing to a step
    compile; array payloads are not materialized."""
    with np.load(path) as z:
        return (json.loads(bytes(z["__meta__"]).decode())
                if "__meta__" in z.files else {})


def _network_payload(net, extra_meta: Optional[dict]) -> Tuple[dict, dict]:
    arrays = {f"param_{i}": p for i, p in enumerate(net.params)}
    meta = {
        "kind": "feedforward",
        "param_stack": [list(s) for s in net.param_stack],
        "in_shape": list(net.in_shape),
        "out_shape": list(net.out_shape),
    }
    if net.act_names is not None:
        # activation names travel with the weights so a serving process
        # can rebuild the exact graph without out-of-band layer flags
        meta["acts"] = list(net.act_names)
    meta.update(extra_meta or {})
    return arrays, meta


def save_network(path: str, net, extra_meta: Optional[dict] = None) -> None:
    """Save a feed-forward Network's params (+ activation names)."""
    arrays, meta = _network_payload(net, extra_meta)
    save_arrays(path, arrays, meta)


def save_network_async(path: str, net, extra_meta: Optional[dict] = None):
    """``save_network`` with the file write on the checkpoint thread
    (device arrays are fetched synchronously).  Returns a Future."""
    arrays, meta = _network_payload(net, extra_meta)
    return save_arrays_async(path, arrays, meta)


def network_from_arrays(arrays: Dict[str, np.ndarray], meta: dict, net, be) -> Any:
    """Rebuild a Network from already-loaded checkpoint contents (see
    ``load_network``; serving loads the file once and dispatches)."""
    from ..models.feedforward import Network
    from ..ops.shapes import ShapeError

    params = tuple(
        be.asarray(arrays[f"param_{i}"]) for i in range(len(net.params))
    )
    for p, s in zip(params, net.param_stack):
        if tuple(p.shape) != tuple(s):
            raise ShapeError(
                f"checkpoint param shape {tuple(p.shape)} != expected {tuple(s)}"
            )
    saved_acts = meta.get("acts")
    if (saved_acts is not None and net.act_names is not None
            and tuple(saved_acts) != tuple(net.act_names)):
        raise ValueError(
            f"checkpoint activations {tuple(saved_acts)} != the rebuilt "
            f"graph's {tuple(net.act_names)} — reconstruct the network "
            f"with the checkpoint's activations")
    return Network(net.op, params, net.act_names)


def load_network(path: str, net, be) -> Any:
    """Restore params into an architecture-compatible Network (the op
    graph is code; only tensors are stored).  Raises if the checkpoint
    records different activation names than ``net`` carries."""
    arrays, meta = load_arrays(path)
    return network_from_arrays(arrays, meta, net, be)


def save_fused(path: str, model, extra_meta: Optional[dict] = None) -> None:
    """Save a FusedMLP (weights, biases, activation names)."""
    arrays = {f"w_{i}": w for i, w in enumerate(model.weights)}
    arrays.update({f"b_{i}": b for i, b in enumerate(model.biases)})
    meta = {
        "kind": "fused_mlp",
        "acts": list(model.acts),
        "softmax_out": bool(model.softmax_out),
        "precision": model.precision,
        "loss_kind": model.loss_kind,
    }
    meta.update(extra_meta or {})
    save_arrays(path, arrays, meta)


def _fused_from_arrays(arrays, meta):
    from ..models.fast import FusedMLP

    n = sum(1 for k in arrays if k.startswith("w_"))
    ws = tuple(arrays[f"w_{i}"] for i in range(n))
    bs = tuple(arrays[f"b_{i}"] for i in range(n))
    return FusedMLP(ws, bs, tuple(meta["acts"]), meta["softmax_out"],
                    meta.get("precision", "default"),
                    meta.get("loss_kind", "ce"))


def load_fused(path: str):
    arrays, meta = load_arrays(path)
    return _fused_from_arrays(arrays, meta)


def _tree_leaves(tree) -> list:
    """Flatten a nested tuple/list/NamedTuple/dict tree of array/scalar
    leaves — the shape of every optimizer state (``optim.py``, plus
    custom ones) — without requiring jax (the module's save/restore is
    dependency-free: a numpy-backend training run checkpoints on
    installs with no jax at all).  Mirrors ``jax.tree_util`` semantics
    for these containers: ``None`` is an empty subtree, dicts iterate
    in sorted-key order."""
    if tree is None:
        return []
    if isinstance(tree, dict):
        return [l for k in sorted(tree) for l in _tree_leaves(tree[k])]
    if isinstance(tree, (tuple, list)):
        out = []
        for t in tree:
            out.extend(_tree_leaves(t))
        return out
    return [tree]


def _tree_unflatten(template, leaves_iter):
    if template is None:
        return None
    if isinstance(template, dict):
        return {k: _tree_unflatten(template[k], leaves_iter)
                for k in sorted(template)}
    if isinstance(template, (tuple, list)):
        vals = [_tree_unflatten(t, leaves_iter) for t in template]
        if hasattr(template, "_fields"):  # NamedTuple states
            return type(template)(*vals)
        return type(template)(vals)
    leaf = next(leaves_iter)
    if isinstance(template, bool):
        return bool(leaf)
    if isinstance(template, int):
        return int(leaf)  # e.g. adam's step count
    if isinstance(template, float):
        return float(leaf)
    return leaf


def _train_state_payload(params, opt_state, step: int, opt_key,
                         extra_meta: Optional[dict],
                         ema=None) -> Tuple[dict, dict]:
    arrays = {f"p_{i}": p for i, p in enumerate(params)}
    leaves = _tree_leaves(opt_state)
    arrays.update({f"o_{i}": l for i, l in enumerate(leaves)})
    meta = {"kind": "train_state", "step": int(step),
            "n_params": len(params), "n_opt_leaves": len(leaves)}
    if ema is not None:
        # Polyak-average leaves live in the SAME file as the params
        # they average, so the pair is atomic by construction — a crash
        # can never leave a .state newer than its EMA
        arrays.update({f"e_{i}": l for i, l in enumerate(ema)})
        meta["n_ema_leaves"] = len(ema)
    if opt_key is not None:
        # structural identity of the update rule (Optimizer.struct_key):
        # resuming under different hyperparameters would silently
        # reinterpret the moments, so record it for load-time validation
        meta["opt_key"] = json.dumps(opt_key)
    meta.update(extra_meta or {})
    return arrays, meta


def save_train_state(path: str, params, opt_state, step: int,
                     extra_meta: Optional[dict] = None,
                     opt_key=None, ema=None) -> None:
    """Full training-state checkpoint: parameters AND optimizer state
    (momentum/adam moments) AND the global step — what exact resume
    needs (``fit(resume=True)``); ``save_network`` alone loses the
    optimizer moments.  ``opt_key`` (e.g. ``opt.struct_key()``) is
    stored so resume can reject a changed optimizer/hyperparameters.
    ``ema`` (a leaf tuple matching ``params``) stores the Polyak
    average in the same atomic write."""
    arrays, meta = _train_state_payload(params, opt_state, step, opt_key,
                                        extra_meta, ema=ema)
    save_arrays(path, arrays, meta)


def save_train_state_async(path: str, params, opt_state, step: int,
                           extra_meta: Optional[dict] = None,
                           opt_key=None, ema=None):
    """``save_train_state`` with the file write off the training thread
    (leaves are fetched to host synchronously).  Returns a Future."""
    arrays, meta = _train_state_payload(params, opt_state, step, opt_key,
                                        extra_meta, ema=ema)
    return save_arrays_async(path, arrays, meta)


def load_train_state(path: str, opt_state_template, opt_key=None,
                     expect_meta: Optional[dict] = None,
                     with_ema: bool = False):
    """(params, opt_state, step) — or, ``with_ema=True``,
    ``(params, opt_state, step, ema_or_None)`` (None when the saving
    run kept no Polyak average) — opt_state leaves are restored into
    the structure of ``opt_state_template`` (from ``opt.init(params)``),
    so the optimizer type/hyperparams must match the saving run.  When
    both the checkpoint and the caller provide an ``opt_key``
    (``Optimizer.struct_key()``), a mismatch — same structure, different
    hyperparameters — raises instead of silently reinterpreting the
    moments under different decay rates.

    ``expect_meta`` keys are validated the same way: a key present in
    BOTH the checkpoint and the expectation must match (e.g. ``fit``'s
    pipeline ``layout`` — a circular-schedule flat stack has identical
    leaf shapes to a GPipe one, so resuming across schedules would
    silently permute body rows without this check)."""
    arrays, meta = load_arrays(path)
    if meta.get("kind") != "train_state":
        raise ValueError(f"{path} is not a train_state checkpoint")
    for key, want in (expect_meta or {}).items():
        have = meta.get(key)
        if have is not None and have != want:
            raise ValueError(
                f"train-state mismatch on {key!r}: checkpoint was saved "
                f"with {have!r}, resume requested {want!r} — resume with "
                f"the same configuration")
    saved_key = meta.get("opt_key")
    if saved_key is not None and opt_key is not None:
        if saved_key != json.dumps(opt_key):
            raise ValueError(
                f"optimizer mismatch: checkpoint was saved with "
                f"{saved_key}, resume requested {json.dumps(opt_key)} — "
                f"resume with the same optimizer/hyperparameters")
    params = tuple(arrays[f"p_{i}"] for i in range(meta["n_params"]))
    n = meta["n_opt_leaves"]
    leaves = [arrays[f"o_{i}"] for i in range(n)]
    n_expected = len(_tree_leaves(opt_state_template))
    if n_expected != n:
        raise ValueError(
            f"optimizer state mismatch: checkpoint has {n} leaves, the "
            f"current optimizer expects {n_expected} — resume "
            f"with the same optimizer/hyperparameters")
    opt_state = _tree_unflatten(opt_state_template, iter(leaves))
    if not with_ema:
        return params, opt_state, int(meta["step"])
    n_e = meta.get("n_ema_leaves")
    ema = (tuple(arrays[f"e_{i}"] for i in range(n_e))
           if n_e is not None else None)
    return params, opt_state, int(meta["step"]), ema


def save_quantized(path: str, model, extra_meta: Optional[dict] = None) -> None:
    """Save a QuantizedMLP (int8 weights + scales + biases) — the
    deployable serving artifact: a quarter of the f32 checkpoint bytes."""
    arrays = {f"wq_{i}": q for i, q in enumerate(model.wqs)}
    arrays.update({f"s_{i}": s for i, s in enumerate(model.scales)})
    arrays.update({f"b_{i}": b for i, b in enumerate(model.biases)})
    meta = {
        "kind": "quantized_mlp",
        "acts": list(model.acts),
        "softmax_out": bool(model.softmax_out),
        "mode": model.mode,
    }
    meta.update(extra_meta or {})
    save_arrays(path, arrays, meta)


def _quantized_from_arrays(arrays, meta):
    from ..models.fast import QuantizedMLP

    n = sum(1 for k in arrays if k.startswith("wq_"))
    import jax.numpy as jnp

    qs = tuple(jnp.asarray(arrays[f"wq_{i}"], jnp.int8) for i in range(n))
    ss = tuple(jnp.asarray(arrays[f"s_{i}"], jnp.float32) for i in range(n))
    bs = tuple(jnp.asarray(arrays[f"b_{i}"], jnp.float32) for i in range(n))
    return QuantizedMLP(qs, ss, bs, tuple(meta["acts"]),
                        meta["softmax_out"], meta.get("mode", "w8a8"))


def load_quantized(path: str):
    arrays, meta = load_arrays(path)
    return _quantized_from_arrays(arrays, meta)


def save_autoencoder(path: str, model, extra_meta: Optional[dict] = None) -> None:
    """Save a FusedAutoencoder (the stacked encoder+decoder FusedMLP +
    the encoder/decoder split point)."""
    meta = {"kind": "fused_autoencoder", "n_enc": int(model.n_enc)}
    meta.update(extra_meta or {})
    save_fused(path, model.mlp, meta)


def load_autoencoder(path: str):
    from ..models.fast import FusedAutoencoder

    _, meta = load_arrays(path)
    return FusedAutoencoder(load_fused(path), int(meta["n_enc"]))


def save_pipeline(path: str, model, extra_meta: Optional[dict] = None) -> None:
    """Save a PipelineMLP."""
    arrays = {
        "w_in": model.w_in, "b_in": model.b_in,
        "stage_ws": model.stage_ws, "stage_bs": model.stage_bs,
        "w_out": model.w_out, "b_out": model.b_out,
    }
    meta = {"kind": "pipeline_mlp"}
    meta.update(extra_meta or {})
    save_arrays(path, arrays, meta)


def load_pipeline(path: str):
    from ..models.recurrent import RecurrentNetwork  # noqa: F401 (import cycle guard)
    from ..parallel.pipeline import PipelineMLP

    arrays, _ = load_arrays(path)
    import jax.numpy as jnp

    return PipelineMLP(*(jnp.asarray(arrays[k]) for k in
                         ("w_in", "b_in", "stage_ws", "stage_bs",
                          "w_out", "b_out")))


def _recurrent_payload(net, extra_meta: Optional[dict]) -> Tuple[dict, dict]:
    arrays = {f"param_{i}": p for i, p in enumerate(net.params)}
    arrays.update({f"state_{i}": s for i, s in enumerate(net.states)})
    meta = {"kind": "recurrent", "n_states": len(net.states)}
    if getattr(net, "arch", None) is not None:
        # gen_net's architecture record: lets serving rebuild the exact
        # graph (sizes + activations) with no out-of-band flags
        meta["arch"] = net.arch
    meta.update(extra_meta or {})
    return arrays, meta


def save_recurrent(path: str, net, extra_meta: Optional[dict] = None) -> None:
    arrays, meta = _recurrent_payload(net, extra_meta)
    save_arrays(path, arrays, meta)


def save_recurrent_async(path: str, net, extra_meta: Optional[dict] = None):
    """``save_recurrent`` with the file write on the checkpoint thread."""
    arrays, meta = _recurrent_payload(net, extra_meta)
    return save_arrays_async(path, arrays, meta)


def recurrent_from_arrays(arrays, meta, net, be) -> Any:
    """Rebuild a RecurrentNetwork from already-loaded checkpoint
    contents, validating counts AND shapes against the template (a
    wrong architecture raises a clean error, never a KeyError)."""
    from ..models.recurrent import RecurrentNetwork
    from ..ops.shapes import ShapeError

    n_p = sum(1 for k in arrays if k.startswith("param_"))
    n_s = sum(1 for k in arrays if k.startswith("state_"))
    if n_p != len(net.params) or n_s != len(net.states):
        raise ValueError(
            f"recurrent checkpoint has {n_p} params / {n_s} states but "
            f"the template network expects {len(net.params)} / "
            f"{len(net.states)} — rebuild with the architecture it was "
            f"trained with" + (f" (stored arch: {meta['arch']})"
                               if "arch" in meta else ""))
    params = tuple(be.asarray(arrays[f"param_{i}"]) for i in range(n_p))
    states = tuple(be.asarray(arrays[f"state_{i}"]) for i in range(n_s))
    for got, want, what in (
        (params, net.param_stack, "param"),
        (states, net.state_stack, "state"),
    ):
        for i, (a, sh) in enumerate(zip(got, want)):
            if tuple(a.shape) != tuple(sh):
                raise ShapeError(
                    f"recurrent checkpoint {what} {i} has shape "
                    f"{tuple(a.shape)}, expected {tuple(sh)}")
    return RecurrentNetwork(net.op, states, params,
                            meta.get("arch", net.arch))


def load_recurrent(path: str, net, be) -> Any:
    arrays, meta = load_arrays(path)
    return recurrent_from_arrays(arrays, meta, net, be)
