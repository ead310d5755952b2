"""Mesh planning: which (dp, pp, tp) factorization should this model
train on?

The reference never faces the question (single-process, SURVEY.md
§2.5); a production deployment faces it before anything else.  This
module enumerates every feasible ``(data, stage, model)`` factorization
of a device count for a concrete Network + batch size and scores each
with the same ANALYTIC quantities the rest of the framework exposes —
per-device FLOPs (``_op_flops``), pipeline bubble fraction and stage
balance (``_balanced_partition``), per-device training-state memory
(``training_memory_report``'s accounting extended by stage sharding) —
so the operator comparison that SCALING.md walks through by hand is one
call: ``plan_meshes(net, 8, batch_size=4096)``.

Scores are analytic, not measured — they rank configurations by
arithmetic intensity and schedule overhead, deliberately ignoring
collective latency constants that vary per interconnect.  Measure the
top candidates with ``profiling.profile_step`` /
``profiling.memory_analysis`` before committing hardware; the planner's
job is to shrink the search space, loudly stating what it ignores.
"""

from __future__ import annotations

from typing import List, Optional

import numpy as np

from ..models.feedforward import Network

__all__ = ["plan_meshes", "describe_plans"]


def _factorizations(n: int):
    """All (dp, pp, tp) with dp*pp*tp == n, each >= 1."""
    out = []
    for pp in range(1, n + 1):
        if n % pp:
            continue
        rest = n // pp
        for tp in range(1, rest + 1):
            if rest % tp:
                continue
            out.append((rest // tp, pp, tp))
    return out


def _net_flops_and_segments(net: Network):
    from .ir_pipeline import _op_flops, network_segments

    segs = network_segments(net)
    per_seg = [_op_flops(op) for op, _ in segs]
    return per_seg, segs


def _tp_shardable(net: Network, tp: int) -> bool:
    from .ir_pipeline import _tp_local_segment_split, network_segments

    return all(
        _tp_local_segment_split(op, tp) is not None
        for op, _ in network_segments(net))


def plan_meshes(net: Network, n_devices: int, batch_size: int,
                optimizer=None, microbatches: int = 4,
                shard_opt_state: bool = False,
                zero_stage: Optional[int] = None,
                dtype_bytes: Optional[int] = None) -> List[dict]:
    """Rank every feasible ``(dp, pp, tp)`` mesh for training ``net``
    with ``fit(mesh=...)``: returns dicts sorted by ``analytic_cost``
    (lower is better), each carrying the mesh shape, feasibility notes,
    per-device FLOPs/step, bubble fraction + stage balance for pipeline
    configs, and per-device training-state bytes (params + grads +
    moments, stage/model/ZeRO sharding applied).

    Feasibility mirrors ``fit``'s own validation AND its actual
    sharding rules: the batch must split over dp (and over the
    microbatch grid under pp); pp needs at least S composition
    segments.  tp follows the code path the config would take — under
    pp the pipeline partitioners' all-or-nothing row-sharding rule
    (``_tp_local_segment_split``); without pp ``param_specs``' per-
    weight rule (either dim divisible shards, so e.g. the flagship's
    (10, 100) head column-shards under tp=4) — replicated weights are
    flagged in ``notes``, fully idle tp as ``tp_idle``."""
    if zero_stage is None:
        zero_stage = 1 if shard_opt_state else 0
    shard_opt_state = shard_opt_state or zero_stage >= 1
    per_seg, segs = _net_flops_and_segments(net)
    n_seg = len(per_seg)
    # each segment's rank-2 weight (the shardable tensor) and param count
    seg_w = []
    seg_nparam = []
    for op, _ in segs:
        w2 = [s for s in op.in_stack[1:] if len(s) == 2]
        seg_w.append(w2[0] if w2 else None)
        seg_nparam.append(sum(int(np.prod(s, dtype=np.int64)) if s else 1
                              for s in op.in_stack[1:]))
    if dtype_bytes is None:
        dtype_bytes = np.dtype(net.params[0].dtype).itemsize
    from ..models.optim import moment_footprint

    moment_b_per_elem = moment_footprint(optimizer, dtype_bytes)

    from .ir_pipeline import _balanced_partition

    plans = []
    for dp, pp, tp in _factorizations(n_devices):
        notes = []
        M = microbatches if pp > 1 else 1
        if batch_size % (dp * M):
            continue  # fit would reject: batch can't grid over dp x M
        if pp > 1 and M < pp:
            notes.append(f"needs microbatches >= {pp} for the circular "
                         f"schedule (GPipe still runs)")
        if pp > n_seg:
            continue  # not enough composition segments to cut
        # per-segment tp division, following the code path this config
        # would actually take
        if tp > 1 and pp > 1:
            # pipeline partitioners: all-or-nothing row sharding
            eng = _tp_shardable(net, tp)
            seg_div = [tp if eng else 1] * n_seg
            if not eng:
                notes.append("tp_idle: a segment doesn't row-shard at "
                             "this width — weights replicate (loud "
                             "warning path)")
        elif tp > 1:
            # fit's non-pipeline tp: param_specs shards each weight on
            # EITHER divisible dim, replicating only no-dim weights
            seg_div = [tp if (w is not None
                              and (w[0] % tp == 0 or w[1] % tp == 0))
                       else 1 for w in seg_w]
            n_repl = sum(1 for d in seg_div if d == 1)
            if all(d == 1 for d in seg_div):
                notes.append("tp_idle: no weight has a tp-divisible "
                             "dim — all replicate (loud warning path)")
            elif n_repl:
                notes.append(f"tp_partial: {n_repl}/{n_seg} segment "
                             f"weight(s) have no tp-divisible dim and "
                             f"replicate")
        else:
            seg_div = [1] * n_seg
        tp_engaged = tp == 1 or any(d > 1 for d in seg_div)
        per_seg_eff = [f / d for f, d in zip(per_seg, seg_div)]

        # per-device compute: stage cut from the SAME min-max DP the
        # partitioner uses (over raw per-segment FLOPs); the slowest
        # stage's tp-divided FLOPs set the clock
        if pp > 1:
            bounds = _balanced_partition(per_seg, pp)
            stage_raw = [sum(per_seg[a:b]) for a, b in bounds]
            balance = max(stage_raw) / (sum(stage_raw) / pp)
            bubble = (pp - 1) / (M + pp - 1)
            clock = max(sum(per_seg_eff[a:b]) for a, b in bounds)
        else:
            balance, bubble = 1.0, 0.0
            clock = sum(per_seg_eff)
        flops_dev = clock * (batch_size / dp)
        cost = flops_dev / (1.0 - bubble)

        # per-device training state: each segment's params split over
        # its tp divisor, everything over pp stages; moments
        # additionally over dp under ZeRO-1
        p_full = sum(npar * dtype_bytes / d
                     for npar, d in zip(seg_nparam, seg_div)) / pp
        m_dev = (moment_b_per_elem / dtype_bytes
                 * p_full / (dp if (shard_opt_state and dp > 1) else 1))
        g_dev = p_full / (dp if (zero_stage >= 2 and dp > 1) else 1)
        p_dev = p_full / (dp if (zero_stage >= 3 and dp > 1) else 1)
        if zero_stage >= 3 and dp > 1:
            notes.append("zero3: params AND grads AND moments /dp "
                         "(gather-at-use; exact accounting in "
                         "training_memory_report)")
        elif zero_stage >= 2 and dp > 1:
            notes.append("zero2: moments AND grads /dp (reduce-scatter; "
                         "exact accounting in training_memory_report)")
        elif shard_opt_state and dp > 1:
            notes.append("zero1: moments /dp (first free divisible dim; "
                         "exact accounting in training_memory_report)")
        mem_dev = p_dev + g_dev + m_dev  # params + grads + moments
        plans.append({
            "mesh_shape": {"data": dp, "stage": pp, "model": tp},
            "flops_per_device": flops_dev,
            "bubble_fraction": bubble,
            "stage_balance": balance,
            "analytic_cost": cost,
            "training_state_bytes_per_device": int(mem_dev),
            "tp_engaged": tp_engaged,
            "notes": notes,
        })
    # ties on analytic cost break toward LESS communication: tp gathers
    # per layer per microbatch, pp permutes per tick, dp psums once per
    # step — the constants the cost deliberately ignores still order
    # equal-FLOPs configs; memory breaks what's left
    def _key(p):
        m = p["mesh_shape"]
        comm = (2 * (m["model"] > 1 and p["tp_engaged"])
                + (m["stage"] > 1))
        return (p["analytic_cost"], comm,
                p["training_state_bytes_per_device"])

    plans.sort(key=_key)
    return plans


def describe_plans(plans: List[dict], top: int = 8) -> str:
    """Render ``plan_meshes`` output as the operator-facing table."""
    lines = ["mesh (dp,pp,tp)  cost(flops/dev)  bubble  balance  "
             "state/dev  notes"]
    for p in plans[:top]:
        m = p["mesh_shape"]
        lines.append(
            f"({m['data']},{m['stage']},{m['model']})".ljust(17)
            + f"{p['flops_per_device']:.3e}".ljust(17)
            + f"{p['bubble_fraction']:.2f}".ljust(8)
            + f"{p['stage_balance']:.2f}".ljust(9)
            + f"{p['training_state_bytes_per_device']:>9d}  "
            + ("; ".join(p["notes"]) or "-"))
    if len(plans) > top:
        lines.append(f"... {len(plans) - top} more")
    return "\n".join(lines)
