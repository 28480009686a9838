"""Multi-chip communication accounting.

Two complementary views (VERDICT r4 #4):

1. ``collective_inventory(compiled)`` — ground truth from the compiled
   program: every XLA collective op (all-reduce / all-gather /
   reduce-scatter / collective-permute / all-to-all) in the optimized HLO,
   with its payload bytes and whether it sits inside a while-loop body
   (= executes once per decode step / per pipeline hop) or in straight-line
   code (= once per program call). This is what GSPMD actually inserted for
   our shardings — the reference only ever *declares* intent via
   ``_tp_plan`` hints (modeling_asteroid.py:290-291) and leaves the
   collectives to torch internals.

2. ``tp_decode_cost_model(cfg, ...)`` — an analytic v5e-ICI cost model of
   one TP-sharded decode step at the FULL serving geometry, next to the
   measured single-chip step time. The dryrun's tiny-geometry inventory
   proves *which* collectives appear; this scales their payloads to the real
   model so the table can say at which batch/geometry TP actually pays.

v5e numbers used (public "How to Scale Your Model" figures): HBM bandwidth
~819 GB/s per chip; ICI ~45 GB/s per link per direction, 2 links usable per
1D ring axis (bidirectional ring => ~90 GB/s algorithmic bandwidth for a
ring all-gather/reduce-scatter), ~1 us launch/hop latency per collective.
"""

from __future__ import annotations

import re
from typing import Dict, List, NamedTuple, Optional

HBM_GBPS = 819.0          # v5e HBM bandwidth per chip
ICI_RING_GBPS = 90.0      # bidirectional ring algorithmic bandwidth per axis
ICI_LATENCY_US = 1.0      # per-collective launch + hop latency (order of)

_DTYPE_BYTES = {
    "pred": 1, "s8": 1, "u8": 1, "s16": 2, "u16": 2, "s32": 4, "u32": 4,
    "s64": 8, "u64": 8, "f16": 2, "bf16": 2, "f32": 4, "f64": 8,
    "c64": 8, "c128": 16,
}

_COLLECTIVES = ("all-reduce", "all-gather", "reduce-scatter",
                "collective-permute", "all-to-all")

# one result shape, e.g. "bf16[2,8,64]{2,1,0}" or "f32[]"
_SHAPE_RE = re.compile(r"\b(" + "|".join(_DTYPE_BYTES) + r")\[([\d,]*)\]")
_OP_RE = re.compile(
    r"^\s*(?:ROOT\s+)?%?[\w.\-]+\s*=\s*(\(?[^=]*?)\s*"
    r"(" + "|".join(_COLLECTIVES) + r")(-start|-done)?\(")
# computation headers: "%name (args...) -> result {" / "ENTRY %name (...) {".
# Args may hold NESTED parens (tuple-typed while-loop carries), so match only
# the leading name; the caller additionally requires the line to end with "{"
# and not to be an op line (no " = " before the first "(").
_COMP_RE = re.compile(r"^\s*(?:ENTRY\s+)?%?([\w.\-]+)\s*\(")
# computation references on op lines: while bodies/conditions, conditional
# branches, reducer/scatter appliers, calls
_BODY_RE = re.compile(r"\bbody=%?([\w.\-]+)")
_REF_RE = re.compile(
    r"\b(?:body|condition|to_apply|calls)=%?([\w.\-]+)"
    r"|\bbranch_computations=\{([^}]*)\}")


class CollectiveOp(NamedTuple):
    kind: str          # all-reduce | all-gather | ...
    bytes: int         # wire payload basis (see _shape_bytes)
    computation: str   # HLO computation the op lives in
    per_step: bool     # inside a while body => runs once per loop iteration


def _shape_bytes(shape_text: str, async_start: bool) -> int:
    """Wire-payload basis bytes from an op's result-shape text.

    Sync collectives: sum over tuple parts (a tuple all-gather returns one
    gathered array per operand). Async ``-start`` ops return
    ``(operand(s), result(s), context...)`` — summing would double-count
    the payload, so take the LARGEST part instead: for all-gather that is
    the gathered result, for all-reduce / collective-permute the (equal)
    operand, for reduce-scatter the pre-scatter operand — in each case the
    payload a ring algorithm's (N-1)/N wire factor applies to.
    """
    parts = []
    for dtype, dims in _SHAPE_RE.findall(shape_text):
        n = 1
        for d in dims.split(","):
            if d:
                n *= int(d)
        parts.append(n * _DTYPE_BYTES[dtype])
    if not parts:
        return 0
    return max(parts) if async_start else sum(parts)


def collective_inventory(compiled) -> List[CollectiveOp]:
    """Scan a jax Compiled (or HLO text) for collective ops.

    ``-start``/``-done`` async pairs are counted once (on the -start).
    Loop membership comes from the call graph: computations named by a
    while op's ``body=`` attribute — and everything they reference
    transitively (nested conditionals, reducers, nested loops) — run once
    per loop iteration; every other computation runs once per program call.
    (Name heuristics are not enough: lax.cond branches are also emitted as
    ``%region_N.M`` computations but execute once per call.)
    """
    text = compiled if isinstance(compiled, str) else compiled.as_text()
    raw: List[tuple] = []                   # (kind, bytes, comp)
    refs: Dict[str, set] = {}               # comp -> referenced computations
    body_roots: set = set()
    comp = ""
    for line in text.splitlines():
        stripped = line.rstrip()
        if stripped.endswith("{") and " = " not in stripped.split("(", 1)[0]:
            m = _COMP_RE.match(line)
            if m:
                comp = m.group(1)
                continue
        for m in _REF_RE.finditer(line):
            if m.group(1):
                refs.setdefault(comp, set()).add(m.group(1))
            else:                           # branch_computations={%a, %b}
                for name in m.group(2).split(","):
                    name = name.strip().lstrip("%")
                    if name:
                        refs.setdefault(comp, set()).add(name)
        body_roots.update(_BODY_RE.findall(line))
        m = _OP_RE.match(line)
        if not m:
            continue
        shape_text, kind, suffix = m.group(1), m.group(2), m.group(3)
        if suffix == "-done":
            continue                       # counted at -start
        raw.append((kind, _shape_bytes(shape_text, suffix == "-start"), comp))

    # transitive closure: anything reachable from a while body is per-step
    per_step_comps, frontier = set(), list(body_roots)
    while frontier:
        name = frontier.pop()
        if name in per_step_comps:
            continue
        per_step_comps.add(name)
        frontier.extend(refs.get(name, ()))

    return [CollectiveOp(kind=kind, bytes=byt, computation=c,
                         per_step=c in per_step_comps)
            for kind, byt, c in raw]


def summarize_inventory(ops: List[CollectiveOp]) -> Dict[str, Dict]:
    """{'per_step': {kind: (count, bytes)}, 'per_call': {...}}"""
    out = {"per_step": {}, "per_call": {}}
    for op in ops:
        bucket = out["per_step" if op.per_step else "per_call"]
        cnt, byt = bucket.get(op.kind, (0, 0))
        bucket[op.kind] = (cnt + 1, byt + op.bytes)
    return out


def format_inventory(name: str, ops: List[CollectiveOp]) -> str:
    s = summarize_inventory(ops)
    parts = [f"[comm] {name}:"]
    for scope in ("per_step", "per_call"):
        if not s[scope]:
            continue
        items = ", ".join(f"{cnt}x {kind} ({byt / 1024:.1f} KiB)"
                          for kind, (cnt, byt) in sorted(s[scope].items()))
        parts.append(f"  {scope}: {items}")
    if len(parts) == 1:
        parts.append("  (no collectives)")
    return "\n".join(parts)


# ---------------------------------------------------------------------------
# Analytic v5e cost model at the full serving geometry
# ---------------------------------------------------------------------------

class TpCost(NamedTuple):
    tp: int
    comm_bytes: int        # ICI wire bytes per decode step (all axes)
    n_collectives: int     # collectives per decode step
    comm_us: float         # predicted ICI time per step
    weight_us: float       # per-chip weight-streaming time (the HBM floor)
    step_us: float         # predicted step = weights/tp-shard + fixed + comm
    speedup: float         # vs the measured single-chip step


def tp_decode_cost_model(cfg, batch: int, tp_sizes=(2, 4, 8),
                         single_chip_step_us: float = 3780.0,
                         weight_bound_us: float = 3290.0,
                         weight_bytes: Optional[int] = None,
                         restricted_head: bool = False) -> List[TpCost]:
    """Predict TP decode-step time on v5e ICI at the full LM geometry.

    The decode step is weight-bandwidth-bound: ``weight_bound_us`` is the
    backbone+attention share of the single-chip step, which TP divides by N
    (each chip streams 1/N of every sharded matmul's weights). Defaults are
    the artifact-of-record serving step (BENCH_r04 264.6 steps/s -> 3.78 ms
    @B8 w8a16) times the measured backbone share (stub isolation: 3.81 of
    4.38 ms = 87%). The remainder (sampling chain + logits-head fixed costs)
    stays per-chip. Comm per step, from the sharding layout lm_param_specs uses
    (colwise qkv/gate/up, rowwise o/down, vocab-sharded tied text head):

      * 2 all-reduces of the (B, 1, hidden) bf16 activations per layer
        (after o_proj and after down_proj),
      * 1 all-reduce of (B, 1, hidden) for the vocab-sharded embedding
        lookup,
      * 1 all-gather of the channel-0 logits (B, window) fp32 — the full
        152k vocab unless restricted_head.

    Wire bytes use ring costs: all-reduce = 2*(N-1)/N * payload, all-gather
    = (N-1)/N * payload. Speech heads/embeds (1025-vocab) stay replicated.
    """
    H = cfg.hidden_size
    L = cfg.num_hidden_layers
    V = (cfg.text_head_window()[1] - cfg.text_head_window()[0]
         if restricted_head else cfg.vocab_size)
    out: List[TpCost] = []
    for n in tp_sizes:
        ar_payload = batch * H * 2                     # bf16 activations
        ag_payload = batch * V * 4                     # fp32 logits
        n_ar = 2 * L + 1
        wire = (n_ar * 2 * (n - 1) / n * ar_payload
                + (n - 1) / n * ag_payload)
        n_coll = n_ar + 1
        comm_us = (wire / (ICI_RING_GBPS * 1e3)        # bytes / (GB/s) -> us
                   + n_coll * ICI_LATENCY_US)
        fixed_us = single_chip_step_us - weight_bound_us
        step_us = weight_bound_us / n + fixed_us + comm_us
        out.append(TpCost(tp=n, comm_bytes=int(wire), n_collectives=n_coll,
                          comm_us=comm_us, weight_us=weight_bound_us / n,
                          step_us=step_us,
                          speedup=single_chip_step_us / step_us))
    return out


def format_tp_cost_table(costs: List[TpCost], batch: int,
                         restricted_head: bool = False) -> str:
    head = ("[comm] v5e TP decode cost model @B%d%s "
            "(measured 1-chip step %.2f ms):"
            % (batch, " restricted-head" if restricted_head else "",
               costs[0].step_us * costs[0].speedup / 1000.0))
    rows = [head]
    for c in costs:
        rows.append(
            f"  TP={c.tp}: {c.n_collectives} collectives/step, "
            f"{c.comm_bytes / 1024:.0f} KiB wire -> {c.comm_us:.0f} us comm; "
            f"step {c.step_us / 1000:.2f} ms, {c.speedup:.2f}x 1 chip "
            f"({c.speedup / c.tp:.2f}x per-chip efficiency)")
    return "\n".join(rows)
