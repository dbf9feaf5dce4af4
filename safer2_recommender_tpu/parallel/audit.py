"""Collective-traffic accounting for compiled SPMD programs.

The scaling story (docs/SCALING.md) rests on the claim that an epoch's
cross-device traffic is small relative to its compute. That claim is
easy to get wrong silently — e.g. scattering sharded solved rows into a
*replicated* table makes XLA materialize an all-gather of every solved
row — so instead of asserting it from the sharding spec, this module
measures it from the compiled HLO: every collective op and the bytes of
its result shape. Used by scripts/audit_collectives.py (the numbers in
docs/SCALING.md) and tests/test_multidevice.py (a regression gate on
per-epoch collective bytes).
"""

from __future__ import annotations

import re
from collections import defaultdict
from typing import Dict, Tuple

_COLLECTIVES = ("all-reduce", "all-gather", "reduce-scatter", "all-to-all",
                "collective-permute", "collective-broadcast")

_DTYPE_BYTES = {
    "f64": 8, "f32": 4, "bf16": 2, "f16": 2, "f8e4m3fn": 1, "f8e5m2": 1,
    "s64": 8, "s32": 4, "s16": 2, "s8": 1,
    "u64": 8, "u32": 4, "u16": 2, "u8": 1, "pred": 1,
}

# `%x = f32[128,16]{1,0} all-reduce(...)` — also matches tuple-free
# start-done pairs; `-start` ops are skipped (their `-done` twin carries
# the same shape and counting both would double the bytes).
_OP_RE = re.compile(
    r"=\s+(?:\([^)]*\)\s+)?(\w+)\[([0-9,]*)\][^ ]*\s+"
    r"(" + "|".join(_COLLECTIVES) + r")(-start|-done)?\(")


def _shape_bytes(dtype: str, dims: str) -> int:
    n = 1
    for d in dims.split(","):
        if d:
            n *= int(d)
    return n * _DTYPE_BYTES.get(dtype, 4)


def collective_traffic(hlo_text: str) -> Dict[str, Tuple[int, int]]:
    """{collective kind: (op count, result bytes summed)} for one
    compiled module's text (``jit(f).lower(...).compile().as_text()``).

    Bytes are per-device result-shape bytes — a proxy for link traffic
    (an all-gather's result is the gathered array each device ends up
    holding; an all-reduce moves ~2x its shape in a ring, but the
    proxy's purpose is regression gating and order-of-magnitude docs,
    not link-level modeling).
    """
    out: Dict[str, Tuple[int, int]] = defaultdict(lambda: (0, 0))
    for m in _OP_RE.finditer(hlo_text):
        dtype, dims, kind, phase = m.groups()
        if phase == "-start":
            continue
        c, b = out[kind]
        out[kind] = (c + 1, b + _shape_bytes(dtype, dims))
    return dict(out)


def total_bytes(traffic: Dict[str, Tuple[int, int]]) -> int:
    return sum(b for _, b in traffic.values())
