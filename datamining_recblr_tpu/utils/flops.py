"""FLOPs and compile-time cost introspection.

Replaces the reference's ``get_flops`` call (reference ``run.py:77-78``,
RecBole util) with XLA's own cost analysis of the compiled forward —
exact for the compiled graph rather than a torch module walk."""

from __future__ import annotations

import jax


def forward_flops(fn, *example_args) -> float | None:
    """FLOPs of one compiled call of ``fn`` per XLA cost analysis."""
    try:
        compiled = jax.jit(fn).lower(*example_args).compile()
        cost = compiled.cost_analysis()
        if isinstance(cost, list):  # older jax returns [dict]
            cost = cost[0]
        return float(cost.get("flops", float("nan")))
    except Exception:
        return None
