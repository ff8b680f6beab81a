"""Roofline accounting for jitted programs (MFU / bandwidth utilization).

XLA's own compiled-program cost analysis supplies the FLOP and HBM-byte
counts (exact for the compiled HLO — no hand-counted model math to drift
out of sync); peak numbers below are TPU v5e specs, overridable by env
for other chips:

* ``NERF_TPU_PEAK_FLOPS``  — default 1.97e14 (v5e bf16 MXU peak; XLA's
  default matmul precision on TPU is bf16 even for f32 arrays,
  docs/DESIGN.md section 3)
* ``NERF_TPU_PEAK_BYTES``  — default 8.19e11 (v5e HBM, 819 GB/s)

``roofline(cost, seconds)`` reports achieved FLOP/s, MFU, achieved
bytes/s, bandwidth utilization, and which resource the roofline says
binds — the evidence VERDICT round 2 asked for behind "the dense MLP is
matmul-bound".
"""

import os
from typing import Dict, Optional

V5E_PEAK_FLOPS = 1.97e14
V5E_PEAK_BYTES_PER_SEC = 8.19e11


def _prod(xs):
    out = 1
    for x in xs:
        out *= int(x)
    return out


def _dot_general_flops(eqn) -> float:
    (lc, rc), (lb, rb) = eqn.params["dimension_numbers"]
    lhs = eqn.invars[0].aval.shape
    rhs = eqn.invars[1].aval.shape
    batch = _prod(lhs[i] for i in lb)
    k = _prod(lhs[i] for i in lc)
    m = _prod(lhs[i] for i in range(len(lhs)) if i not in set(lc) | set(lb))
    n = _prod(rhs[i] for i in range(len(rhs)) if i not in set(rc) | set(rb))
    return 2.0 * batch * m * n * k


def jaxpr_matmul_flops(jaxpr) -> float:
    """Analytic matmul FLOPs of a (Closed)Jaxpr — MFU's conventional
    numerator, counted without any backend at all.

    The axon remote-compile backend exposes no XLA cost analysis
    (``lowered_cost`` returns None there, and forcing ``.compile()``
    would re-do a multi-minute relay compile), so the bench falls back
    to walking the traced jaxpr: 2*M*N*K per ``dot_general`` (batch dims
    multiplied in), recursing into every sub-jaxpr. ``scan`` bodies are
    multiplied by their trip count; ``while`` bodies are counted ONCE
    (trip count is data-dependent — none of our hot steps use one);
    ``cond`` takes the most expensive branch. Elementwise/gather work is
    deliberately excluded: MFU is defined on matrix-unit FLOPs.
    """
    jaxpr = getattr(jaxpr, "jaxpr", jaxpr)  # accept ClosedJaxpr
    total = 0.0
    for eqn in jaxpr.eqns:
        prim = eqn.primitive.name
        if prim == "dot_general":
            total += _dot_general_flops(eqn)
            continue
        subs = []
        for val in eqn.params.values():
            if hasattr(val, "eqns") or hasattr(val, "jaxpr"):
                subs.append(val)
            elif isinstance(val, (tuple, list)):
                subs.extend(v for v in val
                            if hasattr(v, "eqns") or hasattr(v, "jaxpr"))
        if not subs:
            continue
        if prim == "cond":
            total += max(jaxpr_matmul_flops(s) for s in subs)
        else:
            mult = eqn.params.get("length", 1) if prim == "scan" else 1
            total += mult * sum(jaxpr_matmul_flops(s) for s in subs)
    return total


def traced_flops(fn, *args, **kwargs) -> Optional[Dict[str, float]]:
    """Trace ``fn`` (host-only, seconds) and return analytic matmul FLOPs
    as a ``lowered_cost``-shaped dict with no byte count (``bytes`` is a
    layout/fusion property only the compiler knows)."""
    import jax

    try:
        closed = jax.make_jaxpr(fn, **kwargs)(*args)
    except Exception:
        return None
    flops = jaxpr_matmul_flops(closed)
    if flops <= 0.0:
        return None
    return dict(flops=flops, bytes=None, source="jaxpr-matmul")


def lowered_cost(lowered) -> Optional[Dict[str, float]]:
    """FLOPs / bytes-accessed of an already-``lower()``-ed jit program per
    XLA cost analysis (``None`` when the backend exposes no cost model —
    some PJRT plugins; callers should then omit MFU rather than guess)."""
    try:
        try:
            # Pre-compile HLO cost analysis when the JAX version exposes
            # it: .compile() here would RE-compile a program the caller
            # already ran (up to ~5 min over the remote relay, 3x per
            # bench run).
            analysis = lowered.cost_analysis()
        except Exception:
            import jax

            if jax.default_backend() == "axon":
                # Remote-compile relay: a re-compile costs minutes and
                # its cost analysis comes back empty anyway — let the
                # caller fall through to the analytic jaxpr counter.
                return None
            analysis = lowered.compile().cost_analysis()
        if isinstance(analysis, (list, tuple)):  # some backends wrap per-device
            analysis = analysis[0]
        if not analysis:
            return None
        flops = float(analysis.get("flops", 0.0))
        bytes_accessed = float(analysis.get("bytes accessed", 0.0))
        if flops <= 0.0:
            return None
        return dict(flops=flops, bytes=bytes_accessed)
    except Exception:
        return None


def roofline(cost: Optional[Dict[str, float]], seconds: float) -> Dict[str, float]:
    """Achieved rates vs chip peaks for one program execution."""
    if cost is None or seconds <= 0:
        return {}
    peak_flops = float(os.environ.get("NERF_TPU_PEAK_FLOPS", V5E_PEAK_FLOPS))
    peak_bytes = float(os.environ.get("NERF_TPU_PEAK_BYTES", V5E_PEAK_BYTES_PER_SEC))
    achieved_flops = cost["flops"] / seconds
    if cost.get("bytes") is None:
        # Analytic (jaxpr-walk) source: matmul FLOPs are exact but bytes
        # are a compiler/layout property — report the MXU side only.
        return dict(
            tflops=round(achieved_flops / 1e12, 2),
            mfu=round(achieved_flops / peak_flops, 4),
            flops_source=cost.get("source", "jaxpr-matmul"),
        )
    achieved_bytes = cost["bytes"] / seconds
    compute_time = cost["flops"] / peak_flops
    memory_time = cost["bytes"] / peak_bytes
    bound = "compute" if compute_time >= memory_time else "memory"
    # Utilization against whichever resource the roofline says binds:
    # the fraction of speed-of-light this program achieved.
    sol = max(compute_time, memory_time) / seconds
    return dict(
        tflops=round(achieved_flops / 1e12, 2),
        mfu=round(achieved_flops / peak_flops, 4),
        gbps=round(achieved_bytes / 1e9, 1),
        bw_util=round(achieved_bytes / peak_bytes, 4),
        bound=bound,
        speed_of_light_frac=round(sol, 4),
    )
