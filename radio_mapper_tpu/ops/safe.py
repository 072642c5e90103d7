"""Safe-mode primitives: sort-, gather- and argmax-free reductions.

These equivalents use comparisons, reductions, `reduce_window` (on-chip
verified), `jnp.roll` and iota.
The round-2 on-chip probe campaign (docs/PROBES.md) established that the
stock ops they replace (sort/argsort/top_k/gather/median/reduce_window)
are all *correct* on the target runtime — so this module is a measured
performance choice, not a correctness shield: specific stock gather
shapes run pathologically slow there (a [32, 8] → [32, 28] `jnp.take`
pair expansion measured ~6 ms, dominating the step), the sort-family's
standalone remote AOT compiles ran minutes, and the safe formulations
stay in the elementwise/matmul fast path (one-hot contractions ride the
MXU; the segmented top-k needs ~2 passes over the array). The measured
stock-vs-safe detector gap is ~0.1 ms on a ~9 ms flagship step.

Selection: each consumer calls :func:`enabled` — by default safe mode is
on when the backend is TPU and off elsewhere (CPU keeps exact stock XLA
ops); `set_safe_mode(False)` opts into stock ops (verified correct).
Numerics: median is bisected to ~1e-4 of the value range (well under
detection tolerances); everything else is exact, with stock tie-breaking
(lowest index wins).
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp

_MODE: Optional[bool] = None  # None = auto (TPU → on)


def set_safe_mode(on: Optional[bool]) -> None:
    """Force safe mode on/off, or None to restore auto (TPU → on).

    The flag is consulted at *trace* time: set it before building jitted
    functions; already-compiled programs keep the mode they were traced
    with (it is not part of the jit cache key).
    """
    global _MODE
    _MODE = on


def enabled() -> bool:
    if _MODE is not None:
        return _MODE
    return jax.default_backend() == "tpu"


def argmax_last(x: jnp.ndarray) -> jnp.ndarray:
    """argmax over the last axis via max + masked index-min (no argmax op)."""
    n = x.shape[-1]
    m = jnp.max(x, axis=-1, keepdims=True)
    idx = jax.lax.broadcasted_iota(jnp.int32, x.shape, x.ndim - 1)
    masked = jnp.where(x >= m, idx, n)
    return jnp.min(masked, axis=-1)


def take1_last(x: jnp.ndarray, k: jnp.ndarray) -> jnp.ndarray:
    """x[..., k] for per-batch integer k (no gather: one-hot reduction).

    Uses `where`, not multiply — ±inf entries must select cleanly instead
    of producing inf·0 = NaN.
    """
    idx = jax.lax.broadcasted_iota(jnp.int32, x.shape, x.ndim - 1)
    onehot = idx == k[..., None]
    return jnp.sum(jnp.where(onehot, x, jnp.zeros_like(x)), axis=-1)


def take_many_last(x: jnp.ndarray, k: jnp.ndarray) -> jnp.ndarray:
    """x[..., k_j] for a small index set k ``[..., K]`` (K one-hot sums)."""
    outs = [take1_last(x, k[..., j]) for j in range(k.shape[-1])]
    return jnp.stack(outs, axis=-1)


def pair_select(
    x: jnp.ndarray, idx: jnp.ndarray, axis: int = -1, precision=None
) -> jnp.ndarray:
    """Gather x along `axis` by a SHARED 1-D index vector, gather-free.

    Equivalent to ``jnp.take(x, idx, axis=axis)`` for axis −1/−2 — but as a
    one-hot contraction on the MXU. On the target runtime a plain XLA
    gather of even a [32, 8] → [32, 28] pair expansion measured ~6 ms
    (dominating the whole pipeline step!); this form is microseconds.
    Exact by default: one-hot entries are 0.0/1.0 and the contraction runs
    at Precision.HIGHEST, so f32 values pass through unchanged even though
    the MXU's default f32 matmul uses lossy bf16 passes. `idx` may be a
    tracer or static.

    ``precision``: override (e.g. ``Precision.DEFAULT`` = ONE bf16 MXU
    pass instead of HIGHEST's six). A default-precision select rounds the
    gathered f32 values through bf16 — ONLY acceptable for consumers that
    tolerate bf16 inputs, e.g. the PHAT chain's phase-only whitening
    (the r4 forward-precision argument; τ parity probed r5).
    """
    if axis not in (-1, -2):
        raise ValueError("pair_select supports axis -1 or -2 only")
    if precision is None:
        precision = jax.lax.Precision.HIGHEST
    n = x.shape[axis]
    idx = jnp.asarray(idx, jnp.int32)
    onehot = (
        jnp.arange(n, dtype=jnp.int32)[:, None] == idx[None, :]
    ).astype(x.dtype)  # [n, P]
    if axis == -1:
        return jnp.einsum("...n,np->...p", x, onehot, precision=precision)
    return jnp.einsum("...nf,np->...pf", x, onehot, precision=precision)


# Sliding-max implementation: "window" = one reduce_window pass over a
# circularly extended array (reduce_window verified on-chip, r2 probe
# campaign); "roll" = the original log-doubling rolls (kept as fallback —
# ~6 full-array passes at radius 10 vs ~3 for the window form).
_SLIDING_IMPL = "window"


def set_sliding_impl(name: str) -> None:
    """TRACE-TIME routing (same caveat as set_safe_mode): jit caches are
    shared per callable, so flipping this between jax.jit wrappers of the
    same function silently reuses the first trace — give each routing its
    own def/lambda when A/B-ing (docs/PROBES.md)."""
    global _SLIDING_IMPL
    if name not in ("window", "roll"):
        raise ValueError(name)
    _SLIDING_IMPL = name


def sliding_max(x: jnp.ndarray, radius: int) -> jnp.ndarray:
    """Max over a ±radius window along the last axis, with *circular* edges.

    Spectra are circular in bin index, so wraparound is the semantically
    correct boundary. Default implementation: extend the last axis
    circularly by ``radius`` on each side and take one VALID
    ``reduce_window`` pass — numerically identical to the roll-doubling
    form (both are exact circular sliding maxima) at half the HBM passes.
    """
    if radius <= 0:
        return x
    length = x.shape[-1]
    if radius >= length:
        # circular window covers every bin: the global max everywhere
        return jnp.broadcast_to(jnp.max(x, axis=-1, keepdims=True), x.shape)
    if _SLIDING_IMPL == "window":
        ext = jnp.concatenate(
            [x[..., -radius:], x, x[..., :radius]], axis=-1
        )
        dims = [1] * ext.ndim
        dims[-1] = 2 * radius + 1
        return jax.lax.reduce_window(
            ext, -jnp.inf, jax.lax.max,
            window_dimensions=tuple(dims),
            window_strides=(1,) * ext.ndim,
            padding="VALID",
        )
    result = x
    span = 1
    shift = 1
    while span < 2 * radius + 1:
        step = min(shift, 2 * radius + 1 - span)
        result = jnp.maximum(result, jnp.roll(result, step, axis=-1))
        span += step
        shift *= 2
    # `result[i]` now holds max over [i - span + 1, i]; recenter so the
    # window is symmetric about i.
    return jnp.roll(result, -radius, axis=-1)


def median_bisect(x: jnp.ndarray, iters: int = 24) -> jnp.ndarray:
    """Approximate median over the last axis by value-range bisection.

    Pure comparisons + mean-reductions; after ``iters`` steps the answer is
    within (max−min)/2^iters. For dB spectra (range ≲ 300 dB) 24 iters give
    ≪1e-4 dB error.
    """
    lo = jnp.min(x, axis=-1)
    hi = jnp.max(x, axis=-1)

    def body(_, carry):
        lo, hi = carry
        mid = 0.5 * (lo + hi)
        frac = jnp.mean((x <= mid[..., None]).astype(jnp.float32), axis=-1)
        below = frac < 0.5
        return jnp.where(below, mid, lo), jnp.where(below, hi, mid)

    lo, hi = jax.lax.fori_loop(0, iters, body, (lo, hi))
    return 0.5 * (lo + hi)


def top_k(x: jnp.ndarray, k: int) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """(values, indices) of the k largest entries, descending (stock
    tie-break: lowest index first). k iterations of masked argmax."""
    vals = []
    idxs = []
    work = x
    neg_inf = jnp.asarray(-jnp.inf, x.dtype)
    iota = jax.lax.broadcasted_iota(jnp.int32, x.shape, x.ndim - 1)
    for _ in range(k):
        i = argmax_last(work)
        v = take1_last(work, i)
        vals.append(v)
        idxs.append(i)
        work = jnp.where(iota == i[..., None], neg_inf, work)
    return jnp.stack(vals, axis=-1), jnp.stack(idxs, axis=-1)


def top_k_segmented(
    x: jnp.ndarray, k: int, segment: int
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Two-stage top-k for inputs with ≥ ``segment`` spacing between
    distinct-valued maxima (e.g. sliding-local-max peak candidates, which
    are > radius apart unless exactly equal).

    Stage 1 reduces each length-``segment`` block to its (max, argmax) in
    ~2 passes over the array; stage 2 runs the k-iteration masked argmax
    over the F/segment block maxima — a 2·F + k·3·F/segment footprint vs
    plain :func:`top_k`'s k·3·F. At the flagship F=17408, k=8, segment=8
    that is ~7× less HBM traffic for the detect stage's dominant op.

    Exactness: at most one candidate per block can hold the block max, so
    results equal :func:`top_k` whenever true peaks are ≥ ``segment``
    apart; two EXACTLY-equal candidates inside one block collapse to the
    lower index where the stock tie-break keeps both. That case is not
    just measure-zero noise — a real-valued input's conjugate-symmetric
    spectrum puts bit-equal mirrored peaks near Nyquist arbitrarily close
    — but collapsing them honors the caller's minimum-spacing contract
    (find_peaks(distance=…) semantics) where keeping both would violate
    it. Tie-breaks otherwise match (lowest index).
    """
    *b, n = x.shape
    if n % segment != 0:
        raise ValueError(f"length {n} not divisible by segment {segment}")
    xs = x.reshape(*b, n // segment, segment)
    seg_max = jnp.max(xs, axis=-1)  # [..., n/segment]
    idx = jax.lax.broadcasted_iota(jnp.int32, xs.shape, xs.ndim - 1)
    seg_arg = jnp.min(
        jnp.where(xs >= seg_max[..., None], idx, segment), axis=-1
    )  # lowest in-block index holding the max
    vals, seg_sel = top_k(seg_max, k)
    offs = take_many_last(seg_arg, seg_sel)
    return vals, seg_sel * segment + offs
