"""Fused spectral peak detection over CT-order spectra, one VMEM pass.

The XLA detect stage was the largest non-pair cost of the flagship step
(4.33 ms at 128 ch, ~2.9 ms net of the dispatch floor — docs/PROBES.md r3
profile): power + full-array log10, a full [n2, n1] un-permuting
transpose (ct_power_db), a circular reduce_window sliding max, the
noise-floor bisection and the segmented top-k each stage a separate pass
over the ~71 MB power array through HBM. This kernel reads the CT-order
spectra (fr, fi) ONCE and emits only tiny per-segment partials; every
intermediate lives in VMEM.

Reference semantics preserved (`/root/reference/buoy_node.py:401-433` via
ops/detect.py): −70 dBm threshold, median noise floor from a stride-8 bin
subsample, ±min_distance circular sliding local max, DC notch,
confidence gate. The tricks that make it one pass:

* CT layout IS the convenient layout: the CT array C[k2, k1] holds
  natural bin k = k2 + n2·k1, so natural-frequency-adjacent bins are
  adjacent along the SUBLANE (k2) axis — the circular sliding max
  becomes log-doubling sublane rolls (`pltpu.roll`), borrowing across
  column boundaries from the lane-rolled array. No un-permuting
  transpose ever materializes.
* Monotonicity: comparisons run in LINEAR power (thresholds converted
  host-side), so the full-array log10 disappears; dB is computed only
  for the stride-8 noise-floor subsample (1/8 of the array) and, by the
  XLA stage 2, for the final K peaks.
* With n2 ≡ 0 (mod 8), natural-order bins k ≡ 0 (mod 8) are EXACTLY the
  CT sublane rows k2 ≡ 0 (mod 8) (n2·k1 ≡ 0 mod 8), so the kernel's
  noise-floor subsample is the same multiset ops/detect.py bisects —
  and `safe.median_bisect` is reorder-invariant (min/max/0-1-sums), so
  the noise floor matches to the fma-rounding ulp of the fr²+fi²
  elementwise power (~1e-6 dB, tests/test_detect_fused.py).
* One segment of 8 consecutive natural bins = 8 consecutive sublanes of
  one column; the kernel emits per-segment (max, argmax) partials —
  ≤ 1 candidate per segment since sliding-local-max candidates are
  > min_distance ≥ 8 apart unless exactly equal (the same argument as
  safe.top_k_segmented) — and the top-K selection runs in XLA over the
  F/8-length partials (ops/detect.py detect_peaks_ct).

Output per spectrum row: seg_score [F/8] (linear power, −inf where no
candidate), seg_arg [F/8] (in-segment offset 0-7), noise_floor_db.
"""

from __future__ import annotations

import functools
import math
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from radio_mapper_tpu.ops.pallas import fft_kernel

SEGMENT = 8  # natural bins per emitted partial; must divide n2


def supported(nfft: int, *, min_distance_bins: int, noise_floor_stride: int) -> bool:
    """Whether the fused detect kernel covers this configuration.

    Needs a CT factorization with n2 ≡ 0 (mod 8) (tile-aligned planner
    lengths — multiples of 1024 — always qualify), the stride-8
    noise-floor subsample the kernel hardcodes, segment exactness
    (candidates ≥ SEGMENT apart ⇔ min_distance + 1 ≥ SEGMENT), and a
    column tall enough for the roll-borrow construction: every sliding
    shift borrows from exactly ONE adjacent column, so each shift must
    be ≤ n2 — the doubling steps max out at the largest power of two
    ≤ window/2 ≤ radius, and the recenter shift is exactly radius, so
    the bound is radius ≤ n2. Small nfft (1024 ⇒ n2 = 8 < 10) routes
    back to the XLA stage.
    """
    if noise_floor_stride != SEGMENT or min_distance_bins + 1 < SEGMENT:
        return False
    try:
        _n1, n2 = fft_kernel.ct_split(nfft)
    except ValueError:
        return False
    return n2 % SEGMENT == 0 and n2 >= min_distance_bins


def _shift_down(x, s: int, n2: int):
    """Natural-order circular shift by +s of a CT-layout [rows, n2, n1]
    array: z[k] = x[(k − s) mod F]. Sublane roll, with the top s sublanes
    of each column borrowed from the PREVIOUS column (lane roll by +1) —
    which also realizes the overall F-circular wrap at column 0."""
    xr = pltpu.roll(x, s, 1)
    xp = pltpu.roll(pltpu.roll(x, 1, 2), s, 1)
    i2 = jax.lax.broadcasted_iota(jnp.int32, x.shape, 1)
    return jnp.where(i2 < s, xp, xr)


def _shift_up(x, s: int, n2: int, n1: int):
    """z[k] = x[(k + s) mod F] — bottom s sublanes borrow from the NEXT
    column."""
    xr = pltpu.roll(x, n2 - s, 1)
    xn = pltpu.roll(pltpu.roll(x, n1 - 1, 2), n2 - s, 1)
    i2 = jax.lax.broadcasted_iota(jnp.int32, x.shape, 1)
    return jnp.where(i2 >= n2 - s, xn, xr)


def _detect_body(
    fre, fim,
    *,
    rows: int,
    n1: int,
    n2: int,
    radius: int,
    thr_lin: float,
    keep_lo: int,
    keep_hi: int,
    conf_cs: Optional[float],
    power_offset_db: float,
    bisect_iters: int,
    emit_topk: int = 0,
):
    """Value-level detect stage on `rows` CT-order spectra of length n1·n2.

    Shared by :func:`detect_ct_partials`'s kernel and the fused
    FFT+detect kernel (:func:`fft_detect_rows_ct`) — spectra in, partial
    values out; callers own the output refs. Returns
    ``(score, arg, nf128, row_max128)`` where ``row_max128`` is the
    per-row max LINEAR power broadcast to a [rows, 128] lane block (the
    per-receiver PHAT-gate input — free here since the power array is
    already resident).

    ``emit_topk=K > 0`` finishes the selection IN-KERNEL: K unrolled
    masked-argmax passes over the VMEM-resident segment partials, so the
    outputs are already the final top-K (vals/flat-segment/offset packed
    into the first K lanes of [rows, 128] blocks) and the XLA stage-2
    top-k over the F/8 partials disappears from HBM entirely."""
    n = n1 * n2
    n2g = n2 // SEGMENT

    pr = fre * fre + fim * fim  # [rows, n] linear power, CT flat order
    row_max = jnp.max(pr, axis=-1, keepdims=True)  # [rows, 1]
    row_max128 = jnp.broadcast_to(row_max, (rows, 128))

    # ---- noise floor: stride-8 natural subsample = sublane rows k2≡0 (8)
    sub = pr.reshape(rows * n2g, SEGMENT, n1)[:, 0:1, :].reshape(rows, n2g * n1)
    sub_db = 10.0 * jnp.log10(sub + 1e-24) + power_offset_db
    lo = jnp.min(sub_db, axis=-1, keepdims=True)
    hi = jnp.max(sub_db, axis=-1, keepdims=True)

    def bisect(_, carry):
        lo, hi = carry
        mid = 0.5 * (lo + hi)
        frac = jnp.mean((sub_db <= mid).astype(jnp.float32), axis=-1, keepdims=True)
        below = frac < 0.5
        return jnp.where(below, mid, lo), jnp.where(below, hi, mid)

    lo, hi = jax.lax.fori_loop(0, bisect_iters, bisect, (lo, hi))
    nf = 0.5 * (lo + hi)  # [rows, 1] dB incl. power_offset_db
    nf128 = jnp.broadcast_to(nf, (rows, 128))

    # ---- circular sliding local max along NATURAL bin order (3-D view)
    p3 = pr.reshape(rows, n2, n1)
    w = 2 * radius + 1
    m = p3
    span, shift = 1, 1
    while span < w:
        step = min(shift, w - span)
        m = jnp.maximum(m, _shift_down(m, step, n2))
        span += step
        shift *= 2
    smax = _shift_up(m, radius, n2, n1).reshape(rows, n)

    # ---- candidacy gates (all comparisons in linear power)
    cand = pr >= smax
    cand = jnp.logical_and(cand, pr + 1e-24 > thr_lin)
    # natural index from the CT flat index m = k2·n1 + k1
    mi = jax.lax.broadcasted_iota(jnp.int32, pr.shape, 1)
    k_nat = mi % n1 * n2 + mi // n1
    cand = jnp.logical_and(cand, k_nat >= keep_lo)
    cand = jnp.logical_and(cand, k_nat <= keep_hi)
    if conf_cs is not None:
        # power_db − nf ≥ c·S  ⇔  p + 1e-24 ≥ 10^((nf − off + c·S)/10)
        conf_lin = jnp.exp(
            (nf - power_offset_db + conf_cs) * (math.log(10.0) / 10.0)
        )
        cand = jnp.logical_and(cand, pr + 1e-24 >= conf_lin)

    score = jnp.where(cand, pr, -jnp.inf)

    # ---- per-segment (max, argmax) partials: 8 sublanes of one column
    s3 = score.reshape(rows * n2g, SEGMENT, n1)
    seg_max = jnp.max(s3, axis=1, keepdims=True)  # [rows·n2g, 1, n1]
    off = jax.lax.broadcasted_iota(jnp.int32, s3.shape, 1)
    seg_arg = jnp.min(
        jnp.where(s3 >= seg_max, off, SEGMENT), axis=1
    )  # [rows·n2g, n1] lowest in-segment offset holding the max
    seg_score = seg_max.reshape(rows, n2g * n1)
    seg_arg_f = seg_arg.reshape(rows, n2g * n1).astype(jnp.float32)
    if not emit_topk:
        return seg_score, seg_arg_f, nf128, row_max128

    # ---- in-kernel top-K over the VMEM-resident partials (same masked
    # argmax + lowest-index tie-break as safe.top_k)
    s = n2g * n1
    iota_s = jax.lax.broadcasted_iota(jnp.int32, (rows, s), 1)
    lane = jax.lax.broadcasted_iota(jnp.int32, (rows, 128), 1)
    vals = jnp.zeros((rows, 128), jnp.float32)
    idxs = jnp.zeros((rows, 128), jnp.float32)
    work = seg_score
    for k in range(emit_topk):
        m = jnp.max(work, axis=-1, keepdims=True)  # [rows, 1]
        sel = jnp.min(
            jnp.where(work >= m, iota_s, s), axis=-1, keepdims=True
        )  # lowest index holding the max (all −inf ⇒ 0, matching top_k)
        hit = iota_s == sel
        o = jnp.sum(jnp.where(hit, seg_arg_f, 0.0), axis=-1, keepdims=True)
        vals = jnp.where(lane == k, m, vals)
        # pack flat-segment index and in-segment offset as one f32:
        # combined = 8·(b2·n1 + k1) + off < 2^21 — exact in f32
        idxs = jnp.where(
            lane == k, 8.0 * sel.astype(jnp.float32) + o, idxs
        )
        work = jnp.where(hit, -jnp.inf, work)
    return vals, idxs, nf128, row_max128


def _detect_kernel(fre_ref, fim_ref, score_ref, arg_ref, nf_ref, **params):
    """pallas_call shim over :func:`_detect_body` (spectra from HBM)."""
    score, arg, nf128, _row_max = _detect_body(fre_ref[:], fim_ref[:], **params)
    score_ref[:] = score
    arg_ref[:] = arg
    nf_ref[:] = nf128


def notch_keep_range(
    nfft: int, sample_rate_hz: float, dc_notch_hz: Optional[float]
) -> Tuple[int, int]:
    """[keep_lo, keep_hi] natural-bin range surviving the DC notch.

    Computed host-side with the SAME numpy arithmetic as
    ops/detect.py's static mask (|fftfreq| ≥ notch is False on a single
    contiguous circular region around DC), so in-kernel integer
    comparisons reproduce it bit-for-bit.
    """
    if dc_notch_hz is None:
        return 0, nfft - 1
    freqs = np.fft.fftfreq(nfft, d=1.0 / sample_rate_hz)
    mask = np.abs(freqs) >= dc_notch_hz
    kept = np.flatnonzero(mask)
    if kept.size == 0:
        return 1, 0  # empty range: notch swallows every bin
    return int(kept[0]), int(kept[-1])


def _detect_plan(
    nfft: int,
    *,
    sample_rate_hz: float,
    threshold_db: float,
    min_distance_bins: int,
    dc_notch_hz: Optional[float],
    confidence_floor: float,
    snr_fullscale_db: float,
    power_offset_db: float,
    bisect_iters: int,
    emit_topk: int,
):
    """Validate + derive the static kernel params shared by the plain
    detect kernel and the fused FFT+detect kernel. Returns
    ``(n1, n2, params)`` with ``params`` the `_detect_body` kwargs
    (minus ``rows``)."""
    n1, n2 = fft_kernel.ct_split(nfft)
    if n2 % SEGMENT != 0:
        raise ValueError(f"nfft {nfft}: n2 {n2} not a multiple of {SEGMENT}")
    if min_distance_bins + 1 < SEGMENT:
        raise ValueError(
            f"min_distance_bins {min_distance_bins} < {SEGMENT - 1} breaks "
            "segment exactness"
        )
    if emit_topk and not 0 < emit_topk <= 128:
        raise ValueError("emit_topk must be in 1..128 (one lane block)")
    if n2 < min_distance_bins:
        raise ValueError(
            f"nfft {nfft}: column height n2={n2} < radius "
            f"{min_distance_bins} breaks the one-column roll-borrow "
            f"construction — use the XLA detect stage"
        )
    thr_lin = float(10.0 ** ((threshold_db - power_offset_db) / 10.0))
    if confidence_floor > 1.0:
        # clip(snr/S) ≤ 1 < floor: nothing can ever pass. Keep the
        # detect_peaks contract (the noise floor is still computed and
        # reported) by running the kernel with an impossible threshold
        # instead of short-circuiting: partials come back all −inf, nf
        # is the real bisected median.
        thr_lin = float("inf")
        conf_cs = None
    else:
        conf_cs = (
            confidence_floor * snr_fullscale_db if confidence_floor > 0.0 else None
        )
    keep_lo, keep_hi = notch_keep_range(nfft, sample_rate_hz, dc_notch_hz)
    params = dict(
        n1=n1, n2=n2,
        radius=min_distance_bins,
        thr_lin=thr_lin, keep_lo=keep_lo, keep_hi=keep_hi,
        conf_cs=conf_cs, power_offset_db=power_offset_db,
        bisect_iters=bisect_iters, emit_topk=emit_topk,
    )
    return n1, n2, params


def detect_ct_partials(
    spec_re: jnp.ndarray,
    spec_im: jnp.ndarray,
    *,
    sample_rate_hz: float,
    threshold_db: float,
    min_distance_bins: int,
    dc_notch_hz: Optional[float],
    confidence_floor: float,
    snr_fullscale_db: float,
    power_offset_db: float = 0.0,
    # 16 rows halve the grid-cell count: stage 3.37 vs 4.90 ms at 1024
    # rows on-chip (probe_ab_depth_rows); ~9 MB of live VMEM per cell.
    rows_per_block: int = 16,
    bisect_iters: int = 24,
    interpret: Optional[bool] = None,
    vma=None,
    emit_topk: int = 0,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Per-segment detection partials from CT-order spectra.

    Args:
      spec_re/spec_im: ``[..., nfft]`` CT-order spectra
        (:func:`fft_kernel.fft_rows_ct` output).
    Returns:
      With ``emit_topk=0``: ``(seg_score, seg_arg, noise_floor_db)`` of
      shapes ``[..., nfft/8]``, ``[..., nfft/8]`` (float offsets 0-7),
      ``[...]``. ``seg_score`` is LINEAR power (monotonic in dB), −inf
      where the segment holds no candidate; segment f = b2·n1 + k1
      covers natural bins (8·b2 + off) + n2·k1.
      With ``emit_topk=K``: ``(top_vals, top_packed, noise_floor_db)``
      of shapes ``[..., K]`` — the selection already finished in-kernel;
      ``top_packed = 8·f + off`` as float (exact below 2²⁴).
    """
    nfft = spec_re.shape[-1]
    n1, n2, params = _detect_plan(
        nfft,
        sample_rate_hz=sample_rate_hz,
        threshold_db=threshold_db,
        min_distance_bins=min_distance_bins,
        dc_notch_hz=dc_notch_hz,
        confidence_floor=confidence_floor,
        snr_fullscale_db=snr_fullscale_db,
        power_offset_db=power_offset_db,
        bisect_iters=bisect_iters,
        emit_topk=emit_topk,
    )
    if interpret is None:
        interpret = jax.default_backend() != "tpu"

    batch_shape = spec_re.shape[:-1]
    batch = int(np.prod(batch_shape)) if batch_shape else 1
    re2 = spec_re.reshape(batch, nfft).astype(jnp.float32)
    im2 = spec_im.reshape(batch, nfft).astype(jnp.float32)
    padded = -(-batch // rows_per_block) * rows_per_block
    if padded != batch:
        pad = ((0, padded - batch), (0, 0))
        re2 = jnp.pad(re2, pad)
        im2 = jnp.pad(im2, pad)

    n2g = n2 // SEGMENT
    out_cols = 128 if emit_topk else n2g * n1
    grid = (padded // rows_per_block,)
    in_spec = pl.BlockSpec(
        (rows_per_block, nfft), lambda i: (i, 0), memory_space=pltpu.VMEM
    )
    seg_spec = pl.BlockSpec(
        (rows_per_block, out_cols), lambda i: (i, 0), memory_space=pltpu.VMEM
    )
    nf_spec = pl.BlockSpec(
        (rows_per_block, 128), lambda i: (i, 0), memory_space=pltpu.VMEM
    )
    kernel = functools.partial(_detect_kernel, rows=rows_per_block, **params)
    score, arg, nf = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[in_spec, in_spec],
        out_specs=[seg_spec, seg_spec, nf_spec],
        out_shape=[
            fft_kernel._sds((padded, out_cols), jnp.float32, vma),
            fft_kernel._sds((padded, out_cols), jnp.float32, vma),
            fft_kernel._sds((padded, 128), jnp.float32, vma),
        ],
        interpret=interpret,
    )(re2, im2)
    keep = emit_topk if emit_topk else out_cols
    score = score[:batch, :keep].reshape(*batch_shape, keep)
    arg = arg[:batch, :keep].reshape(*batch_shape, keep)
    nf = nf[:batch, 0].reshape(batch_shape)
    return score, arg, nf


# ------------------------------------------------- fused FFT + detect
#
# The r4 pipeline ran the forward CT-FFT kernel and the detect kernel as
# two pallas_calls: the FFT wrote ~142 MB of spectra to HBM (128 ch × 8
# buoys × 17408 bins × 2 planes × f32) and the detect kernel immediately
# read every byte back. This kernel runs BOTH per grid cell: transform
# `rows` padded time rows in VMEM (fft_kernel.ct_fft_core — pure MXU),
# write the spectra ONCE (the GCC pair stage still consumes them), and
# run the detect body (pure VPU) on the in-register spectra, emitting the
# tiny partials. The detect stage's HBM read disappears entirely, and its
# VPU work pipelines against the next cell's DFT matmuls on the MXU.
#
# The same epilogue also emits each row's max LINEAR power — the
# per-receiver PHAT-gate input (gcc_kernel "l2rx" mode), free here since
# the power array is already resident for detection.


def _fft_detect_kernel(
    xre_ref, xim_ref,
    w1re_ref, w1im_ref, w2re_ref, w2im_ref, twre_ref, twim_ref,
    ore_ref, oim_ref, score_ref, arg_ref, nf_ref, rmax_ref,
    *,
    rows: int,
    precision: Optional[str],
    **params,
):
    dot = fft_kernel.kernel_dot(override=precision)
    ore, oim = fft_kernel.ct_fft_core(
        xre_ref[:], xim_ref[:],
        w1re_ref[:], w1im_ref[:], w2re_ref[:], w2im_ref[:],
        twre_ref[:], twim_ref[:],
        rows=rows, n1=params["n1"], n2=params["n2"], dot=dot,
    )
    ore_ref[:] = ore
    oim_ref[:] = oim
    score, arg, nf128, rmax128 = _detect_body(ore, oim, rows=rows, **params)
    score_ref[:] = score
    arg_ref[:] = arg
    nf_ref[:] = nf128
    rmax_ref[:] = rmax128


def fft_detect_rows_ct(
    re: jnp.ndarray,
    im: jnp.ndarray,
    *,
    sample_rate_hz: float,
    threshold_db: float,
    min_distance_bins: int,
    dc_notch_hz: Optional[float],
    confidence_floor: float,
    snr_fullscale_db: float,
    power_offset_db: float = 0.0,
    rows_per_block: Optional[int] = None,
    bisect_iters: int = 24,
    interpret: Optional[bool] = None,
    vma=None,
    emit_topk: int = 0,
    precision: Optional[str] = None,
):
    """Forward CT-order FFT + fused detection in ONE kernel pass.

    Args:
      re/im: ``[..., nfft]`` float32 time rows, already zero-padded to a
        CT-supported length (same contract as `fft_kernel.fft_rows_ct`).
      precision: forward-dot override (see `fft_kernel.kernel_dot`).
      Detection params mirror :func:`detect_ct_partials`.
    Returns:
      ``(fr, fi, seg_score, seg_arg, noise_floor_db, row_max)`` —
      fr/fi are the CT-order spectra (identical to `fft_rows_ct`), the
      detect outputs match `detect_ct_partials(fr, fi, ...)` exactly
      (same ops on the same f32 values — the HBM round-trip it removes
      was exact), and ``row_max`` is each row's max linear power
      ``[...]`` (the per-receiver PHAT-gate input).
    """
    if re.shape != im.shape:
        raise ValueError("re/im shape mismatch")
    nfft = re.shape[-1]
    n1, n2, params = _detect_plan(
        nfft,
        sample_rate_hz=sample_rate_hz,
        threshold_db=threshold_db,
        min_distance_bins=min_distance_bins,
        dc_notch_hz=dc_notch_hz,
        confidence_floor=confidence_floor,
        snr_fullscale_db=snr_fullscale_db,
        power_offset_db=power_offset_db,
        bisect_iters=bisect_iters,
        emit_topk=emit_topk,
    )
    (_, _, w1re, w1im, w2re, w2im, twre, twim) = fft_kernel.ct_constants(nfft)
    if rows_per_block is None:
        # Combined working set ≈ FFT I/O + power + roll temporaries; 16
        # rows measured fastest for the plain kernels at flagship nfft and
        # the shared tiles keep the union under the scoped-VMEM budget.
        rows_per_block = 16 if nfft <= 24_576 else 8
    if interpret is None:
        interpret = jax.default_backend() != "tpu"

    batch_shape = re.shape[:-1]
    batch = int(np.prod(batch_shape)) if batch_shape else 1
    re2 = re.reshape(batch, nfft).astype(jnp.float32)
    im2 = im.reshape(batch, nfft).astype(jnp.float32)
    padded = -(-batch // rows_per_block) * rows_per_block
    if padded != batch:
        pad = ((0, padded - batch), (0, 0))
        re2 = jnp.pad(re2, pad)
        im2 = jnp.pad(im2, pad)

    n2g = n2 // SEGMENT
    out_cols = 128 if emit_topk else n2g * n1
    grid = (padded // rows_per_block,)
    row_spec = pl.BlockSpec(
        (rows_per_block, nfft), lambda i: (i, 0), memory_space=pltpu.VMEM
    )
    seg_spec = pl.BlockSpec(
        (rows_per_block, out_cols), lambda i: (i, 0), memory_space=pltpu.VMEM
    )
    lane_spec = pl.BlockSpec(
        (rows_per_block, 128), lambda i: (i, 0), memory_space=pltpu.VMEM
    )
    const_spec = lambda a: pl.BlockSpec(
        a.shape, lambda i: (0, 0), memory_space=pltpu.VMEM
    )
    kernel = functools.partial(
        _fft_detect_kernel, rows=rows_per_block, precision=precision, **params
    )
    fr, fi, score, arg, nf, rmax = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            row_spec, row_spec,
            const_spec(w1re), const_spec(w1im),
            const_spec(w2re), const_spec(w2im),
            const_spec(twre), const_spec(twim),
        ],
        out_specs=[row_spec, row_spec, seg_spec, seg_spec, lane_spec, lane_spec],
        out_shape=[
            fft_kernel._sds((padded, nfft), jnp.float32, vma),
            fft_kernel._sds((padded, nfft), jnp.float32, vma),
            fft_kernel._sds((padded, out_cols), jnp.float32, vma),
            fft_kernel._sds((padded, out_cols), jnp.float32, vma),
            fft_kernel._sds((padded, 128), jnp.float32, vma),
            fft_kernel._sds((padded, 128), jnp.float32, vma),
        ],
        interpret=interpret,
    )(
        re2, im2,
        fft_kernel._lift(w1re, vma), fft_kernel._lift(w1im, vma),
        fft_kernel._lift(w2re, vma), fft_kernel._lift(w2im, vma),
        fft_kernel._lift(twre, vma), fft_kernel._lift(twim, vma),
    )
    keep = emit_topk if emit_topk else out_cols
    fr = fr[:batch].reshape(*batch_shape, nfft)
    fi = fi[:batch].reshape(*batch_shape, nfft)
    score = score[:batch, :keep].reshape(*batch_shape, keep)
    arg = arg[:batch, :keep].reshape(*batch_shape, keep)
    nf = nf[:batch, 0].reshape(batch_shape)
    rmax = rmax[:batch, 0].reshape(batch_shape)
    return fr, fi, score, arg, nf, rmax
