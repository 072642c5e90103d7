"""Fused GCC pair stage: whiten × inverse-FFT × lag-slice in one kernel.

The XLA formulation of all-pairs GCC-PHAT stages every intermediate
through HBM: gathered pair spectra ([..., P, nfft] complex — a B→P
blow-up), the whitened cross-power, and the full-length correlation, of
which only ±max_lag samples are ever read
(`/root/reference/tdoa_processor.py:156-193` walks the same pairs in
Python). This kernel keeps the whole pair stage inside VMEM: per grid
cell it loads ONE channel's B receiver spectra (CT bin order, from
:func:`fft_kernel.fft_rows_ct`), forms a static chunk of pair
cross-spectra by register gather, whitens, runs the four-step inverse DFT
as two MXU matmuls batched over the chunk, and writes only the lag-window
magnitudes. HBM traffic per pair drops from ~5 full-length complex arrays
to (amortized) one spectrum read + a ~1 KB window write.

Bin order: inputs are CT-order spectra (m = k2·n1 + k1 holding bin
k = k2 + n2·k1). PHAT/CC weighting is permutation-invariant, and the
inverse kernel consumes CT order directly and emits natural TIME order —
so no transpose ever materializes, which is what lets the flagship GCC
length (n1=128, any n2) fuse at all (see fft_kernel module note).

Lag convention matches :func:`radio_mapper_tpu.ops.gcc_phat.cross_correlate`:
window rows are [corr[nfft−L:], corr[:L+1]], lag −L..+L, lag > 0 ⇒ x (the
pair's first/receiver-i signal) delayed vs y.
"""

from __future__ import annotations

import functools
from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from radio_mapper_tpu.ops.pallas import fft_kernel

# Pairs processed per grid cell. 32 measured 1.16× faster than 8 at the
# flagship shape (one spectra fetch + bigger inverse matmuls; interleaved
# on-chip A/B, docs/PROBES.md r3); VMEM stays a few MB per plane.
# Consulted at TRACE time via set_default_pair_chunk (same caveat as
# every routing knob: jit caches are shared per callable).
DEFAULT_PAIR_CHUNK = 32


def set_default_pair_chunk(n: int) -> None:
    global DEFAULT_PAIR_CHUNK
    DEFAULT_PAIR_CHUNK = int(n)

WEIGHTINGS = ("phat", "cc")

# PHAT eps-gate algebra (TRACE-time knob, same caveats as every routing
# flag). "l1": R/(|R| + eps·max|R|) — the reference-parity
# form. "l2" (default): R/sqrt(|R|² + eps²·max|R|²) — identical
# asymptotics on both sides of the gate (ratio → 1 for |R| ≫ eps·s,
# → eps·s for |R| ≪ eps·s; worst-case 1.41× deviation AT the knee, which
# only the suppressed bins see), but the whole whiten collapses to one
# reduction + ONE rsqrt — no |R| materialization, no reciprocal. Probed
# on-chip r4: τ parity 7.6e-4 samples on correlated scenes, step 6.26 →
# 5.95 ms/block at 128 ch × scan-16 (docs/probe_logs/ab_gate_r4.log) —
# the default since the gate is this framework's own stabilizer (the
# reference never correlates waveforms at all; PHAT semantics proper are
# unchanged away from the eps knee).
# "l2rx" (DEFAULT since r5): the l2 floor with the per-pair reduction
# REPLACED by the per-receiver bound max|R_ij|² ≤ max|X_i|²·max|Y_j|² —
# the pair kernel then runs NO spectral reduction at all (the
# per-receiver maxima arrive precomputed from the fused FFT+detect
# kernel's epilogue, where the power array is already resident). The
# bound overestimates the gate scale when X's and Y's maxima sit at
# different bins — equivalent to a modestly larger eps, i.e. a slightly
# stronger floor on already-suppressed bins; requires ``row_smax``
# (falls back to "l2" without). Probed on-chip r5
# (docs/probe_logs/ab_r5_fuse.log): step 5.82 → 5.24 ms/block at 128 ch
# × scan-16 with the combined FFT+detect kernel, τ parity vs l2 EXACTLY
# 0 on a correlated 20 dB scene (the same bin maximizes |X|, |Y| and
# |XY*|, making the bound tight) and 0.011 samples at 3 dB SNR (CPU).
_PHAT_GATE = "l2rx"


def set_phat_gate(mode: str) -> None:
    if mode not in ("l1", "l2", "l2rx"):
        raise ValueError(f"unknown phat gate {mode!r}")
    global _PHAT_GATE
    _PHAT_GATE = mode


def supported(nfft: int, weighting: str = "phat") -> bool:
    """Whether the fused pair stage can run for this length/weighting."""
    return weighting in WEIGHTINGS and fft_kernel.ct_supported(nfft)


def plan_nfft(min_len: int) -> int:
    """Smallest fused-kernel-compatible FFT length ≥ ``min_len``.

    Multiples of 1024 guarantee a fully tile-aligned split (n1 multiple
    of 128 lanes AND n2 multiple of 8 sublanes) — ≤ 1023 samples of
    padding, and measured far faster to compile/run on-chip than
    lane-only-aligned lengths.
    """
    n = -(-min_len // 1024) * 1024
    while not fft_kernel.ct_supported(n):  # pragma: no cover — n2 > 1024
        n += 1024
    return n



def _whiten(rre, rim, eps, gate=None, s2=None):
    """PHAT whitening under the gate algebra (see _PHAT_GATE).

    l1: |R| via x·rsqrt(x) and ONE reciprocal instead of sqrt + two
    divides (A/B'd on-chip r3: neutral vs sqrt+div). l2: the whole block
    is one max-reduction + one rsqrt — no |R|, no reciprocal. l2rx: the
    caller supplies ``s2`` ([m, 1], per-receiver max product) and the
    reduction disappears entirely.
    """
    if gate is None:
        gate = _PHAT_GATE
    p2 = rre * rre + rim * rim
    if gate == "l2rx":
        inv = jax.lax.rsqrt(p2 + (eps * eps) * s2 + 1e-30)
    elif gate == "l2":
        s2 = jnp.max(p2, axis=-1, keepdims=True)  # max|R|² per pair
        inv = jax.lax.rsqrt(p2 + (eps * eps) * s2 + 1e-30)
    else:
        inv_mag = jax.lax.rsqrt(p2 + 1e-30)
        mag = p2 * inv_mag
        scale = jnp.max(mag, axis=-1, keepdims=True)  # per-pair gate
        inv = 1.0 / (mag + eps * scale + 1e-30)
    return rre * inv, rim * inv


# How the dense pair kernel forms per-pair X/Y rows from the resident
# spectra. "concat": 2·P keepdim [1, nfft] slice-products concatenated —
# single-sublane values Mosaic lays out masked (1/8 VPU utilization).
# "onehot" (DEFAULT since r5): two [m, B]×[B, nfft] MXU dots with
# CONSTANT one-hot matrices (pairs are static) produce dense
# full-sublane X/Y blocks, then one dense elementwise cross-power.
# On-chip A/B (docs/probe_logs/ab_r5_gather.log): full step 5.30 → 5.04
# ms/block at 128 ch × scan-16 — confirming the masked-layout cost of
# the [1, nfft] slices. PHAT runs the one-hot dots single-pass bf16
# (phase consumer); "cc" keeps HIGHEST (exact pass-through).
_PAIR_GATHER = "onehot"


def set_pair_gather(mode: str) -> None:
    if mode not in ("concat", "onehot"):
        raise ValueError(f"unknown pair gather {mode!r}")
    global _PAIR_GATHER
    _PAIR_GATHER = mode


def _pair_onehots(pairs, b: int):
    """Constant one-hot row-selector matrices [m, b] for a static pair
    chunk (i-rows and j-rows)."""
    m = len(pairs)
    ohi = np.zeros((m, b), np.float32)
    ohj = np.zeros((m, b), np.float32)
    for k, (i, j) in enumerate(pairs):
        ohi[k, i] = 1.0
        ohj[k, j] = 1.0
    return ohi, ohj


def _gcc_pairs_kernel(
    sre_ref, sim_ref,
    w1re_ref, w1im_ref, w2negre_ref, w2negim_ref,
    w2posre_ref, w2posim_ref, twre_ref, twim_ref,
    *rest,
    pairs: Tuple[Tuple[int, int], ...],
    n1: int,
    n2: int,
    eps: float,
    whiten: bool,
    gate: str = "l2",
    gather: str = "concat",
    gather_precision: Optional[str] = None,
):
    """One grid cell = one channel × one static pair chunk.

    All values stay rank-2/3 with the lane dim a multiple of n1 and no
    unit leading dims — Mosaic's layout inference aborts on rank-1
    vectors and leading-1 reshapes (observed on-chip: `inferReshape`
    check failure), so rows are sliced keepdim and outputs are 2-D.

    ``gate == "l2rx"`` adds a ``smax_ref`` input ([B, 128] per-receiver
    max linear power, lane-broadcast) ahead of the output refs; with
    ``gather == "onehot"`` two constant one-hot refs precede that (see
    `_PAIR_GATHER`).
    """
    rest = list(rest)
    ohi_ref = ohj_ref = None
    if gather == "onehot":
        ohi_ref, ohj_ref = rest[0], rest[1]
        rest = rest[2:]
    if gate == "l2rx":
        smax_ref, oneg_ref, opos_ref = rest
    else:
        oneg_ref, opos_ref = rest
    m = len(pairs)
    # The relaxed single-pass-bf16 inverse knob is justified ONLY by PHAT's
    # flat post-whitening dynamic range; the unwhitened "cc" cross-spectrum
    # spans the signal's full range and keeps the main (bf16x3) precision.
    dot = fft_kernel.kernel_dot(inverse=whiten)

    a_re = sre_ref[:]  # [B, nfft] CT-order spectra
    a_im = sim_ref[:]

    if gather == "onehot":
        dot_g = fft_kernel.kernel_dot(override=gather_precision or "highest")
        dn = (((1,), (0,)), ((), ()))
        ohi, ohj = ohi_ref[:], ohj_ref[:]
        xre = dot_g(ohi, a_re, dn)
        xim = dot_g(ohi, a_im, dn)
        yre = dot_g(ohj, a_re, dn)
        yim = dot_g(ohj, a_im, dn)
        rre = xre * yre + xim * yim
        rim = xim * yre - xre * yim
    else:
        # Static register gather (keepdim slices → 2-D concat, not
        # stack): cross-power R = X_i · conj(Y_j) per pair, [m, nfft].
        row = lambda a, k: a[k : k + 1, :]
        rre = jnp.concatenate(
            [
                row(a_re, i) * row(a_re, j) + row(a_im, i) * row(a_im, j)
                for i, j in pairs
            ],
            axis=0,
        )
        rim = jnp.concatenate(
            [
                row(a_im, i) * row(a_re, j) - row(a_re, i) * row(a_im, j)
                for i, j in pairs
            ],
            axis=0,
        )

    if whiten:
        s2 = None
        if gate == "l2rx":
            smax = smax_ref[:]  # [B, 128] lane-broadcast per-receiver max
            if gather == "onehot":
                dn = (((1,), (0,)), ((), ()))
                # dense [m, 128] products of the selected rows' maxima
                s2 = (
                    fft_kernel.kernel_dot(override="highest")(ohi_ref[:], smax, dn)
                    * fft_kernel.kernel_dot(override="highest")(ohj_ref[:], smax, dn)
                )[:, :1]
            else:
                s2 = jnp.concatenate(
                    [
                        smax[i : i + 1, :1] * smax[j : j + 1, :1]
                        for i, j in pairs
                    ],
                    axis=0,
                )  # [m, 1] — max|X_i|²·max|Y_j|² ≥ max|R_ij|²
        rre, rim = _whiten(rre, rim, eps, gate=gate, s2=s2)

    _invert_to_lag_windows(
        rre, rim, w1re_ref, w1im_ref, w2negre_ref, w2negim_ref,
        w2posre_ref, w2posim_ref, twre_ref, twim_ref, oneg_ref, opos_ref,
        m=m, n1=n1, n2=n2, dot=dot,
    )


def _invert_to_lag_windows(
    rre, rim, w1re_ref, w1im_ref, w2negre_ref, w2negim_ref,
    w2posre_ref, w2posim_ref, twre_ref, twim_ref, oneg_ref, opos_ref,
    *, m: int, n1: int, n2: int, dot,
):
    """Shared inverse tail: whitened cross-power [m, nfft] → lag windows.

    Only the lag window's q-rows of the outer inverse DFT are ever read
    (time t = q·n1 + p; ±max_lag covers nneg+npos ≈ 9 of n2 ≈ 136 rows),
    so the outer matmul uses PRE-SLICED W2 row blocks and outputs are
    emitted lag-row-major (the wrapper transposes the tiny windows in
    XLA). Measured on-chip r3: wall-clock NEUTRAL vs the full-row version
    (the MXU's 128-row minimum tile absorbs most of the nominal 15× row
    reduction, and the removed transposes/sqrt were cheap); kept because
    it halves the kernels' workspace VMEM, dedupes both kernels into this
    one tail, and shrinks the emitted output buffers ~15×.
    """
    n = n1 * n2
    dn = (((1,), (0,)), ((), ()))
    # Inner inverse DFT over k1 (minor): [m, nfft] → [m·n2, n1] rows.
    rre = rre.reshape(m * n2, n1)
    rim = rim.reshape(m * n2, n1)
    w1re, w1im = w1re_ref[:], w1im_ref[:]
    ere = dot(rre, w1re, dn) - dot(rim, w1im, dn)
    eim = dot(rre, w1im, dn) + dot(rim, w1re, dn)

    # Inverse twiddle W_n^{+p·k2}: broadcast over the chunk (3-D view, no
    # materialized concat of m copies).
    twre = twre_ref[:]
    twim = twim_ref[:]
    e3re = ere.reshape(m, n2, n1)
    e3im = eim.reshape(m, n2, n1)
    c3re = e3re * twre[None] - e3im * twim[None]
    c3im = e3re * twim[None] + e3im * twre[None]

    # Outer inverse DFT over k2, windowed rows only:
    # z[q, m·p] = Σ_{k2} W2c[q, k2] · C[k2, m·p] for q in the lag window.
    regroup = lambda c: jnp.transpose(c, (1, 0, 2)).reshape(n2, m * n1)
    cre, cim = regroup(c3re), regroup(c3im)
    for w2r_ref, w2i_ref, out_ref in (
        (w2negre_ref, w2negim_ref, oneg_ref),
        (w2posre_ref, w2posim_ref, opos_ref),
    ):
        w2r, w2i = w2r_ref[:], w2i_ref[:]
        zre = dot(w2r, cre, dn) - dot(w2i, cim, dn)
        zim = dot(w2r, cim, dn) + dot(w2i, cre, dn)
        # [rows_padded, m·n1] lag-row-major magnitudes
        out_ref[:] = jnp.sqrt(zre * zre + zim * zim) * (1.0 / n)


def _w2_window_rows(w2re, w2im, n2, nneg, npos):
    """Pre-sliced outer-DFT row blocks covering only the lag window,
    sublane-padded to multiples of 8 (padding rows are zero → zero output
    rows, sliced off by the caller)."""
    nneg_p = -(-nneg // 8) * 8
    npos_p = -(-npos // 8) * 8
    padr = lambda a, rows: np.pad(a, ((0, rows - a.shape[0]), (0, 0)))
    return (
        padr(w2re[n2 - nneg:], nneg_p), padr(w2im[n2 - nneg:], nneg_p),
        padr(w2re[:npos], npos_p), padr(w2im[:npos], npos_p),
        nneg_p, npos_p,
    )


def _window_rows_to_pair_major(o, groups, rows_p, rows, m, n1):
    """[groups·rows_p, m·n1] lag-row-major kernel output → [groups, m, rows·n1].

    The kernel emits lag-major so it never un-transposes the full inverse
    output; this tiny window transpose runs in XLA."""
    o = o.reshape(groups, rows_p, m, n1)[:, :rows]
    return jnp.transpose(o, (0, 2, 1, 3)).reshape(groups, m, rows * n1)


def _pair_chunks(
    pair_i: np.ndarray, pair_j: np.ndarray, chunk: int
) -> Sequence[Tuple[Tuple[Tuple[int, int], ...], int]]:
    """Static pair chunks padded to a multiple of 8 rows (TPU sublane
    tiling: block sublane dims must divide by 8). Returns
    ``[(pairs_padded, real_count), ...]`` — padding repeats pair 0 and is
    sliced off by the caller."""
    pairs = [(int(i), int(j)) for i, j in zip(pair_i, pair_j)]
    chunk = max(8, -(-chunk // 8) * 8)
    out = []
    for k in range(0, len(pairs), chunk):
        part = pairs[k : k + chunk]
        real = len(part)
        pad = -(-real // 8) * 8 - real
        out.append((tuple(part + [part[0]] * pad), real))
    return out


def gcc_pair_lag_mags(
    spec_re: jnp.ndarray,
    spec_im: jnp.ndarray,
    pair_i: np.ndarray,
    pair_j: np.ndarray,
    *,
    max_lag: int,
    eps: float = 0.05,
    weighting: str = "phat",
    pair_chunk: Optional[int] = None,
    interpret: Optional[bool] = None,
    vma=None,
    row_smax: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """Correlation-magnitude lag windows for all pairs.

    Args:
      spec_re/spec_im: ``[..., B, nfft]`` CT-order spectra
        (:func:`fft_kernel.fft_rows_ct` output).
      pair_i/pair_j: static receiver index arrays, length P.
      row_smax: optional ``[..., B]`` per-receiver max linear spectral
        power (from the fused FFT+detect kernel) — enables the "l2rx"
        PHAT gate, which runs NO spectral reduction in this kernel.
    Returns:
      ``[..., P, 2·max_lag+1]`` float32 |r| at lags −max_lag..+max_lag.
    """
    if weighting not in WEIGHTINGS:
        raise ValueError(f"fused GCC supports {WEIGHTINGS}, not {weighting!r}")
    if pair_chunk is None:
        pair_chunk = DEFAULT_PAIR_CHUNK
    gate = _PHAT_GATE
    if gate == "l2rx" and (row_smax is None or weighting != "phat"):
        gate = "l2"  # bound input unavailable — keep the per-pair form
    gather = _PAIR_GATHER
    # bf16 one-hot selects are the PHAT-only policy (phase consumer);
    # "cc" under onehot keeps HIGHEST so f32 spectra pass exactly
    gather_precision = "default" if weighting == "phat" else None
    nfft = spec_re.shape[-1]
    b = spec_re.shape[-2]
    n1, n2, w1re, w1im, w2re, w2im, twre, twim = fft_kernel.ct_constants(
        nfft, inverse=True
    )
    if max_lag >= nfft // 2:
        raise ValueError(f"max_lag {max_lag} too large for nfft {nfft}")
    if interpret is None:
        interpret = jax.default_backend() != "tpu"

    nneg = -(-max_lag // n1)  # tail rows covering lags −nneg·n1 .. −1
    npos = max_lag // n1 + 1  # head rows covering lags 0 .. npos·n1−1

    batch_shape = spec_re.shape[:-2]
    c = int(np.prod(batch_shape)) if batch_shape else 1
    # Everything 2-D at the pallas boundary (Mosaic-friendliest layouts):
    # spectra rows flattened to [c·b_pad, nfft], outputs to [c·m, window].
    # Receiver rows pad to a multiple of 8 (sublane tiling requirement).
    b_pad = -(-b // 8) * 8
    sre = spec_re.reshape(c, b, nfft).astype(jnp.float32)
    sim = spec_im.reshape(c, b, nfft).astype(jnp.float32)
    if b_pad != b:
        padw = ((0, 0), (0, b_pad - b), (0, 0))
        sre = jnp.pad(sre, padw)
        sim = jnp.pad(sim, padw)
    sre = sre.reshape(c * b_pad, nfft)
    sim = sim.reshape(c * b_pad, nfft)

    smax_in = None
    if gate == "l2rx":
        # [..., B] → [c·b_pad, 128] lane-broadcast (tiny: 4 KB per 8 rows)
        sm = row_smax.reshape(c, b).astype(jnp.float32)
        if b_pad != b:
            sm = jnp.pad(sm, ((0, 0), (0, b_pad - b)))
        smax_in = jnp.broadcast_to(
            sm.reshape(c * b_pad, 1), (c * b_pad, 128)
        ) * jnp.float32(1.0)

    spec_spec = pl.BlockSpec((b_pad, nfft), lambda i: (i, 0), memory_space=pltpu.VMEM)
    smax_spec = pl.BlockSpec((b_pad, 128), lambda i: (i, 0), memory_space=pltpu.VMEM)
    w2negre, w2negim, w2posre, w2posim, nneg_p, npos_p = _w2_window_rows(
        w2re, w2im, n2, nneg, npos
    )
    # Specs from STATIC numpy shapes (the values may be tracers under jit).
    const_arrays = (w1re, w1im, w2negre, w2negim, w2posre, w2posim, twre, twim)
    const_specs = [
        pl.BlockSpec(a.shape, lambda i: (0, 0), memory_space=pltpu.VMEM)
        for a in const_arrays
    ]
    consts = tuple(fft_kernel._lift(a, vma) for a in const_arrays)

    outs = []
    for pairs, m_real in _pair_chunks(pair_i, pair_j, pair_chunk):
        m = len(pairs)
        kernel = functools.partial(
            _gcc_pairs_kernel,
            pairs=pairs, n1=n1, n2=n2,
            eps=eps, whiten=(weighting == "phat"), gate=gate,
            gather=gather, gather_precision=gather_precision,
        )
        out_spec = lambda rows: pl.BlockSpec(
            (rows, m * n1), lambda i: (i, 0), memory_space=pltpu.VMEM
        )
        in_specs = [spec_spec, spec_spec] + const_specs
        args = (sre, sim, *consts)
        if gather == "onehot":
            ohi, ohj = _pair_onehots(pairs, b_pad)
            oh_spec = pl.BlockSpec(
                ohi.shape, lambda i: (0, 0), memory_space=pltpu.VMEM
            )
            in_specs = in_specs + [oh_spec, oh_spec]
            args = args + (fft_kernel._lift(ohi, vma), fft_kernel._lift(ohj, vma))
        if gate == "l2rx":
            in_specs = in_specs + [smax_spec]
            args = args + (smax_in,)
        oneg, opos = pl.pallas_call(
            kernel,
            grid=(c,),
            in_specs=in_specs,
            out_specs=[out_spec(nneg_p), out_spec(npos_p)],
            out_shape=[
                fft_kernel._sds((c * nneg_p, m * n1), jnp.float32, vma),
                fft_kernel._sds((c * npos_p, m * n1), jnp.float32, vma),
            ],
            interpret=interpret,
        )(*args)
        oneg = _window_rows_to_pair_major(oneg, c, nneg_p, nneg, m, n1)
        opos = _window_rows_to_pair_major(opos, c, npos_p, npos, m, n1)
        # lags −max_lag..−1 from the tail of the neg rows; 0..max_lag from
        # the head of the pos rows.
        window = jnp.concatenate(
            [oneg[..., nneg * n1 - max_lag :], opos[..., : max_lag + 1]],
            axis=-1,
        )
        outs.append(window[:, :m_real])
    window = jnp.concatenate(outs, axis=-2)  # [c, P, 2L+1]
    return window.reshape(*batch_shape, len(pair_i), 2 * max_lag + 1)


def _gcc_rows_kernel(
    xre_ref, xim_ref, yre_ref, yim_ref,
    w1re_ref, w1im_ref, w2negre_ref, w2negim_ref,
    w2posre_ref, w2posim_ref, twre_ref, twim_ref,
    *rest,
    rows: int,
    n1: int,
    n2: int,
    eps: float,
    whiten: bool,
    rx_gate: bool = False,
):
    """Row-aligned variant of :func:`_gcc_pairs_kernel`: row k of X pairs
    with row k of Y — no static gather, so the grid tiles over PAIR ROWS
    and VMEM stays bounded at ``rows`` spectra regardless of how many
    pairs the caller has (the dense-gather kernel maps ALL receiver rows
    per cell, which OOMs VMEM when the "receivers" are thousands of
    pair-EP pseudo-rows).

    ``rx_gate=True`` adds an ``s2_ref`` input ([rows, 128] lane-broadcast
    per-pair gate scales, precomputed by the caller from per-receiver
    maxima) ahead of the output refs — the l2rx form with NO spectral
    reduction in-kernel."""
    if rx_gate:
        s2_ref, oneg_ref, opos_ref = rest
    else:
        oneg_ref, opos_ref = rest
    m = rows
    # The relaxed single-pass-bf16 inverse knob is justified ONLY by PHAT's
    # flat post-whitening dynamic range; the unwhitened "cc" cross-spectrum
    # spans the signal's full range and keeps the main (bf16x3) precision.
    dot = fft_kernel.kernel_dot(inverse=whiten)

    xre, xim = xre_ref[:], xim_ref[:]
    yre, yim = yre_ref[:], yim_ref[:]
    rre = xre * yre + xim * yim
    rim = xim * yre - xre * yim

    if whiten:
        if rx_gate:
            rre, rim = _whiten(rre, rim, eps, gate="l2rx", s2=s2_ref[:, :1])
        else:
            # No per-pair gate scales plumbed: l2rx degrades to l2
            # (same floor, per-pair reduction).
            gate = "l2" if _PHAT_GATE == "l2rx" else _PHAT_GATE
            rre, rim = _whiten(rre, rim, eps, gate=gate)

    _invert_to_lag_windows(
        rre, rim, w1re_ref, w1im_ref, w2negre_ref, w2negim_ref,
        w2posre_ref, w2posim_ref, twre_ref, twim_ref, oneg_ref, opos_ref,
        m=m, n1=n1, n2=n2, dot=dot,
    )


def gcc_rows_lag_mags(
    xre: jnp.ndarray,
    xim: jnp.ndarray,
    yre: jnp.ndarray,
    yim: jnp.ndarray,
    *,
    max_lag: int,
    eps: float = 0.05,
    weighting: str = "phat",
    rows_chunk: Optional[int] = None,
    interpret: Optional[bool] = None,
    vma=None,
    s2: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """Correlation-magnitude lag windows for row-aligned pair spectra.

    Args:
      xre/xim, yre/yim: ``[P, nfft]`` CT-order spectra; pair k correlates
        X row k against Y row k (R = X·conj(Y)).
      s2: optional ``[P]`` per-pair PHAT gate scales
        (max|X_k|²·max|Y_k|², precomputed from per-receiver maxima) —
        enables the "l2rx" gate: NO spectral reduction in this kernel.
    Returns:
      ``[P, 2·max_lag+1]`` float32 |r| at lags −max_lag..+max_lag.

    The pair-EP path uses this: its per-shard pair slice is dynamic, so
    the one-hot matmul gather materializes X/Y row-aligned and this
    kernel fuses the whiten × inverse × window stage with VMEM bounded by
    ``rows_chunk``, not the pair count.
    """
    if weighting not in WEIGHTINGS:
        raise ValueError(f"fused GCC supports {WEIGHTINGS}, not {weighting!r}")
    if rows_chunk is None:
        rows_chunk = DEFAULT_PAIR_CHUNK
    rx_gate = (
        _PHAT_GATE == "l2rx" and s2 is not None and weighting == "phat"
    )
    nfft = xre.shape[-1]
    p = xre.shape[0]
    n1, n2, w1re, w1im, w2re, w2im, twre, twim = fft_kernel.ct_constants(
        nfft, inverse=True
    )
    if max_lag >= nfft // 2:
        raise ValueError(f"max_lag {max_lag} too large for nfft {nfft}")
    if interpret is None:
        interpret = jax.default_backend() != "tpu"

    nneg = -(-max_lag // n1)
    npos = max_lag // n1 + 1

    chunk = max(8, -(-rows_chunk // 8) * 8)
    p_pad = -(-p // chunk) * chunk
    if p_pad != p:
        padw = ((0, p_pad - p), (0, 0))
        xre, xim = jnp.pad(xre, padw), jnp.pad(xim, padw)
        yre, yim = jnp.pad(yre, padw), jnp.pad(yim, padw)

    s2_in = None
    if rx_gate:
        s2v = s2.astype(jnp.float32)
        if p_pad != p:
            # padded rows whiten against a unit gate (outputs sliced off)
            s2v = jnp.pad(s2v, (0, p_pad - p), constant_values=1.0)
        s2_in = jnp.broadcast_to(
            s2v.reshape(p_pad, 1), (p_pad, 128)
        ) * jnp.float32(1.0)

    row_spec = pl.BlockSpec((chunk, nfft), lambda i: (i, 0), memory_space=pltpu.VMEM)
    s2_spec = pl.BlockSpec((chunk, 128), lambda i: (i, 0), memory_space=pltpu.VMEM)
    w2negre, w2negim, w2posre, w2posim, nneg_p, npos_p = _w2_window_rows(
        w2re, w2im, n2, nneg, npos
    )
    const_arrays = (w1re, w1im, w2negre, w2negim, w2posre, w2posim, twre, twim)
    const_specs = [
        pl.BlockSpec(a.shape, lambda i: (0, 0), memory_space=pltpu.VMEM)
        for a in const_arrays
    ]
    consts = tuple(fft_kernel._lift(a, vma) for a in const_arrays)

    kernel = functools.partial(
        _gcc_rows_kernel,
        rows=chunk, n1=n1, n2=n2,
        eps=eps, whiten=(weighting == "phat"), rx_gate=rx_gate,
    )
    groups = p_pad // chunk
    out_spec = lambda rows: pl.BlockSpec(
        (rows, chunk * n1), lambda i: (i, 0), memory_space=pltpu.VMEM
    )
    in_specs = [row_spec] * 4 + const_specs
    args = (xre, xim, yre, yim, *consts)
    if rx_gate:
        in_specs = in_specs + [s2_spec]
        args = args + (s2_in,)
    oneg, opos = pl.pallas_call(
        kernel,
        grid=(groups,),
        in_specs=in_specs,
        out_specs=[out_spec(nneg_p), out_spec(npos_p)],
        out_shape=[
            fft_kernel._sds((groups * nneg_p, chunk * n1), jnp.float32, vma),
            fft_kernel._sds((groups * npos_p, chunk * n1), jnp.float32, vma),
        ],
        interpret=interpret,
    )(*args)
    oneg = _window_rows_to_pair_major(oneg, groups, nneg_p, nneg, chunk, n1)
    opos = _window_rows_to_pair_major(opos, groups, npos_p, npos, chunk, n1)
    window = jnp.concatenate(
        [oneg[..., nneg * n1 - max_lag :], opos[..., : max_lag + 1]], axis=-1
    ).reshape(p_pad, 2 * max_lag + 1)
    return window[:p]


# ------------------------------------------------ in-kernel one-hot gather
#
# The row-aligned EP/wideband path materializes the gathered pair spectra
# in HBM: 4 × [P, nfft] f32 (X/Y re/im) written by the one-hot matmul and
# immediately re-read by the rows kernel — 2 × ~10.6 GB of traffic per
# config-4 block, measured as the largest pair-stage cost
# (docs/probe_logs/ab_r5_wideband.log: the gather stage alone is 8.3 ms
# of a 35 ms block). When B is small enough that ALL receiver spectra fit
# in VMEM (B ≤ ~128 at nfft 5120), the gather can run INSIDE the kernel:
# per grid cell, two tiny [chunk, B] × [B, nfft] MXU dots select this
# cell's pair rows from the resident spectra — the [P, nfft] arrays never
# exist. One-hot blocks ride in as data, so pair tables may be traced
# (EP's per-shard slices) or static (wideband's all-pairs).

_ONEHOT_PAIRS = "auto"  # "auto" | "on" | "off" — trace-time routing knob


def set_onehot_pairs(mode: str) -> None:
    if mode not in ("auto", "on", "off"):
        raise ValueError(f"unknown onehot-pairs mode {mode!r}")
    global _ONEHOT_PAIRS
    _ONEHOT_PAIRS = mode


def onehot_pairs_enabled(num_receivers: int, nfft: int) -> bool:
    """VMEM gate: the resident spectra block (2·B·nfft·4 bytes) plus one
    chunk's workspace must stay inside the ~16 MB scoped-VMEM budget."""
    if _ONEHOT_PAIRS == "off":
        return False
    if _ONEHOT_PAIRS == "on":
        return True
    b_pad = -(-num_receivers // 8) * 8
    return 2 * b_pad * nfft * 4 <= 8 * 1024 * 1024


def _gcc_onehot_kernel(
    sre_ref, sim_ref, ohi_ref, ohj_ref,
    w1re_ref, w1im_ref, w2negre_ref, w2negim_ref,
    w2posre_ref, w2posim_ref, twre_ref, twim_ref,
    *rest,
    chunk: int,
    n1: int,
    n2: int,
    eps: float,
    whiten: bool,
    rx_gate: bool,
    gather_precision: Optional[str],
):
    """One grid cell = one pair chunk; spectra resident, gather in-VMEM."""
    if rx_gate:
        s2_ref, oneg_ref, opos_ref = rest
    else:
        oneg_ref, opos_ref = rest
    dot = fft_kernel.kernel_dot(inverse=whiten)
    # Gather dots: PHAT chains run single-pass bf16 (phase-only consumer,
    # same policy as sc_ops.gcc_gather_precision); others HIGHEST so f32
    # spectra pass through exactly (Mosaic implements DEFAULT/HIGHEST).
    dot_g = fft_kernel.kernel_dot(override=gather_precision or "highest")
    dn = (((1,), (0,)), ((), ()))

    a_re, a_im = sre_ref[:], sim_ref[:]  # [B_pad, nfft] CT-order spectra
    ohi, ohj = ohi_ref[:], ohj_ref[:]  # [chunk, B_pad] one-hot rows
    xre = dot_g(ohi, a_re, dn)
    xim = dot_g(ohi, a_im, dn)
    yre = dot_g(ohj, a_re, dn)
    yim = dot_g(ohj, a_im, dn)

    rre = xre * yre + xim * yim
    rim = xim * yre - xre * yim
    if whiten:
        if rx_gate:
            rre, rim = _whiten(rre, rim, eps, gate="l2rx", s2=s2_ref[:, :1])
        else:
            gate = "l2" if _PHAT_GATE == "l2rx" else _PHAT_GATE
            rre, rim = _whiten(rre, rim, eps, gate=gate)

    _invert_to_lag_windows(
        rre, rim, w1re_ref, w1im_ref, w2negre_ref, w2negim_ref,
        w2posre_ref, w2posim_ref, twre_ref, twim_ref, oneg_ref, opos_ref,
        m=chunk, n1=n1, n2=n2, dot=dot,
    )


def gcc_pairs_onehot_lag_mags(
    spec_re: jnp.ndarray,
    spec_im: jnp.ndarray,
    pair_i: jnp.ndarray,
    pair_j: jnp.ndarray,
    *,
    max_lag: int,
    eps: float = 0.05,
    weighting: str = "phat",
    pair_chunk: Optional[int] = None,
    interpret: Optional[bool] = None,
    vma=None,
    s2: Optional[jnp.ndarray] = None,
    gather_precision: Optional[str] = None,
) -> jnp.ndarray:
    """Lag windows for an arbitrary pair list with the gather IN-kernel.

    Args:
      spec_re/spec_im: ``[B, nfft]`` CT-order receiver spectra (resident
        per grid cell — see :func:`onehot_pairs_enabled` for the VMEM
        gate).
      pair_i/pair_j: ``[P]`` receiver indices — static arrays OR traced
        (they become one-hot input data, not kernel constants).
      s2: optional ``[P]`` per-pair l2rx gate scales.
      gather_precision: kernel-dot override for the one-hot selects
        ('default' = single-pass bf16 — the PHAT policy; None → HIGHEST).
    Returns:
      ``[P, 2·max_lag+1]`` float32 |r| at lags −max_lag..+max_lag.
    """
    if weighting not in WEIGHTINGS:
        raise ValueError(f"fused GCC supports {WEIGHTINGS}, not {weighting!r}")
    if pair_chunk is None:
        pair_chunk = DEFAULT_PAIR_CHUNK
    rx_gate = _PHAT_GATE == "l2rx" and s2 is not None and weighting == "phat"
    nfft = spec_re.shape[-1]
    b = spec_re.shape[-2]
    p = pair_i.shape[0]
    n1, n2, w1re, w1im, w2re, w2im, twre, twim = fft_kernel.ct_constants(
        nfft, inverse=True
    )
    if max_lag >= nfft // 2:
        raise ValueError(f"max_lag {max_lag} too large for nfft {nfft}")
    if interpret is None:
        interpret = jax.default_backend() != "tpu"

    nneg = -(-max_lag // n1)
    npos = max_lag // n1 + 1

    chunk = max(8, -(-pair_chunk // 8) * 8)
    p_pad = -(-p // chunk) * chunk
    b_pad = -(-b // 8) * 8

    sre = spec_re.astype(jnp.float32)
    sim = spec_im.astype(jnp.float32)
    if b_pad != b:
        padw = ((0, b_pad - b), (0, 0))
        sre, sim = jnp.pad(sre, padw), jnp.pad(sim, padw)

    # One-hot pair rows (padding rows select receiver 0 — sliced off).
    pi = jnp.asarray(pair_i, jnp.int32)
    pj = jnp.asarray(pair_j, jnp.int32)
    if p_pad != p:
        pi = jnp.concatenate([pi, jnp.zeros(p_pad - p, jnp.int32)])
        pj = jnp.concatenate([pj, jnp.zeros(p_pad - p, jnp.int32)])
    rng_b = jnp.arange(b_pad, dtype=jnp.int32)
    ohi = (pi[:, None] == rng_b[None, :]).astype(jnp.float32)
    ohj = (pj[:, None] == rng_b[None, :]).astype(jnp.float32)

    s2_in = None
    if rx_gate:
        s2v = s2.astype(jnp.float32)
        if p_pad != p:
            s2v = jnp.pad(s2v, (0, p_pad - p), constant_values=1.0)
        s2_in = jnp.broadcast_to(
            s2v.reshape(p_pad, 1), (p_pad, 128)
        ) * jnp.float32(1.0)

    spec_spec = pl.BlockSpec(
        (b_pad, nfft), lambda i: (0, 0), memory_space=pltpu.VMEM
    )
    oh_spec = pl.BlockSpec(
        (chunk, b_pad), lambda i: (i, 0), memory_space=pltpu.VMEM
    )
    s2_spec = pl.BlockSpec((chunk, 128), lambda i: (i, 0), memory_space=pltpu.VMEM)
    w2negre, w2negim, w2posre, w2posim, nneg_p, npos_p = _w2_window_rows(
        w2re, w2im, n2, nneg, npos
    )
    const_arrays = (w1re, w1im, w2negre, w2negim, w2posre, w2posim, twre, twim)
    const_specs = [
        pl.BlockSpec(a.shape, lambda i: (0, 0), memory_space=pltpu.VMEM)
        for a in const_arrays
    ]
    consts = tuple(fft_kernel._lift(a, vma) for a in const_arrays)

    kernel = functools.partial(
        _gcc_onehot_kernel,
        chunk=chunk, n1=n1, n2=n2, eps=eps,
        whiten=(weighting == "phat"), rx_gate=rx_gate,
        gather_precision=gather_precision,
    )
    groups = p_pad // chunk
    out_spec = lambda rows: pl.BlockSpec(
        (rows, chunk * n1), lambda i: (i, 0), memory_space=pltpu.VMEM
    )
    in_specs = [spec_spec, spec_spec, oh_spec, oh_spec] + const_specs
    args = (sre, sim, ohi, ohj, *consts)
    if rx_gate:
        in_specs = in_specs + [s2_spec]
        args = args + (s2_in,)
    oneg, opos = pl.pallas_call(
        kernel,
        grid=(groups,),
        in_specs=in_specs,
        out_specs=[out_spec(nneg_p), out_spec(npos_p)],
        out_shape=[
            fft_kernel._sds((groups * nneg_p, chunk * n1), jnp.float32, vma),
            fft_kernel._sds((groups * npos_p, chunk * n1), jnp.float32, vma),
        ],
        interpret=interpret,
    )(*args)
    oneg = _window_rows_to_pair_major(oneg, groups, nneg_p, nneg, chunk, n1)
    opos = _window_rows_to_pair_major(opos, groups, npos_p, npos, chunk, n1)
    window = jnp.concatenate(
        [oneg[..., nneg * n1 - max_lag :], opos[..., : max_lag + 1]], axis=-1
    ).reshape(p_pad, 2 * max_lag + 1)
    return window[:p]
