"""Batched, static-shape spectral peak detection.

Reproduces the reference detector semantics (`buoy_node.py:401-433`):
power spectrum in dB, median noise floor, −70 dBm height threshold, minimum
peak spacing of 10 bins, DC notch of ±10 kHz around the tuned center,
confidence = SNR/20 clipped to [0, 1] with a 0.3 floor — but re-designed for
XLA: instead of scipy's dynamic-length `find_peaks` lists, detection returns
a **fixed top-K peak set with a validity mask**, so the whole
detect-across-256-channels step is one jit-compiled program with static
shapes.

Peak candidacy uses a sliding-window maximum (a bin is a candidate iff it is
the maximum of its ±min_distance neighborhood), which enforces the same
minimum spacing as `find_peaks(distance=...)` for separated peaks while
mapping to a single `lax.reduce_window` on the VPU.
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

from radio_mapper_tpu import constants
from radio_mapper_tpu.ops import safe
from radio_mapper_tpu.ops.spectral import power_spectrum_db, fft_frequencies_hz


class PeakSet(NamedTuple):
    """Fixed-size set of detected peaks; all arrays are ``[..., K]``.

    ``bin_index`` is relative to the length of the spectrum that was
    actually detected on, which is path-dependent: the unfused pipeline
    detects on the N-point (block_len) grid while the fused-GCC path
    detects on the nfft-padded CT spectrum (e.g. 17408 bins for a 16384
    block — see models/pipeline.py step_split routing). Consumers
    comparing detections across paths must use ``freq_offset_hz``, which
    is computed with the matching bin spacing and is portable.
    """

    bin_index: jnp.ndarray  # int32 FFT bin (un-shifted order, DC at 0; grid is path-dependent — see class docstring)
    freq_offset_hz: jnp.ndarray  # float32 offset from tuned center
    power_db: jnp.ndarray  # float32 peak power
    snr_db: jnp.ndarray  # float32 power above median noise floor
    confidence: jnp.ndarray  # float32 in [0, 1]
    valid: jnp.ndarray  # bool — False entries are padding
    noise_floor_db: jnp.ndarray  # float32, [...] (no K axis)


def sliding_local_max(x: jnp.ndarray, radius: int) -> jnp.ndarray:
    """True where ``x`` equals the max of its ±radius window (last axis).

    Safe mode uses an exact circular sliding max (one reduce_window over
    a circularly extended axis — semantically right for spectra, whose
    bin index wraps; see safe.sliding_max); stock mode uses reduce_window
    with −inf pads.
    """
    if safe.enabled():
        return x >= safe.sliding_max(x, radius)
    w = 2 * radius + 1
    ndim = x.ndim
    window_dims = (1,) * (ndim - 1) + (w,)
    strides = (1,) * ndim
    m = jax.lax.reduce_window(
        x, -jnp.inf, jax.lax.max, window_dims, strides, padding="SAME"
    )
    return x >= m


def detect_peaks(
    power_db: jnp.ndarray,
    *,
    sample_rate_hz: float,
    max_peaks: int = 8,
    threshold_db: float = constants.DEFAULT_DETECTION_THRESHOLD_DBM,
    min_distance_bins: int = constants.DEFAULT_PEAK_MIN_DISTANCE_BINS,
    dc_notch_hz: Optional[float] = constants.DEFAULT_DC_NOTCH_HZ,
    confidence_floor: float = constants.DEFAULT_CONFIDENCE_FLOOR,
    snr_fullscale_db: float = constants.DEFAULT_SNR_FULLSCALE_DB,
    noise_floor_stride: int = 1,
) -> PeakSet:
    """Find the top-K spectral peaks per batch element.

    Everything after the top-K selection is gather-free by construction:
    SNR and confidence at a peak are arithmetic in (top value − floor),
    and the FFT bin→frequency map is arithmetic in the bin index
    (``fftfreq``), so no per-peak ``take_along_axis``/one-hot pass over
    the F-length arrays is ever needed — the selection itself is the only
    op that touches the full spectrum.

    Args:
      power_db: ``[..., F]`` power spectra in dB, un-shifted bin order.
      noise_floor_stride: estimate the median noise floor from every
        S-th bin instead of all F. Noise bins are exchangeable, so a
        stride-S subsample (still thousands of bins at flagship sizes)
        moves the estimate by ≲0.1 dB while cutting the bisection's HBM
        traffic S×. 1 = exact reference semantics.
    Returns:
      :class:`PeakSet` with ``[..., max_peaks]`` fields sorted by power
      (descending); invalid slots are masked out and zero-filled.
    """
    f = power_db.shape[-1]
    freqs = fft_frequencies_hz(f, sample_rate_hz)  # static numpy

    nf_src = (
        power_db[..., ::noise_floor_stride] if noise_floor_stride > 1 else power_db
    )
    noise_floor = (
        safe.median_bisect(nf_src) if safe.enabled() else jnp.median(nf_src, axis=-1)
    )

    candidate = sliding_local_max(power_db, min_distance_bins)
    candidate = jnp.logical_and(candidate, power_db > threshold_db)
    if dc_notch_hz is not None:
        notch = np.abs(freqs) >= dc_notch_hz  # static mask (buoy_node.py:423)
        candidate = jnp.logical_and(candidate, jnp.asarray(notch))

    # Confidence gate without materializing per-bin SNR/confidence arrays:
    # clip(snr/S, 0, 1) ≥ floor ⇔ snr ≥ floor·S for floor in (0, 1].
    # floor ≤ 0 previously always passed (clip's lower bound is 0), so it
    # disables the gate; floor > 1 previously always failed.
    if confidence_floor > 1.0:
        candidate = jnp.zeros_like(candidate)
    elif confidence_floor > 0.0:
        candidate = jnp.logical_and(
            candidate,
            power_db - noise_floor[..., None]
            >= confidence_floor * snr_fullscale_db,
        )

    score = jnp.where(candidate, power_db, -jnp.inf)
    if safe.enabled():
        # Candidates are > min_distance apart (sliding-local-max), so the
        # segmented two-stage top-k is exact and ~7× cheaper in HBM
        # traffic than the flat masked-argmax iteration. EXACTLY-equal
        # candidates closer than min_distance (e.g. the mirrored pair of
        # a real-valued input's conjugate-symmetric spectrum) collapse to
        # one — which matches the reference's find_peaks(distance=10)
        # minimum-spacing contract; the flat/stock top_k would return
        # both, violating it.
        seg = 8
        if f % seg == 0 and min_distance_bins + 1 >= seg:
            top_vals, top_idx = safe.top_k_segmented(score, max_peaks, seg)
        else:
            top_vals, top_idx = safe.top_k(score, max_peaks)
    else:
        top_vals, top_idx = jax.lax.top_k(score, max_peaks)
    valid = jnp.isfinite(top_vals)
    peak_snr = top_vals - noise_floor[..., None]
    peak_conf = jnp.clip(peak_snr / snr_fullscale_db, 0.0, 1.0)
    # fftfreq arithmetically: bins ≤ (F−1)//2 are positive, the rest wrap.
    kf = top_idx.astype(jnp.float32)
    peak_freq = jnp.where(top_idx <= (f - 1) // 2, kf, kf - f) * jnp.float32(
        sample_rate_hz / f
    )

    zero = jnp.zeros_like(peak_snr)
    return PeakSet(
        bin_index=jnp.where(valid, top_idx, 0).astype(jnp.int32),
        freq_offset_hz=jnp.where(valid, peak_freq, zero),
        power_db=jnp.where(valid, top_vals, zero),
        snr_db=jnp.where(valid, peak_snr, zero),
        confidence=jnp.where(valid, peak_conf, zero),
        valid=valid,
        noise_floor_db=noise_floor,
    )


# ------------------------------------------------------ fused CT detect
#
# "auto": fused Pallas detect kernel on TPU when the shape allows;
# "on": force (interpret mode off-TPU — for numerics tests); "off": never.
_FUSED_DETECT = "auto"


def set_fused_detect(mode: str) -> None:
    if mode not in ("auto", "on", "off"):
        raise ValueError(f"unknown fused-detect mode {mode!r}")
    global _FUSED_DETECT
    _FUSED_DETECT = mode


def fused_detect_enabled(
    nfft: int, *, min_distance_bins: int, noise_floor_stride: int
) -> bool:
    """Route the detect stage to the fused Pallas kernel?

    The fused kernel hard-codes safe-mode semantics (circular sliding
    max, equal-peak collapse per segment, bisected median), so with
    stock (non-safe) mode explicitly selected it would be a silent
    semantic switch — "auto" therefore requires safe mode; only an
    explicit ``set_fused_detect("on")`` overrides that (ADVICE r4).
    """
    if _FUSED_DETECT == "off":
        return False
    if not safe.enabled() and _FUSED_DETECT != "on":
        return False
    try:
        from radio_mapper_tpu.ops.pallas import detect_kernel
    except ImportError:  # pragma: no cover
        return False
    if not detect_kernel.supported(
        nfft,
        min_distance_bins=min_distance_bins,
        noise_floor_stride=noise_floor_stride,
    ):
        return False
    return _FUSED_DETECT == "on" or jax.default_backend() == "tpu"


# "auto": fold the forward CT-FFT and the detect stage into ONE Pallas
# kernel whenever the fused detect kernel would fire anyway (the combined
# kernel removes the detect stage's full re-read of the spectra the FFT
# just wrote — ~142 MB at the 128-ch flagship shape — and overlaps its
# VPU work with the FFT matmuls); "on"/"off" force. TRACE-time knob.
_FUSED_FFT_DETECT = "auto"


def set_fused_fft_detect(mode: str) -> None:
    if mode not in ("auto", "on", "off"):
        raise ValueError(f"unknown fused-fft-detect mode {mode!r}")
    global _FUSED_FFT_DETECT
    _FUSED_FFT_DETECT = mode


# Finish peak selection INSIDE the combined FFT+detect kernel
# (emit_topk): skips writing the F/8 partials and the XLA top-K passes.
# r4 A/B'd the in-kernel form NEUTRAL when detect was a standalone
# kernel; with the combined kernel the partials round-trip is a larger
# relative share — re-probed r5 (docs/probe_logs/ab_r5_topk.log).
_COMBINED_TOPK = False


def set_combined_topk(on: bool) -> None:
    global _COMBINED_TOPK
    _COMBINED_TOPK = bool(on)


def fused_fft_detect_enabled(
    nfft: int, *, min_distance_bins: int, noise_floor_stride: int
) -> bool:
    """Route forward FFT + detect to the single combined kernel?

    Requires everything :func:`fused_detect_enabled` requires (the
    combined kernel embeds the same detect body); the extra knob exists
    so the two-kernel form stays available for A/B and fallback.
    """
    if _FUSED_FFT_DETECT == "off":
        return False
    return fused_detect_enabled(
        nfft,
        min_distance_bins=min_distance_bins,
        noise_floor_stride=noise_floor_stride,
    )


def detect_peaks_ct(
    spec_re: jnp.ndarray,
    spec_im: jnp.ndarray,
    *,
    sample_rate_hz: float,
    max_peaks: int = 8,
    threshold_db: float = constants.DEFAULT_DETECTION_THRESHOLD_DBM,
    min_distance_bins: int = constants.DEFAULT_PEAK_MIN_DISTANCE_BINS,
    dc_notch_hz: Optional[float] = constants.DEFAULT_DC_NOTCH_HZ,
    confidence_floor: float = constants.DEFAULT_CONFIDENCE_FLOOR,
    snr_fullscale_db: float = constants.DEFAULT_SNR_FULLSCALE_DB,
    power_offset_db: float = 0.0,
    vma=None,
    # In-kernel top-K A/B'd on-chip r4: wall-clock NEUTRAL vs the
    # two-stage partials + XLA top-k (7.12 vs 6.96 ms/block medians,
    # inside tunnel noise — the F/8 partials stage was already cheap),
    # with exact peak parity. Two-stage stays the default; the in-kernel
    # mode remains available (docs/probe_logs/ab_topk.log).
    kernel_topk: bool = False,
    partials=None,
) -> PeakSet:
    """Top-K peak detection directly on CT-order spectra, fused in VMEM.

    ``partials``: optional pre-computed ``(seg_score, seg_arg,
    noise_floor_db)`` from the combined FFT+detect kernel
    (`detect_kernel.fft_detect_rows_ct` with ``emit_topk=0``) — skips the
    standalone detect kernel entirely; only the XLA top-K tail runs here.
    The caller must have passed IDENTICAL detection parameters to the
    combined kernel.

    Equal to ``detect_peaks(ct_power_db(fr, fi) + power_offset_db, ...)``
    under safe mode (stride-8 noise floor, segmented top-k) — same gates,
    ulp-identical noise floor, same minimum-spacing contract — but the
    power array never round-trips HBM in natural order: the Pallas kernel
    (ops/pallas/detect_kernel.py) reads the spectra once and emits F/8
    segment partials; only this top-K tail runs in XLA. Exactly-equal
    candidates in different segments tie-break by CT segment order
    (b2-major) instead of natural segment order — both honor the
    minimum-spacing contract.
    """
    from radio_mapper_tpu.ops.pallas import detect_kernel, fft_kernel

    nfft = spec_re.shape[-1]
    n1, n2 = fft_kernel.ct_split(nfft)
    if partials is not None:
        # seg-level (emit_topk=0) or kernel-topk-packed, per kernel_topk —
        # the caller must match the emit_topk it gave the combined kernel
        score, seg_arg, noise_floor = partials
    else:
        score, seg_arg, noise_floor = detect_kernel.detect_ct_partials(
            spec_re, spec_im,
            sample_rate_hz=sample_rate_hz,
            threshold_db=threshold_db,
            min_distance_bins=min_distance_bins,
            dc_notch_hz=dc_notch_hz,
            confidence_floor=confidence_floor,
            snr_fullscale_db=snr_fullscale_db,
            power_offset_db=power_offset_db,
            vma=vma,
            emit_topk=max_peaks if kernel_topk else 0,
        )
    return peaks_from_ct_partials(
        score, seg_arg, noise_floor,
        nfft=nfft,
        sample_rate_hz=sample_rate_hz,
        max_peaks=max_peaks,
        snr_fullscale_db=snr_fullscale_db,
        power_offset_db=power_offset_db,
        kernel_topk=kernel_topk,
    )


def peaks_from_ct_partials(
    score: jnp.ndarray,
    seg_arg: jnp.ndarray,
    noise_floor: jnp.ndarray,
    *,
    nfft: int,
    sample_rate_hz: float,
    max_peaks: int = 8,
    snr_fullscale_db: float = constants.DEFAULT_SNR_FULLSCALE_DB,
    power_offset_db: float = 0.0,
    kernel_topk: bool = False,
) -> PeakSet:
    """XLA top-K tail over kernel-emitted detection partials.

    Shared by every fused detect routing (standalone detect kernel,
    combined FFT+detect kernel, flagship megakernel) — the partials
    already encode every gate; this selects the K winners and converts
    only those to dB/frequency/confidence.
    """
    from radio_mapper_tpu.ops.pallas import detect_kernel, fft_kernel

    n1, n2 = fft_kernel.ct_split(nfft)
    if kernel_topk:
        # selection finished in-kernel: unpack 8·f + off (exact f32)
        top_vals = score
        packed = seg_arg.astype(jnp.int32)
        top_f = packed // detect_kernel.SEGMENT
        off = packed - top_f * detect_kernel.SEGMENT
    elif safe.enabled():
        top_vals, top_f = safe.top_k(score, max_peaks)
        off = safe.take_many_last(seg_arg, top_f).astype(jnp.int32)
    else:
        top_vals, top_f = jax.lax.top_k(score, max_peaks)
        off = jnp.take_along_axis(seg_arg, top_f, axis=-1).astype(jnp.int32)
    # segment f = b2·n1 + k1 covers natural bins (8·b2 + off) + n2·k1
    b2 = top_f // n1
    k1 = top_f - b2 * n1
    top_idx = detect_kernel.SEGMENT * b2 + off + n2 * k1
    valid = jnp.isfinite(top_vals)
    # dB only for the K winners (same float ops as ct_power_db + offset
    # on the same linear values ⇒ identical results)
    vals_safe = jnp.where(valid, top_vals, 1.0)
    top_db = 10.0 * jnp.log10(vals_safe + 1e-24) + power_offset_db
    peak_snr = top_db - noise_floor[..., None]
    peak_conf = jnp.clip(peak_snr / snr_fullscale_db, 0.0, 1.0)
    kf = top_idx.astype(jnp.float32)
    peak_freq = jnp.where(top_idx <= (nfft - 1) // 2, kf, kf - nfft) * jnp.float32(
        sample_rate_hz / nfft
    )
    zero = jnp.zeros_like(peak_snr)
    return PeakSet(
        bin_index=jnp.where(valid, top_idx, 0).astype(jnp.int32),
        freq_offset_hz=jnp.where(valid, peak_freq, zero),
        power_db=jnp.where(valid, top_db, zero),
        snr_db=jnp.where(valid, peak_snr, zero),
        confidence=jnp.where(valid, peak_conf, zero),
        valid=valid,
        noise_floor_db=noise_floor,
    )


def detect_signals(
    iq: jnp.ndarray,
    *,
    sample_rate_hz: float,
    max_peaks: int = 8,
    power_offset_db: float = 0.0,
    **peak_kwargs,
) -> PeakSet:
    """Full detector: FFT power spectrum + top-K peaks, batched.

    ``power_offset_db`` calibrates the uncalibrated FFT magnitude to the
    reference's raw-count "dBm" scale: with uint8 decode at ``scale=1.0``
    and offset 0 this matches `buoy_node.py:401-433` exactly; when running on
    unit-scaled floats pass ``power_offset_db = 20*log10(127.5)`` to keep
    threshold parity.
    """
    p = power_spectrum_db(iq) + power_offset_db
    return detect_peaks(p, sample_rate_hz=sample_rate_hz, max_peaks=max_peaks, **peak_kwargs)
