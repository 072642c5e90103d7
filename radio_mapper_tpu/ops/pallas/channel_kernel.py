"""The flagship megakernel: FFT × detect × GCC pair stage, one VMEM pass.

One kernel covers what the reference runs as two separate processes —
the per-node FFT detector (`/root/reference/buoy_node.py:357-469`) and
the central pairwise correlation loop
(`/root/reference/tdoa_processor.py:156-193`) — for one channel's
receivers per grid cell.

r5 endpoint of the fusion ladder. The r4→r5 combined FFT+detect kernel
still wrote every receiver's CT spectra to HBM (142 MB/block at 128 ch)
for the pair kernel to read back (another 142 MB). But one grid cell of
the pair kernel consumes exactly ONE channel's receivers — the same rows
a forward-FFT cell produces. So per grid cell (= one channel) this
kernel:

  load [B_pad, nfft] padded time rows            (the ONLY big HBM read)
    → CT forward FFT                              (fft_kernel.ct_fft_core)
    → detect body on the in-register spectra      (detect_kernel._detect_body)
      · emits per-segment partials + noise floor
      · its per-row power maxima feed the l2rx gate for free
    → static register pair gather → cross-power → whiten → inverse DFT
      → lag windows                               (gcc_kernel internals)

and writes ONLY the tiny outputs: detect partials, noise floors, lag
windows. The spectra never exist in HBM. Per-block traffic at the 128-ch
flagship shape drops from ~420 MB (input + spectra write + spectra read)
to ~134 MB (input only).

Constraints (checked by :func:`supported`): per-channel receiver count
B ≤ 16 after sublane padding (VMEM holds the whole channel), one static
pair chunk (P padded ≤ 64), and everything the combined FFT+detect
kernel requires.

Numerics: bit-identical to the composition it replaces — same dot
factories, same op order, and f32 round-trips through HBM were exact
(asserted in tests/test_channel_kernel.py).
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from radio_mapper_tpu.ops.pallas import detect_kernel, fft_kernel, gcc_kernel

MAX_PAIR_ROWS = 64  # one static chunk; 8 receivers ⇒ 28 pairs fits
MAX_B_PAD = 16

# trace-time routing knob: "auto" | "on" | "off".
# DEFAULT OFF: the megakernel compiles and matches the two-kernel
# composition exactly, but measured wall-clock NEUTRAL on-chip (5.37 vs
# 5.35 ms/block at 128 ch × scan-16; 5.21 at scan-32 —
# docs/probe_logs/ab_r5_mega2.log): the spectra HBM round-trip it
# removes was already hidden behind the pair stage's MXU work, and the
# single big kernel gives Mosaic less cross-launch overlap. Kept because
# it is the maximal-fusion reference point (one kernel = whole channel)
# and exact-equality tested; flip with set_mega_fused("on").
_MEGA = "off"


def set_mega_fused(mode: str) -> None:
    if mode not in ("auto", "on", "off"):
        raise ValueError(f"unknown mega-fused mode {mode!r}")
    global _MEGA
    _MEGA = mode


def supported(
    nfft: int,
    num_receivers: int,
    *,
    min_distance_bins: int,
    noise_floor_stride: int,
    weighting: str,
) -> bool:
    if _MEGA != "on":
        return False  # "auto" follows the measured-neutral default: off
    if weighting != "phat":
        return False  # cc keeps bf16x3 spectra through the split kernels
    b_pad = -(-num_receivers // 8) * 8
    if b_pad > MAX_B_PAD:
        return False
    p = num_receivers * (num_receivers - 1) // 2
    if -(-p // 8) * 8 > MAX_PAIR_ROWS:
        return False
    if not detect_kernel.supported(
        nfft,
        min_distance_bins=min_distance_bins,
        noise_floor_stride=noise_floor_stride,
    ):
        return False
    return gcc_kernel.supported(nfft, weighting)


def _channel_kernel(
    xre_ref, xim_ref,
    fw1re_ref, fw1im_ref, fw2re_ref, fw2im_ref, ftwre_ref, ftwim_ref,
    iw1re_ref, iw1im_ref, w2negre_ref, w2negim_ref,
    w2posre_ref, w2posim_ref, itwre_ref, itwim_ref,
    score_ref, arg_ref, nf_ref, oneg_ref, opos_ref,
    *,
    rows: int,
    n1: int,
    n2: int,
    pairs: Tuple[Tuple[int, int], ...],
    eps: float,
    fwd_precision: Optional[str],
    det_params: dict,
):
    m = len(pairs)
    dot_f = fft_kernel.kernel_dot(override=fwd_precision)
    dot_i = fft_kernel.kernel_dot(inverse=True)

    # ---- forward CT FFT of this channel's receiver rows (MXU)
    fre, fim = fft_kernel.ct_fft_core(
        xre_ref[:], xim_ref[:],
        fw1re_ref[:], fw1im_ref[:], fw2re_ref[:], fw2im_ref[:],
        ftwre_ref[:], ftwim_ref[:],
        rows=rows, n1=n1, n2=n2, dot=dot_f,
    )

    # ---- detect partials on the in-register spectra (VPU)
    score, arg, nf128, rmax128 = detect_kernel._detect_body(
        fre, fim, rows=rows, n1=n1, n2=n2, **det_params
    )
    score_ref[:] = score
    arg_ref[:] = arg
    nf_ref[:] = nf128

    # ---- static register pair gather → cross-power (same construction
    # as gcc_kernel._gcc_pairs_kernel)
    row = lambda a, k: a[k : k + 1, :]
    rre = jnp.concatenate(
        [row(fre, i) * row(fre, j) + row(fim, i) * row(fim, j) for i, j in pairs],
        axis=0,
    )
    rim = jnp.concatenate(
        [row(fim, i) * row(fre, j) - row(fre, i) * row(fim, j) for i, j in pairs],
        axis=0,
    )
    # l2rx gate straight from the detect body's row maxima — zero cost
    s2 = jnp.concatenate(
        [rmax128[i : i + 1, :1] * rmax128[j : j + 1, :1] for i, j in pairs],
        axis=0,
    )
    rre, rim = gcc_kernel._whiten(rre, rim, eps, gate="l2rx", s2=s2)

    gcc_kernel._invert_to_lag_windows(
        rre, rim, iw1re_ref, iw1im_ref, w2negre_ref, w2negim_ref,
        w2posre_ref, w2posim_ref, itwre_ref, itwim_ref, oneg_ref, opos_ref,
        m=m, n1=n1, n2=n2, dot=dot_i,
    )


def channel_step_partials(
    re: jnp.ndarray,
    im: jnp.ndarray,
    pair_i: np.ndarray,
    pair_j: np.ndarray,
    *,
    max_lag: int,
    eps: float = 0.05,
    sample_rate_hz: float,
    threshold_db: float,
    min_distance_bins: int,
    dc_notch_hz,
    confidence_floor: float,
    snr_fullscale_db: float,
    power_offset_db: float = 0.0,
    bisect_iters: int = 24,
    fwd_precision: Optional[str] = "default",
    interpret: Optional[bool] = None,
    vma=None,
):
    """One kernel per channel: detect partials + GCC lag windows.

    Args:
      re/im: ``[..., B, nfft]`` float32 time rows, zero-padded to a
        supported CT length (the caller pads, mirroring
        `sc_ops.receiver_spectra_ct`).
      pair_i/pair_j: STATIC receiver index arrays, length P (baked into
        the kernel as a register gather).
    Returns:
      ``(seg_score [..., B, nfft/8], seg_arg [..., B, nfft/8],
      noise_floor_db [..., B], lag_mags [..., P, 2·max_lag+1])`` — the
      detect outputs equal `detect_ct_partials` on `fft_rows_ct` spectra
      exactly; the lag windows equal `gcc_pair_lag_mags` under the l2rx
      gate with the per-receiver maxima as `row_smax`.
    """
    if re.shape != im.shape:
        raise ValueError("re/im shape mismatch")
    nfft = re.shape[-1]
    b = re.shape[-2]
    n1, n2, det_params = detect_kernel._detect_plan(
        nfft,
        sample_rate_hz=sample_rate_hz,
        threshold_db=threshold_db,
        min_distance_bins=min_distance_bins,
        dc_notch_hz=dc_notch_hz,
        confidence_floor=confidence_floor,
        snr_fullscale_db=snr_fullscale_db,
        power_offset_db=power_offset_db,
        bisect_iters=bisect_iters,
        emit_topk=0,
    )
    det_params.pop("n1")
    det_params.pop("n2")
    if max_lag >= nfft // 2:
        raise ValueError(f"max_lag {max_lag} too large for nfft {nfft}")
    if interpret is None:
        interpret = jax.default_backend() != "tpu"

    (pairs_padded, p_real), = gcc_kernel._pair_chunks(
        pair_i, pair_j, MAX_PAIR_ROWS
    )
    m = len(pairs_padded)

    (_, _, fw1re, fw1im, fw2re, fw2im, ftwre, ftwim) = fft_kernel.ct_constants(nfft)
    (_, _, iw1re, iw1im, iw2re, iw2im, itwre, itwim) = fft_kernel.ct_constants(
        nfft, inverse=True
    )
    nneg = -(-max_lag // n1)
    npos = max_lag // n1 + 1
    w2negre, w2negim, w2posre, w2posim, nneg_p, npos_p = gcc_kernel._w2_window_rows(
        iw2re, iw2im, n2, nneg, npos
    )

    batch_shape = re.shape[:-2]
    c = int(np.prod(batch_shape)) if batch_shape else 1
    b_pad = -(-b // 8) * 8
    re2 = re.reshape(c, b, nfft).astype(jnp.float32)
    im2 = im.reshape(c, b, nfft).astype(jnp.float32)
    if b_pad != b:
        padw = ((0, 0), (0, b_pad - b), (0, 0))
        re2 = jnp.pad(re2, padw)
        im2 = jnp.pad(im2, padw)
    re2 = re2.reshape(c * b_pad, nfft)
    im2 = im2.reshape(c * b_pad, nfft)

    n2g = n2 // detect_kernel.SEGMENT
    seg_cols = n2g * n1
    row_spec = pl.BlockSpec(
        (b_pad, nfft), lambda i: (i, 0), memory_space=pltpu.VMEM
    )
    seg_spec = pl.BlockSpec(
        (b_pad, seg_cols), lambda i: (i, 0), memory_space=pltpu.VMEM
    )
    nf_spec = pl.BlockSpec((b_pad, 128), lambda i: (i, 0), memory_space=pltpu.VMEM)
    out_spec = lambda rows: pl.BlockSpec(
        (rows, m * n1), lambda i: (i, 0), memory_space=pltpu.VMEM
    )
    const_arrays = (
        fw1re, fw1im, fw2re, fw2im, ftwre, ftwim,
        iw1re, iw1im, w2negre, w2negim, w2posre, w2posim, itwre, itwim,
    )
    const_specs = [
        pl.BlockSpec(a.shape, lambda i: (0, 0), memory_space=pltpu.VMEM)
        for a in const_arrays
    ]
    consts = tuple(fft_kernel._lift(a, vma) for a in const_arrays)

    kernel = functools.partial(
        _channel_kernel,
        rows=b_pad, n1=n1, n2=n2, pairs=pairs_padded, eps=eps,
        fwd_precision=fwd_precision, det_params=det_params,
    )
    score, arg, nf, oneg, opos = pl.pallas_call(
        kernel,
        grid=(c,),
        in_specs=[row_spec, row_spec] + const_specs,
        out_specs=[seg_spec, seg_spec, nf_spec, out_spec(nneg_p), out_spec(npos_p)],
        out_shape=[
            fft_kernel._sds((c * b_pad, seg_cols), jnp.float32, vma),
            fft_kernel._sds((c * b_pad, seg_cols), jnp.float32, vma),
            fft_kernel._sds((c * b_pad, 128), jnp.float32, vma),
            fft_kernel._sds((c * nneg_p, m * n1), jnp.float32, vma),
            fft_kernel._sds((c * npos_p, m * n1), jnp.float32, vma),
        ],
        interpret=interpret,
    )(re2, im2, *consts)

    unrow = lambda a, cols: (
        a.reshape(c, b_pad, cols)[:, :b].reshape(*batch_shape, b, cols)
    )
    score = unrow(score, seg_cols)
    arg = unrow(arg, seg_cols)
    nf = nf.reshape(c, b_pad, 128)[:, :b, 0].reshape(*batch_shape, b)
    oneg = gcc_kernel._window_rows_to_pair_major(oneg, c, nneg_p, nneg, m, n1)
    opos = gcc_kernel._window_rows_to_pair_major(opos, c, npos_p, npos, m, n1)
    window = jnp.concatenate(
        [oneg[..., nneg * n1 - max_lag :], opos[..., : max_lag + 1]], axis=-1
    )[:, :p_real]
    window = window.reshape(*batch_shape, p_real, 2 * max_lag + 1)
    return score, arg, nf, window
