"""Fused four-step FFT as a single Pallas kernel.

The pure-XLA matmul FFT (:mod:`radio_mapper_tpu.ops.fft`) runs each stage
as a separate HLO: inner DFT matmul → HBM → twiddle multiply → HBM → outer
DFT matmul. This kernel keeps the whole transform of each batch row inside
VMEM: load [rows, N] once, run both 128-ish DFT matmuls on the MXU with the
twiddle applied on the VPU in between, store once. For N = 16384 that is
2·(N·N1 + N·N2) ≈ 8.4 MFLOP of MXU work against exactly 2·N·8 bytes of HBM
traffic per row — arithmetic-intensity ≈ 64 FLOP/byte, i.e. compute-bound
on the MXU, the roofline optimum for an FFT on this hardware.

Complex data is carried as separate float32 re/im planes (the target
runtime is shaky on complex dtype) and each complex matmul decomposes into
4 real MXU dots. DFT/twiddle matrices are NumPy constants.

Supported lengths: N = N1·N2 with N1, N2 ≤ 256 (covers every block size
this framework uses: 1024 … 65536).
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

MAX_FACTOR = 256


def _split(n: int) -> Tuple[int, int]:
    """(n1, n2) with n = n1·n2, n2 the largest divisor ≤ √n, n1 ≤ MAX_FACTOR."""
    n2 = 1
    f = 1
    while f * f <= n:
        if n % f == 0:
            n2 = f
        f += 1
    n1 = n // n2
    if n1 > MAX_FACTOR:
        raise ValueError(
            f"FFT length {n} not supported by the fused kernel (needs n1={n1} ≤ {MAX_FACTOR})"
        )
    return n1, n2


def mosaic_compatible(n: int) -> bool:
    """Whether the kernel's in-kernel reshapes compile on real TPU.

    Mosaic only supports shape casts whose minor (lane) dimension stays a
    multiple of 128; the kernel's load splits N → (n2, n1) with n1 minor
    and its output merge has n2 minor, so BOTH factors must be
    lane-aligned. Empirically on v5e: N=17280 → 128×135 fails with
    `infer-vector-layout: unsupported shape cast`; 16384 → 128×128
    compiles and runs. Interpret mode (CPU tests) has no such limit.
    """
    try:
        n1, n2 = _split(n)
    except ValueError:
        return False
    return n1 % 128 == 0 and n2 % 128 == 0


@functools.lru_cache(maxsize=None)
def _constants(n: int):
    n1, n2 = _split(n)
    w1 = np.exp(-2j * np.pi * np.outer(np.arange(n1), np.arange(n1)) / n1)
    w2 = np.exp(-2j * np.pi * np.outer(np.arange(n2), np.arange(n2)) / n2)
    tw = np.exp(-2j * np.pi * np.outer(np.arange(n2), np.arange(n1)) / n)  # [k2, n1]
    f32 = lambda a: a.astype(np.float32)
    return (
        n1,
        n2,
        f32(w1.real), f32(w1.imag),
        f32(w2.real), f32(w2.imag),
        f32(tw.real), f32(tw.imag),
    )


def _dot_bf16x3(a, b, dn):
    """Explicit 3-pass bf16 emulation of an f32 matmul (a.k.a. bf16x3).

    XLA's ``Precision.HIGH`` is exactly this algorithm, but Mosaic's dot
    lowering implements only DEFAULT and HIGHEST, so requesting HIGH in a
    kernel either fails or (mapped up) pays HIGHEST's 6 MXU passes. The
    split is spelled out instead: a = hi + lo with hi = bf16(a), each
    pass a native bf16×bf16→f32 MXU dot. The dropped lo·lo term is
    O(2^-18) relative per product — ~5e-4 worst-case on a 17k-point DFT
    row, three orders of magnitude inside the 0.1-sample τ budget — for
    HALF the MXU work of HIGHEST. Runs identically (and is tested) on
    CPU interpret mode since the bf16 rounding is explicit.
    """
    f32 = jnp.float32
    a_hi = a.astype(jnp.bfloat16)
    a_lo = (a - a_hi.astype(f32)).astype(jnp.bfloat16)
    b_hi = b.astype(jnp.bfloat16)
    b_lo = (b - b_hi.astype(f32)).astype(jnp.bfloat16)
    d = lambda x, y: jax.lax.dot_general(x, y, dn, preferred_element_type=f32)
    return d(a_hi, b_hi) + d(a_hi, b_lo) + d(a_lo, b_hi)


def kernel_dot(inverse: bool = False, override: Optional[str] = None):
    """Trace-time dot factory for Pallas kernels: honors the module FFT
    precision knob, implementing HIGH as explicit bf16x3 (see above)
    instead of rounding it up to HIGHEST. Returns ``dot(a, b, dn)``.

    ``inverse=True`` selects the whitened-inverse knob
    (`fft.set_inverse_precision`, default single-pass bf16 — the PHAT
    transform flattens dynamic range, measured τ parity 1.1e-5 samples
    vs bf16x3 on-chip at the flagship shape). ``override`` (a name from
    `fft._PRECISION_TABLE`) bypasses both knobs — PHAT chains pass
    'default' for their FORWARD transform too: the whitening consumes
    only cross-spectrum PHASE, whose per-bin bf16 noise averages down
    across the thousands of bins a τ estimate integrates (measured
    on-chip r4: τ parity 4.6e-5 samples vs bf16x3, step 7.46 → 6.80
    ms/block at 128 ch — docs/probe_logs/ab_fwd_precision.log)."""
    import jax as _jax

    from radio_mapper_tpu.ops import fft as fft_ops

    if override is not None:
        p = fft_ops._PRECISION_TABLE[override]
    else:
        p = fft_ops.get_inverse_precision() if inverse else fft_ops.get_precision()
    if p == _jax.lax.Precision.HIGH:
        return _dot_bf16x3
    return lambda a, b, dn: jax.lax.dot_general(
        a, b, dn, preferred_element_type=jnp.float32, precision=p
    )


def _fft_rows_kernel(
    xre_ref, xim_ref,
    w1re_ref, w1im_ref, w2re_ref, w2im_ref, twre_ref, twim_ref,
    ore_ref, oim_ref,
    *, n1: int, n2: int, rows: int,
):
    """One grid cell transforms `rows` rows of length n1·n2, loop-free.

    All rows fold into the free dimension of two big MXU matmuls
    ([n2, n2] × [n2, rows·n1] and [rows·n2, n1] × [n1, n1]) — per-row
    128³ matmuls would leave the systolic array mostly idle.
    """

    dot = kernel_dot()
    dn = (((1,), (0,)), ((), ()))

    w1re, w1im = w1re_ref[:], w1im_ref[:]
    w2re, w2im = w2re_ref[:], w2im_ref[:]
    # Twiddle tiled across rows: [n2, rows*n1] (constant, still small).
    twre = jnp.concatenate([twre_ref[:]] * rows, axis=1)
    twim = jnp.concatenate([twim_ref[:]] * rows, axis=1)

    def load(ref):
        # [rows, N] → A_all[n2, rows·n1]: A_all[n2, r·n1+j] = x[r, j + n1·n2].
        a = ref[:].reshape(rows, n2, n1)
        return jnp.transpose(a, (1, 0, 2)).reshape(n2, rows * n1)

    are, aim = load(xre_ref), load(xim_ref)

    # Inner DFT over n2 — one wide matmul per real part.
    bre = dot(w2re, are, dn) - dot(w2im, aim, dn)
    bim = dot(w2re, aim, dn) + dot(w2im, are, dn)

    # Twiddle (VPU).
    cre = bre * twre - bim * twim
    cim = bre * twim + bim * twre

    # Regroup for the outer DFT: [n2, rows, n1] → [rows·n2, n1].
    regroup = lambda c: jnp.transpose(
        c.reshape(n2, rows, n1), (1, 0, 2)
    ).reshape(rows * n2, n1)
    cre, cim = regroup(cre), regroup(cim)

    # Outer DFT over n1 (W1 symmetric ⇒ right-multiply): D[r·n2+k2, k1].
    dre = dot(cre, w1re, dn) - dot(cim, w1im, dn)
    dim = dot(cre, w1im, dn) + dot(cim, w1re, dn)

    # Output flat index k = k2 + n2·k1 ⇒ per row transpose [k2,k1] → [k1,k2].
    unpack = lambda d: jnp.transpose(
        d.reshape(rows, n2, n1), (0, 2, 1)
    ).reshape(rows, n1 * n2)
    ore_ref[:] = unpack(dre)
    oim_ref[:] = unpack(dim)




def _sds(shape, dtype, vma=None):
    """ShapeDtypeStruct with optional varying-mesh-axes annotation.

    Inside `jax.shard_map(..., check_vma=True)` a pallas_call must declare
    which mesh axes its outputs vary over (they inherit nothing)."""
    if vma is None:
        return jax.ShapeDtypeStruct(shape, dtype)
    return jax.ShapeDtypeStruct(shape, dtype, vma=frozenset(vma))


def _lift(a, vma=None):
    """Mark a replicated constant as varying over ``vma`` mesh axes.

    Under check_vma, the kernel body (esp. interpret-mode tracing) mixes
    DFT constants with shard-varying data; `jax.lax.pcast` aligns them."""
    a = jnp.asarray(a)
    if vma:
        a = jax.lax.pcast(a, tuple(vma), to="varying")
    return a

def fft_rows(
    re: jnp.ndarray,
    im: jnp.ndarray,
    *,
    rows_per_block: int = 8,
    interpret: Optional[bool] = None,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Batched forward FFT over the last axis of an (re, im) float32 pair.

    ``re``/``im``: [..., N]; returns same shapes. N must factor into
    N1·N2 ≤ 256². Rows are processed `rows_per_block` per grid cell with
    all DFT constants resident in VMEM.
    """
    if re.shape != im.shape:
        raise ValueError("re/im shape mismatch")
    n = re.shape[-1]
    n1, n2, w1re, w1im, w2re, w2im, twre, twim = _constants(n)
    if interpret is None:
        interpret = jax.default_backend() != "tpu"

    batch_shape = re.shape[:-1]
    batch = int(np.prod(batch_shape)) if batch_shape else 1
    re2 = re.reshape(batch, n).astype(jnp.float32)
    im2 = im.reshape(batch, n).astype(jnp.float32)

    # Pad the batch to a multiple of rows_per_block.
    padded = -(-batch // rows_per_block) * rows_per_block
    if padded != batch:
        pad = ((0, padded - batch), (0, 0))
        re2 = jnp.pad(re2, pad)
        im2 = jnp.pad(im2, pad)

    grid = (padded // rows_per_block,)
    row_spec = pl.BlockSpec(
        (rows_per_block, n), lambda i: (i, 0), memory_space=pltpu.VMEM
    )
    const_spec = lambda a: pl.BlockSpec(a.shape, lambda i: (0, 0), memory_space=pltpu.VMEM)

    kernel = functools.partial(_fft_rows_kernel, n1=n1, n2=n2, rows=rows_per_block)
    out_re, out_im = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            row_spec, row_spec,
            const_spec(w1re), const_spec(w1im),
            const_spec(w2re), const_spec(w2im),
            const_spec(twre), const_spec(twim),
        ],
        out_specs=[row_spec, row_spec],
        out_shape=[
            jax.ShapeDtypeStruct((padded, n), jnp.float32),
            jax.ShapeDtypeStruct((padded, n), jnp.float32),
        ],
        interpret=interpret,
    )(
        re2, im2,
        jnp.asarray(w1re), jnp.asarray(w1im),
        jnp.asarray(w2re), jnp.asarray(w2im),
        jnp.asarray(twre), jnp.asarray(twim),
    )
    out_re = out_re[:batch].reshape(*batch_shape, n)
    out_im = out_im[:batch].reshape(*batch_shape, n)
    return out_re, out_im


def fft(x: jnp.ndarray, **kwargs) -> jnp.ndarray:
    """complex64 wrapper over :func:`fft_rows`."""
    re, im = fft_rows(jnp.real(x), jnp.imag(x), **kwargs)
    return jax.lax.complex(re, im)


def ifft(x: jnp.ndarray, **kwargs) -> jnp.ndarray:
    n = x.shape[-1]
    y = jnp.conj(fft(jnp.conj(x), **kwargs))
    return y / n


# --------------------------------------------------------------------------
# CT-order ("digit-permuted") transforms.
#
# The natural-order kernel above needs BOTH factors lane-aligned because its
# output merge puts n2 minor (`mosaic_compatible`). But a transform pair used
# as FFT → elementwise → iFFT never needs natural bin order: if the forward
# emits X in the Cooley-Tukey permuted order m = k2·n1 + k1 (k = k2 + n2·k1)
# and the inverse consumes that same order, the permutation cancels — and
# every reshape keeps n1 minor, so only n1 ≡ 0 (mod 128) is required. That
# unlocks fusion for the flagship GCC length 17280 = 135·128, which the
# natural-order kernel cannot compile (VERDICT r1 §weak-2).
#
# PHAT/SCOT/ROTH whitening is bin-permutation-invariant (elementwise with a
# per-spectrum max), so the GCC chain is exactly such a pair.
# --------------------------------------------------------------------------


def ct_split(n: int) -> Tuple[int, int]:
    """(n1, n2) with n = n1·n2, n1 a multiple of 128 minimizing n1+n2.

    Splits whose n2 is ALSO a multiple of 8 (the f32 sublane granule) are
    strongly preferred: sublane-misaligned n2 (e.g. 132) forces masked
    layouts through every matmul and measured an order-of-magnitude
    slower Mosaic compile on the target chip. Raises ValueError when no
    lane-aligned factor exists (routing falls back to the matmul path).
    """
    best = None  # (misaligned, n1+n2, n1, n2) — lexicographic preference
    n1 = 128
    while n1 <= min(n, 1024):
        if n % n1 == 0:
            n2 = n // n1
            if n2 <= 1024:
                key = (n2 % 8 != 0, n1 + n2, n1, n2)
                if best is None or key < best:
                    best = key
        n1 += 128
    if best is None:
        raise ValueError(f"no lane-aligned factorization for FFT length {n}")
    return best[2], best[3]


def ct_supported(n: int) -> bool:
    try:
        ct_split(n)
        return True
    except ValueError:
        return False


@functools.lru_cache(maxsize=None)
def ct_constants(n: int, inverse: bool = False):
    """DFT/twiddle matrices for the CT-order kernels (conjugated for the
    inverse; the 1/N scale is applied by the caller)."""
    n1, n2 = ct_split(n)
    sign = 2j if inverse else -2j
    w1 = np.exp(sign * np.pi * np.outer(np.arange(n1), np.arange(n1)) / n1)
    w2 = np.exp(sign * np.pi * np.outer(np.arange(n2), np.arange(n2)) / n2)
    tw = np.exp(sign * np.pi * np.outer(np.arange(n2), np.arange(n1)) / n)  # [k2, p]
    f32 = lambda a: a.astype(np.float32)
    return (
        n1, n2,
        f32(w1.real), f32(w1.imag),
        f32(w2.real), f32(w2.imag),
        f32(tw.real), f32(tw.imag),
    )


def ct_permutation(n: int) -> np.ndarray:
    """perm with X_ct[m] = X_natural[perm[m]] (for tests/diagnostics)."""
    n1, n2 = ct_split(n)
    k2 = np.arange(n2)[:, None]
    k1 = np.arange(n1)[None, :]
    return (k2 + n2 * k1).reshape(-1)  # index m = k2*n1 + k1 row-major


def ct_unpermute(x: jnp.ndarray) -> jnp.ndarray:
    """CT-order last axis → natural bin order, as one XLA transpose.

    CT index m = k2·n1 + k1 viewed as C[k2, k1]; natural index
    k = k2 + n2·k1 viewed as N[k1, k2] — so N = Cᵀ. Lets natural-order
    consumers (e.g. the peak detector, whose local-max window needs
    frequency-adjacent bins) reuse :func:`fft_rows_ct` spectra for the
    cost of one [n2, n1] transpose instead of a second forward FFT.
    """
    n = x.shape[-1]
    n1, n2 = ct_split(n)
    y = x.reshape(*x.shape[:-1], n2, n1)
    y = jnp.swapaxes(y, -1, -2)
    return y.reshape(*x.shape[:-1], n)


def ct_fft_core(
    xre, xim,
    w1re, w1im, w2re, w2im, twre0, twim0,
    *, rows: int, n1: int, n2: int, dot,
):
    """In-register CT-order forward DFT of ``[rows, n1·n2]`` (re, im).

    The shared body of `_fft_rows_ct_kernel` and the fused FFT+detect
    kernel (ops/pallas/detect_kernel.fft_detect_rows_ct): values in,
    values out — callers own the refs. Output flat index m = k2·n1 + k1.
    """
    dn = (((1,), (0,)), ((), ()))
    twre = jnp.concatenate([twre0] * rows, axis=1)
    twim = jnp.concatenate([twim0] * rows, axis=1)

    def load(a):
        # [rows, N] → A_all[n2, rows·n1]: A_all[q, r·n1+p] = x[r, q·n1+p].
        a = a.reshape(rows, n2, n1)
        return jnp.transpose(a, (1, 0, 2)).reshape(n2, rows * n1)

    are, aim = load(xre), load(xim)

    # Inner DFT over q: B[k2, r·n1+p].
    bre = dot(w2re, are, dn) - dot(w2im, aim, dn)
    bim = dot(w2re, aim, dn) + dot(w2im, are, dn)

    # Twiddle W_n^{p·k2} (VPU).
    cre = bre * twre - bim * twim
    cim = bre * twim + bim * twre

    # Regroup to [rows·n2, n1] and outer DFT over p: D[r·n2+k2, k1].
    regroup = lambda c: jnp.transpose(
        c.reshape(n2, rows, n1), (1, 0, 2)
    ).reshape(rows * n2, n1)
    cre, cim = regroup(cre), regroup(cim)

    dre = dot(cre, w1re, dn) - dot(cim, w1im, dn)
    dim = dot(cre, w1im, dn) + dot(cim, w1re, dn)

    # CT order: flat m = k2·n1 + k1 — a no-op merge, n1 stays minor.
    return dre.reshape(rows, n1 * n2), dim.reshape(rows, n1 * n2)


def _fft_rows_ct_kernel(
    xre_ref, xim_ref,
    w1re_ref, w1im_ref, w2re_ref, w2im_ref, twre_ref, twim_ref,
    ore_ref, oim_ref,
    *, n1: int, n2: int, rows: int, precision: Optional[str] = None,
):
    """Forward DFT of `rows` rows, output in CT order m = k2·n1 + k1.

    Identical math to `_fft_rows_kernel` with the final natural-order
    transpose REMOVED — which is also what makes it compile for any
    n1 ≡ 0 (mod 128) regardless of n2.
    """
    dot = kernel_dot(override=precision)
    ore, oim = ct_fft_core(
        xre_ref[:], xim_ref[:],
        w1re_ref[:], w1im_ref[:], w2re_ref[:], w2im_ref[:],
        twre_ref[:], twim_ref[:],
        rows=rows, n1=n1, n2=n2, dot=dot,
    )
    ore_ref[:] = ore
    oim_ref[:] = oim


def fft_rows_ct(
    re: jnp.ndarray,
    im: jnp.ndarray,
    *,
    rows_per_block: Optional[int] = None,
    interpret: Optional[bool] = None,
    vma=None,
    precision: Optional[str] = None,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Batched forward FFT emitting CT-order bins (see module note).

    Output[m] = FFT(x)[k2 + n2·k1] at m = k2·n1 + k1. Pair with
    :func:`radio_mapper_tpu.ops.pallas.gcc_kernel` ops or
    :func:`ifft_rows_ct_numpy` — NOT with natural-order consumers.

    ``rows_per_block=None`` picks 16 rows for flagship-sized transforms
    and 8 beyond: 16 halves the grid-cell count and doubles the DFT
    matmuls' free dimension, measured ~7% faster on-chip at n=17408
    (tools/probe_ab_tiles.py). The cutoff stays near the measured point
    (≤ 24576 ≈ 1.5 MB/row-block per plane) rather than extending to an
    unverified VMEM regime — at 32768 the 16-row working set (I/O plus
    intermediates) approaches the per-core VMEM budget.
    """
    if re.shape != im.shape:
        raise ValueError("re/im shape mismatch")
    n = re.shape[-1]
    if rows_per_block is None:
        rows_per_block = 16 if n <= 24_576 else 8
    n1, n2, w1re, w1im, w2re, w2im, twre, twim = ct_constants(n)
    if interpret is None:
        interpret = jax.default_backend() != "tpu"

    batch_shape = re.shape[:-1]
    batch = int(np.prod(batch_shape)) if batch_shape else 1
    re2 = re.reshape(batch, n).astype(jnp.float32)
    im2 = im.reshape(batch, n).astype(jnp.float32)
    padded = -(-batch // rows_per_block) * rows_per_block
    if padded != batch:
        pad = ((0, padded - batch), (0, 0))
        re2 = jnp.pad(re2, pad)
        im2 = jnp.pad(im2, pad)

    grid = (padded // rows_per_block,)
    row_spec = pl.BlockSpec(
        (rows_per_block, n), lambda i: (i, 0), memory_space=pltpu.VMEM
    )
    const_spec = lambda a: pl.BlockSpec(a.shape, lambda i: (0, 0), memory_space=pltpu.VMEM)

    kernel = functools.partial(
        _fft_rows_ct_kernel, n1=n1, n2=n2, rows=rows_per_block,
        precision=precision,
    )
    out_re, out_im = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            row_spec, row_spec,
            const_spec(w1re), const_spec(w1im),
            const_spec(w2re), const_spec(w2im),
            const_spec(twre), const_spec(twim),
        ],
        out_specs=[row_spec, row_spec],
        out_shape=[
            _sds((padded, n), jnp.float32, vma),
            _sds((padded, n), jnp.float32, vma),
        ],
        interpret=interpret,
    )(
        re2, im2,
        _lift(w1re, vma), _lift(w1im, vma),
        _lift(w2re, vma), _lift(w2im, vma),
        _lift(twre, vma), _lift(twim, vma),
    )
    out_re = out_re[:batch].reshape(*batch_shape, n)
    out_im = out_im[:batch].reshape(*batch_shape, n)
    return out_re, out_im
