"""On-chip probe: are the stock XLA ops safe.py replaces actually broken?

Round 1 built ops/safe.py (bisection median, roll-doubling sliding max,
iterative top-k, one-hot gathers) because sort/top_k/gather/median/
reduce_window were UNPROVEN on the target runtime — never because they
were observed failing (VERDICT r1 §weak-4). This probe establishes ground
truth per op, in a FRESH process per op (one UNIMPLEMENTED op poisons the
whole client session — CLAUDE.md protocol).

Usage (one op per process, sequential, gaps between):
    python tools/probe_safe_ops.py sort|top_k|gather|median|reduce_window|
                                   argsort|complex64|timing
Each prints one line: `<op> OK <seconds>s` or `<op> FAIL <error>`.
"""

import sys
import time

import numpy as np


def _run(op: str) -> int:
    import jax
    import jax.numpy as jnp

    rng = np.random.default_rng(0)
    x = rng.normal(size=(8, 2048)).astype(np.float32)

    t0 = time.time()
    try:
        if op == "sort":
            got = np.asarray(jax.jit(jnp.sort)(jnp.asarray(x)))
            assert np.allclose(got, np.sort(x, axis=-1)), "wrong values"
        elif op == "top_k":
            f = jax.jit(lambda a: jax.lax.top_k(a, 8))
            v, i = f(jnp.asarray(x))
            v, i = np.asarray(v), np.asarray(i)
            want = np.sort(x, axis=-1)[:, ::-1][:, :8]
            assert np.allclose(v, want), "wrong top-k values"
            assert np.allclose(np.take_along_axis(x, i, axis=-1), v)
        elif op == "gather":
            idx = rng.integers(0, 2048, size=(8, 16))
            f = jax.jit(lambda a, i: jnp.take_along_axis(a, i, axis=-1))
            got = np.asarray(f(jnp.asarray(x), jnp.asarray(idx)))
            assert np.allclose(got, np.take_along_axis(x, idx, axis=-1))
        elif op == "median":
            got = np.asarray(jax.jit(lambda a: jnp.median(a, axis=-1))(jnp.asarray(x)))
            assert np.allclose(got, np.median(x, axis=-1), atol=1e-5)
        elif op == "reduce_window":
            f = jax.jit(
                lambda a: jax.lax.reduce_window(
                    a, -jnp.inf, jax.lax.max, (1, 21), (1, 1), "SAME"
                )
            )
            got = np.asarray(f(jnp.asarray(x)))
            from scipy.ndimage import maximum_filter1d

            want = maximum_filter1d(x, size=21, axis=-1, mode="constant", cval=-np.inf)
            assert np.allclose(got, want), "wrong sliding max"
        elif op == "argsort":
            got = np.asarray(jax.jit(jnp.argsort)(jnp.asarray(x)))
            assert np.allclose(
                np.take_along_axis(x, got, -1), np.sort(x, -1)
            )
        elif op == "complex64":
            z = (x[:, :256] + 1j * x[:, 256:512]).astype(np.complex64)
            zz = jax.device_put(z)
            got = np.asarray(jax.jit(lambda a: (a * jnp.conj(a)).real)(zz))
            assert np.allclose(got, np.abs(z) ** 2, rtol=1e-5)
        elif op == "timing":
            # safe-mode vs stock detector cost on identical input.
            from radio_mapper_tpu.ops import detect as detect_ops
            from radio_mapper_tpu.ops import safe

            p = rng.normal(size=(32, 8, 8448)).astype(np.float32) * 10 - 60
            pj = jax.device_put(p)

            def bench(enabled):
                safe.set_safe_mode(enabled)
                f = jax.jit(
                    lambda a: detect_ops.detect_peaks(
                        a, sample_rate_hz=2.4e6, max_peaks=8
                    )
                )
                out = f(pj)
                jax.block_until_ready(out)
                ts = []
                for _ in range(10):
                    t = time.time()
                    out = f(pj)
                    jax.block_until_ready(out)
                    ts.append(time.time() - t)
                return float(np.median(ts))

            t_safe = bench(True)
            t_stock = bench(False)
            safe.set_safe_mode(None)
            print(
                f"timing OK safe={t_safe*1e3:.2f}ms stock={t_stock*1e3:.2f}ms "
                f"ratio={t_safe/t_stock:.2f}",
                flush=True,
            )
            return 0
        else:
            print(f"unknown op {op!r}", flush=True)
            return 2
    except Exception as e:
        print(f"{op} FAIL {type(e).__name__}: {e}", flush=True)
        return 1
    print(f"{op} OK {time.time()-t0:.1f}s", flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(_run(sys.argv[1] if len(sys.argv) > 1 else "sort"))
