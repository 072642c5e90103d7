"""Device-synchronization helpers shared by bench/tools/runtime.

`jax.block_until_ready` is NOT trustworthy on remote TPU backends: it
returned in ~0.04 ms for a ~40 GFLOP program whose true latency was
~29 ms (docs/PROBES.md). The only reliable completion barrier is a host
fetch of a value derived from the outputs.
"""

from __future__ import annotations

import numpy as np


def force_fetch(outs) -> float:
    """Force completion of every output in ``outs`` via ONE host fetch.

    The fetched scalar is derived from every leaf of EVERY output (tiny
    on-device reductions + adds), so no dispatched execution can be
    elided as dead code — the single materialized value depends on all
    of them. Returns the scalar (its value is meaningless; the fetch is
    the point).
    """
    import jax
    import jax.numpy as jnp

    if not isinstance(outs, (list, tuple)):
        outs = [outs]
    total = None
    for out in outs:
        for leaf in jax.tree_util.tree_leaves(out):
            s = jnp.sum(leaf.astype(jnp.float32))
            total = s if total is None else total + s
    return float(np.asarray(total))
