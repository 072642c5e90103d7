"""Parallelism layer: device meshes, shardings, halo exchange, SPMD pipeline.

The reference scales by running one OS process per SDR dongle and pushing
JSON over a WebSocket star (`docker-compose.pi.yml`,
`central_processor.py:501-514`). Here parallelism is SPMD over a
`jax.sharding.Mesh`:

  axis "ch"  — channel/buoy-batch data parallelism (the reference's
               one-process-per-buoy, generalized);
  axis "blk" — time-block/sequence parallelism with overlap-save halo
               exchange via `ppermute` (the reference's independent 8192-
               sample blocks, `iq_stream_client.py:496-503`, made gap-free);
  pair-parallel GCC work rides on whichever axis is free, with results
  combined by all_gather/psum (the reference's sequential pair loop,
  `tdoa_processor.py:156-193`).
"""

from radio_mapper_tpu.parallel.mesh import (
    DEFAULT_AXES,
    balanced_mesh_shape,
    make_mesh,
)
from radio_mapper_tpu.parallel.halo import left_halo, with_left_halo

__all__ = [
    "DEFAULT_AXES",
    "balanced_mesh_shape",
    "make_mesh",
    "left_halo",
    "with_left_halo",
]
