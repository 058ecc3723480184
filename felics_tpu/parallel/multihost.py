"""Multi-host (multi-process) FLCT encoding over a global device mesh.

The reference is a single-threaded, single-process program (SURVEY §2:
"Parallelism / distributed inventory: none"); this module is the from-scratch
distributed tier the TPU build adds (SURVEY §7 step 7): ``jax.distributed``
process groups, a global 1-D tile mesh spanning every process's devices, and
the fused all-static encode step running SPMD over it. The per-tile length
cumsum inside the step is the one cross-device collective (the
all-gather-of-lengths in BASELINE.json's design); GSPMD inserts it over
ICI/DCN from the sharding annotations — no hand-written NCCL/MPI analog.

Design constraints honored here:

  * the encode graph is ALL-STATIC (``fused_encode_step`` with a
    worst-case payload bound) — no host round-trip inside the step, so no
    per-process divergence and no cross-host sync beyond the collectives;
  * every process feeds the same host image (replicated input; the k-prior
    is a deterministic host computation, so the header is identical on all
    processes) and assembles the identical container — byte-equal to the
    single-process ``tiling.compress_tiled_bytes`` output, which the
    multi-process test pins;
  * result gathering uses ``multihost_utils.process_allgather`` (the
    documented way to materialize a global array on every host).

Run ``init_process()`` once per process before any JAX compute, then
``encode_tiled_multihost``.
"""

from __future__ import annotations

from typing import Optional

import numpy as np

from felics_tpu.config import TileConfig, tiled_config_for_depth
from felics_tpu.ops.kscan_tiled import num_buckets
from felics_tpu.parallel import tiling


def init_process(
    coordinator_address: str,
    num_processes: int,
    process_id: int,
    local_device_ids=None,
) -> None:
    """Join the ``jax.distributed`` process group (idempotent per process).

    coordinator_address: "host:port" of process 0's coordination service.
    Must run before the first JAX computation in the process.
    """
    import jax

    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
        local_device_ids=local_device_ids,
    )


def global_tile_mesh(axis: str = "tiles"):
    """1-D mesh over every device of every process in the group."""
    import jax
    from jax.sharding import Mesh

    return Mesh(np.asarray(jax.devices()), (axis,))


def encode_tiled_multihost(
    image: np.ndarray,
    tile: Optional[TileConfig] = None,
    mesh=None,
    axis: str = "tiles",
) -> bytes:
    """FLCT encode with tiles sharded over a multi-process global mesh.

    Every process passes the same ``image`` and receives the same container
    bytes — byte-identical to single-process tiling.compress_tiled_bytes.
    """
    import jax
    import jax.numpy as jnp
    from jax.experimental import multihost_utils
    from jax.sharding import NamedSharding, PartitionSpec as P

    from felics_tpu.api import header_for_array
    from felics_tpu.parallel.mesh import (
        fused_encode_step,
        worst_case_payload_bits,
    )

    base = header_for_array(image)
    tile = tile or TileConfig()
    h, w = base.height, base.width
    if h == 0 or w == 0:
        return tiling.compress_tiled_bytes(image, tile)
    if mesh is None:
        mesh = global_tile_mesh(axis)
    th, tw = tiling._clamped_tile_dims(h, w, tile)
    cfg = tiled_config_for_depth(base.pixel_depth)
    nb = num_buckets(cfg)

    tiles_np, ty, tx = tiling._prepare_tiles(image, base.color_type, th, tw)
    n_tiles, c, t = tiles_np.shape
    k0 = tiling.compute_k0(tiles_np, th, tw, cfg, nb)
    prior_np = tiling.prior_from_k0(k0, cfg, c)

    n_dev = mesh.devices.size
    pad_tiles = (-n_tiles) % n_dev
    if pad_tiles:
        tiles_np = np.concatenate(
            [tiles_np, np.zeros((pad_tiles,) + tiles_np.shape[1:], np.int32)]
        )
    nt_pad = tiles_np.shape[0]

    sharding = NamedSharding(mesh, P(axis, None, None))
    # Each process contributes its addressable shards of the (replicated
    # host-side) tile array — the supported construction for global arrays.
    tiles = jax.make_array_from_callback(
        tiles_np.shape, sharding, lambda idx: tiles_np[idx]
    )
    prior = jnp.asarray(prior_np)

    b_pad = worst_case_payload_bits(nt_pad, c, t, cfg)
    packed, tile_bytes, total = fused_encode_step(
        tiles, th, tw, cfg, nb, b_pad, prior
    )

    # Materialize the (sharded) results on every host.
    packed_np = np.asarray(multihost_utils.process_allgather(packed, tiled=True))
    tile_bytes_np = np.asarray(
        multihost_utils.process_allgather(tile_bytes, tiled=True)
    ).astype(np.int64)[:n_tiles]
    payload_len = int(tile_bytes_np.sum())
    payload = packed_np[:payload_len].tobytes()
    return tiling.pack_tiled_container(
        base.color_type, base.pixel_depth, w, h, tw, th, n_tiles,
        tile_bytes_np, payload, k0,
    )
