"""Sort-free batched k-scan for the tiled (FLCT) mode.

FLCT replaces the reference's exact-Δ context table with log-bucketed
contexts for the *k estimator only* (phase-in coding still uses the exact Δ):
``qctx = bit_length(Δ)`` — 10 buckets for 8-bit, 18 for 16-bit. Buckets make
the (domain = tile × channel, bucket) space small and dense, which deletes
the global argsort the FLCS kscan needs:

  * per-pixel rank within its (domain, bucket) = running count of prior
    out-of-range pixels of that bucket in the domain — NB cumsums along the
    pixel axis, no sort;
  * the queue matrix U[(domain, bucket), rank] is scattered directly;
  * one lax.scan over ranks advances every (domain, bucket) table in
    parallel — with per-tile restarts the max rank is bounded by tile area,
    so the scan is short and fully data-parallel across tiles.

Every op is independent per domain, so the whole thing shards cleanly over a
device mesh with tiles on the batch axis (no cross-device traffic).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from felics_tpu.config import CodingConfig


def qctx_of(context):
    """Log-bucket a context: bit_length(Δ) (0 → 0, 1 → 1, 2-3 → 2, ...)."""
    return jnp.where(context > 0, 32 - jax.lax.clz(context.astype(jnp.int32)), 0)


def num_buckets(cfg: CodingConfig) -> int:
    return int(cfg.max_context).bit_length() + 1


@partial(jax.jit, static_argnames=("nb",))
def rank_and_count(qctx, oor, nb: int):
    """Per-pixel rank within (domain, bucket) + per-bucket counts.

    qctx, oor: (D, T). Returns rank (D, T) int32 and counts (D, nb) int32.
    """
    d, t = qctx.shape
    rank = jnp.zeros((d, t), jnp.int32)
    counts = jnp.zeros((d, nb), jnp.int32)
    for b in range(nb):
        ind = (qctx == b) & oor
        cum = jnp.cumsum(ind.astype(jnp.int32), axis=1)
        rank = jnp.where(ind, cum - 1, rank)
        counts = counts.at[:, b].set(cum[:, -1])
    return rank, counts


@partial(jax.jit, static_argnames=("cfg", "nb", "r_pad"))
def kscan_tiled(
    qctx, oor, residual, rank, cfg: CodingConfig, nb: int, r_pad: int
):
    """k per pixel for (D, T) domains with bucketed contexts.

    ``r_pad``: static bound >= max rank + 1 (bucketized or worst-case T).
    """
    d, t = qctx.shape
    k_values = jnp.asarray(cfg.k_values, dtype=jnp.int32)
    num_k = cfg.num_k
    rows = d * nb

    dom = jnp.arange(d, dtype=jnp.int32)[:, None]
    row_id = dom * nb + qctx  # (D, T)
    flat_pos = jnp.where(oor, row_id * r_pad + rank, rows * r_pad)
    u = (
        jnp.zeros((rows * r_pad + 1,), jnp.int32)
        .at[flat_pos.reshape(-1)]
        .set(jnp.where(oor, residual, 0).reshape(-1), mode="drop")[:-1]
        .reshape(rows, r_pad)
    )
    u_valid = (
        jnp.zeros((rows * r_pad + 1,), jnp.bool_)
        .at[flat_pos.reshape(-1)]
        .set(oor.reshape(-1), mode="drop")[:-1]
        .reshape(rows, r_pad)
    )

    halve_at = cfg.count_scaling

    def step(table, inputs):
        vals, vmask = inputs  # (rows,), (rows,)
        best = (num_k - 1) - jnp.argmin(table[:, ::-1], axis=1)
        k_out = k_values[best].astype(jnp.int8)
        row = (vals[:, None] >> k_values[None, :]) + 1 + k_values[None, :]
        new_table = table + jnp.where(vmask[:, None], row, 0)
        if halve_at is not None:
            halve = jnp.min(new_table, axis=1, keepdims=True) > halve_at
            new_table = jnp.where(halve & vmask[:, None], new_table >> 1, new_table)
        return new_table, k_out

    init = jnp.zeros((rows, num_k), jnp.int32)
    # unroll amortizes per-step dispatch overhead across rank updates.
    _, k_by_rank = jax.lax.scan(
        step, init, (u.T, u_valid.T), unroll=8
    )  # (r_pad, rows)

    k = k_by_rank[jnp.clip(rank, 0, r_pad - 1), row_id].astype(jnp.int32)
    return jnp.where(oor, k, k_values[num_k - 1])
