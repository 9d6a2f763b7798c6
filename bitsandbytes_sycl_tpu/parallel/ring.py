"""Ring attention — sequence/context parallelism over an "sp" mesh axis.

Completes the SURVEY.md §2.3 parallelism table (SP row, the stretch
goal): queries and the KV sequence are sharded along the sequence axis;
KV shards rotate around the ring with `ppermute` while each device
accumulates flash-style online-softmax partial results for its local
query shard. Peak memory per device is O(S/n · D) for K/V and O(S/n)
for running stats — long-context attention without ever materializing
full scores or a full KV replica.

Causality is handled per (query-shard, kv-shard) pair in absolute
positions, so the result is exactly standard causal attention.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P
from jax.experimental.shard_map import shard_map

__all__ = ["ring_attention"]


def _chunk_attend(q, k, v, q_pos, k_pos, scale):
    """Partial attention of q (B,Tq,H,D) against one kv chunk; returns
    (unnormalized acc (B,Tq,H,D), row max m, row sum l)."""
    sc = jnp.einsum("bthd,bshd->bhts", q.astype(jnp.float32), k.astype(jnp.float32)) * scale
    mask = k_pos[None, None, None, :] <= q_pos[None, None, :, None]
    sc = jnp.where(mask, sc, -1e30)
    m = jnp.max(sc, axis=-1)  # (B,H,Tq)
    w = jnp.exp(sc - m[..., None])
    l = jnp.sum(w, axis=-1)
    acc = jnp.einsum("bhts,bshd->bthd", w, v.astype(jnp.float32))
    return acc, m, l


def ring_attention(
    q: jax.Array,  # (B, S, H, D) sharded P(None, "sp") on sequence
    k: jax.Array,
    v: jax.Array,
    mesh: Mesh,
    axis: str = "sp",
    scale: Optional[float] = None,
) -> jax.Array:
    """Causal self-attention with sequence sharded over `axis`.

    q/k/v are (B, S, H, D) with S sharded; returns (B, S, H, D) sharded
    the same way. Each ring step attends the local query shard to the
    visiting kv shard and merges with the flash online-softmax rule.
    """
    B, S, H, D = q.shape
    n = mesh.shape[axis]
    scale = scale if scale is not None else 1.0 / float(np.sqrt(D))
    Tl = S // n

    def body(q_l, k_l, v_l):
        i = jax.lax.axis_index(axis)
        q_pos = i * Tl + jnp.arange(Tl)

        def step(carry, r):
            k_c, v_c, acc, m, l = carry
            # kv chunk visiting this device at round r originated at i - r
            src = (i - r) % n
            k_pos = src * Tl + jnp.arange(Tl)
            a_new, m_new, l_new = _chunk_attend(q_l, k_c, v_c, q_pos, k_pos, scale)
            m_all = jnp.maximum(m, m_new)
            c_old = jnp.exp(m - m_all)
            c_new = jnp.exp(m_new - m_all)
            acc = acc * c_old.transpose(0, 2, 1)[..., None] + a_new * c_new.transpose(0, 2, 1)[..., None]
            l = l * c_old + l_new * c_new
            # rotate kv one step around the ring
            perm = [(d, (d + 1) % n) for d in range(n)]
            k_c = jax.lax.ppermute(k_c, axis, perm)
            v_c = jax.lax.ppermute(v_c, axis, perm)
            return (k_c, v_c, acc, m_all, l), ()

        acc0 = jnp.zeros((B, Tl, H, D), jnp.float32)
        m0 = jnp.full((B, H, Tl), -1e30, jnp.float32)
        l0 = jnp.zeros((B, H, Tl), jnp.float32)
        (k_l, v_l, acc, m, l), _ = jax.lax.scan(
            step, (k_l, v_l, acc0, m0, l0), jnp.arange(n)
        )
        inv = jnp.where(l > 0, 1.0 / jnp.where(l > 0, l, 1.0), 0.0)
        return (acc * inv.transpose(0, 2, 1)[..., None]).astype(q_l.dtype)

    spec = P(None, axis)
    fn = shard_map(
        body, mesh=mesh,
        in_specs=(spec, spec, spec),
        out_specs=spec,
        check_rep=False,
    )
    return fn(q, k, v)
