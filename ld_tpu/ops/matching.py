"""Bipartite matching on-device (DETR / Sparse R-CNN).

The reference runs scipy's Hungarian LAP on host
(mmdet/core/bbox/assigners/hungarian_assigner.py via
scipy.optimize.linear_sum_assignment) — a hard host sync inside the train
step. TPU-first replacement: `hungarian_lap`, an EXACT O(R*C^2)
Jonker-Volgenant shortest-augmenting-path solver whose inner Dijkstra
steps are O(C) vector ops inside bounded `lax.while_loop`s — fully
jittable and vmappable, no host round-trip, verified exactly equal to
scipy in tests/test_matching.py. Detection problems are tiny
(R<=~32 gts, C~100-300 queries), so the sequential augmentations cost
microseconds-to-milliseconds, same order as the reference's host solver
but without breaking the compiled step.

`auction_lap` (Bertsekas auction, fixed rounds) is kept as a faster
approximate alternative for larger problems.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

BIG = 1e18


def hungarian_lap(cost: jnp.ndarray,
                  row_valid: jnp.ndarray = None) -> jnp.ndarray:
    """Exact min-cost assignment of R rows to C columns (C >= R).

    Returns (R,) int32 column per row, -1 for invalid rows.
    """
    n, m = cost.shape
    if row_valid is None:
        row_valid = jnp.ones((n, ), bool)
    # invalid rows get a flat dummy cost so they soak up leftover columns
    a = jnp.where(row_valid[:, None], cost, 0.0)
    # 1-indexed with dummy row 0 / dummy col 0 (e-maxx JV formulation)
    a = jnp.pad(a.astype(jnp.float32), ((1, 0), (1, 0)))
    cols = jnp.arange(m + 1)

    def add_row(state, i):
        u, v, p = state                      # p[j] = row matched to col j
        p = p.at[0].set(i)
        minv = jnp.full(m + 1, BIG, a.dtype)
        way = jnp.zeros(m + 1, jnp.int32)
        used = jnp.zeros(m + 1, bool)

        def step(s):
            u, v, p, minv, way, used, j0 = s
            used = used.at[j0].set(True)
            i0 = p[j0]
            cur = a[i0] - u[i0] - v
            upd = (~used) & (cur < minv) & (cols > 0)
            minv = jnp.where(upd, cur, minv)
            way = jnp.where(upd, j0, way)
            masked = jnp.where(used | (cols == 0), BIG, minv)
            j1 = jnp.argmin(masked).astype(jnp.int32)
            delta = masked[j1]
            # potentials: u[p[j]] += delta for used cols, v[j] -= delta
            row_hit = jnp.zeros(n + 1, a.dtype).at[
                jnp.where(used, p, 0)].add(jnp.where(used, 1.0, 0.0))
            u = u + delta * jnp.where(row_hit > 0, 1.0, 0.0)
            u = u.at[0].set(0.0)
            v = jnp.where(used, v - delta, v)
            minv = jnp.where(~used, minv - delta, minv)
            return u, v, p, minv, way, used, j1

        def cond(s):
            _, _, p, _, _, _, j0 = s
            return p[j0] != 0

        s = step((u, v, p, minv, way, used, jnp.asarray(0, jnp.int32)))
        u, v, p, minv, way, used, j0 = jax.lax.while_loop(cond, step, s)

        # augment along parent links
        def aug_cond(s):
            _, j0 = s
            return j0 != 0

        def aug_body(s):
            p, j0 = s
            j1 = way[j0]
            p = p.at[j0].set(p[j1])
            return p, j1

        p, _ = jax.lax.while_loop(aug_cond, aug_body, (p, j0))
        return (u, v, p), None

    u0 = jnp.zeros(n + 1, a.dtype)
    v0 = jnp.zeros(m + 1, a.dtype)
    p0 = jnp.zeros(m + 1, jnp.int32)
    (_, _, p), _ = jax.lax.scan(add_row, (u0, v0, p0),
                                jnp.arange(1, n + 1, dtype=jnp.int32))
    # p[j] = row+1 matched to col j (cols 1..m); invert to row -> col-1
    rows = jnp.arange(1, n + 1)
    hit = p[None, 1:] == rows[:, None]                    # (n, m)
    col = jnp.where(hit.any(1), hit.argmax(1), -1)
    return jnp.where(row_valid, col, -1).astype(jnp.int32)


def auction_lap(cost: jnp.ndarray, row_valid: jnp.ndarray = None,
                iters: int = 400) -> jnp.ndarray:
    """Approximate (eps-optimal) auction assignment — faster for large C."""
    r, c = cost.shape
    if row_valid is None:
        row_valid = jnp.ones((r, ), bool)
    value = -cost
    spread = jnp.maximum(value.max() - value.min(), 1e-3)
    eps_hi = spread / 2.0
    eps_lo = spread / (40.0 * max(c, 1))

    def body(state, t):
        owner, price = state
        frac = t / max(iters - 1, 1)
        eps = eps_hi * (eps_lo / eps_hi)**frac
        has = owner[None, :] == jnp.arange(r)[:, None]
        assigned_col = jnp.where(has.any(1), has.argmax(1), -1)
        unassigned = (assigned_col < 0) & row_valid
        net = value - price[None, :]
        best_v, best_j = jax.lax.top_k(net, 2)
        bid_incr = best_v[:, 0] - best_v[:, 1] + eps
        bids = jnp.where(unassigned[:, None] &
                         (jnp.arange(c)[None, :] == best_j[:, 0:1]),
                         (price[best_j[:, 0]] + bid_incr)[:, None], -BIG)
        top_bid = bids.max(axis=0)
        won = top_bid > -BIG / 2
        price = jnp.where(won, top_bid, price)
        owner = jnp.where(won, bids.argmax(axis=0), owner)
        return (owner, price), None

    owner0 = jnp.full((c, ), -1, jnp.int32)
    (owner, _), _ = jax.lax.scan(body, (owner0, jnp.zeros(c)),
                                 jnp.arange(iters, dtype=jnp.float32))
    has = owner[None, :] == jnp.arange(r)[:, None]
    col = jnp.where(has.any(1) & row_valid, has.argmax(1), -1)
    return col.astype(jnp.int32)
