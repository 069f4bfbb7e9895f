"""Vectorized Jonker-Volgenant assignment solver (TPU-friendly LAPJV).

Replaces ``optax.assignment.hungarian_algorithm`` in the DETR criterion
(reference: scipy.linear_sum_assignment inside the torch HungarianMatcher,
Deformable-DETR ``matcher.py``). optax's port of Crouse's pseudocode keeps
the inner Dijkstra relaxation as a SCALAR ``fori_loop`` over remaining
columns — O(rows * cols) sequential scalar iterations per augmentation on
TPU, measured 212-320 ms for the criterion's [12, 300, 100] batch on v5e.

This implementation is the same shortest-augmenting-path algorithm with the
per-step work vectorized over columns: each Dijkstra *settle* is a handful
of [m]-wide vector ops (relax all columns at once, masked argmin, dual
update at the end), so an augmentation costs O(path settles) vector steps
instead of O(m) scalar steps. Exactness is preserved — it is still JV with
exact arithmetic; only tie-breaking order differs from scipy (any
minimum-cost assignment is returned, verified against
scipy.linear_sum_assignment in tests/test_ops_lapjv.py).

All costs must be finite. Rows are assigned in index order; with n <= m
every row ends up assigned (complete bipartite graph with finite costs).
"""

import jax
import jax.numpy as jnp

_INF = jnp.inf


def _assign_one_row(cost, u, v, row4col, col4row, cur_row):
    """Find + apply one augmenting path starting at ``cur_row``.

    cost [n, m]; u [n]; v [m]; row4col [m] (col -> row or -1);
    col4row [n] (row -> col or -1).
    """
    n, m = cost.shape

    # ---- Dijkstra from cur_row: settle columns until an unassigned
    # column is the nearest frontier node
    def dij_cond(s):
        return s[0] < 0

    def dij_body(s):
        sink, i, minv, spc, path, settled = s
        red = minv + cost[i] - u[i] - v  # [m] reduced path costs via row i
        better = (red < spc) & ~settled
        path = jnp.where(better, i, path)
        spc = jnp.where(better, red, spc)
        masked = jnp.where(settled, _INF, spc)
        best = masked.min()
        # prefer an UNASSIGNED column among minimum ties: terminates the
        # path as early as possible (Crouse's tie-break)
        tie_un = (masked == best) & (row4col == -1)
        j = jnp.where(tie_un.any(), jnp.argmax(tie_un), jnp.argmin(masked))
        settled = settled.at[j].set(True)
        minv = masked[j]
        sink = jnp.where(row4col[j] == -1, j, -1)
        i = jnp.where(sink >= 0, i, row4col[j])
        return sink, i, minv, spc, path, settled

    sink, _, minv, spc, path, settled = jax.lax.while_loop(
        dij_cond, dij_body,
        (jnp.int32(-1), cur_row, jnp.float32(0.0),
         jnp.full((m,), _INF, jnp.float32), jnp.full((m,), -1, jnp.int32),
         jnp.zeros((m,), bool)),
    )

    # ---- dual update (standard JV): scanned rows are cur_row plus the
    # rows of settled assigned columns
    scanned_rows = jnp.zeros((n,), bool).at[cur_row].set(True)
    owner = jnp.where(settled & (row4col >= 0), row4col, n)  # n = drop
    scanned_rows = scanned_rows.at[owner].set(True, mode="drop")
    # spc at each scanned row's current column (cur_row contributes 0)
    spc_at_row = jnp.full((n,), 0.0, jnp.float32).at[owner].set(
        jnp.where(settled, spc, 0.0), mode="drop"
    )
    u = jnp.where(scanned_rows, u + minv - spc_at_row, u)
    v = jnp.where(settled, v + spc - minv, v)

    # ---- augment: walk predecessor rows back from the sink
    def aug_cond(s):
        return s[0] >= 0

    def aug_body(s):
        j, row4col, col4row = s
        i = path[j]
        row4col = row4col.at[j].set(i)
        j_next = col4row[i]
        col4row = col4row.at[i].set(j)
        return j_next, row4col, col4row

    _, row4col, col4row = jax.lax.while_loop(
        aug_cond, aug_body, (sink, row4col, col4row)
    )
    return u, v, row4col, col4row


def lapjv(cost, n_rows=None):
    """Solve min-cost assignment for ``cost`` [n, m] with n <= m.

    Returns ``col4row`` [n]: the column assigned to each row (-1 for rows
    beyond ``n_rows``). ``n_rows`` (traced scalar, default n) restricts the
    solve to the first ``n_rows`` rows: the outer row loop is a while_loop
    with a DYNAMIC trip count, so a padded problem (DETR: MAX_GT=100 slots,
    ~10 real gt) costs only as many sequential augmentations as there are
    real rows — under vmap, as the batch maximum. Skipped rows cannot
    change the optimum over solved rows (they are simply absent from the
    restricted problem).
    """
    n, m = cost.shape
    if n > m:
        raise ValueError(f"lapjv requires n <= m, got {cost.shape}")
    cost = cost.astype(jnp.float32)
    # clamp the LIMIT, not the row index: a traced n_rows > n must stop at
    # n, not re-augment row n-1 (which corrupts row4col/col4row state)
    limit = jnp.minimum(
        jnp.asarray(n if n_rows is None else n_rows, jnp.int32), n)

    def cond(carry):
        return carry[4] < limit

    def body(carry):
        u, v, row4col, col4row, cur = carry
        u, v, row4col, col4row = _assign_one_row(
            cost, u, v, row4col, col4row, cur
        )
        return (u, v, row4col, col4row, cur + 1)

    init = (
        jnp.zeros((n,), jnp.float32), jnp.zeros((m,), jnp.float32),
        jnp.full((m,), -1, jnp.int32), jnp.full((n,), -1, jnp.int32),
        jnp.int32(0),
    )
    u, v, row4col, col4row, _ = jax.lax.while_loop(cond, body, init)
    return col4row


def solve_assignment(cost):
    """scipy-like API on [n, m] with ANY n, m: returns (row_idx, col_idx)
    of length min(n, m), sorted by row index."""
    n, m = cost.shape
    if n <= m:
        col4row = lapjv(cost)
        return jnp.arange(n, dtype=jnp.int32), col4row
    row4col = lapjv(cost.T)
    order = jnp.argsort(row4col)
    return row4col[order], jnp.arange(m, dtype=jnp.int32)[order]
