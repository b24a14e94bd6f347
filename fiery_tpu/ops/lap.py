"""Jittable linear sum assignment (Jonker-Volgenant shortest augmenting path).

The reference resolves cross-frame instance identity with scipy's Hungarian solver
on host (/root/reference/fiery/utils/instance.py:6,242). This is the same algorithm
scipy implements (Crouse 2016, "On implementing 2D rectangular assignment
algorithms") expressed in lax control flow, so the whole eval postprocessing path
can stay on device: n sequential Dijkstra-style augmentations, each a while_loop
whose body is O(n) vector work — no host round trip, fixed shapes, exact optimum
for finite float costs (not an approximation like greedy/auction matching).

Intended for the small dense problems of instance tracking (n <= ~100). Pad
rectangular or partially-valid problems to square with a finite BIG cost that
dominates any real column sum; the valid-valid sub-assignment is then optimal
(BIG pairs are forced onto the padding).
"""

import jax
import jax.numpy as jnp

_INF = jnp.float32(jnp.inf)


def linear_sum_assignment(cost, n_rows=None):
    """col4row: for each row i the assigned column j, minimizing sum cost[i, j].

    cost: (n, n) float32 matrix with finite entries. Returns int32 (n,).
    Matches scipy.optimize.linear_sum_assignment on square inputs (up to
    tie-breaking between equal-cost optima).

    n_rows (optional, traced int): only augment rows [0, n_rows). The solver is
    sequential over rows (each augmentation is a Dijkstra while_loop), so on a
    padded problem where only the first m rows are real — instance tracking pads
    2-20 live tracks to a fixed 101-slot matrix — restricting to them cuts the
    serial depth 5-50x. Exact for the kept rows: the skipped padding rows have
    one uniform cost for every column, so every completion of the sub-assignment
    has the same total and the sub-problem optimum is the full-problem optimum
    restricted to the kept rows (tie-breaking among equal-cost optima can
    differ). Rows >= n_rows get col4row = -1.
    """
    cost = jnp.asarray(cost, jnp.float32)
    n = cost.shape[0]
    assert cost.shape == (n, n), 'square cost matrix required (pad with BIG)'

    def augment(carry, cur_row):
        u, v, row4col, col4row = carry

        # Dijkstra from cur_row over reduced costs until an unassigned column.
        def not_done(s):
            return s['sink'] < 0

        def body(s):
            i = s['i']
            SR = s['SR'].at[i].set(True)
            r = s['minval'] + cost[i] - u[i] - v
            upd = ~s['SC'] & (r < s['spc'])
            spc = jnp.where(upd, r, s['spc'])
            path = jnp.where(upd, i, s['path'])
            cand = jnp.where(s['SC'], _INF, spc)
            lowest = jnp.min(cand)
            # prefer an unassigned column among ties (scipy's scan order effect)
            tie = cand == lowest
            free_tie = tie & (row4col < 0)
            j = jnp.where(jnp.any(free_tie),
                          jnp.argmax(free_tie), jnp.argmax(tie)).astype(jnp.int32)
            SC = s['SC'].at[j].set(True)
            hit_free = row4col[j] < 0
            return {
                'i': jnp.where(hit_free, i, row4col[j]).astype(jnp.int32),
                'minval': lowest,
                'sink': jnp.where(hit_free, j, -1).astype(jnp.int32),
                'SR': SR, 'SC': SC, 'spc': spc, 'path': path,
            }

        init = {
            'i': cur_row.astype(jnp.int32),
            'minval': jnp.float32(0.0),
            'sink': jnp.int32(-1),
            'SR': jnp.zeros((n,), bool),
            'SC': jnp.zeros((n,), bool),
            'spc': jnp.full((n,), _INF),
            'path': jnp.full((n,), -1, jnp.int32),
        }
        s = jax.lax.while_loop(not_done, body, init)
        sink, minval, spc, path = s['sink'], s['minval'], s['spc'], s['path']

        # dual update (scipy _lsap: u over SR, v over SC)
        row_idx = jnp.arange(n)
        u = jnp.where(s['SR'],
                      jnp.where(row_idx == cur_row, u + minval,
                                u + minval - spc[jnp.clip(col4row, 0, n - 1)]),
                      u)
        v = jnp.where(s['SC'], v - (minval - spc), v)

        # augment along the predecessor path back to cur_row
        def aug_not_done(t):
            return t['sink'] >= 0

        def aug_body(t):
            jcol = t['sink']
            i = t['path'][jcol]
            row4col = t['row4col'].at[jcol].set(i)
            nxt = t['col4row'][i]
            col4row = t['col4row'].at[i].set(jcol)
            done = i == cur_row
            return {'sink': jnp.where(done, -1, nxt).astype(jnp.int32),
                    'path': t['path'], 'row4col': row4col, 'col4row': col4row}

        t = jax.lax.while_loop(
            aug_not_done, aug_body,
            {'sink': sink, 'path': path, 'row4col': row4col, 'col4row': col4row})
        return (u, v, t['row4col'], t['col4row']), None

    init = (jnp.zeros((n,), jnp.float32), jnp.zeros((n,), jnp.float32),
            jnp.full((n,), -1, jnp.int32), jnp.full((n,), -1, jnp.int32))
    if n_rows is None:
        (u, v, row4col, col4row), _ = jax.lax.scan(
            augment, init, jnp.arange(n, dtype=jnp.int32))
        return col4row

    def row_body(carry):
        state, cur_row = carry
        state, _ = augment(state, cur_row)
        return state, cur_row + 1

    n_rows = jnp.minimum(jnp.asarray(n_rows, jnp.int32), n)
    (_, _, _, col4row), _ = jax.lax.while_loop(
        lambda c: c[1] < n_rows, row_body, (init, jnp.int32(0)))
    return col4row
