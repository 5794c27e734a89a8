"""MAS scan-DP vs a plain-loop numpy oracle (same DP the reference uses)."""
import numpy as np
import jax.numpy as jnp

from xva_trainer_tpu.ops.mas import maximum_path


def _oracle(value, t_x, t_y):
    """O(Tx*Ty) loop DP: y advances every step, x stays or +1; maximize sum."""
    NEG = -1e9
    v = np.full((t_x, t_y), NEG)
    v[0, 0] = value[0, 0]
    for y in range(1, t_y):
        for x in range(min(y + 1, t_x)):
            best = v[x, y - 1]
            if x > 0:
                best = max(best, v[x - 1, y - 1])
            v[x, y] = value[x, y] + best
    path = np.zeros((t_x, t_y))
    x = t_x - 1
    for y in range(t_y - 1, -1, -1):
        path[x, y] = 1
        if y > 0 and x > 0 and v[x - 1, y - 1] >= v[x, y - 1]:
            x -= 1
    return path


def _run_case(rng, B, TX, TY, lens):
    value = rng.standard_normal((B, TX, TY)).astype(np.float32)
    mask = np.zeros((B, TX, TY), np.float32)
    for b, (tx, ty) in enumerate(lens):
        mask[b, :tx, :ty] = 1
    out = np.asarray(maximum_path(jnp.asarray(value), jnp.asarray(mask)))
    for b, (tx, ty) in enumerate(lens):
        ref = _oracle(value[b], tx, ty)
        got = out[b]
        assert got[tx:].sum() == 0 and got[:, ty:].sum() == 0
        # path validity: one x per valid frame, monotonic
        assert (got[:tx, :ty].sum(axis=0) == 1).all()
        xs = got[:tx, :ty].argmax(axis=0)
        assert (np.diff(xs) >= 0).all() and (np.diff(xs) <= 1).all()
        assert xs[0] == 0 and xs[-1] == tx - 1
        # optimality: same total score as oracle path
        ref_score = (ref * value[b, :tx, :ty]).sum()
        got_score = (got[:tx, :ty] * value[b, :tx, :ty]).sum()
        np.testing.assert_allclose(got_score, ref_score, rtol=1e-5)


def test_mas_square():
    rng = np.random.default_rng(0)
    _run_case(rng, 3, 16, 16, [(16, 16), (10, 14), (5, 16)])


def test_mas_rect():
    rng = np.random.default_rng(1)
    _run_case(rng, 4, 24, 96, [(24, 96), (7, 60), (20, 21), (1, 40)])


def test_mas_matches_oracle_paths_exactly():
    rng = np.random.default_rng(2)
    B, TX, TY = 2, 12, 40
    value = rng.standard_normal((B, TX, TY)).astype(np.float32)
    mask = np.ones((B, TX, TY), np.float32)
    out = np.asarray(maximum_path(jnp.asarray(value), jnp.asarray(mask)))
    for b in range(B):
        ref = _oracle(value[b], TX, TY)
        np.testing.assert_array_equal(out[b], ref)


def test_extreme_magnitude_inputs():
    """Cumulative log-likelihoods beyond -1e9 (divergent-training scale) must
    still yield a valid monotonic path — a finite sentinel degenerates here."""
    import numpy as np
    import jax.numpy as jnp

    from xva_trainer_tpu.ops.mas import maximum_path

    B, tx, ty = 2, 12, 900
    rng = np.random.default_rng(0)
    v = jnp.asarray((rng.standard_normal((B, tx, ty)) * 3e6 - 2e6)
                    .astype(np.float32))
    p = np.asarray(maximum_path(v, jnp.ones((B, tx, ty))))
    assert (p.sum(axis=1) == 1).all()
