"""Pallas fused top-k scan vs the XLA oracle (interpret mode on CPU)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from sema_tpu.ops.pallas_topk import pallas_topk
from sema_tpu.ops.topk import batched_topk_scores


def _data(n, d=128, q=4, seed=0):
    rng = np.random.default_rng(seed)
    store = rng.standard_normal((n, d)).astype(np.float32)
    store /= np.linalg.norm(store, axis=1, keepdims=True)
    queries = rng.standard_normal((q, d)).astype(np.float32)
    queries /= np.linalg.norm(queries, axis=1, keepdims=True)
    return store, queries


@pytest.mark.parametrize("k", [1, 10])
@pytest.mark.parametrize("tile_n", [128, 512])
def test_matches_oracle(k, tile_n):
    store, queries = _data(1024)
    valid = np.ones(1024, bool)
    ps, pi = pallas_topk(jnp.asarray(store), jnp.asarray(queries),
                         jnp.asarray(valid), k, tile_n=tile_n,
                         interpret=True)
    ns, ni = batched_topk_scores(jnp.asarray(store), jnp.asarray(queries),
                                 jnp.asarray(valid), k)
    np.testing.assert_allclose(np.asarray(ps), np.asarray(ns), atol=1e-5)
    for i in range(queries.shape[0]):
        assert set(np.asarray(pi)[i].tolist()) == \
            set(np.asarray(ni)[i].tolist())


def test_masked_and_cross_tile():
    store, queries = _data(512, q=1)
    valid = np.ones(512, bool)
    # best matches planted in different tiles; one tombstoned
    store[10] = queries[0]
    store[300] = queries[0] * 0.999
    store[450] = queries[0] * 0.998
    valid[300] = False
    ps, pi = pallas_topk(jnp.asarray(store), jnp.asarray(queries),
                         jnp.asarray(valid), 2, tile_n=128, interpret=True)
    ids = np.asarray(pi)[0].tolist()
    assert ids[0] == 10 and 300 not in ids and 450 in ids


def test_duplicate_scores_distinct_rows():
    """Ties must yield k distinct rows, not the same row k times."""
    d = 128
    store = np.zeros((256, d), dtype=np.float32)
    q = np.zeros((1, d), dtype=np.float32)
    q[0, 0] = 1.0
    for r in (3, 77, 130, 200):
        store[r, 0] = 1.0  # four identical perfect matches
    valid = np.ones(256, bool)
    ps, pi = pallas_topk(jnp.asarray(store), jnp.asarray(q),
                         jnp.asarray(valid), 4, tile_n=128, interpret=True)
    assert set(np.asarray(pi)[0].tolist()) == {3, 77, 130, 200}


def test_bf16_store():
    store, queries = _data(256, q=2)
    valid = np.ones(256, bool)
    ps, pi = pallas_topk(jnp.asarray(store, dtype=jnp.bfloat16),
                         jnp.asarray(queries), jnp.asarray(valid), 5,
                         tile_n=128, interpret=True)
    ns, ni = batched_topk_scores(
        jnp.asarray(store, dtype=jnp.bfloat16), jnp.asarray(queries),
        jnp.asarray(valid), 5)
    np.testing.assert_allclose(np.asarray(ps), np.asarray(ns), atol=1e-2)


def test_masked_slots_return_true_neg_inf():
    """Contract parity with the XLA paths (advisor r1, medium): when k
    exceeds the live rows, the dead slots must come back as -inf (which
    np.isfinite filters), not the kernel's internal finite sentinel."""
    store, queries = _data(128, q=2)
    valid = np.zeros(128, bool)
    valid[:3] = True  # only 3 live rows, ask for 8
    ps, pi = pallas_topk(jnp.asarray(store), jnp.asarray(queries),
                         jnp.asarray(valid), 8, tile_n=128, interpret=True)
    ps = np.asarray(ps)
    assert np.all(np.isfinite(ps[:, :3]))
    assert np.all(np.isneginf(ps[:, 3:]))
    ns, _ = batched_topk_scores(jnp.asarray(store), jnp.asarray(queries),
                                jnp.asarray(valid), 8)
    np.testing.assert_allclose(ps[:, :3], np.asarray(ns)[:, :3], atol=1e-5)


def test_indivisible_tile_rejected():
    store, queries = _data(100)
    with pytest.raises(ValueError, match="multiple"):
        pallas_topk(jnp.asarray(store), jnp.asarray(queries),
                    jnp.ones(100, bool), 5, tile_n=64, interpret=True)


class TestInt8Kernel:
    """Fused int8 scan vs the XLA int8 oracle (ops/quant.py)."""

    def _quantized(self, n=512, d=128, q=4, seed=3):
        from sema_tpu.ops.quant import quantize_rows
        store, queries = _data(n, d=d, q=q, seed=seed)
        qvals, scales = quantize_rows(store)
        return (jnp.asarray(qvals), jnp.asarray(scales),
                jnp.asarray(queries), store)

    def test_matches_xla_int8(self):
        from sema_tpu.ops.pallas_topk import pallas_topk_int8
        from sema_tpu.ops.quant import int8_topk_scores
        qvals, scales, queries, _ = self._quantized()
        valid = jnp.ones(512, bool)
        ps, pi = pallas_topk_int8(qvals, scales, queries, valid, 10,
                                  tile_n=128, interpret=True)
        ns, ni = int8_topk_scores(qvals, scales, queries, valid, 10)
        np.testing.assert_allclose(np.asarray(ps), np.asarray(ns),
                                   rtol=1e-5, atol=1e-6)
        for i in range(queries.shape[0]):
            assert set(np.asarray(pi)[i].tolist()) == \
                set(np.asarray(ni)[i].tolist())

    def test_masked_rows_and_neg_inf(self):
        from sema_tpu.ops.pallas_topk import pallas_topk_int8
        qvals, scales, queries, _ = self._quantized()
        valid = np.zeros(512, bool)
        valid[:5] = True
        ps, pi = pallas_topk_int8(qvals, scales, queries,
                                  jnp.asarray(valid), 8,
                                  tile_n=128, interpret=True)
        ps = np.asarray(ps)
        assert np.all(np.isfinite(ps[:, :5]))
        assert np.all(np.isneginf(ps[:, 5:]))
        assert np.all(np.asarray(pi)[:, :5] < 5)

    def test_candidates_contain_true_topk(self):
        """The int8 scan's candidate set must contain the exact top-k so
        the full-precision rescore restores recall 1.0 (config 4)."""
        from sema_tpu.ops.pallas_topk import pallas_topk_int8
        qvals, scales, queries, store = self._quantized(n=1024, q=2)
        valid = jnp.ones(1024, bool)
        ps, pi = pallas_topk_int8(qvals, scales, queries, valid, 100,
                                  tile_n=128, interpret=True)
        exact = np.asarray(store) @ np.asarray(queries).T
        for i in range(2):
            true10 = set(np.argsort(-exact[:, i])[:10].tolist())
            assert true10 <= set(np.asarray(pi)[i].tolist())


def test_tie_ordering_matches_oracle():
    """Duplicate rows across tile boundaries produce exactly tied scores;
    the insertion merge must keep the stable (score desc, row asc) order
    of lax.top_k / the hier oracle."""
    import jax.numpy as jnp
    from sema_tpu.ops.hier_topk import batched_topk_scores_hier

    rng = np.random.default_rng(7)
    n, d, k = 512, 128, 8
    base = rng.standard_normal((n, d)).astype(np.float32)
    # plant the same vector at rows spanning several 128-row tiles
    dup_rows = [3, 130, 257, 384, 500]
    v = rng.standard_normal(d).astype(np.float32)
    for r in dup_rows:
        base[r] = v
    store = jnp.asarray(base, dtype=jnp.float32)
    q = jnp.asarray((v / np.linalg.norm(v))[None, :], dtype=jnp.float32)
    valid = jnp.ones((n,), dtype=bool)

    s_p, i_p = pallas_topk(store, q, valid, k, tile_n=128, interpret=True)
    s_h, i_h = batched_topk_scores_hier(store, q, valid, k=k, group=128)
    np.testing.assert_allclose(np.asarray(s_p), np.asarray(s_h),
                               rtol=1e-6)
    # the five tied duplicates must appear in ascending row order
    np.testing.assert_array_equal(np.asarray(i_p), np.asarray(i_h))
    assert list(np.asarray(i_p)[0][:5]) == dup_rows


def test_large_k_class():
    """k=64 (the TUI's k-class) and k=100 (int8 rescore depth) compile
    and agree with the oracle — the static-unrolled merge could not
    compile at these k on device."""
    import jax.numpy as jnp
    from sema_tpu.ops.hier_topk import batched_topk_scores_hier

    rng = np.random.default_rng(11)
    n, d = 1024, 64
    store = jnp.asarray(rng.standard_normal((n, d)), dtype=jnp.float32)
    q = jnp.asarray(rng.standard_normal((3, d)), dtype=jnp.float32)
    valid = jnp.ones((n,), dtype=bool)
    for k in (64, 100):
        s_p, i_p = pallas_topk(store, q, valid, k, tile_n=128,
                               interpret=True)
        s_h, i_h = batched_topk_scores_hier(store, q, valid, k=k,
                                            group=128)
        np.testing.assert_allclose(np.asarray(s_p), np.asarray(s_h),
                                   rtol=1e-5)
        np.testing.assert_array_equal(np.asarray(i_p), np.asarray(i_h))


@pytest.mark.parametrize("seed", range(4))
def test_randomized_oracle_equivalence(seed):
    """Property test: random shapes, validity masks (including nearly
    and fully dead stores), planted duplicate rows (exact ties), and k
    spanning the class ladder must all match the hier oracle exactly —
    ids included."""
    import jax.numpy as jnp
    from sema_tpu.ops.hier_topk import batched_topk_scores_hier

    rng = np.random.default_rng(seed)
    n = int(rng.choice([128, 256, 512]))
    d = 128
    qn = int(rng.choice([1, 5]))
    base = rng.standard_normal((n, d)).astype(np.float32)
    # plant duplicate rows to force exact score ties
    for _ in range(rng.integers(0, 6)):
        a, b = rng.integers(0, n, size=2)
        base[b] = base[a]
    valid_np = rng.random(n) > rng.choice([0.0, 0.5, 0.95, 1.0])
    store = jnp.asarray(base, dtype=jnp.float32)
    q_np = rng.standard_normal((qn, d)).astype(np.float32)
    q = jnp.asarray(q_np)
    valid = jnp.asarray(valid_np)

    # f64 host oracle for resolving backend rounding: the two backends
    # may differ by an ulp on the same dot product (different matmul
    # tilings), which can also swap exactly-tied ranks — both are
    # legitimate; a wrong SELECTION shows up as a much larger gap
    host = q_np.astype(np.float64) @ base.astype(np.float64).T
    for k in (1, 7, 64):
        s_p, i_p = pallas_topk(store, q, valid, k, tile_n=128,
                               interpret=True)
        s_h, i_h = batched_topk_scores_hier(store, q, valid, k=k,
                                            group=128)
        sp, sh = np.asarray(s_p), np.asarray(s_h)
        ip, ih = np.asarray(i_p), np.asarray(i_h)
        live = np.isfinite(sh)
        np.testing.assert_allclose(sp[live], sh[live],
                                   rtol=2e-5, atol=1e-5)
        assert np.all(~np.isfinite(sp[~live]))
        for r, c in np.argwhere(live):
            if ip[r, c] != ih[r, c]:
                gap = abs(host[r, ip[r, c]] - host[r, ih[r, c]])
                assert gap < 1e-4, (r, c, ip[r, c], ih[r, c], gap)


def test_maskless_variant_matches_masked():
    """masked=False (all rows live, no padding) must agree with the
    masked kernel exactly."""
    import jax.numpy as jnp
    rng = np.random.default_rng(3)
    n, d, qn, k = 512, 128, 4, 10
    store = jnp.asarray(rng.standard_normal((n, d)), dtype=jnp.float32)
    q = jnp.asarray(rng.standard_normal((qn, d)), dtype=jnp.float32)
    valid = jnp.ones((n,), dtype=bool)
    s_m, i_m = pallas_topk(store, q, valid, k, tile_n=128, interpret=True)
    s_u, i_u = pallas_topk(store, q, valid, k, tile_n=128, interpret=True,
                           masked=False)
    np.testing.assert_array_equal(np.asarray(s_m), np.asarray(s_u))
    np.testing.assert_array_equal(np.asarray(i_m), np.asarray(i_u))


class TestWarmStart:
    """warm_rows > 0 seeds the screen with a sampled k-th-score estimate
    (scan A/B #15). Must stay EXACT: the estimate is one ULP below the
    sample k-th, so scores equal to it still merge."""

    @pytest.mark.parametrize("warm_rows", [128, 512, 1024])
    @pytest.mark.parametrize("k", [1, 10])
    def test_matches_cold(self, k, warm_rows):
        store, queries = _data(1024, seed=3)
        valid = np.ones(1024, bool)
        valid[::13] = False
        cold = pallas_topk(jnp.asarray(store), jnp.asarray(queries),
                           jnp.asarray(valid), k, tile_n=128,
                           interpret=True)
        warm = pallas_topk(jnp.asarray(store), jnp.asarray(queries),
                           jnp.asarray(valid), k, tile_n=128,
                           interpret=True, warm_rows=warm_rows)
        np.testing.assert_array_equal(np.asarray(cold[1]),
                                      np.asarray(warm[1]))
        np.testing.assert_allclose(np.asarray(cold[0]),
                                   np.asarray(warm[0]), atol=0)

    def test_exact_when_kth_ties_sample_kth(self):
        """Adversarial: the global k-th best EQUALS the sample k-th best
        (the sample holds some of the true winners) — the one-ULP
        backoff must keep those rows above the strict > screen."""
        d = 128
        store = np.zeros((512, d), dtype=np.float32)
        q = np.zeros((1, d), dtype=np.float32)
        q[0, 0] = 1.0
        # winners inside AND outside the 128-row sample, exact ties
        for r in (5, 60, 200, 400):
            store[r, 0] = 0.75
        store[300, 0] = 0.9          # unique top-1 outside the sample
        valid = np.ones(512, bool)
        ps, pi = pallas_topk(jnp.asarray(store), jnp.asarray(q),
                             jnp.asarray(valid), 5, tile_n=128,
                             interpret=True, warm_rows=128)
        assert np.asarray(pi)[0].tolist() == [300, 5, 60, 200, 400]

    def test_fully_masked_sample_degrades_cold(self):
        store, queries = _data(512, q=2, seed=4)
        valid = np.ones(512, bool)
        valid[:128] = False           # the whole sample is tombstoned
        ps, pi = pallas_topk(jnp.asarray(store), jnp.asarray(queries),
                             jnp.asarray(valid), 3, tile_n=128,
                             interpret=True, warm_rows=128)
        ns, ni = batched_topk_scores(jnp.asarray(store),
                                     jnp.asarray(queries),
                                     jnp.asarray(valid), 3)
        np.testing.assert_array_equal(np.asarray(pi), np.asarray(ni))

    def test_nomask_variant(self):
        store, queries = _data(1024, seed=5)
        valid = np.ones(1024, bool)
        warm = pallas_topk(jnp.asarray(store), jnp.asarray(queries),
                           jnp.asarray(valid), 10, tile_n=128,
                           interpret=True, masked=False, warm_rows=256)
        ns, ni = batched_topk_scores(jnp.asarray(store),
                                     jnp.asarray(queries),
                                     jnp.asarray(valid), 10)
        np.testing.assert_array_equal(np.asarray(warm[1]), np.asarray(ni))

    def test_warm_rows_larger_than_store_clamped(self):
        store, queries = _data(256, q=2, seed=6)
        valid = np.ones(256, bool)
        warm = pallas_topk(jnp.asarray(store), jnp.asarray(queries),
                           jnp.asarray(valid), 4, tile_n=128,
                           interpret=True, warm_rows=4096)
        ns, ni = batched_topk_scores(jnp.asarray(store),
                                     jnp.asarray(queries),
                                     jnp.asarray(valid), 4)
        np.testing.assert_array_equal(np.asarray(warm[1]), np.asarray(ni))
