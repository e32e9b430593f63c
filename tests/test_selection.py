"""Core-set (greedy k-center) selection tests: numpy greedy oracle,
selection properties, and the model embedding hooks feeding it
(capability extension over the reference's confidence ranking,
active_learning.py:705-715)."""

import numpy as np
import pytest

pytestmark = pytest.mark.quick  # fast CI lane (pytest -m quick)

import jax
import jax.numpy as jnp

from semanticsegmentationactivelearning_tpu.ops import selection


def _oracle_greedy(emb, centers, candidates, k):
    """Reference greedy k-center in plain numpy."""
    emb = emb.astype(np.float64)
    picks = []
    cent = list(np.where(centers)[0])
    cand = set(np.where(candidates)[0])
    for _ in range(k):
        best, best_d = None, -1.0
        for i in sorted(cand):
            d = min((((emb[i] - emb[c]) ** 2).sum() for c in cent),
                    default=np.inf)
            if d > best_d:
                best, best_d = i, d
        picks.append(best)
        cent.append(best)
        cand.remove(best)
    return picks


class TestKCenterGreedy:
    @pytest.fixture
    def pool(self):
        rng = np.random.default_rng(3)
        emb = rng.normal(size=(40, 8)).astype(np.float32)
        centers = np.zeros(40, dtype=bool)
        centers[rng.choice(40, 5, replace=False)] = True
        candidates = ~centers
        return emb, centers, candidates

    @pytest.mark.parametrize("col_chunk", [1024, 8, 7])
    def test_matches_numpy_oracle(self, pool, col_chunk):
        # col_chunk < N exercises the streamed distance blocks
        # (including a ragged final block at 7)
        emb, centers, candidates = pool
        picks, _ = selection.k_center_greedy(
            jnp.asarray(emb), jnp.asarray(centers),
            jnp.asarray(candidates), 6, col_chunk)
        want = _oracle_greedy(emb, centers, candidates, 6)
        np.testing.assert_array_equal(np.asarray(picks), want)

    def test_picks_are_unique_candidates(self, pool):
        emb, centers, candidates = pool
        picks, _ = selection.k_center_greedy(
            jnp.asarray(emb), jnp.asarray(centers),
            jnp.asarray(candidates), 10)
        picks = np.asarray(picks)
        assert len(set(picks.tolist())) == 10
        assert candidates[picks].all()

    def test_no_centers_farthest_first(self):
        # empty center set: the first pick is arbitrary-but-valid and
        # the traversal still spreads (never re-picks)
        rng = np.random.default_rng(5)
        emb = rng.normal(size=(12, 4)).astype(np.float32)
        candidates = np.ones(12, dtype=bool)
        picks, _ = selection.k_center_greedy(
            jnp.asarray(emb), jnp.zeros(12, dtype=bool),
            jnp.asarray(candidates), 12)
        assert sorted(np.asarray(picks).tolist()) == list(range(12))

    def test_covers_clusters(self):
        # 3 well-separated clusters, centers in cluster 0 => the first
        # two picks land in the two uncovered clusters
        rng = np.random.default_rng(6)
        emb = np.concatenate([
            rng.normal(size=(10, 3)) * 0.05 + off
            for off in (0.0, 10.0, -10.0)]).astype(np.float32)
        centers = np.zeros(30, dtype=bool)
        centers[:2] = True
        candidates = ~centers
        picks, _ = selection.k_center_greedy(
            jnp.asarray(emb), jnp.asarray(centers),
            jnp.asarray(candidates), 2)
        got_clusters = {int(p) // 10 for p in np.asarray(picks)}
        assert got_clusters == {1, 2}

    def test_prefix_stability(self, pool):
        # the AL CLI compiles once with the conf's selection_size and
        # slices the first k picks of a shrunken final round — valid
        # only because pick i depends solely on picks < i
        emb, centers, candidates = pool
        full, _ = selection.k_center_greedy(
            jnp.asarray(emb), jnp.asarray(centers),
            jnp.asarray(candidates), 10)
        short, _ = selection.k_center_greedy(
            jnp.asarray(emb), jnp.asarray(centers),
            jnp.asarray(candidates), 4)
        np.testing.assert_array_equal(np.asarray(full)[:4],
                                      np.asarray(short))

    def test_k_beyond_pool_prefix_valid(self):
        # k > candidates.sum(): the first candidates.sum() picks drain
        # the pool exactly; the overflow tail is sliced by the caller
        rng = np.random.default_rng(9)
        emb = rng.normal(size=(8, 4)).astype(np.float32)
        centers = np.zeros(8, dtype=bool)
        centers[:5] = True
        candidates = ~centers
        picks, _ = selection.k_center_greedy(
            jnp.asarray(emb), jnp.asarray(centers),
            jnp.asarray(candidates), 6)
        first = np.asarray(picks)[:3]
        assert sorted(first.tolist()) == [5, 6, 7]

    def test_min_dist_diagnostic(self, pool):
        emb, centers, candidates = pool
        _, min_dist = selection.k_center_greedy(
            jnp.asarray(emb), jnp.asarray(centers),
            jnp.asarray(candidates), 1)
        min_dist = np.asarray(min_dist)
        # candidates carry their squared distance to the center set
        cidx = np.where(candidates)[0]
        c_emb = emb[centers]
        for i in cidx[:5]:
            want = (((emb[i] - c_emb) ** 2).sum(axis=1)).min()
            assert min_dist[i] == pytest.approx(want, rel=1e-4)
        # non-candidates are masked out
        assert np.isneginf(min_dist[~candidates]).all()


class TestEmbedStep:
    def test_enet_embedding(self):
        from semanticsegmentationactivelearning_tpu.models import ENet
        from semanticsegmentationactivelearning_tpu.train import (
            create_train_state, make_embed_step, optim)
        model = ENet(num_classes=3)
        state = create_train_state(model, optim.make_optimizer({}),
                                   jax.random.PRNGKey(0), (16, 24))
        step = make_embed_step(model)
        img = jnp.asarray(np.random.default_rng(0).uniform(
            size=(2, 16, 24, 3)).astype(np.float32))
        emb = np.asarray(step(state, {"image": img}))
        assert emb.shape == (2, 128)
        assert np.isfinite(emb).all()
        emb2 = np.asarray(step(state, {"image": img}))
        np.testing.assert_array_equal(emb, emb2)

    def test_icnet_embedding(self):
        from semanticsegmentationactivelearning_tpu.models import ICNet
        from semanticsegmentationactivelearning_tpu.train import (
            create_train_state, make_embed_step, optim)
        model = ICNet(num_classes=3)
        state = create_train_state(model, optim.make_optimizer({}),
                                   jax.random.PRNGKey(0), (32, 64))
        step = make_embed_step(model)
        img = jnp.asarray(np.random.default_rng(1).uniform(
            size=(2, 32, 64, 3)).astype(np.float32))
        emb = np.asarray(step(state, {"image": img}))
        assert emb.shape == (2, 128)
        assert np.isfinite(emb).all()
