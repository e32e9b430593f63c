"""Kernel-level op tests against numpy oracles, including the
pool/unpool round-trip property carried over from the reference's only
test (models/util/test_xops.py:6-21)."""

import numpy as np

import jax
import jax.numpy as jnp

from semanticsegmentationactivelearning_tpu.ops import nn as xops

import pytest

pytestmark = pytest.mark.quick  # fast CI lane (pytest -m quick)


class TestPReLU:
    def test_matches_formula(self):
        rng = np.random.default_rng(0)
        x = rng.normal(size=(2, 4, 4, 3)).astype(np.float32)
        alpha = np.array([0.25, 0.5, -0.1], np.float32)
        out = np.asarray(xops.prelu(jnp.array(x), jnp.array(alpha)))
        # reference formula: relu(x) - alpha * relu(-x)
        expect = np.maximum(x, 0) - alpha * np.maximum(-x, 0)
        np.testing.assert_allclose(out, expect, rtol=1e-6)


class TestPoolUnpool:
    def test_pool_matches_naive(self):
        rng = np.random.default_rng(1)
        x = rng.normal(size=(2, 8, 10, 3)).astype(np.float32)
        pooled, switches = xops.max_pool_with_switches(jnp.array(x))
        expect = x.reshape(2, 4, 2, 5, 2, 3).max(axis=(2, 4))
        np.testing.assert_allclose(np.asarray(pooled), expect)
        assert switches.shape == (2, 4, 5 * 3)  # compact int8 layout
        assert switches.dtype == jnp.int8
        onehot = xops.switches_to_onehot(switches, 3)
        assert onehot.shape == (2, 4, 5, 4, 3)
        # exactly one switch per window/channel
        np.testing.assert_array_equal(
            np.asarray(onehot).sum(axis=3), np.ones((2, 4, 5, 3)))

    def test_unpool_places_values(self):
        x = jnp.array(np.arange(16, dtype=np.float32).reshape(1, 4, 4, 1))
        pooled, switches = xops.max_pool_with_switches(x)
        up = xops.unpool_with_switches(pooled, switches)
        # max of each window sits at its original position (bottom-right
        # for a raster ramp), zeros elsewhere
        expect = np.zeros((1, 4, 4, 1), np.float32)
        expect[0, 1, 1, 0] = 5
        expect[0, 1, 3, 0] = 7
        expect[0, 3, 1, 0] = 13
        expect[0, 3, 3, 0] = 15
        np.testing.assert_array_equal(np.asarray(up), expect)

    def test_roundtrip_property(self):
        """max_pool(unpool(max_pool(x))) == max_pool(x), exactly
        (reference test_xops.py:13-21, at its original 512x512 scale
        scaled down for CI)."""
        rng = np.random.default_rng(2)
        x = jnp.array(rng.uniform(size=(4, 64, 64, 3)).astype(np.float32))
        pooled, switches = xops.max_pool_with_switches(x)
        up = xops.unpool_with_switches(pooled, switches)
        pooled2, _ = xops.max_pool_with_switches(up)
        np.testing.assert_array_equal(np.asarray(pooled2),
                                      np.asarray(pooled))

    def test_tie_breaks_first_like_tf_argmax(self):
        x = jnp.array(np.full((1, 2, 2, 1), 3.0, np.float32))
        _pooled, switches = xops.max_pool_with_switches(x)
        # all equal -> first window position wins
        onehot = np.asarray(xops.switches_to_onehot(switches, 1))
        np.testing.assert_array_equal(onehot[0, 0, 0, :, 0],
                                      [1.0, 0.0, 0.0, 0.0])


class TestSpatialDropout:
    def test_channelwise_and_scaled(self):
        x = jnp.ones((4, 8, 8, 16), jnp.float32)
        out = np.asarray(xops.spatial_dropout(
            x, 0.5, jax.random.PRNGKey(0), training=True))
        # each (example, channel) plane is uniformly kept (scaled) or zero
        planes = out.reshape(4, 64, 16)
        for b in range(4):
            for c in range(16):
                vals = set(np.unique(planes[b, :, c]).tolist())
                assert vals in ({0.0}, {2.0})

    def test_eval_identity(self):
        x = jnp.ones((1, 4, 4, 2))
        out = xops.spatial_dropout(x, 0.9, jax.random.PRNGKey(0),
                                   training=False)
        np.testing.assert_array_equal(np.asarray(out), np.asarray(x))
