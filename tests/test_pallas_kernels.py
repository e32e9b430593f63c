"""Pallas kernel tests (interpret mode on CPU): polyphase decomposition
correctness and exact agreement with the reference acquisition math."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from semanticsegmentationactivelearning_tpu.ops import (acquisition,
                                                        pallas_kernels)


@pytest.fixture(scope="module")
def inputs():
    rng = np.random.default_rng(0)
    N, H2, W2, CIN, C = 2, 16, 24, 16, 19
    features = jnp.asarray(rng.normal(size=(N, H2, W2, CIN))
                           .astype(np.float32))
    kernel = jnp.asarray(rng.normal(size=(3, 3, CIN, C))
                         .astype(np.float32) * 0.2)
    return features, kernel, C


class TestFusedDeconvEntropyScore:
    def test_matches_direct_computation(self, inputs):
        features, kernel, C = inputs
        logits = jax.lax.conv_transpose(
            features, kernel, strides=(2, 2), padding="SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        want = np.asarray(acquisition.mean_confidence(logits, "entropy",
                                                      C))
        got = np.asarray(pallas_kernels.fused_deconv_entropy_score(
            features, kernel, C, tile_h=4, interpret=True))
        np.testing.assert_allclose(got, want, atol=1e-6)

    def test_matches_chunked_scorer(self, inputs):
        features, kernel, C = inputs
        want = np.asarray(acquisition.chunked_deconv_mean_confidence(
            features, kernel, "entropy", C))
        got = np.asarray(pallas_kernels.fused_deconv_entropy_score(
            features, kernel, C, tile_h=8, interpret=True))
        np.testing.assert_allclose(got, want, atol=1e-6)

    def test_indivisible_height_falls_back(self, inputs):
        features, kernel, C = inputs
        got = np.asarray(pallas_kernels.fused_deconv_entropy_score(
            features, kernel, C, tile_h=5, interpret=True))
        want = np.asarray(pallas_kernels.fused_deconv_entropy_score(
            features, kernel, C, tile_h=4, interpret=True))
        np.testing.assert_allclose(got, want, atol=1e-6)

    def test_uniform_features_give_zero_confidence(self):
        # zero kernel -> uniform logits -> entropy 1 -> confidence 0
        features = jnp.ones((1, 8, 8, 4))
        kernel = jnp.zeros((3, 3, 4, 6))
        got = np.asarray(pallas_kernels.fused_deconv_entropy_score(
            features, kernel, 6, tile_h=4, interpret=True))
        np.testing.assert_allclose(got, 0.0, atol=1e-5)
