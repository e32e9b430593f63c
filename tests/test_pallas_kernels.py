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


class TestFusedDecoderEntropyScore:
    """The whole-decoder kernel (Bottleneck5_0 + 5_1 + Final + entropy)
    must reproduce the plain flax forward + acquisition math exactly
    (BN folded to affine == inference-mode BN)."""

    @pytest.fixture(scope="class")
    def model_and_inputs(self):
        from semanticsegmentationactivelearning_tpu.models import ENet
        rng = np.random.default_rng(1)
        model = ENet(num_classes=5)
        x = jnp.asarray(rng.uniform(size=(2, 32, 48, 3))
                        .astype(np.float32))
        variables = model.init(
            {"params": jax.random.PRNGKey(0),
             "dropout": jax.random.PRNGKey(1)}, x, training=False)
        # non-trivial BN statistics so the affine fold is exercised
        stats = variables["batch_stats"]
        noised = jax.tree_util.tree_map(
            lambda a: a + jnp.asarray(
                np.abs(rng.normal(size=a.shape, scale=0.3))
                .astype(np.float32)), stats)
        variables = {**variables, "batch_stats": noised}
        return model, variables, x

    def _want(self, model, variables, x):
        logits = model.apply(variables, x, training=False)
        from semanticsegmentationactivelearning_tpu.ops import acquisition
        return np.asarray(acquisition.mean_confidence(
            logits, "entropy", model.num_classes))

    @pytest.mark.parametrize("tile_q", [2, 4, 8])
    def test_matches_flax_forward(self, model_and_inputs, tile_q):
        model, variables, x = model_and_inputs
        f4, sw1 = model.apply(variables, x, training=False,
                              return_stage4=True)
        packed = pallas_kernels.pack_enet_decoder(variables,
                                                  model.num_classes)
        got = np.asarray(pallas_kernels.fused_decoder_entropy_score(
            f4, sw1, packed, model.num_classes, tile_q=tile_q,
            interpret=True))
        want = self._want(model, variables, x)
        np.testing.assert_allclose(got, want, rtol=2e-5, atol=2e-5)

    def test_fused_score_entrypoint(self, model_and_inputs):
        # The model-level entry point used by bench.py /
        # active_learning at shapes where W % 32 != 0 and H/8 < 6:
        # the v1 front + v1 mid + decoder fallback composition, run
        # through the Pallas interpreter.
        model, variables, x = model_and_inputs
        got = np.asarray(model.fused_score(
            variables, x, "entropy", use_pallas=True, interpret=True))
        want = self._want(model, variables, x)
        np.testing.assert_allclose(got, want, rtol=3e-5, atol=3e-5)

    def test_fused_score_production_path(self, model_and_inputs):
        # The PRODUCTION composition (W-packed front -> W-packed mid ->
        # eighth-grid tail with RAW mask1 threading) requires
        # W % 32 == 0 and H/8 >= 6; ENet is fully convolutional, so the
        # fixture's variables apply at any size. A wiring mistake in
        # this branch of ENet.fused_score would otherwise only surface
        # on hardware.
        model, variables, _ = model_and_inputs
        rng = np.random.default_rng(7)
        x = jnp.asarray(rng.uniform(size=(1, 64, 64, 3))
                        .astype(np.float32))
        got = np.asarray(model.fused_score(
            variables, x, "entropy", use_pallas=True, interpret=True))
        want = self._want(model, variables, x)
        np.testing.assert_allclose(got, want, rtol=3e-5, atol=3e-5)

    def test_fused_score_tiny_input_fallback(self, model_and_inputs):
        # Inputs under 24 px tall are below the front kernels' halo
        # window: fused_score must degrade to the eighth-res decoder
        # kernel over an XLA encoder (exactly), not crash in read_img.
        model, variables, _ = model_and_inputs
        rng = np.random.default_rng(11)
        for h, w in ((16, 32), (8, 16)):
            x = jnp.asarray(rng.uniform(size=(1, h, w, 3))
                            .astype(np.float32))
            got = np.asarray(model.fused_score(
                variables, x, "entropy", use_pallas=True,
                interpret=True))
            want = self._want(model, variables, x)
            np.testing.assert_allclose(got, want, rtol=3e-5, atol=3e-5)

    def test_single_tile_fallback(self, model_and_inputs):
        model, variables, x = model_and_inputs
        f4, sw1 = model.apply(variables, x, training=False,
                              return_stage4=True)
        packed = pallas_kernels.pack_enet_decoder(variables,
                                                  model.num_classes)
        got = np.asarray(pallas_kernels.fused_decoder_entropy_score(
            f4, sw1, packed, model.num_classes, tile_q=3,  # 8 % 3 != 0
            interpret=True))
        want = self._want(model, variables, x)
        np.testing.assert_allclose(got, want, rtol=2e-5, atol=2e-5)


class TestFusedFrontStage1:
    """The fused front-end kernel (Initial + Bottleneck1_0 + stage-1
    bottlenecks) must reproduce the flax forward's stage-1 features and
    pool switches exactly, and compose with the mid stages + decoder
    kernel into the full scoring result."""

    @pytest.fixture(scope="class")
    def setup(self):
        from semanticsegmentationactivelearning_tpu.models import ENet
        rng = np.random.default_rng(7)
        model = ENet(num_classes=5)
        x = jnp.asarray(rng.uniform(size=(2, 64, 48, 3))
                        .astype(np.float32))
        variables = model.init(
            {"params": jax.random.PRNGKey(2),
             "dropout": jax.random.PRNGKey(3)}, x, training=False)
        stats = variables["batch_stats"]
        noised = jax.tree_util.tree_map(
            lambda a: a + jnp.asarray(
                np.abs(rng.normal(size=a.shape, scale=0.3))
                .astype(np.float32)), stats)
        variables = {**variables, "batch_stats": noised}
        return model, variables, x

    @pytest.mark.parametrize("tile_q", [8, 16])
    def test_matches_stage1_forward(self, setup, tile_q):
        model, variables, x = setup
        want_x1, want_sw = model.apply(variables, x, training=False,
                                       return_stage1=True)
        packed = pallas_kernels.pack_enet_front(variables)
        x1, mask = pallas_kernels.fused_front_stage1(
            x, packed, tile_q=tile_q, interpret=True,
            out_dtype=jnp.float32)
        np.testing.assert_allclose(np.asarray(x1), np.asarray(want_x1),
                                   rtol=2e-5, atol=2e-5)
        # switches agree as phase-packed one-hot masks
        n, hq, wqc = want_sw.shape
        wq = x.shape[2] // 4
        sw = np.asarray(want_sw).reshape(n, hq, wq, 16)
        want_mask = (sw[..., None, :]
                     == np.arange(4)[:, None]).astype(np.float32)
        want_mask = want_mask.reshape(n, hq, wq, 64)
        np.testing.assert_array_equal(np.asarray(mask), want_mask)

    def test_full_fused_scoring_path(self, setup):
        model, variables, x = setup
        packed_f = pallas_kernels.pack_enet_front(variables)
        packed_d = pallas_kernels.pack_enet_decoder(variables,
                                                    model.num_classes)
        x1, mask = pallas_kernels.fused_front_stage1(
            x, packed_f, tile_q=8, interpret=True,
            out_dtype=jnp.float32)
        f4 = model.apply(variables, x1, training=False,
                         method="forward_from_stage1")
        got = np.asarray(pallas_kernels.fused_decoder_entropy_score(
            f4, None, packed_d, model.num_classes, tile_q=4,
            interpret=True, mask=mask))

        logits = model.apply(variables, x, training=False)
        from semanticsegmentationactivelearning_tpu.ops import acquisition
        want = np.asarray(acquisition.mean_confidence(
            logits, "entropy", model.num_classes))
        np.testing.assert_allclose(got, want, rtol=3e-5, atol=3e-5)


class TestFusedFrontStage1W:
    """The W-packed (v2) front kernel must reproduce the flax stage-1
    features and switch mask exactly, in the same output layouts as v1,
    across tile/chunk/packing configurations."""

    @pytest.fixture(scope="class")
    def setup(self):
        from semanticsegmentationactivelearning_tpu.models import ENet
        rng = np.random.default_rng(17)
        model = ENet(num_classes=5)
        # W=64 -> wq=16: wpack=8 leaves two packed columns, so the
        # packed-column shift boundaries are exercised
        x = jnp.asarray(rng.uniform(size=(2, 64, 64, 3))
                        .astype(np.float32))
        variables = model.init(
            {"params": jax.random.PRNGKey(8),
             "dropout": jax.random.PRNGKey(9)}, x, training=False)
        stats = variables["batch_stats"]
        noised = jax.tree_util.tree_map(
            lambda a: a + jnp.asarray(
                np.abs(rng.normal(size=a.shape, scale=0.3))
                .astype(np.float32)), stats)
        variables = {**variables, "batch_stats": noised}
        return model, variables, x

    @pytest.mark.parametrize("tile_q,rc,wpack", [
        (8, 4, 8),    # multi-tile grid + multi-chunk stages
        (16, 16, 8),  # single tile, single chunk
        (8, 16, 4),   # narrower packing
    ])
    def test_matches_stage1_forward(self, setup, tile_q, rc, wpack):
        model, variables, x = setup
        want_x1, want_sw = model.apply(variables, x, training=False,
                                       return_stage1=True)
        packed = pallas_kernels.pack_enet_front_w(variables,
                                                  wpack=wpack)
        x1, mask = pallas_kernels.fused_front_stage1_w(
            x, packed, tile_q=tile_q, rc=rc, wpack=wpack,
            interpret=True, out_dtype=jnp.float32)
        np.testing.assert_allclose(np.asarray(x1), np.asarray(want_x1),
                                   rtol=2e-5, atol=2e-5)
        n, hq, wqc = want_sw.shape
        wq = x.shape[2] // 4
        sw = np.asarray(want_sw).reshape(n, hq, wq, 16)
        want_mask = (sw[..., None, :]
                     == np.arange(4)[:, None]).astype(np.float32)
        want_mask = want_mask.reshape(n, hq, wq, 64)
        np.testing.assert_array_equal(np.asarray(mask), want_mask)

    def test_composes_with_decoder(self, setup):
        model, variables, x = setup
        packed_f = pallas_kernels.pack_enet_front_w(variables)
        packed_d = pallas_kernels.pack_enet_decoder(variables,
                                                    model.num_classes)
        x1, mask = pallas_kernels.fused_front_stage1_w(
            x, packed_f, tile_q=8, rc=8, interpret=True,
            out_dtype=jnp.float32)
        f4 = model.apply(variables, x1, training=False,
                         method="forward_from_stage1")
        got = np.asarray(pallas_kernels.fused_decoder_entropy_score(
            f4, None, packed_d, model.num_classes, tile_q=4,
            interpret=True, mask=mask))
        logits = model.apply(variables, x, training=False)
        from semanticsegmentationactivelearning_tpu.ops import acquisition
        want = np.asarray(acquisition.mean_confidence(
            logits, "entropy", model.num_classes))
        np.testing.assert_allclose(got, want, rtol=3e-5, atol=3e-5)


class TestFusedMidStage23:
    """The fused mid-section kernel (Bottleneck2_0 + stages 2 and 3)
    must match the flax forward's stage-3 features and stage-2 pool
    switches, and the full front+mid+stage4+decoder pipeline must
    reproduce the reference scoring math."""

    @pytest.fixture(scope="class")
    def setup(self):
        from semanticsegmentationactivelearning_tpu.models import ENet
        rng = np.random.default_rng(11)
        model = ENet(num_classes=5)
        x = jnp.asarray(rng.uniform(size=(2, 64, 48, 3))
                        .astype(np.float32))
        variables = model.init(
            {"params": jax.random.PRNGKey(4),
             "dropout": jax.random.PRNGKey(5)}, x, training=False)
        stats = variables["batch_stats"]
        noised = jax.tree_util.tree_map(
            lambda a: a + jnp.asarray(
                np.abs(rng.normal(size=a.shape, scale=0.3))
                .astype(np.float32)), stats)
        variables = {**variables, "batch_stats": noised}
        return model, variables, x

    # rc=2 forces multiple interior row chunks (h8=8 at this size), so
    # the chunk-boundary proj_halo recompute path is covered; rc=32
    # collapses to a single chunk (the production default at small h8)
    @pytest.mark.parametrize("rc", [2, 32])
    def test_matches_stage23_forward(self, setup, rc):
        model, variables, x = setup
        x1, _ = model.apply(variables, x, training=False,
                            return_stage1=True)

        def m_mid(m, x1):
            h, sw2 = m.Bottleneck2_0(x1, False)
            for b in m.stage2:
                h = b(h, False)
            for b in m.stage3:
                h = b(h, False)
            return h, sw2

        want_y, want_sw2 = model.apply(variables, x1, method=m_mid)
        packed, meta = pallas_kernels.pack_enet_mid(variables)
        y, sw2 = pallas_kernels.fused_mid_stage23(
            x1, packed, meta, rc=rc, interpret=True,
            out_dtype=jnp.float32)
        np.testing.assert_allclose(np.asarray(y), np.asarray(want_y),
                                   rtol=3e-5, atol=3e-5)
        n, h8, w8, _ = y.shape
        np.testing.assert_array_equal(
            np.asarray(sw2),
            np.asarray(want_sw2).reshape(n, h8, w8, 64))

    def test_full_pipeline_with_stage4(self, setup):
        model, variables, x = setup
        packed_f = pallas_kernels.pack_enet_front(variables)
        packed_m, meta = pallas_kernels.pack_enet_mid(variables)
        packed_d = pallas_kernels.pack_enet_decoder(variables,
                                                    model.num_classes)
        x1, mask = pallas_kernels.fused_front_stage1(
            x, packed_f, tile_q=8, interpret=True,
            out_dtype=jnp.float32)
        y, sw2 = pallas_kernels.fused_mid_stage23(
            x1, packed_m, meta, interpret=True, out_dtype=jnp.float32)
        n, h8, w8, _ = y.shape
        f4 = model.apply(variables, y, sw2.reshape(n, h8, w8 * 64),
                         training=False, method="forward_stage4")
        got = np.asarray(pallas_kernels.fused_decoder_entropy_score(
            f4, None, packed_d, model.num_classes, tile_q=4,
            interpret=True, mask=mask))

        logits = model.apply(variables, x, training=False)
        from semanticsegmentationactivelearning_tpu.ops import acquisition
        want = np.asarray(acquisition.mean_confidence(
            logits, "entropy", model.num_classes))
        np.testing.assert_allclose(got, want, rtol=5e-5, atol=5e-5)


class TestFusedMidStage23W:
    """The W-packed v2 mid kernel must match the flax stage-2/3
    forward (same contract as v1), including the dilated and
    asymmetric blocks' lifted column taps."""

    @pytest.fixture(scope="class")
    def setup(self):
        from semanticsegmentationactivelearning_tpu.models import ENet
        rng = np.random.default_rng(19)
        model = ENet(num_classes=5)
        # W=64 -> w8=8 -> two packed columns; H=64 -> h8=8
        x = jnp.asarray(rng.uniform(size=(1, 64, 64, 3))
                        .astype(np.float32))
        variables = model.init(
            {"params": jax.random.PRNGKey(10),
             "dropout": jax.random.PRNGKey(11)}, x, training=False)
        stats = variables["batch_stats"]
        noised = jax.tree_util.tree_map(
            lambda a: a + jnp.asarray(
                np.abs(rng.normal(size=a.shape, scale=0.3))
                .astype(np.float32)), stats)
        variables = {**variables, "batch_stats": noised}
        return model, variables, x

    @pytest.mark.parametrize("rc", [2, 32])
    def test_matches_stage23_forward(self, setup, rc):
        model, variables, x = setup
        x1, _ = model.apply(variables, x, training=False,
                            return_stage1=True)

        def m_mid(m, x1):
            h, sw2 = m.Bottleneck2_0(x1, False)
            for b in m.stage2:
                h = b(h, False)
            for b in m.stage3:
                h = b(h, False)
            return h, sw2

        want_y, want_sw2 = model.apply(variables, x1, method=m_mid)
        packed, meta = pallas_kernels.pack_enet_mid_w(variables)
        y, sw2 = pallas_kernels.fused_mid_stage23_w(
            x1, packed, meta, rc=rc, interpret=True,
            out_dtype=jnp.float32)
        np.testing.assert_allclose(np.asarray(y), np.asarray(want_y),
                                   rtol=3e-5, atol=3e-5)
        n, h8, w8, _ = y.shape
        np.testing.assert_array_equal(
            np.asarray(sw2),
            np.asarray(want_sw2).reshape(n, h8, w8, 64))


class TestFusedTailEntropyScore:
    """Stage4 + stage5 + Final + entropy as one eighth-grid kernel: the
    full front -> XLA stage2/3 -> tail pipeline must reproduce the
    plain forward + acquisition math."""

    @pytest.fixture(scope="class")
    def setup(self):
        from semanticsegmentationactivelearning_tpu.models import ENet
        rng = np.random.default_rng(13)
        model = ENet(num_classes=5)
        # 128 rows -> h8 = 16, so te=8 gives grid_h=2: the tile-boundary
        # halo path (cat3 windows spanning neighbouring tiles) that runs
        # at production shapes is exercised, not just the 1-tile case
        x = jnp.asarray(rng.uniform(size=(1, 128, 48, 3))
                        .astype(np.float32))
        variables = model.init(
            {"params": jax.random.PRNGKey(6),
             "dropout": jax.random.PRNGKey(7)}, x, training=False)
        stats = variables["batch_stats"]
        noised = jax.tree_util.tree_map(
            lambda a: a + jnp.asarray(
                np.abs(rng.normal(size=a.shape, scale=0.3))
                .astype(np.float32)), stats)
        variables = {**variables, "batch_stats": noised}
        return model, variables, x

    # fc sweeps the Final+entropy row-chunk: a divisor, a
    # non-divisor (ragged last chunk), and the whole tile at once
    @pytest.mark.parametrize("te,fc", [(8, 4), (16, 3), (16, 16)])
    def test_full_pipeline(self, setup, te, fc):
        model, variables, x = setup
        from semanticsegmentationactivelearning_tpu.ops import acquisition
        packed_f = pallas_kernels.pack_enet_front(variables)
        x1, mask1 = pallas_kernels.fused_front_stage1(
            x, packed_f, tile_q=8, interpret=True,
            out_dtype=jnp.float32)
        y, sw2m = model.apply(variables, x1, training=False,
                              method="forward_stage23")
        n, h8, w8, _ = y.shape
        sw2 = sw2m.reshape(n, h8, w8, 64)
        packed_t = pallas_kernels.pack_enet_tail(variables,
                                                 model.num_classes)
        got = np.asarray(pallas_kernels.fused_tail_entropy_score(
            y, sw2, mask1, packed_t, model.num_classes, te=te, fc=fc,
            interpret=True))
        logits = model.apply(variables, x, training=False)
        want = np.asarray(acquisition.mean_confidence(
            logits, "entropy", model.num_classes))
        np.testing.assert_allclose(got, want, rtol=5e-5, atol=5e-5)


def _assert_labels_match(got, logits, atol=1e-4):
    """Argmax labels must agree with the XLA argmax everywhere the
    top-2 logit margin exceeds the kernels' numeric noise; pixels
    inside the margin are implementation ties, not errors."""
    logits = np.asarray(logits, dtype=np.float32)
    want = np.argmax(logits, axis=-1)
    top2 = np.sort(logits, axis=-1)[..., -2:]
    decided = (top2[..., 1] - top2[..., 0]) > atol
    assert decided.mean() > 0.99  # the test isn't vacuous
    np.testing.assert_array_equal(np.asarray(got)[decided],
                                  want[decided])


class TestFusedTailPredict:
    """The predict-mode tail kernel (stage4 + stage5 + Final + in-kernel
    argmax) must reproduce the plain forward's per-pixel argmax, and the
    model-level ``fused_predict`` entry point must wire the W-packed
    front/mid/tail chain correctly (it only ever executes on TPU, so a
    wiring bug would otherwise be invisible to CI)."""

    @pytest.fixture(scope="class")
    def setup(self):
        from semanticsegmentationactivelearning_tpu.models import ENet
        rng = np.random.default_rng(23)
        model = ENet(num_classes=5)
        # 128 rows -> h8=16: te=8 gives grid_h=2 (tile-halo path)
        x = jnp.asarray(rng.uniform(size=(1, 128, 48, 3))
                        .astype(np.float32))
        variables = model.init(
            {"params": jax.random.PRNGKey(12),
             "dropout": jax.random.PRNGKey(13)}, x, training=False)
        stats = variables["batch_stats"]
        noised = jax.tree_util.tree_map(
            lambda a: a + jnp.asarray(
                np.abs(rng.normal(size=a.shape, scale=0.3))
                .astype(np.float32)), stats)
        variables = {**variables, "batch_stats": noised}
        return model, variables, x

    @pytest.mark.parametrize("te,fc", [(8, 4), (16, 3)])
    def test_kernel_matches_argmax(self, setup, te, fc):
        model, variables, x = setup
        packed_f = pallas_kernels.pack_enet_front(variables)
        x1, mask1 = pallas_kernels.fused_front_stage1(
            x, packed_f, tile_q=8, interpret=True,
            out_dtype=jnp.float32)
        y, sw2m = model.apply(variables, x1, training=False,
                              method="forward_stage23")
        n, h8, w8, _ = y.shape
        sw2 = sw2m.reshape(n, h8, w8, 64)
        packed_t = pallas_kernels.pack_enet_tail(variables,
                                                 model.num_classes)
        got = pallas_kernels.fused_tail_predict(
            y, sw2, mask1, packed_t, model.num_classes, te=te, fc=fc,
            interpret=True)
        assert got.shape == x.shape[:3]
        logits = model.apply(variables, x, training=False)
        _assert_labels_match(got, logits)

    def test_fused_predict_entrypoint(self, setup):
        # production wiring: W-packed front -> W-packed mid -> predict
        # tail (W % 32 == 0, H >= 48)
        model, variables, _ = setup
        rng = np.random.default_rng(29)
        x = jnp.asarray(rng.uniform(size=(1, 64, 64, 3))
                        .astype(np.float32))
        got = model.fused_predict(variables, x, use_pallas=True,
                                  interpret=True)
        assert got.dtype == jnp.int32 and got.shape == x.shape[:3]
        logits = model.apply(variables, x, training=False)
        _assert_labels_match(got, logits)

    def test_fused_predict_fallback(self, setup):
        # W % 32 != 0 degrades to the XLA forward + argmax, exactly
        model, variables, _ = setup
        rng = np.random.default_rng(31)
        x = jnp.asarray(rng.uniform(size=(1, 32, 48, 3))
                        .astype(np.float32))
        got = np.asarray(model.fused_predict(variables, x,
                                             use_pallas=True,
                                             interpret=True))
        logits = model.apply(variables, x, training=False)
        want = np.asarray(jnp.argmax(logits, axis=-1))
        np.testing.assert_array_equal(got, want)
