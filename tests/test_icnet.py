"""ICNet tests: multi-branch shapes, cascade heads, trainability."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from semanticsegmentationactivelearning_tpu.models import ICNet, get_model
from semanticsegmentationactivelearning_tpu.train import (
    create_train_state, make_train_step, optim)

HW = (64, 96)
C = 5

HPARAMS = {
    "dropout_rates": [0.01, 0.1, 0.1, 0.1, 0.1],
    "learning_rate": 1e-3,
    "learning_rate_decay": 0.0,
    "optimizer": {"type": "Adam", "kwargs": {"beta1": 0.9, "beta2": 0.99}},
    "weight_reg": {"L2": 0.0, "L1": 0.0, "glorot_scaling": False},
    "softmax": {"label_smoothing": 0.0, "loginverse_scaling": 0.0,
                "multiscale": True},
}


@pytest.fixture(scope="module")
def icnet_and_vars():
    model = ICNet(num_classes=C)
    x = jnp.zeros((1, *HW, 3), jnp.float32)
    variables = jax.jit(lambda k: model.init(
        {"params": k}, x, training=True, multiscale=True))(
            jax.random.PRNGKey(0))
    return model, variables


class TestICNetForward:
    def test_full_res_logits(self, icnet_and_vars):
        model, variables = icnet_and_vars
        x = jnp.ones((2, *HW, 3), jnp.float32)
        fwd = jax.jit(lambda v, x: model.apply(v, x, training=False))
        logits = fwd(variables, x)
        assert logits.shape == (2, *HW, C)
        assert np.isfinite(np.asarray(logits)).all()

    def test_cascade_heads(self, icnet_and_vars):
        model, variables = icnet_and_vars
        x = jnp.ones((1, *HW, 3), jnp.float32)
        logits, heads = jax.jit(
            lambda v, x: model.apply(v, x, training=False,
                                     multiscale=True))(variables, x)
        cls4, aux8, aux16 = heads
        assert cls4.shape == (1, HW[0] // 4, HW[1] // 4, C)
        assert aux8.shape == (1, HW[0] // 8, HW[1] // 8, C)
        assert aux16.shape == (1, HW[0] // 16, HW[1] // 16, C)
        assert model.ms_loss_weights == (1.0, 0.4, 0.4)

    def test_indivisible_input_raises(self, icnet_and_vars):
        model, variables = icnet_and_vars
        with pytest.raises(ValueError, match="divisible by 32"):
            model.apply(variables, jnp.zeros((1, 60, 96, 3)),
                        training=False)

    def test_registry_and_param_scale(self, icnet_and_vars):
        assert isinstance(get_model("icnet", C), ICNet)
        _, variables = icnet_and_vars
        n = sum(int(np.prod(p.shape))
                for p in jax.tree.leaves(variables["params"]))
        # the official ICNet (half-width PSPNet50 backbone) is ~6.7M
        assert 5.0e6 < n < 1.0e7, n


class TestICNetScoring:
    """The TPU scoring path: 1/4-res head + chunked/Pallas upsample
    tail must equal scoring the full-res logits directly."""

    def _direct_score(self, model, variables, x, measure):
        from semanticsegmentationactivelearning_tpu.ops import acquisition
        logits = model.apply(variables, x, training=False)
        return np.asarray(acquisition.mean_confidence(logits, measure, C))

    @pytest.mark.parametrize("measure", ["entropy", "margin",
                                         "confidence"])
    def test_fused_score_matches_direct(self, icnet_and_vars, measure):
        model, variables = icnet_and_vars
        rng = np.random.default_rng(1)
        x = jnp.asarray(rng.uniform(size=(2, *HW, 3)), jnp.float32)
        got = np.asarray(jax.jit(
            lambda v, x: model.fused_score(v, x, measure))(variables, x))
        want = self._direct_score(model, variables, x, measure)
        np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)

    def test_fused_cff2_head_kernel_matches_composition(self):
        """The CFF2+head Pallas kernel (interpret mode) must match the
        XLA composition cff2 -> fused_head8_entropy_score on real
        model features — the resize clamp, dil-2 conv SAME padding,
        folded BN, and the head's edge rows all line up
        (pallas_kernels.fused_cff2_head8_entropy_score, flag-gated as
        fused_score(fuse_cff2=True))."""
        from semanticsegmentationactivelearning_tpu.ops import (
            pallas_kernels)
        model = ICNet(num_classes=7)
        rng = np.random.default_rng(9)
        x = jnp.asarray(rng.uniform(size=(2, 64, 96, 3)), jnp.float32)
        variables = model.init({"params": jax.random.PRNGKey(0)}, x,
                               training=False)
        # noised BN stats so the folding is non-trivial
        stats = jax.tree_util.tree_map(
            lambda a: a + jnp.asarray(np.abs(
                rng.normal(size=a.shape, scale=0.2)).astype(np.float32)),
            variables["batch_stats"])
        variables = {**variables, "batch_stats": stats}

        fused16 = jnp.asarray(
            rng.normal(size=(2, 4, 6, 128)).astype(np.float32))
        f1 = jnp.asarray(
            rng.normal(size=(2, 8, 12, 64)).astype(np.float32))

        def want_fn(v, fused16, f1):
            def run(m):
                fused8, _ = m.cff2(fused16, f1, False)
                return fused8
            fused8 = model.apply(v, method=run)
            cls_p = v["params"]["Classifier"]
            return pallas_kernels.fused_head8_entropy_score(
                fused8, cls_p["kernel"][0, 0].astype(jnp.float32),
                cls_p["bias"].astype(jnp.float32), 7, interpret=True)

        want = np.asarray(want_fn(variables, fused16, f1))
        packed = pallas_kernels.pack_icnet_cff2_head(variables, 7)
        got = np.asarray(pallas_kernels.fused_cff2_head8_entropy_score(
            fused16, f1, packed, 7, interpret=True))
        np.testing.assert_allclose(got, want, rtol=2e-5, atol=2e-5)
        # and through the flag-gated model path end to end
        got_e2e = np.asarray(jax.jit(
            lambda v, im: model.fused_score(
                v, im, "entropy", use_pallas=True, fuse_cff2=True,
                interpret=True))(variables, x))
        want_e2e = np.asarray(jax.jit(
            lambda v, im: model.fused_score(
                v, im, "entropy", use_pallas=True,
                interpret=True))(variables, x))
        np.testing.assert_allclose(got_e2e, want_e2e, rtol=5e-4,
                                   atol=5e-4)

    def test_fused_cff2_head_predict_matches_composition(self):
        """The predict twin of the CFF2+head kernel: labels must match
        the cff2 -> fused_head8_predict composition (fp32 model; at
        most a near-tie pixel or two may flip under fp reassociation
        of the folded BN)."""
        from semanticsegmentationactivelearning_tpu.ops import (
            pallas_kernels)
        model = ICNet(num_classes=7)
        rng = np.random.default_rng(11)
        x = jnp.asarray(rng.uniform(size=(1, 64, 96, 3)), jnp.float32)
        variables = model.init({"params": jax.random.PRNGKey(1)}, x,
                               training=False)
        fused16 = jnp.asarray(
            rng.normal(size=(1, 4, 6, 128)).astype(np.float32))
        f1 = jnp.asarray(
            rng.normal(size=(1, 8, 12, 64)).astype(np.float32))

        def run(m):
            fused8, _ = m.cff2(fused16, f1, False)
            return fused8
        fused8 = model.apply(variables, method=run)
        cls_p = variables["params"]["Classifier"]
        want = np.asarray(pallas_kernels.fused_head8_predict(
            fused8, cls_p["kernel"][0, 0].astype(jnp.float32),
            cls_p["bias"].astype(jnp.float32), 7, interpret=True))
        packed = pallas_kernels.pack_icnet_cff2_head(variables, 7)
        got = np.asarray(pallas_kernels.fused_cff2_head8_predict(
            fused16, f1, packed, 7, interpret=True))
        assert got.shape == want.shape
        agree = (got == want).mean()
        assert agree > 0.9999, agree
        # tile-size invariance: wide inputs clamp tile_h to bound the
        # kernel's scoped-vmem stack (tile_h*w8 <= 512), so the
        # smaller row tiles must produce identical labels
        got_t2 = np.asarray(pallas_kernels.fused_cff2_head8_predict(
            fused16, f1, packed, 7, tile_h=2, interpret=True))
        np.testing.assert_array_equal(got_t2, got)
        want_t1 = np.asarray(pallas_kernels.fused_head8_predict(
            fused8, cls_p["kernel"][0, 0].astype(jnp.float32),
            cls_p["bias"].astype(jnp.float32), 7, tile_h=1,
            interpret=True))
        np.testing.assert_array_equal(want_t1, want)
        # and through the flag-gated model path end to end
        got_e2e = np.asarray(jax.jit(
            lambda v, im: model.fused_predict(
                v, im, use_pallas=True, fuse_cff2=True,
                interpret=True))(variables, x))
        want_e2e = np.asarray(jax.jit(
            lambda v, im: model.fused_predict(
                v, im, use_pallas=True, fuse_cff2=False,
                interpret=True))(variables, x))
        assert (got_e2e == want_e2e).mean() > 0.999

    def test_up2_taps_match_jax_image_resize(self):
        """The CFF units' explicit polyphase 2x upsample must equal
        jax.image.resize bilinear to fp tolerance (it replaces the
        resize lowering, which measured +8.9 ms/batch-16 in the CFF
        context on v5e — tools/probe_icnet_boundary.py)."""
        from semanticsegmentationactivelearning_tpu.models.icnet import (
            _resize_bilinear_up2)
        rng = np.random.default_rng(5)
        for shape in ((2, 8, 12, 7), (1, 5, 3, 2), (3, 1, 1, 4)):
            x = jnp.asarray(rng.normal(size=shape), jnp.float32)
            want = jax.image.resize(
                x, (shape[0], 2 * shape[1], 2 * shape[2], shape[3]),
                method="bilinear")
            got = _resize_bilinear_up2(x)
            np.testing.assert_allclose(np.asarray(got),
                                       np.asarray(want),
                                       rtol=1e-6, atol=1e-6)

    @pytest.mark.parametrize("chunk", [2, 3, 4, 16])
    def test_chunked_upsample_exact(self, chunk):
        """Slice-resize with edge-replicated halo == global resize,
        for dividing and non-dividing (fallback) chunk sizes."""
        from semanticsegmentationactivelearning_tpu.ops import acquisition
        rng = np.random.default_rng(2)
        low = jnp.asarray(rng.normal(size=(2, 16, 12, C)), jnp.float32)
        got = np.asarray(acquisition.chunked_upsample_mean_confidence(
            low, 4, "entropy", C, chunk=chunk))
        full = jax.image.resize(low, (2, 64, 48, C), method="bilinear")
        want = np.asarray(acquisition.mean_confidence(full, "entropy", C))
        np.testing.assert_allclose(got, want, rtol=1e-5)

    def test_pallas_head8_kernel_matches(self):
        """Interpreted fused-head kernel == the two-stage oracle
        (resize2x -> 1x1 classifier -> resize4x -> entropy), covering
        both the polyphase composition and the classifier commute at
        a multi-tile grid (h8=8, tile_h=4 -> grid_h=2)."""
        from semanticsegmentationactivelearning_tpu.ops import (
            acquisition, pallas_kernels)
        rng = np.random.default_rng(3)
        cf = 16
        feats = jnp.asarray(rng.normal(size=(2, 8, 16, cf)), jnp.float32)
        wcls = jnp.asarray(rng.normal(size=(cf, C)), jnp.float32)
        bcls = jnp.asarray(rng.normal(size=(C,)), jnp.float32)
        got = np.asarray(pallas_kernels.fused_head8_entropy_score(
            feats, wcls, bcls, C, interpret=True))
        up4 = jax.image.resize(feats, (2, 16, 32, cf), method="bilinear")
        cls4 = up4 @ wcls + bcls
        full = jax.image.resize(cls4, (2, 64, 128, C), method="bilinear")
        want = np.asarray(acquisition.mean_confidence(full, "entropy", C))
        np.testing.assert_allclose(got, want, rtol=1e-5)

    def _assert_labels_match(self, got, logits, atol=1e-4):
        # argmax must agree wherever the top-2 margin exceeds kernel
        # numeric noise; pixels inside the margin are ties, not errors.
        # Bilinear upsampling interpolates across class boundaries, so
        # random-init logits carry a few % of near-tie band pixels —
        # the vacuity guard only ensures the comparison keeps teeth.
        logits = np.asarray(logits, dtype=np.float32)
        want = np.argmax(logits, axis=-1)
        top2 = np.sort(logits, axis=-1)[..., -2:]
        decided = (top2[..., 1] - top2[..., 0]) > atol
        assert decided.mean() > 0.9
        np.testing.assert_array_equal(np.asarray(got)[decided],
                                      want[decided])

    def test_pallas_head8_predict_matches(self):
        """Predict-mode head kernel == argmax of the two-stage oracle
        (resize2x -> 1x1 classifier -> resize4x), multi-tile grid."""
        from semanticsegmentationactivelearning_tpu.ops import (
            pallas_kernels)
        rng = np.random.default_rng(5)
        cf = 16
        feats = jnp.asarray(rng.normal(size=(2, 8, 16, cf)), jnp.float32)
        wcls = jnp.asarray(rng.normal(size=(cf, C)), jnp.float32)
        bcls = jnp.asarray(rng.normal(size=(C,)), jnp.float32)
        got = pallas_kernels.fused_head8_predict(
            feats, wcls, bcls, C, interpret=True)
        assert got.shape == (2, 64, 128)
        up4 = jax.image.resize(feats, (2, 16, 32, cf), method="bilinear")
        cls4 = up4 @ wcls + bcls
        full = jax.image.resize(cls4, (2, 64, 128, C), method="bilinear")
        self._assert_labels_match(got, full)

    @pytest.mark.parametrize("fuse_stem", [True, False])
    def test_fused_predict_matches_argmax(self, icnet_and_vars,
                                          fuse_stem):
        """Model-level fused_predict (front[+stem] kernel -> XLA mid ->
        predict-mode head kernel) == the plain forward's argmax."""
        model, variables = icnet_and_vars
        rng = np.random.default_rng(7)
        x = jnp.asarray(rng.uniform(size=(1, *HW, 3)), jnp.float32)
        got = model.fused_predict(variables, x, use_pallas=True,
                                  fuse_stem=fuse_stem, interpret=True)
        assert got.dtype == jnp.int32 and got.shape == (1, *HW)
        logits = model.apply(variables, x, training=False)
        self._assert_labels_match(got, logits, atol=5e-4)

    def test_fused_predict_fallback_exact(self, icnet_and_vars):
        model, variables = icnet_and_vars
        rng = np.random.default_rng(9)
        x = jnp.asarray(rng.uniform(size=(1, *HW, 3)), jnp.float32)
        got = np.asarray(model.fused_predict(variables, x,
                                             use_pallas=False))
        logits = model.apply(variables, x, training=False)
        want = np.asarray(jnp.argmax(logits, axis=-1))
        np.testing.assert_array_equal(got, want)

    def test_pallas_front_kernel_matches(self, icnet_and_vars):
        """Interpreted front kernel == flax Branch1 stack + the
        half-res jax.image.resize, at a multi-tile grid (H=64 ->
        grid_h=2, so the cross-tile row halo and the top/bottom
        renormalized resize edges are all exercised)."""
        from semanticsegmentationactivelearning_tpu.models.icnet import \
            _resize_bilinear
        from semanticsegmentationactivelearning_tpu.ops import \
            pallas_kernels
        model, variables = icnet_and_vars
        rng = np.random.default_rng(5)
        x = jnp.asarray(rng.uniform(size=(2, *HW, 3)), jnp.float32)
        packed = pallas_kernels.pack_icnet_front(variables)
        f1, xh = pallas_kernels.fused_icnet_front(x, packed,
                                                  interpret=True)

        def oracle(mdl, xx):
            f = mdl.branch1_3(
                mdl.branch1_2(mdl.branch1_1(xx, False), False), False)
            return f, _resize_bilinear(
                xx, (xx.shape[1] // 2, xx.shape[2] // 2))

        want_f1, want_xh = model.apply(variables, x, method=oracle)
        assert f1.shape == want_f1.shape and xh.shape == want_xh.shape
        np.testing.assert_allclose(np.asarray(xh), np.asarray(want_xh),
                                   rtol=1e-5, atol=1e-6)
        np.testing.assert_allclose(np.asarray(f1), np.asarray(want_f1),
                                   rtol=1e-4, atol=1e-5)

    def test_pallas_front_stem_kernel_matches(self, icnet_and_vars):
        """Interpreted front+stem kernel == flax Branch1 stack + the
        stem front (conv1_1 s2 -> conv1_2 -> conv1_3 -> maxpool) on
        the half-res resize, at a multi-tile grid (H=64 -> grid_h=2,
        exercising the cross-tile halos of all three stem convs, the
        renormalized resize edges, and the pool's row/column edge
        masking)."""
        import flax.linen as nn
        from semanticsegmentationactivelearning_tpu.models.icnet import \
            _resize_bilinear
        from semanticsegmentationactivelearning_tpu.ops import \
            pallas_kernels
        model, variables = icnet_and_vars
        rng = np.random.default_rng(6)
        x = jnp.asarray(rng.uniform(size=(2, *HW, 3)), jnp.float32)
        packed = pallas_kernels.pack_icnet_front_stem(variables)
        f1, stem1 = pallas_kernels.fused_icnet_front_stem(
            x, packed, interpret=True)

        def oracle(mdl, xx):
            f = mdl.branch1_3(
                mdl.branch1_2(mdl.branch1_1(xx, False), False), False)
            xh = _resize_bilinear(
                xx, (xx.shape[1] // 2, xx.shape[2] // 2))
            s = mdl.stem.conv1_3(
                mdl.stem.conv1_2(
                    mdl.stem.conv1_1(xh, False), False), False)
            return f, nn.max_pool(s, (3, 3), strides=(2, 2),
                                  padding="SAME")

        want_f1, want_st = model.apply(variables, x, method=oracle)
        assert f1.shape == want_f1.shape and stem1.shape == want_st.shape
        np.testing.assert_allclose(np.asarray(f1), np.asarray(want_f1),
                                   rtol=1e-4, atol=1e-5)
        np.testing.assert_allclose(np.asarray(stem1),
                                   np.asarray(want_st),
                                   rtol=1e-4, atol=1e-5)

    @pytest.mark.parametrize("fuse_stem", [True, False])
    def test_fused_score_pallas_matches_direct(self, icnet_and_vars,
                                               fuse_stem):
        """Model-level fused_score(use_pallas=True) in interpret mode
        == direct full-res scoring (wiring check on CPU), for both the
        front+stem and the front-only kernel paths."""
        model, variables = icnet_and_vars
        rng = np.random.default_rng(4)
        x = jnp.asarray(rng.uniform(size=(1, *HW, 3)), jnp.float32)
        got = np.asarray(model.fused_score(
            variables, x, "entropy", use_pallas=True,
            fuse_stem=fuse_stem, interpret=True))
        want = self._direct_score(model, variables, x, "entropy")
        np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)

    def test_score_step_uses_fused_path(self, icnet_and_vars):
        """make_score_step on ICNet routes through fused_score and
        matches direct scoring."""
        from semanticsegmentationactivelearning_tpu.train import (
            TrainState, make_score_step)
        model, variables = icnet_and_vars
        state = TrainState(params=variables["params"],
                           batch_stats=variables.get("batch_stats", {}),
                           opt_state=None,
                           step=jnp.zeros((), jnp.int32),
                           epoch=jnp.zeros((), jnp.int32))
        rng = np.random.default_rng(4)
        x = jnp.asarray(rng.uniform(size=(2, *HW, 3)), jnp.float32)
        step = make_score_step(model, C, "entropy")
        got = np.asarray(step(state, {"image": x}))
        want = self._direct_score(model, variables, x, "entropy")
        np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)


class TestICNetBf16:
    def test_bf16_forward_and_score(self):
        model = ICNet(num_classes=C, dtype=jnp.bfloat16)
        x = jnp.zeros((1, *HW, 3), jnp.float32)
        variables = jax.jit(lambda k: model.init(
            {"params": k}, x, training=False))(jax.random.PRNGKey(0))
        # params stay fp32; logits come back fp32
        kern = variables["params"]["SharedStem"]["conv1_1"]["conv"][
            "kernel"]
        assert kern.dtype == jnp.float32
        logits = jax.jit(lambda v, x: model.apply(v, x,
                                                  training=False))(
            variables, x)
        assert logits.dtype == jnp.float32
        assert np.isfinite(np.asarray(logits)).all()
        scores = np.asarray(jax.jit(
            lambda v, x: model.fused_score(v, x, "entropy"))(
                variables, x))
        assert scores.shape == (1,)
        assert np.isfinite(scores).all()


class TestICNetTraining:
    def test_train_step_decreases_loss(self):
        model = ICNet(num_classes=C)
        optimizer = optim.make_optimizer(HPARAMS)
        state = create_train_state(model, optimizer,
                                   jax.random.PRNGKey(0), HW,
                                   multiscale=True)
        step = make_train_step(model, optimizer, C, HPARAMS)
        rng = np.random.default_rng(0)
        batch = {
            "image": rng.uniform(size=(2, *HW, 3)).astype(np.float32),
            "label": rng.integers(0, C, (2, *HW)).astype(np.int32),
            "mask": np.ones((2, *HW), np.float32),
            "valid": np.ones((2,), np.float32),
        }
        losses = []
        for i in range(4):
            state, m = step(state, dict(batch), jax.random.PRNGKey(i))
            losses.append(float(m["loss"]))
        assert np.isfinite(losses).all()
        assert losses[-1] < losses[0]
