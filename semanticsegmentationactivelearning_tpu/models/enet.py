"""ENet (arXiv:1606.02147) as a flax module.

Stage layout exactly as the paper and the reference graph
(models/enet/enet.py:34-247, call graph 320-367):

    Initial (1/2, 16ch)
    Stage 1: downsample (1/4, 64ch, switches1) + 4 bottlenecks
    Stage 2: downsample (1/8, 128ch, switches2) + 8 bottlenecks with
             dilation 2/4/8/16 at 2_2/2_4/2_6/2_8 and asymmetric 5x5 at
             2_3/2_7 (enet.py:96-143)
    Stage 3: the stage-2 pattern again without the downsample
    Stage 4: upsample (1/4, 64ch, consumes switches2) + 2 bottlenecks
    Stage 5: upsample (1/2, 16ch, consumes switches1) + 1 bottleneck
    Final:   transpose conv to ``num_classes`` at full resolution

``__call__(..., multiscale=True)`` additionally returns the learned 1x1
per-endpoint heads over bottleneck5_1/4_2/3_8 used by the multiscale
loss; the reference created those heads inside the loss and attached
them to the model for checkpointing (tensortools/losses.py:122-135,
train.py:120-121) — here they are ordinary submodules.
"""

from __future__ import annotations

from typing import Any, Sequence

import flax.linen as nn
import jax.numpy as jnp

from ..ops import nn as xops
from .blocks import (Bottleneck, BottleneckDownsample, BottleneckUpsample,
                     Final, Initial)

_KERNEL_INIT = nn.initializers.glorot_uniform()


class ENet(nn.Module):
    num_classes: int
    drop_rates: Sequence[float] = (0.01, 0.1, 0.1, 0.1, 0.1)
    dtype: Any = jnp.float32   # computation dtype; bf16 for TPU speed
    # conv lowering: "auto" = shifted matmuls off-CPU (1.8x faster
    # fwd+bwd on the low-channel segments, ops/shiftconv.py) for the
    # low-channel front/tail, lax.conv for the 128-channel stage-2/3
    # blocks (MXU-bound either way, and their 16 blocks dominate XLA
    # compile time under the matmul lowering) and on CPU;
    # "matmul"/"lax" force one lowering everywhere
    conv_impl: str = "auto"
    # False emits logits in the compute dtype (bf16 on TPU): CE/argmax
    # consumers upcast in registers, halving the logits plane's HBM
    # traffic; True keeps dtype-independent fp32 logits
    fp32_logits: bool = True

    # equal per-head loss weighting (see __call__ loss-head contract)
    ms_loss_weights = None
    # spatial dropout on every bottleneck -> MC-dropout (BALD) works
    uses_dropout = True
    # scoring can stop at pre-Final features (see return_pre_logits)
    supports_fused_scoring = True
    # __call__(return_pre_logits=True) yields half-res features whose
    # classifier is params["Final"]["deconv"] — lets the MC-dropout
    # BALD scorer (train/steps.make_mc_score_step) stream the T
    # full-res probability maps in row chunks
    supports_pre_logits = True
    # top-level param collection holding the classifier head (used by
    # checkpoint.reinitialize_final_layer, the `-r` transfer flag)
    output_module = "Final"
    # __call__(return_phase_logits=True) emits [N, H/2, 2W, C] logits
    # in the Final deconv's polyphase pixel order (ops.nn.s2d_plane):
    # per-pixel training consumers (CE, argmax, confusion) use it so
    # the full-res fp32 plane and its ~12 GB/s d2s relayout (measured
    # +58 ms on the batch-8 512x1024 train step) never exist
    supports_phase_logits = True
    # input H/W must divide this (3 pool/unpool levels)
    input_divisor = 8

    def setup(self):
        if len(self.drop_rates) != 5:
            raise ValueError(
                "Illegal argument value drop_rates, length must be 5.")
        dr = self.drop_rates
        dt = self.dtype
        ci = self.conv_impl
        self.Initial_ = Initial(16, dtype=dt, conv_impl=ci,
                                name="Initial")

        self.Bottleneck1_0 = BottleneckDownsample(
            64, drop_rate=dr[0], dtype=dt, conv_impl=ci,
            name="Bottleneck1_0")
        self.stage1 = [
            Bottleneck(64, drop_rate=dr[0], dtype=dt, conv_impl=ci,
                       name=f"Bottleneck1_{i}")
            for i in range(1, 5)]

        self.Bottleneck2_0 = BottleneckDownsample(
            128, drop_rate=dr[1], dtype=dt, conv_impl=ci,
            name="Bottleneck2_0")
        # the 128ch 1/8-res stages are MXU-shape-bound: the matmul
        # lowering buys nothing there but costs most of the compile
        mid_ci = "lax" if ci == "auto" else ci
        self.stage2 = self._dilated_stage(2, dr[1], mid_ci)
        self.stage3 = self._dilated_stage(3, dr[2], mid_ci)

        self.Bottleneck4_0 = BottleneckUpsample(
            64, drop_rate=dr[3], dtype=dt, conv_impl=ci,
            name="Bottleneck4_0")
        self.stage4 = [
            Bottleneck(64, drop_rate=dr[3], dtype=dt, conv_impl=ci,
                       name=f"Bottleneck4_{i}")
            for i in (1, 2)]

        self.Bottleneck5_0 = BottleneckUpsample(
            16, drop_rate=dr[4], dtype=dt, conv_impl=ci,
            name="Bottleneck5_0")
        self.Bottleneck5_1 = Bottleneck(16, drop_rate=dr[4], dtype=dt,
                                        conv_impl=ci,
                                        name="Bottleneck5_1")
        self.Final_ = Final(self.num_classes, dtype=dt, conv_impl=ci,
                            fp32_out=self.fp32_logits, name="Final")

        # Multiscale-loss endpoint heads (1x1 conv to classes), one per
        # endpoint below the final logits (losses.py:122-132).
        self.ms_heads = [
            nn.Conv(self.num_classes, (1, 1), use_bias=False,
                    kernel_init=_KERNEL_INIT, name=f"MultiscaleHead_{i}")
            for i in range(3)]

    def _dilated_stage(self, stage: int, drop_rate: float,
                       conv_impl: str):
        """The repeated stage-2/3 pattern: plain, dilated 2, asym 5x5,
        dilated 4, plain, dilated 8, asym 5x5, dilated 16."""
        blocks = []
        spec = [(1, False), (2, False), (1, True), (4, False),
                (1, False), (8, False), (1, True), (16, False)]
        for i, (dilation, asym) in enumerate(spec, start=1):
            blocks.append(Bottleneck(
                128, dilation=dilation, asymmetric=asym,
                kernel_size=5 if asym else 3, drop_rate=drop_rate,
                dtype=self.dtype, conv_impl=conv_impl,
                name=f"Bottleneck{stage}_{i}"))
        return blocks

    def __call__(self, x, training: bool = False,
                 multiscale: bool = False,
                 return_pre_logits: bool = False,
                 return_stage4: bool = False,
                 return_stage1: bool = False,
                 return_embedding: bool = False,
                 return_phase_logits: bool = False):
        h = self.Initial_(x, training)

        h, switches1 = self.Bottleneck1_0(h, training)
        for block in self.stage1:
            h = block(h, training)

        if return_stage1:
            # Stage-1 features + switches (fused front-end kernel
            # parity testing, ops/pallas_kernels.fused_front_stage1)
            return h, switches1

        h, switches2 = self.Bottleneck2_0(h, training)
        for block in self.stage2:
            h = block(h, training)
        for block in self.stage3:
            h = block(h, training)
        b3_8 = h

        if return_embedding:
            # global-average-pooled deepest encoder features [N,128]:
            # the pool representation for diversity (core-set)
            # selection, ops/selection.k_center_greedy — the decoder
            # adds no semantic content worth the extra compute
            return jnp.mean(b3_8.astype(jnp.float32), axis=(1, 2))

        h = self.Bottleneck4_0(h, switches2, training)
        for block in self.stage4:
            h = block(h, training)
        b4_2 = h

        if return_stage4:
            # Stage-4 features + stage-1 pool switches: everything the
            # fused decoder scoring kernel needs (Bottleneck5_0/5_1 +
            # Final + entropy run inside ops/pallas_kernels).
            return b4_2, switches1

        h = self.Bottleneck5_0(h, switches1, training)
        b5_1 = self.Bottleneck5_1(h, training)

        if return_pre_logits:
            # Pre-Final features for the fused scoring path
            # (ops/acquisition.py): the Final transpose conv + softmax +
            # entropy are then evaluated in spatial chunks so the padded
            # full-resolution logits never materialize in HBM.
            return b5_1

        logits = self.Final_(b5_1, phase=return_phase_logits)
        if not multiscale:
            return logits
        endpoints = (b5_1, b4_2, b3_8)
        ms_logits = tuple(head(ep).astype(jnp.float32)
                          for head, ep in zip(self.ms_heads, endpoints))
        # Loss-head contract: primary head first, then the endpoint
        # heads; the reference sums CE equally over all of them
        # (losses.py:115-152), so ms_loss_weights stays None.
        return logits, (logits, *ms_logits)

    def forward_from_stage1(self, x1, training: bool = False):
        """Stage 2 through stage 4 only: consumes stage-1 features (as
        produced by the fused front-end kernel,
        ops/pallas_kernels.fused_front_stage1) and returns the stage-4
        features for the fused decoder kernel."""
        h, switches2 = self.Bottleneck2_0(x1, training)
        for block in self.stage2:
            h = block(h, training)
        for block in self.stage3:
            h = block(h, training)
        h = self.Bottleneck4_0(h, switches2, training)
        for block in self.stage4:
            h = block(h, training)
        return h

    def forward_stage23(self, x1, training: bool = False):
        """Stages 2 and 3 only: consumes stage-1 features and returns
        (stage-3 features, B2_0 pool switches) for the fused tail
        kernel (ops/pallas_kernels.fused_tail_entropy_score)."""
        h, switches2 = self.Bottleneck2_0(x1, training)
        for block in self.stage2:
            h = block(h, training)
        for block in self.stage3:
            h = block(h, training)
        return h, switches2

    def decode_from_stage4(self, f4, switches1, training: bool = False):
        """Stage 5 through pre-logits: consumes stage-4 features +
        stage-1 pool switches (the spatial-mesh scoring path composes
        the per-shard Pallas front with this XLA decoder; see
        ``fused_score``)."""
        h = self.Bottleneck5_0(f4, switches1, training)
        return self.Bottleneck5_1(h, training)

    def forward_stage4(self, y, switches2, training: bool = False):
        """Stage 4 only: consumes stage-3 features + stage-2 pool
        switches (as produced by the fused mid-section kernel,
        ops/pallas_kernels.fused_mid_stage23) and returns the stage-4
        features for the fused decoder kernel."""
        h = self.Bottleneck4_0(y, switches2, training)
        for block in self.stage4:
            h = block(h, training)
        return h

    def spatial_front_score(self, variables, image, measure: str,
                            mesh, interpret: bool = False):
        """Width-sharded scoring with the Pallas FRONT kernel running
        per shard under ``jax.shard_map`` — the ``("data", "space")``
        mesh no longer forces the full XLA fallback.

        Exactness by halo analysis: a stage-1 output column depends on
        at most ±24 image columns (Initial 3x3/s2 ±2, B1_0 conv ±1
        quarter, 4 bottlenecks ±1 quarter each → ±5 quarter + pooling
        alignment), so each shard computes the front on its slice
        extended by 32 zero-or-neighbor columns
        (``parallel.spatial.halo_exchange_width``; ppermute zero-fill
        at the global edges == the model's SAME zero padding, and the
        2x2 pools are stride-aligned so padding never enters a pool
        window) and crops 8 quarter columns per side — bit-equal to
        the unsharded kernel (tests/test_spatial.py). Stages 2-5 and
        the chunked deconv scoring stay XLA under GSPMD — quantified,
        not asserted (tools/probe_mid_halo.py, docs/PERF.md §1): the
        mid section's measured column receptive field is +-584 image
        columns, so a per-shard mid kernel at space degree 2 would
        recompute 1.07x the ENTIRE unsharded mid per shard (5.6x
        aggregate at degree 8); the tail kernel's in-kernel per-image
        mean additionally cannot crop halo contributions. The spatial
        mesh therefore keeps the dominant front fusion while XLA
        inserts the remaining per-conv halo exchanges of 1-16 columns.
        """
        import jax
        from jax.sharding import PartitionSpec as P

        from ..ops import acquisition, pallas_kernels
        from ..parallel import spatial as sp

        packed = pallas_kernels.pack_enet_front_w(variables)
        halo = 32            # >= the measured ±24-col receptive field
        axis = "space"

        def local(img):
            padded = sp.halo_exchange_width(img, axis, halo)
            x1, m1 = pallas_kernels.fused_front_stage1_w(
                padded, packed, out_dtype=self.dtype,
                interpret=interpret)
            c = halo // 4
            return x1[:, :, c:-c], m1[:, :, c:-c]

        spec = P("data", None, axis, None)
        x1, m1 = jax.shard_map(
            local, mesh=mesh, in_specs=spec, out_specs=(spec, spec),
            check_vma=False)(image)
        n, hq, wq, _ = m1.shape
        # kernel mask [.,4*16] one-hot (phase-major) -> the model's
        # compact int8 switch format (ops/nn.max_pool_with_switches)
        switches = jnp.argmax(
            m1.reshape(n, hq, wq, 4, 16), axis=3).astype(jnp.int8) \
            .reshape(n, hq, wq * 16)
        f4 = self.apply(variables, x1, training=False,
                        method="forward_from_stage1")
        features = self.apply(variables, f4, switches, training=False,
                              method="decode_from_stage4")
        kernel = variables["params"]["Final"]["deconv"]["kernel"]
        return acquisition.chunked_deconv_mean_confidence(
            features, kernel, measure, self.num_classes)

    def fused_score(self, variables, image, measure: str,
                    use_pallas: bool = False, fuse_decoder: bool = True,
                    fuse_front: bool = True, fuse_mid: bool = True,
                    fuse_tail: bool = True, interpret: bool = False,
                    spatial_mesh=None):
        """Acquisition scoring without materializing full-res logits.
        The AL pool-ranking hot loop (reference
        active_learning.py:229-263).

        With ``use_pallas`` and the entropy measure the DEFAULT path is
        fully kernelized: the W-packed front (image -> stage 1), the
        W-packed mid section (stages 2/3), and the eighth-grid tail
        (stage 4 + stage 5 + Final + entropy) — full/half-resolution
        activations and lane-padded logits never exist in HBM at all,
        and every kernel consumes RAW row layouts (free reshapes only;
        the packed lane layouts are built in VMEM, so XLA never
        materializes a strided relayout at the custom-call boundary).
        Measured on v5e batch-16 bf16 1024x2048: 306.5 img/s/chip vs
        154.0 for front+decoder-only and 126.2 for round-2's kernels.
        The ``fuse_*`` flags keep each stage independently toggleable
        (used by the probe tools and as measured fallbacks); widths not
        divisible by 32 fall back to the unpacked v1 front/mid
        kernels. Other measures use the chunked XLA tail."""
        from ..ops import acquisition, pallas_kernels
        if spatial_mesh is not None:
            # ("data","space") mesh: per-shard front kernel + XLA rest
            # when the shard geometry allows it, else full XLA (an
            # unsharded pallas_call under GSPMD would be replicated by
            # the partitioner — never let one through here)
            ns = spatial_mesh.shape.get("space", 1)
            wl = image.shape[2] // max(ns, 1)
            if (measure == "entropy" and image.shape[-1] == 3
                    and image.shape[1] >= 24 and ns > 1
                    and image.shape[2] % ns == 0
                    and wl % 32 == 0 and wl >= 64):
                return self.spatial_front_score(
                    variables, image, measure, spatial_mesh,
                    interpret=interpret)
            use_pallas = False
        # the eighth-grid tail kernel's halo window needs >= 6 eighth
        # rows; tiny inputs take the stage4+decoder path instead
        fuse_tail = fuse_tail and image.shape[1] // 8 >= 6
        # both front kernels window 6 quarter-res rows of halo, so
        # inputs under 24 px tall fall back to the eighth-res decoder
        # kernel over a full XLA encoder instead of dying in read_img
        # (probed in interpret mode: H>=24 works at every width, H<=16
        # crashes; the decoder-only path is exact down to 8x16)
        fuse_front = fuse_front and image.shape[1] >= 24
        # the packed front kernels hard-assume a 3-channel image (their
        # tap matmuls fold C=3 into fixed-width routing matrices);
        # multi-modal inputs take the XLA encoder + decoder kernel
        fuse_front = fuse_front and image.shape[-1] == 3
        if use_pallas and measure == "entropy" and fuse_decoder:
            if fuse_front:
                # image -> stage1 and stage5 -> entropy run as fused
                # Pallas kernels; stages 2-4 default to XLA. The
                # optional ``fuse_mid`` (stages 2/3) and ``fuse_tail``
                # (stages 4+5+Final in one eighth-grid kernel) variants
                # measured ~even with XLA end-to-end: the >=64-channel
                # stages are MXU-shape-bound, not layout-bound, so only
                # the low-channel front/decoder fusions pay off.
                if image.shape[2] % 32 == 0:
                    # W-packed v2 front kernel (measured 35 ms faster
                    # than v1 at batch-16 1024x2048 bf16: lane-full VPU
                    # planes + MXU-shaped matmuls)
                    packed_f = pallas_kernels.pack_enet_front_w(
                        variables)
                    x1, mask1 = pallas_kernels.fused_front_stage1_w(
                        image, packed_f, out_dtype=self.dtype,
                        interpret=interpret)
                else:
                    packed_f = pallas_kernels.pack_enet_front(variables)
                    x1, mask1 = pallas_kernels.fused_front_stage1(
                        image, packed_f, out_dtype=self.dtype,
                        interpret=interpret)
                if fuse_mid or fuse_tail:
                    if fuse_mid:
                        if image.shape[2] % 32 == 0:
                            packed_m, meta = \
                                pallas_kernels.pack_enet_mid_w(
                                    variables)
                            y, sw2 = pallas_kernels.fused_mid_stage23_w(
                                x1, packed_m, meta,
                                out_dtype=self.dtype,
                                interpret=interpret)
                        else:
                            packed_m, meta = \
                                pallas_kernels.pack_enet_mid(variables)
                            y, sw2 = pallas_kernels.fused_mid_stage23(
                                x1, packed_m, meta,
                                out_dtype=self.dtype,
                                interpret=interpret)
                    else:
                        y, sw2m = self.apply(variables, x1,
                                             training=False,
                                             method="forward_stage23")
                        n, h8, w8, _ = y.shape
                        sw2 = sw2m.reshape(n, h8, w8, 64)
                    if fuse_tail:
                        packed_t = pallas_kernels.pack_enet_tail(
                            variables, self.num_classes)
                        return pallas_kernels.fused_tail_entropy_score(
                            y, sw2, mask1, packed_t, self.num_classes,
                            interpret=interpret)
                    n, h8, w8, _ = y.shape
                    f4 = self.apply(variables, y,
                                    sw2.reshape(n, h8, w8 * 64),
                                    training=False,
                                    method="forward_stage4")
                else:
                    f4 = self.apply(variables, x1, training=False,
                                    method="forward_from_stage1")
                packed = pallas_kernels.pack_enet_decoder(
                    variables, self.num_classes)
                return pallas_kernels.fused_decoder_entropy_score(
                    f4, None, packed, self.num_classes, mask=mask1,
                    interpret=interpret)
            packed = pallas_kernels.pack_enet_decoder(
                variables, self.num_classes)
            f4, switches1 = self.apply(variables, image, training=False,
                                       return_stage4=True)
            return pallas_kernels.fused_decoder_entropy_score(
                f4, switches1, packed, self.num_classes,
                interpret=interpret)
        features = self.apply(variables, image, training=False,
                              return_pre_logits=True)
        kernel = variables["params"]["Final"]["deconv"]["kernel"]
        if use_pallas and measure == "entropy":
            # features stay in compute dtype (bf16 on TPU): the kernel
            # upcasts per-tile in VMEM, halving its HBM input traffic
            return pallas_kernels.fused_deconv_entropy_score(
                features, kernel.astype(jnp.float32), self.num_classes,
                interpret=interpret)
        return acquisition.chunked_deconv_mean_confidence(
            features, kernel, measure, self.num_classes)

    def fused_predict(self, variables, image,
                      use_pallas: bool = False,
                      interpret: bool = False):
        """Per-pixel argmax labels without materializing full-res
        logits — the inference CLI's forward (reference
        inference.py:90-98) through the same fully-kernelized chain as
        :meth:`fused_score` (W-packed front -> W-packed mid -> fused
        tail), with the tail ending in an in-kernel argmax. Returns
        int32 ``[N, H, W]``.

        Falls back to the plain XLA forward + argmax off-TPU, for
        inputs too small for the kernels' halo windows (same limits as
        fused_score), or widths not divisible by 32 (the predict tail
        only pairs with the W-packed front/mid)."""
        from ..ops import pallas_kernels
        fused = (use_pallas and image.shape[1] >= 48
                 and image.shape[1] % 8 == 0
                 and image.shape[2] % 32 == 0
                 and image.shape[-1] == 3)  # see fused_score
        if fused:
            packed_f = pallas_kernels.pack_enet_front_w(variables)
            x1, mask1 = pallas_kernels.fused_front_stage1_w(
                image, packed_f, out_dtype=self.dtype,
                interpret=interpret)
            packed_m, meta = pallas_kernels.pack_enet_mid_w(variables)
            y, sw2 = pallas_kernels.fused_mid_stage23_w(
                x1, packed_m, meta, out_dtype=self.dtype,
                interpret=interpret)
            packed_t = pallas_kernels.pack_enet_tail(
                variables, self.num_classes)
            labels = pallas_kernels.fused_tail_predict(
                y, sw2, mask1, packed_t, self.num_classes,
                interpret=interpret)
            return labels.astype(jnp.int32)
        # XLA fallback: argmax in the polyphase pixel order, then
        # depth-to-space only the int32 label plane (identical labels;
        # the fp32 full-res plane and its slow relayout never exist)
        logits = self.apply(variables, image, training=False,
                            return_phase_logits=True)
        pred = jnp.argmax(logits, axis=-1).astype(jnp.int32)
        return xops.d2s_plane(pred)
