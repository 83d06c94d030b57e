"""Dense deformable STN (reference models/stn/unet_stn.py — SURVEY.md §3.1).

A UNet over the concatenated (a, b) pair predicts a per-pixel 2-channel
displacement field (normalized grid units). The final conv is
ZERO-INITIALIZED so the warp starts at the identity. The field is added to
the identity sampling grid and applied with bilinear grid_sample to every
tensor in `imgs` (reference API: takes the pair plus a list of tensors to
warp with the same φ). Smoothness regularization is the first-difference
penalty on the offsets (reference: TV penalty Σ‖∇φ‖; L1/L2 selectable —
SURVEY §8.4(d) decide-empirically item, default l1).

`bounded_flow` optionally squashes the field through tanh·bound — a
TPU-design option that guarantees a max displacement, which lets the Pallas
halo-tile warp kernel run exactly (see ops/warp_pallas.py).
"""

from __future__ import annotations

from typing import Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from nemar_tpu.ops.norm import instance_norm_act
from nemar_tpu.ops.warp import grid_sample_multi, identity_grid

conv_init = nn.initializers.normal(stddev=0.02)


def smoothness_loss(flow: jax.Array, smooth_type: str = "l1",
                    order: int = 1) -> jax.Array:
    """Difference-based TV penalty on a (N, H, W, 2) field.

    order=1 is the reference's first-difference TV. For an AFFINE
    misalignment the flow grows linearly across the image, so its first
    differences are a constant ∝ |A| — first-order TV directly penalizes
    the field's magnitude and sets an equilibrium below the true warp
    (round-3 256² finding: cos 0.998 but 40% magnitude). order=2
    penalizes CURVATURE (second differences), which is exactly zero for
    affine fields and still regularizes deformable ones.
    """
    dy = flow[:, 1:, :, :] - flow[:, :-1, :, :]
    dx = flow[:, :, 1:, :] - flow[:, :, :-1, :]
    if order == 2:
        dy = dy[:, 1:, :, :] - dy[:, :-1, :, :]
        dx = dx[:, :, 1:, :] - dx[:, :, :-1, :]
    if smooth_type == "l1":
        return jnp.mean(jnp.abs(dy)) + jnp.mean(jnp.abs(dx))
    if smooth_type == "l2":
        return jnp.mean(jnp.square(dy)) + jnp.mean(jnp.square(dx))
    raise NotImplementedError(f"smooth type {smooth_type!r}")


class UnetSTN(nn.Module):
    in_channels: int = 6
    ngf: int = 32
    depth: int = 5
    flow_scale: float = 1.0
    smooth_type: str = "l1"
    smooth_order: int = 1
    padding_mode: str = "zeros"
    align_corners: bool = False
    warp_impl: str = "auto"
    bounded_flow: float = 0.0  # >0: tanh-bound the field (normalized units)
    multiscale: bool = False  # coarse-to-fine flow heads at each decoder level
    level_scale: float = 1.0  # damping on each head's residual field
    head_min_res: int = 0  # skip multiscale heads below this resolution
    head_impl: str = "xla"  # 'fact': (3x1)∘(1x3) factorized 2-lane heads
    # 'fused': conv-then-d2s decoder (ops/up_conv.py). Measured a WASH
    # in-step (probe r3m: 234.6 vs 233.0 ms b32; STN-only 36.6 vs 35.5) —
    # XLA already fuses the broadcast-upsample into the conv, so the 2.25x
    # MAC cut buys nothing at these shapes. Default stays the direct
    # lowering; the option is kept tested for larger decoders.
    up_impl: str = "xla"

    @nn.compact
    def predict_flow(self, a: jax.Array, b: jax.Array):
        """((N, H, W, 2) displacement field in normalized grid units,
        level-wise smoothness reg).

        With `multiscale` (--stn_multiscale), every decoder level carries
        its own ZERO-INIT flow head; coarse heads see a smooth optimization
        basin for larger displacements, fine heads refine — direct full-res
        flow regression stalls in local minima (round-1 finding; in the
        adversarial setting keep --stn_lr modest, see ROADMAP.md). All heads
        zero-init, so the warp still starts exactly at the identity.
        """
        n, hh, ww = a.shape[0], a.shape[1], a.shape[2]
        h = jnp.concatenate([a, b], axis=-1)
        chans = [min(self.ngf * 2**i, self.ngf * 8) for i in range(self.depth)]
        skips = []
        # Explicit Conv_<k> names in creation order reproduce flax's
        # auto-naming exactly, so the manual-param fact heads below keep
        # the tree checkpoint-compatible across head_impl settings.
        cidx = 0
        # Encoder: k3 s2 p1 + IN + LeakyReLU
        for i, ch in enumerate(chans):
            h = nn.Conv(
                ch, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)),
                kernel_init=conv_init, name=f"Conv_{cidx}",
            )(h)
            cidx += 1
            h = instance_norm_act(h, act="leaky_relu")
            skips.append(h)

        def flow_head(feat):
            # level_scale damps each residual field: Adam's scale-free first
            # steps move zero-init head weights by ~lr per step, which in
            # composed multiscale heads compounds to tens of px within an
            # epoch (round-2 science); damping keeps early fields sub-pixel.
            nonlocal cidx
            name = f"Conv_{cidx}"
            cidx += 1
            if self.head_impl == "fact":
                # 2 of 128 MXU output lanes under the direct lowering —
                # the generator-head pathology at small scale. Same
                # (kx1)∘(1xk) rewrite, exact math (ops/conv_fact.py).
                from nemar_tpu.ops.conv_fact import conv_fact

                def init(key, cin):
                    return {"kernel": jnp.zeros((3, 3, cin, 2), jnp.float32),
                            "bias": jnp.zeros((2,), jnp.float32)}

                ph = self.param(name, init, feat.shape[-1])
                out = (conv_fact(feat, ph["kernel"].astype(feat.dtype), 1)
                       + ph["bias"].astype(feat.dtype))
            else:
                out = nn.Conv(
                    2, (3, 3), padding=((1, 1), (1, 1)),
                    kernel_init=nn.initializers.zeros,
                    bias_init=nn.initializers.zeros, name=name,
                )(feat)
            return self.level_scale * out

        flows = []
        # Decoder: resize+conv (TPU-friendly, no checkerboard). Integer 2x
        # nearest upsampling == repeat — a broadcast+reshape XLA lowers
        # without the gathers jax.image.resize can emit (identical values).
        for i in reversed(range(self.depth)):
            nn_, hh_, ww_, ch_ = h.shape
            out_ch = chans[i - 1] if i > 0 else self.ngf
            # 'fused_small': fused only where the direct lowering is
            # lane-starved (4*out_ch still fits the 128 MXU lanes — the
            # shallow 32-ch levels r3p measured at 3x their FLOP floor);
            # deep levels keep XLA's native lowering, which is already
            # full-lane there and avoids the d2s interleave traffic.
            use_fused = self.up_impl == "fused" or (
                self.up_impl == "fused_small" and 4 * out_ch <= 128)
            if use_fused:
                # Exact conv-then-depth-to-space rewrite: 2.25x fewer MACs,
                # 4x output lanes, no materialized upsampled activation
                # (ops/up_conv.py). Same {kernel,bias} tree path as the
                # nn.Conv it replaces -> checkpoint-compatible.
                from nemar_tpu.ops.attic.up_conv import up2_conv3

                name = f"Conv_{cidx}"
                cidx += 1

                def init(key, cin=ch_, cout=out_ch):
                    kkey, _ = jax.random.split(key)
                    return {"kernel": conv_init(kkey, (3, 3, cin, cout),
                                                jnp.float32),
                            "bias": jnp.zeros((cout,), jnp.float32)}

                ph = self.param(name, init)
                h = up2_conv3(h, ph["kernel"].astype(h.dtype),
                              ph["bias"])
            else:
                h = jnp.broadcast_to(h[:, :, None, :, None, :],
                                     (nn_, hh_, 2, ww_, 2, ch_))
                h = h.reshape(nn_, hh_ * 2, ww_ * 2, ch_)
                h = nn.Conv(
                    out_ch, (3, 3), padding=((1, 1), (1, 1)),
                    kernel_init=conv_init, name=f"Conv_{cidx}",
                )(h)
                cidx += 1
            h = instance_norm_act(h, act="leaky_relu")
            if i > 0:
                h = jnp.concatenate([skips[i - 1], h], axis=-1)
                # head_min_res: skip heads below this resolution. The
                # ultra-coarse heads (4²/8² at depth 6) are the 256²
                # divergence mechanism (science_256_direct): their
                # photometric anchoring is averaged over huge cells (weak,
                # noisy) while Adam's scale-free steps random-walk the
                # zero-init weights, and per-level order-2 TV is nearly
                # blind to a 4² field — the composed flow blows up even in
                # a pure photometric fit.
                if self.multiscale and h.shape[1] >= self.head_min_res:
                    flows.append(flow_head(h))
        flows.append(flow_head(h))  # full-resolution head

        # Coarse-to-fine COMPOSITION of per-level fields (round-1 found that
        # SUMMED heads diverge in the adversarial setting: a coarse head's
        # update shifts every finer head's operating point additively;
        # composition instead refines the warp each level — the coarse warp
        # is applied first, finer fields are expressed in the already-
        # coarsely-aligned frame). Each level's field is smoothness-
        # penalized at its OWN resolution (level-wise TV), so coarse levels
        # pay for curvature at their scale rather than hiding it in the
        # upsampled sum.
        from nemar_tpu.ops.warp import compose_flows

        level_reg = smoothness_loss(flows[0], self.smooth_type,
                                    self.smooth_order)
        # single-head default: flows[0] is already full-res — an identity
        # resize here still lowers to real gather/weighting work
        flow = (flows[0] if flows[0].shape[1] == hh else
                jax.image.resize(flows[0], (n, hh, ww, 2), method="bilinear"))
        for f in flows[1:]:
            level_reg = level_reg + smoothness_loss(
                f, self.smooth_type, self.smooth_order)
            f_full = (
                f if f.shape[1] == hh
                else jax.image.resize(f, (n, hh, ww, 2), method="bilinear")
            )
            # coarse-so-far applied FIRST (inner), this level refines (outer)
            flow = compose_flows(f_full, flow, self.align_corners)
        level_reg = level_reg / len(flows)
        flow = flow * self.flow_scale
        if self.bounded_flow > 0:
            flow = jnp.tanh(flow) * self.bounded_flow
        return flow, level_reg

    def __call__(
        self, a: jax.Array, b: jax.Array, imgs: Sequence[jax.Array] = (),
        n_grad_imgs: int = -1,
    ) -> Tuple[Tuple[jax.Array, ...], jax.Array, dict]:
        """Returns (warped imgs, smoothness reg, aux dict with 'flow')."""
        flow, level_reg = self.predict_flow(a, b)
        n, h, w, _ = flow.shape
        # Grid coordinates stay fp32 even under bf16 compute: bf16 coords
        # quantize to ~1 px at the far edge of a 256-wide image.
        grid = (
            identity_grid(h, w, self.align_corners, jnp.float32)[None]
            + flow.astype(jnp.float32)
        )
        # ONE grid_sample over the channel-concatenated images: every tensor
        # shares the same grid, so the (identical) bilinear tap construction
        # is paid once instead of per image.
        warped = (
            grid_sample_multi(
                imgs, grid, mode="bilinear", padding_mode=self.padding_mode,
                align_corners=self.align_corners, impl=self.warp_impl,
                n_grad_imgs=n_grad_imgs,
            )
            if imgs else ()
        )
        # multiscale: level-wise TV (each head at its own resolution);
        # single-head: TV of the final field (identical to round 1)
        reg = (level_reg if self.multiscale else
               smoothness_loss(flow, self.smooth_type, self.smooth_order))
        return warped, reg, {"flow": flow, "grid": grid}
