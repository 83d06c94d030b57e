"""Network zoo: generators, discriminators, GAN objectives, LR schedules.

TPU-native rebuild of the reference's models/networks.py (SURVEY.md §3.1:
ResnetGenerator, ResnetBlock, UnetGenerator, NLayerDiscriminator,
PixelDiscriminator, GANLoss, get_scheduler, init_weights/init_net, define_G,
define_D). Architectures match the reference spec:

  * ResnetGenerator: c7s1-64, d128, d256, n×ResBlock, u128, u64, c7s1-out;
    reflect padding, InstanceNorm (affine=False, eps=1e-5) + ReLU, Tanh head.
  * NLayerDiscriminator: 70×70 PatchGAN — C64-C128-C256-C512 with k=4 and
    strides 2,2,2,1,1, LeakyReLU(0.2), no norm on the first layer
    (receptive field 70 verified analytically — SURVEY.md A.5).
  * weight init: normal(std=0.02) (reference init_weights 'normal', gain .02).

Everything is flax.linen over NHWC (XLA:TPU native layout). Instance norm +
activation go through nemar_tpu.ops.norm so the fused Pallas kernel can be
swapped in on TPU.

Not translated: torch's nn.DataParallel wrapping in init_net — parallelism
here is jit + NamedSharding over a device mesh (nemar_tpu.parallel).
"""

from __future__ import annotations

import math
from typing import Any, Callable, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from nemar_tpu.ops.norm import instance_norm_act

# Reference init: normal(mean=0, std=0.02) on conv kernels, zeros bias.
conv_init = nn.initializers.normal(stddev=0.02)


def _make_init(init_type: str, init_gain: float):
    """Mirror of reference init_weights: normal/xavier/kaiming/orthogonal."""
    if init_type == "normal":
        return nn.initializers.normal(stddev=init_gain)
    if init_type == "xavier":
        return nn.initializers.variance_scaling(
            init_gain**2 * 2.0, "fan_avg", "truncated_normal"
        )
    if init_type == "kaiming":
        return nn.initializers.variance_scaling(2.0, "fan_in", "normal")
    if init_type == "orthogonal":
        return nn.initializers.orthogonal(scale=init_gain)
    raise NotImplementedError(f"init type {init_type!r}")


def _norm_act(x, norm: str, act: str, norm_impl: str = "xla", train: bool = True):
    if norm == "instance":
        return instance_norm_act(x, act=act, impl=norm_impl)
    if norm == "none":
        if act == "relu":
            return jax.nn.relu(x)
        if act == "leaky_relu":
            return jax.nn.leaky_relu(x, 0.2)
        return x
    if norm == "batch":
        # The template supports batchnorm; NeMAR uses instance norm. We keep
        # a stateless batch-instance hybrid out of scope and treat 'batch'
        # as per-batch normalization without running stats (train mode).
        mean = jnp.mean(x, axis=(0, 1, 2), keepdims=True)
        var = jnp.mean(jnp.square(x - mean), axis=(0, 1, 2), keepdims=True)
        x = (x - mean) * jax.lax.rsqrt(var + 1e-5)
        return _norm_act(x, "none", act)
    raise NotImplementedError(f"norm {norm!r}")


def reflect_pad(x: jax.Array, pad: int) -> jax.Array:
    """ReflectionPad2d equivalent, NHWC (XLA folds this into the conv)."""
    return jnp.pad(x, ((0, 0), (pad, pad), (pad, pad), (0, 0)), mode="reflect")


class ResnetBlock(nn.Module):
    """Reflect-pad conv block with skip (reference ResnetBlock).

    block_impl='pallas' routes eligible shapes (instance norm, no dropout,
    H/W%8==0, C%128==0) to the fused Pallas kernel (ops/conv_fused.py):
    both convs + IN stats + ReLU + skip in one VMEM-resident program.
    Parameters are declared with the SAME tree paths/shapes as the XLA
    branch (Conv_0/Conv_1 {kernel, bias}) so checkpoints interchange; the
    bias is mathematically inert through IN either way.
    """

    dim: int
    norm: str = "instance"
    use_dropout: bool = False
    norm_impl: str = "xla"
    kernel_init: Callable = conv_init
    block_impl: str = "xla"

    @nn.compact
    def __call__(self, x, train: bool = True):
        use_fused = (
            self.block_impl in ("pallas", "pallas_all")
            and self.norm == "instance"
            and not self.use_dropout
        )
        if use_fused:
            from nemar_tpu.ops.conv_fused import (
                block_kernel_supported, fused_resblock,
            )

            ki = self.kernel_init

            def conv_params(key, c):
                kk, kb = jax.random.split(key)
                return {"kernel": ki(kk, (3, 3, c, c), jnp.float32),
                        "bias": jnp.zeros((c,), jnp.float32)}

            p1 = self.param("Conv_0", conv_params, self.dim)
            p2 = self.param("Conv_1", conv_params, self.dim)
            w1 = p1["kernel"].astype(x.dtype)
            w2 = p2["kernel"].astype(x.dtype)
            if block_kernel_supported(x.shape):
                return fused_resblock(x, w1, w2)
            # ineligible shape: same math/params through XLA
            from nemar_tpu.ops.conv_fused import resblock_reference

            return resblock_reference(x, w1, w2)
        h = reflect_pad(x, 1)
        h = nn.Conv(self.dim, (3, 3), padding="VALID", kernel_init=self.kernel_init)(h)
        h = _norm_act(h, self.norm, "relu", self.norm_impl)
        if self.use_dropout:
            h = nn.Dropout(0.5, deterministic=not train)(h)
        h = reflect_pad(h, 1)
        h = nn.Conv(self.dim, (3, 3), padding="VALID", kernel_init=self.kernel_init)(h)
        h = _norm_act(h, self.norm, "none", self.norm_impl)
        return x + h


class ResnetGenerator(nn.Module):
    """Johnson-style resnet generator (reference ResnetGenerator ≈L300s)."""

    output_nc: int = 3
    ngf: int = 64
    n_blocks: int = 9
    n_downsampling: int = 2
    norm: str = "instance"
    use_dropout: bool = False
    norm_impl: str = "xla"
    kernel_init: Callable = conv_init
    use_remat: bool = False  # jax.checkpoint each ResnetBlock (512^2 configs)
    block_impl: str = "xla"  # 'pallas': fused trunk | 'pallas_all': +decoder
    c7_impl: str = "xla"  # 'xla' | 's2d': blocked rewrite of the c7s1 convs

    def _c7_params(self, name, cin, cout):
        """{kernel, bias} tree under `name` — identical to what nn.Conv
        would create, so checkpoints swap freely between c7 impls."""
        ki = self.kernel_init

        def init(key, cin, cout):
            kk, _ = jax.random.split(key)
            return {"kernel": ki(kk, (7, 7, cin, cout), jnp.float32),
                    "bias": jnp.zeros((cout,), jnp.float32)}

        return self.param(name, init, cin, cout)

    @nn.compact
    def __call__(self, x, train: bool = True):
        ki = self.kernel_init
        # s2d (ops/conv_s2d.py): exact blocked rewrite of the two c7s1
        # convs — the head's 3-lane output (and the encoder conv's 3-lane
        # backward-d/dinput) run at ~3% MFU under the direct lowering.
        from nemar_tpu.ops.conv_s2d import conv7_s2d, conv7_s2d_supported

        # Per-conv routing (probe r3g/r3j): the ENCODER c7s1 wins with the
        # s2d blocking (13.9 vs 19.3 ms isolated); the HEAD is a wash under
        # s2d but wins with the FLOP-preserving (7x1)∘(1x7) factorization
        # (ops/conv_fact.py). 'auto' picks the best known per conv.
        use_s2d = (self.c7_impl in ("s2d", "auto", "factg", "roll")
                   and conv7_s2d_supported(x.shape))
        head_impl = {"auto": "fact"}.get(self.c7_impl, self.c7_impl)
        # Explicit names pin the auto-naming layout (Conv_0..Conv_3) so the
        # manual-param branches below stay checkpoint-compatible.
        if use_s2d:
            p0 = self._c7_params("Conv_0", x.shape[-1], self.ngf)
            h = (conv7_s2d(x, p0["kernel"].astype(x.dtype))
                 + p0["bias"].astype(x.dtype))
        else:
            h = reflect_pad(x, 3)
            h = nn.Conv(self.ngf, (7, 7), padding="VALID", kernel_init=ki,
                        name="Conv_0")(h)
        h = _norm_act(h, self.norm, "relu", self.norm_impl)
        for i in range(self.n_downsampling):
            mult = 2**i
            h = nn.Conv(
                self.ngf * mult * 2, (3, 3), strides=(2, 2),
                padding=((1, 1), (1, 1)), kernel_init=ki,
                name=f"Conv_{i + 1}",
            )(h)
            h = _norm_act(h, self.norm, "relu", self.norm_impl)
        block_cls = (
            nn.remat(ResnetBlock, static_argnums=(2,))
            if self.use_remat else ResnetBlock
        )
        for _ in range(self.n_blocks):
            h = block_cls(
                self.ngf * 2**self.n_downsampling, self.norm, self.use_dropout,
                self.norm_impl, ki, self.block_impl,
            )(h, train)
        # 'pallas' fuses the TRUNK only: the fused convT decoder measured
        # SLOWER than XLA's lowering standalone (12.1 vs 7.7 ms fwd+bwd at
        # the 64^2 C256->128 stage, probe r3d — small per-sample matmuls
        # underfill the MXU); 'pallas_all' keeps it for future tuning.
        use_fused_dec = (
            self.block_impl == "pallas_all" and self.norm == "instance"
        )
        for i in range(self.n_downsampling):
            mult = 2 ** (self.n_downsampling - i)
            ch = self.ngf * mult // 2
            if use_fused_dec:
                from nemar_tpu.ops.attic.convt_fused import (
                    convt_kernel_supported, fused_convt_in,
                )

                def ct_params(key, cin, cout):
                    kk, kb = jax.random.split(key)
                    return {"kernel": ki(kk, (3, 3, cin, cout), jnp.float32),
                            "bias": jnp.zeros((cout,), jnp.float32)}

                p = self.param(f"ConvTranspose_{i}", ct_params, h.shape[-1], ch)
                wk = p["kernel"].astype(h.dtype)
                if convt_kernel_supported(h.shape, h.dtype):
                    h = fused_convt_in(h, wk)
                else:
                    from nemar_tpu.ops.attic.convt_fused import convt_in_reference

                    h = convt_in_reference(h, wk)
            else:
                h = nn.ConvTranspose(
                    ch, (3, 3), strides=(2, 2), padding="SAME",
                    kernel_init=ki,
                )(h)
                h = _norm_act(h, self.norm, "relu", self.norm_impl)
        head_name = f"Conv_{1 + self.n_downsampling}"
        from nemar_tpu.ops.conv_head_roll import (
            conv_head_roll, head_roll_supported,
        )

        if (head_impl == "roll"
                and head_roll_supported(h.shape, self.output_nc)):
            # Roll-based Pallas head (ops/conv_head_roll.py): one dot per
            # dx streaming the input ONCE, dx as f32 lane rolls, dy
            # folded into M — 29M streamed values/image vs fact's 60M
            # (probe r4a ladder). Measured r4e: a TIE with fact (b48
            # fwd+bwd 15.95 vs 15.93 ms) — 'auto' keeps fact; this stays
            # a selectable option (verdict in the kernel docstring).
            ph = self._c7_params(head_name, h.shape[-1], self.output_nc)
            h = (conv_head_roll(h, ph["kernel"].astype(h.dtype))
                 + ph["bias"].astype(h.dtype))
        elif (head_impl in ("s2d", "fact", "factg")
                and conv7_s2d_supported(h.shape)):
            from nemar_tpu.ops.conv_fact import conv7_fact, conv7_fact_g

            head_fn = {"fact": conv7_fact, "factg": conv7_fact_g,
                       "s2d": conv7_s2d}[head_impl]
            ph = self._c7_params(head_name, h.shape[-1], self.output_nc)
            h = (head_fn(h, ph["kernel"].astype(h.dtype))
                 + ph["bias"].astype(h.dtype))
        elif self.block_impl == "pallas_all" and self.output_nc <= 8:
            # 7x7 head to output_nc channels: ~3% MFU under the direct
            # lowering (3/128 output lanes). Every rewrite measured WORSE
            # (probe r3e: XLA scatter form 52 ms, flat-lane Pallas kernel
            # 43 ms vs 21 ms direct — the 49 misaligned lane-slice
            # relayouts dominate), so the kernel ships under 'pallas_all'
            # only, with the direct conv as the production path. Params
            # keep the Conv_3 {kernel, bias} tree; this bias is live.
            from nemar_tpu.ops.attic.conv_head import conv_head

            def head_params(key, cin, cout):
                kk, kb = jax.random.split(key)
                return {"kernel": ki(kk, (7, 7, cin, cout), jnp.float32),
                        "bias": jnp.zeros((cout,), jnp.float32)}

            ph = self.param(head_name, head_params, h.shape[-1],
                            self.output_nc)
            h = conv_head(h, ph["kernel"].astype(h.dtype))
            h = h + ph["bias"].astype(h.dtype)
        else:
            h = reflect_pad(h, 3)
            h = nn.Conv(self.output_nc, (7, 7), padding="VALID",
                        kernel_init=ki, name=head_name)(h)
        return jnp.tanh(h)


class UnetGenerator(nn.Module):
    """UNet generator (reference UnetGenerator/UnetSkipConnectionBlock).

    num_downs=8 reaches 1×1 at 256²; inner layers capped at ngf*8 channels,
    matching the reference construction.
    """

    output_nc: int = 3
    num_downs: int = 8
    ngf: int = 64
    norm: str = "instance"
    use_dropout: bool = False
    norm_impl: str = "xla"
    kernel_init: Callable = conv_init

    @nn.compact
    def __call__(self, x, train: bool = True):
        ki = self.kernel_init
        need = 2**self.num_downs
        if x.shape[1] % need or x.shape[2] % need or min(x.shape[1], x.shape[2]) < need:
            raise ValueError(
                f"UnetGenerator with num_downs={self.num_downs} needs input "
                f"H/W divisible by and >= {need}, got {x.shape[1]}x{x.shape[2]} "
                f"(use --netG unet_128/unet_256 to match --crop_size)"
            )
        chans = [
            min(self.ngf * 2**i, self.ngf * 8) for i in range(self.num_downs)
        ]
        skips = []
        h = x
        # Encoder: conv k4 s2 p1; LeakyReLU before each conv except the first;
        # norm on all but first and innermost (reference layering).
        for i, ch in enumerate(chans):
            if i > 0:
                h = jax.nn.leaky_relu(h, 0.2)
            h = nn.Conv(
                ch, (4, 4), strides=(2, 2), padding=((1, 1), (1, 1)),
                kernel_init=ki,
            )(h)
            if 0 < i < self.num_downs - 1:
                h = _norm_act(h, self.norm, "none", self.norm_impl)
            skips.append(h)
        # Decoder: relu + convT k4 s2 p1 + norm, concat skip.
        for i in reversed(range(self.num_downs)):
            out_ch = self.output_nc if i == 0 else chans[max(i - 1, 0)]
            h = jax.nn.relu(h)
            h = nn.ConvTranspose(
                out_ch, (4, 4), strides=(2, 2), padding="SAME", kernel_init=ki
            )(h)
            if i > 0:
                h = _norm_act(h, self.norm, "none", self.norm_impl)
                if self.use_dropout and i >= self.num_downs - 3:
                    h = nn.Dropout(0.5, deterministic=not train)(h)
                h = jnp.concatenate([skips[i - 1], h], axis=-1)
        return jnp.tanh(h)


class NLayerDiscriminator(nn.Module):
    """70×70 PatchGAN (reference NLayerDiscriminator ≈L500s)."""

    ndf: int = 64
    n_layers: int = 3
    norm: str = "instance"
    norm_impl: str = "xla"
    kernel_init: Callable = conv_init

    @nn.compact
    def __call__(self, x, train: bool = True):
        ki = self.kernel_init
        h = nn.Conv(
            self.ndf, (4, 4), strides=(2, 2), padding=((1, 1), (1, 1)),
            kernel_init=ki,
        )(x)
        h = jax.nn.leaky_relu(h, 0.2)  # no norm on the first layer
        nf_mult = 1
        for n in range(1, self.n_layers):
            nf_mult = min(2**n, 8)
            h = nn.Conv(
                self.ndf * nf_mult, (4, 4), strides=(2, 2),
                padding=((1, 1), (1, 1)), kernel_init=ki,
            )(h)
            h = _norm_act(h, self.norm, "leaky_relu", self.norm_impl)
        nf_mult = min(2**self.n_layers, 8)
        h = nn.Conv(
            self.ndf * nf_mult, (4, 4), strides=(1, 1),
            padding=((1, 1), (1, 1)), kernel_init=ki,
        )(h)
        h = _norm_act(h, self.norm, "leaky_relu", self.norm_impl)
        return nn.Conv(
            1, (4, 4), strides=(1, 1), padding=((1, 1), (1, 1)), kernel_init=ki
        )(h)


class PixelDiscriminator(nn.Module):
    """1×1 PatchGAN (reference PixelDiscriminator)."""

    ndf: int = 64
    norm: str = "instance"
    norm_impl: str = "xla"
    kernel_init: Callable = conv_init

    @nn.compact
    def __call__(self, x, train: bool = True):
        ki = self.kernel_init
        h = nn.Conv(self.ndf, (1, 1), kernel_init=ki)(x)
        h = jax.nn.leaky_relu(h, 0.2)
        h = nn.Conv(self.ndf * 2, (1, 1), kernel_init=ki)(h)
        h = _norm_act(h, self.norm, "leaky_relu", self.norm_impl)
        return nn.Conv(1, (1, 1), kernel_init=ki)(h)


# ---------------------------------------------------------------------------
# Factories (reference define_G / define_D)
# ---------------------------------------------------------------------------


def define_G(
    input_nc: int,
    output_nc: int,
    ngf: int,
    netG: str,
    norm: str = "instance",
    use_dropout: bool = False,
    init_type: str = "normal",
    init_gain: float = 0.02,
    norm_impl: str = "xla",
    use_remat: bool = False,
    block_impl: str = "xla",
    c7_impl: str = "xla",
) -> nn.Module:
    ki = _make_init(init_type, init_gain)
    if netG == "resnet_9blocks":
        return ResnetGenerator(output_nc, ngf, 9, 2, norm, use_dropout,
                               norm_impl, ki, use_remat, block_impl, c7_impl)
    if netG == "resnet_6blocks":
        return ResnetGenerator(output_nc, ngf, 6, 2, norm, use_dropout,
                               norm_impl, ki, use_remat, block_impl, c7_impl)
    if netG == "unet_128":
        return UnetGenerator(output_nc, 7, ngf, norm, use_dropout, norm_impl, ki)
    if netG == "unet_256":
        return UnetGenerator(output_nc, 8, ngf, norm, use_dropout, norm_impl, ki)
    raise NotImplementedError(f"Generator model name [{netG}] is not recognized")


def define_D(
    input_nc: int,
    ndf: int,
    netD: str,
    n_layers_D: int = 3,
    norm: str = "instance",
    init_type: str = "normal",
    init_gain: float = 0.02,
    norm_impl: str = "xla",
) -> nn.Module:
    ki = _make_init(init_type, init_gain)
    if netD == "basic":
        return NLayerDiscriminator(ndf, 3, norm, norm_impl, ki)
    if netD == "n_layers":
        return NLayerDiscriminator(ndf, n_layers_D, norm, norm_impl, ki)
    if netD == "pixel":
        return PixelDiscriminator(ndf, norm, norm_impl, ki)
    raise NotImplementedError(f"Discriminator model name [{netD}] is not recognized")


# ---------------------------------------------------------------------------
# GAN objectives (reference GANLoss + cal_gradient_penalty)
# ---------------------------------------------------------------------------


def gan_loss(pred: jax.Array, target_is_real: bool, gan_mode: str) -> jax.Array:
    """Reference GANLoss: lsgan=MSE vs 1/0, vanilla=BCE-with-logits, wgangp."""
    if gan_mode == "lsgan":
        target = 1.0 if target_is_real else 0.0
        return jnp.mean(jnp.square(pred - target))
    if gan_mode == "vanilla":
        target = jnp.ones_like(pred) if target_is_real else jnp.zeros_like(pred)
        return jnp.mean(
            jnp.maximum(pred, 0) - pred * target + jnp.log1p(jnp.exp(-jnp.abs(pred)))
        )
    if gan_mode == "wgangp":
        return -jnp.mean(pred) if target_is_real else jnp.mean(pred)
    raise NotImplementedError(f"gan mode {gan_mode!r}")


def cal_gradient_penalty(
    disc_apply: Callable[[Any, jax.Array], jax.Array],
    params_d: Any,
    real: jax.Array,
    fake: jax.Array,
    rng: jax.Array,
    constant: float = 1.0,
    lambda_gp: float = 10.0,
    gp_type: str = "mixed",
) -> jax.Array:
    """WGAN-GP gradient penalty (reference cal_gradient_penalty)."""
    if gp_type == "real":
        interp = real
    elif gp_type == "fake":
        interp = fake
    elif gp_type == "mixed":
        alpha = jax.random.uniform(rng, (real.shape[0], 1, 1, 1), real.dtype)
        interp = alpha * real + (1.0 - alpha) * fake
    else:
        raise NotImplementedError(gp_type)

    def d_sum(x):
        return jnp.sum(disc_apply(params_d, x))

    grads = jax.grad(d_sum)(interp)
    gnorm = jnp.sqrt(
        jnp.sum(jnp.square(grads.reshape(real.shape[0], -1)), axis=1) + 1e-16
    )
    return jnp.mean(jnp.square(gnorm - constant)) * lambda_gp


# ---------------------------------------------------------------------------
# LR schedules (reference get_scheduler) — per-EPOCH multipliers
# ---------------------------------------------------------------------------


def get_lr_multiplier_fn(opt) -> Callable[[int, float], float]:
    """Returns fn(epoch, metric) -> lr multiplier, stepped once per epoch.

    `epoch` is the ABSOLUTE epoch number (starts at epoch_count). The
    reference's LambdaLR receives a 0-based scheduler step s with
    mult = 1 - max(0, s + epoch_count - n_epochs) / (n_epochs_decay + 1);
    since s = epoch - epoch_count + 1, that is equivalent (for fresh AND
    resumed runs alike) to the absolute-epoch form below — adding
    epoch_count again would make resumed runs decay epoch_count-1 epochs
    early.
    """
    policy = getattr(opt, "lr_policy", "linear")
    if policy == "linear":
        n_epochs = getattr(opt, "n_epochs", 100)
        n_decay = getattr(opt, "n_epochs_decay", 100)

        def fn(epoch, metric=None):
            return 1.0 - max(0, epoch + 1 - n_epochs) / float(n_decay + 1)

        return fn
    if policy == "step":
        iters = getattr(opt, "lr_decay_iters", 50)

        def fn(epoch, metric=None):
            return 0.1 ** (epoch // iters)

        return fn
    if policy == "cosine":
        total = getattr(opt, "n_epochs", 100) + getattr(opt, "n_epochs_decay", 100)

        def fn(epoch, metric=None):
            return 0.5 * (1.0 + math.cos(math.pi * epoch / total))

        return fn
    if policy == "plateau":
        # ReduceLROnPlateau(mode='min', factor=0.2, threshold=0.01, patience=5)
        state = {"best": float("inf"), "bad": 0, "mult": 1.0}

        def fn(epoch, metric=None):
            if metric is not None:
                if metric < state["best"] * (1 - 0.01):
                    state["best"] = metric
                    state["bad"] = 0
                else:
                    state["bad"] += 1
                    if state["bad"] > 5:
                        state["mult"] *= 0.2
                        state["bad"] = 0
            return state["mult"]

        # exposed so BaseModel can persist/restore the controller across
        # --continue_train (round-3 verdict: {best,bad,mult} lived only in
        # this closure and resumed runs silently restarted the schedule)
        fn.state = state
        return fn
    raise NotImplementedError(f"learning rate policy [{policy}] is not implemented")
