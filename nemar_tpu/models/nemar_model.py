"""NeMAR model: geometry-preserving registration GAN (reference
models/nemar_model.py — SURVEY.md §3.1/§4.2).

Training couples three networks (SURVEY.md §1):
  T (netG)   ResNet generator translating modality A -> B's appearance,
  R (netR)   STN (affine | unet deformable) predicting the transformation
             aligning A to B,
  D (netD)   70x70 PatchGAN judging translated-and-registered fakes.

The geometry-preserving trick: φ is estimated once from the input pair and
applied in BOTH orders — warp(T(a), φ) and T(warp(a, φ)) — and both must
reconstruct b (L1), forcing all geometry change into R.

Loss (LSGAN form, SURVEY.md §1):
  L_D = ½ E[(D(b)−1)²] + ½ E[D(fake)²],  fake = warp(T(a), φ)
  L_G = λ_GAN·E[(D(fake)−1)²]
      + λ_recon·(‖warp(T(a),φ) − b‖₁ + ‖T(warp(a,φ)) − b‖₁)
      + λ_smooth·TV(φ)            (affine STN: ‖Δθ‖² identity reg instead)

TPU-native structure (not a port of the torch step):
  * ONE jitted, donated train step runs the reference's alternating
    D-then-G update: forward once (detached) for D, adam-update D, then
    value_and_grad through G+R against the UPDATED frozen D — the whole
    SURVEY §4.2 tree compiles to a single XLA program.
  * optional lax.scan fusion of many steps per device dispatch
    (--steps_per_execution) — kills host-dispatch latency.
  * optional bf16 compute with fp32 master params (--bf16).
  * batch sharded over the ('data','spatial') mesh; params replicated; XLA
    inserts the gradient psum (no DataParallel translation).
"""

from __future__ import annotations

import functools
from typing import Any, Optional

import flax.struct
import jax
import jax.numpy as jnp
import numpy as np
import optax

from nemar_tpu.models import networks
from nemar_tpu.models.base_model import BaseModel
from nemar_tpu.models.stn import define_stn
from nemar_tpu.utils.image_pool import PoolState, init_pool, query_pool


class NemarState(flax.struct.PyTreeNode):
    step: jax.Array
    params_G: Any
    params_D: Any
    params_R: Any
    opt_G: Any  # over {'G': params_G, 'R': params_R}
    opt_D: Any
    rng: jax.Array
    pool: Optional[PoolState]
    # EMA shadows of G and R (None unless --ema_decay > 0); the reference has
    # no EMA — standard GAN-quality extra, used at test time via --use_ema.
    ema: Optional[Any] = None


class NEMARModel(BaseModel):
    @staticmethod
    def modify_commandline_options(parser, is_train=True):
        """Reference flag surface: --stn_type and the λ weights."""
        parser.set_defaults(netG="resnet_6blocks", no_dropout=True, pool_size=0,
                            input_nc=1, output_nc=3)
        parser.add_argument("--stn_type", type=str, default="unet",
                            help="spatial transformer type [affine | unet]")
        parser.add_argument("--stn_ngf", type=int, default=32,
                            help="# filters in the STN's first conv layer")
        parser.add_argument("--stn_depth", type=int, default=5,
                            help="down/up levels in the UNet STN")
        parser.add_argument("--stn_flow_scale", type=float, default=1.0,
                            help="multiplier on the predicted flow field")
        parser.add_argument("--stn_affine_head", type=str, default="flatten",
                            choices=["flatten", "gap"],
                            help="affine STN head: FC over the spatial "
                                 "feature map (reference layout; preserves "
                                 "the phase a translation estimate needs) "
                                 "vs global-average-pool (round-2 arch — "
                                 "near-blind to translation without border "
                                 "cues)")
        parser.add_argument("--stn_smooth_type", type=str, default="l1",
                            help="first-difference penalty type [l1 | l2]")
        parser.add_argument("--stn_smooth_order", type=int, default=1,
                            choices=(1, 2),
                            help="TV difference order; 2 penalizes curvature "
                                 "only — zero for affine fields, so it does "
                                 "not fight field magnitude (round-3 256² "
                                 "science: order-1 TV under-scales affine "
                                 "flow to ~40%% at cos 0.998)")
        parser.add_argument("--stn_head_impl", type=str, default="xla",
                            choices=("xla", "fact"),
                            help="UNet-STN flow heads: 'fact' = exact "
                                 "(3x1)∘(1x3) factorization — the 2-channel "
                                 "heads use 2 of 128 MXU output lanes under "
                                 "the direct lowering (ops/conv_fact.py)")
        parser.add_argument("--stn_up_impl", type=str, default="xla",
                            choices=("xla", "fused", "fused_small"),
                            help="UNet-STN decoder upsample+conv: 'fused' = "
                                 "exact conv-then-depth-to-space rewrite "
                                 "(2.25x fewer MACs — ops/up_conv.py), but "
                                 "measured a wash in-step (probe r3m: XLA "
                                 "already fuses the broadcast upsample into "
                                 "the conv); 'xla' = direct lowering "
                                 "(default)")
        parser.add_argument("--stn_padding_mode", type=str, default="zeros",
                            help="grid_sample padding [zeros | border | reflection]")
        parser.add_argument("--stn_bounded_flow", type=float, default=0.0,
                            help=">0: tanh-bound flow (normalized units); "
                                 "enables the exact Pallas halo warp kernel")
        parser.add_argument("--stn_field_source", type=str, default="pair",
                            help="predict phi from [pair | fake] "
                                 "(real_A,real_B) vs (fake_B,real_B); SURVEY §8.4(b)")
        parser.add_argument("--stn_align_corners", action="store_true",
                            help="align_corners=True warp semantics (SURVEY §8.4(a))")
        parser.add_argument("--stn_level_scale", type=float, default=1.0,
                            help="damping multiplier on each multiscale "
                                 "head's residual field (0.25 keeps early "
                                 "fields sub-pixel)")
        parser.add_argument("--stn_head_min_res", type=int, default=0,
                            help="skip multiscale flow heads below this "
                                 "feature resolution: ultra-coarse heads "
                                 "(4²/8² at 256², stn_depth 6) random-walk "
                                 "under Adam with weak photometric "
                                 "anchoring and diverge even in a direct "
                                 "fit (science_256_direct)")
        parser.add_argument("--g_batch", action="store_true",
                            help="STN-first forward with ONE batched G pass "
                                 "at 2N (identical math; measured ~10% "
                                 "slower on TPU because the second warp "
                                 "re-pays tap construction — kept for "
                                 "future kernels/hardware)")
        parser.add_argument("--stn_multiscale", action="store_true",
                            help="coarse-to-fine flow heads at every decoder "
                                 "level (helps pure-registration convergence; "
                                 "needs a tame --stn_lr in the adversarial "
                                 "setting — see ROADMAP.md)")
        if is_train:
            parser.add_argument("--lambda_GAN", type=float, default=1.0,
                                help="weight of the adversarial term")
            parser.add_argument("--lambda_recon", type=float, default=100.0,
                                help="weight of the bidirectional L1 reconstruction")
            parser.add_argument("--lambda_smooth", type=float, default=10.0,
                                help="weight of the smoothness/identity regularizer")
            parser.add_argument("--stn_lr", type=float, default=None,
                                help="separate lr for the STN (default: --lr)")
            parser.add_argument("--stn_beta1", type=float, default=None,
                                help="separate Adam beta1 for the STN "
                                     "(default: --beta1; flow regression "
                                     "prefers the standard 0.9)")
            parser.add_argument("--stn_ramp_epochs", type=int, default=0,
                                help="linearly ramp R's effective lr from 0 "
                                     "over this many epochs after the "
                                     "warm-up (tames Adam's scale-free "
                                     "first steps on the zero-init heads)")
            parser.add_argument("--stn_grad_clip", type=float, default=0.0,
                                help=">0: clip R's gradient global norm")
            parser.add_argument("--stn_warmup_epochs", type=int, default=0,
                                help="epochs with R FROZEN while G learns the "
                                     "appearance mapping: until G(a) looks "
                                     "like modality B, the photometric flow "
                                     "gradient is noise and Adam blows the "
                                     "zero-init heads up (round-2 science)")
            parser.add_argument("--gan_warmup_epochs", type=int, default=0,
                                help="epochs of pure recon+smooth before GAN "
                                     "gradients reach G (R warm-up; prevents "
                                     "the generator absorbing the geometry "
                                     "early — ROADMAP round-2)")
            parser.add_argument("--gan_ramp_epochs", type=int, default=0,
                                help="epochs to linearly ramp lambda_GAN "
                                     "back in after the warm-up")
            parser.add_argument("--border_mask", action="store_true",
                                help="mask the recon L1 by the warp validity "
                                     "region (out-of-view borders give false "
                                     "photometric gradients)")
            parser.add_argument("--recon_pyramid", type=int, default=0,
                                help=">0: add K avg-pooled octaves to the "
                                     "recon L1 (coarse octaves give the flow "
                                     "a wide photometric basin — px-scale "
                                     "L1 alone is blind past ~1 px)")
            parser.add_argument("--freeze_g", action="store_true",
                                help="freeze G and D; only R trains "
                                     "(registration refinement phase — "
                                     "pair with --continue_train after a "
                                     "joint run, or use to probe R against "
                                     "a fixed translator)")
            parser.add_argument("--grad_accum", type=int, default=1,
                                help="microbatches per optimizer step; "
                                     "activation memory scales 1/N with "
                                     "IDENTICAL math (per-sample instance "
                                     "norm + mean losses) — fits 512^2 "
                                     "batch 32 on one chip")
            parser.add_argument("--ema_decay", type=float, default=0.0,
                                help=">0: keep EMA shadows of G and R "
                                     "(e.g. 0.999); evaluate with --use_ema")
        else:
            parser.add_argument("--use_ema", action="store_true",
                                help="load the EMA shadows of G and R")
        return parser

    def __init__(self, opt):
        super().__init__(opt)
        self.loss_names = ["D", "D_real", "D_fake", "G_GAN", "G_recon", "G_smooth", "G"]
        self.visual_names = [
            "real_A", "fake_B", "reg_fakeB", "warped_A", "fake_B2", "real_B"
        ]
        self.model_names = ["G", "D", "R"]

        norm_impl = getattr(opt, "norm_impl", "xla")
        self.netG = networks.define_G(
            opt.input_nc, opt.output_nc, opt.ngf, opt.netG, opt.norm,
            not opt.no_dropout, opt.init_type, opt.init_gain, norm_impl,
            getattr(opt, "remat", False),
            getattr(opt, "block_impl", "xla"),
            getattr(opt, "c7_impl", "xla"),
        )
        self.netD = networks.define_D(
            opt.output_nc, opt.ndf, opt.netD, opt.n_layers_D, opt.norm,
            opt.init_type, opt.init_gain, norm_impl,
        )
        self.netR = define_stn(opt, opt.stn_type)

        self.gan_mode = getattr(opt, "gan_mode", "lsgan")
        self.lambda_GAN = getattr(opt, "lambda_GAN", 1.0)
        self.lambda_recon = getattr(opt, "lambda_recon", 100.0)
        self.lambda_smooth = getattr(opt, "lambda_smooth", 10.0)
        self.field_source = getattr(opt, "stn_field_source", "pair")
        self.pool_size = getattr(opt, "pool_size", 0)
        self.bf16 = getattr(opt, "bf16", False)
        beta1 = getattr(opt, "beta1", 0.5)
        stn_beta1 = getattr(opt, "stn_beta1", None)
        from nemar_tpu.models.optim import make_adam

        self.opt_split = getattr(opt, "opt_split", False)
        fused_opt = getattr(opt, "opt_fused", False) or self.opt_split
        self.tx = make_adam(beta1, fused=fused_opt)
        self.tx_R = make_adam(
            beta1 if stn_beta1 is None else stn_beta1, fused=fused_opt)
        if self.opt_split:
            if getattr(opt, "steps_per_execution", 1) > 1:
                raise ValueError("--opt_split is per-step (two programs); "
                                 "incompatible with --steps_per_execution > 1")
            if getattr(opt, "grad_accum", 1) > 1:
                raise ValueError("--opt_split is incompatible with "
                                 "--grad_accum > 1")
        base_lr = getattr(opt, "lr", 2e-4)
        stn_lr = getattr(opt, "stn_lr", None)
        self.stn_lr_ratio = 1.0 if stn_lr is None else stn_lr / base_lr
        self.gan_warmup = getattr(opt, "gan_warmup_epochs", 0)
        self.gan_ramp = getattr(opt, "gan_ramp_epochs", 0)
        self.stn_warmup = getattr(opt, "stn_warmup_epochs", 0)
        self.stn_ramp = getattr(opt, "stn_ramp_epochs", 0)
        self.stn_grad_clip = getattr(opt, "stn_grad_clip", 0.0)
        self.border_mask = getattr(opt, "border_mask", False)
        self.recon_pyramid = getattr(opt, "recon_pyramid", 0)
        self.freeze_g = getattr(opt, "freeze_g", False)
        self.grad_accum = max(1, getattr(opt, "grad_accum", 1))
        if self.isTrain and opt.batch_size % self.grad_accum:
            raise ValueError(
                f"--grad_accum {self.grad_accum} must divide "
                f"--batch_size {opt.batch_size}"
            )
        if getattr(opt, "g_batch", False) and opt.norm == "batch":
            # the 2N concatenated G pass would mix batch statistics between
            # a and warped_A — only per-sample norms keep it bit-identical
            raise ValueError("--g_batch requires --norm instance|none "
                             "(batch norm mixes stats across the 2N pass)")
        if self.recon_pyramid > 0 and opt.crop_size % (2 ** self.recon_pyramid):
            raise ValueError(
                f"--recon_pyramid {self.recon_pyramid} needs --crop_size "
                f"divisible by {2 ** self.recon_pyramid}, got {opt.crop_size}"
            )
        self.ema_decay = getattr(opt, "ema_decay", 0.0)
        self.use_ema = getattr(opt, "use_ema", False)
        # EMA shadows ride the per-net checkpoint layout as pseudo-nets so a
        # --use_ema test run can restore them without the full train state.
        self.save_names = list(self.model_names)
        if self.ema_decay > 0 or self.use_ema:
            self.save_names += ["G_ema", "R_ema"]

        self._build_state()
        # $NEMAR_XLA_OPTS rides the PJRT CompileOptions proto into the
        # relay's (env-cleared) compile helper — the only way to reach TPU
        # backend knobs here; XLA_FLAGS never arrives (utils/xla_opts.py).
        from nemar_tpu.utils.xla_opts import env_compiler_options
        co = env_compiler_options()
        self._train_step = jax.jit(self._train_step_impl, donate_argnums=(0,),
                                   compiler_options=co)
        self._train_scan = jax.jit(self._train_scan_impl, donate_argnums=(0,),
                                   compiler_options=co)
        self._forward_jit = jax.jit(self._forward_all)
        if self.opt_split:
            # program A: forward + D update + G/R grads (split=True is a
            # trace-time constant, hence the lambda rather than static args)
            self._train_grads = jax.jit(
                lambda st, a, b, lr, gw, rg: self._train_step_impl(
                    st, a, b, lr, gw, rg, split=True),
                donate_argnums=(0,),
                compiler_options=co,
            )
            # program B: bucketed flat Adam for G/R + EMA
            self._opt_apply = jax.jit(
                self._opt_apply_impl, donate_argnums=(0, 1),
                compiler_options=co)

    # ------------------------------------------------------------------
    # state construction
    # ------------------------------------------------------------------
    def _build_state(self):
        opt = self.opt
        h = w = opt.crop_size
        a0 = jnp.zeros((1, h, w, opt.input_nc), jnp.float32)
        b0 = jnp.zeros((1, h, w, opt.output_nc), jnp.float32)
        k = jax.random.key(getattr(opt, "seed", 0))
        kG, kD, kR, kS = jax.random.split(k, 4)
        params_G = self.netG.init(kG, a0)
        params_D = self.netD.init(kD, b0)
        r_src0 = b0 if self.field_source == "fake" else a0
        params_R = self.netR.init(kR, r_src0, b0, ())
        opt_G = {"G": self.tx.init(params_G), "R": self.tx_R.init(params_R)}
        opt_D = self.tx.init(params_D)
        pool = (
            init_pool(self.pool_size, (h, w, opt.output_nc))
            if (self.isTrain and self.pool_size > 0)
            else None
        )
        keep_ema = (self.isTrain and self.ema_decay > 0) or (
            not self.isTrain and self.use_ema
        )
        state = NemarState(
            step=jnp.zeros((), jnp.int32),
            params_G=params_G, params_D=params_D, params_R=params_R,
            opt_G=opt_G, opt_D=opt_D,
            rng=jax.random.key(getattr(opt, "seed", 0) + 17),
            pool=pool,
            # fresh buffers: aliasing params here would double-donate in the
            # donated train step
            ema=jax.tree.map(jnp.copy, {"G": params_G, "R": params_R})
            if keep_ema else None,
        )
        from nemar_tpu.parallel import replicate

        self.state = replicate(state, self.mesh)

    def _net_params(self, name):
        if name == "G_ema":
            return self.state.ema["G"]
        if name == "R_ema":
            return self.state.ema["R"]
        return super()._net_params(name)

    def _set_net_params(self, updates):
        ema_g = updates.pop("G_ema", None)
        ema_r = updates.pop("R_ema", None)
        state = super()._set_net_params(updates)
        if ema_g is not None:
            state = state.replace(ema={"G": ema_g, "R": ema_r})
        return state

    # ------------------------------------------------------------------
    # pure compute
    # ------------------------------------------------------------------
    def _cast(self, tree):
        if not self.bf16:
            return tree
        return jax.tree.map(
            lambda x: x.astype(jnp.bfloat16)
            if isinstance(x, jnp.ndarray) and x.dtype == jnp.float32 else x,
            tree,
        )

    def _forward_parts(self, pg, pr, a, b):
        """SURVEY §4.2 forward: both warp orders from one φ."""
        cg, cr = self._cast(pg), self._cast(pr)
        ca, cb = self._cast(a), self._cast(b)
        if getattr(self.opt, "remat", False):
            # n_grad_imgs is a STATIC routing arg (selects which warp inputs
            # get an image-gradient path); jax.checkpoint would trace it into
            # a bool[] tracer (TracerBoolConversionError in grid_sample_multi)
            # so close over it instead of passing it through the wrapper.
            def stn_apply(cr_, a_, b_, imgs_, n_grad_imgs=0):
                import functools

                f = jax.checkpoint(functools.partial(
                    self.netR.apply, n_grad_imgs=n_grad_imgs))
                return f(cr_, a_, b_, imgs_)
        else:
            stn_apply = self.netR.apply
        if self.field_source == "pair" and getattr(self.opt, "g_batch", False):
            # φ depends only on (a, b), so R runs FIRST and the two G passes
            # — G(a) and G(warp(a, φ)) — fuse into ONE batched apply at 2N.
            # Bit-identical math (instance norm is per-sample, no dropout),
            # but the dominant G convs run at twice the batch with half the
            # dispatches. The warp of fake_B moves after G (same grid).
            from nemar_tpu.ops.warp import grid_sample

            # n_grad_imgs=0: real_A is data — its d/dimg is never consumed
            # (R's gradient arrives via the grid); the Pallas warp backward
            # skips the image-scatter matmul entirely.
            (warped_A,), reg, aux = stn_apply(cr, ca, cb, (ca,),
                                              n_grad_imgs=0)
            both = self.netG.apply(
                cg, jnp.concatenate([ca, warped_A.astype(ca.dtype)], axis=0)
            )
            fake_B, fake_B2 = jnp.split(both, 2, axis=0)
            reg_fakeB = grid_sample(
                fake_B, aux["grid"].astype(jnp.float32),
                padding_mode=self.netR.padding_mode,
                align_corners=self.netR.align_corners,
                impl=self.netR.warp_impl,
            )
        else:
            fake_B = self.netG.apply(cg, ca)
            src = (ca, cb) if self.field_source == "pair" else (fake_B, cb)
            # grad-carrying image FIRST: fake_B needs d/dimg (G's gradient
            # flows through the warp); real_A is data and does not — the
            # Pallas backward drops its half of the scatter matmul.
            (reg_fakeB, warped_A), reg, aux = stn_apply(
                cr, src[0], src[1], (fake_B, ca), n_grad_imgs=1
            )
            fake_B2 = self.netG.apply(cg, warped_A)
        out = {
            "fake_B": fake_B, "reg_fakeB": reg_fakeB, "warped_A": warped_A,
            "fake_B2": fake_B2, "reg": reg,
        }
        if self.border_mask:
            # validity of each output pixel under the warp: borders pulled
            # in from outside the source give false photometric gradients.
            # stop_gradient: the mask must not be a lever for shrinking the
            # loss support.
            from nemar_tpu.ops.warp import grid_sample

            ones = jnp.ones(a.shape[:3] + (1,), jnp.float32)
            mask = grid_sample(
                ones, aux["grid"].astype(jnp.float32),
                padding_mode="zeros",
                align_corners=getattr(self.opt, "stn_align_corners", False),
                impl=getattr(self.opt, "warp_impl", "auto"),
            )
            out["mask"] = jax.lax.stop_gradient(mask)
        return jax.tree.map(lambda x: x.astype(jnp.float32), out), aux

    def _forward_all(self, state: NemarState, a, b):
        pg, pr = state.params_G, state.params_R
        if self.use_ema and state.ema is not None:
            pg, pr = state.ema["G"], state.ema["R"]
        out, aux = self._forward_parts(pg, pr, a, b)
        if "flow" in aux:  # deformable STN: expose for registration eval
            out["flow"] = aux["flow"].astype(jnp.float32)
        return out

    def _d_loss(self, pd, fake, b, rng=None):
        cd = self._cast(pd)
        if self.opt.norm in ("instance", "none"):
            # One batched D pass over [real; fake] (PatchGAN is per-sample:
            # instance norm + convs — identical math, half the dispatches).
            preds = self.netD.apply(
                cd, jnp.concatenate([self._cast(b), self._cast(fake)], axis=0)
            ).astype(jnp.float32)
            pred_real, pred_fake = jnp.split(preds, 2, axis=0)
        else:
            # --norm batch normalizes over the whole batch: concatenating
            # real and fake would share their statistics (different math
            # from the reference's two D calls, and a stats side-channel
            # for D). Two separate passes keep the reference semantics.
            pred_real = self.netD.apply(cd, self._cast(b)).astype(jnp.float32)
            pred_fake = self.netD.apply(cd, self._cast(fake)).astype(jnp.float32)
        l_real = networks.gan_loss(pred_real, True, self.gan_mode)
        l_fake = networks.gan_loss(pred_fake, False, self.gan_mode)
        loss = 0.5 * (l_real + l_fake)
        if self.gan_mode == "wgangp":
            loss = loss + networks.cal_gradient_penalty(
                lambda p, x: self.netD.apply(p, x), pd, b, fake, rng
            )
        return loss, (l_real, l_fake)

    def _g_loss(self, pgr, pd, a, b):
        out, _ = self._forward_parts(pgr["G"], pgr["R"], a, b)
        pred = self.netD.apply(self._cast(pd), self._cast(out["reg_fakeB"]))
        l_gan = networks.gan_loss(pred.astype(jnp.float32), True, self.gan_mode)
        l_recon = jnp.mean(jnp.abs(out["reg_fakeB"] - b)) + jnp.mean(
            jnp.abs(out["fake_B2"] - b)
        )
        l_smooth = out["reg"]
        total = (
            self.lambda_GAN * l_gan
            + self.lambda_recon * l_recon
            + self.lambda_smooth * l_smooth
        )
        return total, (l_gan, l_recon, l_smooth)

    def _apply_updates(self, params, updates, lr):
        return jax.tree.map(lambda p, u: p - lr * u, params, updates)

    def _clip_r(self, grads_R):
        """--stn_grad_clip: bound R's gradient global norm (the zero-init
        flow heads are one bad batch away from a field blow-up)."""
        c = self.stn_grad_clip
        if c <= 0:
            return grads_R
        gnorm = optax.global_norm(grads_R)
        scale = jnp.minimum(1.0, c / jnp.maximum(gnorm, 1e-12))
        return jax.tree.map(lambda g: g * scale, grads_R)

    def _loss_inputs(self, out):
        """The forward outputs the G+R loss actually consumes."""
        keep = {"reg_fakeB": out["reg_fakeB"], "fake_B2": out["fake_B2"],
                "reg": out["reg"]}
        if "mask" in out:
            keep["mask"] = out["mask"]
        return keep

    @staticmethod
    def _pool2(x):
        n, h, w, c = x.shape
        return x.reshape(n, h // 2, 2, w // 2, 2, c).mean((2, 4))

    def _recon_l1(self, x, y, m):
        if m is None:
            return jnp.mean(jnp.abs(x - y))
        return jnp.sum(jnp.abs(x - y).mean(-1, keepdims=True) * m) / jnp.maximum(
            jnp.sum(m), 1.0
        )

    def _head_loss(self, o, b, params_D, gan_w):
        """G+R loss on forward outputs `o` against a frozen D."""
        pred = self.netD.apply(self._cast(params_D), self._cast(o["reg_fakeB"]))
        l_gan = networks.gan_loss(pred.astype(jnp.float32), True, self.gan_mode)
        m = o.get("mask")  # (N, H, W, 1), stop-gradient upstream (or None)
        rf, f2, bb = o["reg_fakeB"], o["fake_B2"], b
        l_recon = self._recon_l1(rf, bb, m) + self._recon_l1(f2, bb, m)
        # --recon_pyramid: K extra avg-pooled octaves. Bilinear L1 only sees
        # misalignment within ~1 px; each pooled octave doubles the capture
        # radius of the photometric gradient that drives the flow field.
        for _ in range(self.recon_pyramid):
            rf, f2, bb = self._pool2(rf), self._pool2(f2), self._pool2(bb)
            m = self._pool2(m) if m is not None else None
            l_recon = l_recon + self._recon_l1(rf, bb, m) + self._recon_l1(f2, bb, m)
        l_recon = l_recon / (1 + self.recon_pyramid)
        l_smooth = o["reg"]
        total = (
            gan_w * self.lambda_GAN * l_gan
            + self.lambda_recon * l_recon
            + self.lambda_smooth * l_smooth
        )
        return total, (l_gan, l_recon, l_smooth)

    def _train_step_impl(self, state: NemarState, a, b, lr, gan_w, r_gate,
                         split=False):
        """One reference optimize_parameters() (SURVEY §4.2), one XLA program.

        The forward (2 G passes + STN + warps, ~76 GFLOP/pair of the step's
        ~564) runs ONCE through jax.vjp: its detached outputs feed the D
        update, then the saved residuals backprop the G+R loss against the
        UPDATED D — the same single-graph structure the reference gets from
        torch autograd (forward once, backward_D on detached fake,
        backward_G through the stored graph). Recomputing the forward inside
        a second value_and_grad is NOT CSE'd by XLA (measured +13.5% FLOPs).

        --grad_accum > 1 routes to the microbatched variant (identical math,
        1/N activation memory).
        """
        if self.grad_accum > 1:
            return self._train_step_accum(state, a, b, lr, gan_w, r_gate)
        rng, r_pool, r_gp = jax.random.split(state.rng, 3)
        pgr = {"G": state.params_G, "R": state.params_R}

        def fwd_fn(p):
            out, _ = self._forward_parts(p["G"], p["R"], a, b)
            # only the loss inputs: zero-cotangent extras (fake_B, warped_A)
            # would otherwise pay real backward FLOPs
            return self._loss_inputs(out)

        out, fwd_vjp = jax.vjp(fwd_fn, pgr)

        # ---- D step: current fake, detached --------------------------------
        fake_for_D = jax.lax.stop_gradient(out["reg_fakeB"])
        new_pool = state.pool
        if state.pool is not None:
            new_pool, fake_for_D = query_pool(state.pool, fake_for_D, r_pool)

        (loss_D, (l_dr, l_df)), grads_D = jax.value_and_grad(
            self._d_loss, has_aux=True
        )(state.params_D, fake_for_D, b, r_gp)
        if self.freeze_g:
            opt_D, params_D = state.opt_D, state.params_D
        else:
            upd_D, opt_D = self.tx.update(grads_D, state.opt_D, state.params_D)
            params_D = self._apply_updates(state.params_D, upd_D, lr)

        # ---- G+R step against the UPDATED, frozen D ------------------------
        (loss_G, (l_gan, l_rec, l_sm)), dout = jax.value_and_grad(
            lambda o: self._head_loss(o, b, params_D, gan_w), has_aux=True
        )(out)
        (grads_G,) = fwd_vjp(dout)
        # R freeze (--stn_warmup_epochs): zeroed grads also keep the Adam
        # moments at zero, so unfreezing starts from a clean optimizer
        grads_G["R"] = jax.tree.map(
            lambda g: g * r_gate, self._clip_r(grads_G["R"])
        )
        metrics_early = {
            "D": loss_D, "D_real": l_dr, "D_fake": l_df,
            "G_GAN": l_gan, "G_recon": l_rec, "G_smooth": l_sm, "G": loss_G,
        }
        if split:
            # --opt_split program A ends here: hand the G/R grads to the
            # separately-jitted Adam program (_opt_apply_impl). D's update
            # cannot move there — the G head loss above used the UPDATED D.
            new_state = state.replace(
                step=state.step + 1, params_D=params_D, opt_D=opt_D,
                rng=rng, pool=new_pool,
            )
            return new_state, grads_G, metrics_early
        upd_GR, opt_gR = self.tx_R.update(grads_G["R"], state.opt_G["R"], pgr["R"])
        if self.freeze_g:
            opt_gG, params_G = state.opt_G["G"], pgr["G"]
        else:
            upd_GG, opt_gG = self.tx.update(
                grads_G["G"], state.opt_G["G"], pgr["G"]
            )
            params_G = self._apply_updates(pgr["G"], upd_GG, lr)
        opt_G = {"G": opt_gG, "R": opt_gR}
        params_R = self._apply_updates(
            pgr["R"], upd_GR, lr * self.stn_lr_ratio
        )

        ema = state.ema
        if ema is not None:
            d = self.ema_decay
            ema = jax.tree.map(
                lambda e, p: d * e + (1.0 - d) * p,
                ema, {"G": params_G, "R": params_R},
            )
        new_state = state.replace(
            step=state.step + 1,
            params_G=params_G, params_D=params_D, params_R=params_R,
            opt_G=opt_G, opt_D=opt_D, rng=rng, pool=new_pool, ema=ema,
        )
        return new_state, metrics_early

    def _opt_apply_impl(self, state: NemarState, grads_G, lr):
        """--opt_split program B: G/R flat-bucket Adam + apply + EMA.

        Identical math to the tail of _train_step_impl (the R grads arrive
        already clipped and gated). Compiled as its own program so the
        remote compile helper never has to schedule the flat-Adam
        concatenates inside the pallas-trunk step (probes r3q/r4d: that
        combination reproducibly OOMs the helper).
        """
        pgr = {"G": state.params_G, "R": state.params_R}
        upd_GR, opt_gR = self.tx_R.update(grads_G["R"], state.opt_G["R"], pgr["R"])
        if self.freeze_g:
            opt_gG, params_G = state.opt_G["G"], pgr["G"]
        else:
            upd_GG, opt_gG = self.tx.update(
                grads_G["G"], state.opt_G["G"], pgr["G"]
            )
            params_G = self._apply_updates(pgr["G"], upd_GG, lr)
        params_R = self._apply_updates(
            pgr["R"], upd_GR, lr * self.stn_lr_ratio
        )
        ema = state.ema
        if ema is not None:
            d = self.ema_decay
            ema = jax.tree.map(
                lambda e, p: d * e + (1.0 - d) * p,
                ema, {"G": params_G, "R": params_R},
            )
        return state.replace(
            params_G=params_G, params_R=params_R,
            opt_G={"G": opt_gG, "R": opt_gR}, ema=ema,
        )

    def _train_step_accum(self, state: NemarState, a, b, lr, gan_w, r_gate):
        """Gradient-accumulated step: scan over --grad_accum microbatches.

        Identical math to the full-batch step (instance norm is per-sample;
        every loss is a mean over the batch, so the mean of microbatch
        grads equals the full-batch grad), but activations live only one
        microbatch at a time inside the scan — the memory lever that fits
        512² batch 32 on a single chip (BASELINE config #4). Costs one extra
        detached forward per microbatch vs the vjp-shared fast path.
        """
        k = self.grad_accum
        n = a.shape[0] // k
        am = a.reshape((k, n) + a.shape[1:])
        bm = b.reshape((k, n) + b.shape[1:])
        rng, r_pool, r_gp = jax.random.split(state.rng, 3)
        r_pools = jax.random.split(r_pool, k)
        r_gps = jax.random.split(r_gp, k)
        pgr = {"G": state.params_G, "R": state.params_R}
        zeros_like = lambda t: jax.tree.map(jnp.zeros_like, t)

        # ---- D grads over microbatches (detached fakes; pool threaded) ----
        def d_body(carry, inp):
            pool, gacc, lacc = carry
            ai, bi, rp, rg = inp
            out, _ = self._forward_parts(pgr["G"], pgr["R"], ai, bi)
            fake = jax.lax.stop_gradient(out["reg_fakeB"])
            if pool is not None:
                pool, fake = query_pool(pool, fake, rp)
            (ld, (ldr, ldf)), gd = jax.value_and_grad(
                self._d_loss, has_aux=True
            )(state.params_D, fake, bi, rg)
            gacc = jax.tree.map(jnp.add, gacc, gd)
            return (pool, gacc, lacc + jnp.stack([ld, ldr, ldf])), None

        (new_pool, gD, lD), _ = jax.lax.scan(
            d_body,
            (state.pool, zeros_like(state.params_D), jnp.zeros((3,))),
            (am, bm, r_pools, r_gps),
        )
        gD = jax.tree.map(lambda x: x / k, gD)
        loss_D, l_dr, l_df = (lD / k)[0], (lD / k)[1], (lD / k)[2]
        if self.freeze_g:
            opt_D, params_D = state.opt_D, state.params_D
        else:
            upd_D, opt_D = self.tx.update(gD, state.opt_D, state.params_D)
            params_D = self._apply_updates(state.params_D, upd_D, lr)

        # ---- G+R grads over microbatches against the UPDATED D ----
        def g_loss_micro(p, ai, bi):
            out, _ = self._forward_parts(p["G"], p["R"], ai, bi)
            return self._head_loss(self._loss_inputs(out), bi, params_D, gan_w)

        def g_body(carry, inp):
            gacc, lacc = carry
            ai, bi = inp
            (lg, (lgan, lrec, lsm)), gg = jax.value_and_grad(
                g_loss_micro, has_aux=True
            )(pgr, ai, bi)
            gacc = jax.tree.map(jnp.add, gacc, gg)
            return (gacc, lacc + jnp.stack([lg, lgan, lrec, lsm])), None

        (gG, lG), _ = jax.lax.scan(
            g_body, (zeros_like(pgr), jnp.zeros((4,))), (am, bm)
        )
        gG = jax.tree.map(lambda x: x / k, gG)
        gG["R"] = jax.tree.map(lambda g: g * r_gate, self._clip_r(gG["R"]))
        loss_G, l_gan, l_rec, l_sm = (lG / k)[0], (lG / k)[1], (lG / k)[2], (lG / k)[3]
        upd_GR, opt_gR = self.tx_R.update(gG["R"], state.opt_G["R"], pgr["R"])
        if self.freeze_g:
            opt_gG, params_G = state.opt_G["G"], pgr["G"]
        else:
            upd_GG, opt_gG = self.tx.update(gG["G"], state.opt_G["G"], pgr["G"])
            params_G = self._apply_updates(pgr["G"], upd_GG, lr)
        opt_G = {"G": opt_gG, "R": opt_gR}
        params_R = self._apply_updates(pgr["R"], upd_GR, lr * self.stn_lr_ratio)

        ema = state.ema
        if ema is not None:
            d = self.ema_decay
            ema = jax.tree.map(
                lambda e, p: d * e + (1.0 - d) * p,
                ema, {"G": params_G, "R": params_R},
            )
        new_state = state.replace(
            step=state.step + 1,
            params_G=params_G, params_D=params_D, params_R=params_R,
            opt_G=opt_G, opt_D=opt_D, rng=rng, pool=new_pool, ema=ema,
        )
        metrics = {
            "D": loss_D, "D_real": l_dr, "D_fake": l_df,
            "G_GAN": l_gan, "G_recon": l_rec, "G_smooth": l_sm, "G": loss_G,
        }
        return new_state, metrics

    def _train_scan_impl(self, state: NemarState, a_stack, b_stack, lr, gan_w, r_gate):
        """--steps_per_execution fused steps in one dispatch (lax.scan)."""

        def body(st, ab):
            return self._train_step_impl(st, ab[0], ab[1], lr, gan_w, r_gate)

        state, ms = jax.lax.scan(body, state, (a_stack, b_stack))
        # report the mean over the fused steps (last-step-only hid all but
        # 1/spe of the training signal from the logs)
        return state, jax.tree.map(lambda x: x.mean(0), ms)

    # ------------------------------------------------------------------
    # reference-API host methods
    # ------------------------------------------------------------------
    def set_input(self, data: dict):
        batch = self._put_batch({"A": data["A"], "B": data["B"]})
        self.real_A = batch["A"]
        self.real_B = batch["B"]
        self.image_paths = data.get("A_paths", [])

    def forward(self):
        out = self._forward_jit(self.state, self.real_A, self.real_B)
        self.last_flow = out.get("flow")  # None for the affine STN
        self._visuals = {
            "real_A": self.real_A, "real_B": self.real_B,
            "fake_B": out["fake_B"], "reg_fakeB": out["reg_fakeB"],
            "warped_A": out["warped_A"], "fake_B2": out["fake_B2"],
        }
        return out

    def _gan_w_scalar(self):
        """GAN weight for the current epoch (R warm-up, then linear ramp) as
        an explicitly placed device scalar (same rationale as _lr_scalar)."""
        epoch = getattr(self, "_cur_epoch", getattr(self.opt, "epoch_count", 1))
        if not self.isTrain or self.gan_warmup <= 0:
            w = 1.0
        elif epoch <= self.gan_warmup:
            w = 0.0
        elif self.gan_ramp > 0:
            w = min(1.0, (epoch - self.gan_warmup) / float(self.gan_ramp))
        else:
            w = 1.0
        return jax.device_put(np.float32(w))

    def _r_gate_scalar(self):
        epoch = getattr(self, "_cur_epoch", getattr(self.opt, "epoch_count", 1))
        if not self.isTrain:
            w = 1.0
        elif epoch <= self.stn_warmup:
            w = 0.0
        elif self.stn_ramp > 0:
            w = min(1.0, (epoch - self.stn_warmup) / float(self.stn_ramp))
        else:
            w = 1.0
        return jax.device_put(np.float32(w))

    def optimize_parameters(self):
        lr = self._lr_scalar()
        if self.opt_split:
            self.state, grads_G, metrics = self._train_grads(
                self.state, self.real_A, self.real_B, lr,
                self._gan_w_scalar(), self._r_gate_scalar(),
            )
            self.state = self._opt_apply(self.state, grads_G, lr)
        else:
            self.state, metrics = self._train_step(
                self.state, self.real_A, self.real_B, lr,
                self._gan_w_scalar(), self._r_gate_scalar(),
            )
        self._losses = metrics

    def optimize_parameters_scan(self, batches: list):
        """Fused multi-step path (--steps_per_execution > 1)."""
        from jax.sharding import NamedSharding, PartitionSpec as P

        a = np.stack([bt["A"] for bt in batches])
        b = np.stack([bt["B"] for bt in batches])
        # (steps, batch, H, W, C): batch over 'data' when divisible,
        # replicated otherwise (same tail policy as shard_batch)
        if a.shape[1] % self.mesh.shape["data"] == 0:
            sd = NamedSharding(self.mesh, P(None, "data"))
        else:
            sd = NamedSharding(self.mesh, P())
        a = jax.device_put(a, sd)
        b = jax.device_put(b, sd)
        lr = self._lr_scalar()
        self.state, metrics = self._train_scan(
            self.state, a, b, lr, self._gan_w_scalar(), self._r_gate_scalar()
        )
        self._losses = metrics
        self.image_paths = batches[-1].get("A_paths", [])
        self.real_A = jnp.asarray(batches[-1]["A"])
        self.real_B = jnp.asarray(batches[-1]["B"])
