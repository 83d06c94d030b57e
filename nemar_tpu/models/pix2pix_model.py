"""pix2pix: paired conditional GAN (template lineage of the reference —
the reference repo derives from junyanz/pytorch-CycleGAN-and-pix2pix and
carries this model family; SURVEY.md §0 source 2).

  G(A) -> B with paired data; D judges concat(A, B) patches.
  L_D = ½(GAN(D(A,B), 1) + GAN(D(A, G(A)), 0))
  L_G = GAN(D(A, G(A)), 1) + λ_L1 · ‖G(A) − B‖₁

Template defaults: unet_256 generator, vanilla GAN, batch norm, aligned
dataset, pool 0. Single jitted D-then-G step like the NeMAR model.
"""

from __future__ import annotations

from typing import Any

import flax.struct
import jax
import jax.numpy as jnp

from nemar_tpu.models import networks
from nemar_tpu.models.base_model import BaseModel
from nemar_tpu.models.optim import apply_updates, make_adam


class Pix2PixState(flax.struct.PyTreeNode):
    step: jax.Array
    params_G: Any
    params_D: Any
    opt_G: Any
    opt_D: Any
    rng: jax.Array  # dropout key (pix2pix's U-Net trains WITH dropout)


class Pix2PixModel(BaseModel):
    @staticmethod
    def modify_commandline_options(parser, is_train=True):
        parser.set_defaults(norm="batch", netG="unet_256", dataset_mode="aligned")
        if is_train:
            parser.set_defaults(pool_size=0, gan_mode="vanilla")
            parser.add_argument("--lambda_L1", type=float, default=100.0,
                                help="weight for L1 loss")
        return parser

    def __init__(self, opt):
        super().__init__(opt)
        self.loss_names = ["G_GAN", "G_L1", "D_real", "D_fake"]
        self.visual_names = ["real_A", "fake_B", "real_B"]
        self.model_names = ["G", "D"] if self.isTrain else ["G"]

        norm_impl = getattr(opt, "norm_impl", "xla")
        self.netG = networks.define_G(
            opt.input_nc, opt.output_nc, opt.ngf, opt.netG, opt.norm,
            not opt.no_dropout, opt.init_type, opt.init_gain, norm_impl,
            getattr(opt, "remat", False), getattr(opt, "block_impl", "xla"),
            getattr(opt, "c7_impl", "xla"),
        )
        # conditional D sees A and B stacked on channels
        self.netD = networks.define_D(
            opt.input_nc + opt.output_nc, opt.ndf, opt.netD, opt.n_layers_D,
            opt.norm, opt.init_type, opt.init_gain, norm_impl,
        )
        self.gan_mode = getattr(opt, "gan_mode", "vanilla")
        self.lambda_L1 = getattr(opt, "lambda_L1", 100.0)
        self.tx = make_adam(getattr(opt, "beta1", 0.5))
        self._build_state()
        self.use_dropout = not opt.no_dropout
        self._train_step = jax.jit(self._train_step_impl, donate_argnums=(0,))
        # deterministic forward for visuals/test (train=False)
        self._forward_jit = jax.jit(
            lambda st, a: self.netG.apply(st.params_G, a, False)
        )

    def _build_state(self):
        opt = self.opt
        h = w = opt.crop_size
        a0 = jnp.zeros((1, h, w, opt.input_nc), jnp.float32)
        ab0 = jnp.zeros((1, h, w, opt.input_nc + opt.output_nc), jnp.float32)
        k = jax.random.key(getattr(opt, "seed", 0))
        kG, kD = jax.random.split(k)
        params_G = self.netG.init(kG, a0)
        params_D = self.netD.init(kD, ab0)
        self.state = Pix2PixState(
            step=jnp.zeros((), jnp.int32),
            params_G=params_G, params_D=params_D,
            opt_G=self.tx.init(params_G), opt_D=self.tx.init(params_D),
            rng=jax.random.key(getattr(opt, "seed", 0) + 23),
        )
        from nemar_tpu.parallel import replicate

        self.state = replicate(self.state, self.mesh)

    def _train_step_impl(self, state: Pix2PixState, a, b, lr):
        rng, r_drop = jax.random.split(state.rng)
        # same dropout draw for the detached D-fake and the G pass (the
        # torch step shares one forward)
        rngs = {"dropout": r_drop} if self.use_dropout else None

        # forward ONCE via vjp: detached output feeds the D step, saved
        # residuals backprop the G loss (torch's shared-graph structure —
        # XLA does not CSE a recomputed forward, measured on the nemar step)
        fake_B, g_vjp = jax.vjp(
            lambda pg: self.netG.apply(pg, a, True, rngs=rngs), state.params_G
        )
        fake_det = jax.lax.stop_gradient(fake_B)

        def d_loss(pd):
            pred_fake = self.netD.apply(pd, jnp.concatenate([a, fake_det], -1))
            pred_real = self.netD.apply(pd, jnp.concatenate([a, b], -1))
            lf = networks.gan_loss(pred_fake, False, self.gan_mode)
            lrr = networks.gan_loss(pred_real, True, self.gan_mode)
            return 0.5 * (lf + lrr), (lrr, lf)

        (_, (l_dr, l_df)), g_d = jax.value_and_grad(d_loss, has_aux=True)(state.params_D)
        upd_d, opt_D = self.tx.update(g_d, state.opt_D, state.params_D)
        params_D = apply_updates(state.params_D, upd_d, lr)

        def g_head(fb):
            pred = self.netD.apply(params_D, jnp.concatenate([a, fb], -1))
            l_gan = networks.gan_loss(pred, True, self.gan_mode)
            l_l1 = jnp.mean(jnp.abs(fb - b)) * self.lambda_L1
            return l_gan + l_l1, (l_gan, l_l1)

        (_, (l_gan, l_l1)), d_fake = jax.value_and_grad(g_head, has_aux=True)(fake_B)
        (g_g,) = g_vjp(d_fake)
        upd_g, opt_G = self.tx.update(g_g, state.opt_G, state.params_G)
        params_G = apply_updates(state.params_G, upd_g, lr)

        new_state = state.replace(
            step=state.step + 1, params_G=params_G, params_D=params_D,
            opt_G=opt_G, opt_D=opt_D, rng=rng,
        )
        return new_state, {"G_GAN": l_gan, "G_L1": l_l1, "D_real": l_dr, "D_fake": l_df}

    # -- reference-API host methods --
    def set_input(self, data):
        batch = self._put_batch({"A": data["A"], "B": data["B"]})
        self.real_A, self.real_B = batch["A"], batch["B"]
        self.image_paths = data.get("A_paths", [])

    def forward(self):
        fake_B = self._forward_jit(self.state, self.real_A)
        self._visuals = {"real_A": self.real_A, "fake_B": fake_B, "real_B": self.real_B}

    def optimize_parameters(self):
        self.state, self._losses = self._train_step(
            self.state, self.real_A, self.real_B, self._lr_scalar()
        )
