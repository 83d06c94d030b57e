"""CycleGAN: unpaired two-domain translation (template lineage of the
reference — junyanz/pytorch-CycleGAN-and-pix2pix; SURVEY.md §0 source 2).

  G_A: A->B, G_B: B->A; D_A judges domain-B images, D_B domain-A.
  L = GAN(G_A) + GAN(G_B)
    + λ_A ‖G_B(G_A(a)) − a‖₁ + λ_B ‖G_A(G_B(b)) − b‖₁         (cycle)
    + λ_idt (λ_B ‖G_A(b) − b‖₁ + λ_A ‖G_B(a) − a‖₁)           (identity)

Template defaults: resnet_9blocks, instance norm, no dropout, lsgan,
pool 50, unaligned dataset. One jitted step: G_A+G_B joint update against
frozen Ds, then both Ds against pooled fakes.
"""

from __future__ import annotations

from typing import Any, Optional

import flax.struct
import jax
import jax.numpy as jnp

from nemar_tpu.models import networks
from nemar_tpu.models.base_model import BaseModel
from nemar_tpu.models.optim import apply_updates, make_adam
from nemar_tpu.utils.image_pool import PoolState, init_pool, query_pool


class CycleGanState(flax.struct.PyTreeNode):
    step: jax.Array
    params_G_A: Any
    params_G_B: Any
    params_D_A: Any
    params_D_B: Any
    opt_G: Any
    opt_D: Any
    rng: jax.Array
    pool_A: Optional[PoolState]  # fake-A buffer (outputs of G_B)
    pool_B: Optional[PoolState]  # fake-B buffer (outputs of G_A)


class CycleGANModel(BaseModel):
    @staticmethod
    def modify_commandline_options(parser, is_train=True):
        parser.set_defaults(no_dropout=True, netG="resnet_9blocks",
                            dataset_mode="unaligned")
        if is_train:
            parser.add_argument("--lambda_A", type=float, default=10.0,
                                help="weight for cycle loss (A -> B -> A)")
            parser.add_argument("--lambda_B", type=float, default=10.0,
                                help="weight for cycle loss (B -> A -> B)")
            parser.add_argument("--lambda_identity", type=float, default=0.5,
                                help="identity mapping loss weight scale")
        return parser

    def __init__(self, opt):
        super().__init__(opt)
        self.loss_names = ["D_A", "G_A", "cycle_A", "idt_A",
                           "D_B", "G_B", "cycle_B", "idt_B"]
        self.visual_names = ["real_A", "fake_B", "rec_A", "real_B", "fake_A", "rec_B"]
        self.model_names = (
            ["G_A", "G_B", "D_A", "D_B"] if self.isTrain else ["G_A", "G_B"]
        )
        if opt.input_nc != opt.output_nc:
            raise ValueError("cycle_gan requires input_nc == output_nc "
                             "(identity/cycle terms compare across domains)")

        norm_impl = getattr(opt, "norm_impl", "xla")

        def make_g():
            return networks.define_G(
                opt.input_nc, opt.output_nc, opt.ngf, opt.netG, opt.norm,
                not opt.no_dropout, opt.init_type, opt.init_gain, norm_impl,
                getattr(opt, "remat", False),
                getattr(opt, "block_impl", "xla"),
                getattr(opt, "c7_impl", "xla"),
            )

        def make_d():
            return networks.define_D(
                opt.output_nc, opt.ndf, opt.netD, opt.n_layers_D, opt.norm,
                opt.init_type, opt.init_gain, norm_impl,
            )

        self.netG_A, self.netG_B = make_g(), make_g()
        self.netD_A, self.netD_B = make_d(), make_d()
        self.gan_mode = getattr(opt, "gan_mode", "lsgan")
        self.lambda_A = getattr(opt, "lambda_A", 10.0)
        self.lambda_B = getattr(opt, "lambda_B", 10.0)
        self.lambda_idt = getattr(opt, "lambda_identity", 0.5)
        self.pool_size = getattr(opt, "pool_size", 50)
        self.tx = make_adam(getattr(opt, "beta1", 0.5))
        self._build_state()
        self._train_step = jax.jit(self._train_step_impl, donate_argnums=(0,))
        self._forward_jit = jax.jit(self._forward_all)

    def _build_state(self):
        opt = self.opt
        h = w = opt.crop_size
        a0 = jnp.zeros((1, h, w, opt.input_nc), jnp.float32)
        k = jax.random.key(getattr(opt, "seed", 0))
        kga, kgb, kda, kdb = jax.random.split(k, 4)
        params = {
            "params_G_A": self.netG_A.init(kga, a0),
            "params_G_B": self.netG_B.init(kgb, a0),
            "params_D_A": self.netD_A.init(kda, a0),
            "params_D_B": self.netD_B.init(kdb, a0),
        }
        opt_G = self.tx.init({"A": params["params_G_A"], "B": params["params_G_B"]})
        opt_D = self.tx.init({"A": params["params_D_A"], "B": params["params_D_B"]})
        use_pool = self.isTrain and self.pool_size > 0
        shape = (h, w, opt.input_nc)
        self.state = CycleGanState(
            step=jnp.zeros((), jnp.int32),
            **params,
            opt_G=opt_G, opt_D=opt_D,
            rng=jax.random.key(getattr(opt, "seed", 0) + 31),
            pool_A=init_pool(self.pool_size, shape) if use_pool else None,
            pool_B=init_pool(self.pool_size, shape) if use_pool else None,
        )
        from nemar_tpu.parallel import replicate

        self.state = replicate(self.state, self.mesh)

    def _forward_all(self, state, a, b):
        fake_B = self.netG_A.apply(state.params_G_A, a)
        rec_A = self.netG_B.apply(state.params_G_B, fake_B)
        fake_A = self.netG_B.apply(state.params_G_B, b)
        rec_B = self.netG_A.apply(state.params_G_A, fake_A)
        return {"fake_B": fake_B, "rec_A": rec_A, "fake_A": fake_A, "rec_B": rec_B}

    def _train_step_impl(self, state: CycleGanState, a, b, lr):
        rng, r_a, r_b = jax.random.split(state.rng, 3)

        # ---- G_A + G_B joint step against frozen Ds (reference order) ----
        def g_loss(pg):
            fake_B = self.netG_A.apply(pg["A"], a)
            rec_A = self.netG_B.apply(pg["B"], fake_B)
            fake_A = self.netG_B.apply(pg["B"], b)
            rec_B = self.netG_A.apply(pg["A"], fake_A)
            l_g_a = networks.gan_loss(
                self.netD_A.apply(state.params_D_A, fake_B), True, self.gan_mode)
            l_g_b = networks.gan_loss(
                self.netD_B.apply(state.params_D_B, fake_A), True, self.gan_mode)
            l_cyc_a = jnp.mean(jnp.abs(rec_A - a)) * self.lambda_A
            l_cyc_b = jnp.mean(jnp.abs(rec_B - b)) * self.lambda_B
            if self.lambda_idt > 0:
                idt_A = self.netG_A.apply(pg["A"], b)
                idt_B = self.netG_B.apply(pg["B"], a)
                l_idt_a = jnp.mean(jnp.abs(idt_A - b)) * self.lambda_B * self.lambda_idt
                l_idt_b = jnp.mean(jnp.abs(idt_B - a)) * self.lambda_A * self.lambda_idt
            else:
                l_idt_a = l_idt_b = jnp.zeros(())
            total = l_g_a + l_g_b + l_cyc_a + l_cyc_b + l_idt_a + l_idt_b
            return total, (l_g_a, l_g_b, l_cyc_a, l_cyc_b, l_idt_a, l_idt_b,
                           fake_A, fake_B)

        pg = {"A": state.params_G_A, "B": state.params_G_B}
        (_, aux), g_g = jax.value_and_grad(g_loss, has_aux=True)(pg)
        l_g_a, l_g_b, l_cyc_a, l_cyc_b, l_idt_a, l_idt_b, fake_A, fake_B = aux
        upd_g, opt_G = self.tx.update(g_g, state.opt_G, pg)
        params_G_A = apply_updates(pg["A"], upd_g["A"], lr)
        params_G_B = apply_updates(pg["B"], upd_g["B"], lr)

        # ---- D_A, D_B step with pooled detached fakes ----
        fake_A = jax.lax.stop_gradient(fake_A)
        fake_B = jax.lax.stop_gradient(fake_B)
        pool_A, pool_B = state.pool_A, state.pool_B
        if pool_A is not None:
            pool_B, fake_B = query_pool(pool_B, fake_B, r_b)
            pool_A, fake_A = query_pool(pool_A, fake_A, r_a)

        def d_loss(pd):
            pr_a = networks.gan_loss(self.netD_A.apply(pd["A"], b), True, self.gan_mode)
            pf_a = networks.gan_loss(self.netD_A.apply(pd["A"], fake_B), False, self.gan_mode)
            pr_b = networks.gan_loss(self.netD_B.apply(pd["B"], a), True, self.gan_mode)
            pf_b = networks.gan_loss(self.netD_B.apply(pd["B"], fake_A), False, self.gan_mode)
            l_d_a = 0.5 * (pr_a + pf_a)
            l_d_b = 0.5 * (pr_b + pf_b)
            return l_d_a + l_d_b, (l_d_a, l_d_b)

        pd = {"A": state.params_D_A, "B": state.params_D_B}
        (_, (l_d_a, l_d_b)), g_d = jax.value_and_grad(d_loss, has_aux=True)(pd)
        upd_d, opt_D = self.tx.update(g_d, state.opt_D, pd)
        params_D_A = apply_updates(pd["A"], upd_d["A"], lr)
        params_D_B = apply_updates(pd["B"], upd_d["B"], lr)

        new_state = state.replace(
            step=state.step + 1,
            params_G_A=params_G_A, params_G_B=params_G_B,
            params_D_A=params_D_A, params_D_B=params_D_B,
            opt_G=opt_G, opt_D=opt_D, rng=rng, pool_A=pool_A, pool_B=pool_B,
        )
        metrics = {
            "D_A": l_d_a, "G_A": l_g_a, "cycle_A": l_cyc_a, "idt_A": l_idt_a,
            "D_B": l_d_b, "G_B": l_g_b, "cycle_B": l_cyc_b, "idt_B": l_idt_b,
        }
        return new_state, metrics

    # -- reference-API host methods --
    def set_input(self, data):
        batch = self._put_batch({"A": data["A"], "B": data["B"]})
        self.real_A, self.real_B = batch["A"], batch["B"]
        self.image_paths = data.get("A_paths", [])

    def forward(self):
        out = self._forward_jit(self.state, self.real_A, self.real_B)
        self._visuals = {"real_A": self.real_A, "real_B": self.real_B, **out}

    def optimize_parameters(self):
        self.state, self._losses = self._train_step(
            self.state, self.real_A, self.real_B, self._lr_scalar()
        )
