"""Inference-only generator wrapper (template lineage 'test' model).

Runs a single saved generator on one-domain data (--dataset_mode single):
    python test.py --dataroot path/to/A --model test --no_dropout
"""

from __future__ import annotations

from typing import Any

import flax.struct
import jax
import jax.numpy as jnp

from nemar_tpu.models import networks
from nemar_tpu.models.base_model import BaseModel


class TestState(flax.struct.PyTreeNode):
    step: jax.Array
    params_G: Any


class TestModel(BaseModel):
    @staticmethod
    def modify_commandline_options(parser, is_train=False):
        assert not is_train, "TestModel is inference-only; use it with test.py"
        parser.set_defaults(dataset_mode="single")
        parser.add_argument("--model_suffix", type=str, default="",
                            help="load checkpoints saved as net G{suffix}")
        return parser

    def __init__(self, opt):
        assert not opt.isTrain
        super().__init__(opt)
        self.loss_names = []
        self.visual_names = ["real", "fake"]
        self.model_names = ["G" + getattr(opt, "model_suffix", "")]
        self._gname = self.model_names[0]

        self.netG = networks.define_G(
            opt.input_nc, opt.output_nc, opt.ngf, opt.netG, opt.norm,
            not opt.no_dropout, opt.init_type, opt.init_gain,
            getattr(opt, "norm_impl", "xla"),
            getattr(opt, "remat", False), getattr(opt, "block_impl", "xla"),
            getattr(opt, "c7_impl", "xla"),
        )
        h = w = opt.crop_size
        a0 = jnp.zeros((1, h, w, opt.input_nc), jnp.float32)
        params_G = self.netG.init(jax.random.key(getattr(opt, "seed", 0)), a0)
        state = TestState(step=jnp.zeros((), jnp.int32), params_G=params_G)
        from nemar_tpu.parallel import replicate

        self.state = replicate(state, self.mesh)
        self._forward_jit = jax.jit(
            lambda st, a: self.netG.apply(st.params_G, a, False)
        )

    def _net_params(self, name):
        assert name == self._gname
        return self.state.params_G

    def _set_net_params(self, updates):
        return self.state.replace(params_G=updates[self._gname])

    def set_input(self, data):
        batch = self._put_batch({"A": data["A"]})
        self.real = batch["A"]
        self.image_paths = data.get("A_paths", [])

    def forward(self):
        self.fake = self._forward_jit(self.state, self.real)
        self._visuals = {"real": self.real, "fake": self.fake}

    def optimize_parameters(self):
        raise RuntimeError("TestModel has no training step")
