"""Model base class (reference models/base_model.py — SURVEY.md §3.1).

Same public surface as the reference's BaseModel (setup / eval / test /
save_networks / load_networks / update_learning_rate / get_current_visuals /
get_current_losses / set_input / optimize_parameters), TPU-native inside:

  * all learnable state lives in ONE pytree (params + optimizer moments +
    step) — no modules, no .to(device);
  * checkpoints are orbax trees under checkpoints/{name}/ with a 'latest'
    alias (reference kept per-net .pth files and did NOT save optimizer
    state — we do, fixing the silent Adam-moment reset on --continue_train
    noted in SURVEY.md §6);
  * the LR schedule is stepped per-epoch on host and fed to the jitted step
    as a scalar argument (no recompilation);
  * data parallelism: batch sharded over a Mesh, params replicated
    (nemar_tpu.parallel), XLA inserts the gradient psum.
"""

from __future__ import annotations

import json
import os
from abc import ABC, abstractmethod
from collections import OrderedDict

import jax
import numpy as np
import orbax.checkpoint as ocp

from nemar_tpu.models.networks import get_lr_multiplier_fn
from nemar_tpu.parallel import make_mesh, replicate, shard_batch


class BaseModel(ABC):
    def __init__(self, opt):
        self.opt = opt
        self.isTrain = opt.isTrain
        self.save_dir = os.path.join(opt.checkpoints_dir, opt.name)
        os.makedirs(self.save_dir, exist_ok=True)
        self.loss_names: list[str] = []
        self.model_names: list[str] = []
        self.visual_names: list[str] = []
        self.metric = 0.0  # for the plateau scheduler
        self.mesh = make_mesh(
            getattr(opt, "num_devices", -1), getattr(opt, "mesh_spatial", 1)
        )
        self.shard_spatial = getattr(opt, "mesh_spatial", 1) > 1
        self.state = None  # model-defined pytree
        self._losses: dict[str, float] = {}
        self._visuals: dict[str, np.ndarray] = {}
        self._ckpt = ocp.StandardCheckpointer()

    @staticmethod
    def modify_commandline_options(parser, is_train):
        return parser

    # -- abstract hot path -------------------------------------------------
    @abstractmethod
    def set_input(self, data: dict):
        ...

    @abstractmethod
    def forward(self):
        ...

    @abstractmethod
    def optimize_parameters(self):
        ...

    # -- lifecycle ---------------------------------------------------------
    def setup(self, opt):
        """Schedulers + resume + print (reference BaseModel.setup)."""
        if self.isTrain:
            self.lr_fn = get_lr_multiplier_fn(opt)
            self.current_lr = opt.lr
        resume = getattr(opt, "continue_train", False)
        if self.isTrain and getattr(opt, "auto_resume", False):
            if os.path.exists(os.path.join(self.save_dir, "checkpoint_meta.json")):
                print("auto-resume: found a checkpoint, continuing training")
                opt.continue_train = True
                resume = True
        if not self.isTrain or resume:
            load_suffix = f"iter_{opt.load_iter}" if opt.load_iter > 0 else opt.epoch
            if self.isTrain:
                # Resumed runs must not train their first epoch at full
                # opt.lr: re-derive the multiplier at the last completed
                # epoch (train.py steps the LR at epoch END, so epoch
                # epoch_count trains at fn(epoch_count-1)). Pure policies
                # (linear/step/cosine) are exact here; plateau returns its
                # multiplier, which load_networks below restores from
                # checkpoint_meta.json along with {best,bad} and the exact
                # stored current_lr.
                ec = getattr(opt, "epoch_count", 1)
                self.current_lr = opt.lr * self.lr_fn(max(0, ec - 1), None)
            self.load_networks(load_suffix)
        self.print_networks(getattr(opt, "verbose", False))

    def eval(self):
        """Intentional no-op. The reference flips modules to eval mode
        (dropout off; IN has no running stats in this template); here the
        inference forward is a separate pure function that ALWAYS runs with
        train=False (see each model's _forward_jit), so --eval semantics
        hold unconditionally and there is no mutable mode to flip."""

    def test(self):
        """Inference forward (reference wraps in no_grad; pure fns need none)."""
        self.forward()

    # -- losses / visuals --------------------------------------------------
    def get_current_losses(self) -> "OrderedDict[str, float]":
        # explicit device_get: stays legal under jax.transfer_guard modes
        fetched = jax.device_get(self._losses)
        return OrderedDict((k, float(v)) for k, v in fetched.items())

    def get_current_visuals(self) -> "OrderedDict[str, np.ndarray]":
        return OrderedDict(
            (k, np.asarray(v)) for k, v in self._visuals.items() if v is not None
        )

    def get_image_paths(self):
        return getattr(self, "image_paths", [])

    # -- epoch-indexed schedules ---------------------------------------------
    def set_epoch(self, epoch: int):
        """Current absolute epoch (train.py calls this at epoch start;
        feeds warm-up/ramp schedules)."""
        self._cur_epoch = int(epoch)

    # -- LR schedule -------------------------------------------------------
    def update_learning_rate(self, epoch: int | None = None):
        """Step the per-epoch LR multiplier (reference update_learning_rate)."""
        if epoch is None:
            epoch = getattr(self, "_epoch", self.opt.epoch_count)
            self._epoch = epoch + 1
        if getattr(self.opt, "lr_policy", "linear") == "plateau" and self._losses:
            # feed the plateau controller the model's primary loss (the
            # reference leaves self.metric at 0 and the policy inert; we
            # make the flag actually do what it advertises).
            vals = jax.device_get(self._losses)
            key = "G" if "G" in vals else sorted(vals)[0]
            self.metric = float(vals[key])
        mult = self.lr_fn(epoch, self.metric)
        old = self.current_lr
        self.current_lr = self.opt.lr * mult
        print(f"learning rate {old:.7f} -> {self.current_lr:.7f}")

    # -- checkpointing -----------------------------------------------------
    def _ckpt_path(self, suffix: str) -> str:
        return os.path.abspath(os.path.join(self.save_dir, f"{suffix}_state"))

    def _net_params(self, name: str):
        """Params pytree of one net (overridable for suffixed names)."""
        return getattr(self.state, f"params_{name}")

    def _set_net_params(self, updates: dict):
        """Fold restored per-net params back into the state (overridable)."""
        return self.state.replace(
            **{f"params_{n}": p for n, p in updates.items()}
        )

    def save_networks(self, suffix):
        """Save checkpoints under checkpoints/{name}/.

        Layout mirrors the reference's per-net files (SURVEY.md §4.4:
        {epoch}_net_{Name}.pth) as orbax trees {suffix}_net_{Name}, so any
        model (e.g. --model test) can restore a subset of nets. A full
        train-state tree {suffix}_state additionally carries Adam moments,
        step, PRNG and pool — fixing the reference's silent optimizer-state
        loss on --continue_train.
        """
        assert self.state is not None
        suffix = str(suffix)
        is_async = getattr(self.opt, "async_checkpoint", False)
        if is_async:
            # join the PREVIOUS in-flight save and publish its meta before
            # starting a new one — checkpoint_meta.json must only ever point
            # at a fully committed tree, or auto-resume after preemption
            # lands on a half-written checkpoint.
            self._flush_pending_meta()
        self._ckpt.save(self._ckpt_path(suffix), self.state, force=True)
        for n in getattr(self, "save_names", self.model_names):
            self._ckpt.save(
                os.path.abspath(
                    os.path.join(self.save_dir, f"{suffix}_net_{n}")
                ),
                self._net_params(n),
                force=True,
            )
        meta = {"latest": suffix, "step": int(self.state.step)}
        if self.isTrain and hasattr(self, "current_lr"):
            # LR-schedule controller state rides the meta file: the plateau
            # policy's {best,bad,mult} is host-side (not in the jax state
            # tree), and current_lr pins the resumed run's first epoch.
            # Known (accepted) lag: save_networks runs at epoch end BEFORE
            # update_learning_rate(epoch) feeds the epoch's metric to the
            # plateau controller, so a resumed plateau run replays one
            # fewer observation and can drop the LR one epoch later than an
            # uninterrupted run. Deliberate: the alternative (re-publishing
            # meta after the controller steps) would double the meta writes
            # to protect a one-epoch heuristic offset (ADVICE r4 #3).
            meta["lr_state"] = {"current_lr": float(self.current_lr),
                                "plateau": getattr(self.lr_fn, "state", None)}
        if is_async:
            # training continues while orbax writes; the meta is published by
            # the next save or the atexit join.
            self._pending_meta = meta
            if not getattr(self, "_atexit_registered", False):
                import atexit

                atexit.register(self._flush_pending_meta)
                self._atexit_registered = True
        else:
            self._ckpt.wait_until_finished()
            self._write_meta(meta)

    def _write_meta(self, meta: dict):
        with open(os.path.join(self.save_dir, "checkpoint_meta.json"), "w") as f:
            json.dump(meta, f)

    def _flush_pending_meta(self):
        """Join the in-flight async save, then publish its meta."""
        meta = getattr(self, "_pending_meta", None)
        if meta is not None:
            self._ckpt.wait_until_finished()
            self._write_meta(meta)
            self._pending_meta = None

    def load_networks(self, suffix):
        assert self.state is not None, "build state before loading"
        suffix = str(suffix)
        meta_path = os.path.join(self.save_dir, "checkpoint_meta.json")
        meta = {}
        if os.path.exists(meta_path):
            with open(meta_path) as f:
                meta = json.load(f)
        if suffix == "latest" and "latest" in meta:
            suffix = str(meta["latest"])

        if self.isTrain and getattr(self.opt, "continue_train", False):
            path = self._ckpt_path(suffix)
            if not os.path.exists(path):
                # the aliased checkpoint may have been lost to a mid-commit
                # preemption — fall back to the newest complete tree.
                import glob

                cands = sorted(
                    glob.glob(os.path.join(self.save_dir, "*_state")),
                    key=os.path.getmtime,
                )
                if cands:
                    path = cands[-1]
                    print(f"checkpoint '{suffix}' missing; falling back to {path}")
                else:
                    print(f"no checkpoint found at {path}; starting fresh")
                    return
            print(f"loading the model from {path}")
            restored = self._ckpt.restore(path, self.state)
            self.state = replicate(restored, self.mesh)
            lrs = meta.get("lr_state")
            if lrs:
                # restore the plateau controller, then RE-DERIVE current_lr
                # from the multiplier rather than trusting the stored value:
                # a resume may jump --epoch_count, making the stored lr
                # stale for the pure policies, while plateau's multiplier
                # lives in the restored {best,bad,mult} state.
                pstate = getattr(self.lr_fn, "state", None)
                if pstate is not None and lrs.get("plateau"):
                    pstate.update(lrs["plateau"])
                ec = getattr(self.opt, "epoch_count", 1)
                self.current_lr = self.opt.lr * self.lr_fn(max(0, ec - 1), None)
            return

        updates = {}
        for n in getattr(self, "save_names", self.model_names):
            path = os.path.abspath(os.path.join(self.save_dir, f"{suffix}_net_{n}"))
            if not os.path.exists(path):
                # inference against a missing net must not silently evaluate
                # random weights (reference errors on a missing .pth).
                raise FileNotFoundError(
                    f"no checkpoint for net {n} at {path} — refusing to run "
                    f"inference with randomly initialized weights"
                )
            print(f"loading the model from {path}")
            updates[n] = self._ckpt.restore(path, self._net_params(n))
        state = self._set_net_params(updates)
        if "step" in meta:
            state = state.replace(step=jax.numpy.asarray(meta["step"], jax.numpy.int32))
        self.state = replicate(state, self.mesh)

    def print_networks(self, verbose: bool):
        print("---------- Networks initialized -------------")
        if self.state is not None:
            for name in self.model_names:
                params = getattr(self.state, f"params_{name}", None)
                if params is not None:
                    n = sum(x.size for x in jax.tree.leaves(params))
                    print(f"[Network {name}] Total number of parameters : {n / 1e6:.3f} M")
                    if verbose:
                        print(jax.tree.map(lambda x: x.shape, params))
        print("-----------------------------------------------")

    # -- device placement --------------------------------------------------
    def _put_batch(self, batch: dict) -> dict:
        if getattr(self.opt, "bf16", False) \
                and os.environ.get("NEMAR_SHIP_BF16", "0") == "1":
            # OPT-IN (NEMAR_SHIP_BF16=1): ship bfloat16 inputs from the
            # host. Halves H2D bytes — which matters because the axon relay
            # client retains host staging buffers per transfer (round-5: a
            # 10.6k-dispatch 256² run grew to 130 GB RSS and was
            # OOM-killed; growth tracked shipped bytes). NOT the default:
            # although the compute path casts inputs to bf16 anyway,
            # shipping bf16 also rounds the LOSS TARGETS, and a paired
            # seed-0 A/B at 256² showed that rounding SUPPRESSES the
            # early per-pixel registration lock (pcos_ho 0.40 @epoch 10
            # under f32 vs 0.34 then regressing under bf16; 10/10 bf16-era
            # draws stalled where ~2/5 f32-era draws converged). Use for
            # memory-bound runs that would otherwise OOM, with the science
            # cost in mind.
            import ml_dtypes

            batch = {
                k: v.astype(ml_dtypes.bfloat16)
                if isinstance(v, np.ndarray) and v.dtype == np.float32 else v
                for k, v in batch.items()
            }
        return shard_batch(self.mesh, batch, shard_spatial=self.shard_spatial)

    def _lr_scalar(self):
        """Current lr as an EXPLICITLY placed device scalar (implicit scalar
        transfers trip --transfer_guard disallow)."""
        return jax.device_put(np.float32(self.current_lr))
