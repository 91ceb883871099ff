"""Model lifecycle wrappers — BaseModel/SRModel/MambaIRModel/ImageCleanModel
equivalents (/root/reference/src/mair/basicsr/models/, fork B
image_restoration_model.py), TPU-native.

A wrapper owns: the Flax network + params (optionally converted from the
released torch checkpoints), losses, optimizer/scheduler, EMA, the jitted
sharded train step, validation with registry metrics, and checkpoint/
training-state save/resume (NumPy npz — readable anywhere, no torch).
"""

from __future__ import annotations

import logging
import os
import pickle
import time
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from tpuir.registry import MODEL_REGISTRY
from tpuir.train import archs
from tpuir.train.data import MixingAugment
from tpuir.train.losses import build_loss
from tpuir.train.metrics import calculate_metric
from tpuir.train.schedulers import build_scheduler
from tpuir.train.trainer import TrainState, build_optimizer, make_train_step


def _flatten_params(tree, prefix=""):
    out = {}
    if isinstance(tree, dict):
        for k, v in tree.items():
            out.update(_flatten_params(v, f"{prefix}/{k}" if prefix else k))
    else:
        out[prefix] = np.asarray(tree)
    return out


def _unflatten_params(flat: Dict[str, np.ndarray]):
    tree: Dict = {}
    for key, val in flat.items():
        parts = key.split("/")
        d = tree
        for p in parts[:-1]:
            d = d.setdefault(p, {})
        d[parts[-1]] = val
    return tree


def _write_with_retry(path: str, write_fn, retries: int = 3) -> None:
    """Retry transient checkpoint-write failures, then warn and move on —
    the reference's 'avoid occasional writing errors' loop
    (/root/reference/src/mair/basicsr/models/base_model.py:225-240)."""
    logger = logging.getLogger("tpuir")
    for attempt in range(retries):
        try:
            write_fn(path)
            return
        except Exception as e:  # noqa: BLE001 — reference catches everything
            logger.warning(
                "Save model error: %s, remaining retry times: %d",
                e, retries - attempt - 1,
            )
            time.sleep(1)
    logger.warning("Still cannot save %s. Just ignore it.", path)


def save_params_npz(path: str, params) -> None:
    flat = _flatten_params(params)
    _write_with_retry(path, lambda p: np.savez(p, **flat))


def load_params_npz(path: str):
    with np.load(path) as z:
        return _unflatten_params({k: z[k] for k in z.files})


@MODEL_REGISTRY.register()
class SRModel:
    """Single-network restoration model (sr_model.py:14-281 equivalent)."""

    def __init__(self, opt: Dict):
        self.opt = opt
        self.is_train = opt.get("is_train", False)
        net_opt = dict(opt["network_g"])
        self.net_type = net_opt["type"]
        self.network_opt = net_opt
        self.net_g = archs.build_network(net_opt)
        self.params = None
        self.state: Optional[TrainState] = None
        self._step_fn = None
        self.log_dict: Dict = {}

        load_path = (opt.get("path") or {}).get("pretrain_network_g")
        if load_path:
            self.load_network(load_path, opt["path"].get("param_key_g", "params"))
        if self.is_train:
            self.init_training_settings()

    # -- weights ----------------------------------------------------------

    def _init_params(self, sample_shape=(1, 64, 64, 3)):
        in_ch = self.network_opt.get(
            "inp_channels", self.network_opt.get("in_chans",
                                                self.network_opt.get("in_nc", 3))
        )
        x = jnp.zeros((1, 64, 64, in_ch), jnp.float32)
        self.params = self.net_g.init(jax.random.PRNGKey(self.opt.get("manual_seed", 0)), x)

    def load_network(self, path: str, param_key: str = "params"):
        """Load .npz (native) or .pth (released torch checkpoint, converted).

        Mirrors load_network's param_key/params_ema fallback
        (base_model.py:277-303)."""
        if path.endswith(".npz"):
            self.params = load_params_npz(path)
            return
        from tpuir.zoo import _load_sd

        try:
            sd = _load_sd(path, key=param_key)
        except KeyError:
            sd = _load_sd(path, key="params_ema")
        sd = {k[7:] if k.startswith("module.") else k: v for k, v in sd.items()}
        self.params = archs.convert_pretrained(self.net_type, sd, self.network_opt)

    # -- training ---------------------------------------------------------

    def init_training_settings(self):
        train_opt = self.opt["train"]
        if self.params is None:
            self._init_params()
        self.ema_decay = train_opt.get("ema_decay", 0)

        pixel_opt = train_opt.get("pixel_opt", {"type": "L1Loss"})
        self.cri_pix = build_loss(pixel_opt)

        optim_opt = dict(train_opt["optim_g"])
        base_lr = optim_opt.get("lr", 2e-4)
        sched_opt = train_opt.get("scheduler", {"type": "MultiStepLR", "milestones": [10**9]})
        self.schedule = build_scheduler(base_lr, sched_opt)
        self.tx = build_optimizer(optim_opt, self.schedule)
        self.state = TrainState.create(
            self.params, self.tx, ema_decay=self.ema_decay or None
        )
        grad_clip = 0.01 if train_opt.get("use_grad_clip") else None
        self._step_fn = jax.jit(
            make_train_step(
                self.net_g.apply, self.tx,
                lambda p, t: self.cri_pix(p, t),
                ema_decay=self.ema_decay or None, grad_clip=grad_clip,
            ),
            donate_argnums=(0,),
        )
        self.mixing_flag = bool(
            (train_opt.get("mixing_augs") or {}).get("mixup", False)
        )
        if self.mixing_flag:
            ma = train_opt["mixing_augs"]
            self.mixing_augmentation = MixingAugment(
                ma.get("mixup_beta", 1.2), ma.get("use_identity", True),
                seed=self.opt.get("manual_seed"),
            )

    def optimize_parameters(self, batch: Dict[str, np.ndarray]):
        lq, gt = batch["lq"], batch["gt"]
        if self.is_train and self.mixing_flag:
            gt, lq = self.mixing_augmentation(gt, lq)
        self.state, metrics = self._step_fn(self.state, {"lq": lq, "gt": gt})
        self.log_dict = {"l_pix": float(metrics["loss"])}
        return self.log_dict

    @property
    def current_lr(self) -> float:
        return float(self.schedule(int(self.state.step)))

    # -- inference / validation -------------------------------------------

    def _eval_params(self):
        if self.state is not None and self.state.ema_params is not None:
            return self.state.ema_params
        return self.state.params if self.state is not None else self.params

    def test(self, lq: np.ndarray) -> np.ndarray:
        """Plain forward on one NHWC batch (jit per shape)."""
        fn = jax.jit(self.net_g.apply)
        return np.asarray(fn(self._eval_params(), jnp.asarray(lq)))

    def pad_test(self, lq: np.ndarray, window_size: int) -> np.ndarray:
        """Reflect-pad H,W to a multiple of window_size, forward, crop
        (image_restoration_model.py:175-186)."""
        h, w = lq.shape[1:3]
        ph = (-h) % window_size
        pw = (-w) % window_size
        x = np.pad(lq, ((0, 0), (0, ph), (0, pw), (0, 0)), mode="reflect")
        out = self.test(x)
        return out[:, :h, :w, :]

    def validation(self, dataloader, current_iter=0, save_img=False,
                   rgb2bgr=True, use_image=True) -> Dict[str, float]:
        """Run metrics over a val loader (sr_model.py:121-233 semantics).

        Images flow in BGR float [0,1]; metrics are computed on [0,255]
        uint8-rounded images when use_image else on float arrays.
        """
        val_opt = self.opt.get("val") or {}
        metric_opts = val_opt.get("metrics") or {}
        window_size = val_opt.get("window_size", 0)
        results = {name: 0.0 for name in metric_opts}
        n = 0
        for batch in dataloader:
            lq, gt = batch["lq"], batch["gt"]
            pred = (
                self.pad_test(lq, window_size) if window_size else self.test(lq)
            )
            for b in range(pred.shape[0]):
                sr, gt_i = pred[b], gt[b]
                sr255 = np.clip(sr * 255.0, 0, 255)
                gt255 = np.clip(gt_i * 255.0, 0, 255)
                if use_image:
                    sr255 = sr255.round()
                    gt255 = gt255.round()
                for name, m_opt in metric_opts.items():
                    results[name] += calculate_metric(
                        {"img": sr255, "img2": gt255}, m_opt
                    )
                n += 1
        return {k: v / max(n, 1) for k, v in results.items()}

    # -- checkpointing -----------------------------------------------------

    def save(self, epoch: int, current_iter: int):
        models_dir = self.opt["path"]["models"]
        states_dir = self.opt["path"]["training_states"]
        os.makedirs(models_dir, exist_ok=True)
        os.makedirs(states_dir, exist_ok=True)
        save_params_npz(
            os.path.join(models_dir, f"net_g_{current_iter}.npz"),
            self.state.params if self.state else self.params,
        )
        if self.state is not None and self.state.ema_params is not None:
            save_params_npz(
                os.path.join(models_dir, f"net_g_ema_{current_iter}.npz"),
                self.state.ema_params,
            )
        if self.state is not None:
            payload = {
                "epoch": epoch,
                "iter": current_iter,
                "opt_state": jax.tree_util.tree_map(
                    np.asarray, self.state.opt_state
                ),
                "params": jax.tree_util.tree_map(
                    np.asarray, self.state.params
                ),
                "ema_params": jax.tree_util.tree_map(
                    np.asarray, self.state.ema_params
                )
                if self.state.ema_params is not None
                else None,
            }

            def _dump(p):
                with open(p, "wb") as f:
                    pickle.dump(payload, f)

            _write_with_retry(
                os.path.join(states_dir, f"{current_iter}.state"), _dump
            )

    def resume_training(self, state_path: str) -> Dict:
        with open(state_path, "rb") as f:
            st = pickle.load(f)
        self.state = self.state.replace(
            step=jnp.asarray(st["iter"], jnp.int32),
            params=st["params"],
            opt_state=jax.tree_util.tree_map(jnp.asarray, st["opt_state"]),
            ema_params=st["ema_params"],
        )
        return {"epoch": st["epoch"], "iter": st["iter"]}


@MODEL_REGISTRY.register()
class MambaIRModel(SRModel):
    """SRModel + chop-and-stitch tiled test (mambair_model.py:13-80)."""

    def tile_test(self, lq: np.ndarray, tile: int = 200) -> np.ndarray:
        from tpuir.core.engine import InferenceModel, run_model_inference

        shave = tile // 10
        bundle = InferenceModel(
            name=self.net_type, apply_fn=self.net_g.apply,
            params=self._eval_params(), patch_size=tile, patch_overlap=shave,
            pad_factor=8,
        )
        outs = []
        for b in range(lq.shape[0]):
            out, _ = run_model_inference(bundle, lq[b])
            outs.append(out)
        return np.stack(outs)


@MODEL_REGISTRY.register()
class MaIRPlusModel(MambaIRModel):
    """x8 self-ensemble TTA at test time (mairplus_model.py:8)."""

    def test(self, lq: np.ndarray) -> np.ndarray:
        fn = jax.jit(self.net_g.apply)
        params = self._eval_params()
        acc = None
        for rot in range(4):
            for flip in (False, True):
                x = np.rot90(lq, rot, axes=(1, 2))
                if flip:
                    x = x[:, :, ::-1, :]
                y = np.asarray(fn(params, jnp.asarray(np.ascontiguousarray(x))))
                if flip:
                    y = y[:, :, ::-1, :]
                y = np.rot90(y, -rot, axes=(1, 2))
                acc = y if acc is None else acc + y
        return acc / 8.0


@MODEL_REGISTRY.register()
class ImageCleanModel(SRModel):
    """Fork-B wrapper (image_restoration_model.py:51-327): mixup + window
    pad_test are already part of SRModel here; kept as a distinct registry
    name so fork-B option files resolve."""


def build_model(opt: Dict):
    return MODEL_REGISTRY.get(opt["model_type"])(opt)
