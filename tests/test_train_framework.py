"""End-to-end training framework: tiny DnCNN run, checkpoint/resume,
validation metrics, scheduler parity vs the reference lr_scheduler."""

import os

import numpy as np
import pytest

torch = pytest.importorskip("torch")
cv2 = pytest.importorskip("cv2")

from tests import oracle


@pytest.fixture()
def train_env(tmp_path):
    root = tmp_path
    gt_dir = root / "gt"
    gt_dir.mkdir()
    rng = np.random.RandomState(0)
    for i in range(6):
        img = (rng.rand(48, 48) * 255).astype(np.uint8)
        cv2.imwrite(str(gt_dir / f"{i:02d}.png"), img)
    return root, str(gt_dir)


def _train_opt(root, gt_dir, total_iter=20):
    return {
        "name": "unit_dncnn",
        "model_type": "SRModel",
        "scale": 1,
        "manual_seed": 10,
        "is_train": True,
        "datasets": {
            "train": {
                "name": "toy",
                "type": "PairedImageDataset",
                "task": "denoising_gray",
                "noise": 25,
                "dataroot_gt": gt_dir,
                "dataroot_lq": gt_dir,
                "phase": "train",
                "scale": 1,
                "gt_size": 32,
                "use_hflip": True,
                "use_rot": True,
                "batch_size_per_gpu": 2,
                "use_shuffle": True,
                "dataset_enlarge_ratio": 2,
            },
            "val": {
                "name": "toyval",
                "type": "PairedImageDataset",
                "task": "denoising_gray",
                "noise": 25,
                "dataroot_gt": gt_dir,
                "dataroot_lq": gt_dir,
                "phase": "val",
                "scale": 1,
            },
        },
        "network_g": {"type": "DnCNN", "in_nc": 1, "out_nc": 1, "nc": 8, "nb": 5},
        "path": {
            "models": str(root / "models"),
            "training_states": str(root / "states"),
            "log": None,
        },
        "train": {
            "total_iter": total_iter,
            "use_grad_clip": False,
            "ema_decay": 0.99,
            "optim_g": {"type": "AdamW", "lr": 1e-3, "weight_decay": 1e-4,
                        "betas": [0.9, 0.999]},
            "scheduler": {
                "type": "CosineAnnealingRestartCyclicLR",
                "periods": [10, 10],
                "restart_weights": [1, 1],
                "eta_mins": [1e-3, 1e-6],
            },
            "pixel_opt": {"type": "L1Loss", "loss_weight": 1, "reduction": "mean"},
            "mixing_augs": {"mixup": True, "mixup_beta": 1.2, "use_identity": True},
        },
        "val": {
            "window_size": 8,
            "val_freq": 10,
            "metrics": {
                "psnr": {"type": "calculate_psnr", "crop_border": 0,
                         "test_y_channel": False},
                "ssim": {"type": "calculate_ssim", "crop_border": 0,
                         "test_y_channel": False},
            },
        },
        "logger": {"print_freq": 10, "save_checkpoint_freq": 10,
                   "use_tb_logger": False},
    }


def test_train_pipeline_end_to_end(train_env):
    root, gt_dir = train_env
    from tpuir.train.pipeline import train_pipeline

    opt = _train_opt(root, gt_dir, total_iter=20)
    result = train_pipeline(str(root), opt)
    assert result["iter"] == 20

    # checkpoints written
    assert os.path.exists(root / "models" / "net_g_20.npz")
    assert os.path.exists(root / "models" / "net_g_ema_20.npz")
    assert os.path.exists(root / "states" / "20.state")

    # validation yields sane metrics
    model = result["model"]
    from tpuir.train.data import EnlargedEpochIterator, build_dataset

    val_ds = build_dataset(opt["datasets"]["val"])
    loader = EnlargedEpochIterator(val_ds, 1, shuffle=False, drop_last=False)
    metrics = model.validation(loader)
    assert 5 < metrics["psnr"] < 60 and 0 < metrics["ssim"] <= 1


def test_resume_training(train_env):
    root, gt_dir = train_env
    from tpuir.train.pipeline import train_pipeline

    opt = _train_opt(root, gt_dir, total_iter=10)
    train_pipeline(str(root), opt)

    opt2 = _train_opt(root, gt_dir, total_iter=14)
    opt2["auto_resume"] = True
    result = train_pipeline(str(root), opt2)
    assert result["iter"] == 14
    assert int(result["model"].state.step) == 14


def test_loaded_checkpoint_reproduces_outputs(train_env):
    root, gt_dir = train_env
    from tpuir.train.pipeline import train_pipeline
    from tpuir.train.model import load_params_npz

    opt = _train_opt(root, gt_dir, total_iter=10)
    result = train_pipeline(str(root), opt)
    model = result["model"]

    x = np.random.RandomState(3).rand(1, 16, 16, 1).astype(np.float32)
    want = model.net_g.apply(model.state.params, x)
    params = load_params_npz(str(root / "models" / "net_g_10.npz"))
    got = model.net_g.apply(params, x)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


def _load_ref_lr_scheduler():
    return oracle._load_by_path(
        "ref_lr_scheduler",
        "/root/reference/src/mair/realDenoising/basicsr/models/lr_scheduler.py",
    )


@pytest.mark.parametrize(
    "kind,kwargs",
    [
        ("CosineAnnealingRestartCyclicLR",
         dict(periods=[10, 25], restart_weights=[1, 0.5], eta_mins=[3e-4, 1e-6])),
        ("CosineAnnealingRestartLR",
         dict(periods=[8, 16], restart_weights=[1, 0.7], eta_min=1e-7)),
        ("MultiStepRestartLR", dict(milestones=[5, 12], gamma=0.5)),
    ],
)
def test_scheduler_parity_vs_reference(kind, kwargs):
    ref_mod = _load_ref_lr_scheduler()
    from tpuir.train.schedulers import build_scheduler

    base_lr = 3e-4
    p = torch.nn.Parameter(torch.zeros(1))
    optim = torch.optim.Adam([p], lr=base_lr)
    ref_cls = getattr(ref_mod, kind)
    ref_sched = ref_cls(optim, **kwargs)

    ours = build_scheduler(base_lr, {"type": kind, **kwargs})

    # the reference raises once the iteration exceeds the cumulative periods
    max_steps = sum(kwargs["periods"]) if "periods" in kwargs else 30
    for step in range(0, max_steps):
        want = optim.param_groups[0]["lr"]
        got = float(ours(step))
        assert abs(got - want) < 1e-9, f"step {step}: {got} vs {want}"
        optim.step()
        ref_sched.step()


def test_dual_pixel_16bit_dataset(tmp_path):
    """Dataset_DefocusDeblur_DualPixel_16bit: L/R 16-bit crops stack to a
    6-channel lq, 16-bit gt, shared random crop + augmentation."""
    from tpuir.train.data import build_dataset

    rng = np.random.RandomState(3)
    for sub in ("gt", "lqL", "lqR"):
        (tmp_path / sub).mkdir()
    for i in range(3):
        for sub in ("gt", "lqL", "lqR"):
            img = (rng.rand(40, 40, 3) * 65535).astype(np.uint16)
            cv2.imwrite(str(tmp_path / sub / f"{i}.png"), img)

    ds = build_dataset(
        {
            "type": "Dataset_DefocusDeblur_DualPixel_16bit",
            "phase": "train",
            "gt_size": 16,
            "geometric_augs": True,
            "seed": 0,
            "dataroot_gt": str(tmp_path / "gt"),
            "dataroot_lqL": str(tmp_path / "lqL"),
            "dataroot_lqR": str(tmp_path / "lqR"),
        }
    )
    assert len(ds) == 3
    item = ds[0]
    assert item["lq"].shape == (16, 16, 6)
    assert item["gt"].shape == (16, 16, 3)
    assert 0.0 <= item["lq"].min() and item["lq"].max() <= 1.0

    val = build_dataset(
        {
            "type": "Dataset_DefocusDeblur_DualPixel_16bit",
            "phase": "val",
            "dataroot_gt": str(tmp_path / "gt"),
            "dataroot_lqL": str(tmp_path / "lqL"),
            "dataroot_lqR": str(tmp_path / "lqR"),
        }
    )
    item = val[1]
    assert item["lq"].shape == (40, 40, 6)
