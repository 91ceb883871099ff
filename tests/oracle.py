"""Helpers for numerical parity tests against the PyTorch reference.

The reference sources at /root/reference/src are used as a *behavioral
oracle*: we instantiate them with random weights, convert those weights with
our converters, and require our JAX models to reproduce the torch outputs.
mamba_ssm (CUDA) is not installed; tests that need it register a pure-torch
sequential selective-scan stand-in under ``sys.modules['mamba_ssm']`` before
importing the reference MaIR code.
"""

import sys
import types

import numpy as np

REFERENCE_SRC = "/root/reference/src"


def add_reference_path():
    if REFERENCE_SRC not in sys.path:
        sys.path.insert(0, REFERENCE_SRC)


def state_dict_numpy(module) -> dict:
    return {k: v.detach().cpu().numpy() for k, v in module.state_dict().items()}


def seed_torch(seed: int = 0):
    import torch

    torch.manual_seed(seed)
    return torch


def torch_forward(module, x_nhwc: np.ndarray) -> np.ndarray:
    """Run a torch NCHW module on an NHWC numpy batch, return NHWC numpy."""
    import torch

    with torch.no_grad():
        t = torch.from_numpy(np.ascontiguousarray(x_nhwc.transpose(0, 3, 1, 2)))
        y = module(t)
    return y.detach().cpu().numpy().transpose(0, 2, 3, 1)


def selective_scan_sequential_torch(
    u, delta, A, B, C, D=None, z=None, delta_bias=None, delta_softplus=False,
    return_last_state=False,
):
    """Naive fp32 sequential selective scan — stands in for the mamba_ssm
    CUDA kernel when the reference MaIR modules are imported as oracles.

    Recurrence (Mamba S6, as consumed by the reference at
    /root/reference/src/mair/basicsr/archs/mair_arch.py:266-272):
      dt    = softplus(delta + delta_bias)          (if delta_softplus)
      hbar  = exp(dt * A) * h + (dt * B) * u        per state dim n
      y     = C . h + D * u
    Shapes: u,delta (B,D,L); A (D,N); B,C (B,G,N,L) group-broadcast over D;
    D (D,). Output (B,D,L) in u's dtype.
    """
    import torch

    dtype_in = u.dtype
    u = u.float()
    delta = delta.float()
    if delta_bias is not None:
        delta = delta + delta_bias[..., None].float()
    if delta_softplus:
        delta = torch.nn.functional.softplus(delta)
    batch, dim, L = u.shape
    N = A.shape[1]
    G = B.shape[1]
    assert dim % G == 0
    B_ = B.float().repeat_interleave(dim // G, dim=1)  # (B, D, N, L)
    C_ = C.float().repeat_interleave(dim // G, dim=1)
    A = A.float()

    h = torch.zeros(batch, dim, N, dtype=torch.float32)
    ys = []
    dA = torch.exp(torch.einsum("bdl,dn->bdln", delta, A))
    dBu = torch.einsum("bdl,bdnl,bdl->bdln", delta, B_, u)
    for t in range(L):
        h = dA[:, :, t] * h + dBu[:, :, t]
        y = torch.einsum("bdn,bdn->bd", h, C_[:, :, :, t])
        ys.append(y)
    y = torch.stack(ys, dim=-1)  # (B, D, L)
    if D is not None:
        y = y + D.float()[None, :, None] * u
    if z is not None:
        y = y * torch.nn.functional.silu(z.float())
    y = y.to(dtype_in)
    if return_last_state:
        return y, h
    return y


def install_fake_timm():
    """Stub the timm.layers symbols the reference MaIR imports.

    DropPath is identity in eval mode (all oracle runs are eval)."""
    if "timm" in sys.modules and "timm.layers" in sys.modules:
        return
    import torch

    class DropPath(torch.nn.Module):
        def __init__(self, drop_prob=0.0):
            super().__init__()

        def forward(self, x):
            return x

    def to_2tuple(x):
        return tuple(x) if isinstance(x, (tuple, list)) else (x, x)

    timm = sys.modules.get("timm") or types.ModuleType("timm")
    layers = types.ModuleType("timm.layers")
    layers.DropPath = DropPath
    layers.to_2tuple = to_2tuple
    layers.trunc_normal_ = torch.nn.init.trunc_normal_
    timm.layers = layers
    sys.modules["timm"] = timm
    sys.modules["timm.layers"] = layers


def _load_by_path(fullname: str, path: str, package_path=None):
    import importlib.util

    if fullname in sys.modules:
        return sys.modules[fullname]
    spec = importlib.util.spec_from_file_location(fullname, path)
    mod = importlib.util.module_from_spec(spec)
    sys.modules[fullname] = mod
    try:
        spec.loader.exec_module(mod)
    except Exception:
        sys.modules.pop(fullname, None)  # don't leave a broken module behind
        raise
    return mod


def _ensure_pkg(fullname: str, path=None):
    if fullname in sys.modules:
        return sys.modules[fullname]
    mod = types.ModuleType(fullname)
    mod.__path__ = [path] if path else []
    sys.modules[fullname] = mod
    parent_name = fullname.rsplit(".", 1)
    if len(parent_name) == 2:
        setattr(sys.modules[parent_name[0]], parent_name[1], mod)
    return mod


def load_reference_mair_arch():
    """Import the reference mair_arch.py with minimal fake dependencies.

    The full `mair` package pulls in torchvision/lmdb-heavy modules; we wire
    just enough of the package tree (registry + shift_scanf_util) into
    sys.modules for the arch module's imports to resolve.
    """
    install_fake_timm()
    install_fake_mamba_ssm()
    base = "/root/reference/src/mair"
    _ensure_pkg("mair", base)
    _ensure_pkg("mair.basicsr", f"{base}/basicsr")
    _ensure_pkg("mair.basicsr.utils", f"{base}/basicsr/utils")
    _ensure_pkg("mair.basicsr.archs", f"{base}/basicsr/archs")
    reg = _load_by_path(
        "mair.basicsr.utils.registry", f"{base}/basicsr/utils/registry.py"
    )
    sys.modules["mair.basicsr.utils"].registry = reg
    ssu = _load_by_path(
        "mair.basicsr.archs.shift_scanf_util",
        f"{base}/basicsr/archs/shift_scanf_util.py",
    )
    sys.modules["mair.basicsr.archs"].shift_scanf_util = ssu
    return _load_by_path(
        "mair.basicsr.archs.mair_arch", f"{base}/basicsr/archs/mair_arch.py"
    )


def load_reference_losses():
    """Import the reference BasicSR losses module (losses/losses.py)."""
    load_reference_mair_arch()  # provides mair.basicsr.utils.registry
    base = "/root/reference/src/mair/basicsr"
    if "mair.basicsr.losses.losses" in sys.modules:
        return sys.modules["mair.basicsr.losses.losses"]
    _ensure_pkg("mair.basicsr.losses", f"{base}/losses")
    _load_by_path(
        "mair.basicsr.losses.loss_util", f"{base}/losses/loss_util.py"
    )
    return _load_by_path(
        "mair.basicsr.losses.losses", f"{base}/losses/losses.py"
    )


def load_reference_mairunet_arch():
    """Import the reference mairunet_arch.py (realDenoising fork)."""
    load_reference_mair_arch()  # provides mair.basicsr.utils.registry
    base = "/root/reference/src/mair/realDenoising/basicsr/models/archs"
    pkg = "refunet_archs"
    if f"{pkg}.mairunet_arch" in sys.modules:
        return sys.modules[f"{pkg}.mairunet_arch"]
    _ensure_pkg(pkg, base)
    _load_by_path(f"{pkg}.shift_scanf_util", f"{base}/shift_scanf_util.py")
    import importlib.util

    spec = importlib.util.spec_from_file_location(
        f"{pkg}.mairunet_arch", f"{base}/mairunet_arch.py"
    )
    mod = importlib.util.module_from_spec(spec)
    mod.__package__ = pkg
    sys.modules[f"{pkg}.mairunet_arch"] = mod
    spec.loader.exec_module(mod)
    return mod


def install_fake_mamba_ssm():
    """Register a minimal mamba_ssm module tree exposing selective_scan_fn."""
    if "mamba_ssm" in sys.modules:
        return
    mamba = types.ModuleType("mamba_ssm")
    ops = types.ModuleType("mamba_ssm.ops")
    iface = types.ModuleType("mamba_ssm.ops.selective_scan_interface")
    iface.selective_scan_fn = selective_scan_sequential_torch
    iface.selective_scan_ref = selective_scan_sequential_torch
    mamba.ops = ops
    ops.selective_scan_interface = iface
    sys.modules["mamba_ssm"] = mamba
    sys.modules["mamba_ssm.ops"] = ops
    sys.modules["mamba_ssm.ops.selective_scan_interface"] = iface
