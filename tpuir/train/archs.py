"""Architecture registry: YAML ``network_g`` configs -> Flax modules.

Accepts the reference option files' kwarg surface (type/key names from
src/restormer/options/*.yml, src/mair/options/*.yml and the BasicSR
registry convention) and maps them onto the tpuir model classes.
"""

from __future__ import annotations

from typing import Dict

from tpuir.registry import ARCH_REGISTRY


@ARCH_REGISTRY.register()
def DnCNN(in_nc=1, out_nc=1, nc=64, nb=17, act_mode="R", **kw):
    from tpuir.models.dncnn import DnCNN as M

    return M(in_nc=in_nc, out_nc=out_nc, nc=nc, nb=nb)


@ARCH_REGISTRY.register()
def REDNet(num_channels=1, num_features=128, **kw):
    from tpuir.models.rednet import REDNet as M

    return M(num_channels=num_channels, num_features=num_features)


@ARCH_REGISTRY.register()
def Restormer(
    inp_channels=3, out_channels=3, dim=48, num_blocks=(4, 6, 6, 8),
    num_refinement_blocks=4, heads=(1, 2, 4, 8), ffn_expansion_factor=2.66,
    bias=False, LayerNorm_type="WithBias", dual_pixel_task=False, **kw,
):
    from tpuir.models.restormer import Restormer as M

    return M(
        inp_channels=inp_channels, out_channels=out_channels, dim=dim,
        num_blocks=tuple(num_blocks), num_refinement_blocks=num_refinement_blocks,
        heads=tuple(heads), ffn_expansion_factor=ffn_expansion_factor, bias=bias,
        layer_norm_bias=(LayerNorm_type == "WithBias"),
        dual_pixel_task=dual_pixel_task,
    )


@ARCH_REGISTRY.register()
def MaIR(
    in_chans=3, embed_dim=180, depths=(6, 6, 6, 6, 6, 6), d_state=16,
    ssm_ratio=1.3, mlp_ratio=2.0, scan_len=4, img_range=1.0, upsampler=None,
    **kw,
):
    from tpuir.models.mair import MaIR as M

    if upsampler not in (None, "", "~"):
        raise NotImplementedError(
            "tpuir MaIR implements the restoration (upsampler=None) branch; "
            "SR upsamplers are not part of the reference test matrix"
        )
    return M(
        in_chans=in_chans, embed_dim=embed_dim, depths=tuple(depths),
        d_state=d_state, ssm_ratio=ssm_ratio, mlp_ratio=mlp_ratio,
        scan_len=scan_len, img_range=img_range,
    )


@ARCH_REGISTRY.register()
def MaIRUNet(
    inp_channels=3, out_channels=3, dim=48, num_blocks=(4, 6, 6, 8),
    num_refinement_blocks=4, ssm_ratio=2.0, flp_ratio=4.0, mlp_ratio=1.5,
    bias=False, dual_pixel_task=False, scan_len=4, **kw,
):
    from tpuir.models.mair_unet import MaIRUNet as M

    return M(
        inp_channels=inp_channels, out_channels=out_channels, dim=dim,
        num_blocks=tuple(num_blocks), num_refinement_blocks=num_refinement_blocks,
        ssm_ratio=ssm_ratio, flp_ratio=flp_ratio, mlp_ratio=mlp_ratio,
        use_bias=bias, dual_pixel_task=dual_pixel_task, scan_len=scan_len,
    )


def build_network(opt: Dict):
    """network_g dict -> (flax module, remaining opt)."""
    opt = dict(opt)
    net_type = opt.pop("type")
    return ARCH_REGISTRY.get(net_type)(**opt)


CONVERTERS = {
    "Restormer": lambda sd, o: _convert_restormer(sd, o),
    "MaIR": lambda sd, o: _convert_mair(sd, o),
    "MaIRUNet": lambda sd, o: _convert_mairunet(sd, o),
    "DnCNN": lambda sd, o: _convert_dncnn(sd, o),
    "REDNet": lambda sd, o: _convert_rednet(sd, o),
}


def _convert_restormer(sd, o):
    from tpuir.models.restormer import convert_state_dict

    return convert_state_dict(
        sd,
        num_blocks=tuple(o.get("num_blocks", (4, 6, 6, 8))),
        num_refinement_blocks=o.get("num_refinement_blocks", 4),
        bias=o.get("bias", False),
        layer_norm_bias=(o.get("LayerNorm_type", "WithBias") == "WithBias"),
        dual_pixel_task=o.get("dual_pixel_task", False),
    )


def _convert_mair(sd, o):
    from tpuir.models.mair import convert_state_dict

    return convert_state_dict(
        sd, depths=tuple(o.get("depths", (6,) * 6)),
        embed_dim=o.get("embed_dim", 180), ssm_ratio=o.get("ssm_ratio", 1.3),
    )


def _convert_mairunet(sd, o):
    from tpuir.models.mair_unet import convert_state_dict

    return convert_state_dict(
        sd, dim=o.get("dim", 48), num_blocks=tuple(o.get("num_blocks", (4, 6, 6, 8))),
        num_refinement_blocks=o.get("num_refinement_blocks", 4),
        ssm_ratio=o.get("ssm_ratio", 2.0),
        dual_pixel_task=o.get("dual_pixel_task", False),
    )


def _convert_dncnn(sd, o):
    from tpuir.models.dncnn import convert_state_dict

    return convert_state_dict(sd, o.get("nb", 17))


def _convert_rednet(sd, o):
    from tpuir.models.rednet import convert_state_dict

    return convert_state_dict(sd)


def convert_pretrained(net_type: str, sd: Dict, network_opt: Dict):
    if net_type not in CONVERTERS:
        raise KeyError(f"no torch-checkpoint converter for {net_type}")
    return CONVERTERS[net_type](sd, network_opt)
