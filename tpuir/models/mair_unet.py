"""MaIRUNet: Restormer's U-Net skeleton with Mamba (LoSh2D) mixers.

TPU-native re-design of the reference architecture
(/root/reference/src/mair/realDenoising/basicsr/models/archs/mairunet_arch.py:445-739).
Reuses SSMixer/MaIRBlock from tpuir.models.mair (VSSBlock == RMB with the
mlp attribute named ``mlp``; the reference's VSSBlocks are all built with
shift_size=0, so only the plain NSS ids are used). Scan ids are generated
per pyramid level (H, W), (H/2, W/2), (H/4, W/4), (H/8, W/8) as jit
constants — the analogue of the reference's per-level id cache
(mairunet_arch.py:591-642).
"""

from __future__ import annotations

from typing import Any, Dict, Sequence

import flax.linen as nn
import jax.numpy as jnp
import numpy as np

from tpuir.ops.pixel_shuffle import pixel_shuffle, pixel_unshuffle
from tpuir.ops.scan_ids import mair_scan_ids
from tpuir.models.mair import MaIRBlock, _f32, convert_block


class MaIRUNet(nn.Module):
    inp_channels: int = 3
    out_channels: int = 3
    dim: int = 48
    num_blocks: Sequence[int] = (4, 6, 6, 8)
    num_refinement_blocks: int = 4
    ssm_ratio: float = 2.0
    flp_ratio: float = 4.0  # level-1 encoder MLP ratio
    mlp_ratio: float = 1.5
    use_bias: bool = False
    dual_pixel_task: bool = False
    scan_len: int = 4
    base_d_state: int = 4
    scan_chunk: int = 256
    scan_io_dtype: str = "float32"  # 'bfloat16' = serving mode scan IO

    def _stage(self, n, dim, d_state, mlp_ratio, prefix):
        return [
            MaIRBlock(
                dim, d_state, self.ssm_ratio, mlp_ratio, self.scan_chunk,
                scan_io_dtype=self.scan_io_dtype, scan_len=self.scan_len,
                name=f"{prefix}_{i}",
            )
            for i in range(n)
        ]

    @nn.compact
    def __call__(self, x):
        B, H, W, _ = x.shape
        d = self.dim
        nb = self.num_blocks
        bs = self.base_d_state
        ids = {
            lvl: tuple(
                jnp.asarray(a)
                for a in mair_scan_ids(H >> lvl, W >> lvl, self.scan_len, 0)
            )
            for lvl in range(4)
        }

        e1 = nn.Conv(d, (3, 3), padding=1, use_bias=self.use_bias, name="patch_embed")(x)
        feat1 = e1
        for blk in self._stage(nb[0], d, bs, self.flp_ratio, "encoder_level1"):
            e1 = blk(e1, ids[0])

        e2 = nn.Conv(d // 2, (3, 3), padding=1, use_bias=False, name="down1_2")(e1)
        e2 = pixel_unshuffle(e2, 2)
        for blk in self._stage(nb[1], d * 2, bs * 2, self.mlp_ratio, "encoder_level2"):
            e2 = blk(e2, ids[1])

        e3 = nn.Conv(d, (3, 3), padding=1, use_bias=False, name="down2_3")(e2)
        e3 = pixel_unshuffle(e3, 2)
        for blk in self._stage(nb[2], d * 4, bs * 4, self.mlp_ratio, "encoder_level3"):
            e3 = blk(e3, ids[2])

        lat = nn.Conv(d * 2, (3, 3), padding=1, use_bias=False, name="down3_4")(e3)
        lat = pixel_unshuffle(lat, 2)
        for blk in self._stage(nb[3], d * 8, bs * 8, self.mlp_ratio, "latent"):
            lat = blk(lat, ids[3])

        d3 = nn.Conv(d * 16, (3, 3), padding=1, use_bias=False, name="up4_3")(lat)
        d3 = pixel_shuffle(d3, 2)
        d3 = jnp.concatenate([d3, e3], axis=-1)
        d3 = nn.Conv(d * 4, (1, 1), use_bias=self.use_bias, name="reduce_chan_level3")(d3)
        for blk in self._stage(nb[2], d * 4, bs * 4, self.mlp_ratio, "decoder_level3"):
            d3 = blk(d3, ids[2])

        d2 = nn.Conv(d * 8, (3, 3), padding=1, use_bias=False, name="up3_2")(d3)
        d2 = pixel_shuffle(d2, 2)
        d2 = jnp.concatenate([d2, e2], axis=-1)
        d2 = nn.Conv(d * 2, (1, 1), use_bias=self.use_bias, name="reduce_chan_level2")(d2)
        for blk in self._stage(nb[1], d * 2, bs * 2, self.mlp_ratio, "decoder_level2"):
            d2 = blk(d2, ids[1])

        d1 = nn.Conv(d * 4, (3, 3), padding=1, use_bias=False, name="up2_1")(d2)
        d1 = pixel_shuffle(d1, 2)
        d1 = jnp.concatenate([d1, e1], axis=-1)
        for blk in self._stage(nb[0], d * 2, bs * 2, self.mlp_ratio, "decoder_level1"):
            d1 = blk(d1, ids[0])
        for blk in self._stage(
            self.num_refinement_blocks, d * 2, bs * 2, self.mlp_ratio, "refinement"
        ):
            d1 = blk(d1, ids[0])

        if self.dual_pixel_task:
            d1 = d1 + nn.Conv(d * 2, (1, 1), use_bias=self.use_bias, name="skip_conv")(feat1)
            return nn.Conv(
                self.out_channels, (3, 3), padding=1, use_bias=self.use_bias, name="output"
            )(d1)
        return (
            nn.Conv(
                self.out_channels, (3, 3), padding=1, use_bias=self.use_bias, name="output"
            )(d1)
            + x
        )


def _conv_nb(sd, name):
    return {
        "kernel": np.ascontiguousarray(_f32(sd[f"{name}.weight"]).transpose(2, 3, 1, 0))
    }


def convert_state_dict(
    sd: Dict[str, np.ndarray],
    dim: int = 48,
    num_blocks: Sequence[int] = (4, 6, 6, 8),
    num_refinement_blocks: int = 4,
    ssm_ratio: float = 2.0,
    use_bias: bool = False,
    dual_pixel_task: bool = False,
) -> Dict:
    conv = _conv_nb  # all convs in MaIRUNet are bias-free in released configs
    params: Dict[str, Any] = {
        "patch_embed": conv(sd, "patch_embed.proj"),
        "down1_2": conv(sd, "down1_2.body.0"),
        "down2_3": conv(sd, "down2_3.body.0"),
        "down3_4": conv(sd, "down3_4.body.0"),
        "up4_3": conv(sd, "up4_3.body.0"),
        "up3_2": conv(sd, "up3_2.body.0"),
        "up2_1": conv(sd, "up2_1.body.0"),
        "reduce_chan_level3": conv(sd, "reduce_chan_level3"),
        "reduce_chan_level2": conv(sd, "reduce_chan_level2"),
        "output": conv(sd, "output"),
    }
    if dual_pixel_task:
        params["skip_conv"] = conv(sd, "skip_conv")

    stages = [
        ("encoder_level1", num_blocks[0], dim),
        ("encoder_level2", num_blocks[1], dim * 2),
        ("encoder_level3", num_blocks[2], dim * 4),
        ("latent", num_blocks[3], dim * 8),
        ("decoder_level3", num_blocks[2], dim * 4),
        ("decoder_level2", num_blocks[1], dim * 2),
        ("decoder_level1", num_blocks[0], dim * 2),
        ("refinement", num_refinement_blocks, dim * 2),
    ]
    for stage, n, sdim in stages:
        d_inner = int(ssm_ratio * sdim)
        for i in range(n):
            params[f"{stage}_{i}"] = convert_block(sd, f"{stage}.{i}", d_inner, "mlp")
    return {"params": params}
